package graft

import org.apache.hadoop.fs.Path

/** The S3 multipart-commit contract (K3): what the S3A magic
  * committer's job commit depends on, pinned against the mock object
  * store — parts invisible until complete, atomic all-or-nothing
  * materialization in part order, etag validation, abort without
  * trace — and driven end-to-end with REAL parquet task output
  * uploaded part-wise and read back through the s3a:// scheme.
  * (hadoop-aws ships the committer class itself and is absent here;
  * this is the protocol surface it would execute against.)
  */
class S3MultipartCommitSpec extends SparkSpec {

  private def withMockFs[T](f: MockS3AFileSystem => T): T = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[MockS3AFileSystem].getName)
    try f(new Path("s3a://test-bucket/")
      .getFileSystem(hc).asInstanceOf[MockS3AFileSystem])
    finally hc.unset("fs.s3a.impl")
  }

  test("object is invisible until complete; parts assemble in order") {
    withMockFs { fs =>
      val dest = new Path(s"s3a://test-bucket${tmpDir("mpu")}/obj.bin")
      val id = fs.initiateMultipartUpload(dest)
      val (p1, p2, p3) = ("alpha-".getBytes, "beta-".getBytes,
        "gamma".getBytes)
      // upload OUT of order — assembly must follow part numbers
      val e2 = fs.uploadPart(id, 2, p2)
      val e3 = fs.uploadPart(id, 3, p3)
      val e1 = fs.uploadPart(id, 1, p1)
      assert(!fs.exists(dest), "object visible before complete")
      fs.completeMultipartUpload(id, Seq(3 -> e3, 1 -> e1, 2 -> e2))
      assert(fs.exists(dest))
      val in = fs.open(dest)
      val buf = new Array[Byte](16)
      val n = in.read(buf); in.close()
      assert(new String(buf, 0, n) == "alpha-beta-gamma")
      assert(MockS3AFileSystem.pendingUploadCount == 0)
    }
  }

  test("abort leaves no visible object and no pending state") {
    withMockFs { fs =>
      val dest = new Path(s"s3a://test-bucket${tmpDir("mpu")}/gone.bin")
      val id = fs.initiateMultipartUpload(dest)
      fs.uploadPart(id, 1, "doomed".getBytes)
      fs.abortMultipartUpload(id)
      assert(!fs.exists(dest))
      assert(MockS3AFileSystem.pendingUploadCount == 0)
      intercept[java.io.IOException](fs.uploadPart(id, 2, "x".getBytes))
    }
  }

  test("etag mismatch or missing part fails complete, nothing visible") {
    withMockFs { fs =>
      val dest = new Path(s"s3a://test-bucket${tmpDir("mpu")}/bad.bin")
      val id = fs.initiateMultipartUpload(dest)
      val e1 = fs.uploadPart(id, 1, "data".getBytes)
      intercept[java.io.IOException](
        fs.completeMultipartUpload(id, Seq(1 -> "0000deadbeef")))
      intercept[java.io.IOException](
        fs.completeMultipartUpload(id, Seq(1 -> e1, 2 -> e1)))
      assert(!fs.exists(dest), "failed complete must stay invisible")
      // the upload survives a failed complete — retry with the truth
      fs.completeMultipartUpload(id, Seq(1 -> e1))
      assert(fs.exists(dest))
    }
  }

  test("job-commit shape: real parquet task output, uploaded part-wise," +
      " appears atomically and reads back through s3a://") {
    import spark.implicits._
    withMockFs { fs =>
      val df = (1 to 1000).map(i => (i.toLong, s"row$i"))
        .toDF("id", "name")
      // real task output: a local parquet write's part files
      val local = tmpDir("mpu_local") + "/t"
      df.repartition(3).write.parquet(local)
      val partFiles = new java.io.File(local).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
      assert(partFiles.length == 3)

      val destDir = s"${tmpDir("mpu_dest")}/t"
      // "task commit": stage every file as a pending multipart upload
      val pending = partFiles.map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val dest = new Path(s"s3a://test-bucket$destDir/${f.getName}")
        val id = fs.initiateMultipartUpload(dest)
        val chunks = bytes.grouped(4096).zipWithIndex
          .map { case (c, i) => (i + 1, c) }.toSeq
        val manifest = chunks.map { case (n, c) =>
          n -> fs.uploadPart(id, n, c) }
        (id, manifest)
      }
      // before job commit: the destination table does not exist
      assert(!fs.exists(new Path(s"s3a://test-bucket$destDir")))
      // "job commit": complete every pending upload
      pending.foreach { case (id, manifest) =>
        fs.completeMultipartUpload(id, manifest) }
      // read back through the object-store scheme: exact round-trip
      val back = spark.read.parquet(s"s3a://test-bucket$destDir")
      assert(back.count() == 1000)
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
      assert(MockS3AFileSystem.pendingUploadCount == 0)
    }
  }
}

package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Test-only object-store stand-in: a [[RawLocalFileSystem]] that
  * answers to the `s3a://` scheme, so the FULL upload path — URI
  * construction from reference properties, Hadoop FileSystem
  * resolution, parquet task commit, read-back — runs end-to-end with
  * no network. The bucket (URI authority) is ignored and object keys
  * map to local paths, like path-style access against a local object
  * store. Registered per-test via `fs.s3a.impl`; the container ships
  * no hadoop-aws jar and has zero egress, so a live S3/MinIO exercise
  * is impossible here — this is the committer-contract test standing
  * in for it (reference behavior: `S3Uploader.java:79-93`).
  *
  * Beyond the filesystem facade, the mock implements S3's MULTIPART
  * UPLOAD protocol (initiate → uploadPart* → complete | abort) with
  * the object-store visibility contract the S3A magic committer's
  * job commit is built on (hadoop-aws ships the committer itself, so
  * it cannot execute here — this pins down the semantics it depends
  * on): parts stage OFF the visible namespace, the object appears
  * atomically and only at complete, parts assemble in part-number
  * order regardless of upload order, etags are validated at
  * complete, and abort leaves no trace.
  */
object MockS3AFileSystem {
  private val ids = new AtomicLong(0L)
  /** uploadId → (destination, partNumber → (etag, bytes)) */
  private val uploads =
    TrieMap.empty[String, (Path, TrieMap[Int, (String, Array[Byte])])]

  private def etagOf(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  def pendingUploadCount: Int = uploads.size
  def resetUploads(): Unit = uploads.clear()
}

class MockS3AFileSystem extends RawLocalFileSystem {
  import MockS3AFileSystem._

  /** Begin a multipart upload to `dest`; nothing becomes visible. */
  def initiateMultipartUpload(dest: Path): String = {
    val id = s"mpu-${ids.incrementAndGet()}"
    uploads.put(id, (dest, TrieMap.empty))
    id
  }

  /** Stage one part (1-based part numbers, any order); returns the
    * part's etag, which [[completeMultipartUpload]] revalidates. */
  def uploadPart(uploadId: String, partNumber: Int,
      bytes: Array[Byte]): String = {
    val (_, parts) = uploads.getOrElse(uploadId,
      throw new java.io.IOException(s"no such upload $uploadId"))
    val etag = etagOf(bytes)
    parts.put(partNumber, (etag, bytes.clone()))
    etag
  }

  /** Complete: validate the manifest (every listed part present with
    * a matching etag), then materialize the object ATOMICALLY at the
    * destination — assembled in ascending part number, staged as a
    * dot-file sibling and renamed into place. On any validation
    * failure nothing becomes visible and the upload stays pending. */
  def completeMultipartUpload(uploadId: String,
      manifest: Seq[(Int, String)]): Unit = {
    val (dest, parts) = uploads.getOrElse(uploadId,
      throw new java.io.IOException(s"no such upload $uploadId"))
    if (manifest.isEmpty)
      throw new java.io.IOException("empty part manifest")
    manifest.foreach { case (n, etag) =>
      val staged = parts.getOrElse(n,
        throw new java.io.IOException(s"part $n missing"))
      if (staged._1 != etag)
        throw new java.io.IOException(s"part $n etag mismatch")
    }
    val file = pathToFile(dest)
    Option(file.getParentFile).foreach(_.mkdirs())
    val tmp = new java.io.File(file.getParentFile,
      s".${file.getName}.$uploadId")
    val out = new java.io.FileOutputStream(tmp)
    try manifest.sortBy(_._1).foreach { case (n, _) =>
      out.write(parts(n)._2)
    } finally out.close()
    if (!tmp.renameTo(file))
      throw new java.io.IOException(s"cannot materialize $dest")
    uploads.remove(uploadId)
  }

  /** Abort: discard staged parts; the namespace never saw anything. */
  def abortMultipartUpload(uploadId: String): Unit =
    uploads.remove(uploadId)
  private var mockUri: URI = _

  override def getScheme: String = "s3a"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    mockUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
  }

  // The superclass constructor calls getUri() (via the working-dir
  // qualifier) before this class's fields initialize — fall back to a
  // bare scheme URI until initialize() records the real authority.
  override def getUri: URI =
    if (mockUri == null) URI.create("s3a:///") else mockUri

  // RawLocalFileSystem's FileStatus loads permissions LAZILY via
  // `new java.io.File(path.toUri)`, which rejects any scheme but
  // file:// — return eagerly-populated statuses instead so listing
  // under s3a:// paths never takes that path.
  private def eager(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, 1, st.getBlockSize,
      st.getModificationTime, st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault
      else FsPermission.getFileDefault,
      "test", "test", st.getPath)

  override def getFileStatus(f: Path): FileStatus =
    eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}

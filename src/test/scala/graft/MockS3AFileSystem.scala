package graft

import java.net.URI

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
  */
class MockS3AFileSystem extends RawLocalFileSystem {
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

package graft.engine

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` FileSystem with permission-chmod suppressed.
  *
  * Without the native hadoop library (JNI `NativeIO`), every
  * `RawLocalFileSystem` create/mkdir that carries an `FsPermission`
  * falls back to FORKING a `chmod` subprocess (`Shell.execCommand`) —
  * measured 441 process forks in one lake-heavy query run (JFR
  * `jdk.ProcessStart`), 10–30 ms each, serialized inside every commit:
  * manifest writes, tag markers, tip hints, committer task files. On a
  * production deployment the native library makes the same call a
  * microsecond `chmod(2)`; this subclass restores that cost model by
  * skipping the permission call outright — the files land with the
  * process umask (644/755 here), which is exactly what Hadoop's
  * default-permission chmod would have set anyway.
  *
  * Wired as `spark.hadoop.fs.file.impl` in [[graft.Sessions.local]];
  * checksum behavior (.crc shadow files, torn-read detection) is
  * inherited unchanged from [[LocalFileSystem]].
  */
class GraftRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

class GraftLocalFileSystem
  extends LocalFileSystem(new GraftRawLocalFileSystem)

/** The same suppression for the `FileContext` (AbstractFileSystem)
  * hierarchy — streaming checkpoint WAL/commit-log writes go through
  * it, forking the same per-file `chmod`. Wraps the CHECKSUMMED
  * [[GraftLocalFileSystem]], so .crc shadow semantics match the stock
  * `LocalFs` exactly. Wired as
  * `spark.hadoop.fs.AbstractFileSystem.file.impl`. */
class GraftLocalFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new GraftLocalFileSystem, conf, "file", false)

package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}

import java.net.URI

/** Local `file://` filesystems that never fork a `chmod` process.
  *
  * Without the Hadoop native library (absent here, and in most container
  * images), `RawLocalFileSystem.setPermission` shells out — EVERY
  * `create()` and `mkdirs()` forks a `chmod` child process
  * (`LocalFSFileOutputStream.<init>` → `setPermission` →
  * `Shell.execCommand`). Sampled on the warm q102 lifecycle query this
  * was ~15 % of driver wall (fork + wait + join), and every executor
  * task writing a part file pays the same fork. The permission being
  * chmod'd is the default file permission under the default umask — the
  * exact bits a plain `FileOutputStream` creation already yields — so
  * the fork buys nothing on any POSIX host with a standard umask.
  *
  * Scale note: object stores have no POSIX permission bits at all, so
  * skipping the per-file chmod is the parity configuration for the
  * local harness, not a semantics change. Callers that NEED a real
  * chmod (none in this engine) would use the stock filesystem.
  */
class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

/** The local filesystem `fs.file.impl` points at: LocalFileSystem (so
  * every `FileSystem.getLocal` cast and instanceof stays valid) over
  * the no-chmod raw, with client-side CRC siblings OFF in both
  * directions — the same parity rationale r12 applied to the streaming
  * checkpoint path (commit 5592d5f): object stores carry integrity in
  * the store, not in a client-written `.crc` sibling, so the sibling
  * is a doubled metadata op (create+write+rename per small file) the
  * production path never pays. Scoped to `file://`; any real
  * remote filesystem keeps its own integrity machinery.
  */
class NoChmodLocalFileSystem
  extends LocalFileSystem(new NoChmodRawLocalFileSystem) {
  override def initialize(name: java.net.URI,
      conf: Configuration): Unit = {
    super.initialize(name, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}

/** The AbstractFileSystem (FileContext) face of the same thing — what
  * `fs.AbstractFileSystem.file.impl` points at; streaming checkpoints
  * route here. Mirrors `org.apache.hadoop.fs.local.RawLocalFs`, which
  * r12 already selected for its CRC-free metadata ops, minus the
  * per-create chmod fork.
  */
class NoChmodRawLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NoChmodRawLocalFileSystem, conf,
    "file", false)

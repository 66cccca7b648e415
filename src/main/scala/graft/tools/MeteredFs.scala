package graft.tools

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A local filesystem registered under `graftmeter://` that COUNTS
  * every outermost filesystem operation — the measurement seam for the
  * commit protocol's FIXED COST. On an object store each of these is
  * an RPC (LIST / HEAD / GET / PUT / COPY+DELETE), so the op counts
  * below are the engine's per-commit latency floor at 100 TB ingest
  * rates expressed in store-neutral units; wall time on local disk is
  * the lower bound, never the ceiling.
  *
  * Counting is OUTERMOST-ONLY (a thread-local depth guard): a
  * composite like `LocalFileSystem.mkdirs` that recurses into itself
  * counts once, matching what a remote client would issue.
  *
  * Usage: `conf.set("fs.graftmeter.impl", classOf[MeteredFs].getName)`
  * (and the AbstractFileSystem binding for FileContext users), then
  * address any local path as `graftmeter:///abs/path`. Counters are
  * JVM-global statics — local[*] executors land in the same tallies.
  */
object MeteredFs {
  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.LongAdder]()
  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** When set, each outermost op also tallies `op<TAB>path` — the
    * debugging view that locates an op storm (heavy; off by default).
    */
  @volatile var tracePaths: Boolean = false
  private val paths =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.LongAdder]()

  private[tools] def counted[A](op: String, f: => Path)(body: => A): A = {
    val d = depth.get()
    if (d == 0) {
      counters.computeIfAbsent(op,
        _ => new java.util.concurrent.atomic.LongAdder).increment()
      if (tracePaths)
        paths.computeIfAbsent(s"$op\t$f",
          _ => new java.util.concurrent.atomic.LongAdder).increment()
    }
    depth.set(d + 1)
    try body finally depth.set(d)
  }

  /** `(op, path) → count`, descending — only populated under
    * [[tracePaths]].
    */
  def topPaths(n: Int): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    paths.asScala.toSeq.map { case (k, v) => (k, v.sum()) }
      .sortBy(-_._2).take(n)
  }

  def reset(): Unit = { counters.clear(); paths.clear() }

  /** op → count, descending by count. */
  def snapshot(): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    counters.asScala.toSeq.map { case (k, v) => (k, v.sum()) }
      .sortBy(-_._2)
  }

  def total(): Long = snapshot().map(_._2).sum

  /** Register the scheme (idempotent) on a Hadoop conf. */
  def install(conf: Configuration): Unit = {
    conf.set("fs.graftmeter.impl", classOf[MeteredFs].getName)
    conf.set("fs.AbstractFileSystem.graftmeter.impl",
      classOf[MeteredAbstractFs].getName)
  }
}

class MeteredFs extends RawLocalFileSystem {
  import MeteredFs.counted

  override def getScheme: String = "graftmeter"
  override def getUri: URI = URI.create("graftmeter:///")

  override def listStatus(f: Path): Array[FileStatus] =
    counted("listStatus", f)(super.listStatus(f))

  override def getFileStatus(f: Path): FileStatus =
    counted("getFileStatus", f)(super.getFileStatus(f))

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    counted("open", f)(super.open(f, bufferSize))

  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    counted("create", f)(super.create(f, permission, overwrite,
      bufferSize, replication, blockSize, progress))

  override def createNonRecursive(f: Path, permission: FsPermission,
      flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag],
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    counted("create", f)(super.createNonRecursive(f, permission,
      flags, bufferSize, replication, blockSize, progress))

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    counted("append", f)(super.append(f, bufferSize, progress))

  override def rename(src: Path, dst: Path): Boolean =
    counted("rename", src)(super.rename(src, dst))

  override def delete(f: Path, recursive: Boolean): Boolean =
    counted("delete", f)(super.delete(f, recursive))

  override def mkdirs(f: Path): Boolean =
    counted("mkdirs", f)(super.mkdirs(f))

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    counted("mkdirs", f)(super.mkdirs(f, permission))

  override def setPermission(p: Path, permission: FsPermission): Unit =
    counted("setPermission", p)(super.setPermission(p, permission))

  override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
    counted("setTimes", p)(super.setTimes(p, mtime, atime))
}

/** FileContext binding for the metered scheme (CommitIo.replace's
  * atomic rename-over routes through AbstractFileSystem).
  */
class MeteredAbstractFs(uri: URI, conf: Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(uri,
      new MeteredFs, conf, "graftmeter", false)

package graft.storage

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The [[CommitIo]] contract, pinned clause by clause against the
  * shipping local-FS implementation — the bar any cloud/object-store
  * implementation must meet (its scaladoc names the mapping per
  * backend). These are the four primitives the whole commit protocol
  * stands on; weakening any one silently breaks multi-writer safety.
  */
class CommitIoSpec extends SparkSpec {

  private def io(dir: String): (CommitIo, org.apache.hadoop.fs.FileSystem) = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    (CommitIo(fs), fs)
  }

  test("casCreate: exactly one winner among concurrent creators") {
    val dir = tmpDir("cio-cas")
    val (cio, _) = io(dir)
    val p = new Path(dir, "_CLAIM_7")
    val threads = 16
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val done = (1 to threads).map { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            gate.await()
            if (cio.casCreate(p)) wins.incrementAndGet()
            ()
          }
        })
      }
      gate.countDown()
      done.foreach(_.get())
      assert(wins.get() == 1, s"CAS create had ${wins.get()} winners")
    } finally pool.shutdown()
    // and the loser signal persists: the path now exists
    assert(!cio.casCreate(p))
  }

  test("commitMarker: at most once per owned dir — a second create throws") {
    val dir = tmpDir("cio-marker")
    val (cio, fs) = io(dir)
    val vdir = new Path(dir, "_v1")
    fs.mkdirs(vdir)
    val m = new Path(vdir, "_GRAFT_COMMIT_DELTA")
    cio.commitMarker(m)
    assert(fs.exists(m))
    intercept[Exception] { cio.commitMarker(m) }
  }

  test("atomicRename: whole tree moves; a vanished source reads as " +
    "'other mover won' (false), never a partial move") {
    val dir = tmpDir("cio-rename")
    val (cio, fs) = io(dir)
    val src = new Path(dir, "_v2")
    fs.mkdirs(new Path(src, "_GRAFT_STATS"))
    fs.create(new Path(src, "part-0.parquet"), true).close()
    fs.create(new Path(src, "_GRAFT_STATS/m.parquet"), true).close()
    val dst = new Path(dir, "_v9")
    assert(cio.atomicRename(src, dst))
    assert(!fs.exists(src))
    assert(fs.exists(new Path(dst, "part-0.parquet")))
    assert(fs.exists(new Path(dst, "_GRAFT_STATS/m.parquet")))
    // idempotent-mover: renaming the now-missing source is false, not
    // an exception — the protocol treats it as "the racer moved it"
    assert(!cio.atomicRename(src, new Path(dir, "_v10")))
  }

  test("replace: readers see old or new bytes, never torn; first write " +
    "creates") {
    val dir = tmpDir("cio-replace")
    val (cio, fs) = io(dir)
    val p = new Path(dir, "_GRAFT_PROPS")
    def read(): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    cio.replace(p, "alpha=1".getBytes("UTF-8"))
    assert(read() == "alpha=1")
    // interleave replaces with reads: every read is a FULL old or FULL
    // new value (the two payloads share no prefix, so a torn read
    // could not parse as either)
    val payloads = (0 until 50).map(i => s"gen=$i:" + ("x" * (10 + i)))
    payloads.foreach { s =>
      cio.replace(p, s.getBytes("UTF-8"))
      val got = read()
      assert(payloads.contains(got) || got == "alpha=1",
        s"torn read: $got")
    }
    assert(read() == payloads.last)
    // no temp debris left behind
    assert(!fs.exists(new Path(dir, s"._GRAFT_PROPS.tmp")))
  }
}

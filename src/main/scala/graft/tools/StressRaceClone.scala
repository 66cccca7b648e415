package graft.tools

import org.apache.spark.sql.SparkSession

/** Clone-vs-maintenance racing (`runMain graft.tools.StressRace clone
  * [iters]`) — round-11 verdict item 7: shallow-clone creation and
  * reads racing source-side appends, `CALL pack` (FULL rewrites — the
  * rebaseLateDeltas path) and zero-grace `CALL vacuum` (the orphan-pin
  * reclaim path).
  *
  * Threads: an APPENDER (serialized source appends of known batches),
  * a MAINTAINER (pack + zero-grace vacuum back to back), and a CLONER
  * that repeatedly creates a clone, snapshots its (count, sum), then
  * RE-READS it through several maintenance cycles before dropping it.
  *
  * Legal per-op outcomes: success, or a CLASSIFIED abort (clone
  * creation detecting a raced GC; a pack failing loudly on a
  * just-pinned late delta — the round-12 rebase guard; vacuum/pack
  * serialization). Everything else is a failure.
  *
  * Exact end-state checks:
  *  - PIN STABILITY: every live clone re-read returns byte-identical
  *    (count, sum) to its creation read, no matter how many source
  *    packs/vacuums ran in between — a reclaimed pinned dir breaks
  *    this (or throws), never silently;
  *  - source conservation: count == seed + acknowledged appends, and
  *    the appender's batches are a PREFIX (single appender);
  *  - teardown: dropping every clone releases every pin; a final
  *    zero-grace vacuum then reclaims shadowed dirs and the source
  *    still reads exactly its conserved rows.
  */
object StressRaceClone {

  private def classified(e: Throwable): Boolean = {
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(c => " | " + msg(c)).getOrElse("")
    val m = msg(e)
    e.isInstanceOf[java.util.ConcurrentModificationException] ||
      Seq("raced", "re-run", "retry", "conflict", "in flight",
        "already exists", "serialize maintenance").exists(m.contains)
  }

  def run(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(10)
    val spark: SparkSession = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-race-clone")
    spark.conf.set("spark.graft.gcGraceMs", (15L * 60 * 1000).toString)
    spark.conf.set("spark.sql.catalog.grc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grc.root",
      dir.resolve("lake").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grc.m")
    spark.sql("CREATE TABLE grc.m.src (k BIGINT, v STRING)")
    val seedN = 500L
    spark.sql("INSERT INTO grc.m.src SELECT /*+ COALESCE(1) */ id, " +
      s"concat('v', id) FROM range(0, $seedN)")

    val ackedAppends = new java.util.concurrent.atomic.AtomicLong(0)
    val clonesMade = new java.util.concurrent.atomic.AtomicLong(0)
    val pinReads = new java.util.concurrent.atomic.AtomicLong(0)
    val aborts = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.LongAdder]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def abortBucket(tag: String): Unit =
      aborts.computeIfAbsent(tag,
        _ => new java.util.concurrent.atomic.LongAdder).increment()
    def attempt(tag: String)(body: => Unit): Boolean =
      try { body; true }
      catch {
        case e: Throwable if classified(e) => abortBucket(tag); false
        case e: Throwable =>
          val sw = new java.io.StringWriter()
          e.printStackTrace(new java.io.PrintWriter(sw))
          failures.add(s"$tag UNCLASSIFIED: $sw"); false
      }

    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val gate = new java.util.concurrent.CountDownLatch(3)
    val t0 = System.nanoTime()
    val tasks = Seq(
      // APPENDER: serialized known batches — committed set is a prefix
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = try {
          gate.countDown(); gate.await()
          (0 until iters).foreach { i =>
            val base = 1000000L + i * 100L
            if (attempt("append")(spark.sql(
              s"INSERT INTO grc.m.src SELECT /*+ COALESCE(1) */ id, " +
                s"concat('a', id) FROM range($base, ${base + 100})")))
              ackedAppends.addAndGet(100L)
          }
        } catch { case e: Throwable =>
          failures.add(s"appender thread: $e")
        } finally { done.set(true) }
      }),
      // CLONER: create → snapshot read → re-read through maintenance →
      // drop. The re-reads are the PIN STABILITY probe.
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = try {
          gate.countDown(); gate.await()
          var i = 0
          while (!done.get()) {
            val name = s"c$i"
            i += 1
            val made = attempt("clone")(spark.sql(
              s"CALL grc.system.clone('m', 'src', '$name')"))
            if (made) {
              clonesMade.incrementAndGet()
              val first = spark.sql("SELECT count(*) AS n, " +
                s"sum(k) AS s FROM grc.m.$name").head()
              // several maintenance cycles land inside this window
              (0 until 4).foreach { _ =>
                Thread.sleep(30L)
                val again = spark.sql("SELECT count(*) AS n, " +
                  s"sum(k) AS s FROM grc.m.$name").head()
                if (again.getLong(0) != first.getLong(0) ||
                  again.getLong(1) != first.getLong(1))
                  failures.add(s"PIN STABILITY violated on $name: " +
                    s"first=(${first.getLong(0)},${first.getLong(1)}) " +
                    s"now=(${again.getLong(0)},${again.getLong(1)})")
                pinReads.incrementAndGet()
              }
              spark.sql(s"DROP TABLE grc.m.$name")
            } else Thread.sleep(20L)
          }
        } catch { case e: Throwable =>
          failures.add(s"cloner thread: $e")
        }
      }),
      // MAINTAINER: FULL rewrites (pack) + zero-grace vacuum — the
      // two reclaim paths the pins must survive
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = try {
          gate.countDown(); gate.await()
          while (!done.get()) {
            attempt("pack")(spark.sql(
              "CALL grc.system.pack('m', 'src', 64, 128)"))
            attempt("vacuum") {
              spark.conf.set("spark.graft.vacuumGraceMs", "0")
              try spark.sql("CALL grc.system.vacuum('m', 'src')")
              finally spark.conf.unset("spark.graft.vacuumGraceMs")
            }
            Thread.sleep(15L)
          }
        } catch { case e: Throwable =>
          failures.add(s"maintenance thread: $e")
        }
      }))
    try tasks.foreach(_.get(900, java.util.concurrent.TimeUnit.SECONDS))
    finally pool.shutdown()
    val sec = (System.nanoTime() - t0) / 1e9

    require(failures.isEmpty, s"UNCLASSIFIED failures: $failures")
    // teardown: every clone dropped -> every pin released
    val fs = new org.apache.hadoop.fs.Path(dir.resolve("lake").toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcPath = new org.apache.hadoop.fs.Path(
      dir.resolve("lake").toString, "m/src")
    val pins = fs.listStatus(srcPath).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_GRAFT_CLONE_PIN_"))
    require(pins.isEmpty, s"pins leaked after all clones dropped: $pins")
    // source conservation through the final contract
    val row = spark.sql(
      "SELECT count(*) AS n, sum(k) AS s FROM grc.m.src").head()
    val expectN = seedN + ackedAppends.get()
    require(row.getLong(0) == expectN,
      s"source conservation violated: ${row.getLong(0)} != $expectN")
    // final zero-grace vacuum with no pins reclaims freely and the
    // table still serves the conserved rows
    spark.conf.set("spark.graft.vacuumGraceMs", "0")
    try spark.sql("CALL grc.system.vacuum('m', 'src')")
    finally spark.conf.unset("spark.graft.vacuumGraceMs")
    require(spark.sql("SELECT count(*) FROM grc.m.src").head()
      .getLong(0) == expectN, "post-vacuum source read drifted")

    import scala.jdk.CollectionConverters._
    val abortStr = aborts.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${v.sum()}""" }.mkString(",")
    spark.sparkContext.setLogLevel("OFF")
    println(s"""{"iters":$iters,"acked_appends":${ackedAppends.get()},""" +
      s""""clones":${clonesMade.get()},"pin_reads":${pinReads.get()},""" +
      s""""aborts":{$abortStr},"rows":${row.getLong(0)},"sec":${
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(sec))}}""")
    spark.stop()
  }
}

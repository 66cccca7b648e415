package graft.tools

import org.apache.spark.sql.SparkSession

/** DDL-vs-DML-vs-maintenance racing (`runMain graft.tools.StressRace
  * ddl [iters]`) — the round-10 DDL battery (RENAME COLUMN cycles,
  * ADD/DROP CONSTRAINT, ADD/DROP COLUMN) firing on ONE catalog table
  * while a DML thread runs UPDATEs/INSERTs and a maintenance thread
  * runs `CALL pack` back to back. The round-10 guards were only
  * spec-driven at chosen interleavings; this drives the scheduler's.
  *
  * Legal outcomes per operation, everything else a failure:
  *  - success;
  *  - a CLASSIFIED abort (pre-marker contract-fingerprint mismatch on
  *    the rewrite, constraint-metadata drift on the DML, the
  *    validation-window rollback on ADD CONSTRAINT, a full/rewrite
  *    race) — the operation applied NOTHING.
  *
  * The end-state checks are exact, not statistical:
  *  - conservation: count/sum(k) == seeded + acknowledged inserts
  *    (an aborted op that half-landed breaks this);
  *  - increment accounting: sum(a) == seed + acknowledged updates ×
  *    their fixed matched-row count (a double-applied or half-applied
  *    UPDATE breaks this);
  *  - schema consistency: the final contract is exactly the seeded
  *    one (every rename cycled home, every constraint dropped, every
  *    added column dropped again), the rename/check props parse, and
  *    a full-table read through the final contract succeeds.
  */
object StressRaceDdl {

  private def classified(e: Throwable): Boolean = {
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(c => " | " + msg(c)).getOrElse("")
    val m = msg(e)
    e.isInstanceOf[java.util.ConcurrentModificationException] ||
      Seq("raced", "changed under this", "changed while", "re-run",
        "rolled back", "retry", "in flight", "conflict",
        // a statement analyzed against a name the rename cycle just
        // moved — legal race, the caller retries under the other name
        "cannot be resolved", "UNRESOLVED_COLUMN", "no such column",
        "already exists",
        // INSERT analyzed against a schema the column pulse widened /
        // narrowed in the same instant — legal, nothing landed
        "INSERT_COLUMN_ARITY_MISMATCH")
        .exists(m.contains)
  }

  def run(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(8)
    val spark: SparkSession = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-race-ddl")
    // the documented concurrent-reader contract: GC grace above the
    // longest racing statement (the conf this harness forced into
    // existence — without it a CoW commit's zero-grace reclaim deletes
    // files a concurrent statement's resolved snapshot still reads)
    spark.conf.set("spark.graft.gcGraceMs", (15L * 60 * 1000).toString)
    spark.conf.set("spark.sql.catalog.grd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grd.root",
      dir.resolve("lake").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grd.m")
    spark.sql("CREATE TABLE grd.m.t (k BIGINT, a BIGINT, b STRING)")
    val seedN = 1000L
    spark.sql("INSERT INTO grd.m.t SELECT /*+ COALESCE(1) */ id, 1, " +
      s"concat('b', id) FROM range(0, $seedN)")
    val residues = 10L
    val matchedPerUpdate = seedN / residues

    val ackedUpdates = new java.util.concurrent.atomic.AtomicLong(0)
    val ackedInserts = new java.util.concurrent.atomic.AtomicLong(0)
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

    // the DML thread addresses `a` by whatever name is current — a
    // rename mid-statement classifies as an abort and retries once
    // under the fresh name (both outcomes legal; silence is not)
    def updateSql(name: String, r: Long) =
      s"UPDATE grd.m.t SET $name = $name + 1 " +
        s"WHERE k < $seedN AND k % $residues = $r"

    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val gate = new java.util.concurrent.CountDownLatch(3)
    val t0 = System.nanoTime()
    val tasks = Seq(
      // DML
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = try {
          gate.countDown(); gate.await()
          (0 until iters).foreach { i =>
            val r = i % residues
            val names = Seq("a", "a_tmp") // rename cycle states
            val okU = names.exists(n =>
              attempt("update")(spark.sql(updateSql(n, r))))
            if (okU) ackedUpdates.incrementAndGet()
            val base = 1000000L + i * 100L
            // explicit column list: arity independent of the DDL
            // thread's transient ADD COLUMN x<i>
            if (attempt("insert")(spark.sql(
              s"INSERT INTO grd.m.t (k, a, b) " +
                s"SELECT /*+ COALESCE(1) */ id, CAST(0 AS BIGINT), " +
                s"concat('i', id) FROM range($base, ${base + 100})")))
              ackedInserts.addAndGet(100L)
          }
        } catch { case e: Throwable =>
          failures.add(s"dml thread: $e")
        } finally { done.set(true) }
      }),
      // DDL
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = try {
          gate.countDown(); gate.await()
          (0 until iters).foreach { i =>
            // rename cycle home (each leg retried once — a leg can
            // abort against the pack's intent but not stay half-done)
            attempt("rename")(spark.sql(
              "ALTER TABLE grd.m.t RENAME COLUMN a TO a_tmp"))
            attempt("rename")(spark.sql(
              "ALTER TABLE grd.m.t RENAME COLUMN a_tmp TO a"))
            // constraint pulse (never violated by the DML: a only grows)
            val added = attempt("add_constraint")(spark.sql(
              s"ALTER TABLE grd.m.t ADD CONSTRAINT c$i CHECK (a >= 0)"))
            if (added) attempt("drop_constraint")(spark.sql(
              s"ALTER TABLE grd.m.t DROP CONSTRAINT c$i"))
            // column pulse
            val colAdded = attempt("add_column")(spark.sql(
              s"ALTER TABLE grd.m.t ADD COLUMN x$i BIGINT"))
            if (colAdded) attempt("drop_column")(spark.sql(
              s"ALTER TABLE grd.m.t DROP COLUMN x$i"))
          }
          // heal any mid-state the classified aborts left behind: the
          // final contract must be the seeded one
          if (spark.table("grd.m.t").schema.fieldNames.contains("a_tmp"))
            spark.sql("ALTER TABLE grd.m.t RENAME COLUMN a_tmp TO a")
          spark.table("grd.m.t").schema.fieldNames
            .filter(_.startsWith("x")).foreach(c => spark.sql(
              s"ALTER TABLE grd.m.t DROP COLUMN $c"))
          spark.sql("SHOW TBLPROPERTIES grd.m.t").collect()
            .map(r => r.getString(0)).filter(_.startsWith("graft.check."))
            .foreach(p => spark.sql("ALTER TABLE grd.m.t DROP " +
              s"CONSTRAINT ${p.stripPrefix("graft.check.")}"))
        } catch { case e: Throwable =>
          failures.add(s"ddl thread: $e")
        }
      }),
      // maintenance
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = try {
          gate.countDown(); gate.await()
          while (!done.get()) {
            attempt("pack")(spark.sql(
              "CALL grd.system.pack('m', 't', 64, 128)"))
            Thread.sleep(20L)
          }
        } catch { case e: Throwable =>
          failures.add(s"maintenance thread: $e")
        }
      }))
    try tasks.foreach(_.get(900, java.util.concurrent.TimeUnit.SECONDS))
    finally pool.shutdown()
    val sec = (System.nanoTime() - t0) / 1e9

    require(failures.isEmpty, s"UNCLASSIFIED failures: $failures")
    // schema consistency: the healed contract is the seeded one
    val fields = spark.table("grd.m.t").schema.fieldNames.toSeq
    require(fields == Seq("k", "a", "b"),
      s"final contract drifted: $fields")
    // conservation + increment accounting through the final contract
    val row = spark.sql(
      s"""SELECT count(*) AS n, sum(k) AS ks,
        sum(CASE WHEN k < $seedN THEN a ELSE 0 END) AS aseed,
        sum(CASE WHEN k >= $seedN THEN a ELSE 0 END) AS ains
        FROM grd.m.t""").head()
    val expectN = seedN + ackedInserts.get()
    require(row.getLong(0) == expectN,
      s"row conservation violated: ${row.getLong(0)} != $expectN")
    val expectASeed = seedN + ackedUpdates.get() * matchedPerUpdate
    require(row.getLong(2) == expectASeed,
      s"update accounting violated: sum(a|seed)=${row.getLong(2)} " +
        s"!= $expectASeed (${ackedUpdates.get()} acked updates x " +
        s"$matchedPerUpdate rows)")
    require(row.getLong(3) == 0L,
      s"inserted rows carry a=0: ${row.getLong(3)}")

    import scala.jdk.CollectionConverters._
    val abortStr = aborts.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${v.sum()}""" }.mkString(",")
    spark.sparkContext.setLogLevel("OFF")
    println(s"""{"iters":$iters,"acked_updates":${ackedUpdates.get()},""" +
      s""""acked_inserts":${ackedInserts.get()},"aborts":{$abortStr},""" +
      s""""rows":${row.getLong(0)},"sec":${
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(sec))}}""")
    spark.stop()
  }
}

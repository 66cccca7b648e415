package graft.tools

import graft.storage.Lakehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Concurrency stress for the MoR-DML-vs-maintenance protocol (the
  * full-intent marker, basis-gated conflict checks, rebaseLateDeltas'
  * wait-for-self-abort, rewriteDeletes' self-drop): W deleter threads
  * fire merge-on-read DELETEs — positional deletion vectors and
  * equality tombstones alternating — at ONE table while a maintenance
  * thread runs back-to-back compactions (FULL commits) and
  * rewrite-deletes against it. Every ordering the scheduler produces
  * must resolve to one of exactly two outcomes per DML: ACKNOWLEDGED
  * (its rows are dead forever — a compaction must never resurrect
  * them) or ABORTED with a conflict exception (its rows all survive —
  * a half-applied delete is a protocol bug). The conservation check is
  * exact: surviving keys == all keys minus the union of acknowledged
  * slices, no duplicates, via BOTH read paths.
  *
  * This is the adversarial composition the round-10 intent fix exists
  * for: a delta claiming above an in-flight full whose marker lands
  * after the delta's post-check — without the ROOT intent file (the
  * in-dir marker was wiped by the snapshot's own overwrite write) the
  * delta commits, masks nothing, and its acknowledged delete silently
  * resurrects.
  *
  * Usage: `sbt "runMain graft.tools.StressRace [writers] [opsPer]"`
  * (defaults 4x6; ~24 racing DMLs against a continuous compact/rewrite
  * loop). Any conservation violation throws — run repeatedly for more
  * interleavings.
  */
object StressRace {
  def main(args: Array[String]): Unit = {
    // `ddl` mode: ALTER battery racing DML and pack — see
    // [[StressRaceDdl]]
    if (args.headOption.contains("ddl")) {
      StressRaceDdl.run(args.drop(1)); return
    }
    // `clone` mode: shallow-clone create/read racing source
    // pack/vacuum — see [[StressRaceClone]]
    if (args.headOption.contains("clone")) {
      StressRaceClone.run(args.drop(1)); return
    }
    val writers = args.headOption.map(_.toInt).getOrElse(4)
    val opsPer = args.lift(1).map(_.toInt).getOrElse(6)
    val sliceRows = 50L
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-stress-race")
    // reader-vs-GC grace above the run length: a DML's masked scan reads
    // the snapshot a racing compaction supersedes — the documented
    // deployment contract (gcGraceMs must exceed the longest read)
    val lake = new Lakehouse(spark, dir.resolve("lake").toString,
      gcGraceMs = 15L * 60 * 1000)
    val schema = StructType.fromDDL("k BIGINT, v BIGINT")
    val totalSlices = writers * opsPer
    val total = totalSlices * sliceRows * 2 // half the keyspace stays
    (0 until 4).foreach(i => lake.append("t",
      spark.range(i * total / 4, (i + 1) * total / 4, 1L, 4)
        .select(col("id").as("k"), (col("id") * 7).as("v")),
      statsCols = Seq("k")))

    val t0 = System.nanoTime()
    val deleting = new java.util.concurrent.atomic.AtomicInteger(writers)
    val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
    val rewrites = new java.util.concurrent.atomic.AtomicInteger(0)
    val maintAborts = new java.util.concurrent.atomic.AtomicInteger(0)
    val retries = new java.util.concurrent.atomic.AtomicInteger(0)
    val readRetries = new java.util.concurrent.atomic.AtomicInteger(0)
    val acked = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val abandoned = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers + 1)
    try {
      val gate = new java.util.concurrent.CountDownLatch(writers + 1)
      val tasks = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            try {
              gate.countDown(); gate.await()
              (0 until opsPer).foreach { o =>
                val slice = w * opsPer + o
                val lo = slice * sliceRows
                val hi = lo + sliceRows
                var attempts = 0
                var done = false
                while (!done && attempts < 50) {
                  attempts += 1
                  try {
                    if (slice % 2 == 0)
                      lake.deleteRowsMoR("t", schema,
                        col("k") >= lo && col("k") < hi)
                    else
                      lake.deleteByKeys("t", schema,
                        (lo until hi).toDF("k"), () => ())
                    done = true
                    acked.add(slice)
                  } catch {
                    // conflict abort (protocol) OR a transient read
                    // failure (a racing writer's self-abort / rebase
                    // rename removed a dir this op's masked scan had
                    // resolved) — every DML failure path leaves NO
                    // durable commit (marker-atomic; post-marker aborts
                    // self-delete), so a retry is always sound
                    // the transient shapes are open-ended (Spark wraps
                    // the vanished-dir race as SparkException,
                    // AnalysisException or IllegalArgumentException
                    // depending on which layer trips first), so retry
                    // NonFatal wholesale — bounded at 50 attempts, a
                    // deterministic failure surfaces as `abandoned`
                    case e if scala.util.control.NonFatal(e) =>
                      retries.incrementAndGet()
                      if (!e.isInstanceOf[
                        java.util.ConcurrentModificationException])
                        readRetries.incrementAndGet()
                      Thread.sleep(40L + (slice * 13 + attempts * 29) % 90)
                  }
                }
                if (!done) abandoned.add(slice)
              }
            } catch {
              case e: Throwable =>
                val sw = new java.io.StringWriter()
                e.printStackTrace(new java.io.PrintWriter(sw))
                failures.add(s"deleter $w: $sw")
            } finally { deleting.decrementAndGet(); () }
        })
      } :+ pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          try {
            gate.countDown(); gate.await()
            // compactions and rewrites as long as DML runs, then one
            // final compaction so the end state is a folded snapshot —
            // masked rows must STAY dead through every fold
            // a maintenance pass ABORTING with a conflict is a correct
            // outcome (a full must yield to an acknowledged delta it
            // raced; a rewrite self-drops) — retry on the next tick,
            // exactly what a standing job does in production
            var i = 0
            def tick(): Unit =
              try {
                if (i % 2 == 0) {
                  lake.compact("t", schema, numFiles = 2, sortCols = Nil)
                  compactions.incrementAndGet()
                } else {
                  // low threshold so the rewrite actually fires between
                  // compactions (each fold resets per-file density)
                  if (lake.rewriteDeletes("t", schema, 0.02).nonEmpty)
                    rewrites.incrementAndGet()
                }
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  maintAborts.incrementAndGet()
              } finally i += 1
            while (deleting.get() > 0) {
              tick()
              // a breathing gap: continuous intents would starve the
              // DML side into pure retry; the protocol must be correct
              // under contention, liveness needs the gap
              Thread.sleep(150L)
            }
            // final fold: the end state must be a compacted snapshot
            // with every acknowledged mask still applied — retry past
            // any last-moment conflicts (the DML side is done, so this
            // terminates)
            var folded = false
            var tries = 0
            while (!folded && tries < 20) {
              tries += 1
              try {
                lake.compact("t", schema, numFiles = 2, sortCols = Nil)
                compactions.incrementAndGet()
                folded = true
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  maintAborts.incrementAndGet(); Thread.sleep(100L)
              }
            }
            require(folded, "final compaction never landed")
          } catch {
            case e: Throwable =>
              val sw = new java.io.StringWriter()
              e.printStackTrace(new java.io.PrintWriter(sw))
              failures.add(s"maintenance: $sw")
          }
      })
      tasks.foreach(_.get(900, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val sec = (System.nanoTime() - t0) / 1e9

    require(failures.isEmpty, s"thread failures: $failures")
    import scala.jdk.CollectionConverters._
    val deadKeys: Set[Long] = acked.asScala.toSet.flatMap { s: Int =>
      (s * sliceRows) until ((s + 1) * sliceRows) }
    val expectedAlive = (0L until total).toSet -- deadKeys
    def keysVia(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(col("k")).as[Long].collect().toSeq
    val got = keysVia(lake.read("t", schema))
    val gotV2 = keysVia(spark.read
      .format("graft.sources.LakehouseBatchProvider")
      .schema(schema).load(lake.tablePath("t")))
    val resurrected = got.toSet -- expectedAlive
    val overdeleted = expectedAlive -- got.toSet
    val dupes = got.groupBy(identity).count(_._2.sizeIs > 1)
    val v2Agrees = gotV2.sorted == got.sorted

    println(s"""{"writers":$writers,"ops_per_writer":$opsPer,""" +
      s""""acked":${acked.size()},"abandoned":${abandoned.size()},""" +
      s""""retries":${retries.get()},"read_retries":${
        readRetries.get()},"compactions":${compactions.get()},""" +
      s""""rewrites":${rewrites.get()},"maint_aborts":${
        maintAborts.get()},"alive_expected":${
        expectedAlive.size},"alive_read":${got.size},""" +
      s""""resurrected":${resurrected.size},"overdeleted":${
        overdeleted.size},"dupes":$dupes,"v2_agrees":$v2Agrees,"sec":${
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(sec))}}""")
    require(resurrected.isEmpty && overdeleted.isEmpty && dupes == 0 &&
      v2Agrees,
      s"CONSERVATION VIOLATED resurrected=${resurrected.take(5)} " +
        s"overdeleted=${overdeleted.take(5)} dupes=$dupes v2=$v2Agrees")
    spark.stop()
  }
}

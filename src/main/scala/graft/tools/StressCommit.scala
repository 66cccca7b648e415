package graft.tools

import graft.storage.Lakehouse
import org.apache.spark.sql.functions._

/** Sustained-load probe of the commit-conflict protocol: W appender
  * threads each land B batches into ONE lakehouse table while a
  * maintenance thread runs back-to-back compactions against it — the
  * "standing compaction job beside live ingest" composition that
  * silently lost appends under round-4's last-FULL-wins semantics.
  *
  * The conservation check is exact, not statistical: every appended row
  * carries a unique key, and at the end the table must contain EXACTLY
  * the appended key set — `lost` (keys missing: a shadowed delta the
  * rebase protocol failed to lift) and `dupes` (keys doubled: a delta
  * both folded into a snapshot and rebased above it) must both be 0,
  * across every interleaving the scheduler produces. Run it repeatedly
  * for more interleavings; any nonzero is a protocol bug, full stop.
  *
  * Usage: `sbt "runMain graft.tools.StressCommit [writers] [batches]"`
  * (defaults 4×6; ~25 racing commits against ~10 compactions).
  */
object StressCommit {
  def main(args: Array[String]): Unit = {
    // `cost` mode: per-commit fixed-cost pricing (file ops + wall
    // time per scenario) — see [[StressCommitCost]]
    if (args.headOption.contains("cost")) {
      StressCommitCost.run(args.drop(1)); return
    }
    val writers = args.headOption.map(_.toInt).getOrElse(4)
    val batches = args.lift(1).map(_.toInt).getOrElse(6)
    val rowsPer = 50
    val spark = graft.GraftSession.get()
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-stress-commit")
    val lake = new Lakehouse(spark, dir.resolve("lake").toString)

    def batchDf(w: Int, b: Int) = spark.createDataFrame(
      (0 until rowsPer).map(r => (f"w$w-b$b-r$r%03d", s"a$w"))
        .toDF("card_num", "account_num")
        .withColumn("create_dt",
          lit(java.sql.Timestamp.valueOf("2020-05-01 00:00:00")))
        .withColumn("update_dt", lit(null).cast("timestamp")).rdd,
      graft.model.Schemas.dimCards)

    val t0 = System.nanoTime()
    val appending = new java.util.concurrent.atomic.AtomicInteger(writers)
    val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers + 1)
    try {
      val gate = new java.util.concurrent.CountDownLatch(writers + 1)
      val tasks = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            try {
              gate.countDown(); gate.await()
              (0 until batches).foreach(b =>
                lake.append("dim_cards", batchDf(w, b)))
            } catch {
              case e: Throwable => failures.add(s"writer $w: $e")
            } finally { appending.decrementAndGet(); () }
        })
      } :+ pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          try {
            gate.countDown(); gate.await()
            // maintenance loops as long as ingest runs, then once more so
            // the final state is a compacted snapshot + rebased tail;
            // gate on table existence so the pre-first-append window
            // doesn't busy-spin no-op compactions into the counter
            while (appending.get() > 0) {
              if (lake.exists("dim_cards")) {
                lake.compact("dim_cards", numFiles = 2)
                compactions.incrementAndGet()
              } else Thread.sleep(5)
            }
            lake.compact("dim_cards", numFiles = 2)
            compactions.incrementAndGet()
          } catch { case e: Throwable =>
            val sw = new java.io.StringWriter()
            e.printStackTrace(new java.io.PrintWriter(sw))
            failures.add(s"maintenance: $sw")
          }
      })
      tasks.foreach(_.get(600, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val sec = (System.nanoTime() - t0) / 1e9

    require(failures.isEmpty, s"thread failures: $failures")
    val expected = (for {
      w <- 0 until writers; b <- 0 until batches; r <- 0 until rowsPer
    } yield f"w$w-b$b-r$r%03d").toSet
    val got = lake.read("dim_cards").select(col("card_num"))
      .as[String].collect().toSeq
    val lost = expected -- got.toSet
    val dupes = got.groupBy(identity).filter(_._2.sizeIs > 1).keySet
    val ghost = got.toSet -- expected

    spark.sparkContext.setLogLevel("OFF")
    println(s"""{"writers":$writers,"batches_per_writer":$batches,""" +
      s""""rows_expected":${expected.size},"rows_read":${got.size},""" +
      s""""compactions":${compactions.get()},"lost":${lost.size},""" +
      s""""dupes":${dupes.size},"ghost":${ghost.size},"sec":${
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(sec))}}""")
    require(lost.isEmpty && dupes.isEmpty && ghost.isEmpty,
      s"CONSERVATION VIOLATED lost=${lost.take(5)} dupes=${dupes.take(5)} " +
        s"ghost=${ghost.take(5)}")
    spark.stop()
  }
}

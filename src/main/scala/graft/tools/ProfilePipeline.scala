package graft.tools

import graft.etl.Etl
import graft.ingest.Ingest
import graft.mart.{Mart, MartStaging}
import graft.storage.Lakehouse

/** Dev diagnostic: per-phase wall-clock of the q49 3-day protocol replay
  * (ingest / normalize / mart per day), to locate where the ~14 s bench
  * time actually goes before optimizing any of it.
  *
  * Usage: runMain graft.tools.ProfilePipeline [scd2|scd1]
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val scd = if (args.nonEmpty) args(0) else "scd2"
    val scdType =
      if (scd == "scd1") MartStaging.Scd1Dims else MartStaging.Scd2Dims
    val spark = graft.GraftSession.get()
    val fix = "/root/repo/src/test/resources/fixtures"

    // per-phase job counter: which phase launches how many Spark jobs —
    // at fixture scale the per-job fixed cost dominates, so the job
    // census IS the phase cost model
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobs.get()
      val r = f
      Thread.sleep(150) // listener drain
      println(f"[profile] $label%-22s ${(System.nanoTime() - t0) / 1e9 - 0.15}%6.2f s  jobs=${jobs.get() - j0}")
      r
    }

    // two full replays: the first absorbs JIT/warm-up, the second is the
    // steady-state number the bench sees
    for (round <- 1 to 2) {
      println(s"[profile] === replay round $round ($scd) ===")
      val dir = java.nio.file.Files.createTempDirectory("graft-profile")
      val lake = new Lakehouse(spark, dir.resolve("lake").toString)
      val t0 = System.nanoTime()
      (1 to 3).foreach { day =>
        timed(s"day$day ingest")(
          Ingest.loadDayFromParquet(lake, s"$fix/day$day.parquet"))
        timed(s"day$day normalize")(Etl.normalizeTransactions(lake))
        timed(s"day$day mart")(
          Mart.addReportData(lake, scdType, graft.ReplayDump.FixedClock))
      }
      timed("final report read")(lake.read("report").count())
      println(f"[profile] TOTAL ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}

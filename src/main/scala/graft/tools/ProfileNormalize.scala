package graft.tools

import graft.etl.{Entities, Etl, Scd1, Scd2}
import graft.ingest.Ingest
import graft.mart.{Mart, MartStaging}
import graft.storage.Lakehouse
import org.apache.spark.sql.functions._

/** Dev diagnostic: per-load wall-clock inside one normalize pass —
  * which of the 9 concurrent loads (4 SCD2 + fact + 4 SCD1) carries the
  * 6-10 s the phase profiler shows, run SERIALLY so each number is
  * uncontended.
  *
  * Usage: runMain graft.tools.ProfileNormalize
  */
object ProfileNormalize {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val fix = "/root/repo/src/test/resources/fixtures"

    // per-job callsite trace (SPARK_GRAFT_TRACE_JOBS=1): WHAT launches
    // each of the replay's ~240 jobs — the census said how many, this
    // says who
    if (sys.env.get("SPARK_GRAFT_TRACE_JOBS").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            println(s"[job] ${j.jobId} tasks=${
              j.stageInfos.map(_.numTasks).sum} ${
              j.stageInfos.lastOption.map(si => si.name + " | " +
                si.details.linesIterator.find(l =>
                  l.contains("graft") && !l.contains("tools.Profile"))
                  .getOrElse("")).getOrElse("?")}")
        })

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profnorm] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"[profnorm] === round $round ===")
      val dir = java.nio.file.Files.createTempDirectory("graft-profnorm")
      val lake = new Lakehouse(spark, dir.resolve("lake").toString)
      (1 to 3).foreach { day =>
        timed(s"day$day ingest")(
          Ingest.loadDayFromParquet(lake, s"$fix/day$day.parquet"))
        val landing = lake.read("denormalized").cache()
        timed(s"day$day landing count")(landing.count())
        Entities.all.foreach { spec =>
          timed(s"day$day scd2 ${spec.scd2Dim}") {
            Scd2(lake, landing, spec)
          }
        }
        timed(s"day$day fact append") {
          lake.appendPartitionedByDay("fact_transactions",
            landing.select(col("trans_id"), col("trans_date"),
              col("card_num"), col("oper_type"),
              col("amount").as("amt"), col("oper_result"),
              col("terminal")),
            tsCol = "trans_date")
        }
        Entities.all.foreach { spec =>
          timed(s"day$day scd1 ${spec.scd1Dim}") {
            Scd1(lake, landing, spec)
          }
        }
        timed(s"day$day truncate")(lake.truncate("denormalized"))
        landing.unpersist()
        timed(s"day$day mart")(
          Mart.addReportData(lake, MartStaging.Scd2Dims,
            graft.ReplayDump.FixedClock))
      }
    }
    spark.stop()
  }
}

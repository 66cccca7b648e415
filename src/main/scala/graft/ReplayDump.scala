package graft

import graft.etl.Etl
import graft.ingest.Ingest
import graft.mart.{Mart, MartStaging}
import graft.storage.Lakehouse

/** Dev tool: replay the reference protocol (3 fixture days by default,
  * 4 to include the synthetic churn day) and dump every table for the
  * DuckDB differential comparison (tools/replay_duckdb.py).
  *
  * Usage: runMain graft.ReplayDump <scd2|scd1> <outDir> [days]
  */
object ReplayDump {
  val FixedClock: java.sql.Timestamp =
    java.sql.Timestamp.valueOf("2020-05-09 12:00:00")

  /** The reference protocol itself — `days` daily fixture feeds, each
    * load (insert_from_excel.py) → normalize (ETL.sql) → mart
    * (Data_mart.sql). The ONE definition shared by ReplayDump,
    * RenderReport and the q49/q50 driver queries (PipelinePack), so the
    * protocol and its clock cannot drift between the replay tooling and
    * the oracle-checked queries.
    */
  def replay(lake: Lakehouse, scdType: MartStaging.ScdType,
      clock: java.sql.Timestamp = FixedClock, days: Int = 3,
      fixtureDir: String = "src/test/resources/fixtures"): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    // per-day phase wall-times to stderr (round-11 verdict item 1):
    // when a bench artifact shows an inflated q49/q50, the grep-able
    // [replay] lines say WHICH day/phase carried the time — paired
    // with ProtocolTelemetry this makes a driver-side stall
    // self-diagnosing instead of unreproducible
    def timed[A](day: Int, phase: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[replay] day$day $phase ${
        (System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def ingest(day: Int): Unit = timed(day, "ingest")(
      Ingest.loadDayFromParquet(lake, s"$fixtureDir/day$day.parquet"))
    ingest(1)
    (1 to days).foreach { day =>
      timed(day, "normalize")(Etl.normalizeTransactions(lake))
      // day N's mart and day N+1's ingest touch DISJOINT tables (mart:
      // fact/dims/report, ingest: the landing normalize just truncated)
      // — overlap them. Every per-step table state the protocol defines
      // is identical to the serial order; only wall clock changes.
      val next =
        if (day < days) Some(Future(ingest(day + 1))) else None
      timed(day, "mart")(Mart.addReportData(lake, scdType, clock))
      next.foreach(Await.result(_, Duration.Inf))
    }
  }

  def main(args: Array[String]): Unit = {
    val (scd, outDir) = (args(0), args(1))
    val days = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.get()
    val lake = new Lakehouse(spark, s"$outDir/lake")
    val scdType =
      if (scd == "scd2") MartStaging.Scd2Dims else MartStaging.Scd1Dims
    replay(lake, scdType, days = days)
    val dims =
      if (scd == "scd2")
        Seq("dim_terminals_hist", "dim_cards_hist", "dim_accounts_hist",
          "dim_clients_hist")
      else
        Seq("dim_terminals", "dim_cards", "dim_accounts", "dim_clients")
    ("report" +: "fact_transactions" +: dims).foreach { t =>
      lake.read(t).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$t")
    }
    spark.stop()
  }
}

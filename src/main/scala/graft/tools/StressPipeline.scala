package graft.tools

import graft.etl.Etl
import graft.ingest.Ingest
import graft.mart.{Mart, MartStaging}
import graft.storage.Lakehouse
import org.apache.spark.sql.functions._

/** Reproducible pipeline stress run: the reference day-3 fixture scaled
  * `xFactor`× (unique ids per replica, shifted amounts so change detection
  * fires) through the full normalize + mart path. Prints one JSON line
  * with the landing row count and stage timings.
  *
  * Usage: `sbt "runMain graft.tools.StressPipeline [xFactor]"` (default 82
  * ≈ 202k rows, the README number).
  */
object StressPipeline {
  def main(args: Array[String]): Unit = {
    val x = args.headOption.map(_.toInt).getOrElse(82)
    val spark = graft.GraftSession.get()
    val lake = new Lakehouse(spark,
      java.nio.file.Files.createTempDirectory("stress").toString)

    // test-resource fixture addressed by path: this main lives in the
    // production tree, which doesn't see test resources on its classpath
    val day3 = "src/test/resources/fixtures/day3.parquet"
    val base = spark.read.parquet(day3)
    val replicas = spark.range(0, x).select(col("id").as("_rep"))
    val scaled = base.crossJoin(replicas)
      .withColumn("trans_id", concat_ws("_", col("trans_id"), col("_rep")))
      .withColumn("card_num", concat_ws("_", col("card_num"), col("_rep")))
      .withColumn("account", concat_ws("_", col("account"), col("_rep")))
      .withColumn("client", concat_ws("_", col("client"), col("_rep")))
      .withColumn("terminal", concat_ws("_", col("terminal"), col("_rep")))
      .withColumn("amount", col("amount") + col("_rep"))
      .drop("_rep")

    import StressUtil.{timedValue => timed}
    val (n, tLoad) = timed(Ingest.loadDayCounted(lake, scaled))
    val (_, tNorm) = timed(Etl.normalizeTransactions(lake))
    val (_, tMart) = timed(Mart.addReportData(lake, MartStaging.Scd2Dims,
      java.sql.Timestamp.valueOf("2020-05-09 12:00:00")))
    println(f"""{"landing_rows":$n,"load_sec":$tLoad%.1f,"normalize_sec":$tNorm%.1f,"mart_sec":$tMart%.1f}""")
    spark.stop()
  }
}

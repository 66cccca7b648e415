package graft.tools

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Reproducible sketch-operator stress run: the sf0.1 events table
  * scaled `xFactor`× (user ids shifted per replica, so the user space
  * grows with the data while per-user counts stay at the base
  * distribution) through the sketch family — CMS heavy hitters, Bloom
  * semi-join pruning (small side ≈ 1% of users), HLL daily→monthly
  * rollup. Prints one JSON line with row count and per-stage timings;
  * stages drain through the noop sink.
  *
  * Usage: `sbt "runMain graft.tools.StressSketches [xFactor]"`
  * (default 20 ≈ 2M events / 20× the bench gate).
  */
object StressSketches {
  def main(args: Array[String]): Unit = {
    val x = args.headOption.map(_.toInt).getOrElse(20)
    val spark = graft.GraftSession.get()

    val base = graft.Tables.events(spark, "/root/testdata/sf0.1")
    val replicas = spark.range(0, x).select(col("id").as("_rep"))
    val scaled = base.crossJoin(replicas)
      .select((col("user_id") + col("_rep") * lit(1000000L)).as("user_id"),
        col("ts"), col("event_type"))

    import StressUtil.{timed, drain}

    val n = scaled.count()
    // eps sizing: overestimate ≤ eps·N must stay well under minCount —
    // at 2M rows eps=1e-5 gives ≤20 slack against the 80 threshold with
    // a 5.6 MB sketch; 1e-6 (56 MB) costs ~25× build time for nothing
    val tCms = timed(drain(
      Sketches.cmsHeavyHitters(scaled.select(col("user_id")), "user_id",
        minCount = 80, eps = 1e-5)))
    val small = scaled.select(col("user_id")).distinct()
      .filter(pmod(col("user_id"), lit(97L)) === 0L)
    val tBloom = timed(drain(
      Sketches.bloomSemiJoin(scaled, small, "user_id",
        expectedItems = 1 << 20)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))))
    val tHll = timed(drain(
      Sketches.hllMonthlyUniques(scaled, "ts", "user_id")))
    println(
      f"""{"rows":$n,"x":$x,"cms_sec":$tCms%.1f,"bloom_sec":$tBloom%.1f,"hll_sec":$tHll%.1f}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` on local[32] and prints ONE JSON line — the very
  * last stdout line, after logging is silenced — so the driver's tail
  * capture gets it whole (BENCH_r01/r02 both lost the head of the JSON to
  * post-print shutdown noise → `parsed: null`).
  *
  * Each query is forced through the `noop` sink — a plain `count()` would
  * let Catalyst prune the projected columns (windows, hashes, dot
  * products) and time a skeleton of the real plan.
  *
  * Variance discipline (round-2 verdict item 8): the whole suite is swept
  * `SPARK_GRAFT_BENCH_RUNS` times (default 3); the headline per-query
  * number is the MEDIAN, with per-run times and the min persisted to
  * `BENCH_DETAIL.json` in the cwd. A single-run outlier (q15 in round 2:
  * 3.6 s vs 0.48 s in round 1, never reproduced) can no longer define a
  * query's number. The q49/q50 protocol replays run once per bench — each
  * is a ~40-job end-to-end ETL replay, not a scan-shaped query; sweeping
  * them would triple bench wall-clock for no variance insight.
  */
object Bench {

  /** Full pipeline replays: timed, but once per bench run (see above). */
  private val RunOnce = Set("q49_pipeline_scd2", "q50_pipeline_scd1")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1: $runs")
    val spark: SparkSession = GraftSession.get()

    // warm the JVM + parquet footers once per plan shape (not timed, tiny
    // scale factor) so first-heavy-query JIT noise doesn't land on the
    // first timed query: agg, window, broadcast join, HOF-lambda LSH,
    // vector top-k aggregator
    Seq("q01_agg_grain_min", "q34_rank_family", "q05_join5_revenue",
      "d04_minhash_pairs", "e03_lsh_topk",
      // the streaming engine (micro-batch planner, state stores) and the
      // iterative-CC loop JIT separately from the batch shapes
      "s01_stream_hourly_counts", "d10_dedup_components")
      .foreach(n => SparkEntry.queries.get(n).foreach { f =>
        try f(spark, "/root/testdata/sf0.001").write
          .format("noop").mode("overwrite").save()
        catch { case _: Throwable => () } // warm-up failures surface in the timed run
      })

    val names = SparkEntry.queries.keys.toSeq.sorted
    // per-query timings across sweeps; -1 is the machine-readable failure
    // sentinel (stderr drowns in Spark log noise) — a crashed query must
    // not read as a speedup
    val times = scala.collection.mutable.Map(
      names.map(_ -> Vector.empty[Double]): _*)
    for (r <- 1 to runs; name <- names
         if r == 1 || !RunOnce.contains(name)) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val sec =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      times(name) :+= sec
    }

    def median(v: Seq[Double]): Double = {
      val s = v.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // a query failed if ANY sweep failed — partial failure must not hide
    // behind a clean median of the surviving sweeps
    val failedNames = names.filter(n => times(n).exists(_ < 0))
    val med = names.map(n => n ->
      (if (failedNames.contains(n)) -1.0 else median(times(n)))).toMap
    val total = names.map(med).filter(_ >= 0).sum

    // Locale.ROOT: a comma-decimal default locale would render 0,123 and
    // corrupt both JSON artifacts
    def f3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    def jmap(m: Seq[(String, String)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val detail = jmap(names.map { n =>
      val v = times(n)
      n -> jmap(Seq(
        "runs" -> v.map(f3).mkString("[", ",", "]"),
        "min" -> f3(if (v.exists(_ < 0)) -1.0 else v.min),
        "median" -> f3(med(n))))
    })
    // the detail sidecar is best-effort: an unwritable cwd must not cost
    // the headline line the driver parses
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"sf":"$sfDir","sweeps":$runs,"queries":$detail}""")
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] BENCH_DETAIL.json not written: $e")
    }

    val qs = jmap(names.map(n => n -> f3(med(n))))
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"failed":${failedNames.size},"runs":$runs,"sf":"$sfDir"}"""
    // silence everything BEFORE printing so no shutdown log lands after
    // the JSON line in a merged stdout+stderr capture; stop() is guarded
    // for the same reason — the line must print even if shutdown throws
    spark.sparkContext.setLogLevel("OFF")
    try spark.stop()
    catch { case _: Throwable => () }
    println(line)
  }
}

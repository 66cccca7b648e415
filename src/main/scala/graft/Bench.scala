package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` on local[32] and prints ONE JSON line.
  *
  * Each query is forced through the `noop` sink — a plain `count()` would
  * let Catalyst prune the projected columns (windows, hashes, dot
  * products) and time a skeleton of the real plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // -1 is the machine-readable failure sentinel (stderr drowns in
      // Spark log noise) — a crashed query must not read as a speedup
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    // total sums ONLY successful queries (a -1 sentinel summed in would
    // make a crash read as a speedup); failures are counted separately
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}

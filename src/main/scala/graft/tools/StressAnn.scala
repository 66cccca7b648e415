package graft.tools

import graft.ops.VectorOps
import org.apache.spark.sql.functions._

/** Reproducible ANN stress run (round-2 verdict item 4): the sf0.1
  * embeddings table scaled `xFactor`× with unique vec_ids AND per-replica
  * cell labels — so the IVF cell count grows with the corpus while the
  * per-cell list size stays constant, which is exactly the 100-TB layout
  * (more inverted lists, not fatter ones). Times the three index-shaped
  * searchers — IVF (e05), PQ/ADC (e07), IVF+PQ (e08) — against a fixed
  * 5-query set, forced through the noop sink.
  *
  * Expected shape: ≤ linear in corpus size for e05/e08 (probe count is
  * fixed, probed mass per query is constant-per-cell × nProbe, but the
  * centroid/codebook build is a full corpus agg), and ~linear for e07
  * (ADC scans every candidate's codes — PQ without IVF is the
  * memory-bound full-scan family member by design).
  *
  * Usage: `sbt "runMain graft.tools.StressAnn [xFactors...]"` (default
  * `1 10 30`).
  */
object StressAnn {
  def main(args: Array[String]): Unit = {
    val xs = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 30)
    val spark = graft.GraftSession.get()

    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n0 = base.count()
    val nLabels = base.select(col("label")).distinct().count()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val out = xs.map { x =>
      val replicas = spark.range(0, x).select(col("id").as("_rep"))
      val corpus = base.crossJoin(replicas).select(
        (col("vec_id") + col("_rep") * lit(n0)).as("id"),
        col("embedding").as("vec"),
        (col("label") + (col("_rep") * lit(nLabels)).cast("int")).as("label"))
        // one materialization point: all three searchers + the query
        // probe derive from this frame; without it the crossJoin+scan
        // re-runs inside every centroid/codebook/code branch
        .localCheckpoint(eager = true)
      val q = corpus.filter(col("id") < 5)
      val n = corpus.count()
      val tIvf = timed(drain(VectorOps.ivfTopK(q, corpus, k = 5, nProbe = 2)))
      val tPq = timed(drain(VectorOps.pqTopK(q, corpus, k = 5)))
      val tIvfPq = timed(drain(
        VectorOps.ivfPqTopK(q, corpus, k = 5, nProbe = 2)))
      f"""{"x":$x,"vectors":$n,"ivf_sec":$tIvf%.1f,"pq_sec":$tPq%.1f,"ivfpq_sec":$tIvfPq%.1f}"""
    }
    out.foreach(println)
    spark.stop()
  }
}

package graft.ops

import java.io.ByteArrayOutputStream

import graft.functions.{BloomMightContain, CmsEstimate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-accelerated operators: Bloom semi-join pruning, Count-Min
  * heavy hitters, HLL mergeable distinct-count rollups.
  *
  * All three follow the same scale contract: the sketch is the
  * *accelerator*, never the answer. Final results are exact (bloom false
  * positives die in the exact join; CMS overestimates are re-counted
  * exactly; HLL estimates are emitted next to the exact count as a
  * tolerance check), so every query built on these stays DuckDB-oracle
  * checkable — the same exactness-first trick as e02's integer dots.
  *
  * Why this matters at 100 TB:
  *   - bloomSemiJoin: a semi join `big ⋉ small` normally shuffles the
  *     full big side (or scans it against a broadcast hash of *all* small
  *     keys). A ~MB bloom built in one pass over `small` rides the plan
  *     to every scan task and drops non-matching rows at the scan, so
  *     the join (and everything downstream) sees only candidate rows.
  *     Spark's runtime bloom injection does this adaptively within one
  *     query; the explicit operator covers build-once/probe-many reuse.
  *   - cmsHeavyHitters: finding keys with count ≥ t by `groupBy(key)`
  *     shuffles every distinct key (at corpus scale: billions of group
  *     states for a handful of answers). The CMS pass is shuffle-free
  *     (sketches merge associatively), and since CMS never
  *     underestimates, `estimate ≥ t` keeps a superset of the true heavy
  *     hitters — the exact re-count then shuffles only candidate rows.
  *     Size eps ≪ t/N or the prefilter keeps everything (still correct,
  *     just useless).
  *   - hllMonthlyUniques: per-day HLL sketches are tiny (KB), mergeable,
  *     and re-aggregable — the "store sketches, roll up later" pattern
  *     that exact distinct counts famously lack (union ≠ sum). The
  *     monthly estimate comes from unioning day sketches without
  *     re-scanning the raw data.
  */
object Sketches {

  private def bytesOf(writeTo: java.io.OutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    writeTo(bos)
    bos.toByteArray
  }

  /** Exact semi-join `big ⋉ small` on `key`, bloom-prefiltered.
    *
    * `expectedItems`/`fpp` size the filter (bits ≈ -n·ln(fpp)/ln²2); an
    * undersized filter degrades fpp, never correctness. NULL keys never
    * match (SQL semi-join semantics): the probe's null-safe eval yields
    * NULL which the filter drops.
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val keys = small.select(col(key)).na.drop(Seq(key))
    val bloom = keys.stat.bloomFilter(key, expectedItems, fpp)
    val pruned = big.filter(BloomMightContain(col(key), bytesOf(bloom.writeTo)))
    pruned.join(keys.distinct(), Seq(key), "left_semi")
  }

  /** Keys of `df` with count ≥ `minCount`, exactly, via a CMS prefilter.
    * Output: (key, cnt) with the exact count.
    */
  def cmsHeavyHitters(df: DataFrame, key: String, minCount: Long,
      eps: Double = 1e-5, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    // build via the codegen count_min_sketch AGGREGATE (partial/merge
    // map-side, columnar input) instead of DataFrameStatFunctions'
    // RDD-of-Rows aggregate — same CountMinSketchImpl serialization
    // (merge is commutative addition, so the sketch is byte-identical
    // regardless of build path), no boxed-row pass over the corpus
    val cmsBytes = df.na.drop(Seq(key)).agg(
      org.apache.spark.sql.GraftColumnBridge.toColumn(
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .CountMinSketchAgg(
            org.apache.spark.sql.GraftColumnBridge.toExpr(col(key)),
            org.apache.spark.sql.catalyst.expressions.Literal(eps),
            org.apache.spark.sql.catalyst.expressions.Literal(confidence),
            org.apache.spark.sql.catalyst.expressions.Literal(seed))
          .toAggregateExpression()).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    // NULL keys bypass the sketch (CmsEstimate(null) is null, which the
    // >= filter would silently DROP — losing a heavy null group from an
    // "exact" answer); they ride straight to the exact aggregate, one
    // group's worth of extra rows
    df.filter(col(key).isNull ||
        CmsEstimate(col(key), cmsBytes) >= minCount)
      .groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Monthly distinct `keyCol` counts: exact, plus an HLL-rollup estimate
    * checked to `relErr` (emitted as a boolean so the result stays
    * deterministic and oracle-comparable). The estimate path never
    * touches raw rows twice — day sketches union into months.
    */
  def hllMonthlyUniques(df: DataFrame, dateCol: String, keyCol: String,
      relErr: Double = 0.05): DataFrame = {
    val daily = df
      .groupBy(to_date(col(dateCol)).as("_d"))
      .agg(hll_sketch_agg(col(keyCol)).as("_sk"))
    val monthly = daily
      .groupBy(trunc(col("_d"), "month").as("month"))
      .agg(hll_sketch_estimate(hll_union_agg(col("_sk"))).as("_approx"))
    val exact = df
      .groupBy(trunc(to_date(col(dateCol)), "month").as("month"))
      .agg(count_distinct(col(keyCol)).as("exact_uniques"))
    exact.join(monthly, Seq("month"))
      .select(col("month"), col("exact_uniques"),
        (abs(col("_approx") - col("exact_uniques")) <=
          col("exact_uniques").cast("double") * relErr).as("hll_ok"))
  }
}

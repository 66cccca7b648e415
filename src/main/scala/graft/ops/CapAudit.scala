package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** No-silent-caps audit for the megabucket guards.
  *
  * Every bucketed pair generator (minhash/simhash/ngram LSH, embedding
  * LSH) skips buckets above a size cap — the standard production defense
  * against a degenerate bucket's m² pair blow-up. At 100 TB that skip is
  * a recall trade an operator must be able to AUDIT, not discover: this
  * helper pins dropped-mass metrics onto the bucket-count aggregate the
  * guard already computes, via Spark's `Observation` API — collected
  * during the action itself, zero extra passes over the data.
  *
  * Metrics (all over (bucket-key) groups, so "rows" are bucket ENTRIES —
  * for banded schemes a document contributes one entry per band):
  * `total_buckets`, `total_rows`, `dropped_buckets`, `dropped_rows`.
  * "dropped" means OVER-CAP: with `megabucketStar = true` those buckets
  * are star-connected (O(m) hub pairs) rather than skipped, and the
  * metric then quantifies the clique→star downgrade instead of a loss.
  *
  * Usage: pass a fresh `Observation` per operator call (`Observation` is
  * single-use by Spark contract); `obs.get` is available as soon as the
  * operator returns — e.g. dropped-fraction = dropped_rows / total_rows.
  */
object CapAudit {

  /** Observe dropped-mass metrics on a bucket-counts frame (must carry
    * the groupBy-count `count` column); identity when `audit` is None.
    *
    * Audit mode materializes the counts frame eagerly (localCheckpoint):
    * the pair generators feed it into a SELF-join, which duplicates the
    * observed subtree into both branches — AQE then broadcasts one copy
    * and the CollectMetrics node never reports on the main query (the
    * Observation resolves to an empty row). The checkpoint runs the
    * observed aggregate exactly once, up front, in its own job.
    *
    * COST: that separate job re-derives the upstream signature pipeline
    * (exchange reuse does not span jobs), so an audited run pays roughly
    * one extra pass over the corpus — measured ~2× on StressCorpus ×30.
    * Audit on sampled/periodic runs, not in the steady-state hot path;
    * the un-audited operators are unchanged.
    */
  def observed(bucketCounts: DataFrame, maxBucket: Int,
      audit: Option[Observation]): DataFrame =
    audit.fold(bucketCounts)(o => bucketCounts.observe(o,
      count(lit(1)).as("total_buckets"),
      coalesce(sum(col("count")), lit(0L)).as("total_rows"),
      count(when(col("count") > maxBucket, lit(1))).as("dropped_buckets"),
      coalesce(sum(when(col("count") > maxBucket, col("count"))), lit(0L))
        .as("dropped_rows"))
      .localCheckpoint(eager = true))
}

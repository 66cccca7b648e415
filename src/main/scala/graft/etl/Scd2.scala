package graft.etl

import graft.storage.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-Type-2 load: staging derivation + close/insert merge.
  *
  * Reference shape (per entity, ETL.sql:86-119 for terminals):
  *   1. staging = landing grain (GROUP BY all dim attrs, MIN(trans_date) as
  *      start_dt) + `lead(start_dt) over (partition by key order by
  *      start_dt)` as end_dt — multiple intra-batch versions chain up;
  *   2. UPDATE: open dim rows (end_dt IS NULL) whose key has a *new* combo
  *      (NOT EXISTS on the full attribute set) get end-dated with the
  *      staged current version's start_dt (the `sc.end_dt is null` guard);
  *   3. INSERT: all staged combos not already present (same NOT EXISTS).
  *
  * Known reference quirk, preserved: a combo that re-appears after an
  * intermediate version (A→B→A across batches) is filtered by the NOT
  * EXISTS, so the returning A is neither inserted nor closes B — history
  * stays stale. Oracle parity beats repair (SURVEY.md §7.5.3).
  *
  * Scale notes: grain agg and window both hash-partition on the entity key
  * (one shuffle, Catalyst reuses it); the anti-join/merge joins are
  * key-equi and AQE-broadcast when a side is small. The merge result is a
  * full dim snapshot rewrite — at 100 TB dims this would be a Delta MERGE,
  * but dims here are orders of magnitude smaller than the fact.
  */
object Scd2 {

  /** Shared per-entity grain (ETL.sql:11-84 / :243-354 — both staging
    * families start from the SAME `GROUP BY all-attrs, MIN(trans_date)`
    * aggregate). Pre-hashing on the entity KEY makes this ONE exchange
    * serve the whole per-entity chain: the key is an attr, so
    * HashPartitioning(key) satisfies the grouping's distribution
    * (no second shuffle for the agg), and every downstream
    * key-partitioned window (SCD2's lead, SCD1's last/min/max) and
    * SCD1's dropDuplicates(key) reuse it exchange-free. Previously each
    * family recomputed the grain with two shuffles of its own — 4
    * shuffles per entity per batch; now 1. [[Etl.normalizeTransactions]]
    * caches the result and feeds both families.
    */
  def grain(landing: DataFrame, spec: EntitySpec): DataFrame = {
    val srcKey = spec.attrs.find(_._2 == spec.key).get._1
    landing.repartition(col(srcKey))
      .groupBy(spec.attrs.map { case (src, _) => col(src) }: _*)
      .agg(min(col("trans_date")).as("_grain_dt"))
      .select(spec.attrs.map { case (src, dst) => col(src).as(dst) } :+
        col("_grain_dt"): _*)
  }

  /** Staging from a shared grain: lead() end-dating (ETL.sql:86-119). */
  def stagingFromGrain(grain: DataFrame, spec: EntitySpec): DataFrame = {
    val g = grain.withColumnRenamed("_grain_dt", "start_dt")
    val w = Window.partitionBy(col(spec.key)).orderBy(col("start_dt"))
    g.withColumn("end_dt", lead(col("start_dt"), 1).over(w))
  }

  /** Staging: grain + lead() end-dating (ETL.sql:11-84). */
  def staging(landing: DataFrame, spec: EntitySpec): DataFrame =
    stagingFromGrain(grain(landing, spec), spec)

  /** Close + insert merge; returns the new dim snapshot (caller persists). */
  def merge(dim: DataFrame, stg: DataFrame, spec: EntitySpec): DataFrame = {
    val attrCols = spec.attrs.map(_._2)
    // NOT EXISTS on the full attribute set (null-rejecting equality, as in
    // GP: a NULL attr never matches ⇒ row counts as new).
    val newRows = stg.as("s").join(dim.as("c"),
      attrCols.map(a => col(s"s.$a") === col(s"c.$a")).reduce(_ && _),
      "left_anti")

    // The staged *current* version (end_dt IS NULL) end-dates the open dim
    // row of the same key (ETL.sql:86-104).
    val closers = newRows.filter(col("end_dt").isNull)
      .select(col(spec.key).as("_k"), col("start_dt").as("_new_end"))

    // no forced broadcast: closers scales with the batch's changed keys
    // (a bulk attribute change could make it dim-sized); AQE broadcasts
    // at runtime when it is actually small
    val closed = dim.as("c")
      .join(closers, col(spec.key) === col("_k"), "left_outer")
      .withColumn("end_dt",
        when(col("_k").isNotNull && col("end_dt").isNull, col("_new_end"))
          .otherwise(col("end_dt")))
      .drop("_k", "_new_end")

    closed.unionByName(
      newRows.select((attrCols :+ "start_dt" :+ "end_dt").map(col): _*))
  }

  /** One entity: staging → merge → snapshot overwrite. */
  def apply(lake: Lakehouse, landing: DataFrame, spec: EntitySpec): Unit =
    applyFromGrain(lake, grain(landing, spec), spec)

  /** Same, from a pre-computed (typically cached) shared grain. */
  def applyFromGrain(lake: Lakehouse, grain: DataFrame,
      spec: EntitySpec): Unit = {
    val stg = stagingFromGrain(grain, spec)
    val next = merge(lake.read(spec.scd2Dim), stg, spec)
    // REBALANCE before the snapshot write: the merge plan ends in
    // map-side joins/unions with no final exchange, so without this the
    // write inherits the upstream task count (~32 near-empty files per
    // snapshot — at the metered op bill, ~7 commit-protocol fs ops per
    // file PLUS a footer getFileStatus+open on every subsequent read).
    // AQE sizes the exchange output to advisoryPartitionSizeInBytes:
    // one file for an entity-cardinality dim, proportionally many for a
    // 100 TB one — size-aware, not a hardcoded coalesce(1).
    lake.overwrite(spec.scd2Dim, next.hint("rebalance"))
  }
}

package graft.etl

import graft.storage.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-Type-1 load: latest-attributes-win staging + upsert.
  *
  * Reference shape (ETL.sql:243-446):
  *   1. staging = the same grain agg as SCD2 (MIN(trans_date) as
  *      create_dt), then per key: `last_value(attr)` over a full frame
  *      ordered by create_dt (latest combo wins), `min(create_dt)` as
  *      create_dt, and update_dt = max(create_dt) unless the key has a
  *      single version (then NULL) — ETL.sql:252-260;
  *   2. UPDATE: keys whose compared attrs differ (null-rejecting `!=`
  *      OR-chain — NULL attrs never register as changed, ETL.sql:362) get
  *      the staged attrs and update_dt = coalesce(stg.update_dt,
  *      stg.create_dt);
  *   3. INSERT: keys not in the dim (NOT EXISTS on key only).
  *
  * Quirks preserved: only `terminals` staging deduplicates (SELECT
  * DISTINCT, ETL.sql:250) — the other entities can insert duplicate rows
  * for a key with >1 intra-batch combo; and the terminals UPDATE never
  * touches terminal_type (spec.scd1Updatable).
  */
object Scd1 {

  /** Staging (ETL.sql:243-354). Window order is `create_dt` alone, as in
    * the reference — ties across distinct combos with equal create_dt are
    * engine-order-dependent there and here.
    */
  def staging(landing: DataFrame, spec: EntitySpec): DataFrame =
    stagingFromGrain(Scd2.grain(landing, spec), spec)

  /** Staging from the shared per-entity grain ([[Scd2.grain]]): the
    * grain is key-hash-partitioned, so every window here runs
    * exchange-free on top of it.
    */
  def stagingFromGrain(grainDf: DataFrame, spec: EntitySpec): DataFrame = {
    val grain = grainDf.withColumnRenamed("_grain_dt", "create_dt")
    val full = Window.partitionBy(col(spec.key)).orderBy(col("create_dt"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val whole = Window.partitionBy(col(spec.key))
    val attrCols = spec.attrs.map(_._2).filterNot(_ == spec.key)
    val out = grain.select(
      col(spec.key) +:
        attrCols.map(a => last(col(a)).over(full).as(a)) :+
        min(col("create_dt")).over(whole).as("create_dt") :+
        when(max(col("create_dt")).over(whole) ===
          min(col("create_dt")).over(whole), lit(null))
          .otherwise(max(col("create_dt")).over(whole)).as("update_dt"): _*)
    if (spec.scd1Distinct) out.distinct() else out
  }

  /** Upsert; returns the new dim snapshot (caller persists). */
  def merge(dim: DataFrame, stg: DataFrame, spec: EntitySpec): DataFrame = {
    val dimCols = spec.attrs.map(_._2) :+ "create_dt" :+ "update_dt"
    // New keys keep staging multiplicity (no distinct — quirk above).
    val inserts = stg.as("s").join(dim.as("c"),
      col(s"s.${spec.key}") === col(s"c.${spec.key}"), "left_anti")
      .select(dimCols.map(col): _*)

    // Update path: one staged row per key (duplicate staged rows carry
    // identical window-derived values, and UPDATE…FROM applies once).
    val stgOne = stg.dropDuplicates(spec.key)
    val sCols = dimCols.map(c => col(c).as(s"_s_$c"))
    val joined = dim.join(stgOne.select(sCols: _*),
      col(spec.key) === col(s"_s_${spec.key}"), "left_outer")
    val changed = spec.scd1Updatable
      .map(a => col(s"_s_$a") =!= col(a))
      .reduce(_ || _)
    val matched = col(s"_s_${spec.key}").isNotNull && changed
    val updatedCols = dimCols.map {
      case a if spec.scd1Updatable.contains(a) =>
        when(matched, col(s"_s_$a")).otherwise(col(a)).as(a)
      case "update_dt" =>
        when(matched, coalesce(col("_s_update_dt"), col("_s_create_dt")))
          .otherwise(col("update_dt")).as("update_dt")
      case a => col(a).as(a)
    }
    joined.select(updatedCols: _*).unionByName(inserts)
  }

  def apply(lake: Lakehouse, landing: DataFrame, spec: EntitySpec): Unit =
    applyFromGrain(lake, Scd2.grain(landing, spec), spec)

  /** Same, from a pre-computed (typically cached) shared grain.
    *
    * DELTA-LOGICAL by default, like [[Scd2.applyFromGrain]]: one
    * merge-on-read delta commit with the changed keys' dim rows (every
    * physical copy, preserving the reference's duplicate-row quirk) as
    * post-images plus a deletion vector over their pre-images, and the
    * new keys' rows as plain inserts. A batch that changes nothing
    * commits nothing. `spark.graft.scdSnapshotWrites=true` restores the
    * snapshot rewrite.
    */
  def applyFromGrain(lake: Lakehouse, grain: DataFrame,
      spec: EntitySpec): Unit = {
    val stg = stagingFromGrain(grain, spec)
    val dimCols = spec.attrs.map(_._2) :+ "create_dt" :+ "update_dt"
    if (lake.spark.conf.getOption("spark.graft.scdSnapshotWrites")
        .exists(_.toBoolean)) {
      val next = merge(lake.read(spec.scd1Dim), stg, spec)
      // size-aware file count for the snapshot write — see the Scd2
      // applyFromGrain note
      lake.overwrite(spec.scd1Dim, next.hint("rebalance"))
      return
    }
    if (!lake.exists(spec.scd1Dim)) {
      // first batch: merge(empty, stg) == stg's insert projection
      lake.append(spec.scd1Dim,
        stg.select(dimCols.map(col): _*).hint("rebalance"))
      return
    }
    val schema = graft.model.Schemas.byName(spec.scd1Dim)
    val ctx = lake.maskedCtx(spec.scd1Dim)
    val masked = lake.readMaskedWithPosOn(ctx, schema)
    val dimNow = masked.drop(Lakehouse.FileCol, Lakehouse.PosCol)
    // new keys keep staging multiplicity (no distinct — quirk above)
    val inserts = stg.as("s").join(dimNow.as("c"),
      col(s"s.${spec.key}") === col(s"c.${spec.key}"), "left_anti")
      .select(dimCols.map(col): _*)
      .withColumn(Lakehouse.FileCol, lit(null).cast("string"))
      .withColumn(Lakehouse.PosCol, lit(null).cast("bigint"))
    // changed keys: every live dim row of a key whose compared attrs
    // differ from the staged combo (null-rejecting !=, as in merge) —
    // each physical copy becomes a pre-image (DV) and an updated
    // post-image, preserving multiplicity
    val stgOne = stg.dropDuplicates(spec.key)
    val sCols = dimCols.map(c => col(c).as(s"_s_$c"))
    val joined = masked.join(stgOne.select(sCols: _*),
      col(spec.key) === col(s"_s_${spec.key}"))
    val changed = spec.scd1Updatable
      .map(a => col(s"_s_$a") =!= col(a))
      .reduce(_ || _)
    val updatedCols = dimCols.map {
      case a if spec.scd1Updatable.contains(a) => col(s"_s_$a").as(a)
      case "update_dt" =>
        coalesce(col("_s_update_dt"), col("_s_create_dt")).as("update_dt")
      case a => col(a).as(a)
    }
    val updated = joined.filter(changed)
      .select(updatedCols :+ col(Lakehouse.FileCol) :+
        col(Lakehouse.PosCol): _*)
    // shared probe + commit tail — see [[Scd2.commitScdDelta]]
    Scd2.commitScdDelta(lake, spec.scd1Dim, schema, ctx,
      updated.unionByName(inserts))
  }
}

package graft.ops

import graft.storage.Lakehouse
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incrementally-maintained aggregate tables over a versioned lakehouse
  * base — the materialized-view pattern of the warehouse the reference
  * models (its `report` mart is exactly such a derived table, rebuilt by
  * `fn_add_report_data`, Data_mart.sql:109-299; this operator is the
  * engine-native generalization: ANY additive aggregate, refreshed from
  * the base table's recorded change feed instead of a re-scan).
  *
  * WHY this matters at 100 TB: a daily-revenue rollup over a 100 TB fact
  * costs a full scan to recompute but only the CHANGED rows to maintain.
  * The refresh below reads `Lakehouse.changeFeed(basis, latest]` — data
  * volume proportional to what landed since the last refresh — and never
  * touches the base snapshot. The MV itself is aggregate-sized (bounded
  * by group cardinality, not base rows), so its copy-on-write rewrite is
  * cheap at any base scale.
  *
  * MAINTENANCE ALGEBRA (classic incremental view maintenance over
  * SUM/COUNT): every feed row carries a sign — `insert` /
  * `update_postimage` add, `delete` / `update_preimage` subtract — and
  * the signed per-group partial aggregate folds into the stored groups;
  * groups whose maintained row count reaches zero are dropped. SUM and
  * COUNT are self-maintainable; AVG derives as sum/n downstream. MIN/MAX
  * are NOT (a deleted minimum needs the base to re-derive) and are
  * deliberately outside the spec.
  *
  * ATOMICITY + LINEAGE: the MV stores its refresh basis IN the data — a
  * `_basis_version` column stamped on every row — so the "what version
  * is this MV current to" metadata commits atomically with the content
  * (a side-file could land without the rows or vice versa). Refresh is
  * idempotent: basis == latest is a no-op with no new commit.
  *
  * CONTRACTS (fail-loudly, never silently stale/wrong):
  *  - full commits in the refresh range must carry recorded change data
  *    ([[Lakehouse.changeFeed]] throws on blind overwrites — inherited);
  *  - equality-delete commits ([[Lakehouse.deleteByKeys]]) are rejected:
  *    their feed records are key-only (measures null), which would
  *    silently under-subtract — compact-then-reseed, or use predicate
  *    [[Lakehouse.delete]] with `cdf = true` on MV-maintained tables;
  *  - an empty or absent MV refreshes by RESEEDING (full recompute) —
  *    there is no basis to maintain from.
  */
object MaterializedView {

  val BasisCol = "_basis_version"
  private val ChangeTypeCol = "_change_type"
  private val CountCol = "n"

  /** Aggregate definition. Group keys and measures are named expressions
    * over the BASE schema; measures must be numeric (sign-multipliable)
    * and additive. A `n` count column is always maintained (it is the
    * group-liveness witness) and must not be redefined.
    */
  final case class Spec(groupCols: Seq[(String, Column)],
      sumCols: Seq[(String, Column)]) {
    require(groupCols.nonEmpty, "materialized view needs group columns")
    private val names = groupCols.map(_._1) ++ sumCols.map(_._1)
    require(!names.contains(CountCol),
      s"'$CountCol' is maintained implicitly — rename the colliding column")
    require(!names.contains(BasisCol), s"$BasisCol is reserved")
    require(names.distinct.sizeIs == names.size,
      s"duplicate MV column names: ${names.mkString(", ")}")
  }

  /** The MV's storage schema, derived by planning the aggregate against
    * an empty frame of the base schema — types come out of Catalyst's
    * own resolution, never hand-maintained.
    */
  def mvSchema(spark: org.apache.spark.sql.SparkSession,
      baseSchema: StructType, spec: Spec): StructType = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], baseSchema)
    signedAggregate(empty, spec, lit(1L)).schema
      .add(BasisCol, org.apache.spark.sql.types.LongType)
  }

  /** Per-group signed partial aggregate — the one shuffle of both seed
    * and refresh, keyed on the group columns (map-side combine applies;
    * at refresh time the input is the feed, not the base).
    */
  private def signedAggregate(rows: DataFrame, spec: Spec,
      sign: Column): DataFrame = {
    val aggs = sum(sign).as(CountCol) +:
      spec.sumCols.map { case (n, c) => sum(c * sign).as(n) }
    rows.groupBy(spec.groupCols.map { case (n, c) => c.as(n) }: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Full recompute → one FULL MV commit stamped with the base version
    * the snapshot was read at (same-listing basis: a delta landing
    * mid-seed is NOT in the snapshot and stays ahead of the stamp, so
    * the next refresh picks it up instead of double-counting it).
    */
  def seed(lake: Lakehouse, mvName: String, baseName: String,
      baseSchema: StructType, spec: Spec): Long = {
    val (base, basis) = lake.readWithBasis(baseName, baseSchema)
    val mv = signedAggregate(base, spec, lit(1L))
      .withColumn(BasisCol, lit(basis.maxCommitted))
    lake.overwrite(mvName, mv)
    basis.maxCommitted
  }

  /** Incremental refresh: fold the signed change feed `(basis, latest]`
    * into the stored groups. Returns the new basis. No-op (no commit)
    * when already current; reseeds when the MV is empty/absent.
    */
  def refresh(lake: Lakehouse, mvName: String, baseName: String,
      baseSchema: StructType, spec: Spec): Long = {
    val schema = mvSchema(lake.spark, baseSchema, spec)
    val mv = lake.read(mvName, schema)
    // one-row driver read: the stamped basis (null ⇒ empty MV)
    val basisRow = mv.agg(max(col(BasisCol))).head()
    if (basisRow.isNullAt(0))
      return seed(lake, mvName, baseName, baseSchema, spec)
    val basis = basisRow.getLong(0)
    val latest = lake.versions(baseName).map(_._1).maxOption.getOrElse(0L)
    if (latest <= basis) return basis
    val eqDel = lake.equalityDeleteVersions(baseName, basis, latest)
    require(eqDel.isEmpty,
      s"$baseName versions ${eqDel.mkString(",")} are equality-delete " +
        "commits — their key-only change records cannot maintain " +
        s"measures; compact $baseName and reseed $mvName, or use " +
        "predicate delete(cdf = true) on MV-maintained tables")
    val feed = lake.changeFeed(baseName, basis, latest, baseSchema)
    foldAndCommit(lake, mvName, schema, spec, mv, feed, latest)
    latest
  }

  /** Fold one signed change-row frame (must carry `_change_type`) into
    * the stored groups and commit with a new stamp. Shared by the
    * version-driven [[refresh]] and the streaming [[applyFeedBatch]].
    */
  private def foldAndCommit(lake: Lakehouse, mvName: String,
      schema: StructType, spec: Spec, mv: DataFrame, changeRows: DataFrame,
      stamp: Long): Unit = {
    // fail-loudly contract: an unrecognized (or null) change type must
    // not silently SUBTRACT — a typo'd/future type folding as a delete
    // drifts the MV wrong with no error
    val sign = when(col(ChangeTypeCol).isin("insert", "update_postimage"),
      lit(1L))
      .when(col(ChangeTypeCol).isin("delete", "update_preimage"),
        lit(-1L))
      .otherwise(raise_error(concat(
        lit("materialized view: unknown _change_type '"),
        coalesce(col(ChangeTypeCol), lit("null")), lit("'")))
        .cast("long"))
    val delta = signedAggregate(changeRows, spec, sign)
    val groupNames = spec.groupCols.map(_._1)
    val foldAggs = sum(col(CountCol)).as(CountCol) +:
      spec.sumCols.map { case (n, _) => sum(col(n)).as(n) }
    val folded = mv.drop(BasisCol).unionByName(delta)
      .groupBy(groupNames.map(col): _*)
      .agg(foldAggs.head, foldAggs.tail: _*)
      .filter(col(CountCol) =!= 0L)
      .withColumn(BasisCol, lit(stamp))
    // conform the re-summed measures back to the stored schema (Spark
    // widens e.g. sum(decimal(p,s)) → decimal(p+10,s); letting that
    // drift would fork the MV's physical schema commit-over-commit)
    val conformed = folded.select(schema.fields.toIndexedSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    // the stamp lives IN the rows — a fold that zeroes out EVERY group
    // would otherwise commit an empty MV and lose the watermark: a
    // replayed micro-batch (foreachBatch's at-least-once) then re-folds
    // into phantom negated groups, and the version-driven refresh falls
    // back to a spurious full reseed. A single n=0 sentinel row (all
    // group keys null, measures null) carries the stamp UNCONDITIONALLY
    // (an `isEmpty` probe here re-ran the whole fold aggregate once per
    // commit just to decide whether the sentinel was needed — one extra
    // aggregate job per micro-batch); it is invisible by construction:
    // [[read]] filters n ≠ 0, the next fold's n=0 adds nothing to a
    // colliding all-null-keys group (sum ignores the null measures) and
    // its own post-fold n ≠ 0 filter regroups it away.
    val sentinel = lake.spark.range(1).select(
      schema.fields.toIndexedSeq.map(f => f.name match {
        case CountCol => lit(0L).cast(f.dataType).as(f.name)
        case BasisCol => lit(stamp).cast(f.dataType).as(f.name)
        case n => lit(null).cast(f.dataType).as(n)
      }): _*)
    lake.overwrite(mvName, conformed.unionByName(sentinel))
  }

  /** Streaming maintenance: fold ONE micro-batch of a change-data feed
    * (the lakehouse CDF stream, or any frame carrying `_change_type`)
    * into the MV, EXACTLY ONCE. The stamp column stores the last applied
    * micro-batch id — committed atomically with the fold, so a batch
    * replayed after a crash (foreachBatch's at-least-once contract) is
    * recognized (`batchId <= stamp`) and skipped: the transactional-sink
    * pattern (Delta's txnVersion), here built on the MV's own commit.
    *
    * A given MV is maintained EITHER by version-driven [[refresh]] OR by
    * a streaming applier — the stamp column holds base versions for the
    * former and batch ids for the latter; mixing drivers would misread
    * it. Starts from an empty MV (inserts build it up); batch ids are a
    * single query lineage (Structured Streaming's contract).
    */
  def applyFeedBatch(lake: Lakehouse, mvName: String,
      baseSchema: StructType, spec: Spec, batch: DataFrame,
      batchId: Long): Unit = {
    val schema = mvSchema(lake.spark, baseSchema, spec)
    val mv = lake.read(mvName, schema)
    val lastRow = mv.agg(max(col(BasisCol))).head()
    val last = if (lastRow.isNullAt(0)) -1L else lastRow.getLong(0)
    if (batchId <= last) return // already applied — replay after crash
    foldAndCommit(lake, mvName, schema, spec, mv, batch, batchId)
  }

  /** The served view — MV content without the lineage column (and
    * without the n=0 watermark sentinel an all-groups-zeroed fold
    * leaves behind).
    */
  def read(lake: Lakehouse, mvName: String, baseSchema: StructType,
      spec: Spec): DataFrame =
    lake.read(mvName, mvSchema(lake.spark, baseSchema, spec))
      .filter(col(CountCol) =!= 0L)
      .drop(BasisCol)
}

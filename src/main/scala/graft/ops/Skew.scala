package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting.
  *
  * A hot key routes all its rows to one reducer; salting splits the big
  * side's key space into `factor` sub-keys and replicates the small side
  * across all salts, so the hot key's work spreads over `factor` tasks.
  * Results are identical to the plain join (the salt is an extra equi-join
  * column the small side carries for every value) — the q26 query's DuckDB
  * oracle is simply the UNSALTED join, which is the strongest possible
  * correctness check for the technique.
  *
  * The salt MUST be per-row, not per-key: a salt derived from the join key
  * alone sends every row of a hot key to the same salt bucket — the skew
  * survives and the small-side replication is pure overhead. We derive it
  * from the hash of the WHOLE row (every column, not just the key):
  * content-determined, so a task retry recomputes identical salts no
  * matter how the upstream stage reordered rows. Position-derived salts
  * (`monotonically_increasing_id`) or `rand()` are NOT retry-stable once
  * the big side sits downstream of a shuffle — intra-partition order can
  * differ between attempts, and a salt that routes the shuffle write is
  * then the SPARK-23207 class of silent duplication/loss. The trade:
  * fully identical rows share a salt — harmless for correctness
  * (identical rows are interchangeable), and hot-key rows in practice
  * differ in their payload columns. A big side projected down to ONLY
  * the join key gets no spread — keep a differing column in scope.
  * SkewSpec asserts a hot key's rows actually span >1 salt.
  *
  * AQE's skew-join handles many cases at runtime; explicit salting still
  * matters when a single key exceeds what one task can hold (AQE splits
  * partitions, not keys, for aggregations) and for deterministic layout.
  */
object Skew {

  /** Per-row salt in [0, factor): whole-row content hash — deterministic
    * under task retries regardless of upstream row order. Columns are
    * resolved via `df.col` (exact names — `col("a.b")` would parse as a
    * struct path) and any map-bearing columns are skipped (xxhash64
    * rejects MapType: map iteration order is undefined, so maps can't
    * contribute deterministically anyway).
    */
  private def rowSalt(df: DataFrame, factor: Int): Column = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => df.col(f.name)).toIndexedSeq
    require(cols.nonEmpty, "no hashable columns to derive a row salt from")
    pmod(xxhash64(cols: _*), lit(factor)).cast("int")
  }

  /** `factor` must be positive (pmod by 0 yields NULL salts, which the
    * null-rejecting equi-join would silently drop row by row), and the
    * internal `_salt` name must be free (withColumn would silently clobber
    * caller data — same guard convention as AsOfJoin).
    */
  private def validate(factor: Int, dfs: DataFrame*): Unit = {
    require(factor >= 1, s"salting factor must be >= 1, got $factor")
    require(!dfs.exists(_.columns.contains("_salt")),
      "input already has a _salt column — rename it first")
  }

  /** Runtime degeneracy detection (the guard the content-hash salt
    * needs): pins salt-spread metrics onto the salted big side via
    * `Observation`, collected during the action itself — zero extra
    * passes, same pattern as [[CapAudit]].
    *
    * Metrics: `rows`, `keys` (approx distinct join keys), `key_salts`
    * (approx distinct (key, salt) pairs). Interpretation:
    * `key_salts / keys` is the average salt fan-out per key, in
    * [1, factor] — a value ≈ 1 while `rows / keys` is large means the
    * rows within keys are identical (or projected down to constants) and
    * the salting silently no-oped: every hot key still lands on one
    * reducer. approx (HLL) rather than exact because `Observation`
    * forbids DISTINCT aggregates; at the cardinalities where degeneracy
    * matters the ±2% HLL error is noise against a factor-sized signal.
    * [[saltSpread]] turns a collected metrics row into the fan-out ratio.
    */
  private def observedSalt(salted: DataFrame, key: String,
      audit: Option[Observation]): DataFrame =
    audit.fold(salted)(o => salted.observe(o,
      count(lit(1)).as("rows"),
      approx_count_distinct(col(key)).as("keys"),
      approx_count_distinct(struct(col(key), col("_salt")))
        .as("key_salts")))

  /** Average per-key salt fan-out from the collected audit metrics
    * (`Observation.get`): ≈ 1 (below ~1.5 at any real skew) ⇒ the salt is
    * degenerate and the caller should widen the row before salting (or
    * accept the skew). An EMPTY input yields NaN — "no evidence", not a
    * degeneracy verdict (salting is vacuous on zero rows, and NaN
    * compares false against any alert threshold, so `spread < 1.5`
    * monitors stay quiet instead of false-alarming on an empty day).
    */
  def saltSpread(metrics: Map[String, Any]): Double = {
    val keys = metrics("keys").asInstanceOf[Long]
    if (keys == 0L) Double.NaN
    else metrics("key_salts").asInstanceOf[Long].toDouble / keys
  }

  /** Equi-join `big ⋈ small` on `key`, salted `factor` ways.
    *
    * REQUIREMENT: the big side must carry at least one column that varies
    * within a hot key — the salt is a whole-row content hash, so rows that
    * are fully identical (or projected down to key-only / low-cardinality
    * columns) all land on ONE salt and the mitigation silently no-ops.
    * Project AFTER salting if you must narrow the row. Pass `saltAudit`
    * to DETECT that case at runtime ([[observedSalt]]/[[saltSpread]])
    * instead of discovering it as a straggler task at 100× scale.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int, saltAudit: Option[Observation] = None): DataFrame = {
    validate(factor, big, small)
    val salted = observedSalt(
      big.withColumn("_salt", rowSalt(big, factor)), key, saltAudit)
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted aggregation: two-phase group-by for hot grouping keys —
    * partial agg on (key, salt), then final agg on key. For algebraic
    * aggregates this is exactly what map-side partial aggregation already
    * does; the explicit form matters for high-cardinality intermediate
    * state (e.g. collect_set) where one reducer would OOM.
    *
    * Same row-salt caveat as [[saltedJoin]]: a hot key whose rows are
    * fully identical after projection gets no spread — `saltAudit`
    * detects it at runtime.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      factor: Int, saltAudit: Option[Observation] = None): DataFrame = {
    validate(factor, df)
    observedSalt(df.withColumn("_salt", rowSalt(df, factor)), key, saltAudit)
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_c"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_c")).as("cnt"), sum(col("_s")).as("total"))
  }
}

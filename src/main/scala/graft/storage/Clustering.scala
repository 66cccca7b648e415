package graft.storage

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** EXACT one-slice-per-key clustering for partition-grade columns.
  *
  * The partitioned-table write paths must produce files that each hold
  * exactly ONE partition-key value — that is what lets the V2 scan
  * report `KeyGroupedPartitioning` (storage-partitioned joins) and what
  * makes zone-map partition pruning airtight. `repartitionByRange` is
  * only APPROXIMATELY that: its sampled, weight-driven bounds merge
  * adjacent low-weight keys into one slice (observed: 25 supplier
  * nations → 24 files, one spanning two nations — which silently
  * declines the key report for the whole table).
  *
  * This helper is exact and stays entirely inside Tungsten codegen:
  *
  *  1. collect the DISTINCT key tuples (bounded: partition columns are
  *     low-cardinality by definition; above `maxKeys` we fall back to
  *     range clustering — partition pruning still works, only the
  *     key-grouped report is declined);
  *  2. assign each key a slice, and for each slice pre-compute an INT
  *     probe value whose murmur3 hash lands EXACTLY in that slice of a
  *     `repartition(k, _)` hash exchange (driver-side inverse-hash
  *     search over small ints — microseconds for partition-grade k);
  *  3. broadcast-join the probe onto the batch (null-safe, so NULL
  *     partition keys get their own slice too) and hash-repartition on
  *     it.
  *
  * At scale this is CHEAPER than the range path it replaces: the
  * distinct is a map-side-combined aggregate of k rows per task, the
  * probe join is a broadcast, and the hash exchange replaces the range
  * exchange — WITHOUT the extra sampling job RangePartitioner runs
  * over the input first.
  */
object Clustering {

  /** Fallback threshold: a `PARTITIONED BY` column with more distinct
    * values than this is over-partitioned (small-files explosion — the
    * classic hive anti-pattern), so we range-cluster instead and skip
    * the exact layout. Overridable per table via the
    * `graft.spjMaxKeys` property.
    */
  val DefaultMaxKeys = 256

  private val GxCol = "_graft_gx"

  /** Cluster `df` so each shuffle slice holds exactly one distinct
    * `cols` tuple (≤ `maxKeys` distinct tuples; otherwise falls back to
    * range clustering on the same columns).
    */
  def byPartitionKeys(spark: SparkSession, df: DataFrame,
      cols: Seq[String], maxKeys: Int = DefaultMaxKeys): DataFrame = {
    require(cols.nonEmpty, "byPartitionKeys needs partition columns")
    val keys = df.select(cols.map(col): _*).distinct()
      .limit(maxKeys + 1).collect()
    if (keys.isEmpty || keys.length > maxKeys) {
      df.repartitionByRange(
        spark.conf.get("spark.sql.shuffle.partitions").toInt,
        cols.map(col): _*)
    } else {
      val k = keys.length
      val probes = probeInts(k)
      // deterministic slice assignment across retries/replays
      val sorted = keys.sortBy(_.toString)
      val keyFields = cols.map(c => df.schema(c))
      val idxSchema = StructType(
        keyFields :+ StructField(GxCol, IntegerType, nullable = false))
      val rows: java.util.List[Row] = java.util.Arrays.asList(
        sorted.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ probes(i)) }: _*)
      val idx = spark.createDataFrame(rows, idxSchema)
      // null-safe: NULL partition keys match their distinct row and get
      // a dedicated slice instead of colliding into hash(seed)
      val cond = cols.map(c => df(c) <=> idx(c)).reduce(_ && _)
      // LEFT OUTER, not inner: df executes twice here (once for the
      // distinct above, once under this join), so a non-deterministic
      // key expression — or a source mutated between the two jobs — can
      // produce keys absent from the probe index. An inner join would
      // silently DROP those rows; instead they fall back to a
      // hash-routed slice (worst case one mixed-key file, whose
      // min≠max zone map makes the scan decline the SPJ key report —
      // exactly repartitionByRange's behavior, never data loss).
      import org.apache.spark.sql.functions.{array, coalesce, element_at,
        hash, lit, pmod}
      val fallback = element_at(
        array(probes.map(lit).toIndexedSeq: _*),
        (pmod(hash(cols.map(df(_)): _*), lit(k)) + lit(1)).cast("int"))
      df.join(broadcast(idx), cond, "left_outer")
        .select(df.columns.map(df(_)) :+
          coalesce(idx(GxCol), fallback).as(GxCol): _*)
        .repartition(k, col(GxCol))
        .drop(GxCol)
    }
  }

  /** Cluster for a full `PARTITIONED BY` spec list: identity columns
    * by value, bucket specs by their DERIVED bucket id —
    * `pmod(murmur3(col, seed 42), n)`, the exact expression the V2
    * `bucket` function and the stats-manifest writer compute, so the
    * three views of "which bucket is this row in" can never diverge.
    * Each output file then holds ONE (identity values × bucket ids)
    * tuple, which is what lets the scan report
    * `KeyGroupedPartitioning(bucket(n, col))` for zero-exchange
    * fact-fact joins at ANY key cardinality — bucket cardinality is n
    * by construction, so the identity path's `spjMaxKeys` ceiling
    * stops mattering.
    */
  def bySpecs(spark: SparkSession, df: DataFrame,
      specs: Seq[graft.sources.PartSpec],
      maxKeys: Int = DefaultMaxKeys): DataFrame = {
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    val derived = specs.zipWithIndex.collect {
      case (b: graft.sources.BucketSpec, i) =>
        (s"${GxCol}_b$i", pmod(hash(col(b.col)), lit(b.n)).cast("int"))
    }
    if (derived.isEmpty)
      return byPartitionKeys(spark, df, specs.map(_.col), maxKeys)
    val clusterCols = specs.zipWithIndex.map {
      case (graft.sources.IdentitySpec(c), _) => c
      case (_, i) => s"${GxCol}_b$i"
    }
    val withDerived = derived.foldLeft(df) {
      case (d, (n, e)) => d.withColumn(n, e)
    }
    byPartitionKeys(spark, withDerived, clusterCols, maxKeys)
      .drop(derived.map(_._1): _*)
  }

  /** For each slice s in [0, k), the smallest non-negative Int whose
    * murmur3 hash (the exact expression `repartition(k, col)` routes
    * by) lands in s.
    */
  private def probeInts(k: Int): Array[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val out = Array.fill(k)(-1)
    var filled = 0
    var x = 0
    while (filled < k) {
      val h = new Murmur3Hash(Seq(Literal(x, IntegerType)))
        .eval(null).asInstanceOf[Int]
      val slot = ((h % k) + k) % k
      if (out(slot) < 0) { out(slot) = x; filled += 1 }
      x += 1
      require(x < Int.MaxValue, "probe search overflow")
    }
    out
  }
}

package graft.ops

import graft.storage.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted ANN index (round-3 verdict item 4): the IVF+PQ structures
  * [[VectorOps.ivfPqTopK]] derives inline — coarse centroids, PQ codes,
  * coarse-cell assignments — written ONCE as versioned lakehouse tables
  * by a build job, then every probe query served from the STORED index.
  *
  * This is the shape that actually ships: at 100 TB the quantizer train +
  * encode pass is a scheduled maintenance job (like compaction), and a
  * query batch must never re-derive it. The serve path reads only the
  * index tables — `ann_centroids` (|cells|·dims rows, broadcast-sized)
  * and `ann_codes` (|corpus|·subspaces compact rows, the stored inverted
  * lists) — plus the query vectors; the raw corpus embeddings are never
  * scanned (that is PQ's memory-bound point: candidates rank from their
  * codes). Serve cost is the probe restriction (nProbe/|cells| of the
  * code rows) + a broadcast-keyed ADC aggregate — measured in StressAnn
  * as a small fraction of the build pass and sublinear in corpus size.
  *
  * Exactly the e08 math (exact integer arithmetic end-to-end), so a
  * build→serve round trip is bit-identical to the inline operator — which
  * is what the e12 driver query falsifies against the e08 oracle.
  */
object AnnIndex {

  val CentroidsTable = "ann_centroids"
  val CodesTable = "ann_codes"

  /** (label, dim, c): exact integer floor-mean centroid components. */
  val centroidsSchema: StructType = StructType(Seq(
    StructField("label", LongType), StructField("dim", IntegerType),
    StructField("c", LongType)))

  /** (neighbor_id, s, label, coarse): per-subspace PQ code + the coarse
    * inverted-list cell of each corpus vector.
    */
  val codesSchema: StructType = StructType(Seq(
    StructField("neighbor_id", LongType), StructField("s", IntegerType),
    StructField("label", LongType), StructField("coarse", LongType)))

  /** Build job — one corpus pass writes the index tables as FULL commits
    * (a rebuild atomically replaces the previous index generation; a
    * crash mid-build leaves the old generation serving). `corpus` carries
    * (id, vec, label) with `label` the coarse quantizer's cell — bounded
    * cardinality (O(√n) at most), same contract as [[VectorOps.pqTopK]].
    */
  def buildIvfPq(lake: Lakehouse, corpus: DataFrame,
      subspaces: Int = 4, dims: Int = 64): Unit = {
    require(dims % subspaces == 0, s"$dims dims not divisible by $subspaces")
    val width = dims / subspaces
    val cent = VectorOps.floorCentroids(corpus)
      .select(col("label").cast("long"), col("dim").cast("int"),
        col("c").cast("long"))
    lake.overwrite(CentroidsTable, cent)
    // re-read the just-committed centroids so the encode pass and every
    // later serve derive from the SAME stored bytes (not two evaluations
    // of a nondeterministic-input plan)
    val storedCent = lake.read(CentroidsTable, centroidsSchema)
    val codes = VectorOps.pqCodes(storedCent, width, corpus)
      .join(corpus.select(col("id").as("neighbor_id"),
        col("label").as("coarse")), "neighbor_id")
      .select(col("neighbor_id").cast("long"), col("s").cast("int"),
        col("label").cast("long"), col("coarse").cast("long"))
    lake.overwrite(CodesTable, codes)
  }

  /** Incremental index maintenance (FAISS `add()`): encode NEW vectors
    * against the STORED centroids and append their codes as a DELTA
    * commit — no rebuild, existing code rows untouched. Cell assignment
    * is nearest stored centroid by integer dot (ties → smallest label),
    * i.e. exactly the query probe rule at nProbe = 1 — appended vectors
    * land in the cell their future queries will probe first. The coarse
    * quantizer is intentionally FROZEN: incremental adds use the
    * existing cells, and retraining is the scheduled full [[buildIvfPq]]
    * (standard IVF operations practice — centroid drift under a shifted
    * ingest distribution is a monitored quality trade, not something an
    * append should silently re-decide).
    */
  def appendVectors(lake: Lakehouse, newVectors: DataFrame,
      subspaces: Int = 4, dims: Int = 64): Unit = {
    require(dims % subspaces == 0, s"$dims dims not divisible by $subspaces")
    val width = dims / subspaces
    val cent = lake.read(CentroidsTable, centroidsSchema)
    val pr = Window.partitionBy(col("id"))
      .orderBy(col("cdot").desc, col("label"))
    val assigned = newVectors
      .select(col("id"), posexplode(VectorOps.quantize(col("vec")))
        .as(Seq("dim", "qc")))
      .join(broadcast(cent), "dim")
      .groupBy(col("id"), col("label"))
      .agg(sum(col("qc") * col("c")).as("cdot"))
      .withColumn("pr", row_number().over(pr))
      .filter(col("pr") === 1)
      .select(col("id").as("neighbor_id"), col("label").as("coarse"))
    val codes = VectorOps.pqCodes(cent, width,
      newVectors.select(col("id"), col("vec")))
      .join(assigned, "neighbor_id")
      .select(col("neighbor_id").cast("long"), col("s").cast("int"),
        col("label").cast("long"), col("coarse").cast("long"))
    lake.append(CodesTable, codes)
  }

  /** Serve a query batch from the stored index: coarse-probe selection
    * against the broadcast centroid table, probe restriction on the
    * stored code rows, ADC ranking through the bounded top-k aggregator.
    * Identical output contract to [[VectorOps.ivfPqTopK]] —
    * (query_id, neighbor_id, dist, rk).
    */
  def serveIvfPq(lake: Lakehouse, queries: DataFrame, k: Int, nProbe: Int,
      subspaces: Int = 4, dims: Int = 64): DataFrame =
    serveIvfPqFiltered(lake, queries, k, nProbe, lit(true), subspaces, dims)

  /** Metadata-filtered serve from the stored index (the production
    * filtered-vector-search shape on PERSISTED lists — FAISS IDSelector /
    * Milvus scalar filtering): `candidateFilter` is evaluated against the
    * stored code rows (their `coarse` cell and ids) at list-scan time,
    * BEFORE the probe restriction and ADC aggregate — the one stored
    * index serves every predicate, never rebuilt per filter. Probe
    * selection stays unfiltered, same documented recall trade as
    * [[VectorOps.ivfTopKFiltered]] (selective filters want more probes).
    */
  def serveIvfPqFiltered(lake: Lakehouse, queries: DataFrame, k: Int,
      nProbe: Int, candidateFilter: org.apache.spark.sql.Column,
      subspaces: Int = 4, dims: Int = 64): DataFrame = {
    require(dims % subspaces == 0, s"$dims dims not divisible by $subspaces")
    val width = dims / subspaces
    val cent = lake.read(CentroidsTable, centroidsSchema)
    val codes = lake.read(CodesTable, codesSchema)
    // coarse probes: nProbe closest stored cells by integer centroid dot
    val pr = Window.partitionBy(col("query_id"))
      .orderBy(col("cdot").desc, col("label"))
    val probes = queries
      .select(col("id").as("query_id"),
        posexplode(VectorOps.quantize(col("vec"))).as(Seq("dim", "qc")))
      .join(broadcast(cent), "dim")
      .groupBy(col("query_id"), col("label"))
      .agg(sum(col("qc") * col("c")).as("cdot"))
      .withColumn("pr", row_number().over(pr))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("label").as("coarse"))
    val qd = VectorOps.subspaceDists(cent, width)(queries, "query_id")
      .select(col("query_id"), col("s"), col("label"), col("d2"))
    // candidate filter at list-scan time, then probe restriction — both
    // BEFORE the ADC aggregate: filtered-out or unprobed code rows never
    // reach the distance sum
    val restricted = codes.filter(candidateFilter)
      .join(broadcast(probes), Seq("coarse"))
      .drop("coarse")
    VectorOps.adcTopK(restricted, qd, k, Seq("query_id", "s", "label"))
  }
}

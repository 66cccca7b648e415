package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an `Array[Float]` embedding column.
  *
  * Similarities are computed on integer-quantized components
  * (`floor(x * 1000)` per dim): exact integer arithmetic makes results
  * bit-reproducible across engines and summation orders (float dot
  * products are order-dependent), at ~1e-3 component precision — plenty
  * for top-k ranking, and what makes the DuckDB oracle possible.
  *
  * Scale design: brute-force top-k is a broadcast of the (small) query
  * set against the corpus scan with a bounded [[graft.functions.TopKPairs]]
  * aggregation — partial top-k buffers merge map-side, so the shuffle
  * carries O(|Q|·k) rows, never the |Q|×|C| scored set (a window
  * `row_number` here would funnel the full cross product through |Q|
  * tasks). The LSH variants bucket by hyperplane sign bits so each probe
  * touches one bucket instead of the full corpus, then rank the
  * bucket-bounded candidates the same way.
  */
object VectorOps {

  /** Bounded top-k per query over a (query_id, neighbor_id, dot) frame:
    * rank by (dot desc, neighbor_id asc), keep k, emit rk = 1..k.
    * Output order/typing matches the window `row_number` formulation
    * row-for-row — the DuckDB oracles still use that spelling.
    *
    * NULL-scored candidates (qdot of a length-mismatched or null-element
    * vector — a malformed corpus row) are dropped, never ranked: the
    * typed aggregator's non-nullable encoder would otherwise abort the
    * whole job on one bad vector.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    scored
      .filter(col("dot").isNotNull &&
        col("query_id").isNotNull && col("neighbor_id").isNotNull)
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("dot").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKPairs(k).toColumn.name("top"))
      .toDF("query_id", "top")
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nb")))
      .select(col("query_id"), col("nb._1").as("neighbor_id"),
        col("nb._2").as("dot"), (col("pos") + 1).cast("int").as("rk"))
  }

  /** floor(x*1000) per component, as bigint array. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000).cast("bigint"))

  /** Integer dot product of two quantized vectors — one compiled loop
    * via the native [[graft.functions.QDot]] expression (the hot inner
    * loop of every candidate-pair ranking here).
    */
  def qdot(a: Column, b: Column): Column = graft.functions.QDot(a, b)

  /** The built-in fold spelling of [[qdot]], kept as the reference
    * implementation the native expression's parity spec checks against.
    */
  def qdotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Brute-force top-k cosine (integer-dot ranking) neighbors for each
    * query vector. `queries` and `corpus` both carry (id, vec).
    * Deterministic: rank by (dot desc, neighbor id).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"),
      quantize(col("vec")).as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"),
      quantize(col("vec")).as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        qdot(col("qv"), col("cv")).as("dot"))
    topKPerQuery(scored, k)
  }

  /** Deterministic pseudo-random hyperplane component: md5-derived,
    * centered 16-bit value for (plane j, dim i) ≡ the oracle's
    * `CAST(concat('0x', substr(md5('<prefix><j>-<i>'), 1, 4)) AS BIGINT)
    * - 32768`. `prefix` namespaces independent plane sets (multi-table
    * LSH). Computed DRIVER-SIDE: the weights are constants per (plane,
    * dim), so hashing them per corpus row (the old in-plan spelling cost
    * dims × nPlanes md5 evaluations per vector) was pure waste — they
    * ship as array literals instead.
    */
  private def planeWeightValue(prefix: String, j: Int, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$prefix$j-$i".getBytes("UTF-8"))
    val h32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (h32 >> 16) - 32768L
  }

  /** Sign-bit LSH bucket id from `nPlanes` hyperplanes, over a
    * PRE-PROJECTED quantized column (project `quantize(vec)` once and
    * pass the alias — inlining re-runs the interpreted quantize transform
    * per plane). `dims` must match the embedding width (64 everywhere,
    * incl. the oracle's `range(1, 65)`): a mismatched vector nulls the
    * dot (QDot length contract), failing `> 0` into bit 0.
    */
  def lshBucketFromQuantized(qv: Column, nPlanes: Int,
      planePrefix: String = "plane", dims: Int = 64): Column = {
    val bits = (0 until nPlanes).map { j =>
      val w = lit((1 to dims).map(planeWeightValue(planePrefix, j, _)).toArray)
      val dot = graft.functions.QDot(qv, w)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Multi-table (OR-amplified) sign-LSH top-k: `nTables` independent
    * hyperplane sets; candidates = union of co-bucketed rows across
    * tables, then exact integer-dot ranking. Recall ≈ 1-(1-p)^L for
    * single-table collision probability p — the standard production
    * answer to single-table LSH's recall cliff.
    */
  def lshTopKMulti(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int, nTables: Int): DataFrame = {
    // one row per (id, table, bucket) → plain equi-join on (table, bucket):
    // shuffles by bucket key and scales to large query sets, unlike an
    // OR-of-buckets join (which degenerates to nested-loop). No forced
    // broadcast — that would collect |Q|·nTables quantized vectors to the
    // driver and defeat the scale claim; AQE broadcasts small query sets
    // on its own
    def exploded(df: DataFrame, idName: String, vecName: String) =
      df.select(col("id").as(idName), quantize(col("vec")).as(vecName))
        .select(col(idName), col(vecName),
          posexplode(array((0 until nTables).map(t =>
            lshBucketFromQuantized(col(vecName), nPlanes,
              planePrefix = s"tbl$t-plane")): _*))
            .as(Seq("tbl", "bucket")))
    val q = exploded(queries, "query_id", "qv")
    val c = exploded(corpus, "neighbor_id", "cv")
    val scored = q.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        qdot(col("qv"), col("cv")).as("dot"))
      .distinct()
    topKPerQuery(scored, k)
  }

  /** Bucketed ANN: exact ranking within the query's bucket only.
    * Trades recall (bucket misses) for touching 1/2^planes of the corpus.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int): DataFrame = {
    // EvalOnce on the join key — see embeddingNearDups
    val q = queries.select(col("id").as("query_id"),
      quantize(col("vec")).as("qv"))
      .select(col("query_id"), col("qv"),
        graft.functions.EvalOnce(lshBucketFromQuantized(col("qv"), nPlanes))
          .as("bucket"))
    val c = corpus.select(col("id").as("neighbor_id"),
      quantize(col("vec")).as("cv"))
      .select(col("neighbor_id"), col("cv"),
        graft.functions.EvalOnce(lshBucketFromQuantized(col("cv"), nPlanes))
          .as("bucket"))
    val scored = broadcast(q).join(c, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        qdot(col("qv"), col("cv")).as("dot"))
    topKPerQuery(scored, k)
  }

  /** Per-label quantized centroid components: (label, dim, sum, n) —
    * the IVF coarse-quantizer build step, exact integer sums.
    */
  def centroidSums(corpus: DataFrame, labelCol: String): DataFrame =
    corpus.select(col(labelCol).as("label"),
      posexplode(quantize(col("vec"))).as(Seq("dim", "q")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("q")).as("qsum"), count(lit(1)).as("n"))

  /** IVF (inverted-file) top-k — the clustered-index ANN scale path.
    * `corpus` carries (id, vec, label) where `label` is the coarse
    * quantizer's cell assignment; centroids are exact integer floor-means
    * of the quantized corpus per cell, so both engines derive bit-identical
    * centroids; each query probes only its `nProbe` closest cells (by
    * integer dot against the centroid) and is ranked exactly against those
    * inverted lists.
    *
    * Scale design: the centroid table is |cells|×dims rows — broadcast
    * both into the assignment join and (with the tiny probe map) into the
    * list scan; the corpus shuffles once on label, which at 100 TB is the
    * stored inverted-list partitioning, so a probe touches nProbe/|cells|
    * of the data instead of all of it. Recall misses come only from
    * neighbors living in unprobed cells — the standard IVF trade.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nProbe: Int): DataFrame =
    ivfTopKFiltered(queries, corpus, k, nProbe, lit(true))

  /** Metadata-filtered IVF search. The index — centroids and inverted
    * lists — is built on the FULL corpus; `candidateFilter` restricts
    * CANDIDATES at list-scan time (the production filtered-vector-search
    * shape: a stored index serves every predicate, the filter is
    * evaluated against list entries' metadata during the probe — FAISS
    * IDSelector / Milvus scalar filtering). Rebuilding the index per
    * predicate would both cost a full corpus pass per query batch and
    * CHANGE the centroids, silently shifting which cells get probed.
    *
    * Probe selection stays unfiltered, so per-query recall against the
    * filtered ground truth degrades as the predicate's survivors thin
    * out inside the probed cells — the documented filtered-ANN trade
    * (highly selective filters want more probes or a post-filter brute
    * pass; that knob is `nProbe` here).
    */
  def ivfTopKFiltered(queries: DataFrame, corpus: DataFrame, k: Int,
      nProbe: Int, candidateFilter: Column): DataFrame = {
    // the one floor-mean centroid derivation (exact integer math) —
    // see [[floorCentroids]]; an inline copy here forked the
    // engine-parity-critical pmod spelling
    val cent = floorCentroids(corpus)
    val q = queries.select(col("id").as("query_id"),
      quantize(col("vec")).as("qv"))
    val qd = q.select(col("query_id"), posexplode(col("qv")).as(Seq("dim", "qc")))
    val pr = Window.partitionBy(col("query_id"))
      .orderBy(col("cdot").desc, col("label"))
    val probes = qd.join(broadcast(cent), "dim")
      .groupBy(col("query_id"), col("label"))
      .agg(sum(col("qc") * col("c")).as("cdot"))
      .withColumn("pr", row_number().over(pr))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("label"))
    val lists = corpus.filter(candidateFilter)
      .select(col("id").as("neighbor_id"), col("label"),
        quantize(col("vec")).as("cv"))
    val scored = broadcast(q.join(probes, "query_id")).join(lists, "label")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        qdot(col("qv"), col("cv")).as("dot"))
    topKPerQuery(scored, k)
  }

  /** Product-quantization top-k with asymmetric distance (ADC, Jégou et
    * al. 2011): vectors are encoded per SUBSPACE as the id of the nearest
    * codebook centroid, and a query ranks candidates by the sum of its
    * exact subspace distances to each candidate's code centroids — the
    * memory-bound ANN scale path (a 64-dim vector stores as `subspaces`
    * small codes). The codebook reuses the IVF coarse cells: per-(label,
    * dim) floor-mean centroids, quantized independently per subspace, so
    * both engines derive bit-identical codes (exact integer math
    * throughout; distances are Σ(q−c)², ties → smallest label).
    *
    * Scale shapes: the codebook is |labels|×dims rows — broadcast; the
    * encode step's (vector × label × subspace) distance table is the
    * one-off codebook-assignment pass (stored alongside the corpus in
    * practice); the per-query ADC join touches |corpus|×subspaces rows
    * joined to a broadcast (query × label × subspace) distance table,
    * ranked through the bounded top-k aggregator — never a window over
    * the scored set.
    *
    * CONSTRAINT the caller owns: codebook cardinality = label
    * cardinality, and the assignment pass is O(|corpus|·|labels|·dims) —
    * a label column that grows LINEARLY with the corpus makes encoding
    * quadratic (StressAnn hit exactly this wall before switching to √n
    * cell growth). Production PQ fixes the codebook size (FAISS: 256
    * codes per subspace); here, keep |labels| bounded — O(√n) at most.
    */
  /** Per-label exact floor-mean centroids of the quantized corpus —
    * shared coarse quantizer / codebook of the IVF and PQ families.
    */
  private[ops] def floorCentroids(corpus: DataFrame): DataFrame =
    centroidSums(corpus.select(col("label"), col("vec")), "label")
      .select(col("label"), col("dim"),
        ((col("qsum") - pmod(col("qsum"), col("n"))) / col("n"))
          .cast("long").as("c"))

  /** The `nProbe` closest centroid cells per vector by integer centroid
    * dot — the ONE coarse-probe ranking shared by index build/append
    * assignment (nProbe = 1) and query probing. The tie-break
    * (cdot desc, label asc) is a correctness contract, not cosmetics:
    * appended vectors must land in exactly the cell their future
    * queries probe first, and three hand-maintained copies of this
    * block enforced that agreement by copy-paste.
    */
  private[ops] def coarseProbes(vectors: DataFrame, cent: DataFrame,
      idName: String, nProbe: Int): DataFrame = {
    val pr = Window.partitionBy(col(idName))
      .orderBy(col("cdot").desc, col("label"))
    vectors
      .select(col("id").as(idName),
        posexplode(quantize(col("vec"))).as(Seq("dim", "qc")))
      .join(broadcast(cent), "dim")
      .groupBy(col(idName), col("label"))
      .agg(sum(col("qc") * col("c")).as("cdot"))
      .withColumn("pr", row_number().over(pr))
      .filter(col("pr") <= nProbe)
      .select(col(idName), col("label").as("coarse"))
  }

  /** Σ(q−c)² per (id, centroid label, subspace) — exact integers. */
  private[ops] def subspaceDists(cent: DataFrame, width: Int)(
      df: DataFrame, idName: String): DataFrame = df
    .select(col("id").as(idName),
      posexplode(quantize(col("vec"))).as(Seq("dim", "qc")))
    .join(broadcast(cent), "dim")
    .groupBy(col(idName), col("label"),
      (col("dim") / lit(width)).cast("int").as("s"))
    .agg(sum((col("qc") - col("c")) * (col("qc") - col("c"))).as("d2"))

  /** PQ encode: nearest codebook centroid per (vector, subspace), ties →
    * min label.
    */
  private[ops] def pqCodes(cent: DataFrame, width: Int,
      corpus: DataFrame): DataFrame =
    subspaceDists(cent, width)(corpus, "nid")
      .groupBy(col("nid"), col("s"))
      .agg(min(struct(col("d2"), col("label"))).as("m"))
      .select(col("nid").as("neighbor_id"), col("s"), col("m.label").as("label"))

  /** ADC rank: sum the query's per-(s, code label) distances over each
    * candidate's codes, keep k per query (dist ASC via negated top-k).
    * `joinKeys` carries query_id when the candidate frame is already
    * per-query (the IVF-restricted path).
    */
  private[ops] def adcTopK(codes: DataFrame, qd: DataFrame, k: Int,
      joinKeys: Seq[String] = Seq("s", "label")): DataFrame = {
    val scored = codes.join(broadcast(qd), joinKeys)
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("d2")).as("dist"))
      // rank by dist ASC through the bounded top-k aggregator (it ranks
      // dot DESC, neighbor ASC — negate)
      .select(col("query_id"), col("neighbor_id"), (-col("dist")).as("dot"))
    topKPerQuery(scored, k)
      .select(col("query_id"), col("neighbor_id"),
        (-col("dot")).as("dist"), col("rk"))
  }

  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      subspaces: Int = 4, dims: Int = 64): DataFrame = {
    require(dims % subspaces == 0, s"$dims dims not divisible by $subspaces")
    val width = dims / subspaces
    val cent = floorCentroids(corpus)
    val codes = pqCodes(cent, width, corpus)
    val qd = subspaceDists(cent, width)(queries, "query_id")
      .select(col("query_id"), col("s"), col("label"), col("d2"))
    adcTopK(codes, qd, k)
  }

  /** IVF+PQ — the production ANN composition (FAISS's IVFPQ shape): the
    * coarse inverted-file probe bounds the candidate set to `nProbe`
    * cells, and PQ asymmetric distances rank those candidates from
    * their compact codes. Same exact-integer math as e05/e07, so both
    * engines agree bit-for-bit.
    *
    * Scale shapes: everything pqTopK broadcasts stays broadcast (the
    * codebook, the query distance table, now also the |Q|×nProbe probe
    * map); the corpus-sized frames — codes and the coarse-cell map —
    * equi-join on neighbor_id, and the probe restriction drops
    * (1 − nProbe/|cells|) of the candidate rows BEFORE the ADC
    * aggregation shuffles anything.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int, nProbe: Int,
      subspaces: Int = 4, dims: Int = 64): DataFrame = {
    require(dims % subspaces == 0, s"$dims dims not divisible by $subspaces")
    val width = dims / subspaces
    val cent = floorCentroids(corpus)
    val probes = coarseProbes(queries, cent, "query_id", nProbe)
    val coarse = corpus.select(col("id").as("neighbor_id"),
      col("label").as("coarse"))
    val codes = pqCodes(cent, width, corpus)
      .join(coarse, "neighbor_id")
    val qd = subspaceDists(cent, width)(queries, "query_id")
      .select(col("query_id"), col("s"), col("label"), col("d2"))
    // probe restriction BEFORE the ADC agg: candidates outside the
    // query's probed cells never reach the distance sum (the join
    // attaches query_id, so the ADC join carries it too)
    val restricted = codes.join(broadcast(probes), Seq("coarse"))
      .drop("coarse")
    adcTopK(restricted, qd, k, Seq("query_id", "s", "label"))
  }

  /** The full production retrieval shape: IVF+PQ approximate ADC
    * shortlist (`shortlist` candidates per query) → EXACT re-rank of the
    * shortlist by integer dot → top `k`. This is what FAISS deployments
    * actually serve — the quantized index bounds the scan, the exact pass
    * fixes the quantization error on a sliver of the corpus.
    *
    * Scale shape: the shortlist is |Q|·shortlist rows (query-batch-sized,
    * NOT corpus-sized), broadcast into one equi-join against the corpus
    * scan — the exact dot runs only on matched rows, the corpus never
    * shuffles, and the final rank goes through the bounded top-k
    * aggregator.
    */
  def ivfPqRerankTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      shortlist: Int, nProbe: Int, subspaces: Int = 4,
      dims: Int = 64): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = ivfPqTopK(queries, corpus, shortlist, nProbe, subspaces, dims)
      .select(col("query_id"), col("neighbor_id"))
    val qq = queries.select(col("id").as("query_id"),
      quantize(col("vec")).as("qq"))
    val shortQ = cand.join(broadcast(qq), "query_id")
    val scored = corpus
      .select(col("id").as("neighbor_id"), quantize(col("vec")).as("nq"))
      .join(broadcast(shortQ), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        qdot(col("qq"), col("nq")).as("dot"))
    topKPerQuery(scored, k)
  }

  /** Scalar-quantized (SQ8) top-k: each dimension linearly mapped to an
    * 8-bit code against the CORPUS's per-dimension [min, max] band (the
    * FAISS SQ8 family — a different compression/recall trade than PQ's
    * subspace codebooks: one byte per dimension, no codebook training),
    * then symmetric integer dot over the code arrays. Exact integer
    * arithmetic end-to-end so the oracle replays the codes bit-for-bit:
    * code = (v−min)·255 floor-div span via the subtract-mod spelling
    * (both engines' integer division agrees on non-negative operands —
    * same trick as the e08 centroid oracle).
    *
    * Scale shape: per-dim stats are one narrow aggregate (dims rows)
    * packed into two array literals broadcast to every task; coding is
    * map-side zip_with; queries broadcast; the only shuffle is the
    * bounded top-k aggregator. The corpus never shuffles.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val dimStats = corpus
      .select(posexplode(quantize(col("vec"))).as(Seq("dim", "qv")))
      .groupBy(col("dim"))
      .agg(min(col("qv")).as("mn"), max(col("qv")).as("mx"))
    // dims rows → ONE sorted collect (struct sort orders by the leading
    // `dim` field) → per-dim min and span arrays. Spans are precomputed
    // here — computing them per row would re-run a dims-element
    // interpreted HOF over constant inputs for every vector.
    val sorted = array_sort(
      collect_list(struct(col("dim"), col("mn"), col("mx"))))
    val packed = dimStats.agg(
      transform(sorted, s => s("mn")).as("mins"),
      transform(sorted, s => greatest(s("mx") - s("mn"), lit(1L)))
        .as("spans"))
    // stat arrays are SLICED to each vector's own length: one malformed
    // over-length corpus vector widens the stats, and an unsliced
    // zip_with would null-pad EVERY well-formed vector's codes (QDot
    // nulls the pair → the whole result empties). Sliced, a bad row only
    // drops its own pairs — same contract as bruteForceTopK. Codes are
    // clamped to [0,255] so out-of-band queries still produce legal
    // bytes (oracle clamps identically).
    def codes(vec: Column): Column = {
      val qv = quantize(vec)
      zip_with(
        zip_with(qv, slice(col("mins"), lit(1), size(qv)),
          (v, mn) => v - mn),
        slice(col("spans"), lit(1), size(qv)),
        (diff, sp) => {
          val num = diff * lit(255L)
          greatest(least(((num - pmod(num, sp)) / sp).cast("long"),
            lit(255L)), lit(0L))
        })
    }
    val q = queries.crossJoin(broadcast(packed))
      .select(col("id").as("query_id"), codes(col("vec")).as("qc"))
    val c = corpus.crossJoin(broadcast(packed))
      .select(col("id").as("neighbor_id"), codes(col("vec")).as("cc"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        qdot(col("qc"), col("cc")).as("dot"))
    topKPerQuery(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs above an integer-dot threshold,
    * restricted to LSH co-bucketed candidates.
    *
    * `maxBucket` is the megabucket guard (same rationale as
    * [[Dedup.minhashNearDups]]): a clustered corpus can put most vectors
    * in one sign-bucket, and an unguarded self-join there costs m² pairs.
    * Buckets above the cap are skipped — a documented recall trade, and
    * the d06 oracle applies the identical cap.
    */
  def embeddingNearDups(corpus: DataFrame, nPlanes: Int,
      minDot: Long, maxBucket: Int = 200,
      capAudit: Option[org.apache.spark.sql.Observation] = None,
      megabucketStar: Boolean = false): DataFrame = {
    // EvalOnce on the join key: the self-join infers isnotnull(bucket),
    // which would otherwise be pushed to the scan with all nPlanes
    // hyperplane dot products inlined into the filter
    val v = corpus.select(col("id"), quantize(col("vec")).as("qv"))
      .select(col("id"), col("qv"),
        graft.functions.EvalOnce(lshBucketFromQuantized(col("qv"), nPlanes))
          .as("bucket"))
    // no forced broadcast: the small-bucket list is ≤ 2^nPlanes rows,
    // AQE broadcasts it on its own
    val bucketCounts = graft.ops.CapAudit.observed(
      v.groupBy(col("bucket")).count(), maxBucket, capAudit)
    val small = bucketCounts
      .filter(col("count") <= maxBucket).select(col("bucket"))
    val capped = v.join(small, Seq("bucket"))
    val l = capped.select(col("bucket"), col("id").as("id_a"), col("qv").as("qa"))
    val r = capped.select(col("bucket"), col("id").as("id_b"), col("qv").as("qb"))
    val allPairs = l.join(r, "bucket").filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("qa"), col("id_b"), col("qb"))
    // star fallback — the O(m) hub↔member upgrade of
    // [[graft.ops.Dedup.minhashNearDups]], for sign-bucket megaclusters.
    // Disjoint from allPairs (mega vs small buckets), so no dedup needed.
    val candidates = if (!megabucketStar) allPairs else {
      val megaRows = v.join(
        bucketCounts.filter(col("count") > maxBucket).select(col("bucket")),
        Seq("bucket"))
      val hubs = megaRows.groupBy(col("bucket"))
        .agg(min_by(struct(col("id"), col("qv")), col("id")).as("h"))
        .select(col("bucket"), col("h.id").as("id_a"), col("h.qv").as("qa"))
      val starPairs = megaRows.join(hubs, Seq("bucket"))
        .filter(col("id") > col("id_a"))
        .select(col("id_a"), col("qa"),
          col("id").as("id_b"), col("qv").as("qb"))
      allPairs.unionByName(starPairs)
    }
    candidates
      // EvalOnce: the minDot filter would otherwise be pushed through this
      // projection, inlining the 64-dim dot product into the predicate and
      // evaluating it twice per candidate pair
      .select(col("id_a"), col("id_b"),
        graft.functions.EvalOnce(qdot(col("qa"), col("qb"))).as("dot"))
      .filter(col("dot") >= minDot)
  }
}

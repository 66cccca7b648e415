package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora.
  *
  * Hash functions are md5-derived (`hash32`) rather than Spark's murmur
  * `hash()` so every stage is reproducible in any engine (the DuckDB
  * oracle included) and stable across Spark versions — at the cost of a
  * few cycles per token, irrelevant next to the shuffle.
  *
  * Scale design:
  *   - exact dedup = one hash-aggregate on the fingerprint (map-side
  *     partial aggregation collapses duplicates before the shuffle);
  *   - MinHash/LSH = map-only signature computation, then a shuffle on
  *     (band, bucket) whose fan-in is the bucket size, never all-pairs;
  *     candidate verification touches only co-bucketed pairs;
  *   - SimHash = map-only signature; near-dup = band the 16 bits into 4
  *     sub-keys (any ≤4-bit-distant pair shares a sub-key by pigeonhole
  *     when split appropriately) — here exposed as signature + bucket join.
  */
object Dedup {

  /** Estimated scan partition count for `df`, from the file index and
    * the session's split arithmetic — ANALYSIS-ONLY. The previous probes
    * (`df.rdd`, then `queryExecution.toRdd` — r12 verdict "what's
    * wrong" #2) built the optimized physical plan per call, which
    * measured ~0.2 s on the sub-second codec queries, eating the win
    * the guard protects. The file listing is served by the relation's
    * already-built InMemoryFileIndex (paid at DataFrame creation), so
    * this probe is a driver-side arithmetic pass.
    *
    * Used by the conditional fan-out guards: repartition only when the
    * scan is narrower than the session's cores. The count mirrors
    * FilePartition.maxSplitBytes (ceil(total/maxSplit) is the packing's
    * lower bound); an estimate is exactly enough for a narrow-vs-wide
    * decision, and both failure directions are benign (a borderline
    * scan gains or skips one cheap ids-only shuffle). Falls back to the
    * planned RDD when the source is not file-based.
    */
  private[graft] def scanParts(df: org.apache.spark.sql.Dataset[_]): Int = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val rels = df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation
    }.collect { case r: HadoopFsRelation => r }
    if (rels.isEmpty) return df.queryExecution.toRdd.getNumPartitions
    val spark = df.sparkSession
    val conf = spark.sessionState.conf
    val maxSplit = conf.filesMaxPartitionBytes
    val openCost = conf.filesOpenCostInBytes
    val minPartNum = conf.filesMinPartitionNum
      .getOrElse(spark.sparkContext.defaultParallelism).max(1)
    val sizes = rels.flatMap(
      _.location.listFiles(Nil, Nil).flatMap(_.files.map(_.getLen)))
    val totalBytes = sizes.map(_ + openCost).sum
    if (totalBytes <= 0L) return 1
    val bytesPerCore = totalBytes / minPartNum
    val splitBytes = math.min(maxSplit, math.max(openCost, bytesPerCore))
    math.max(1, math.ceil(totalBytes.toDouble / splitBytes).toInt)
  }

  /** 32-bit integer from md5 of `c` salted with `seed` — engine-portable
    * (≡ `conv(substring(md5(…),1,8),16,10)`, see the DuckDB oracles), via
    * the native codegen'd expression.
    */
  def hash32(c: Column, seed: Int): Column =
    graft.functions.Md5Prefix64(concat(c, lit(s"#$seed")))

  /** 60-bit variant (md5 prefix, see [[graft.functions.Md5Prefix60]]) —
    * for MEMBERSHIP tests where a 32-bit collision silently corrupts
    * (a benchmark-gram set of 10M puts ~0.23% of ALL corpus positions
    * in collision at 32 bits; 2^-60-scale at 60).
    */
  def hash60(c: Column, seed: Int): Column =
    graft.functions.Md5Prefix60(concat(c, lit(s"#$seed")))

  /** Corpus-wide chunk-granular dedup (MassiveText-style paragraph
    * dedup, fixed-width chunks here): a chunk survives only at its
    * globally FIRST occurrence ordered by (id, position); every doc is
    * reassembled from its surviving chunks in position order. Returns
    * (idCol, dedup_text, n_chunks, n_kept) for every input doc —
    * fully-duplicated docs come back with empty text, not dropped.
    *
    * Scale shape: two shuffles by necessity — one keyed on chunk text
    * (the global dedup; rank-limit pushdown a.k.a. WindowGroupLimit
    * drops per-chunk non-firsts map-side, so the exchange carries
    * ~distinct-chunk mass, not corpus mass), one keyed on id (the
    * reassembly aggregate). The doc-side rejoin broadcasts when small
    * and degrades to a shuffle join at scale — either way no state
    * beyond the two exchanges.
    */
  def crossDocChunkDedup(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // chunking + explode is the CPU-heavy map step and it runs at the
    // SCAN's parallelism — a small single-file corpus is one split, so
    // the whole tokenize/explode pass serialized (measured 3.1 s at
    // parallelism 1 on d33 @ sf0.1). Fan out only when the scan is
    // narrower than the session's cores (guide §2.5: repartition right
    // after an unsplittable read); a corpus that already has enough
    // splits is left alone — at 100 TB this branch never fires and no
    // full-text shuffle is added.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val src =
      if (Dedup.scanParts(docs) < par) docs.repartition(par) else docs
    val chunks = TextOps.fixedChunks(col(textCol), width)
    val exploded = src
      .select(col(idCol), posexplode(chunks).as(Seq("pos", "chunk")))
    val w = Window.partitionBy(col("chunk"))
      .orderBy(col(idCol).asc, col("pos").asc)
    val kept = exploded
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val re = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("chunk")))),
            x => x.getField("chunk")), " ").as("kept_text"))
    src
      .select(col(idCol), size(chunks).cast("bigint").as("n_chunks"))
      .join(re, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("kept_text"), lit("")).as("dedup_text"),
        col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Exact duplicate groups: fingerprint → (keep = min id, n). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature from a pre-projected distinct-token column — the
    * BUILT-IN spelling (k interpreted `transform` passes), kept as the
    * reference implementation [[graft.functions.MinhashSig]]'s parity
    * spec checks the native one-pass expression against.
    */
  def minhashSignatureFromTokens(toks: Column, k: Int): Seq[Column] =
    (0 until k).map { i =>
      array_min(transform(toks, t => hash32(t, i))).as(s"mh$i")
    }

  /** All k signature mins in one compiled pass (see MinhashSig). Project
    * this ONCE into a named column, then `element_at` the seeds — inlining
    * it per seed would re-run the whole pass k times.
    */
  def minhashSigArray(toks: Column, k: Int): Column =
    graft.functions.MinhashSig(toks, k)

  /** MinHash signature of the token set, k independent permutations. */
  def minhashSignature(text: Column, k: Int): Seq[Column] =
    minhashSignatureFromTokens(
      array_distinct(TextOps.tokens(lower(text))), k)

  /** LSH candidate pairs from banded minhash signatures: docs sharing any
    * band bucket, verified with exact token-set Jaccard ≥ `threshold`.
    * `bands` × `rowsPerBand` must equal the signature length.
    *
    * `maxBucket` is the megabucket guard: buckets above the cap are
    * skipped entirely (their pair blow-up is quadratic — one degenerate
    * bucket of m docs costs m² comparisons). Standard production LSH
    * practice; the skipped mass is a recall trade the caller can AUDIT by
    * passing `capAudit` (see [[CapAudit]] — dropped buckets/rows reported
    * with the action, no extra pass).
    *
    * `megabucketStar` upgrades the guard from drop to star: each
    * megabucket emits (hub, member) candidate pairs against its MIN-id
    * member only — O(m) work instead of the m² all-pairs, still enough to
    * connect every member into the duplicate component downstream
    * (connected components need one edge per member, not a clique).
    * Jaccard verification still applies, so star recall is exact for
    * identical-duplicate megabuckets (the common degenerate case:
    * boilerplate, templated spam) and partial when a bucket mixes
    * dissimilar docs that happen to collide. StressCorpus measures the
    * difference on a ×30 corpus where 98 % of band rows sit in
    * megabuckets: doc recall 0.07 (drop) → 0.98 (star) vs a 100×-looser
    * cap, at ~1 % of the looser cap's pair volume — the residual gap is
    * members whose similarity to the HUB fails verification even though
    * some member↔member pair would pass.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = 100,
      capAudit: Option[org.apache.spark.sql.Observation] = None,
      megabucketStar: Boolean = false): DataFrame = {
    val k = bands * rowsPerBand
    // two-step projection: tokenize once, then ONE native signature pass
    // (CollapseProject keeps multi-use expensive aliases projected)
    val sig = docs
      .select(col(idCol).as("id"),
        array_distinct(TextOps.tokens(lower(col(textCol)))).as("toks"))
      .select(col("id"), col("toks"),
        minhashSigArray(col("toks"), k).as("sig"))

    // one row per (doc, band): bucket = md5 over the band's minhashes.
    // The repartition is the single materialization point: the
    // bucket-count agg, the cap join, and both self-join sides reuse
    // this one exchange instead of re-deriving the signature pipeline
    // (same pattern as ngramJaccardPairs / simhashHammingPairs)
    val banded = sig.select(col("id"), col("toks"),
      posexplode(array((0 until bands).map { b =>
        md5(concat_ws("_",
          (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*))
      }: _*)).as(Seq("band", "bucket")))
      .repartition(col("band"), col("bucket"))

    // no forced broadcast: the small-bucket list scales with corpus size
    // (≈ one row per bucket); AQE broadcasts when it fits
    val bucketCounts = CapAudit.observed(
      banded.groupBy(col("band"), col("bucket")).count(), maxBucket, capAudit)
    val smallBuckets = bucketCounts
      .filter(col("count") <= maxBucket)
      .select(col("band"), col("bucket"))
    val capped = banded.join(smallBuckets, Seq("band", "bucket"))

    // co-bucketed pairs (a < b) in the capped buckets
    val l = capped.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("toks").as("toks_a"))
    val r = capped.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("toks").as("toks_b"))
    val allPairs = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("toks_a"), col("id_b"), col("toks_b"))

    // star fallback: megabucket members pair with the bucket's min-id hub
    // only — O(m) rows per bucket. The hub frame is one row per megabucket
    // (metadata-sized; AQE broadcasts it into the member join).
    val candidates = if (!megabucketStar) allPairs else {
      val megaRows = banded.join(
        bucketCounts.filter(col("count") > maxBucket)
          .select(col("band"), col("bucket")),
        Seq("band", "bucket"))
      val hubs = megaRows.groupBy(col("band"), col("bucket"))
        .agg(min_by(struct(col("id"), col("toks")), col("id")).as("h"))
        .select(col("band"), col("bucket"),
          col("h.id").as("id_a"), col("h.toks").as("toks_a"))
      val starPairs = megaRows.join(hubs, Seq("band", "bucket"))
        .filter(col("id") > col("id_a")) // hub is the min ⇒ a < b holds
        .select(col("id_a"), col("toks_a"),
          col("id").as("id_b"), col("toks").as("toks_b"))
      allPairs.unionByName(starPairs)
    }

    // exact Jaccard verification
    val inter = size(array_intersect(col("toks_a"), col("toks_b")))
      .cast("double")
    val union = (size(col("toks_a")) + size(col("toks_b"))).cast("double") -
      inter
    candidates
      // size-ratio prefilter (see ngramJaccardPairs): necessary condition
      // for jaccard ≥ threshold, result-neutral, skips the set intersection
      .filter(least(size(col("toks_a")), size(col("toks_b"))).cast("double") >=
        lit(threshold) *
          greatest(size(col("toks_a")), size(col("toks_b"))).cast("double"))
      // EvalOnce: the threshold filter below would otherwise be pushed
      // through this projection with the jaccard expression (and its two
      // array scans) inlined into the predicate — double evaluation
      .select(col("id_a"), col("id_b"),
        graft.functions.EvalOnce(inter / union).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** One row per (doc, band) with its LSH bucket — the PERSISTABLE
    * signature-store layout (`id BIGINT, band INT, bucket STRING`)
    * behind [[incrementalMinhashNearDups]]. Same tokenization,
    * signature pass and band hashing as [[minhashNearDups]], minus the
    * token payload: the store carries only what banding needs; the
    * verification step re-fetches token sets BY ID from the document
    * store (bounded by candidate count, never corpus-sized).
    */
  def minhashBandedRows(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    docs
      .select(col(idCol).as("id"),
        array_distinct(TextOps.tokens(lower(col(textCol)))).as("toks"))
      .select(col("id"), minhashSigArray(col("toks"), k).as("sig"))
      .select(col("id"),
        posexplode(array((0 until bands).map { b =>
          md5(concat_ws("_",
            (0 until rowsPerBand).map(r =>
              element_at(col("sig"), b * rowsPerBand + r + 1)): _*))
        }: _*)).as(Seq("band", "bucket")))
      .select(col("id"), col("band").cast("int").as("band"), col("bucket"))
  }

  /** INCREMENTAL near-dup detection of a new batch against a persisted
    * signature store — the production shape of continuous corpus
    * ingestion: signatures are computed ONLY for the new docs; the
    * historical corpus participates through its stored band rows
    * ([[minhashBandedRows]]), never re-tokenized or re-signed.
    *
    * Scale contract, in order:
    *  1. `hot` = the distinct (band, bucket) keys the BATCH touches —
    *     batch-sized metadata;
    *  2. the store is SEMI-JOIN PRUNED to hot buckets before anything
    *     heavy (on a 100 TB corpus this is the difference between
    *     reading the store and reading the few buckets the batch can
    *     possibly collide with — with the store range-clustered on
    *     `bucket`, the scan itself zone-map-prunes);
    *  3. the megabucket cap counts FULL membership per hot bucket
    *     (store + batch — identical to what a from-scratch run over the
    *     whole corpus would count, so incremental output ≡ batch-involved
    *     slice of the full run, which is exactly what the d36 oracle
    *     checks);
    *  4. candidate pairs need ≥ one NEW side; they dedup BEFORE
    *     verification;
    *  5. token sets for verification are fetched from `allDocs` by
    *     candidate id — two id-keyed joins whose small side is the
    *     candidate set.
    *
    * Returns pairs (id_a < id_b, ≥ one side new) with exact Jaccard ≥
    * `threshold` — the caller then appends the batch's band rows to the
    * store (a delta commit), converging the store to the full corpus.
    */
  def incrementalMinhashNearDups(allDocs: DataFrame, newDocs: DataFrame,
      storedBands: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = 100): DataFrame =
    incrementalMinhashNearDupsBanded(allDocs, newDocs, storedBands,
      idCol, textCol, bands, rowsPerBand, threshold, maxBucket)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .distinct()

  /** [[incrementalMinhashNearDups]] keeping the (band, bucket) a pair
    * was found in. This is what a MULTI-batch consumer (s22's streaming
    * maintenance) stores: the stage-time megabucket cap sees only the
    * members that have ARRIVED, so the converged pair set is cut
    * against CONVERGED bucket counts at serve time instead — sound
    * because bucket membership only grows (stage count ≤ converged
    * count): a converged-small bucket was small at every stage, so no
    * emission was ever suppressed; a converged-mega bucket is dropped
    * wholesale, exactly as a from-scratch run drops it. The serve-time
    * cut needs the bucket key on every stored pair — hence this
    * variant. A pair found in several buckets carries one row per
    * bucket (identical jaccard); the serve side distincts after the
    * cut.
    */
  def incrementalMinhashNearDupsBanded(allDocs: DataFrame,
      newDocs: DataFrame, storedBands: DataFrame, idCol: String,
      textCol: String, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = 100): DataFrame = {
    val newBands = minhashBandedRows(newDocs, idCol, textCol, bands,
      rowsPerBand).repartition(col("band"), col("bucket"))
    val hot = newBands.select(col("band"), col("bucket")).distinct()
    val storedHot = storedBands.select(col("id"), col("band"), col("bucket"))
      .join(hot, Seq("band", "bucket"), "left_semi")
    val union = storedHot.withColumn("is_new", lit(false))
      .unionByName(newBands.withColumn("is_new", lit(true)))
    val counts = union.groupBy(col("band"), col("bucket")).count()
    val small = counts.filter(col("count") <= maxBucket)
      .select(col("band"), col("bucket"))
    val capped = union.join(small, Seq("band", "bucket"))
    val l = capped.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("is_new").as("new_a"))
    val r = capped.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("is_new").as("new_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b") && (col("new_a") || col("new_b")))
      .select(col("band"), col("bucket"), col("id_a"), col("id_b"))
      .distinct()
    val toks = allDocs.select(col(idCol).as("id"),
      array_distinct(TextOps.tokens(lower(col(textCol)))).as("toks"))
    val fetched = candidates
      .join(toks.select(col("id").as("id_a"), col("toks").as("toks_a")),
        Seq("id_a"))
      .join(toks.select(col("id").as("id_b"), col("toks").as("toks_b")),
        Seq("id_b"))
    val inter = size(array_intersect(col("toks_a"), col("toks_b")))
      .cast("double")
    val union2 = (size(col("toks_a")) + size(col("toks_b"))).cast("double") -
      inter
    fetched
      .select(col("band"), col("bucket"), col("id_a"), col("id_b"),
        graft.functions.EvalOnce(inter / union2).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** One micro-batch of STREAMING dedup maintenance (s22): compute the
    * batch's near-dup pairs against the persisted store, then land the
    * batch as three exactly-once delta commits — pairs, band rows,
    * corpus docs. Replay-safe by construction:
    *
    *  - the PAIRS commit runs FIRST, while the store and corpus are
    *    still pre-batch — the append action materializes the plan at
    *    that state;
    *  - the bands/corpus payloads derive from the batch alone, so a
    *    replay after a mid-batch crash recomputes them identically;
    *  - a replay that re-reads a store ALREADY containing this batch's
    *    bands would compute garbage pairs — and never commits them,
    *    because [[Lakehouse.appendExactlyOnce]] checks the batch-id
    *    marker before evaluating anything.
    *
    * `midCrash` fires between the first and second commit — the widest
    * torn window (pairs landed, store/corpus stale) — so the s22
    * harness can prove the restart heals it.
    */
  def appendBatchIncremental(lake: graft.storage.Lakehouse,
      corpusName: String, storeName: String, pairsName: String,
      batch: DataFrame, idCol: String, textCol: String, bands: Int,
      rowsPerBand: Int, threshold: Double, maxBucket: Int,
      batchId: Long, midCrash: () => Unit = () => ()): Unit = {
    val storeSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, band INT, bucket STRING")
    val corpusSchema = org.apache.spark.sql.types.StructType.fromDDL(
      s"$idCol BIGINT, $textCol STRING")
    val stored = lake.read(storeName, storeSchema)
    val allSoFar = lake.read(corpusName, corpusSchema)
      .unionByName(batch.select(col(idCol), col(textCol)))
    val pairs = incrementalMinhashNearDupsBanded(allSoFar, batch, stored,
      idCol, textCol, bands, rowsPerBand, threshold, maxBucket)
    lake.appendExactlyOnce(pairsName, pairs, batchId)
    midCrash()
    lake.appendExactlyOnce(storeName,
      minhashBandedRows(batch, idCol, textCol, bands, rowsPerBand),
      batchId)
    lake.appendExactlyOnce(corpusName,
      batch.select(col(idCol), col(textCol)), batchId)
  }

  /** 16-bit token hash = top half of the 32-bit md5 prefix (first 4 hex
    * chars ≡ first 2 digest bytes).
    */
  def hash16(c: Column): Column =
    shiftright(graft.functions.Md5Prefix64(c), 16)

  /** 16-bit SimHash from token hashes: bit j is the sign of Σ ±1 over
    * tokens (weighted by presence). Map-only; near-dup = small hamming
    * distance between signatures. One compiled pass via the native
    * [[graft.functions.Simhash16]] expression.
    */
  def simhash16(text: Column): Column =
    graft.functions.Simhash16(
      array_distinct(TextOps.tokens(lower(text))), "").as("simhash")

  /** SimHash from a pre-projected token-hash array column — the 16
    * per-bit vote aggregates each re-scan the array, so the md5 work must
    * be materialized once, not inlined 16×. This is the BUILT-IN spelling
    * of [[graft.functions.Simhash16]]'s vote loop, kept as the
    * independent reference implementation its parity spec checks the
    * native expression against (and for callers that already hold hash
    * arrays rather than tokens).
    */
  def simhash16FromHashes(hashes: Column): Column = {
    val bits = (0 until 16).map { j =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << j)) =!= 0L, lit(1L))
          .otherwise(lit(-1L)))
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _).as("simhash")
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs by banded hamming distance (Manku et al.,
    * WWW'07): a 64-bit signature held as FOUR independently-salted 16-bit
    * quadrants, banded on quadrant equality. By pigeonhole, any pair
    * within `maxHamming` ≤ 3 bits over the 64 differs in at most 3
    * quadrants, so it shares at least one — the banding is EXACT recall
    * for the threshold, never all-pairs. Quadrants stay separate longs
    * (never assembled into one word): bit 63 would flip the sign in
    * Spark while overflowing DuckDB's BIGINT constructor, and the
    * banding only ever compares quadrants anyway.
    *
    * Scale: signatures are map-only; the shuffle is on (band, quadrant
    * value) with fan-in = bucket size; `maxBucket` is the same megabucket
    * guard as [[minhashNearDups]] (a degenerate bucket of m docs costs m²
    * pairs — skipped mass is a documented recall trade).
    */
  /** Quadrant `q`'s salted token hashes (the [[simhashHammingPairs]]
    * signature input) from a pre-projected distinct-token array —
    * exposed so callers can persist signatures and tests can brute-force
    * the pair set.
    */
  def simhashQuadrantHashes(toks: Column, q: Int): Column =
    transform(toks, t => hash16(concat(t, lit(s"@shq$q"))))

  def simhashHammingPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 100,
      capAudit: Option[org.apache.spark.sql.Observation] = None,
      megabucketStar: Boolean = false): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banding over 4 quadrants is exact only for maxHamming ≤ 3: $maxHamming")
    // two-step projection (CollapseProject keeps the multi-use tokenize
    // alias apart): tokenize once, then one native single-pass signature
    // per quadrant (hash + all 16 bit votes fused — see Simhash16)
    val base = docs
      .select(col(idCol).as("id"),
        array_distinct(TextOps.tokens(lower(col(textCol)))).as("toks"))
      .select(col("id") +: (0 until 4).map(q =>
        graft.functions.Simhash16(col("toks"), s"@shq$q").as(s"sh$q")): _*)

    val shCols = (0 until 4).map(q => col(s"sh$q"))
    // one materialization point for the signature pipeline: the explicit
    // null pre-filter makes the inferred isnotnull(bkey) of the joins a
    // no-op, so the bucket-count agg, the cap join, and both self-join
    // sides all reuse THIS exchange instead of re-deriving the scan +
    // 4 signature passes (same pattern as ngramJaccardPairs)
    val banded = base.select(col("id") +: shCols :+
      posexplode(array(shCols: _*)).as(Seq("band", "bkey")): _*)
      .filter(col("bkey").isNotNull)
      .repartition(col("band"), col("bkey"))
    val bucketCounts = CapAudit.observed(
      banded.groupBy(col("band"), col("bkey")).count(), maxBucket, capAudit)
    val small = bucketCounts
      .filter(col("count") <= maxBucket).select(col("band"), col("bkey"))
    val capped = banded.join(small, Seq("band", "bkey"))

    val l = capped.select(col("band") +: col("bkey") +:
      col("id").as("id_a") +: (0 until 4).map(q => col(s"sh$q").as(s"a$q")): _*)
    val r = capped.select(col("band") +: col("bkey") +:
      col("id").as("id_b") +: (0 until 4).map(q => col(s"sh$q").as(s"b$q")): _*)
    val allPairs = l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(Seq(col("id_a"), col("id_b")) ++
        (0 until 4).flatMap(q => Seq(col(s"a$q"), col(s"b$q"))): _*)

    // star fallback — same O(m) hub↔member upgrade as [[minhashNearDups]]
    val candidates = if (!megabucketStar) allPairs else {
      val megaRows = banded.join(
        bucketCounts.filter(col("count") > maxBucket)
          .select(col("band"), col("bkey")),
        Seq("band", "bkey"))
      val hubs = megaRows.groupBy(col("band"), col("bkey"))
        .agg(min_by(struct(col("id") +: shCols: _*), col("id")).as("h"))
        .select(col("band") +: col("bkey") +: col("h.id").as("id_a") +:
          (0 until 4).map(q => col(s"h.sh$q").as(s"a$q")): _*)
      val starPairs = megaRows.join(hubs, Seq("band", "bkey"))
        .filter(col("id") > col("id_a"))
        .select(Seq(col("id_a"), col("id").as("id_b")) ++
          (0 until 4).flatMap(q =>
            Seq(col(s"a$q"), col(s"sh$q").as(s"b$q"))): _*)
      allPairs.unionByName(starPairs)
    }

    val ham = (0 until 4).map(q => hamming(col(s"a$q"), col(s"b$q")))
      .reduce(_ + _).cast("bigint")
    candidates
      .select(col("id_a"), col("id_b"), ham.as("hamming"))
      .distinct() // a pair sharing k quadrants appears in k bands
      .filter(col("hamming") <= maxHamming)
  }

  /** N-gram (word 3-gram) Jaccard similarity between all candidate pairs
    * sharing a shingle-minhash bucket — the shingle variant of near-dup.
    * Same megabucket cap as [[minhashNearDups]]: a degenerate bucket of m
    * docs would cost m² comparisons.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxBucket: Int = 100,
      capAudit: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    // Jaccard runs over HASHED shingle sets: integer intersections are an
    // order of magnitude cheaper than ~100-char string compares per
    // element, and 32-bit collisions are negligible at shingle-set sizes.
    // the repartition is a hard projection barrier: the shingle builder's
    // lambda references `tk` several times per element, and without the
    // exchange Catalyst inlines the tokenizer regex into each reference
    // (measured ~6× slowdown); the shuffled frame is just (id, tokens)
    // the no-shingle guard runs BEFORE tokenization as a cheap regexp_count
    // at the scan (≥3 tokens ⇔ non-empty 3-gram set): filtering on the sh
    // alias AFTER the projection would be pushed through it, inlining the
    // whole tokenize+shingle+md5 pipeline into the predicate and running
    // it twice per row (measured 3 s → 12 s on sf0.1)
    val sh = docs
      .filter(TextOps.tokenCount(col(textCol)) >= 3)
      .select(col(idCol).as("id"),
        TextOps.tokens(lower(col(textCol))).as("tk"))
      .repartition(col("id"))
      .select(col("id"),
        array_distinct(
          transform(TextOps.shingles3FromTokens(col("tk")),
            t => hash32(t, 0))).as("sh"))
    // bucket on the single min shingle-hash (1-band LSH: recall-light,
    // cheap; callers wanting higher recall use minhashNearDups).
    // The bucket repartition is the single materialization point: the
    // bucket-count agg, the cap join, and both self-join sides all reuse
    // this one exchange (ReusedExchange), so the shingle+md5 pipeline
    // runs exactly once.
    // EvalOnce on the join key: the cap join infers isnotnull(bucket) and
    // would push it below BOTH exchanges with the full tokenize+shingle+md5
    // pipeline inlined into the scan filter (where the tokenizer regex
    // re-runs per lambda element — measured 13 s of a 15 s query)
    val bucketed = sh.withColumn("bucket",
      graft.functions.EvalOnce(array_min(col("sh"))))
      .repartition(col("bucket"))
    val small = CapAudit.observed(
      bucketed.groupBy(col("bucket")).count(), maxBucket, capAudit)
      .filter(col("count") <= maxBucket).select(col("bucket"))
    val capped = bucketed.join(small, Seq("bucket"))
    val l = capped.select(col("bucket"), col("id").as("id_a"),
      col("sh").as("sh_a"))
    val r = capped.select(col("bucket"), col("id").as("id_b"),
      col("sh").as("sh_b"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      // size-ratio prefilter: jaccard(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so
      // jaccard ≥ t requires min ≥ t·max — a necessary condition checked on
      // two already-computed ints, skipping array_intersect for the bulk of
      // size-mismatched candidate pairs. Result-neutral (the jaccard ≥ t
      // filter below subsumes it), so the oracle needs no mirror.
      .filter(least(size(col("sh_a")), size(col("sh_b"))).cast("double") >=
        lit(threshold) *
          greatest(size(col("sh_a")), size(col("sh_b"))).cast("double"))
      // single evaluation for the intersection: EvalOnce pins the alias so
      // neither the jaccard projection nor the pushed-down threshold filter
      // re-inlines array_intersect (once per consumer otherwise)
      .withColumn("inter", graft.functions.EvalOnce(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")))
      .select(col("id_a"), col("id_b"),
        (col("inter") /
          ((size(col("sh_a")) + size(col("sh_b"))).cast("double") -
            col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Benchmark decontamination: per corpus document, how many of its
    * distinct word 3-grams (case-insensitive) also occur in the
    * benchmark/eval set — the overlap signal training pipelines use to
    * drop eval-contaminated documents (docs with `n_hits` ≥ some cutoff).
    *
    * ZERO-HIT documents emit NO row (the inner join drops them by
    * design): materializing an explicit 0 for the uncontaminated
    * majority would shuffle the whole corpus id space for information
    * the absence already carries. Consumers keep clean docs with an
    * anti-join against the `n_hits >= cutoff` set (exactly what the d21
    * curation pipeline does), never by filtering this output directly.
    *
    * Scale shape: the benchmark side is an eval suite — thousands to
    * millions of shingles, not corpus-sized — so its distinct-shingle set
    * is BROADCAST and the corpus side never shuffles its exploded
    * shingles; the only exchange is the final per-doc count aggregation
    * (map-side partial on doc id). Drop the `broadcast` hint if a
    * benchmark ever outgrows executor memory and AQE will pick a shuffle
    * join on the same plan.
    */
  def decontaminationHits(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // project tokens before shingling (no CSE inside HOF lambdas —
    // see ngramJaccardPairs) and de-dup per doc so a shingle repeated
    // inside one document counts once
    def shingled(df: DataFrame, cols: Column*) = df
      .select(cols :+ TextOps.tokens(lower(col(textCol))).as("tk"): _*)
      .select(cols :+ explode(array_distinct(
        TextOps.shingles3FromTokens(col("tk")))).as("sh"): _*)
    val bs = shingled(bench).select(col("sh")).distinct()
    shingled(corpus, col(idCol))
      .join(broadcast(bs), Seq("sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Decontamination by SPAN REMOVAL (the FineWeb/Dolma refinement of
    * [[decontaminationHits]]'s drop-the-document policy): every corpus
    * token span matching a benchmark `n`-gram is cut out — extended by
    * `margin` tokens on each side and merged across overlaps — and the
    * document is kept as its surviving tokens. Dropping whole documents
    * throws away the clean 99% of a long page for one quoted eval
    * question; span surgery keeps it.
    *
    * Output per corpus doc (ALL docs, contaminated or not): `n_tokens`,
    * `removed_tokens`, and `kept_text` — the surviving lowercased tokens
    * space-joined (token-stream surgery, the canonical pipeline form; the
    * original byte offsets are gone once tokenized).
    *
    * Scale shape: benchmark grams are eval-suite-sized → broadcast
    * (d16's trade, same knob); corpus grams never shuffle — hits land
    * per-doc, the interval merge is one doc-keyed window over HIT
    * positions only (contaminated docs' match counts, not token counts),
    * and the final token filter is a map-side HOF over the already
    * doc-partitioned token arrays. One exchange on doc id total.
    */
  def decontaminateSpans(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      margin: Int = 0): DataFrame = {
    require(n >= 1 && margin >= 0, s"bad n=$n margin=$margin")
    import org.apache.spark.sql.expressions.Window
    // projection barrier (see ngramJaccardPairs): tokens materialized
    // once per doc, and the doc-keyed partitioning is reused by the
    // island window AND the spans join below
    val tk = corpus
      .select(col(idCol), TextOps.tokens(lower(col(textCol))).as("tk"))
      .repartition(col(idCol))
    // 60-bit gram hashes: this is a MEMBERSHIP test that CUTS spans —
    // at 32 bits a 10M-gram benchmark falsely flags ~0.23% of every
    // corpus position (each excising a margin-extended span of clean
    // tokens); at 60 bits the false-hit rate is ~2^-60 per (gram, set
    // entry), negligible at any corpus scale
    val bg = bench
      .select(TextOps.tokens(lower(col(textCol))).as("tk"))
      .select(explode(transform(TextOps.ngramsFromTokens(col("tk"), n),
        g => hash60(g, 0))).as("g"))
      .distinct()
    // 1-based gram start positions whose n-gram occurs in the benchmark
    val hits = tk
      .select(col(idCol), posexplode(
        transform(TextOps.ngramsFromTokens(col("tk"), n),
          g => hash60(g, 0))).as(Seq("pos", "g")))
      .select(col(idCol), (col("pos") + 1).cast("bigint").as("pos"), col("g"))
      .join(broadcast(bg), Seq("g"))
      .select(col(idCol), col("pos"))
    // merge margin-extended spans [pos-margin, pos+n-1+margin] via
    // gaps-and-islands over hit starts (d29's shape): a new island
    // starts when this span's start clears every previous span's end
    val reach = n - 1 + 2 * margin // prev_pos + reach < pos ⇔ disjoint
    val wPrev = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val spans = hits
      .withColumn("brk",
        when(col("pos") > coalesce(max(col("pos") + reach).over(wPrev),
          lit(0L)), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy(col(idCol), col("island"))
      .agg(greatest(min(col("pos")) - margin, lit(1L)).as("s"),
        (max(col("pos")) + (n - 1 + margin)).as("e"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    // islands are disjoint by construction, so the per-token test is
    // exists-over-few-spans; clean docs skip it entirely (null spans)
    val kept = when(col("spans").isNull, col("tk")).otherwise(
      filter(col("tk"), (t, i) =>
        !exists(col("spans"),
          sp => (i + 1).cast("long") >= sp("s") &&
            (i + 1).cast("long") <= sp("e"))))
    tk.join(spans, Seq(idCol), "left")
      .select(col(idCol), size(col("tk")).cast("bigint").as("n_tokens"),
        kept.as("kept"))
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("bigint")
          .as("removed_tokens"),
        concat_ws(" ", col("kept")).as("kept_text"))
  }
}

package graft.ops

import graft.storage.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** BM25 full-text retrieval over a PERSISTED inverted index — the
  * text-side analogue of the ANN index (ops/AnnIndex): build once into
  * versioned lakehouse tables, serve query batches from the STORED
  * index only (raw documents never rescanned at query time).
  *
  * Index layout (two tables, all commit-protocol versioned):
  *  - `bm25_postings` (term, doc_id, tf) — range-clustered on `term`
  *    with zone maps, so a query batch's term IN-filter prunes whole
  *    postings files at plan time (the inverted-index seek, expressed
  *    as metadata skipping);
  *  - `bm25_docs` (doc_id, dl) — document lengths.
  *
  * The index is APPEND-ONLY by design: df and corpus stats are DERIVED
  * at serve time (df = a count over the query-term-pruned postings —
  * exact, because pruning keeps every row of the probed terms; N and
  * Σdl from the docs table), so incremental maintenance
  * ([[appendDocs]]) is two exactly-once delta commits per batch with
  * nothing global to rewrite — the same reason Lucene segments carry
  * postings, not global df.
  *
  * Scoring is the BM25 shape with t14's RATIONAL idf,
  * `(N - df + 0.5) / (df + 0.5)` (no log — monotone in the classic
  * Robertson idf, and free of libm: every operation is an IEEE +,-,*,/
  * whose result is bit-exact across engines, which is what lets the
  * driver hash-compare scores against DuckDB). Per-(query, doc) scores
  * fold over the matched terms in SORTED TERM ORDER — double addition
  * is not associative, so an unordered SUM would be
  * nondeterministic across partitionings, let alone engines.
  *
  * Scale shape of serve: the query batch's term set is tiny (collected
  * driver-side, bounded by the batch — the one collect, same class as
  * Packing's O(partitions) offsets); it becomes an IN filter the
  * parquet scan prunes by, then everything joins term- or doc-keyed
  * with the small side broadcast by AQE. Top-k is a per-query window
  * over the matched docs only.
  */
object Bm25 {

  val PostingsTable = "bm25_postings"
  val DocsTable = "bm25_docs"

  val postingsSchema: StructType =
    StructType.fromDDL("term STRING, doc_id BIGINT, tf BIGINT")
  val docsSchema: StructType =
    StructType.fromDDL("doc_id BIGINT, dl BIGINT")

  private def postingsOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  private def doclenOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextOps.tokenCount(col(textCol)).as("dl"))

  /** Build (or rebuild) the index from the document store: one
    * tokenize+explode pass feeds postings; dl derives from it. Each
    * table lands as ONE full commit — a crash mid-build leaves the
    * previous generation serving.
    */
  def buildIndex(lake: Lakehouse, docs: DataFrame, idCol: String,
      textCol: String, clusterFiles: Int = 8): Unit = {
    lake.overwritePartitioned(PostingsTable,
      postingsOf(docs, idCol, textCol)
        .repartitionByRange(clusterFiles, col("term")), Nil,
      statsCols = Seq("term"))
    lake.overwritePartitioned(DocsTable,
      doclenOf(docs, idCol, textCol), Nil)
  }

  /** Incremental maintenance for a streaming/batch ingest path: a NEW
    * doc batch's postings and doc-length rows land as exactly-once
    * DELTA commits keyed by `batchId` — nothing global is rewritten
    * (see the class doc's append-only design). A crash BETWEEN the two
    * commits (`midCrash` injects it in tests) heals on the replay:
    * each table dedups independently by batch id, so the retry
    * completes exactly the commit that is missing. Appended delta files
    * span the term range (no per-batch clustering); the standing
    * rebuild/compact re-establishes the pruned layout.
    */
  def appendDocs(lake: Lakehouse, newDocs: DataFrame, idCol: String,
      textCol: String, batchId: Long,
      midCrash: () => Unit = () => ()): Unit = {
    lake.appendExactlyOnce(PostingsTable,
      postingsOf(newDocs, idCol, textCol), batchId)
    midCrash()
    lake.appendExactlyOnce(DocsTable,
      doclenOf(newDocs, idCol, textCol), batchId)
  }

  /** Top-k BM25 serve for a batch of queries `(query_id BIGINT,
    * qtext STRING)` — answered from the stored index only.
    */
  def serve(lake: Lakehouse, queries: DataFrame, k: Int): DataFrame = {
    val spark = queries.sparkSession
    val qterms = queries
      .select(col("query_id"),
        explode(array_distinct(TextOps.tokens(lower(col("qtext")))))
          .as("term"))
    // the batch's term set, driver-side: it bounds the postings scan
    // via a pushed IN filter (zone-map pruned under range clustering)
    val termList = qterms.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    val postings = lake.read(PostingsTable, postingsSchema)
      .filter(col("term").isin(termList: _*))
    // df derived from the SAME pruned scan (exact: pruning keeps every
    // row of the probed terms) — the append-only design's serve side
    val dfreq = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    // ONE docs read serves both the lengths and the corpus constants —
    // a second lake.read could resolve a DIFFERENT committed version
    // under concurrent maintenance, making dl and N/avgdl mutually
    // inconsistent within one serve call
    val dl = lake.read(DocsTable, docsSchema)
    val corp = dl.agg(count(lit(1)).as("_n"), sum(col("dl")).as("_sumdl"))
    // per-term partial: rational idf × tf saturation × length norm.
    // Parenthesization is part of the contract (see class doc) — the
    // oracle spells the IDENTICAL tree.
    val nD = col("_n").cast("double")
    val avgdl = col("_sumdl").cast("double") / nD
    val idf = (nD - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val den = col("tf").cast("double") +
      lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl))
    val s = idf * ((col("tf").cast("double") * lit(2.2)) / den)
    val scored = postings
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corp))
      .select(col("query_id"), col("doc_id"), col("term"),
        graft.functions.EvalOnce(s).as("s"))
    // deterministic fold: sorted by term, left to right
    val agg = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(array_sort(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    agg.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast("bigint").as("rk"),
        col("doc_id"), col("score"))
  }
}

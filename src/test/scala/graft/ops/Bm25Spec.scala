package graft.ops

import graft.SparkSpec
import graft.storage.Lakehouse
import org.apache.spark.sql.functions._

/** BM25 index build + serve (ops/Bm25): ranking sanity on a corpus
  * where relevance is constructed, plus the stored-index contract.
  */
class Bm25Spec extends SparkSpec {

  private def mkLake(tag: String): Lakehouse =
    new Lakehouse(spark, tmpDir(s"bm25-$tag"))

  test("serve ranks the constructed-relevant doc first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark shuffle join spark shuffle"), // 2× spark, on-topic
      (2L, "spark filter scan filter scan scan scan scan"), // 1× spark, long
      (3L, "window order batch merge stream"), // no query terms
      (4L, "spark join") // short: strongest length norm
    ).toDF("doc_id", "text")
    val lake = mkLake("rank")
    Bm25.buildIndex(lake, docs, "doc_id", "text")
    val out = Bm25.serve(lake,
      Seq((7L, "spark join")).toDF("query_id", "qtext"), k = 10)
      .orderBy("rk").as[(Long, Long, Long, Double)].collect()
    // doc 3 matches nothing — absent entirely
    assert(out.map(_._3).toSet === Set(1L, 2L, 4L))
    // doc 4 contains BOTH terms in the shortest doc → top ranked;
    // doc 2 matches one term in a long doc → last
    assert(out.head._3 === 4L)
    assert(out.last._3 === 2L)
    // scores strictly ordered (rational idf, no ties here)
    assert(out.map(_._4).toSeq === out.map(_._4).sorted.reverse.toSeq)
  }

  test("serve reads ONLY the stored index; absent terms are ignored") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val lake = mkLake("stored")
    Bm25.buildIndex(lake, docs, "doc_id", "text")
    // a query with one indexed and one unknown term still serves
    val out = Bm25.serve(lake,
      Seq((1L, "alpha zzz-unknown")).toDF("query_id", "qtext"), k = 5)
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    // rebuild after corpus change swaps the served generation
    Bm25.buildIndex(lake,
      Seq((9L, "alpha alpha alpha")).toDF("doc_id", "text"),
      "doc_id", "text")
    val out2 = Bm25.serve(lake,
      Seq((1L, "alpha")).toDF("query_id", "qtext"), k = 5)
    assert(out2.select("doc_id").as[Long].collect().toSeq === Seq(9L))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Behavior pins for d30/d31 beyond the oracle hash-compare: the
  * first-occurrence-order property d30's reassembly depends on (an
  * array_distinct regression to unordered semantics would still produce
  * SOME deterministic string — only this test would see the difference
  * from the spec'd one), and d31's canonical invariants against the d10
  * labeling it composes.
  */
class ChunkDedupSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("d30 keeps the FIRST occurrence of each chunk, in original order") {
    val rows = SparkEntry.queries("d30_chunk_dedup")(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("text")),
        Seq("doc_id"))
      .collect()
    assert(rows.nonEmpty)
    var removedSomewhere = false
    rows.foreach { r =>
      val toks = "\\S+".r.findAllIn(r.getAs[String]("text")).toVector
      val chunks = toks.grouped(2).map(_.mkString(" ")).toVector
      val expected = chunks.distinct // Vector.distinct = first-occurrence order
      assert(r.getAs[String]("dedup_text") === expected.mkString(" "))
      assert(r.getAs[Long]("n_chunks") === chunks.size)
      assert(r.getAs[Long]("n_distinct_chunks") === expected.size)
      if (expected.size < chunks.size) removedSomewhere = true
    }
    // the corpus must actually exercise the removal path, or this test
    // pins nothing but the identity mapping
    assert(removedSomewhere)
  }

  test("d31 canonical is the longest (then lowest-id) member of its d10 cluster") {
    val comp = SparkEntry.queries("d10_dedup_components")(spark, sf)
    val canon = SparkEntry.queries("d31_cluster_canonical")(spark, sf)
    val best = comp
      .join(Tables.documents(spark, sf).select("doc_id", "n_chars"), Seq("doc_id"))
      .groupBy(col("component"))
      .agg(max_by(struct(col("n_chars"), col("doc_id")),
        struct(col("n_chars"), -col("doc_id"))).as("b"),
        count(lit(1)).as("n_members"))
      .select(col("component"), col("b.doc_id").as("canon_id"),
        col("b.n_chars").as("n_chars"), col("n_members"))
    assert(canon.count() === comp.select("component").distinct().count())
    assert(canon.exceptAll(best).isEmpty && best.exceptAll(canon).isEmpty)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminationHits counts distinct shared shingles per doc") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    // doc 1: shares "the quick brown" + "quick brown fox" (its repeat of
    // "the quick brown" counts once: distinct per doc)
    // doc 2: shares nothing; doc 3: too short for any shingle
    val corpus = Seq(
      (1L, "the quick brown fox the quick brown"),
      (2L, "completely different words here"),
      (3L, "to be")).toDF("doc_id", "text")
    val got = Dedup.decontaminationHits(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "the quick brown fox the quick brown" shingles (distinct):
    //   the quick brown / quick brown fox / brown fox the / fox the quick
    // benchmark has: the quick brown / quick brown fox / brown fox jumps
    assert(got === Map(1L -> 2L))
  }

  test("decontamination is case-insensitive and broadcasts the benchmark") {
    val bench = Seq((9L, "ALPHA BETA GAMMA")).toDF("doc_id", "text")
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val df = Dedup.decontaminationHits(corpus, bench, "doc_id", "text")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}

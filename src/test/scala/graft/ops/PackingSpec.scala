package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences matches a sequential prefix-sum oracle") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, 1L + rnd.nextInt(100)))
    val got = Packing.packSequences(
      rows.toDF("doc_id", "nt"), "doc_id", "nt", budget = 128L)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    var cum = 0L
    rows.foreach { case (id, n) =>
      assert(got(id) === ((n, cum, cum / 128L)),
        s"doc $id: expected start=$cum")
      cum += n
    }
    assert(got.size === rows.size)
  }

  test("tokenBudgetSelect accepts any integral score/token type and " +
    "refuses null scores loudly") {
    // INT columns — the contract says integral, not LongType
    val df = (1 to 50).map(i => (i, i % 5, 10)).toDF("id", "score", "nt")
    val got = Packing.tokenBudgetSelect(df, "score", "nt", "id", 200L)
    // scores 4 (10 docs) + 3 (10 docs) fill 200 exactly
    assert(got.count() === 20L)
    assert(got.agg(min(col("score"))).head().getInt(0) === 3)
    val withNull = df.select(
      when(col("id") === 1, lit(null)).otherwise(col("score")).as("score"),
      col("nt"), col("id"))
    val ex = intercept[IllegalArgumentException] {
      Packing.tokenBudgetSelect(withNull, "score", "nt", "id", 200L)
    }
    assert(ex.getMessage.contains("null values in score column"))
  }

  test("packSequences spans multiple partitions, not one sort task") {
    // 10k rows range-partition across many partitions; the global offsets
    // must still line up exactly across every partition boundary
    val df = spark.range(1, 10001).select(col("id").as("doc_id"),
      (pmod(col("id") * 37L, lit(50L)) + 1L).as("nt"))
    val packed = Packing.packSequences(df, "doc_id", "nt", budget = 1000L,
      numPartitions = Some(8))
    assert(packed.rdd.getNumPartitions === 8)
    // exclusive prefix sum: start_off(id) = start_off(prev) + nt(prev),
    // checked via a window over the RESULT (test-side only)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("doc_id")
    val bad = packed
      .withColumn("expected",
        coalesce(lag(col("start_off") + col("n_tokens"), 1).over(w),
          lit(0L)))
      .filter(col("start_off") =!= col("expected"))
    assert(bad.isEmpty, bad.limit(5).collect().mkString("\n"))
    // total tokens land in ceil(total/budget) chunks at most
    val total = packed.agg(sum("n_tokens")).first().getLong(0)
    val maxChunk = packed.agg(max("chunk_id")).first().getLong(0)
    assert(maxChunk <= total / 1000L)
  }

  test("packSequences rejects nonpositive budgets and handles empties") {
    intercept[IllegalArgumentException](
      Packing.packSequences(Seq((1L, 1L)).toDF("doc_id", "nt"),
        "doc_id", "nt", budget = 0L))
    val empty = Packing.packSequences(
      Seq.empty[(Long, Long)].toDF("doc_id", "nt"), "doc_id", "nt", 10L)
    assert(empty.count() === 0L)
  }
}

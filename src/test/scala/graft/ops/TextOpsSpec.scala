package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases the synthetic corpus never exercises: empty/short/multibyte
  * text through every text operator.
  */
class TextOpsSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("empty and whitespace-only text") {
    for (t <- Seq("", "   ", "\t\n")) {
      val r = one(t).select(
        TextOps.tokenCount(col("text")).as("n"),
        size(TextOps.shingles3(col("text"))).as("sh"),
        TextOps.typeTokenRatio(col("text")).as("ttr"),
        TextOps.qualityScore(col("text")).as("q"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.langId(col("text")).as("lang")).head()
      assert(r.getLong(0) === 0L, s"tokens of '$t'")
      assert(r.getInt(1) === 0, s"shingles of '$t'")
      assert(r.getDouble(2) === 0.0)
      assert(r.getDouble(3) === 0.0)
      assert(r.getString(4).nonEmpty) // md5 of "" is defined
      assert(r.getString(5) === "und")
    }
  }

  test("short text: 1-2 tokens yield no shingles, sane stats") {
    val r = one("hello world").select(
      TextOps.tokenCount(col("text")),
      size(TextOps.shingles3(col("text"))),
      TextOps.meanTokenLen(col("text"))).head()
    assert(r.getLong(0) === 2L)
    assert(r.getInt(1) === 0)
    assert(r.getDouble(2) === 5.0)
  }

  test("multibyte text: CJK detection and cyrillic tokens") {
    val zh = one("深度 学习 模型").select(TextOps.langId(col("text"))).head()
    assert(zh.getString(0) === "zh")
    val ru = one("Отказ Успешно").select(
      TextOps.tokenCount(col("text")),
      TextOps.fingerprint(col("text"))).head()
    assert(ru.getLong(0) === 2L)
    // fingerprint normalizes case + whitespace
    val fp1 = one("  ОТКАЗ   УСПЕШНО ").select(TextOps.fingerprint(col("text"))).head().getString(0)
    assert(ru.getString(1) === fp1)
  }

  test("simhash/minhash of empty token sets are defined") {
    val r = one("").select(
      Dedup.simhash16(col("text")) +:
        Dedup.minhashSignature(col("text"), 2): _*).head()
    assert(r.getLong(0) === 0L) // no votes → all bits 0
    assert(r.isNullAt(1)) // array_min of empty → null minhash
  }
}

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

  test("PII redaction masks emails, IPs, and phones with typed tokens") {
    val r = one("mail a.b-c_1@sub.example.org or 10.0.3.42 call 555-0199 end")
      .select(TextOps.redactPii(col("text"))).head()
    assert(r.getString(0) === "mail <EMAIL> or <IP> call <PHONE> end")
  }

  test("PII redaction leaves clean and near-miss text untouched") {
    // 1.2.3 = too few octets; 12-3456 = too few phone digits; a@b = no TLD
    val t = "ver 1.2.3 of 12-3456 by a@b done"
    val r = one(t).select(TextOps.redactPii(col("text"))).head()
    assert(r.getString(0) === t)
  }

  test("property: sort/fold helpers match naive run accounting") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.array_sort
    val rnd = new scala.util.Random(11)
    // random small-alphabet arrays maximize duplicate runs and ties
    val arrays = (1 to 40).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(
        ('a' + rnd.nextInt(3)).toChar.toString))
    }
    val got = arrays.toDF("id", "arr")
      .select($"id",
        TextOps.dominantOfSorted(array_sort($"arr")).as("dom"),
        TextOps.dupOccurrencesOfSorted(array_sort($"arr")).as("dup"))
      .select($"id", $"dom.best", $"dom.best_cnt", $"dom.n_distinct",
        $"dup")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    arrays.foreach { case (id, arr) =>
      val counts = arr.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected =
        if (arr.isEmpty) ("", 0L, 0L, 0L)
        else {
          // max count, ties to the smallest element
          val (bt, bc) = counts.toSeq.minBy { case (t, c) => (-c, t) }
          (bt, bc, counts.size.toLong,
            counts.values.filter(_ > 1).sum)
        }
      assert(got(id) === expected, s"id=$id arr=$arr")
    }
  }

  test("dominantOfSorted counts a leading empty string as its own element") {
    val spark2 = spark
    import spark2.implicits._
    val r = Seq(Tuple1(Seq("", "a")), Tuple1(Seq("")), Tuple1(Seq("", "", "b")))
      .toDF("arr")
      .select(TextOps.dominantOfSorted(col("arr")).as("d"))
      .select(col("d.best"), col("d.best_cnt"), col("d.n_distinct"))
      .collect()
    assert(r(0).getLong(2) === 2L) // ["", "a"]: two distinct elements
    assert((r(1).getString(0), r(1).getLong(1), r(1).getLong(2)) ===
      (("", 1L, 1L)))
    assert((r(2).getString(0), r(2).getLong(1), r(2).getLong(2)) ===
      (("", 2L, 2L)))
  }

  test("simhash/minhash of empty token sets are defined") {
    val r = one("").select(
      Dedup.simhash16(col("text")) +:
        Dedup.minhashSignature(col("text"), 2): _*).head()
    assert(r.getLong(0) === 0L) // no votes → all bits 0
    assert(r.isNullAt(1)) // array_min of empty → null minhash
  }
}

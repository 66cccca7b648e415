package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SimHash hamming-band near-dup pairs: the pigeonhole recall guarantee
  * and the megabucket cap. (The minhash/jaccard pair generators are
  * exercised by the d04/d09 oracle queries; this suite covers the
  * properties the oracle can't see — exactness of the banding vs a
  * brute-force pair set.)
  */
class DedupSpec extends SparkSpec {

  test("simhash pairs: exact duplicates pair at hamming 0") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "completely different words appear here"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashHammingPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.contains((1L, 2L, 0L)), got.mkString(", "))
  }

  test("property: banding finds exactly the brute-force hamming ≤ 3 pairs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("spark", "join", "scan", "sort", "hash", "merge",
      "key", "row", "col", "agg", "map", "part")
    // 40 base docs, each with a 1-token mutation — a mix of near pairs
    // (often ≤ 3 bits apart) and far pairs
    val docsSeq = (0 until 40).flatMap { i =>
      val t = (0 until 12).map(_ => vocab(rnd.nextInt(vocab.size)))
      val mut = t.updated(rnd.nextInt(12), vocab(rnd.nextInt(vocab.size)))
      Seq((i * 2L, t.mkString(" ")), (i * 2L + 1L, mut.mkString(" ")))
    }
    val spark2 = spark
    import spark2.implicits._
    val df = docsSeq.toDF("doc_id", "text")

    // maxBucket large enough that no cap fires: the result must be the
    // exact hamming ≤ 3 pair set (pigeonhole: ≤ 3 flipped bits leave at
    // least one of the 4 quadrants identical)
    val got = Dedup.simhashHammingPairs(df, "doc_id", "text",
      maxHamming = 3, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val sig = df
      .select(col("doc_id"),
        array_distinct(TextOps.tokens(lower(col("text")))).as("toks"))
      .select(col("doc_id") +: (0 until 4).map(q =>
        Dedup.simhashQuadrantHashes(col("toks"), q).as(s"h$q")): _*)
      .select(col("doc_id") +: (0 until 4).map(q =>
        Dedup.simhash16FromHashes(col(s"h$q")).as(s"sh$q")): _*)
      .collect()
      .map(r => r.getLong(0) ->
        Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val brute = (for {
      a <- sig.keys; b <- sig.keys if a < b
      h = sig(a).zip(sig(b))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if h <= 3
    } yield (a, b, h.toLong)).toSet

    assert(brute.nonEmpty, "seed produced no near pairs — weaken mutation")
    assert(got === brute)
  }

  test("megabucket cap: an oversized duplicate bucket emits no pairs") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1L to 120L).map(i => (i, "same text every time"))
      .toDF("doc_id", "text")
    assert(Dedup.simhashHammingPairs(df, "doc_id", "text",
      maxBucket = 100).count() === 0L)
  }
}

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

  test("cap audit: the skipped megabucket mass is observable, not silent") {
    val spark2 = spark
    import spark2.implicits._
    // 120 identical docs (one megabucket per quadrant band) + 2 distinct
    val df = ((1L to 120L).map(i => (i, "same text every time")) ++
      Seq((200L, "some other words"), (201L, "another doc entirely")))
      .toDF("doc_id", "text")
    val obs = org.apache.spark.sql.Observation()
    Dedup.simhashHammingPairs(df, "doc_id", "text",
      maxBucket = 100, capAudit = Some(obs)).count()
    val m = obs.get
    // the 120-dup bucket appears in each of the 4 quadrant bands:
    // 4 dropped bucket entries of 120 rows each
    assert(m("dropped_buckets") === 4L, m)
    assert(m("dropped_rows") === 480L, m)
    assert(m("total_rows") === 488L, m) // + 2 distinct docs × 4 bands

    // and with no cap hit, the audit reports zero dropped mass
    val obs2 = org.apache.spark.sql.Observation()
    Dedup.simhashHammingPairs(df, "doc_id", "text",
      maxBucket = 1000, capAudit = Some(obs2)).count()
    assert(obs2.get("dropped_rows") === 0L)

    // minhash + embedding variants share the helper; smoke one of each
    val obs3 = org.apache.spark.sql.Observation()
    Dedup.minhashNearDups(df, "doc_id", "text", bands = 4, rowsPerBand = 2,
      threshold = 0.8, maxBucket = 100, capAudit = Some(obs3)).count()
    assert(obs3.get("dropped_rows").asInstanceOf[Long] >= 480L, obs3.get)
  }

  test("megabucket star: O(m) hub pairs connect every dropped member") {
    val spark2 = spark
    import spark2.implicits._
    // 120 identical docs (megabucket) + 2 identical docs (small bucket —
    // identical so the band collision is certain, not hash-dependent)
    val df = ((1L to 120L).map(i => (i, "same text every time")) ++
      Seq((200L, "alpha beta gamma delta epsilon zeta"),
        (201L, "alpha beta gamma delta epsilon zeta")))
      .toDF("doc_id", "text")
    val drop = Dedup.minhashNearDups(df, "doc_id", "text",
      bands = 4, rowsPerBand = 2, threshold = 0.8, maxBucket = 100)
    val star = Dedup.minhashNearDups(df, "doc_id", "text",
      bands = 4, rowsPerBand = 2, threshold = 0.8, maxBucket = 100,
      megabucketStar = true)

    // drop mode loses the megabucket; star emits exactly hub(1)↔member —
    // 119 pairs, not the 120·119/2 = 7140 a clique would cost
    val smallPair = Set((200L, 201L))
    assert(drop.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      === smallPair)
    val starPairs = star.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSet
    assert(starPairs === (2L to 120L).map((1L, _)).toSet ++ smallPair)
    // identical texts: verified jaccard stays exact
    assert(star.filter(col("id_a") === 1L)
      .select("jaccard").distinct().collect().map(_.getDouble(0)).toSeq
      === Seq(1.0))
  }

  test("incremental dedup ≡ the batch-involved slice of a full run") {
    import spark.implicits._
    // 40 docs in 8 duplicate families of 5; ids ≡ 0 (mod 10) form the
    // "new batch" (4 docs), the rest are the standing corpus
    val texts = (0 until 8).map(f =>
      s"family $f alpha beta gamma delta epsilon zeta eta theta")
    val docs = (0L until 40L).map(i => (i, texts((i % 8).toInt)))
      .toDF("id", "text")
    val hist = docs.filter(col("id") % 10 =!= 0)
    val batch = docs.filter(col("id") % 10 === 0)

    val full = Dedup.minhashNearDups(docs, "id", "text",
      bands = 4, rowsPerBand = 2, threshold = 0.8, maxBucket = 100)
      .filter(col("id_a") % 10 === 0 || col("id_b") % 10 === 0)
      .as[(Long, Long, Double)].collect().toSet

    val stored = Dedup.minhashBandedRows(hist, "id", "text", 4, 2)
    val inc = Dedup.incrementalMinhashNearDups(docs, batch, stored,
      "id", "text", bands = 4, rowsPerBand = 2, threshold = 0.8,
      maxBucket = 100).as[(Long, Long, Double)].collect().toSet

    assert(inc === full)
    assert(inc.nonEmpty) // the families guarantee batch-involved pairs
    // every emitted pair involves the batch, ordered a < b
    assert(inc.forall { case (a, b, _) =>
      a < b && (a % 10 == 0 || b % 10 == 0) })
  }
}

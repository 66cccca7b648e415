package graft.functions

import graft.SparkSpec

/** SQL registration of the native expressions (GraftExtensions). */
class FunctionsSpec extends SparkSpec {

  test("md5_prefix64 is callable from SQL and matches the hex-parse form") {
    val r = spark.sql(
      """SELECT md5_prefix64('key') AS a,
        | CAST(conv(substring(md5('key'), 1, 8), 16, 10) AS BIGINT) AS b
        |""".stripMargin).first()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) === 0x3c6e0b8aL)
  }

  test("bloom_might_contain / cms_estimate are callable from SQL via params") {
    import spark.implicits._
    val df = Seq(1L, 2L, 2L, 3L).toDF("k")
    val bloom = df.stat.bloomFilter("k", 10, 0.01)
    val cms = df.stat.countMinSketch(
      org.apache.spark.sql.functions.col("k"), 0.001, 0.999, 42)
    def bytes(w: java.io.OutputStream => Unit) = {
      val bos = new java.io.ByteArrayOutputStream(); w(bos); bos.toByteArray
    }
    df.createOrReplaceTempView("v_sketch")
    val r = spark.sql(
      """SELECT count(*) AS hits,
        | max(cms_estimate(k, :cms)) AS mx
        |FROM v_sketch WHERE bloom_might_contain(k, :bloom)""".stripMargin,
      Map("bloom" -> bytes(bloom.writeTo), "cms" -> bytes(cms.writeTo))).first()
    assert(r.getLong(0) === 4) // no false negatives on inserted keys
    assert(r.getLong(1) >= 2) // CMS never underestimates the duplicate
  }

  test("qdot is callable from SQL; codegen path agrees with eval") {
    import spark.implicits._
    // enough rows that the projection runs through whole-stage codegen
    val rows = (1 to 200).map(i =>
      (Seq.tabulate(64)(j => (i + j).toLong), Seq.tabulate(64)(j => (j - i).toLong)))
    rows.toDF("a", "b").createOrReplaceTempView("v_qdot")
    val got = spark.sql(
      """SELECT sum(qdot(a, b)) AS s,
        | sum(aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (p, q) -> p + q)) AS w
        |FROM v_qdot""".stripMargin).first()
    assert(got.getLong(0) === got.getLong(1))
    // mismatched lengths and NULL elements stay NULL through codegen
    val n = spark.sql(
      "SELECT qdot(array(1L, 2L), array(1L)) AS x, qdot(array(1L, NULL), array(1L, 2L)) AS y").first()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("eval_once is callable from SQL and is an identity") {
    import spark.implicits._
    Seq(1, 2, 3).toDF("x").createOrReplaceTempView("v_eval_once")
    val rows = spark.sql(
      "SELECT eval_once(x * 10) AS y FROM v_eval_once ORDER BY y")
      .as[Int].collect()
    assert(rows.toSeq === Seq(10, 20, 30))
  }

  test("char_ngram_profile: counts, binary tie-break, short-string NULL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, "ababa"),   // aba ×2 > bab ×1; 2 distinct
      (2L, "abcabc"),  // abc ×2 wins; bca, cab ×1 each; wait: abc,bca,cab,abc
      (3L, "xyz"),     // single trigram
      (4L, "ab"),      // shorter than n -> NULL
      (5L, "aaaa")     // aaa ×2, 1 distinct
    ).toDF("id", "s")
      .select(col("id"), CharNgramProfile(col("s"), 3).as("p"))
      .select(col("id"), col("p.best"), col("p.best_cnt"),
        col("p.n_distinct"))
    val got = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null
        else (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ("aba", 2L, 2L))
    assert(got(2L) === ("abc", 2L, 3L))
    assert(got(3L) === ("xyz", 1L, 1L))
    assert(got(4L) === null)
    assert(got(5L) === ("aaa", 2L, 1L))
    // all-ties: the binary-smallest gram wins (ORDER BY cnt DESC, g ASC)
    val tie = Seq("zyxw").toDF("s")
      .select(CharNgramProfile(col("s"), 3).as("p")).first()
    assert(tie.getStruct(0).getString(0) === "yxw")
  }

  test("char_ngram_profile handles supplementary-plane code points") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // U+10400 is one code point but two UTF-16 code units: grams must
    // count code points, so "𐐀bc𐐀bc" has 4 trigrams, dominant "𐐀bc" ×2
    val s = "𐐀bc𐐀bc"
    val r = Seq(s).toDF("s")
      .select(CharNgramProfile(col("s"), 3).as("p")).first().getStruct(0)
    assert(r.getString(0) === "𐐀bc")
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) === 3L)
  }

  test("char_ngram_profile is callable from SQL") {
    val r = spark.sql(
      "SELECT char_ngram_profile('ababa', 3) AS p").first().getStruct(0)
    assert(r.getString(0) === "aba")
    assert(r.getLong(1) === 2L)
  }

  test("simhash16: native expression matches the built-in fold spelling") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("spark", "join", "ключ", "深度", "agg", "a", "bb", "")
    val rows = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ =>
        vocab(rnd.nextInt(vocab.size))))
    } :+ (999L, Seq.empty[String]) // empty array → 0 on both paths
    val df = rows.toDF("id", "toks")
    for (salt <- Seq("", "@shq2")) {
      val r = df.select(
        Simhash16(col("toks"), salt).as("native"),
        graft.ops.Dedup.simhash16FromHashes(
          transform(col("toks"),
            t => graft.ops.Dedup.hash16(concat(t, lit(salt)))))
          .as("fold"))
        .collect()
      r.foreach(row => assert(row.getLong(0) === row.getLong(1), salt))
    }
    assert(df.filter(col("id") === 999L)
      .select(Simhash16(col("toks"), "x")).head().getLong(0) === 0L)
  }

  test("minhash_sig: native expression matches the k-fold spelling") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Vector("spark", "join", "ключ", "深度", "agg", "a", "bb", "")
    val rows = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ =>
        vocab(rnd.nextInt(vocab.size))))
    } :+ (999L, Seq.empty[String])
    val df = rows.toDF("id", "toks")
    val k = 8
    val r = df.select(
      col("id"),
      MinhashSig(col("toks"), k).as("native"),
      array(graft.ops.Dedup.minhashSignatureFromTokens(col("toks"), k): _*)
        .as("fold")).collect()
    r.foreach { row =>
      assert(row.getSeq[Any](1) === row.getSeq[Any](2), s"id=${row.getLong(0)}")
    }
    // empty token set → k NULL elements, matching array_min of empty
    val empty = r.find(_.getLong(0) == 999L).get
    assert(empty.getSeq[Any](1).forall(_ == null))
    // SQL registration path
    val sqlRow = spark.sql(
      "SELECT minhash_sig(array('a', 'b'), 4) AS s").first()
    assert(sqlRow.getSeq[Any](0).length === 4)
  }

  test("qdot: native expression matches the zip_with/aggregate fold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 100).map { i =>
      (i.toLong,
        (0 until 64).map(_ => rnd.nextInt(2001).toLong - 1000),
        (0 until 64).map(_ => rnd.nextInt(2001).toLong - 1000))
    } ++ Seq(
      (900L, Seq(1L, 2L), Seq(3L)),          // length mismatch → NULL
      (901L, Seq.empty[Long], Seq.empty[Long])) // empty → 0
    val df = rows.toDF("id", "a", "b")
    val r = df.select(col("id"),
      graft.functions.QDot(col("a"), col("b")).as("native"),
      graft.ops.VectorOps.qdotFold(col("a"), col("b")).as("fold")).collect()
    r.foreach { row =>
      assert(row.isNullAt(1) === row.isNullAt(2), s"id=${row.getLong(0)}")
      if (!row.isNullAt(1))
        assert(row.getLong(1) === row.getLong(2), s"id=${row.getLong(0)}")
    }
    assert(r.find(_.getLong(0) == 900L).get.isNullAt(1))
    assert(r.find(_.getLong(0) == 901L).get.getLong(1) === 0L)
  }

  test("simhash16 is callable from SQL; NULL array gives NULL") {
    val r = spark.sql(
      """SELECT simhash16(array('a', 'b'), '@s') AS s,
        | simhash16(array('a', 'b')) AS nosalt,
        | simhash16(CAST(NULL AS ARRAY<STRING>)) AS n""".stripMargin).first()
    assert(!r.isNullAt(0) && !r.isNullAt(1))
    assert(r.isNullAt(2))
  }

  test("eval_once blocks filter pushdown through its alias") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // spark.range, not a literal Seq: a LocalRelation would be folded away
    // by the optimizer before the pushdown question even arises
    val df = spark.range(1, 4).select(col("id").cast("int").as("x"))
      .select(col("x"), EvalOnce(col("x") * 10).as("y"))
      .filter(col("y") >= 20)
    val plan = df.queryExecution.optimizedPlan.toString
    // the filter must reference the materialized alias, not an inlined
    // (x * 10) re-evaluation
    assert(plan.contains("eval_once"), plan)
    assert(df.as[(Int, Int)].collect().toSeq.sorted === Seq((2, 20), (3, 30)))
  }
}

package graft.ops

import graft.SparkSpec
import graft.functions.{BloomMightContain, CmsEstimate}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // deterministic skewed corpus: key k appears k times, 1..60, plus a
  // string twin — exercises both probe dispatch paths
  private lazy val skewed = {
    val rows = for { k <- 1 to 60; _ <- 1 to k } yield (k.toLong, s"u$k")
    rows.toDF("k", "s").cache()
  }

  test("bloom probe has no false negatives on long and string keys") {
    val small = (1 to 50 by 7).map(i => (i.toLong, s"u$i")).toDF("k", "s")
    val bloomL = small.stat.bloomFilter("k", 100, 0.01)
    val bloomS = small.stat.bloomFilter("s", 100, 0.01)
    def bytes(b: org.apache.spark.util.sketch.BloomFilter) = {
      val bos = new java.io.ByteArrayOutputStream(); b.writeTo(bos); bos.toByteArray
    }
    // every inserted key must probe true (downstream exact join relies on it)
    assert(small.filter(!BloomMightContain(col("k"), bytes(bloomL))).count() === 0)
    assert(small.filter(!BloomMightContain(col("s"), bytes(bloomS))).count() === 0)
  }

  test("bloomSemiJoin equals the plain semi-join") {
    val big = skewed
    val small = Seq(3L, 17L, 59L, 9999L).toDF("k") // 9999 matches nothing
    val got = Sketches.bloomSemiJoin(big, small, "k", expectedItems = 100)
    val want = big.join(small, Seq("k"), "left_semi")
    assert(got.count() === want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() === 3 + 17 + 59)
  }

  test("bloomSemiJoin ignores NULL keys on both sides") {
    val big = Seq(Some(1L), None, Some(2L)).toDF("k")
    val small = Seq(Some(1L), None).toDF("k")
    assert(Sketches.bloomSemiJoin(big, small, "k", 10).collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("cms estimate never underestimates; string keys agree") {
    val cmsL = skewed.stat.countMinSketch(col("k"), 0.001, 0.999, 42)
    val cmsS = skewed.stat.countMinSketch(col("s"), 0.001, 0.999, 42)
    def bytes(c: org.apache.spark.util.sketch.CountMinSketch) = {
      val bos = new java.io.ByteArrayOutputStream(); c.writeTo(bos); bos.toByteArray
    }
    val exact = skewed.groupBy("k", "s").agg(count(lit(1)).as("c"))
    assert(exact.filter(CmsEstimate(col("k"), bytes(cmsL)) < col("c")).count() === 0)
    assert(exact.filter(CmsEstimate(col("s"), bytes(cmsS)) < col("c")).count() === 0)
  }

  test("cmsHeavyHitters matches the exact heavy hitters") {
    val got = Sketches.cmsHeavyHitters(skewed, "k", minCount = 40,
      eps = 1e-4, confidence = 0.999)
    val want = skewed.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 40)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() === 21) // keys 40..60
  }

  test("cmsHeavyHitters keeps a heavy NULL-key group (the sketch " +
    "cannot estimate null — it must not silently drop it)") {
    val withNulls = skewed.select(
      when(col("k") % 3 === 0, lit(null)).otherwise(col("k")).as("k"))
    val got = Sketches.cmsHeavyHitters(withNulls, "k", minCount = 40,
      eps = 1e-4, confidence = 0.999)
    val want = withNulls.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 40)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.filter(col("k").isNull).count() === 1,
      "the heavy null group must survive the prefilter")
  }

  test("hllMonthlyUniques: rollup estimate within tolerance, exact counts exact") {
    val rows = for (day <- 1 to 90; u <- 1 to (day % 7) + 1)
      yield (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(day - 1)),
        (u * 31 + day % 3).toLong)
    val df = rows.toDF("d", "uid")
    val out = Sketches.hllMonthlyUniques(df, "d", "uid").collect()
    assert(out.length === 3)
    assert(out.forall(_.getBoolean(2)), out.mkString("; "))
    val exactJan = rows.filter(_._1.toLocalDate.getMonthValue == 1).map(_._2).distinct.size
    assert(out.find(_.getDate(0).toLocalDate.getMonthValue == 1).get.getLong(1) === exactJan)
  }

  test("property: cmsHeavyHitters equals exact heavy hitters on random skews") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      // zipf-ish: key k drawn with weight ~ 1/k over a random key space
      val keys = 1 + rnd.nextInt(40)
      val draws = Seq.fill(2000)(1 + (math.pow(rnd.nextDouble(), 2.5) * keys).toInt)
      val df = draws.map(k => Tuple1(k.toLong)).toDF("k")
      val t = 10 + rnd.nextInt(150)
      val got = Sketches.cmsHeavyHitters(df, "k", minCount = t,
        eps = 1e-4, confidence = 0.999, seed = trial)
      val want = df.groupBy("k").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= t)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"trial $trial keys=$keys t=$t")
    }
  }

  test("probes fail at analysis on bad input types") {
    val bloom = Seq(1L).toDF("k").stat.bloomFilter("k", 10, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos)
    val df = Seq(1.5).toDF("x")
    intercept[Exception] {
      df.filter(BloomMightContain(col("x"), bos.toByteArray)).collect()
    }
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The salting contract: results identical to the plain join AND the hot
  * key's rows actually spread across multiple (key, salt) groups — the
  * second half is what distinguishes real salting from a key-derived
  * "salt" that routes every hot-key row to the same bucket.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def bigSkewed = {
    // one hot key (0) with 10k rows, 100 cold keys with 10 rows each
    val hot = (1 to 10000).map(i => (0L, i.toDouble))
    val cold = for (k <- 1 to 100; i <- 1 to 10) yield (k.toLong, i.toDouble)
    (hot ++ cold).toDF("k", "v").repartition(8)
  }
  private def dim = (0 to 100).map(k => (k.toLong, s"name$k")).toDF("k", "name")

  test("saltedJoin matches the unsalted join exactly") {
    val salted = Skew.saltedJoin(bigSkewed, dim, key = "k", factor = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val plain = bigSkewed.join(dim, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("hot key's rows span more than one salt bucket") {
    // reproduce the internal salt derivation shape: whole-row content
    // hash — per-row (rows differ in v), key-independent, retry-stable
    val salted = bigSkewed.withColumn("_salt",
      pmod(xxhash64(col("k"), col("v")), lit(8)).cast("int"))
    val saltsForHotKey = salted.filter(col("k") === 0L)
      .select(countDistinct(col("_salt"))).as[Long].head()
    assert(saltsForHotKey > 1L,
      s"hot key collapsed to $saltsForHotKey salt bucket(s) — salting is a no-op")
    // and the spread is roughly even: no salt bucket should hold the
    // majority of the hot key's rows
    val maxBucket = salted.filter(col("k") === 0L)
      .groupBy("_salt").count().agg(max("count")).as[Long].head()
    assert(maxBucket < 5000L,
      s"largest salt bucket holds $maxBucket of 10000 hot-key rows")
  }

  test("saltedCountSum matches plain aggregation") {
    val salted = Skew.saltedCountSum(bigSkewed, key = "k", valueCol = "v",
      factor = 8)
    val plain = bigSkewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salt audit detects the degenerate identical-rows hot key") {
    // the documented trap: a hot key whose rows are FULLY identical — the
    // whole-row content hash assigns them all one salt, and the
    // mitigation silently no-ops. The runtime audit must make that
    // visible instead of leaving it to a straggler task at 100× scale.
    val degenerate = (1 to 10000).map(_ => (0L, 1.0))
      .toDF("k", "v").repartition(8)
    val obs = new org.apache.spark.sql.Observation()
    Skew.saltedJoin(degenerate, dim, key = "k", factor = 8,
      saltAudit = Some(obs)).write.format("noop").mode("overwrite").save()
    val spread = Skew.saltSpread(obs.get) // get blocks until the action
    assert(spread < 1.5,
      s"identical-rows hot key should read as degenerate, spread=$spread")

    // and the healthy case reads healthy: varying payloads spread ~factor
    val obs2 = new org.apache.spark.sql.Observation()
    Skew.saltedJoin(bigSkewed, dim, key = "k", factor = 8,
      saltAudit = Some(obs2)).write.format("noop").mode("overwrite").save()
    val spread2 = Skew.saltSpread(obs2.get)
    assert(spread2 > 2.0,
      s"varying-payload skew should spread across salts, spread=$spread2")
  }

  test("invalid inputs fail fast: non-positive factor, _salt collision") {
    import spark.implicits._
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((1, "y")).toDF("k", "w")
    intercept[IllegalArgumentException] { Skew.saltedJoin(a, b, "k", 0) }
    intercept[IllegalArgumentException] { Skew.saltedCountSum(a, "k", "k", -1) }
    val clash = a.withColumn("_salt", org.apache.spark.sql.functions.lit(1))
    intercept[IllegalArgumentException] { Skew.saltedJoin(clash, b, "k", 4) }
  }
}

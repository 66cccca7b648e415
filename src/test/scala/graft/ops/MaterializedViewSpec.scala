package graft.ops

import graft.SparkSpec
import graft.storage.Lakehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental view maintenance invariants: the refreshed MV equals a
  * from-scratch recompute after every mix of append / delete / merge,
  * refresh is commitless when current, empty MVs reseed, and the
  * key-only-tombstone hole fails loudly.
  */
class MaterializedViewSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("grp", StringType),
    StructField("amt", DecimalType(18, 2))))

  private val spec = MaterializedView.Spec(
    groupCols = Seq("grp" -> col("grp")),
    sumCols = Seq("amt_sum" -> col("amt")))

  private def lakeIn(dir: String) =
    new Lakehouse(spark, dir, retainSnapshots = 1, gcGraceMs = 3600000L)

  private def rows(n: Int, off: Int = 0) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong + off, s"g${(i + off) % 3}",
        new java.math.BigDecimal(s"${(i + off) * 10}.50"))
    }.toDF("k", "grp", "amt")
      .select(col("k"), col("grp"), col("amt").cast("decimal(18,2)"))
  }

  private def recompute(lake: Lakehouse) =
    lake.read("base", schema).groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("amt") * lit(1L)).as("amt_sum"))

  private def served(lake: Lakehouse) =
    MaterializedView.read(lake, "mv", schema, spec)

  private def assertConverged(lake: Lakehouse): Unit = {
    val got = served(lake).orderBy("grp").collect().toSeq
    val want = recompute(lake).orderBy("grp").collect().toSeq
    assert(got == want, s"MV diverged:\n  mv=$got\n  re=$want")
  }

  test("refresh tracks append, predicate delete and merge exactly") {
    val lake = lakeIn(tmpDir("mv-track"))
    lake.append("base", rows(30))
    MaterializedView.seed(lake, "mv", "base", schema, spec)
    assertConverged(lake)

    lake.append("base", rows(20, off = 30))
    lake.delete("base", schema, col("k") % 4 === 0, cdf = true)
    MaterializedView.refresh(lake, "mv", "base", schema, spec)
    assertConverged(lake)

    // upsert: half updated (+100), some brand-new keys
    val src = rows(25, off = 40)
      .withColumn("amt", (col("amt") + lit(100)).cast("decimal(18,2)"))
    lake.merge("base", schema, src, Seq("k"), cdf = true)
    MaterializedView.refresh(lake, "mv", "base", schema, spec)
    assertConverged(lake)
  }

  test("a group deleted to zero rows drops out of the MV") {
    val lake = lakeIn(tmpDir("mv-zero"))
    lake.append("base", rows(9)) // g0,g1,g2 × 3
    MaterializedView.seed(lake, "mv", "base", schema, spec)
    lake.delete("base", schema, col("grp") === "g1", cdf = true)
    MaterializedView.refresh(lake, "mv", "base", schema, spec)
    assert(served(lake).filter(col("grp") === "g1").isEmpty)
    assertConverged(lake)
  }

  test("refresh when current is a commitless no-op") {
    val lake = lakeIn(tmpDir("mv-noop"))
    lake.append("base", rows(10))
    MaterializedView.seed(lake, "mv", "base", schema, spec)
    val commits = lake.versions("mv").size
    val basis = MaterializedView.refresh(lake, "mv", "base", schema, spec)
    assert(lake.versions("mv").size == commits)
    assert(basis == lake.versions("base").map(_._1).max)
  }

  test("refresh of an absent MV reseeds (full recompute fallback)") {
    val lake = lakeIn(tmpDir("mv-reseed"))
    lake.append("base", rows(12))
    MaterializedView.refresh(lake, "mv", "base", schema, spec)
    assertConverged(lake)
  }

  test("equality-delete commits in the range fail loudly") {
    import spark.implicits._
    val lake = lakeIn(tmpDir("mv-eqdel"))
    lake.append("base", rows(10))
    MaterializedView.seed(lake, "mv", "base", schema, spec)
    lake.deleteByKeys("base", schema, Seq(3L, 5L).toDF("k"), () => ())
    val e = intercept[IllegalArgumentException] {
      MaterializedView.refresh(lake, "mv", "base", schema, spec)
    }
    assert(e.getMessage.contains("equality-delete"))
  }

  test("applyFeedBatch is exactly-once under batch replay") {
    val lake = lakeIn(tmpDir("mv-batch"))
    lake.append("base", rows(20))
    val feed0 = rows(20).withColumn("_change_type", lit("insert"))
    val feed1 = rows(10).withColumn("_change_type", lit("delete"))
    MaterializedView.applyFeedBatch(lake, "mv", schema, spec, feed0, 0L)
    MaterializedView.applyFeedBatch(lake, "mv", schema, spec, feed1, 1L)
    val after = served(lake).orderBy("grp").collect().toSeq
    // at-least-once replays of both batches must all no-op
    MaterializedView.applyFeedBatch(lake, "mv", schema, spec, feed1, 1L)
    MaterializedView.applyFeedBatch(lake, "mv", schema, spec, feed0, 0L)
    assert(served(lake).orderBy("grp").collect().toSeq == after)
    // rows 10..19 survive: inserts minus the deleted prefix
    val want = lake.read("base", schema).filter(col("k") >= 10L)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("amt") * lit(1L)).as("amt_sum"))
      .orderBy("grp").collect().toSeq
    assert(after == want)
  }

  test("the exactly-once watermark survives a batch that zeroes out " +
    "EVERY group — a replay after it must still no-op") {
    val lake = lakeIn(tmpDir("mv-zero"))
    val feed0 = rows(12).withColumn("_change_type", lit("insert"))
    val feed1 = rows(12).withColumn("_change_type", lit("delete"))
    MaterializedView.applyFeedBatch(lake, "mv", schema, spec, feed0, 0L)
    MaterializedView.applyFeedBatch(lake, "mv", schema, spec, feed1, 1L)
    assert(served(lake).isEmpty, "all groups zeroed out")
    // foreachBatch's at-least-once: batch 1 replays after a crash —
    // before the sentinel the empty MV lost the stamp and the deletes
    // folded AGAIN into phantom negated groups
    MaterializedView.applyFeedBatch(lake, "mv", schema, spec, feed1, 1L)
    assert(served(lake).isEmpty,
      "a replayed batch re-applied to an emptied MV")
    // and the MV keeps working past the empty state
    MaterializedView.applyFeedBatch(lake, "mv", schema, spec,
      rows(6).withColumn("_change_type", lit("insert")), 2L)
    assert(served(lake).agg(sum(col("n"))).head().getLong(0) == 6L)
  }

  test("an unknown _change_type fails loudly instead of folding as a " +
    "delete") {
    val lake = lakeIn(tmpDir("mv-badtype"))
    MaterializedView.applyFeedBatch(lake, "mv", schema, spec,
      rows(8).withColumn("_change_type", lit("insert")), 0L)
    val bad = rows(4).withColumn("_change_type", lit("reinsert"))
    val ex = intercept[Exception] {
      MaterializedView.applyFeedBatch(lake, "mv", schema, spec, bad, 1L)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("unknown _change_type")), ex)
    // the failed fold committed nothing
    assert(served(lake).agg(sum(col("n"))).head().getLong(0) == 8L)
  }

  test("maintained decimal sums are exact (bit-equal to recompute)") {
    val lake = lakeIn(tmpDir("mv-exact"))
    lake.append("base", rows(50))
    MaterializedView.seed(lake, "mv", "base", schema, spec)
    (0 until 4).foreach { i =>
      lake.append("base", rows(10, off = 50 + i * 10))
      lake.delete("base", schema, col("k") % 7 === i.toLong, cdf = true)
      MaterializedView.refresh(lake, "mv", "base", schema, spec)
    }
    // compare the DECIMAL sums exactly — drift would show here first
    assertConverged(lake)
  }
}

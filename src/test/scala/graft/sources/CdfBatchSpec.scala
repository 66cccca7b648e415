package graft.sources

import graft.SparkSpec
import graft.storage.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BATCH change-data-feed reads (`changesFrom`/`changesTo` options on
  * the V2 provider — Delta's readChangeFeed shape): the option surface
  * must serve EXACTLY what the typed [[Lakehouse.changeFeed]] API
  * serves for the same range, across every commit kind (plain deltas,
  * CoW delete with a recorded feed, positional-DV delete emitting
  * pre-images, equality tombstones as key-only deletes, rewrites as
  * no-change), with `_commit_version` lineage intact.
  */
class CdfBatchSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))
  private val cdfSchema = StructType(schema.fields ++ Seq(
    StructField("_change_type", StringType),
    StructField("_commit_version", LongType)))

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10)).toDF("k", "v")

  private def optionRead(path: String, from: Long,
      to: Option[Long]): DataFrame = {
    val r = spark.read.format("graft.sources.LakehouseBatchProvider")
      .schema(cdfSchema).option("changesFrom", from.toString)
    to.foreach(t => r.option("changesTo", t.toString))
    r.load(path)
  }

  private def sig(df: DataFrame): Seq[String] =
    df.select(col("k"), col("v"), col("_change_type"),
      col("_commit_version"))
      .collect().map(_.toString).sorted.toSeq

  test("the option surface equals the typed changeFeed API across " +
    "delta, CoW-CDF, DV, eq-del and rewrite commits") {
    val lake = new Lakehouse(spark, tmpDir("cdfb"),
      gcGraceMs = 3600000L)
    val path = lake.tablePath("t")
    lake.append("t", rows(0, 100).coalesce(1), statsCols = Seq("k"))
    lake.append("t", rows(100, 200).coalesce(1), statsCols = Seq("k"))
    lake.delete("t", schema, col("k") % 7 === 0, cdf = true) // CoW + feed
    lake.deleteRowsMoR("t", schema, col("k") >= 190L)        // DV delta
    lake.deleteByKeys("t", schema, Seq(5L).toDF("k"), () => ())
    lake.append("t", rows(200, 220).coalesce(1), statsCols = Seq("k"))
    val head = lake.versions("t").map(_._1).max
    val api = sig(lake.changeFeed("t", 0L, head, schema))
    assert(api.nonEmpty)
    assert(sig(optionRead(path, 0L, Some(head))) == api,
      "option read must equal the typed feed")
    // changesTo defaults to the stable head
    assert(sig(optionRead(path, 0L, None)) == api)
    // sub-range: only the commits inside (v2, head]
    val tail = sig(lake.changeFeed("t", 2L, head, schema))
    assert(sig(optionRead(path, 2L, Some(head))) == tail)
    assert(tail.size < api.size)
    // the DV commit's pre-image deletes and the eq-del's key-only
    // delete both came through
    val types = optionRead(path, 0L, None)
      .groupBy(col("_change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types.contains("delete") && types.contains("insert"))
  }

  test("Delta's readChangeFeed + startingVersion/endingVersion spell " +
    "the same reads (inclusive bounds)") {
    val lake = new Lakehouse(spark, tmpDir("cdfb-alias"),
      gcGraceMs = 3600000L)
    val path = lake.tablePath("t")
    lake.append("t", rows(0, 50).coalesce(1))
    lake.append("t", rows(50, 80).coalesce(1))
    lake.delete("t", schema, col("k") % 5 === 0, cdf = true)
    lake.append("t", rows(80, 90).coalesce(1))
    val head = lake.versions("t").map(_._1).max
    def aliasRead(opts: (String, String)*): DataFrame = {
      val r = spark.read.format("graft.sources.LakehouseBatchProvider")
        .schema(cdfSchema)
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(path)
    }
    // startingVersion n (INCLUSIVE, Delta) == changesFrom n-1
    // (exclusive, native) — same rows, same lineage
    assert(sig(aliasRead("readChangeFeed" -> "true",
      "startingVersion" -> "2")) == sig(optionRead(path, 1L, None)))
    assert(sig(aliasRead("readChangeFeed" -> "true",
      "startingVersion" -> "1", "endingVersion" -> head.toString)) ==
      sig(optionRead(path, 0L, Some(head))))
    // misuse is loud: startingVersion without the flag, a dangling
    // endingVersion, and mixing the two vocabularies
    intercept[IllegalArgumentException] {
      aliasRead("startingVersion" -> "1")
        .queryExecution.executedPlan }
    intercept[IllegalArgumentException] {
      aliasRead("readChangeFeed" -> "true", "endingVersion" -> "3")
        .queryExecution.executedPlan }
    intercept[IllegalArgumentException] {
      aliasRead("readChangeFeed" -> "true", "startingVersion" -> "1",
        "changesFrom" -> "0").queryExecution.executedPlan }
  }

  test("option and schema misuse fails at PLAN time: dangling " +
    "changesTo/readChangeFeed, mistyped metadata columns, a range " +
    "past the stable head") {
    val lake = new Lakehouse(spark, tmpDir("cdfb3"))
    val path = lake.tablePath("t")
    lake.append("t", rows(0, 10).coalesce(1))
    val head = lake.versions("t").map(_._1).max
    def read(schema: StructType)(opts: (String, String)*): DataFrame = {
      val r = spark.read.format("graft.sources.LakehouseBatchProvider")
        .schema(schema)
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(path)
    }
    // changesTo alone must not silently serve a snapshot as "changes"
    // (the scan builds lazily — force planning)
    intercept[IllegalArgumentException] {
      read(cdfSchema)("changesTo" -> head.toString)
        .queryExecution.executedPlan }
    intercept[IllegalArgumentException] {
      read(cdfSchema)("readChangeFeed" -> "true")
        .queryExecution.executedPlan }
    // mistyped metadata columns fail at plan time, not mid-job
    val badCt = StructType(schema.fields :+
      StructField("_change_type", LongType))
    intercept[IllegalArgumentException] {
      read(badCt)("changesFrom" -> "0")
        .queryExecution.executedPlan }
    val badCv = StructType(cdfSchema.fields.map(f =>
      if (f.name == "_commit_version") f.copy(dataType = IntegerType)
      else f))
    intercept[IllegalArgumentException] {
      read(badCv)("changesFrom" -> "0")
        .queryExecution.executedPlan }
    // a range past the stable head is a loud error, not a silent gap
    intercept[Exception] {
      read(cdfSchema)("changesFrom" -> "0",
        "changesTo" -> (head + 5).toString).collect()
    }
    // the valid read still works
    assert(read(cdfSchema)("changesFrom" -> "0").count() == 10L)
  }

  test("a rewrite in range contributes nothing; a blind overwrite " +
    "in range fails loudly") {
    val lake = new Lakehouse(spark, tmpDir("cdfb2"),
      gcGraceMs = 3600000L)
    val path = lake.tablePath("t")
    lake.append("t", rows(0, 100).coalesce(1), statsCols = Seq("k"))
    lake.deleteRowsMoR("t", schema, col("k") < 80L)
    val preRw = lake.versions("t").map(_._1).max
    assert(lake.rewriteDeletes("t", schema, 0.5).nonEmpty)
    val head = lake.versions("t").map(_._1).max
    assert(head > preRw)
    // the rewrite's survivors are moved bytes, not changes
    assert(sig(optionRead(path, preRw, Some(head))).isEmpty)
    // a blind overwrite (no recorded feed) breaks the feed contract
    lake.overwritePartitioned("t", rows(0, 10), Nil)
    val head2 = lake.versions("t").map(_._1).max
    val ex = intercept[Exception] {
      optionRead(path, preRw, Some(head2)).collect()
    }
    assert(ex.getMessage.contains("recorded change data") ||
      Option(ex.getCause).exists(
        _.getMessage.contains("recorded change data")), ex.getMessage)
  }
}

package graft.storage

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Footer-derived zone maps (storage.FooterStats): a stats-only commit's
  * manifest is decoded from parquet footers — no second pass over the
  * data — and must be CONTENT-IDENTICAL to the scan-based aggregate it
  * replaces, across every covered type. The fallback must engage (never
  * crash, never write wrong bounds) whenever a footer can't vouch for a
  * column.
  */
class FooterStatsSpec extends SparkSpec {

  private val schema = StructType.fromDDL(
    "k BIGINT, s STRING, amt DECIMAL(18,2), ts TIMESTAMP, d DATE, x DOUBLE")

  private def sampleDf = {
    import spark.implicits._
    (0 until 100).map { i =>
      (i.toLong,
        if (i % 10 == 0) null else f"s$i%03d",
        new java.math.BigDecimal(s"$i.25"),
        ts(f"2024-01-${i % 28 + 1}%02d 10:00:00"),
        d(f"2024-02-${i % 28 + 1}%02d"),
        i * 1.5)
    }.toDF("k", "s", "amt", "ts", "d", "x")
      .withColumn("amt", col("amt").cast("decimal(18,2)"))
  }

  test("footer-derived manifest matches the scan aggregate across types") {
    val lake = new Lakehouse(spark, tmpDir("fs-types"))
    lake.append("t", sampleDf.repartition(3),
      statsCols = Seq("k", "s", "amt", "ts", "d", "x"))
    assert(Lakehouse.lastStatsFromFooters,
      "the footer path must engage for INT64-micros lakehouse writes")
    val vdir = lake.dataPaths("t").last
    val manifest = spark.read.parquet(s"$vdir/_GRAFT_STATS")
    // recompute the same aggregate by scanning (the replaced path)
    val byScan = spark.read.schema(schema)
      .option("basePath", vdir).parquet(vdir)
      .groupBy(substring_index(input_file_name(), "/", -1).as("file"))
      .agg(
        count(lit(1L)).as("rows"),
        min("k").as("min_k"), max("k").as("max_k"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("nulls_k"),
        min("s").as("min_s"), max("s").as("max_s"),
        sum(when(col("s").isNull, 1L).otherwise(0L)).as("nulls_s"),
        min("amt").as("min_amt"), max("amt").as("max_amt"),
        sum(when(col("amt").isNull, 1L).otherwise(0L)).as("nulls_amt"),
        min("ts").as("min_ts"), max("ts").as("max_ts"),
        sum(when(col("ts").isNull, 1L).otherwise(0L)).as("nulls_ts"),
        min("d").as("min_d"), max("d").as("max_d"),
        sum(when(col("d").isNull, 1L).otherwise(0L)).as("nulls_d"),
        min("x").as("min_x"), max("x").as("max_x"),
        sum(when(col("x").isNull, 1L).otherwise(0L)).as("nulls_x"))
    val cols = manifest.columns.sorted
    assert(cols.toSet == byScan.columns.toSet, s"schema: ${cols.toSeq}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(cols.map(col).toIndexedSeq: _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    // decimal manifest types must match before string-canonicalizing
    assert(manifest.schema("min_amt").dataType
      == byScan.schema("min_amt").dataType)
    assert(manifest.schema("min_ts").dataType
      == byScan.schema("min_ts").dataType)
    assert(canon(manifest) == canon(byScan))
  }

  test("zone-map pruning works from footer-derived timestamp bounds") {
    val lake = new Lakehouse(spark, tmpDir("fs-prune"))
    import spark.implicits._
    // three one-file commits with disjoint trans_date months, stats on
    // the timestamp column — footer-decoded INT64-micros bounds
    def mk(m: Int) = (1 to 20).map(i => (
      s"t${m * 20 + i}", ts(f"2024-0${m + 1}%d-${i % 27 + 1}%02d 00:00:00"),
      "c", "o", new java.math.BigDecimal("1.25"), "r", "x"))
      .toDF("trans_id", "trans_date", "card_num", "oper_type", "amt",
        "oper_result", "terminal")
      .withColumn("amt", col("amt").cast("decimal(18,2)"))
    (0 to 2).foreach { m =>
      lake.append("fact_transactions", mk(m).coalesce(1),
        statsCols = Seq("trans_date"))
      assert(Lakehouse.lastStatsFromFooters)
    }
    // corrupt the JANUARY file on disk: only correct footer-derived
    // bounds keep a February range read from ever opening it
    val conf = spark.sparkContext.hadoopConfiguration
    val janFile = lake.dataPaths("fact_transactions").flatMap { r =>
      val root = new Path(r)
      val fsys = root.getFileSystem(conf)
      val statsDir = new Path(root, "_GRAFT_STATS")
      if (!fsys.exists(statsDir)) Nil
      else {
        val m = spark.read.parquet(
          fsys.listStatus(statsDir).map(_.getPath.toString)
            .filter(_.endsWith(".parquet")).toIndexedSeq: _*).collect()
        m.filter(r => r.getTimestamp(r.fieldIndex("min_trans_date"))
            .toString.startsWith("2024-01"))
          .map(row => new Path(root, row.getString(row.fieldIndex("file"))))
      }
    }
    assert(janFile.size == 1, s"one January file expected: $janFile")
    val out = janFile.head.getFileSystem(conf).create(janFile.head, true)
    out.write("garbage".getBytes("UTF-8")); out.close()
    val got = lake.readBetween("fact_transactions", "trans_date",
      ts("2024-02-01 00:00:00"), ts("2024-02-28 23:59:59"))
      .select("trans_id").collect().map(_.getString(0)).sorted
    assert(got.toSeq == (21 to 40).map(i => s"t$i").sorted)
  }

  test("bloom commits ALSO come from footers (parquet SBBFs lifted " +
    "into the manifest), stats content unchanged") {
    val lake = new Lakehouse(spark, tmpDir("fs-bloom"))
    import spark.implicits._
    lake.append("t", (0L until 50L).map(i => (i, i * 2)).toDF("k", "v")
      .coalesce(1), statsCols = Seq("k"), bloomCols = Seq("v"))
    assert(Lakehouse.lastStatsFromFooters,
      "the write built the SBBFs; the manifest copies them from footers")
    val vdir = lake.dataPaths("t").last
    val m = spark.read.parquet(s"$vdir/_GRAFT_STATS").collect().head
    assert(m.getLong(m.fieldIndex("min_k")) == 0L)
    assert(m.getLong(m.fieldIndex("max_k")) == 49L)
    // the bloom cell decodes as SBBF framing and answers membership
    val blob = m.getAs[Array[Byte]](m.fieldIndex("bloom_v"))
    val filters = FooterBloom.decode(blob).get
    assert(FooterBloom.mightContain(filters, java.lang.Long.valueOf(98L)))
    assert((0L until 500L).count(x => FooterBloom.mightContain(
      filters, java.lang.Long.valueOf(x * 2 + 1))) < 50,
      "odd values are absent — false-positive rate must stay modest")
  }
}

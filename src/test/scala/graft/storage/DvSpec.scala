package graft.storage

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Deletion vectors (merge-on-read positional deletes,
  * Lakehouse.deleteRowsMoR): a predicate delete lands as a data-less
  * delta naming (file, row-index) tombstones; every reader masks them,
  * compaction materializes them, and data appended after the delete is
  * never masked (the sequence rule).
  */
class DvSpec extends SparkSpec {

  private val schema = StructType.fromDDL("k BIGINT, v BIGINT")

  private def mkLake(tag: String): Lakehouse =
    new Lakehouse(spark, tmpDir(s"dv-$tag"))

  private def rows(lo: Long, hi: Long) = {
    import spark.implicits._
    (lo until hi).map(i => (i, i * 10)).toDF("k", "v")
  }

  test("MoR delete masks rows without rewriting data files") {
    val lake = mkLake("mask")
    lake.append("t", rows(0, 100))
    val filesBefore = lake.dataPaths("t").flatMap(r =>
      new Path(r).getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(new Path(r)).map(_.getPath.getName))
      .filter(_.endsWith(".parquet")).toSet
    lake.deleteRowsMoR("t", schema, col("k") % 7 === 0)
    // visible rows exclude the predicate's matches
    val got = lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 100L).filterNot(_ % 7 == 0))
    // and NOT ONE data file was rewritten
    val filesAfter = lake.dataPaths("t").flatMap(r =>
      new Path(r).getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(new Path(r)).map(_.getPath.getName))
      .filter(_.endsWith(".parquet")).toSet
    assert(filesAfter == filesBefore)
  }

  test("sequence rule: rows appended after the DV are never masked") {
    val lake = mkLake("seq")
    lake.append("t", rows(0, 50))
    lake.deleteRowsMoR("t", schema, col("k") < 10)
    // re-insert some of the very same keys AFTER the delete
    lake.append("t", rows(0, 5))
    val got = lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted
    assert(got.toSeq == ((0L until 5L) ++ (10L until 50L)).sorted)
    // NULL-predicate rows survive (SQL DELETE contract)
    lake.deleteRowsMoR("t", schema,
      when(col("k") < 3, lit(null).cast("boolean"))
        .otherwise(col("k") === 11))
    val got2 = lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted
    assert(got2.toSeq == ((0L until 5L) ++ (10L until 50L))
      .filterNot(_ == 11L).sorted)
  }

  test("the V2 batch scan serves DVs natively; agg pushdown declines") {
    val lake = mkLake("v2")
    lake.append("t", rows(0, 100), statsCols = Seq("k"))
    lake.deleteRowsMoR("t", schema, col("k") >= 90)
    val df = spark.read.format("graft.sources.LakehouseBatchProvider")
      .schema(schema).load(lake.tablePath("t"))
    assert(df.count() == 90L)
    assert(df.agg(max(col("k"))).head().getLong(0) == 89L)
    // count must NOT have been answered from footers (they say 100):
    // the plan carries a real scan, not a PushedAggregation
    val plan = df.groupBy().count().queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregation"), plan)
    // zone-map skipping still cuts files conservatively
    assert(df.filter(col("k") === 5).collect().map(_.getLong(1)).toSeq
      == Seq(50L))
  }

  test("compaction materializes the vectors and drops them") {
    val lake = mkLake("compact")
    lake.append("t", rows(0, 60))
    lake.deleteRowsMoR("t", schema, col("k") % 2 === 0)
    lake.compact("t", schema, numFiles = 2, sortCols = Seq("k"))
    val got = lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 60L).filter(_ % 2 == 1))
    // the live chain carries no DV dirs any more
    val fs = new Path(lake.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvDirs = lake.dataPaths("t").filter(r =>
      fs.exists(new Path(r, "_GRAFT_DV")))
    assert(dvDirs.isEmpty)
    // and the V2 scan is back to metadata aggregates
    val df = spark.read.format("graft.sources.LakehouseBatchProvider")
      .schema(schema).load(lake.tablePath("t"))
    assert(df.count() == 30L)
  }

  test("streams and change feeds refuse DV commits loudly") {
    val lake = mkLake("feed")
    lake.append("t", rows(0, 20))
    lake.deleteRowsMoR("t", schema, col("k") === 3)
    intercept[Exception] {
      spark.readStream.schema(schema)
        .format("graft.sources.LakehouseStreamProvider")
        .load(lake.tablePath("t"))
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("dv-ck"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
  }
}

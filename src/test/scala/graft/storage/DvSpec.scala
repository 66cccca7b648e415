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

  test("SQL DELETE routes through DVs under graft.deleteMode=mor") {
    val root = tmpDir("dv-sql")
    spark.conf.set("spark.sql.catalog.graftdv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftdv.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftdv.d")
    spark.sql("""CREATE TABLE graftdv.d.t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('graft.deleteMode' = 'mor')""")
    spark.sql("INSERT INTO graftdv.d.t SELECT id, id * 10 FROM range(0, 100)")
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles: Int = {
      var n = 0
      def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
        val nm = st.getPath.getName
        if (st.isDirectory && !nm.startsWith("_GRAFT_DV")) walk(st.getPath)
        else if (nm.endsWith(".parquet") &&
          !st.getPath.getParent.getName.startsWith("_GRAFT")) n += 1
      }
      walk(new Path(root, "d/t"))
      n
    }
    val before = dataFiles
    spark.sql("DELETE FROM graftdv.d.t WHERE k % 3 = 0")
    assert(dataFiles == before, "MoR SQL DELETE must not rewrite files")
    assert(spark.sql("SELECT sum(v) FROM graftdv.d.t").head().getLong(0)
      == (0L until 100L).filterNot(_ % 3 == 0).map(_ * 10).sum)
    // compact materializes; the table then answers from metadata again
    spark.sql("CALL graftdv.system.compact('d', 't', 2, '')")
    assert(spark.sql("SELECT count(*) FROM graftdv.d.t").head().getLong(0)
      == (0L until 100L).count(_ % 3 != 0))
    // CDF tables refuse the mode loudly
    spark.sql("""CREATE TABLE graftdv.d.c (k BIGINT)
      TBLPROPERTIES ('graft.deleteMode' = 'mor', 'graft.cdf' = 'true')""")
    spark.sql("INSERT INTO graftdv.d.c SELECT id FROM range(0, 5)")
    intercept[Exception] {
      spark.sql("DELETE FROM graftdv.d.c WHERE k = 1")
    }
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

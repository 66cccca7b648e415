package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL metadata tables (`t$history` / `t$files` / `t$partitions`): the
  * commit log, live file set and partition layout as relations — all
  * driver-side metadata, no data IO.
  */
class MetaTablesSpec extends SparkSpec {

  private lazy val root = tmpDir("graft-meta")

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graftmeta", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftmeta.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftmeta.m")
  }

  test("history, files and partitions reflect the commit log") {
    init()
    spark.sql("""CREATE TABLE graftmeta.m.t (k BIGINT, v BIGINT)
      PARTITIONED BY (k)""")
    spark.sql("INSERT INTO graftmeta.m.t SELECT id % 3, id FROM range(0, 300)")
    spark.sql("INSERT INTO graftmeta.m.t SELECT id % 3, id FROM range(300, 400)")

    val hist = spark.sql("SELECT * FROM graftmeta.m.`t$history`").collect()
    assert(hist.length == 2)
    assert(hist.forall(!_.getBoolean(1))) // two delta commits

    val files = spark.sql("SELECT * FROM graftmeta.m.`t$files`")
    // exact key clustering: 3 keys × 2 inserts = 6 files
    assert(files.count() == 6L)
    assert(files.agg(sum("rows")).head().getLong(0) == 400L)

    val parts = spark.sql(
      "SELECT * FROM graftmeta.m.`t$partitions` ORDER BY k").collect()
    assert(parts.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((0L, 2L, 134L), (1L, 2L, 133L), (2L, 2L, 133L)))
    assert(parts.forall(_.getBoolean(3)), "intact clustering is is_exact")

    // compaction folds the log: one full commit, 3 keyed files
    spark.sql("CALL graftmeta.system.compact('m', 't', 4, 'k')")
    val hist2 = spark.sql("SELECT * FROM graftmeta.m.`t$history`").collect()
    assert(hist2.exists(_.getBoolean(1)))
    assert(spark.sql("SELECT * FROM graftmeta.m.`t$files`").count() == 3L)
  }

  test("$partitions flags degraded files instead of faking a NULL key") {
    init()
    spark.sql("""CREATE TABLE graftmeta.m.tdeg (k BIGINT, v BIGINT)
      PARTITIONED BY (k)""")
    spark.sql(
      "INSERT INTO graftmeta.m.tdeg SELECT id % 2, id FROM range(0, 100)")
    // wreck the invariant the way a crash would: drop the stats
    // manifest of the committed version, leaving its files uncovered
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tdir = new org.apache.hadoop.fs.Path(root, "m/tdeg")
    fs.listStatus(tdir).filter(_.getPath.getName.startsWith("_v"))
      .foreach { v =>
        val m = new org.apache.hadoop.fs.Path(v.getPath, "_GRAFT_STATS")
        if (fs.exists(m)) fs.delete(m, true)
      }
    val parts = spark.sql(
      "SELECT * FROM graftmeta.m.`tdeg$partitions`").collect()
    // everything lands in ONE flagged bucket: key NULL, is_exact=false
    // — distinguishable from a genuine NULL partition key, which would
    // report is_exact=true via its nulls_<c>==rowCount proof
    assert(parts.length == 1)
    assert(parts.head.isNullAt(0) && !parts.head.getBoolean(3), parts.toSeq)
    assert(parts.head.getLong(2) == 100L)
  }

  test("$partitions refuses an unpartitioned table; unknown kinds fail") {
    init()
    spark.sql("CREATE TABLE graftmeta.m.plain (k BIGINT)")
    spark.sql("INSERT INTO graftmeta.m.plain SELECT id FROM range(0, 5)")
    intercept[Exception] {
      spark.sql("SELECT * FROM graftmeta.m.`plain$partitions`").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM graftmeta.m.`plain$nope`").collect()
    }
    assert(spark.sql("SELECT sum(rows) FROM graftmeta.m.`plain$files`")
      .head().getLong(0) == 5L)
  }
}

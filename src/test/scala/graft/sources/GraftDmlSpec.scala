package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL UPDATE / MERGE INTO / arbitrary-predicate DELETE on catalog
  * tables (GraftDmlRule + the copy-on-write commands).
  */
class GraftDmlSpec extends SparkSpec {

  private lazy val root = tmpDir("graft-dml")

  private def init(): Unit = {
    // a dedicated catalog name: the plugin instance (and its root) is
    // cached per name in the session, so sharing `graft` with other
    // suites would pin whichever root initialized first
    spark.conf.set("spark.sql.catalog.graftdml", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftdml.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftdml.dml")
  }

  test("UPDATE applies assignments where the predicate is TRUE") {
    init()
    spark.sql("CREATE TABLE graftdml.dml.u1 (k BIGINT, grp STRING, amt DOUBLE)")
    spark.sql("""INSERT INTO graftdml.dml.u1
      SELECT id, concat('g', id % 3), CAST(id AS DOUBLE) FROM range(0, 30)""")
    spark.sql("""UPDATE graftdml.dml.u1
      SET amt = amt * 10, grp = concat(grp, '!')
      WHERE k % 2 = 0 AND amt < 20""")
    val rows = spark.sql("SELECT k, grp, amt FROM graftdml.dml.u1 ORDER BY k")
      .collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val k = r.getLong(0)
      val hit = k % 2 == 0 && k < 20
      assert(r.getDouble(2) == (if (hit) k * 10.0 else k.toDouble), s"k=$k")
      assert(r.getString(1) == s"g${k % 3}" + (if (hit) "!" else ""), s"k=$k")
    }
    // the update landed as ONE FULL commit through the protocol
    val lake = new graft.storage.Lakehouse(spark, s"$root/dml")
    assert(lake.versions("u1").last._2)
    spark.sql("DROP TABLE graftdml.dml.u1")
  }

  test("UPDATE RHS sees pre-update values (simultaneous assignment)") {
    init()
    spark.sql("CREATE TABLE graftdml.dml.u2 (k BIGINT, a BIGINT, b BIGINT)")
    spark.sql(
      "INSERT INTO graftdml.dml.u2 SELECT id, id * 2, id * 3 FROM range(0, 10)")
    // the SQL-standard swap: both RHS evaluate against the OLD row
    spark.sql("UPDATE graftdml.dml.u2 SET a = b, b = a")
    spark.sql("SELECT k, a, b FROM graftdml.dml.u2").collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(0) * 3 &&
        r.getLong(2) == r.getLong(0) * 2)
    }
    spark.sql("DROP TABLE graftdml.dml.u2")
  }

  test("DELETE with a predicate the Filter bridge cannot carry") {
    init()
    spark.sql("CREATE TABLE graftdml.dml.d1 (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO graftdml.dml.d1 SELECT id, concat('v', id) FROM range(0, 30)")
    // modulo arithmetic is not a V1 Filter — SupportsDelete.deleteWhere
    // can't take it; the GraftDeleteCommand path must
    spark.sql("DELETE FROM graftdml.dml.d1 WHERE k % 3 = 1 OR length(v) > 2")
    val left = spark.sql("SELECT k FROM graftdml.dml.d1").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(left == (0L until 30L).filter(k => k % 3 != 1 && s"v$k".length <= 2))
    spark.sql("DROP TABLE graftdml.dml.d1")
  }

  test("MERGE INTO: the full clause set, first-applicable wins") {
    init()
    spark.sql("CREATE TABLE graftdml.dml.m1 (k BIGINT, amt DOUBLE, tag STRING)")
    spark.sql("""INSERT INTO graftdml.dml.m1
      SELECT id, CAST(id * 10 AS DOUBLE), 'old' FROM range(0, 10)""")
    spark.range(5, 15).toDF("k")
      .withColumn("amt", col("k").cast("double"))
      .createOrReplaceTempView("m1_src")
    spark.sql("""MERGE INTO graftdml.dml.m1 t USING m1_src s ON t.k = s.k
      WHEN MATCHED AND s.amt >= 8 THEN UPDATE SET amt = s.amt, tag = 'upd'
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED AND s.k < 14 THEN INSERT (k, amt, tag)
        VALUES (s.k, s.amt * 100, 'new')
      WHEN NOT MATCHED BY SOURCE AND t.k < 2 THEN DELETE""")
    val got = spark.sql("SELECT k, amt, tag FROM graftdml.dml.m1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    // k 0,1: nmbs-deleted; 2-4: kept old; 5-7: matched, s.amt<8 → deleted;
    // 8,9: matched updated; 10-13: inserted at amt*100; 14: insert cond false
    val want = (2L to 4L).map(k => (k, k * 10.0, "old")) ++
      (8L to 9L).map(k => (k, k.toDouble, "upd")) ++
      (10L to 13L).map(k => (k, k * 100.0, "new"))
    assert(got.toSeq == want)
    val lake = new graft.storage.Lakehouse(spark, s"$root/dml")
    assert(lake.versions("m1").last._2, "merge must land as a FULL commit")
    spark.sql("DROP TABLE graftdml.dml.m1")
  }

  test("MERGE refuses a source that matches one target row twice") {
    init()
    spark.sql("CREATE TABLE graftdml.dml.m2 (k BIGINT, amt DOUBLE)")
    spark.sql(
      "INSERT INTO graftdml.dml.m2 SELECT id, CAST(id AS DOUBLE) FROM range(0, 5)")
    spark.sql("SELECT CAST(id % 3 AS BIGINT) AS k, CAST(id AS DOUBLE) AS amt " +
      "FROM range(0, 6)").createOrReplaceTempView("m2_src")
    val e = intercept[Exception](
      spark.sql("""MERGE INTO graftdml.dml.m2 t USING m2_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET amt = s.amt"""))
    assert(e.getMessage.contains("multiple source rows"), e.getMessage)
    spark.sql("DROP TABLE graftdml.dml.m2")
  }

  test("MERGE on a graft.cdf table records the typed change feed") {
    init()
    spark.sql("""CREATE TABLE graftdml.dml.m3 (k BIGINT, amt DOUBLE)
      TBLPROPERTIES ('graft.cdf' = 'true')""")
    spark.sql(
      "INSERT INTO graftdml.dml.m3 SELECT id, CAST(id AS DOUBLE) FROM range(0, 6)")
    spark.sql("SELECT id AS k, CAST(id * 5 AS DOUBLE) AS amt " +
      "FROM range(4, 8)").createOrReplaceTempView("m3_src")
    spark.sql("""MERGE INTO graftdml.dml.m3 t USING m3_src s ON t.k = s.k
      WHEN MATCHED AND s.k = 4 THEN DELETE
      WHEN MATCHED THEN UPDATE SET amt = s.amt
      WHEN NOT MATCHED THEN INSERT (k, amt) VALUES (s.k, s.amt)""")
    val lake = new graft.storage.Lakehouse(spark, s"$root/dml")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("amt",
        org.apache.spark.sql.types.DoubleType)))
    val v = lake.versions("m3").map(_._1).max
    val feed = lake.changeFeed("m3", v - 1, v, schema)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(feed == Seq((4L, "delete"),
      (5L, "update_postimage"), (5L, "update_preimage"),
      (6L, "insert"), (7L, "insert")), feed.toString)
    spark.sql("DROP TABLE graftdml.dml.m3")
  }

  test("DML on a time-travel snapshot is refused") {
    init()
    spark.sql("CREATE TABLE graftdml.dml.t1 (k BIGINT)")
    spark.sql("INSERT INTO graftdml.dml.t1 SELECT id FROM range(0, 5)")
    val e = intercept[Exception](spark.sql(
      "UPDATE graftdml.dml.t1 VERSION AS OF 1 SET k = 0"))
    // parser or rule — either way the statement must not execute
    assert(spark.sql("SELECT sum(k) FROM graftdml.dml.t1").head().getLong(0)
      == 10L)
    spark.sql("DROP TABLE graftdml.dml.t1")
  }
}

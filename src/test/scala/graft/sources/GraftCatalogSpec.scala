package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL surface over the lakehouse: DDL/DML through the catalog plugin,
  * reads through the V2 scan (pushdown intact), commit-protocol writes.
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val root = tmpDir("graft-catalog")

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
  }

  test("CREATE / INSERT INTO / SELECT / DROP round-trip") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql(
      "CREATE TABLE graft.mart.t1 (k BIGINT, grp STRING, amt DECIMAL(18,2))")
    spark.sql(
      """INSERT INTO graft.mart.t1
        |SELECT id AS k, concat('g', id % 3) AS grp,
        |  CAST(id * 1.5 AS DECIMAL(18,2)) AS amt
        |FROM range(0, 100)""".stripMargin)
    spark.sql( // second insert = second delta commit
      """INSERT INTO graft.mart.t1
        |SELECT id, concat('g', id % 3), CAST(id * 1.5 AS DECIMAL(18,2))
        |FROM range(100, 150)""".stripMargin)
    val got = spark.sql(
      """SELECT grp, count(*) AS n, sum(amt) AS amt_sum
        |FROM graft.mart.t1 GROUP BY grp ORDER BY grp""".stripMargin)
      .collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(1)).sum == 150L)
    assert(spark.sql("SHOW TABLES IN graft.mart").collect()
      .exists(_.getString(1) == "t1"))
    spark.sql("DROP TABLE graft.mart.t1")
    assert(spark.sql("SHOW TABLES IN graft.mart").collect().isEmpty)
  }

  test("INSERT OVERWRITE lands as a full snapshot commit") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t2 (k BIGINT)")
    spark.sql("INSERT INTO graft.mart.t2 SELECT id FROM range(0, 50)")
    spark.sql("INSERT OVERWRITE graft.mart.t2 SELECT id FROM range(0, 7)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.mart.t2")
      .head().getLong(0) == 7L)
    val lake = new graft.storage.Lakehouse(spark, s"$root/mart")
    val vs = lake.versions("t2")
    assert(vs.last._2, s"overwrite must be a FULL commit: $vs")
    spark.sql("DROP TABLE graft.mart.t2")
  }

  test("SQL count(*) answers from metadata through the catalog table") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t3 (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO graft.mart.t3 SELECT id, concat('v', id) FROM range(0, 42)")
    val q = spark.sql("SELECT count(*) FROM graft.mart.t3")
    assert(q.queryExecution.executedPlan.toString
      .contains("PushedAggregation"))
    assert(q.head().getLong(0) == 42L)
    spark.sql("DROP TABLE graft.mart.t3")
  }

  test("CTAS creates and fills in one statement") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql(
      """CREATE TABLE graft.mart.t4 AS
        |SELECT id AS k, CAST(id AS DOUBLE) AS x FROM range(0, 25)""".stripMargin)
    assert(spark.sql("SELECT sum(k) FROM graft.mart.t4")
      .head().getLong(0) == 300L)
    spark.sql("DROP TABLE graft.mart.t4")
  }

  test("path-based V2 read infers the persisted catalog schema") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t5 (k BIGINT, grp STRING)")
    spark.sql(
      "INSERT INTO graft.mart.t5 SELECT id, concat('g', id % 2) FROM range(0, 10)")
    val df = spark.read.format("graft.sources.LakehouseBatchProvider")
      .load(s"$root/mart/t5") // no .schema(...)
    assert(df.schema.fieldNames.toSeq == Seq("k", "grp"))
    assert(df.count() == 10L)
    spark.sql("DROP TABLE graft.mart.t5")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t7 (k BIGINT)")
    spark.sql("INSERT INTO graft.mart.t7 SELECT id FROM range(0, 10)")
    spark.sql("INSERT INTO graft.mart.t7 SELECT id FROM range(10, 30)")
    assert(spark.sql(
      "SELECT count(*) FROM graft.mart.t7 VERSION AS OF 1")
      .head().getLong(0) == 10L)
    assert(spark.sql("SELECT count(*) FROM graft.mart.t7")
      .head().getLong(0) == 30L)
    // timestamp after the last commit resolves to the head
    val ts = java.sql.Timestamp.from(
      java.time.Instant.now().plusSeconds(60))
    assert(spark.sql(
      s"SELECT count(*) FROM graft.mart.t7 TIMESTAMP AS OF '$ts'")
      .head().getLong(0) == 30L)
    spark.sql("DROP TABLE graft.mart.t7")
  }

  test("CALL procedures: compact, history, vacuum through SQL") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t8 (k BIGINT, v STRING)")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO graft.mart.t8 " +
        s"SELECT id, concat('v', id) FROM range(${i * 10}, ${i * 10 + 10})")
    }
    val hist = spark.sql(
      "CALL graft.system.history('mart', 't8')").collect()
    assert(hist.length == 3 && hist.forall(!_.getBoolean(1)))
    spark.sql("CALL graft.system.compact('mart', 't8', 2, 'k')")
    val hist2 = spark.sql(
      "CALL graft.system.history('mart', 't8')").collect()
    assert(hist2.exists(_.getBoolean(1)), "compact must land a FULL commit")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t8")
      .head().getLong(0) == 30L)
    spark.sql("CALL graft.system.vacuum('mart', 't8')")
    assert(spark.sql("SELECT sum(k) FROM graft.mart.t8")
      .head().getLong(0) == (0L until 30L).sum)
    spark.sql("DROP TABLE graft.mart.t8")
  }

  test("DELETE FROM and TRUNCATE TABLE through SQL") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t9 (k BIGINT, grp STRING)")
    spark.sql(
      "INSERT INTO graft.mart.t9 SELECT id, concat('g', id % 3) FROM range(0, 30)")
    spark.sql("DELETE FROM graft.mart.t9 WHERE grp = 'g1' OR k >= 27")
    val left = spark.sql("SELECT k FROM graft.mart.t9").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(left == (0L until 27L).filter(_ % 3 != 1L))
    // the delete landed as a FULL commit through the commit protocol
    val lake = new graft.storage.Lakehouse(spark, s"$root/mart")
    assert(lake.versions("t9").last._2)
    spark.sql("TRUNCATE TABLE graft.mart.t9")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t9")
      .head().getLong(0) == 0L)
    // schema survives truncation — the table is empty, not gone
    spark.sql("INSERT INTO graft.mart.t9 VALUES (1, 'g0')")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t9")
      .head().getLong(0) == 1L)
    spark.sql("DROP TABLE graft.mart.t9")
  }

  test("ALTER TABLE ADD COLUMN widens the contract; old rows null-fill") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t10 (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO graft.mart.t10 SELECT id, concat('v', id) FROM range(0, 10)")
    spark.sql("ALTER TABLE graft.mart.t10 ADD COLUMN score DOUBLE")
    // the widened contract is immediately visible and writable
    spark.sql("""INSERT INTO graft.mart.t10
      SELECT id, concat('v', id), CAST(id AS DOUBLE) / 2
      FROM range(10, 20)""")
    val rows = spark.sql(
      "SELECT k, score FROM graft.mart.t10 ORDER BY k").collect()
    assert(rows.length == 20)
    assert(rows.take(10).forall(_.isNullAt(1)),
      "pre-ALTER rows must null-fill the added column")
    assert(rows.drop(10).forall(r => r.getDouble(1) == r.getLong(0) / 2.0))
    // a filter on the NEW column is sound against old (column-less) files
    assert(spark.sql(
      "SELECT count(*) FROM graft.mart.t10 WHERE score >= 7.0")
      .head().getLong(0) == 6L)
    // data-losing ALTERs are refused, not mangled (DROP and RENAME
    // COLUMN are supported separately — contract narrowing/relabel,
    // not data-losing)
    intercept[Exception](
      spark.sql("ALTER TABLE graft.mart.t10 ALTER COLUMN k TYPE INT"))
    spark.sql("DROP TABLE graft.mart.t10")
  }

  test("ALTER TABLE RENAME COLUMN relabels the contract; committed " +
    "generations keep serving under the new name") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t30")
    spark.sql("CREATE TABLE graft.mart.t30 (k BIGINT, amt DECIMAL(18,2)," +
      " tag STRING)")
    spark.sql("INSERT INTO graft.mart.t30 SELECT id, " +
      "CAST(id * 1.5 AS DECIMAL(18,2)), concat('t', id) FROM range(0, 20)")
    spark.sql("ALTER TABLE graft.mart.t30 RENAME COLUMN amt TO amount")
    // pure relabel: the contract shows the new name, the PRE-RENAME
    // generation's values serve under it (files were not touched)
    assert(spark.table("graft.mart.t30").schema.fieldNames.toSeq ==
      Seq("k", "amount", "tag"))
    intercept[Exception](
      spark.sql("SELECT amt FROM graft.mart.t30").collect())
    assert(spark.sql("SELECT CAST(sum(amount) AS LONG) " +
      "FROM graft.mart.t30").head().getLong(0) ==
      (0L until 20L).map(i => i * 15 / 10.0).sum.toLong)
    // the schema FILE stays physical; the mapping carries the relabel
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val persisted = GraftCatalog.readSchema(fs,
      new org.apache.hadoop.fs.Path(s"$root/mart/t30", "_GRAFT_SCHEMA"))
    assert(persisted.fieldNames.toSeq == Seq("k", "amt", "tag"),
      "rename must not rewrite the physical schema file")
    // post-rename INSERT binds the LOGICAL name and lands PHYSICAL
    spark.sql("INSERT INTO graft.mart.t30 SELECT id, " +
      "CAST(id * 1.5 AS DECIMAL(18,2)), concat('t', id) FROM range(20, 30)")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t30 " +
      "WHERE amount IS NOT NULL").head().getLong(0) == 30L,
      "old and new generations must serve one merged column")
    // rename CHAIN re-resolves through the current logical name
    spark.sql("ALTER TABLE graft.mart.t30 RENAME COLUMN amount TO total")
    assert(spark.sql("SELECT CAST(sum(total) AS LONG) " +
      "FROM graft.mart.t30").head().getLong(0) > 0L)
    // …and renaming BACK to the physical name clears the mapping
    spark.sql("ALTER TABLE graft.mart.t30 RENAME COLUMN total TO amt")
    val props = GraftCatalog.readProps(fs,
      new org.apache.hadoop.fs.Path(s"$root/mart/t30", "_GRAFT_PROPS"))
    assert(!props.contains("graft.renamedColumns"),
      s"rename-back must clear the mapping, got $props")
    spark.sql("ALTER TABLE graft.mart.t30 RENAME COLUMN amt TO amount")
    // refusals: duplicate logical, occupied physical, forged mapping
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t30 RENAME COLUMN tag TO amount"))
    intercept[Exception](spark.sql( // k's physical name is live in files
      "ALTER TABLE graft.mart.t30 RENAME COLUMN tag TO k"))
    val eAmt = intercept[Exception](spark.sql( // amount's OWN physical
      "ALTER TABLE graft.mart.t30 RENAME COLUMN tag TO amt"))
    assert(eAmt.getMessage.contains("physical"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t30 SET TBLPROPERTIES" +
        "('graft.renamedColumns'='amt:stolen')"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t30 UNSET TBLPROPERTIES" +
        "('graft.renamedColumns')"))
    // ADD COLUMN may not occupy a live physical name either
    val eAdd = intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t30 ADD COLUMN amt STRING"))
    assert(eAdd.getMessage.contains("physical"))
    // path-based reads of the catalog dir present the LOGICAL contract
    val byPath = spark.read.format("graft.sources.LakehouseBatchProvider")
      .load(s"$root/mart/t30")
    assert(byPath.schema.fieldNames.toSeq == Seq("k", "amount", "tag"))
    assert(byPath.agg(sum("amount")).head().getDecimal(0) != null)
    // path-based writes bind logical and land physical
    byPath.limit(0).sparkSession.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1000L,
        new java.math.BigDecimal("9.99"), "fresh")),
      spark.table("graft.mart.t30").schema)
      .write.format("graft.sources.LakehouseBatchProvider")
      .mode("append").save(s"$root/mart/t30")
    assert(spark.sql("SELECT tag FROM graft.mart.t30 WHERE k = 1000")
      .head().getString(0) == "fresh")
    spark.sql("DROP TABLE graft.mart.t30")
  }

  test("ALTER TABLE DROP COLUMN narrows the contract; re-ADD is gated " +
    "until a full rewrite retires the dropped values") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t20 (k BIGINT, v STRING, tag STRING)")
    spark.sql("INSERT INTO graft.mart.t20 " +
      "SELECT id, concat('v', id), concat('t', id) FROM range(0, 20)")
    spark.sql("ALTER TABLE graft.mart.t20 DROP COLUMN tag")
    // metadata-only: the contract narrowed, the committed delta stayed
    assert(spark.table("graft.mart.t20").schema.fieldNames.toSeq ==
      Seq("k", "v"))
    intercept[Exception](
      spark.sql("SELECT tag FROM graft.mart.t20").collect())
    // re-ADD while pre-drop files are live would resurrect their values
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft.mart.t20 ADD COLUMN tag STRING"))
    assert(e.getMessage.contains("resurrect"))
    // a DIFFERENT name is not gated
    spark.sql("ALTER TABLE graft.mart.t20 ADD COLUMN tag2 STRING")
    // post-drop inserts carry the narrow contract
    spark.sql("INSERT INTO graft.mart.t20 " +
      "SELECT id, concat('v', id), NULL FROM range(20, 30)")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t20")
      .head().getLong(0) == 30L)
    // a FULL rewrite retires the old generations → re-ADD allowed,
    // and the dropped values did NOT come back
    spark.sql("CALL graft.system.compact('mart', 't20', 2, 'k')")
    spark.sql("ALTER TABLE graft.mart.t20 ADD COLUMN tag STRING")
    assert(spark.sql("SELECT count(tag) FROM graft.mart.t20")
      .head().getLong(0) == 0L,
      "re-added column must read NULL, never the pre-drop values")
    spark.sql("INSERT INTO graft.mart.t20 VALUES (100, 'x', NULL, 'fresh')")
    assert(spark.sql("SELECT count(tag) FROM graft.mart.t20")
      .head().getLong(0) == 1L)
    // guards: layout-bearing columns, the last column, and forging or
    // disarming the tombstone property by hand
    spark.sql("CREATE TABLE graft.mart.t20p (k BIGINT, day INT) " +
      "PARTITIONED BY (day)")
    intercept[Exception](
      spark.sql("ALTER TABLE graft.mart.t20p DROP COLUMN day"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t20 SET TBLPROPERTIES" +
        "('graft.droppedColumns'='x:0')"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t20 UNSET TBLPROPERTIES" +
        "('graft.droppedColumns')"))
    spark.sql("DROP TABLE graft.mart.t20")
    spark.sql("DROP TABLE graft.mart.t20p")
  }

  test("renamed columns keep zone-map pruning, aggregate pushdown and " +
    "row-level DML (the physical manifests never went stale)") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t31")
    spark.sql("CREATE TABLE graft.mart.t31 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.mart.t31 SELECT id, id * 10 " +
      "FROM range(0, 4000)")
    spark.sql("ALTER TABLE graft.mart.t31 RENAME COLUMN v TO val")
    // maintenance procedures accept the LOGICAL name and cluster the
    // physical column — the rewrite's zone maps stay keyed physical
    spark.sql("CALL graft.system.zorder('mart', 't31', 8, 'val')")
    val q = spark.sql(
      "SELECT count(*) AS n FROM graft.mart.t31 WHERE val < 400")
    val plan = q.queryExecution.executedPlan.toString
    val m = "files: (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"no file-count marker in plan:\n$plan"))
    assert(m.group(1).toInt < m.group(2).toInt,
      s"filter on the renamed column pruned nothing: ${m.matched}")
    assert(q.head().getLong(0) == 40L)
    // complete aggregate pushdown folds the physical manifests and
    // answers under the logical name
    val agg = spark.sql(
      "SELECT count(*) AS n, min(val) AS lo, max(val) AS hi " +
        "FROM graft.mart.t31")
    assert(agg.queryExecution.executedPlan.toString
      .contains("PushedAggregation"),
      s"metadata aggregate must push:\n${agg.queryExecution.executedPlan}")
    val ar = agg.head()
    assert(ar.getLong(0) == 4000L && ar.getLong(1) == 0L &&
      ar.getLong(2) == 39990L)
    // row-level DML addresses the renamed column in conditions,
    // assignments and MERGE actions
    spark.sql("UPDATE graft.mart.t31 SET val = val + 1 WHERE val = 0")
    assert(spark.sql("SELECT val FROM graft.mart.t31 WHERE k = 0")
      .head().getLong(0) == 1L)
    spark.sql("DELETE FROM graft.mart.t31 WHERE val = 3990") // pushed
    spark.sql("DELETE FROM graft.mart.t31 WHERE pmod(val, 1000) = 730" +
      " AND val > 3000") // arbitrary predicate → command path
    // val = 10·k, so the modular delete hits 3730, 4730 … 39730 = 37 rows
    assert(spark.sql("SELECT count(*) FROM graft.mart.t31")
      .head().getLong(0) == 4000L - 1L - 37L)
    spark.sql("SELECT id AS k2, id * 100 AS nv FROM range(3, 5)")
      .createOrReplaceTempView("t31_src")
    spark.sql("""MERGE INTO graft.mart.t31 t USING t31_src s
      ON t.k = s.k2
      WHEN MATCHED THEN UPDATE SET val = s.nv
      WHEN NOT MATCHED THEN INSERT (k, val) VALUES (s.k2, s.nv)""")
    assert(spark.sql("SELECT sum(val) FROM graft.mart.t31 " +
      "WHERE k IN (3, 4)").head().getLong(0) == 700L)
    // merge-on-read: the DV delta path reads the same physical space
    spark.sql("ALTER TABLE graft.mart.t31 SET TBLPROPERTIES " +
      "('graft.deleteMode' = 'mor')")
    spark.sql("DELETE FROM graft.mart.t31 WHERE val = 3980")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t31 " +
      "WHERE val IN (3980, 3990)").head().getLong(0) == 0L)
    spark.sql("DROP TABLE graft.mart.t31")
  }

  test("ALTER COLUMN TYPE widens: committed narrow files serve under " +
    "the wide contract; metadata pushdown bridges the generations") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t34")
    spark.sql("CREATE TABLE graft.mart.t34 (k BIGINT, cnt INT, " +
      "ratio FLOAT, amt DECIMAL(9,2))")
    spark.sql("INSERT INTO graft.mart.t34 SELECT id, CAST(id AS INT), " +
      "CAST(id / 2.0 AS FLOAT), CAST(id AS DECIMAL(9,2)) " +
      "FROM range(0, 1000)")
    // zone maps recorded under the NARROW type (the pre-widen layout)
    spark.sql("CALL graft.system.zorder('mart', 't34', 4, 'cnt')")
    spark.sql("ALTER TABLE graft.mart.t34 ALTER COLUMN cnt TYPE BIGINT")
    spark.sql("ALTER TABLE graft.mart.t34 ALTER COLUMN ratio TYPE DOUBLE")
    spark.sql("ALTER TABLE graft.mart.t34 ALTER COLUMN amt " +
      "TYPE DECIMAL(18,2)")
    import org.apache.spark.sql.types._
    assert(spark.table("graft.mart.t34").schema.fields.map(_.dataType)
      .toSeq == Seq(LongType, LongType, DoubleType, DecimalType(18, 2)))
    // the narrow generation serves under the wide contract (vectorized
    // widening decode), and values survive exactly
    assert(spark.sql("SELECT sum(cnt) FROM graft.mart.t34")
      .head().getLong(0) == (0L until 1000L).sum)
    assert(spark.sql("SELECT CAST(sum(ratio) AS LONG) " +
      "FROM graft.mart.t34").head().getLong(0) ==
      ((0 until 1000).map(_ / 2.0).sum).toLong)
    // complete MIN/MAX pushdown folds the NARROW stat rows (the
    // pre-widen zorder zone maps) into WIDE answers — the metadata
    // fold crosses the type boundary without reading data
    val agg = spark.sql("SELECT min(cnt) AS lo, max(cnt) AS hi " +
      "FROM graft.mart.t34")
    assert(agg.queryExecution.executedPlan.toString
      .contains("PushedAggregation"),
      s"widened MIN/MAX must still push:\n${agg.queryExecution.executedPlan}")
    val ar = agg.head()
    assert(ar.getLong(0) == 0L && ar.getLong(1) == 999L)
    // a value only the WIDE type can hold lands next to narrow files
    spark.sql("INSERT INTO graft.mart.t34 VALUES " +
      "(9999, 4000000000, 1.5, CAST(12345678901.25 AS DECIMAL(18,2)))")
    assert(spark.sql("SELECT cnt FROM graft.mart.t34 WHERE k = 9999")
      .head().getLong(0) == 4000000000L)
    assert(spark.sql("SELECT max(cnt) FROM graft.mart.t34")
      .head().getLong(0) == 4000000000L)
    // zone-map skipping with a LONG literal over INT-typed stats
    val q = spark.sql(
      "SELECT count(*) AS n FROM graft.mart.t34 WHERE cnt < 100")
    val plan = q.queryExecution.executedPlan.toString
    val mm = "files: (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"no file-count marker in plan:\n$plan"))
    assert(mm.group(1).toInt < mm.group(2).toInt,
      s"narrow zone maps must still cut files: ${mm.matched}")
    assert(q.head().getLong(0) == 100L)
    // row-level DML through the wide contract over narrow files
    spark.sql("UPDATE graft.mart.t34 SET cnt = cnt + 1 WHERE k = 0")
    assert(spark.sql("SELECT cnt FROM graft.mart.t34 WHERE k = 0")
      .head().getLong(0) == 1L)
    spark.sql("DELETE FROM graft.mart.t34 WHERE cnt = 500")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t34")
      .head().getLong(0) == 1000L)
    // refusals: narrowing, non-widening, layout-bearing columns
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t34 ALTER COLUMN k TYPE INT"))
    intercept[Exception](spark.sql( // scale change is NOT a widen
      "ALTER TABLE graft.mart.t34 ALTER COLUMN amt TYPE DECIMAL(18,4)"))
    spark.sql("CREATE TABLE graft.mart.t34p (k BIGINT, day INT) " +
      "PARTITIONED BY (day)")
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t34p ALTER COLUMN day TYPE BIGINT"))
    // widen COMPOSES with rename: the logical name resolves, the
    // physical file keeps narrow bytes under the old name
    spark.sql("ALTER TABLE graft.mart.t34 ADD COLUMN small INT")
    spark.sql("INSERT INTO graft.mart.t34 VALUES " +
      "(10000, 1, 1.0, CAST(1 AS DECIMAL(18,2)), 7)")
    spark.sql("ALTER TABLE graft.mart.t34 RENAME COLUMN small TO tiny")
    spark.sql("ALTER TABLE graft.mart.t34 ALTER COLUMN tiny TYPE BIGINT")
    assert(spark.sql("SELECT tiny FROM graft.mart.t34 WHERE k = 10000")
      .head().getLong(0) == 7L)
    assert(spark.sql("SELECT sum(cnt) FROM graft.mart.t34 WHERE k < 10")
      .head().getLong(0) == (1L until 10L).sum + 1L)
    spark.sql("DROP TABLE graft.mart.t34")
    spark.sql("DROP TABLE graft.mart.t34p")
  }

  test("RENAME COLUMN composes with DROP/ADD: tombstones gate the " +
    "PHYSICAL name; layout-bearing columns rename with the layout " +
    "intact") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t32")
    spark.sql("CREATE TABLE graft.mart.t32 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.mart.t32 SELECT id, concat('v', id) " +
      "FROM range(0, 10)")
    spark.sql("ALTER TABLE graft.mart.t32 RENAME COLUMN v TO val")
    spark.sql("ALTER TABLE graft.mart.t32 ADD COLUMN extra BIGINT")
    spark.sql("ALTER TABLE graft.mart.t32 DROP COLUMN val")
    // the dropped column's PHYSICAL name (v) carries the tombstone:
    // re-adding IT is gated while pre-drop files are live…
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft.mart.t32 ADD COLUMN v STRING"))
    assert(e.getMessage.contains("resurrect"))
    // …but the LOGICAL name points at no committed bytes — free
    spark.sql("ALTER TABLE graft.mart.t32 ADD COLUMN val STRING")
    assert(spark.sql("SELECT count(val) FROM graft.mart.t32")
      .head().getLong(0) == 0L,
      "re-added logical name must not resurrect the renamed bytes")
    // LAYOUT-BEARING columns rename too (round 11 — the q100 refusal
    // lifted): props keep the PHYSICAL name, the Spark-facing reports
    // translate. Pruning must still engage under the new name, the
    // spec still keys new inserts, and DROP of the renamed partition
    // column still refuses (by its physical identity).
    spark.sql("CREATE TABLE graft.mart.t32p (k BIGINT, day INT) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO graft.mart.t32p SELECT id, " +
      "CAST(id % 4 AS INT) FROM range(0, 100)")
    spark.sql("ALTER TABLE graft.mart.t32p RENAME COLUMN day TO d")
    assert(spark.table("graft.mart.t32p").schema.fieldNames.toSeq ==
      Seq("k", "d"))
    spark.sql("INSERT INTO graft.mart.t32p SELECT id, " +
      "CAST(id % 4 AS INT) FROM range(100, 200)")
    val q = spark.sql(
      "SELECT count(*) AS n FROM graft.mart.t32p WHERE d = 2")
    val plan = q.queryExecution.executedPlan.toString
    val m = "files: (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"no file-cut marker post-rename:\n$plan"))
    assert(m.group(1).toInt < m.group(2).toInt,
      s"partition pruning must survive the rename: ${m.matched}")
    assert(q.head().getLong(0) == 50L)
    val ed = intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t32p DROP COLUMN d"))
    assert(ed.getMessage.contains("partition spec"))
    // bloom columns rename; the point-lookup cut survives
    spark.sql("CREATE TABLE graft.mart.t32b (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.bloomColumns' = 'v')")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO graft.mart.t32b SELECT /*+ COALESCE(1) */ id, " +
        s"concat('v', id) FROM range(${i * 50}, ${i * 50 + 50})"))
    spark.sql("ALTER TABLE graft.mart.t32b RENAME COLUMN v TO w")
    val bq = spark.sql(
      "SELECT count(*) AS n FROM graft.mart.t32b WHERE w = 'v120'")
    val bplan = bq.queryExecution.executedPlan.toString
    val bm = "files: (\\d+)/(\\d+)".r.findFirstMatchIn(bplan)
      .getOrElse(fail(s"no file-cut marker on bloom lookup:\n$bplan"))
    assert(bm.group(1).toInt < bm.group(2).toInt,
      s"bloom skipping must survive the rename: ${bm.matched}")
    assert(bq.head().getLong(0) == 1L)
    spark.sql("DROP TABLE graft.mart.t32")
    spark.sql("DROP TABLE graft.mart.t32p")
    spark.sql("DROP TABLE graft.mart.t32b")
  }

  test("DROP COLUMN vs in-flight compaction: the DDL refuses under a " +
    "fresh full intent; a contract change aborts the rewrite pre-marker") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t35")
    spark.sql("CREATE TABLE graft.mart.t35 (k BIGINT, v STRING, " +
      "tag STRING)")
    spark.sql("INSERT INTO graft.mart.t35 SELECT id, concat('v', id), " +
      "concat('t', id) FROM range(0, 20)")
    spark.sql("INSERT INTO graft.mart.t35 SELECT id, concat('v', id), " +
      "concat('t', id) FROM range(20, 40)")
    val lake = new graft.storage.Lakehouse(spark, s"$root/mart")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // (a) DDL side: a fresh uncommitted full intent (an in-flight
    // compact/zorder/overwrite) refuses the drop
    val intent = new org.apache.hadoop.fs.Path(s"$root/mart/t35",
      "_GRAFT_FULL_INTENT_99")
    fs.create(intent, true).close()
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft.mart.t35 DROP COLUMN tag"))
    assert(e.getMessage.contains("in flight"))
    fs.delete(intent, false)
    // (b) the SAME gate serializes a DDL issued while a rewrite's
    // intent is live mid-write: inside the rewrite's window the drop
    // is refused — and the rewrite side's pre-marker fingerprint check
    // (covering the land-before-intent interleaving) aborts the
    // rewrite cleanly, chain untouched
    val versionsBefore = lake.versions("t35")
    val schema = spark.table("graft.mart.t35").schema
    intercept[IllegalArgumentException](
      lake.compact("t35", schema, 2, Seq("k"), keyedCols = false,
        beforeCommit = () => {
          val mid = intercept[Exception](
            spark.sql("ALTER TABLE graft.mart.t35 DROP COLUMN tag"))
          assert(mid.getMessage.contains("in flight"),
            s"mid-rewrite DDL must hit the intent gate: $mid")
          // simulate the land-before-intent interleaving: the
          // procedure's fingerprint check sees a changed contract
          throw new IllegalArgumentException(
            "contract changed under compact")
        }))
    assert(lake.versions("t35") == versionsBefore,
      "an aborted rewrite must leave the commit chain untouched")
    // with no rewrite in flight the drop proceeds
    spark.sql("ALTER TABLE graft.mart.t35 DROP COLUMN tag")
    assert(spark.table("graft.mart.t35").schema.fieldNames.toSeq ==
      Seq("k", "v"))
    spark.sql("CALL graft.system.compact('mart', 't35', 2, 'k')")
    spark.sql("ALTER TABLE graft.mart.t35 ADD COLUMN tag STRING")
    assert(spark.sql("SELECT count(tag) FROM graft.mart.t35")
      .head().getLong(0) == 0L,
      "no pre-drop bytes may resurface through the re-added name")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t35")
      .head().getLong(0) == 40L)
    spark.sql("DROP TABLE graft.mart.t35")
  }

  test("CALL pack folds small files through a REWRITE commit — never " +
    "a FULL — and respects masks and partition layouts") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t37")
    spark.sql("CREATE TABLE graft.mart.t37 (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.deleteMode' = 'mor')")
    (0 until 6).foreach { i =>
      spark.sql(s"INSERT INTO graft.mart.t37 SELECT id, " +
        s"concat('v', id) FROM range(${i * 50}, ${i * 50 + 50})")
    }
    // a MoR delete's DV masks fold into the pack for free
    spark.sql("DELETE FROM graft.mart.t37 WHERE k % 10 = 0")
    val lake = new graft.storage.Lakehouse(spark, s"$root/mart")
    val versionsBefore = lake.versions("t37").size
    val expect = spark.sql("SELECT sum(k) FROM graft.mart.t37")
      .head().getLong(0)
    spark.sql("CALL graft.system.pack('mart', 't37', 10, 128)")
    val vs = lake.versions("t37")
    assert(vs.size == versionsBefore + 1,
      s"pack must land ONE rewrite commit: $vs")
    assert(vs.forall(!_._2), s"pack must never commit a FULL: $vs")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t37")
      .head().getLong(0) == 300L - 30L)
    assert(spark.sql("SELECT sum(k) FROM graft.mart.t37")
      .head().getLong(0) == expect,
      "packed content must equal the masked pre-pack content")
    // re-packing the lone packed output would loop forever — no-op
    spark.sql("CALL graft.system.pack('mart', 't37', 10, 128)")
    assert(lake.versions("t37").size == versionsBefore + 1,
      "a second pack with nothing to fold must commit nothing")
    // partitioned table: the pack re-clusters by the table's specs, so
    // partition pruning (and the layout proof) survive
    spark.sql("DROP TABLE IF EXISTS graft.mart.t37p")
    spark.sql("CREATE TABLE graft.mart.t37p (k BIGINT, day INT) " +
      "PARTITIONED BY (day)")
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO graft.mart.t37p SELECT id, " +
        s"CAST(id % 4 AS INT) FROM range(${i * 100}, ${i * 100 + 100})")
    }
    spark.sql("CALL graft.system.pack('mart', 't37p', 10, 128)")
    val q = spark.sql(
      "SELECT count(*) AS n FROM graft.mart.t37p WHERE day = 2")
    val plan = q.queryExecution.executedPlan.toString
    val m = "files: (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"no file-count marker in plan:\n$plan"))
    assert(m.group(1).toInt < m.group(2).toInt,
      s"partition pruning must survive the pack: ${m.matched}")
    assert(q.head().getLong(0) == 100L)
    // CONVERGENCE: the clustered pack left one (small) file per day
    // key — a second pack must fold NOTHING (each output is the sole
    // small file of its key), not re-copy the whole table forever
    val vP = lake.versions("t37p").size
    spark.sql("CALL graft.system.pack('mart', 't37p', 10, 128)")
    assert(lake.versions("t37p").size == vP,
      "a second pack of a spec-clustered table must be a no-op: " +
        "per-key sole small files cannot fold with anything")
    // ...but NEW small files sharing a key with the packed outputs
    // re-qualify the pair, so a standing pack job still consolidates
    spark.sql("INSERT INTO graft.mart.t37p SELECT id, " +
      "CAST(id % 4 AS INT) FROM range(400, 500)")
    spark.sql("CALL graft.system.pack('mart', 't37p', 10, 128)")
    assert(lake.versions("t37p").size == vP + 2,
      "a pack after fresh small appends must fold them")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t37p")
      .head().getLong(0) == 500L)
    spark.sql("DROP TABLE graft.mart.t37")
    spark.sql("DROP TABLE graft.mart.t37p")
  }

  test("CHECK constraints: validated at ADD, enforced on inserts and " +
    "DML, refusals guard the managed surface") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t38")
    spark.sql("CREATE TABLE graft.mart.t38 (k BIGINT, amt DECIMAL(18,2))")
    spark.sql("INSERT INTO graft.mart.t38 SELECT id, " +
      "CAST(id + 1 AS DECIMAL(18,2)) FROM range(0, 20)")
    // ADD validates existing rows: a violating table refuses
    val bad = intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t38 ADD CONSTRAINT big CHECK (amt > 100)"))
    assert(bad.getMessage.contains("violate"))
    spark.sql(
      "ALTER TABLE graft.mart.t38 ADD CONSTRAINT pos CHECK (amt > 0)")
    // INSERT enforcement (a violating row fails the write; nothing
    // lands)
    val versionsBefore = new graft.storage.Lakehouse(spark,
      s"$root/mart").versions("t38").size
    intercept[Exception](spark.sql(
      "INSERT INTO graft.mart.t38 VALUES (100, CAST(-5 AS DECIMAL(18,2)))"))
    assert(new graft.storage.Lakehouse(spark, s"$root/mart")
      .versions("t38").size == versionsBefore,
      "a refused insert must commit nothing")
    // NULL passes (SQL-standard CHECK semantics)
    spark.sql("INSERT INTO graft.mart.t38 VALUES (101, NULL)")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t38")
      .head().getLong(0) == 21L)
    // DML post-images enforce too (UPDATE / MERGE run through the
    // engine's own commands, not Spark's write analysis)
    intercept[Exception](spark.sql(
      "UPDATE graft.mart.t38 SET amt = CAST(-1 AS DECIMAL(18,2)) " +
        "WHERE k = 5"))
    assert(spark.sql("SELECT amt FROM graft.mart.t38 WHERE k = 5")
      .head().getDecimal(0).longValue == 6L,
      "a refused UPDATE must change nothing")
    spark.sql("SELECT 5 AS sk, CAST(-9 AS DECIMAL(18,2)) AS samt")
      .createOrReplaceTempView("t38_src")
    intercept[Exception](spark.sql(
      """MERGE INTO graft.mart.t38 t USING t38_src s ON t.k = s.sk
        WHEN MATCHED THEN UPDATE SET amt = s.samt"""))
    intercept[Exception](spark.sql(
      """MERGE INTO graft.mart.t38 t USING t38_src s ON t.k = -1
        WHEN NOT MATCHED THEN INSERT (k, amt) VALUES (s.sk, s.samt)"""))
    // valid DML passes
    spark.sql("UPDATE graft.mart.t38 SET amt = amt + 1 WHERE k = 5")
    assert(spark.sql("SELECT amt FROM graft.mart.t38 WHERE k = 5")
      .head().getDecimal(0).longValue == 7L)
    // merge-on-read flavors enforce the same predicates
    spark.sql("ALTER TABLE graft.mart.t38 SET TBLPROPERTIES " +
      "('graft.deleteMode' = 'mor')")
    intercept[Exception](spark.sql(
      "UPDATE graft.mart.t38 SET amt = CAST(-2 AS DECIMAL(18,2)) " +
        "WHERE k = 6"))
    assert(spark.sql("SELECT amt FROM graft.mart.t38 WHERE k = 6")
      .head().getDecimal(0).longValue == 7L)
    // managed surface: forging/disarming by hand refuses; DROP/RENAME
    // of a referenced column refuses; DROP CONSTRAINT re-opens both
    intercept[Exception](spark.sql("ALTER TABLE graft.mart.t38 " +
      "SET TBLPROPERTIES ('graft.check.evil' = 'amt < 0')"))
    intercept[Exception](spark.sql("ALTER TABLE graft.mart.t38 " +
      "UNSET TBLPROPERTIES ('graft.check.pos')"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t38 DROP COLUMN amt"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t38 RENAME COLUMN amt TO total"))
    spark.sql("ALTER TABLE graft.mart.t38 DROP CONSTRAINT pos")
    spark.sql("ALTER TABLE graft.mart.t38 RENAME COLUMN amt TO total")
    spark.sql("INSERT INTO graft.mart.t38 VALUES " +
      "(102, CAST(-5 AS DECIMAL(18,2)))")
    // constraints compose with RENAME: the predicate binds the current
    // logical contract
    intercept[Exception](spark.sql("ALTER TABLE graft.mart.t38 " +
      "ADD CONSTRAINT pos2 CHECK (total > 0)")) // -5 row violates
    spark.sql("DELETE FROM graft.mart.t38 WHERE total < 0")
    spark.sql("ALTER TABLE graft.mart.t38 " +
      "ADD CONSTRAINT pos2 CHECK (total > 0)")
    intercept[Exception](spark.sql(
      "INSERT INTO graft.mart.t38 VALUES (103, CAST(-1 AS DECIMAL(18,2)))"))
    spark.sql("DROP TABLE graft.mart.t38")
    // NOT NULL: inserts enforce via Spark's own resolution; the DML
    // commands enforce on their post-images
    spark.sql("DROP TABLE IF EXISTS graft.mart.t39")
    spark.sql("CREATE TABLE graft.mart.t39 (k BIGINT NOT NULL, v STRING)")
    spark.sql("INSERT INTO graft.mart.t39 VALUES (1, 'a'), (2, 'b')")
    intercept[Exception](spark.sql(
      "INSERT INTO graft.mart.t39 VALUES (CAST(NULL AS BIGINT), 'c')"))
    intercept[Exception](spark.sql(
      "UPDATE graft.mart.t39 SET k = NULL WHERE v = 'a'"))
    assert(spark.sql("SELECT k FROM graft.mart.t39 WHERE v = 'a'")
      .head().getLong(0) == 1L, "a refused UPDATE must change nothing")
    spark.sql("SELECT 'd' AS sv").createOrReplaceTempView("t39_src")
    intercept[Exception](spark.sql(
      """MERGE INTO graft.mart.t39 t USING t39_src s ON t.v = s.sv
        WHEN NOT MATCHED THEN INSERT (v) VALUES (s.sv)"""))
    assert(spark.sql("SELECT count(*) FROM graft.mart.t39")
      .head().getLong(0) == 2L)
    spark.sql("DROP TABLE graft.mart.t39")
  }

  test("CHECK constraints bind at EXECUTION time: a DML command built " +
    "before ADD CONSTRAINT enforces it, and a dropped constraint stops " +
    "enforcing — the stale-handle write race") {
    init()
    import org.apache.spark.sql.functions._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t40")
    spark.sql("CREATE TABLE graft.mart.t40 (k BIGINT, amt BIGINT)")
    spark.sql("INSERT INTO graft.mart.t40 VALUES (1, 5), (2, 6)")
    val contract = spark.table("graft.mart.t40").schema
    // the command object is the analysis-time artifact — built while
    // the table carries NO constraint (a concurrent writer's stale
    // handle), run AFTER the constraint landed
    val cmd = GraftUpdateCommand(s"$root/mart/t40", contract,
      col("k") === 1, Seq("amt" -> lit(-1L)), cdf = false)
    spark.sql(
      "ALTER TABLE graft.mart.t40 ADD CONSTRAINT pos CHECK (amt > 0)")
    val e = intercept[Exception](cmd.run(spark))
    assert(e.toString.contains("pos") ||
      Option(e.getCause).exists(_.toString.contains("pos")) ||
      e.getMessage != null && e.getMessage.contains("pos"),
      s"the stale-handle UPDATE must fail on the NEW constraint: $e")
    assert(spark.sql("SELECT amt FROM graft.mart.t40 WHERE k = 1")
      .head().getLong(0) == 5L, "the refused UPDATE must land nothing")
    // ...and the converse: a handle that SAW the constraint stops
    // enforcing once it is dropped — no phantom enforcement
    spark.sql("ALTER TABLE graft.mart.t40 DROP CONSTRAINT pos")
    cmd.run(spark)
    assert(spark.sql("SELECT amt FROM graft.mart.t40 WHERE k = 1")
      .head().getLong(0) == -1L,
      "after DROP CONSTRAINT the same command must apply")
    // rename-mapping delimiters are refused everywhere a column name
    // is minted: a ':' or ',' name would corrupt graft.renamedColumns
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t40 RENAME COLUMN amt TO `a:b`"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t40 RENAME COLUMN amt TO `a,b`"))
    intercept[Exception](spark.sql(
      "CREATE TABLE graft.mart.t40bad (`x:y` BIGINT)"))
    spark.sql("DROP TABLE graft.mart.t40")
  }

  test("nested struct evolution: ADD null-fills old generations, DROP " +
    "narrows, the dotted tombstone gates re-adds until a full retires " +
    "pre-drop files, row-decoder surfaces refuse structs") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t41")
    spark.sql("CREATE TABLE graft.mart.t41 " +
      "(k BIGINT, p STRUCT<a: BIGINT, b: STRING>)")
    spark.sql("INSERT INTO graft.mart.t41 SELECT id, " +
      "named_struct('a', id * 2, 'b', concat('x', id)) FROM range(0, 10)")
    spark.sql("ALTER TABLE graft.mart.t41 ADD COLUMN p.q INT")
    spark.sql("INSERT INTO graft.mart.t41 SELECT id, " +
      "named_struct('a', id * 2, 'b', concat('y', id), " +
      "'q', CAST(id AS INT)) FROM range(10, 20)")
    val r = spark.sql("SELECT count(*), sum(p.a), count(p.q), sum(p.q) " +
      "FROM graft.mart.t41").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((20L, 380L, 10L, 145L)),
      s"old generations must null-fill the added nested field: $r")
    // MoR deletion vectors are positional — they compose with structs
    spark.sql("ALTER TABLE graft.mart.t41 SET TBLPROPERTIES " +
      "('graft.deleteMode' = 'mor')")
    spark.sql("DELETE FROM graft.mart.t41 WHERE k % 5 = 0")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t41")
      .head().getLong(0) == 16L)
    // DROP narrows; re-add refuses over live pre-drop files; a FULL
    // (compact) retires them and re-opens the name
    spark.sql("ALTER TABLE graft.mart.t41 DROP COLUMN p.b")
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t41 ADD COLUMN p.b STRING"))
    assert(e.getMessage.contains("resurrect"), e.getMessage)
    spark.sql("CALL graft.system.compact('mart', 't41', 1, '')")
    spark.sql("ALTER TABLE graft.mart.t41 ADD COLUMN p.b STRING")
    assert(spark.sql("SELECT count(p.b) FROM graft.mart.t41")
      .head().getLong(0) == 0L,
      "the re-added nested field must not resurrect pre-drop bytes")
    // round 12: the row-decoder surfaces accept one-level structs
    // (decodeGroupField recurses — s23 drives the CDF stream end to
    // end); deeper nesting still refuses on every surface
    graft.sources.LakehouseStream.validateSchema(
      spark.table("graft.mart.t41").schema)
    spark.sql("DROP TABLE graft.mart.t41")
  }

  test("nested RENAME + WIDEN (round-12): dotted name-mode mapping " +
    "relabels struct leaves across generations; per-file adapters " +
    "widen nested leaves; refusal ladder holds") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t42")
    spark.sql("CREATE TABLE graft.mart.t42 " +
      "(k BIGINT, p STRUCT<a: INT, b: STRING>)")
    spark.sql("INSERT INTO graft.mart.t42 SELECT id, " +
      "named_struct('a', CAST(id AS INT), 'b', concat('x', id)) " +
      "FROM range(0, 10)")
    // RENAME: old generation's physical `a` serves under logical `qty`
    spark.sql("ALTER TABLE graft.mart.t42 RENAME COLUMN p.a TO qty")
    assert(spark.table("graft.mart.t42").schema("p").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("qty", "b"), "presented inner names")
    // WIDEN the renamed field: INT -> BIGINT
    spark.sql("ALTER TABLE graft.mart.t42 ALTER COLUMN p.qty TYPE BIGINT")
    // new generation writes under the LOGICAL name + wide type;
    // physically lands as `a` so both generations fuse by name
    spark.sql("INSERT INTO graft.mart.t42 SELECT id, " +
      "named_struct('qty', id * 10, 'b', concat('y', id)) " +
      "FROM range(10, 20)")
    val r = spark.sql("SELECT count(*), sum(p.qty), " +
      "count(CASE WHEN p.qty >= 100 THEN 1 END) " +
      "FROM graft.mart.t42").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((20L, 45L + 1450L, 10L)),
      s"both generations must serve the renamed+widened leaf: $r")
    // filter on the renamed nested field — crosses the rename boundary
    assert(spark.sql(
      "SELECT count(*) FROM graft.mart.t42 WHERE p.qty = 5").head()
      .getLong(0) == 1L, "nested filter on renamed leaf")
    // UPDATE through the logical name (DML boundary translation)
    spark.sql("UPDATE graft.mart.t42 SET k = k + 100 " +
      "WHERE p.qty = 110")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t42 " +
      "WHERE k = 111").head().getLong(0) == 1L,
      "DML predicate on renamed nested leaf")
    // refusal ladder: collision with sibling logical name; collision
    // with a sibling PHYSICAL name; rename of a non-struct; deep paths
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t42 RENAME COLUMN p.qty TO b"))
    spark.sql("ALTER TABLE graft.mart.t42 RENAME COLUMN p.b TO label")
    intercept[Exception](spark.sql(
      // `b` is now label's PHYSICAL name — occupying it would fuse
      "ALTER TABLE graft.mart.t42 RENAME COLUMN p.qty TO b"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t42 ALTER COLUMN p.label TYPE BIGINT"))
    // rename BACK retires the mapping entry
    spark.sql("ALTER TABLE graft.mart.t42 RENAME COLUMN p.label TO b")
    // DROP of a renamed field retires its mapping + tombstones the
    // physical path
    spark.sql("ALTER TABLE graft.mart.t42 DROP COLUMN p.qty")
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t42 ADD COLUMN p.a INT")) // phys tombstone
    assert(spark.table("graft.mart.t42").schema("p").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("b"))
    spark.sql("DROP TABLE graft.mart.t42")
  }

  test("ALTER TABLE RENAME TO moves the table identity; the commit " +
    "chain and every manifest move with it") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t36")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t36renamed")
    spark.sql("CREATE TABLE graft.mart.t36 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.mart.t36 SELECT id, concat('v', id) " +
      "FROM range(0, 25)")
    spark.sql("ALTER TABLE graft.mart.t36 RENAME TO mart.t36renamed")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t36renamed")
      .head().getLong(0) == 25L)
    intercept[Exception](
      spark.sql("SELECT count(*) FROM graft.mart.t36").collect())
    // DML and maintenance keep working on the new identity
    spark.sql("DELETE FROM graft.mart.t36renamed WHERE k < 5")
    spark.sql("CALL graft.system.compact('mart', 't36renamed', 2, 'k')")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t36renamed")
      .head().getLong(0) == 20L)
    // refusals: target exists / missing source
    spark.sql("CREATE TABLE graft.mart.t36other (k BIGINT)")
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.t36renamed RENAME TO mart.t36other"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.mart.nope RENAME TO mart.whatever"))
    spark.sql("DROP TABLE graft.mart.t36renamed")
    spark.sql("DROP TABLE graft.mart.t36other")
  }

  test("TBLPROPERTIES persist; graft.cdf opts SQL DELETE into the feed") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("""CREATE TABLE graft.mart.t11 (k BIGINT, grp STRING)
      TBLPROPERTIES ('graft.cdf' = 'true', 'team' = 'ingest')""")
    val shown = spark.sql("SHOW TBLPROPERTIES graft.mart.t11").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("graft.cdf").contains("true"))
    assert(shown.get("team").contains("ingest"))
    spark.sql("ALTER TABLE graft.mart.t11 SET TBLPROPERTIES " +
      "('retention' = '7d')")
    spark.sql("ALTER TABLE graft.mart.t11 UNSET TBLPROPERTIES ('team')")
    val shown2 = spark.sql("SHOW TBLPROPERTIES graft.mart.t11").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown2.get("retention").contains("7d") && !shown2.contains("team"))
    spark.sql(
      "INSERT INTO graft.mart.t11 SELECT id, concat('g', id % 2) FROM range(0, 10)")
    spark.sql("DELETE FROM graft.mart.t11 WHERE grp = 'g1'")
    // cdf=true → the copy-on-write delete RECORDED its removed rows
    val lake = new graft.storage.Lakehouse(spark, s"$root/mart")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType)))
    val v = lake.versions("t11").map(_._1).max
    val feed = lake.changeFeed("t11", v - 1, v, schema)
    val deleted = feed.filter(col("_change_type") === "delete")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(deleted == (0L until 10L).filter(_ % 2 == 1L))
    spark.sql("DROP TABLE graft.mart.t11")
  }

  test("PARTITIONED BY clusters inserts; partition filters prune files") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("""CREATE TABLE graft.mart.t12 (k BIGINT, day INT, v STRING)
      PARTITIONED BY (day)""")
    // the declared partitioning round-trips through the catalog
    assert(spark.sql("DESCRIBE TABLE graft.mart.t12").collect()
      .exists(_.getString(0).contains("Part")), "partitioning not surfaced")
    spark.sql("""INSERT INTO graft.mart.t12
      SELECT id, CAST(id % 8 AS INT), concat('v', id) FROM range(0, 4000)""")
    val q = spark.sql("SELECT count(*) AS n, sum(k) AS s " +
      "FROM graft.mart.t12 WHERE day = 3")
    val plan = q.queryExecution.executedPlan.toString
    val m = "files: (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"no file-count marker in plan:\n$plan"))
    assert(m.group(1).toInt < m.group(2).toInt,
      s"partition filter pruned nothing: ${m.matched}")
    val r = q.head()
    assert(r.getLong(0) == 500L)
    assert(r.getLong(1) == (0L until 4000L).filter(_ % 8 == 3).sum)
    // partition pruning SURVIVES row-level DML: the UPDATE and DELETE
    // rewrites re-cluster on the partition columns and rewrite their
    // zone maps (not just stay correct until the next compact)
    spark.sql("UPDATE graft.mart.t12 SET v = concat(v, '!') WHERE day = 5")
    spark.sql("DELETE FROM graft.mart.t12 WHERE k % 100 = 7")
    val q2 = spark.sql(
      "SELECT count(*) AS n FROM graft.mart.t12 WHERE day = 3")
    val m2 = "files: (\\d+)/(\\d+)".r
      .findFirstMatchIn(q2.queryExecution.executedPlan.toString)
      .getOrElse(fail("no file-count marker post-DML"))
    assert(m2.group(1).toInt < m2.group(2).toInt,
      s"pruning lost after DML: ${m2.matched}")
    assert(q2.head().getLong(0) ==
      (0L until 4000L).count(k => k % 8 == 3 && k % 100 != 7))
    // non-identity transforms are refused at CREATE
    intercept[Exception](spark.sql(
      "CREATE TABLE graft.mart.t13 (k BIGINT, d DATE) PARTITIONED BY (days(d))"))
    spark.sql("DROP TABLE graft.mart.t12")
  }

  test("SQL views: create, compose, rename, drop") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.vt (k BIGINT, grp STRING, amt DOUBLE)")
    spark.sql("""INSERT INTO graft.mart.vt
      SELECT id, concat('g', id % 3), CAST(id AS DOUBLE) FROM range(0, 30)""")
    spark.sql("""CREATE VIEW graft.mart.v1 AS
      SELECT grp, sum(amt) AS amt_sum, count(*) AS n
      FROM graft.mart.vt GROUP BY grp""")
    val got = spark.sql(
      "SELECT grp, amt_sum, n FROM graft.mart.v1 ORDER BY grp").collect()
    assert(got.length == 3 && got.map(_.getLong(2)).sum == 30L)
    // views compose: a view over a view
    spark.sql("""CREATE VIEW graft.mart.v2 AS
      SELECT sum(amt_sum) AS total FROM graft.mart.v1""")
    assert(spark.sql("SELECT total FROM graft.mart.v2").head().getDouble(0)
      == (0 until 30).sum.toDouble)
    // the view tracks the TABLE's current data, not a snapshot
    spark.sql("INSERT INTO graft.mart.vt VALUES (100, 'g0', 1000.0)")
    assert(spark.sql("SELECT total FROM graft.mart.v2").head().getDouble(0)
      == (0 until 30).sum.toDouble + 1000.0)
    assert(spark.sql("SHOW VIEWS IN graft.mart").collect()
      .map(_.getString(1)).toSet == Set("v1", "v2"))
    // tables and views stay distinct listings
    assert(spark.sql("SHOW TABLES IN graft.mart").collect()
      .map(_.getString(1)).contains("vt"))
    spark.sql("ALTER VIEW graft.mart.v2 RENAME TO graft.mart.v2r")
    assert(spark.sql("SELECT total FROM graft.mart.v2r").head().getDouble(0)
      > 0)
    spark.sql("DROP VIEW graft.mart.v2r")
    spark.sql("DROP VIEW graft.mart.v1")
    assert(spark.sql("SHOW VIEWS IN graft.mart").collect().isEmpty)
    spark.sql("DROP TABLE graft.mart.vt")
  }

  test("CALL analyze persists column stats; the CBO sees them") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t14 (k BIGINT, grp STRING, amt DOUBLE)")
    spark.sql("""INSERT INTO graft.mart.t14
      SELECT id, concat('g', id % 7), CAST(id AS DOUBLE) / 3
      FROM range(0, 5000)""")
    spark.sql("CALL graft.system.analyze('mart', 't14')")
    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      val df = spark.sql(
        "SELECT grp, sum(amt) FROM graft.mart.t14 WHERE k < 100 GROUP BY grp")
      val stats = df.queryExecution.optimizedPlan.collectLeaves()
        .head.stats
      assert(stats.attributeStats.nonEmpty,
        "analyze stats must reach the optimizer as attribute stats")
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      // HLL NDV lands near the exact counts; min/max exact
      assert(byName("k").distinctCount.exists(n =>
        n.toLong > 4000 && n.toLong < 6000), byName("k").toString)
      assert(byName("grp").distinctCount.exists(_.toLong == 7L),
        byName("grp").toString)
      assert(byName("k").min.contains(0L) &&
        byName("k").max.contains(4999L), byName("k").toString)
      assert(byName("k").nullCount.exists(_ == 0), byName("k").toString)
    }
    spark.sql("DROP TABLE graft.mart.t14")
  }

  test("graft.autoCompact folds the delta chain inline after INSERT") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("""CREATE TABLE graft.mart.t15 (k BIGINT, day INT)
      PARTITIONED BY (day)
      TBLPROPERTIES ('graft.autoCompact' = '3',
                     'graft.autoCompact.numFiles' = '2')""")
    val lake = new graft.storage.Lakehouse(spark, s"$root/mart")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO graft.mart.t15 " +
        s"SELECT id, CAST(id % 4 AS INT) FROM range(${i * 100}, ${i * 100 + 100})")
    }
    // third insert crossed the threshold → one FULL commit that
    // shadowed (and reclaimed) the three-delta chain
    val vs = lake.versions("t15")
    assert(vs == Seq((4L, true)),
      s"auto-compact must fold the chain into one FULL commit: $vs")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t15")
      .head().getLong(0) == 300L)
    // the rewrite re-established partition clustering: day filter prunes
    val q = spark.sql("SELECT sum(k) FROM graft.mart.t15 WHERE day = 2")
    val m = "files: (\\d+)/(\\d+)".r
      .findFirstMatchIn(q.queryExecution.executedPlan.toString).get
    assert(m.group(1).toInt < m.group(2).toInt, m.matched)
    assert(q.head().getLong(0) ==
      (0L until 300L).filter(_ % 4 == 2).sum)
    spark.sql("DROP TABLE graft.mart.t15")
  }

  test("write-audit-publish via SQL: stage, audit view, publish/discard") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t16 (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO graft.mart.t16 SELECT id, concat('v', id) FROM range(0, 10)")
    spark.sql("""CALL graft.system.stage_branch('mart', 't16', 'audit1',
      'SELECT id AS k, concat(''s'', id) AS v FROM range(100, 110)')""")
    // staged rows are invisible to plain readers…
    assert(spark.sql("SELECT count(*) FROM graft.mart.t16")
      .head().getLong(0) == 10L)
    // …but the audit view serves live + staged
    assert(spark.sql(
      "SELECT count(*) FROM graft.mart.t16 VERSION AS OF 'branch:audit1'")
      .head().getLong(0) == 20L)
    // the audit view is read-only
    intercept[Exception](spark.sql(
      "UPDATE graft.mart.t16 VERSION AS OF 'branch:audit1' SET k = 0"))
    spark.sql("CALL graft.system.publish_branch('mart', 't16', 'audit1')")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t16")
      .head().getLong(0) == 20L)
    // a second branch, discarded: nothing changes
    spark.sql("""CALL graft.system.stage_branch('mart', 't16', 'bad',
      'SELECT id AS k, ''x'' AS v FROM range(0, 5)')""")
    spark.sql("CALL graft.system.discard_branch('mart', 't16', 'bad')")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t16")
      .head().getLong(0) == 20L)
    spark.sql("DROP TABLE graft.mart.t16")
  }

  test("renamed columns serve the change feed and the streaming source " +
    "under their logical names") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("DROP TABLE IF EXISTS graft.mart.t33")
    spark.sql("CREATE TABLE graft.mart.t33 (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.cdf' = 'true')")
    spark.sql("INSERT INTO graft.mart.t33 SELECT id, concat('v', id) " +
      "FROM range(0, 10)")
    spark.sql("ALTER TABLE graft.mart.t33 RENAME COLUMN v TO label")
    spark.sql("INSERT INTO graft.mart.t33 SELECT id, concat('v', id) " +
      "FROM range(10, 20)")
    // streaming source first (the CoW delete below FULL-rewrites the
    // chain — a fresh stream cannot replay GC'd versions, by contract):
    // logical binding over physically-named files
    val out = tmpDir("t33-out")
    val q = spark.readStream.table("graft.mart.t33")
      .filter(col("label").startsWith("v1"))
      .select("k", "label")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("t33-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == (1L +: (10L until 20L)).sorted,
      s"streamed rows wrong: $got")
    val preDelete = new graft.storage.Lakehouse(spark, s"$root/mart")
      .versions("t33").map(_._1).max
    spark.sql("DELETE FROM graft.mart.t33 WHERE k < 3")
    // batch CDF read binds the LOGICAL schema; the feed files (written
    // physical, pre- and post-rename) relabel positionally. The range
    // covers only the delete — its FULL rewrite GC'd the shadowed
    // insert versions (reading across them is correctly loud).
    import org.apache.spark.sql.types._
    val cdf = spark.read.format("graft.sources.LakehouseBatchProvider")
      .schema(StructType(Seq(StructField("k", LongType),
        StructField("label", StringType),
        StructField("_change_type", StringType))))
      .option("changesFrom", preDelete.toString).load(s"$root/mart/t33")
    val dels = cdf.filter(col("_change_type") === "delete")
      .select("k", "label").collect()
    assert(dels.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(dels.forall(r => r.getString(1) == s"v${r.getLong(0)}"),
      "delete pre-images must carry the renamed column's values")
    spark.sql("DROP TABLE graft.mart.t33")
  }

  test("readStream.table streams a catalog table's commit log by name") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t17 (k BIGINT, v STRING)")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO graft.mart.t17 " +
        s"SELECT id, concat('v', id) FROM range(${i * 10}, ${i * 10 + 10})")
    }
    val ckpt = tmpDir("t17-ckpt")
    val out = tmpDir("t17-out")
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "1")
      .table("graft.mart.t17")
      .filter(col("k") % 2 === 0)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 30L).filter(_ % 2 == 0))
    // a frozen snapshot has no stream
    intercept[Exception] {
      spark.readStream.option("versionAsOf", "1").table("graft.mart.t17")
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("t17-ckpt2"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    spark.sql("DROP TABLE graft.mart.t17")
  }

  test("writeStream.toTable: V2 streaming write, exactly-once epochs") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t18src (k BIGINT, v STRING)")
    spark.sql("CREATE TABLE graft.mart.t18dst (k BIGINT, v STRING)")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO graft.mart.t18src " +
        s"SELECT id, concat('v', id) FROM range(${i * 10}, ${i * 10 + 10})")
    }
    def run(ckpt: String): Unit = {
      val q = spark.readStream
        .option("maxVersionsPerTrigger", "1")
        .table("graft.mart.t18src")
        .filter(col("k") % 3 =!= 1)
        .writeStream
        .option("checkpointLocation", tmpDir(ckpt))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("graft.mart.t18dst")
      q.awaitTermination()
    }
    run("t18-ckpt1")
    // checkpoint destroyed, full replay: every epoch re-stages and the
    // commit recognizes its batch marker — the table must hash as if
    // the stream ran once
    run("t18-ckpt2")
    val got = spark.sql("SELECT k FROM graft.mart.t18dst").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 30L).filter(_ % 3 != 1))
    // the dest is a normal catalog table: SQL reads, metadata counts,
    // and the staged dirs left no debris outside _staging
    assert(spark.sql("SELECT count(*) FROM graft.mart.t18dst")
      .head().getLong(0) == 20L)
    spark.sql("DROP TABLE graft.mart.t18src")
    spark.sql("DROP TABLE graft.mart.t18dst")
  }

  test("dynamic partition overwrite replaces only the incoming partitions") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("""CREATE TABLE graft.mart.t19 (k BIGINT, day INT)
      PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO graft.mart.t19
      SELECT id, CAST(id % 4 AS INT) FROM range(0, 400)""")
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      // incoming batch carries days 1 and 3 only
      spark.sql("""INSERT OVERWRITE graft.mart.t19
        SELECT id + 1000, CAST(1 + 2 * (id % 2) AS INT) FROM range(0, 20)""")
    }
    val byDay = spark.sql(
      "SELECT day, count(*) AS n FROM graft.mart.t19 GROUP BY day")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // days 0/2 untouched (100 rows each); days 1/3 replaced (10 each)
    assert(byDay == Map(0 -> 100L, 2 -> 100L, 1 -> 10L, 3 -> 10L), byDay)
    // STATIC (default) overwrite still replaces the whole table
    spark.sql("""INSERT OVERWRITE graft.mart.t19
      SELECT id, CAST(0 AS INT) FROM range(0, 7)""")
    assert(spark.sql("SELECT count(*) FROM graft.mart.t19")
      .head().getLong(0) == 7L)
    spark.sql("DROP TABLE graft.mart.t19")
  }

  test("commit-protocol safety holds for SQL writers (concurrent inserts)") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mart")
    spark.sql("CREATE TABLE graft.mart.t6 (k BIGINT)")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      (0 until 4).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = spark.sql(
            s"INSERT INTO graft.mart.t6 SELECT id FROM range(${i * 10}, ${i * 10 + 10})")
        })
      }.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(spark.sql("SELECT count(*) FROM graft.mart.t6")
      .head().getLong(0) == 40L)
    spark.sql("DROP TABLE graft.mart.t6")
  }
}

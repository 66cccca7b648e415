package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** SHALLOW CLONE (`CALL graft.system.clone`): zero-copy snapshot
  * references — resolution through the source's pinned dirs, local
  * commit layering, GC/vacuum pin protection on the source, pin
  * release on DROP, and the refusal ladder.
  */
class ShallowCloneSpec extends SparkSpec {

  private lazy val root = tmpDir("graft-clone")

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.gcl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcl.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.m")
  }

  private def fs = new Path(root).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("a clone serves the pinned snapshot, layers DML locally, and " +
    "survives source-side compact + zero-grace vacuum") {
    init()
    spark.sql("DROP TABLE IF EXISTS gcl.m.src")
    spark.sql("DROP TABLE IF EXISTS gcl.m.cl")
    spark.sql("CREATE TABLE gcl.m.src (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gcl.m.src SELECT id, concat('v', id) " +
      "FROM range(0, 50)")
    spark.sql("INSERT INTO gcl.m.src SELECT id, concat('v', id) " +
      "FROM range(50, 100)")
    spark.sql("CALL gcl.system.clone('m', 'src', 'cl')")
    assert(spark.sql("SELECT count(*) FROM gcl.m.cl")
      .head().getLong(0) == 100L, "the clone serves the snapshot")
    // the clone is INDEPENDENT: writes to either side stay invisible
    // to the other
    spark.sql("INSERT INTO gcl.m.cl SELECT id, concat('w', id) " +
      "FROM range(100, 120)")
    spark.sql("DELETE FROM gcl.m.cl WHERE k % 10 = 0")
    spark.sql("INSERT INTO gcl.m.src SELECT id, concat('s', id) " +
      "FROM range(500, 510)")
    assert(spark.sql("SELECT count(*) FROM gcl.m.cl")
      .head().getLong(0) == 120L - 12L,
      "clone DML applies locally; post-clone source commits invisible")
    assert(spark.sql("SELECT count(*) FROM gcl.m.src")
      .head().getLong(0) == 110L,
      "clone DML must not leak into the source")
    // source-side compact (GC reclaims shadowed dirs, zero grace) and
    // zero-grace vacuum must keep the PINNED versions alive
    spark.sql("CALL gcl.system.compact('m', 'src', 1, '')")
    withSQLConf("spark.graft.vacuumGraceMs" -> "0") {
      spark.sql("CALL gcl.system.vacuum('m', 'src')")
    }
    assert(spark.sql("SELECT count(*) FROM gcl.m.cl")
      .head().getLong(0) == 108L,
      "the clone still serves after source compact + vacuum")
    // DROP of the clone releases the pin; the next zero-grace vacuum
    // reclaims the previously protected versions
    val pins = fs.listStatus(new Path(s"$root/m/src")).toSeq.map(
      _.getPath.getName).filter(_.startsWith("_GRAFT_CLONE_PIN_"))
    assert(pins.size == 1, s"one live pin expected: $pins")
    spark.sql("DROP TABLE gcl.m.cl")
    val pinsAfter = fs.listStatus(new Path(s"$root/m/src")).toSeq.map(
      _.getPath.getName).filter(_.startsWith("_GRAFT_CLONE_PIN_"))
    assert(pinsAfter.isEmpty, "DROP TABLE must release the clone pin")
    withSQLConf("spark.graft.vacuumGraceMs" -> "0") {
      spark.sql("CALL gcl.system.vacuum('m', 'src')")
    }
    val dirs = fs.listStatus(new Path(s"$root/m/src")).toSeq.map(
      _.getPath.getName).filter(_.startsWith("_v"))
    assert(dirs.size <= 2,
      s"released versions must be reclaimable: $dirs")
    assert(spark.sql("SELECT count(*) FROM gcl.m.src")
      .head().getLong(0) == 110L)
    spark.sql("DROP TABLE gcl.m.src")
  }

  test("VERSION AS OF clones pin a past snapshot; clone-of-clone and " +
    "existing-name refuse; a clone full-commit never touches source " +
    "dirs") {
    init()
    spark.sql("DROP TABLE IF EXISTS gcl.m.s2")
    spark.sql("DROP TABLE IF EXISTS gcl.m.c2")
    spark.sql("DROP TABLE IF EXISTS gcl.m.c3")
    spark.sql("CREATE TABLE gcl.m.s2 (k BIGINT)")
    spark.sql("INSERT INTO gcl.m.s2 SELECT id FROM range(0, 10)")
    spark.sql("INSERT INTO gcl.m.s2 SELECT id FROM range(10, 30)")
    // pin at version 1 (the first insert only)
    spark.sql("CALL gcl.system.clone('m', 's2', 'c2', 1)")
    assert(spark.sql("SELECT count(*) FROM gcl.m.c2")
      .head().getLong(0) == 10L, "VERSION AS OF pins the past snapshot")
    intercept[Exception](
      spark.sql("CALL gcl.system.clone('m', 'c2', 'c3')")) // of a clone
    intercept[Exception](
      spark.sql("CALL gcl.system.clone('m', 's2', 'c2')")) // name taken
    // a local FULL (CoW UPDATE) on the clone must leave the source's
    // version dirs untouched and fully shadow the pinned snapshot
    val srcDirs = fs.listStatus(new Path(s"$root/m/s2")).toSeq
      .filter(_.getPath.getName.startsWith("_v"))
      .map(st => (st.getPath.getName, st.getModificationTime)).toSet
    spark.sql("UPDATE gcl.m.c2 SET k = k + 100 WHERE k < 5")
    assert(fs.listStatus(new Path(s"$root/m/s2")).toSeq
      .filter(_.getPath.getName.startsWith("_v"))
      .map(st => (st.getPath.getName, st.getModificationTime))
      .toSet == srcDirs,
      "a clone's full commit must never move or GC source dirs")
    assert(spark.sql("SELECT sum(k) FROM gcl.m.c2")
      .head().getLong(0) == (0L until 10L).sum + 5L * 100L)
    spark.sql("DROP TABLE gcl.m.c2")
    spark.sql("DROP TABLE gcl.m.s2")
  }

  test("clones compose with merge-on-read masks: pinned DV deltas " +
    "mask the clone's reads; new clone-side MoR deletes stay local") {
    init()
    spark.sql("DROP TABLE IF EXISTS gcl.m.s3")
    spark.sql("DROP TABLE IF EXISTS gcl.m.c4")
    spark.sql("CREATE TABLE gcl.m.s3 (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.deleteMode' = 'mor')")
    spark.sql("INSERT INTO gcl.m.s3 SELECT id, concat('v', id) " +
      "FROM range(0, 40)")
    spark.sql("DELETE FROM gcl.m.s3 WHERE k % 4 = 0") // DV delta
    spark.sql("CALL gcl.system.clone('m', 's3', 'c4')")
    assert(spark.sql("SELECT count(*) FROM gcl.m.c4")
      .head().getLong(0) == 30L,
      "the pinned DV masks apply to the clone's reads")
    spark.sql("DELETE FROM gcl.m.c4 WHERE k % 4 = 1") // local DV delta
    assert(spark.sql("SELECT count(*) FROM gcl.m.c4")
      .head().getLong(0) == 20L)
    assert(spark.sql("SELECT count(*) FROM gcl.m.s3")
      .head().getLong(0) == 30L,
      "a clone-side DV must not mask the source")
    spark.sql("DROP TABLE gcl.m.c4")
    spark.sql("DROP TABLE gcl.m.s3")
  }

  test("RENAME TO refuses on both sides of a clone relationship — the " +
    "pin/ref files record absolute paths a rename would dangle") {
    init()
    spark.sql("DROP TABLE IF EXISTS gcl.m.s5")
    spark.sql("DROP TABLE IF EXISTS gcl.m.c5")
    spark.sql("CREATE TABLE gcl.m.s5 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gcl.m.s5 SELECT id, concat('v', id) " +
      "FROM range(0, 20)")
    spark.sql("CALL gcl.system.clone('m', 's5', 'c5')")
    // renaming the CLONE would orphan the source-side pin (vacuum's
    // orphan-pin reclaim checks the recorded clone path) — refused
    val e1 = intercept[Exception](
      spark.sql("ALTER TABLE gcl.m.c5 RENAME TO m.c5r"))
    assert(e1.getMessage.contains("shallow clone"), e1.getMessage)
    // renaming the SOURCE would dangle every clone's src= path — refused
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE gcl.m.s5 RENAME TO m.s5r"))
    assert(e2.getMessage.contains("live shallow clones"), e2.getMessage)
    // both still read; DROP of the clone releases the pin, after which
    // the source renames normally
    assert(spark.sql("SELECT count(*) FROM gcl.m.c5")
      .head().getLong(0) == 20L)
    spark.sql("DROP TABLE gcl.m.c5")
    spark.sql("ALTER TABLE gcl.m.s5 RENAME TO m.s5r")
    assert(spark.sql("SELECT count(*) FROM gcl.m.s5r")
      .head().getLong(0) == 20L)
    spark.sql("DROP TABLE gcl.m.s5r")
  }
}

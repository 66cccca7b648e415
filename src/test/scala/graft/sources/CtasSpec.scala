package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Atomic CTAS / RTAS through the StagingTableCatalog SPI: the
  * AS-SELECT writes into a hidden staged generation; publish is a
  * rename (CREATE) or a journaled two-rename swap (REPLACE) that heals
  * on the next load after a crash.
  */
class CtasSpec extends SparkSpec {

  private lazy val root = tmpDir("graft-ctas")

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graftctas", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftctas.root", root)
    // crash-simulation tests need the heal/reclaim to fire immediately;
    // the grace-window tests below restore the defaults themselves
    spark.conf.set("spark.graft.swapGraceMs", "0")
    spark.conf.set("spark.graft.vacuumGraceMs", "0")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftctas.ct")
  }

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nsLs: Seq[String] =
    fs.listStatus(new Path(root, "ct")).map(_.getPath.getName).toSeq

  test("CREATE TABLE AS SELECT publishes atomically, no staged debris") {
    init()
    spark.sql("""CREATE TABLE graftctas.ct.t1 AS
      SELECT id AS k, id * 2 AS v FROM range(0, 100)""")
    assert(spark.sql("SELECT count(*), sum(v) FROM graftctas.ct.t1")
      .head().toSeq == Seq(100L, 9900L))
    assert(!nsLs.exists(_.startsWith("_stage_")), nsLs)
    // CTAS into an existing table fails and leaves it untouched
    intercept[Exception] {
      spark.sql("CREATE TABLE graftctas.ct.t1 AS SELECT 1 AS x")
    }
    assert(spark.table("graftctas.ct.t1").count() == 100L)
    assert(!nsLs.exists(_.startsWith("_stage_")), nsLs)
  }

  test("REPLACE TABLE AS SELECT swaps generations, even across schemas") {
    init()
    spark.sql("""CREATE TABLE graftctas.ct.t2 AS
      SELECT id AS k FROM range(0, 50)""")
    spark.sql("""REPLACE TABLE graftctas.ct.t2 AS
      SELECT concat('g', id % 3) AS grp, id * 1.5 AS score
      FROM range(0, 30)""")
    val df = spark.table("graftctas.ct.t2")
    assert(df.columns.toSeq == Seq("grp", "score"))
    assert(df.count() == 30L)
    assert(!nsLs.exists(n => n.startsWith("_stage_") ||
      n.startsWith("_old_") || n.startsWith("_GRAFT_SWAP_")), nsLs)
    // CREATE OR REPLACE over it again
    spark.sql("""CREATE OR REPLACE TABLE graftctas.ct.t2 AS
      SELECT id AS n FROM range(0, 7)""")
    assert(spark.table("graftctas.ct.t2").count() == 7L)
  }

  test("a partitioned CTAS persists the partition layout") {
    init()
    spark.sql("""CREATE TABLE graftctas.ct.t3 PARTITIONED BY (k) AS
      SELECT id % 5 AS k, id AS v FROM range(0, 500)""")
    assert(spark.table("graftctas.ct.t3").count() == 500L)
    // the INSERT path key-clustered the AS-SELECT: one file per key,
    // so a partition-key filter prunes files
    val out = spark.sql("SELECT sum(v) FROM graftctas.ct.t3 WHERE k = 2")
    val plan = out.queryExecution.executedPlan.toString
    val m = "files: (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.exists(g => g.group(1).toInt < g.group(2).toInt), plan)
    assert(out.head().getLong(0) ==
      (0L until 500L).filter(_ % 5 == 2).sum)
  }

  test("a crashed RTAS swap heals on the next load (roll forward)") {
    init()
    spark.sql("""CREATE TABLE graftctas.ct.t4 AS
      SELECT id AS k FROM range(0, 10)""")
    // fabricate the crash state AFTER the backup rename but BEFORE the
    // staged rename: journal present, final dir missing, staged +
    // backup present — precisely the widest window of the swap
    val ns = new Path(root, "ct")
    spark.sql("""CREATE TABLE graftctas.ct.t4stage AS
      SELECT id AS k FROM range(0, 99)""")
    assert(fs.rename(new Path(ns, "t4stage"), new Path(ns, "_stage_t4_x")))
    GraftCatalog.writeProps(fs, new Path(ns, "_GRAFT_SWAP_t4"),
      Map("staged" -> "_stage_t4_x", "backup" -> "_old_t4_x"))
    assert(fs.rename(new Path(ns, "t4"), new Path(ns, "_old_t4_x")))
    // next load completes the swap forward: the staged generation serves
    assert(spark.table("graftctas.ct.t4").count() == 99L)
    assert(!nsLs.exists(n => n.startsWith("_stage_") ||
      n.startsWith("_old_") || n.startsWith("_GRAFT_SWAP_")), nsLs)
  }

  test("a crashed swap with no staged dir rolls back to the backup") {
    init()
    spark.sql("""CREATE TABLE graftctas.ct.t5 AS
      SELECT id AS k FROM range(0, 10)""")
    val ns = new Path(root, "ct")
    GraftCatalog.writeProps(fs, new Path(ns, "_GRAFT_SWAP_t5"),
      Map("staged" -> "_stage_t5_x", "backup" -> "_old_t5_x"))
    assert(fs.rename(new Path(ns, "t5"), new Path(ns, "_old_t5_x")))
    assert(spark.table("graftctas.ct.t5").count() == 10L)
    assert(!nsLs.exists(n => n.startsWith("_GRAFT_SWAP_")), nsLs)
  }

  test("vacuum reclaims crashed-CTAS staged debris, not healable swaps") {
    init()
    spark.sql("""CREATE TABLE graftctas.ct.t7 AS
      SELECT id AS k FROM range(0, 10)""")
    val ns = new Path(root, "ct")
    // a CTAS that died before commit: staged dir, no journal
    spark.sql("""CREATE TABLE graftctas.ct.t7crash AS
      SELECT id AS k FROM range(0, 3)""")
    assert(fs.rename(new Path(ns, "t7crash"),
      new Path(ns, "_stage_t7_ab12cd34")))
    spark.sql("CALL graftctas.system.vacuum('ct', 't7')")
    assert(!nsLs.exists(_.startsWith("_stage_t7_ab12cd34")), nsLs)
    assert(spark.table("graftctas.ct.t7").count() == 10L) // untouched
  }

  test("vacuum never matches a sibling table sharing the name prefix") {
    init()
    spark.sql("""CREATE TABLE graftctas.ct.t9 AS
      SELECT id AS k FROM range(0, 10)""")
    val ns = new Path(root, "ct")
    // `_stage_t9_extra_<tag>` belongs to table `t9_extra`, not `t9`:
    // the remainder after `_stage_t9_` contains an underscore, so the
    // exact-8-hex-tag rule must exclude it from vacuum('t9')
    spark.sql("""CREATE TABLE graftctas.ct.t9tmp AS
      SELECT id AS k FROM range(0, 3)""")
    assert(fs.rename(new Path(ns, "t9tmp"),
      new Path(ns, "_stage_t9_extra_ab12cd34")))
    // and a dir REFERENCED by any swap journal is healSwap's, not
    // vacuum's — even when its tag parses
    spark.sql("""CREATE TABLE graftctas.ct.t9tmp2 AS
      SELECT id AS k FROM range(0, 3)""")
    assert(fs.rename(new Path(ns, "t9tmp2"),
      new Path(ns, "_stage_t9_deadbeef")))
    GraftCatalog.writeProps(fs, new Path(ns, "_GRAFT_SWAP_t9other"),
      Map("staged" -> "_stage_t9_deadbeef", "backup" -> "_old_t9_ffffffff"))
    spark.sql("CALL graftctas.system.vacuum('ct', 't9')")
    assert(nsLs.contains("_stage_t9_extra_ab12cd34"), nsLs)
    assert(nsLs.contains("_stage_t9_deadbeef"), nsLs)
    fs.delete(new Path(ns, "_GRAFT_SWAP_t9other"), false)
    fs.delete(new Path(ns, "_stage_t9_extra_ab12cd34"), true)
    fs.delete(new Path(ns, "_stage_t9_deadbeef"), true)
  }

  test("a fresh journal (live swap) is never healed by a concurrent load") {
    init()
    spark.conf.set("spark.graft.swapGraceMs",
      GraftCatalog.DefaultSwapGraceMs.toString)
    try {
      spark.sql("""CREATE TABLE graftctas.ct.t10 AS
        SELECT id AS k FROM range(0, 20)""")
      val ns = new Path(root, "ct")
      // the exact pre-first-rename window of a live RTAS commit:
      // journal written, final dir still present, staged dir live
      spark.sql("""CREATE TABLE graftctas.ct.t10stage AS
        SELECT id AS k FROM range(0, 99)""")
      assert(fs.rename(new Path(ns, "t10stage"),
        new Path(ns, "_stage_t10_12345678")))
      GraftCatalog.writeProps(fs, new Path(ns, "_GRAFT_SWAP_t10"),
        Map("staged" -> "_stage_t10_12345678",
          "backup" -> "_old_t10_12345678"))
      // a concurrent SELECT in this window must serve the OLD
      // generation and keep its hands off the committer's state
      assert(spark.table("graftctas.ct.t10").count() == 20L)
      assert(nsLs.contains("_stage_t10_12345678"), nsLs)
      assert(nsLs.contains("_GRAFT_SWAP_t10"), nsLs)
      // mid-swap read (final dir renamed away, staged not yet in):
      // resolves through the journal, still no mutation
      assert(fs.rename(new Path(ns, "t10"),
        new Path(ns, "_old_t10_12345678")))
      assert(spark.table("graftctas.ct.t10").count() == 99L)
      assert(nsLs.contains("_stage_t10_12345678"), nsLs)
      assert(nsLs.contains("_GRAFT_SWAP_t10"), nsLs)
      // the "committer" finishes; journal gone, everything consistent
      assert(fs.rename(new Path(ns, "_stage_t10_12345678"),
        new Path(ns, "t10")))
      fs.delete(new Path(ns, "_old_t10_12345678"), true)
      fs.delete(new Path(ns, "_GRAFT_SWAP_t10"), false)
      assert(spark.table("graftctas.ct.t10").count() == 99L)
    } finally spark.conf.set("spark.graft.swapGraceMs", "0")
  }

  test("staged tables never appear in SHOW TABLES") {
    init()
    spark.sql("""CREATE TABLE graftctas.ct.t6 AS
      SELECT id AS k FROM range(0, 5)""")
    val names = spark.sql("SHOW TABLES IN graftctas.ct").collect()
      .map(_.getString(1)).toSet
    assert(names.contains("t6"))
    assert(!names.exists(_.startsWith("_")), names)
  }
}

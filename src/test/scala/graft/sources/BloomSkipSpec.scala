package graft.sources

import graft.SparkSpec

/** Per-file bloom filters (`graft.bloomColumns`): point-lookup file
  * skipping on a column the table is NOT clustered by — min/max zone
  * maps span the domain on interleaved data and prune nothing; the
  * bloom cuts every file that provably lacks the key (no false
  * negatives; a false positive just reads one extra file).
  */
class BloomSkipSpec extends SparkSpec {

  private lazy val root = tmpDir("graft-bloom")

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graftbloom",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftbloom.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftbloom.b")
  }

  private def filesOf(plan: String): (Int, Int) = {
    val m = "files: (\\d+)/(\\d+)".r.findFirstMatchIn(plan).get
    (m.group(1).toInt, m.group(2).toInt)
  }

  test("point lookup prunes files through the bloom manifest") {
    init()
    spark.sql("""CREATE TABLE graftbloom.b.t (ckey BIGINT, v BIGINT)
      TBLPROPERTIES ('graft.bloomColumns' = 'ckey')""")
    // two interleaved inserts: every file spans ~the whole ckey domain,
    // so min/max could never prune — only the bloom can
    spark.sql("""INSERT INTO graftbloom.b.t
      SELECT id * 2 AS ckey, id AS v FROM range(0, 5000)""")
    spark.sql("""INSERT INTO graftbloom.b.t
      SELECT id * 2 + 1 AS ckey, id AS v FROM range(0, 5000)""")
    val q = spark.sql("SELECT v FROM graftbloom.b.t WHERE ckey = 4242")
    val plan = q.queryExecution.executedPlan.toString
    val (planned, total) = filesOf(plan)
    assert(total >= 2, plan)
    assert(planned < total, plan)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2121L))
    // an absent key prunes everything but false positives
    val none = spark.sql(
      "SELECT v FROM graftbloom.b.t WHERE ckey = 999999999")
    val (p2, t2) = filesOf(none.queryExecution.executedPlan.toString)
    assert(p2 < t2, none.queryExecution.executedPlan.toString)
    assert(none.count() == 0L)
    // IN-lists probe per value
    val in = spark.sql(
      "SELECT sum(v) FROM graftbloom.b.t WHERE ckey IN (4242, 4243)")
    assert(in.head().getLong(0) == 2121L + 2121L)
  }

  test("without the property the same layout cannot prune (control)") {
    init()
    spark.sql("CREATE TABLE graftbloom.b.plain (ckey BIGINT, v BIGINT)")
    spark.sql("""INSERT INTO graftbloom.b.plain
      SELECT id * 2 AS ckey, id AS v FROM range(0, 5000)""")
    spark.sql("""INSERT INTO graftbloom.b.plain
      SELECT id * 2 + 1 AS ckey, id AS v FROM range(0, 5000)""")
    val q = spark.sql("SELECT v FROM graftbloom.b.plain WHERE ckey = 4242")
    val plan = q.queryExecution.executedPlan.toString
    // no stats manifest at all → description prints all files planned
    val (planned, total) = filesOf(plan)
    assert(planned == total, plan)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2121L))
  }

  test("blooms survive the RTAS rename (name-keyed manifests)") {
    init()
    spark.sql("""CREATE TABLE graftbloom.b.r
      TBLPROPERTIES ('graft.bloomColumns' = 'ckey') AS
      SELECT id * 2 AS ckey, id AS v FROM range(0, 5000)""")
    val q = spark.sql("SELECT count(*) FROM graftbloom.b.r WHERE ckey = 8")
    assert(q.head().getLong(0) == 1L)
  }
}

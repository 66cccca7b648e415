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

  test("bloom manifests lift parquet's own SBBFs from the footers " +
    "(no second data pass), and the probe prunes through them") {
    init()
    spark.sql("""CREATE TABLE graftbloom.b.foot (ckey BIGINT, v BIGINT)
      TBLPROPERTIES ('graft.bloomColumns' = 'ckey')""")
    spark.sql("""INSERT INTO graftbloom.b.foot
      SELECT id * 2 AS ckey, id AS v FROM range(0, 5000)""")
    assert(graft.storage.Lakehouse.lastStatsFromFooters,
      "a bloom commit must come from the footer path now — the write " +
        "itself built the SBBFs")
    spark.sql("""INSERT INTO graftbloom.b.foot
      SELECT id * 2 + 1 AS ckey, id AS v FROM range(0, 5000)""")
    val q = spark.sql("SELECT v FROM graftbloom.b.foot WHERE ckey = 4242")
    val (planned, total) = filesOf(q.queryExecution.executedPlan.toString)
    assert(total >= 2 && planned < total,
      q.queryExecution.executedPlan.toString)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2121L))
    assert(spark.sql(
      "SELECT v FROM graftbloom.b.foot WHERE ckey = 999999999").count() == 0)
  }

  test("string bloom columns hash as UTF-8 binaries through the SBBF") {
    init()
    spark.sql("""CREATE TABLE graftbloom.b.s (skey STRING, v BIGINT)
      TBLPROPERTIES ('graft.bloomColumns' = 'skey')""")
    spark.sql("""INSERT INTO graftbloom.b.s
      SELECT md5(CAST(id * 2 AS STRING)) AS skey, id AS v
      FROM range(0, 5000)""")
    spark.sql("""INSERT INTO graftbloom.b.s
      SELECT md5(CAST(id * 2 + 1 AS STRING)) AS skey, id AS v
      FROM range(0, 5000)""")
    val probe = spark.sql("SELECT md5('4242') AS k").head().getString(0)
    val q = spark.sql(
      s"SELECT v FROM graftbloom.b.s WHERE skey = '$probe'")
    val (planned, total) = filesOf(q.queryExecution.executedPlan.toString)
    assert(total >= 2 && planned < total,
      q.queryExecution.executedPlan.toString)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2121L))
  }

  test("FooterBloom framing never collides with Spark-sketch blobs") {
    val sk = org.apache.spark.util.sketch.BloomFilter.create(100, 0.03)
    sk.putLong(7L)
    val bos = new java.io.ByteArrayOutputStream()
    sk.writeTo(bos)
    assert(graft.storage.FooterBloom.decode(bos.toByteArray).isEmpty,
      "a Spark sketch must fall through to its own decoder")
  }

  test("bloom blobs never ride the plan-time collect; probes load " +
    "lazily per column, only for zone survivors") {
    init()
    spark.sql("""CREATE TABLE graftbloom.b.lazyt (ckey BIGINT, v BIGINT)
      TBLPROPERTIES ('graft.bloomColumns' = 'ckey')""")
    spark.sql("""INSERT INTO graftbloom.b.lazyt
      SELECT id * 2 AS ckey, id AS v FROM range(0, 5000)""")
    spark.sql("""INSERT INTO graftbloom.b.lazyt
      SELECT id * 2 + 1 AS ckey, id AS v FROM range(0, 5000)""")
    withSQLConf("spark.graft.metaCacheEntries" -> "0") {
      val meta = LakehouseBatch.resolve(s"$root/b/lazyt")
      // the driver-resident stats rows carry NO blobs (the r7 heap
      // ceiling: 50 KB × #files × #bloomColumns)
      meta.dataFiles.flatMap(_.stats).foreach { r =>
        assert(!r.schema.fieldNames.exists(_.startsWith("bloom_")),
          s"plan-time stats row holds a blob: ${r.schema.fieldNames.toSeq}")
      }
      assert(meta.bloomCols == Set("ckey"))
      assert(meta.bloomCache.bytes == 0L, "nothing probed yet")
      // a range filter never touches blooms
      import org.apache.spark.sql.sources.GreaterThan
      LakehouseBatch.skipFiles(meta, Array(GreaterThan("ckey", 100L)))
      assert(meta.bloomCache.bytes == 0L,
        "a non-point filter must not fetch blobs")
      // a point lookup fetches, prunes, and the fetch is cached
      import org.apache.spark.sql.sources.EqualTo
      val hit = LakehouseBatch.skipFiles(meta, Array(EqualTo("ckey", 4242L)))
      assert(meta.bloomCache.bytes > 0L, "the probe must have fetched")
      assert(hit.length < meta.dataFiles.length, "the bloom must prune")
      val b0 = meta.bloomCache.bytes
      LakehouseBatch.skipFiles(meta, Array(EqualTo("ckey", 4242L)))
      assert(meta.bloomCache.bytes == b0, "second probe re-fetches nothing")
    }
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

package graft.sources

import graft.SparkSpec

/** Storage-partitioned joins: the V2 scan of a `PARTITIONED BY` catalog
  * table reports `KeyGroupedPartitioning` when every live file provably
  * holds exactly one partition-key value (zone-map min == max, zero
  * nulls), and Spark then plans a co-partitioned join with NO shuffle
  * on either side — the Iceberg/Delta SPJ shape, the largest single
  * cost removed from a 100 TB fact-fact join.
  */
class SpjSpec extends SparkSpec {

  private lazy val root = tmpDir("graft-spj")

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graftspj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftspj.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftspj.spj")
  }

  private def mkTables(): Unit = {
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.a
      (k BIGINT, av BIGINT) PARTITIONED BY (k)""")
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.b
      (k BIGINT, bv BIGINT) PARTITIONED BY (k)""")
    if (spark.table("graftspj.spj.a").isEmpty) {
      // the exact key-slicing INSERT (Clustering.byPartitionKeys) gives
      // each of the 5 keys its own file regardless of session shuffle
      // partitions — no sampling, no merged-key files
      spark.sql("""INSERT INTO graftspj.spj.a
        SELECT id % 5 AS k, id AS av FROM range(0, 1000)""")
      spark.sql("""INSERT INTO graftspj.spj.b
        SELECT id % 5 AS k, id * 10 AS bv FROM range(0, 400)""")
    }
  }

  private def joinSql =
    """SELECT a.k, count(*) AS n, sum(a.av + b.bv) AS s
      |FROM graftspj.spj.a a JOIN graftspj.spj.b b ON a.k = b.k
      |GROUP BY a.k""".stripMargin

  test("co-partitioned catalog tables join with zero shuffles") {
    init(); mkTables()
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(joinSql)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      // the join itself must consume both scans key-grouped: the ONLY
      // acceptable exchange is none at all before the join (the final
      // aggregate is already clustered on k too — key-grouped output
      // satisfies the group-by distribution, so the whole plan is
      // exchange-free)
      assert(!p.contains("Exchange"), p)
      assert(p.contains("SortMergeJoin"), p)
      // and the answer is the answer
      val got = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val exp = spark.sql(
        """SELECT ak AS k, count(*) AS n, sum(av + bv) AS s FROM
          |(SELECT id % 5 AS ak, id AS av FROM range(0, 1000)) x JOIN
          |(SELECT id % 5 AS bk, id * 10 AS bv FROM range(0, 400)) y
          |ON ak = bk GROUP BY ak""".stripMargin)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.toSeq == exp.toSeq)
    }
  }

  test("multiple files per key (delta chain) still joins exchange-free") {
    init(); mkTables()
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.a2
      (k BIGINT, av BIGINT) PARTITIONED BY (k)""")
    if (spark.table("graftspj.spj.a2").isEmpty) {
      // two delta commits → two keyed files per key; Spark groups the
      // splits by key (HasPartitionKey) before co-scheduling
      spark.sql("""INSERT INTO graftspj.spj.a2
        SELECT id % 5 AS k, id AS av FROM range(0, 500)""")
      spark.sql("""INSERT INTO graftspj.spj.a2
        SELECT id % 5 AS k, id AS av FROM range(500, 1000)""")
    }
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // a static filter drops keys on one side; pushPartValues still
      // aligns the remaining groups without an exchange
      val df = spark.sql(
        """SELECT a.k, count(*) AS n
          |FROM graftspj.spj.a2 a JOIN graftspj.spj.b b ON a.k = b.k
          |WHERE a.k < 3 GROUP BY a.k""".stripMargin)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("Exchange"), p)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val exp = (0L until 3L).map(k => (k, 200L * 80L))
      assert(got.toSeq == exp)
    }
  }

  test("join keys ⊃ partition keys: shard co-partitioning suffices") {
    init(); mkTables()
    // the production sharded-entity shape (StressSpj): both facts
    // partitioned by shard, joined ON shard AND a fine-grained key —
    // co-scheduling by shard alone is sound, and with
    // requireAllClusterKeysForCoPartition=false Spark consumes it
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.fa
      (shard BIGINT, u BIGINT, v BIGINT) PARTITIONED BY (shard)""")
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.fb
      (shard BIGINT, u BIGINT, w BIGINT) PARTITIONED BY (shard)""")
    if (spark.table("graftspj.spj.fa").isEmpty) {
      spark.sql("""INSERT INTO graftspj.spj.fa
        SELECT id % 4, id, id * 3 FROM range(0, 1000)""")
      spark.sql("""INSERT INTO graftspj.spj.fb
        SELECT id % 4, id, id * 7 FROM range(0, 600)""")
    }
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        """SELECT count(*) AS n, sum(a.v + b.w) AS s
          |FROM graftspj.spj.fa a JOIN graftspj.spj.fb b
          |  ON a.shard = b.shard AND a.u = b.u""".stripMargin)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("Exchange hashpartitioning"), p)
      val r = df.head()
      assert(r.getLong(0) == 600L)
      assert(r.getLong(1) == (0L until 600L).map(i => i * 3 + i * 7).sum)
    }
  }

  test("without v2 bucketing the same join plans its shuffles (control)") {
    init(); mkTables()
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = spark.sql(joinSql).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(p.contains("Exchange"), p)
    }
  }

  test("a table with multi-key files declines the report (falls back)") {
    init()
    // high-cardinality partition column: 1000 distinct keys exceed the
    // spjMaxKeys cap, so the INSERT falls back to range clustering —
    // files span key ranges, min != max → no key report, plain
    // exchange plan, correct results
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.wide
      (k BIGINT, v BIGINT) PARTITIONED BY (k)""")
    if (spark.table("graftspj.spj.wide").isEmpty)
      spark.sql("""INSERT INTO graftspj.spj.wide
        SELECT id AS k, id AS v FROM range(0, 1000)""")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        """SELECT w.k, w.v, b.bv FROM graftspj.spj.wide w
          |JOIN graftspj.spj.b b ON w.k = b.k""".stripMargin)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(p.contains("Exchange"), p)
      assert(df.count() == 400L)
    }
  }

  test("bucket(n, k) tables join exchange-free at 10k+ distinct keys") {
    init()
    // identity SPJ dies past spjMaxKeys (one file per key = the
    // small-files explosion); bucket transforms cap the file count at
    // n regardless of key cardinality — the Iceberg bucket SPJ shape
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.ba
      (k BIGINT, av BIGINT) PARTITIONED BY (bucket(8, k))""")
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.bb
      (k BIGINT, bv BIGINT) PARTITIONED BY (bucket(8, k))""")
    if (spark.table("graftspj.spj.ba").isEmpty) {
      spark.sql("""INSERT INTO graftspj.spj.ba
        SELECT id AS k, id * 3 AS av FROM range(0, 20000)""")
      spark.sql("""INSERT INTO graftspj.spj.bb
        SELECT id * 2 AS k, id * 7 AS bv FROM range(0, 8000)""")
    }
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        """SELECT count(*) AS n, sum(a.av + b.bv) AS s
          |FROM graftspj.spj.ba a JOIN graftspj.spj.bb b ON a.k = b.k
          |""".stripMargin)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("Exchange hashpartitioning"), p)
      val r = df.head()
      // matches: k = 2i for i < 8000 and k < 20000 → i < 10000 → 8000
      assert(r.getLong(0) == 8000L)
      assert(r.getLong(1) ==
        (0L until 8000L).map(i => (2 * i) * 3 + i * 7).sum)
    }
    // a second INSERT (delta commit) keeps the layout keyed: two
    // files per bucket, still grouped by bucket id
    spark.sql("""INSERT INTO graftspj.spj.ba
      SELECT id AS k, id * 3 AS av FROM range(20000, 24000)""")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        """SELECT count(*) AS n
          |FROM graftspj.spj.ba a JOIN graftspj.spj.bb b ON a.k = b.k
          |""".stripMargin)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("Exchange hashpartitioning"), p)
      assert(df.head().getLong(0) == 8000L)
    }
  }

  test("one-side bucket shuffle: Spark re-shuffles the unbucketed side " +
    "BY THE V2 FUNCTION — write-side and function-side bucket ids agree") {
    init()
    // this is the sharpest correctness probe of GraftBucketFunction:
    // with v2.bucketing.shuffle enabled Spark hashes the plain side by
    // invoking OUR ScalarFunction.produceResult and co-schedules the
    // result against the stored layout. If produceResult ever diverged
    // from the write path's pmod(hash(col), n) routing, matching keys
    // would land in different buckets and rows would SILENTLY drop —
    // so the assert is on the VALUES, not just the plan.
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.bs
      (k BIGINT, av BIGINT) PARTITIONED BY (bucket(8, k))""")
    if (spark.table("graftspj.spj.bs").isEmpty)
      spark.sql("""INSERT INTO graftspj.spj.bs
        SELECT id AS k, id * 3 AS av FROM range(0, 5000)""")
    spark.range(0, 2500).selectExpr("id * 2 AS k", "id AS bv")
      .createOrReplaceTempView("spj_plain")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        """SELECT count(*) AS n, sum(a.av + p.bv) AS s
          |FROM graftspj.spj.bs a JOIN spj_plain p ON a.k = p.k
          |""".stripMargin)
      val r = df.head()
      // matches: k = 2i for i < 2500 → 2500 rows
      assert(r.getLong(0) == 2500L,
        s"rows dropped — bucket function disagrees with the write " +
          s"path: got ${r.getLong(0)}")
      assert(r.getLong(1) == (0L until 2500L).map(i => (2 * i) * 3 + i).sum)
    }
  }

  test("byPartitionKeys never drops rows of a non-deterministic key") {
    // Clustering executes its input twice (distinct key pass, then the
    // probe join) — with rand() in the key expression the second pass
    // produces keys the first never saw. Those rows must fall back to a
    // hash-routed slice, not vanish through an inner join.
    import org.apache.spark.sql.functions.{col, floor, rand}
    val df = spark.range(0, 10000)
      .withColumn("k", floor(rand() * 50))
      .withColumn("v", col("id"))
    val out = graft.storage.Clustering.byPartitionKeys(
      spark, df.drop("id"), Seq("k"))
    assert(out.count() == 10000L)
  }

  test("bucket SPJ survives copy-on-write DELETE and UPDATE — the " +
    "rewrite re-routes survivors by bucket id (round-9 known limit)") {
    init()
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.bd
      (k BIGINT, av BIGINT) PARTITIONED BY (bucket(8, k))""")
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.be
      (k BIGINT, bv BIGINT) PARTITIONED BY (bucket(8, k))""")
    if (spark.table("graftspj.spj.bd").isEmpty) {
      spark.sql("""INSERT INTO graftspj.spj.bd
        SELECT id AS k, id * 3 AS av FROM range(0, 12000)""")
      spark.sql("""INSERT INTO graftspj.spj.be
        SELECT id * 2 AS k, id * 7 AS bv FROM range(0, 5000)""")
    }
    // CoW DELETE through the V2 deleteWhere path (simple predicate) and
    // CoW UPDATE through the command path — each is a FULL rewrite that
    // previously range-clustered the survivors, losing the `_gbk` key
    // proof until the next insert/compact
    spark.sql("DELETE FROM graftspj.spj.bd WHERE k < 2000")
    spark.sql("UPDATE graftspj.spj.bd SET av = av + 1 WHERE k % 2 = 0")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        """SELECT count(*) AS n, sum(a.av + b.bv) AS s
          |FROM graftspj.spj.bd a JOIN graftspj.spj.be b ON a.k = b.k
          |""".stripMargin)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("Exchange hashpartitioning"),
        s"SPJ declined after CoW DML:\n$p")
      val r = df.head()
      // matches: k = 2i (i < 5000), surviving k ∈ [2000, 12000) →
      // i ∈ [1000, 5000); every matched k is even so av = 3k + 1 = 6i + 1
      assert(r.getLong(0) == 4000L, s"rows lost/duplicated: ${r.getLong(0)}")
      assert(r.getLong(1) == (1000L until 5000L).map(i => 13 * i + 1).sum)
    }
  }

  test("a hot key group declines the SPJ report (skew guard) — the " +
    "shuffle plan AQE can split replaces the unsplittable key group") {
    init()
    spark.sql("""CREATE TABLE IF NOT EXISTS graftspj.spj.sk
      (k BIGINT, av BIGINT) PARTITIONED BY (k)""")
    if (spark.table("graftspj.spj.sk").isEmpty)
      // key 0 carries ~100x the rows of keys 1..9 (10 groups: the hot
      // group is ~9.2x the mean, past the 5x ratio)
      spark.sql("""INSERT INTO graftspj.spj.sk
        SELECT CASE WHEN id < 10000 THEN 0 ELSE id % 9 + 1 END AS k,
               id AS av FROM range(0, 10900)""")
    val join =
      """SELECT a.k, count(*) AS n
        |FROM graftspj.spj.sk a JOIN graftspj.spj.b b ON a.k = b.k
        |GROUP BY a.k""".stripMargin
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // floor low enough for test-sized data; default is 4M rows
      "spark.graft.spjSkewMinRows" -> "1000",
      "spark.graft.spjSkewRatio" -> "5.0") {
      val df = spark.sql(join)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(p.contains("Exchange"),
        s"skewed layout must decline the key report:\n$p")
      // values identical either way — the guard is a strategy choice
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
      assert(got.head == (0L, 10000L * 80L), got.mkString(","))
    }
    // guard off (floor above the table size): the report re-engages
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.spjSkewMinRows" -> "100000000") {
      val p = spark.sql(join).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("Exchange"), p)
    }
  }
}

package graft.sources

import graft.SparkSpec
import graft.storage.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The V2 batch source's planning contracts: snapshot round-trip across
  * commit kinds, zone-map file skipping driven by pushed filters,
  * complete aggregate pushdown from metadata, statistics-driven
  * auto-broadcast, and native equality-delete serving.
  */
class LakehouseBatchSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("grp", StringType),
    StructField("ts", TimestampType),
    StructField("amt", DecimalType(18, 2))))

  private def rows(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map { i =>
      (i.toLong, s"g${i % 3}",
        java.sql.Timestamp.valueOf(f"2024-01-${i % 27 + 1}%02d 10:00:00"),
        new java.math.BigDecimal(s"$i.25"))
    }.toDF("k", "grp", "ts", "amt")
      .select(col("k"), col("grp"), col("ts"),
        col("amt").cast("decimal(18,2)"))
  }

  private def v2(path: String): DataFrame =
    spark.read.format("graft.sources.LakehouseBatchProvider")
      .schema(schema).load(path)

  private def mkLake(prefix: String): (Lakehouse, String) = {
    val lake = new Lakehouse(spark, tmpDir(prefix))
    (lake, lake.tablePath("t"))
  }

  test("round-trips the live snapshot across full + delta commits") {
    val (lake, path) = mkLake("v2-roundtrip")
    lake.append("t", rows(0, 40), statsCols = Seq("k"))
    lake.append("t", rows(40, 70), statsCols = Seq("k"))
    lake.compact("t", schema, numFiles = 2, sortCols = Seq("k"))
    lake.append("t", rows(70, 90), statsCols = Seq("k"))
    val got = v2(path).orderBy("k").collect().toSeq
    val want = lake.read("t", schema).orderBy("k").collect().toSeq
    assert(got == want) // incl. decimal + timestamp decode fidelity
  }

  test("pushed range filter skips non-overlapping files (zone maps)") {
    val (lake, path) = mkLake("v2-skip")
    // three disjoint key ranges → three manifest-covered deltas
    lake.append("t", rows(0, 100).repartition(1), statsCols = Seq("k"))
    lake.append("t", rows(100, 200).repartition(1), statsCols = Seq("k"))
    lake.append("t", rows(200, 300).repartition(1), statsCols = Seq("k"))
    val q = v2(path).filter(col("k") >= 120L && col("k") < 180L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("files: 1/3"), s"no file cut in:\n$plan")
    assert(plan.contains("PushedFilters") || plan.contains("graft_lakehouse"))
    assert(q.count() == 60L)
    // row-level exactness: the surviving file still filters its rows
    assert(q.agg(min("k"), max("k")).head() ==
      org.apache.spark.sql.Row(120L, 179L))
    // unfiltered scan keeps everything
    assert(v2(path).count() == 300L)
  }

  test("IN and equality filters prune through the manifest too") {
    val (lake, path) = mkLake("v2-skip-eq")
    lake.append("t", rows(0, 50).repartition(1), statsCols = Seq("k"))
    lake.append("t", rows(50, 100).repartition(1), statsCols = Seq("k"))
    val eq = v2(path).filter(col("k") === 75L)
    assert(eq.queryExecution.executedPlan.toString.contains("files: 1/2"))
    assert(eq.count() == 1L)
    val in = v2(path).filter(col("k").isin(10L, 20L))
    assert(in.queryExecution.executedPlan.toString.contains("files: 1/2"))
    assert(in.count() == 2L)
  }

  test("ungrouped count/min/max push down to metadata (no data read)") {
    val (lake, path) = mkLake("v2-agg")
    lake.append("t", rows(0, 80), statsCols = Seq("k", "ts"))
    lake.append("t", rows(80, 130), statsCols = Seq("k", "ts"))
    val q = v2(path).agg(count(lit(1)).as("n"), min(col("ts")).as("lo"),
      max(col("k")).as("hi"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"), s"not pushed:\n$plan")
    val r = q.head()
    assert(r.getLong(0) == 130L)
    assert(r.getTimestamp(1) ==
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(r.getLong(2) == 129L)
  }

  test("aggregate pushdown declines when a column lacks stats coverage") {
    val (lake, path) = mkLake("v2-agg-decline")
    lake.append("t", rows(0, 50), statsCols = Seq("k")) // no ts stats
    val q = v2(path).agg(min(col("ts")).as("lo"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregation"))
    // falls back to a correct normal scan + aggregate
    assert(q.head().getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
  }

  test("reported statistics let a small dim auto-broadcast (no hint)") {
    val (lake, path) = mkLake("v2-stats")
    lake.append("t", rows(0, 20), statsCols = Seq("k"))
    import spark.implicits._
    val big = spark.range(0, 5000).select(
      (col("id") % 20).as("k"), col("id").as("payload"))
    val joined = big.join(v2(path).select(col("k"), col("grp")), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast in:\n$plan")
    assert(joined.count() == 5000L)
  }

  test("column pruning narrows the scan schema") {
    val (lake, path) = mkLake("v2-prune")
    lake.append("t", rows(0, 30))
    val q = v2(path).select(col("grp")).distinct()
    val scans = q.queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(_.schema.fieldNames.sameElements(Array("grp"))),
      s"scan not pruned: ${scans.map(_.schema).mkString(";")}")
    assert(q.count() == 3L)
  }

  test("versionAsOf pins the scan at a committed snapshot") {
    // retention keeps the pre-delete chain readable (q61's contract);
    // an unretained as-of point must still throw, never mis-resolve
    val lake = new Lakehouse(spark, tmpDir("v2-asof"), retainSnapshots = 1)
    val path = lake.tablePath("t")
    lake.append("t", rows(0, 40))
    lake.append("t", rows(40, 60))
    lake.delete("t", schema, col("k") < 10L, cdf = false)
    // v2 = the two appends, before the delete
    val asOf = spark.read.format("graft.sources.LakehouseBatchProvider")
      .schema(schema).option("versionAsOf", "2").load(path)
    assert(asOf.count() == 60L)
    assert(v2(path).count() == 50L) // live head reflects the delete
    val unretained = new Lakehouse(spark, tmpDir("v2-asof0"))
    unretained.append("t", rows(0, 10))
    unretained.delete("t", schema, col("k") < 5L, cdf = false) // GCs v1
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.LakehouseBatchProvider")
        .schema(schema).option("versionAsOf", "1")
        .load(unretained.tablePath("t")).count()
    }
    assert(e.getMessage.contains("no committed version"))
  }

  test("timestampAsOf: the option resolves commit instants like " +
    "TIMESTAMP AS OF") {
    val (lake, path) = mkLake("v2-tsasof")
    lake.append("t", rows(0, 40))
    Thread.sleep(20) // distinct commit instants (local-fs mtime tick)
    lake.append("t", rows(40, 60))
    val h = lake.history("t")
    val (v1ms, v2ms) =
      (h.find(_._1 == 1L).get._3, h.find(_._1 == 2L).get._3)
    assert(v2ms > v1ms)
    def at(ts: String) = spark.read
      .format("graft.sources.LakehouseBatchProvider")
      .schema(schema).option("timestampAsOf", ts).load(path)
    // epoch millis, at-or-before INCLUSIVE: v1's own instant serves v1
    assert(at(v1ms.toString).count() == 40L)
    // the instant must name the same snapshot the version number does
    assert(at(v1ms.toString).orderBy("k").collect().toSeq ==
      spark.read.format("graft.sources.LakehouseBatchProvider")
        .schema(schema).option("versionAsOf", "1").load(path)
        .orderBy("k").collect().toSeq)
    // session-zone local string (no offset), millisecond precision
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    val local = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(v1ms), zone)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(at(local).count() == 40L)
    // ISO-8601 with explicit offset + date-only: far future = head
    assert(at("2099-12-31T23:59:59Z").count() == 60L)
    assert(at("2099-12-31").count() == 60L)
    // before creation: loud, never silently empty
    val early = intercept[IllegalArgumentException](
      at("1999-01-01").count())
    assert(early.getMessage.contains("no commit at or before"))
    // one as-of point per read
    val both = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.LakehouseBatchProvider")
        .schema(schema).option("timestampAsOf", v1ms.toString)
        .option("versionAsOf", "1").load(path).count()
    }
    assert(both.getMessage.contains("mutually exclusive"))
    // garbage fails at plan time with the accepted shapes named
    val bad = intercept[IllegalArgumentException](
      at("not-a-time").count())
    assert(bad.getMessage.contains("cannot parse timestampAsOf"))
  }

  test("path-based V2 writes: append/overwrite commit through the " +
    "protocol; a catalog dir keeps its layout") {
    val (lake, path) = mkLake("v2-write")
    def w(df: DataFrame) = df.write
      .format("graft.sources.LakehouseBatchProvider")
      .option("schemaDDL", schema.toDDL)
    w(rows(0, 30)).mode("append").save(path)
    w(rows(30, 50)).mode("append").save(path)
    assert(v2(path).count() == 50L)
    assert(lake.history("t").map(h => (h._1, h._2)) ==
      Seq(1L -> false, 2L -> false))
    // overwrite = one FULL snapshot commit, not a dir wipe: history
    // keeps moving forward and the content is exactly the new frame
    w(rows(100, 120)).mode("overwrite").save(path)
    assert(v2(path).select("k").collect().map(_.getLong(0)).sorted
      .toSeq == (100L until 120L).toSeq)
    assert(lake.history("t").exists(h => h._1 == 3L && h._2))
    w(rows(120, 130)).mode("append").save(path)
    assert(v2(path).count() == 30L)
    // a catalog-managed dir keeps its persisted layout on PATH writes:
    // the incoming rows cluster by the partition spec and record zone
    // maps, so partition filters prune files through this entry too
    val catRoot = tmpDir("v2-write-cat")
    spark.conf.set("spark.sql.catalog.graftpw", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftpw.root", catRoot)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftpw.ns")
    spark.sql(
      "CREATE TABLE graftpw.ns.t (k BIGINT, day INT) PARTITIONED BY (day)")
    import spark.implicits._
    (0L until 400L).map(i => (i, (i % 4).toInt)).toDF("k", "day")
      .write.format("graft.sources.LakehouseBatchProvider")
      .mode("append").save(s"$catRoot/ns/t") // contract from _GRAFT_SCHEMA
    val q = spark.sql(
      "SELECT count(*) AS n, sum(k) AS s FROM graftpw.ns.t WHERE day = 2")
    val m = "files: (\\d+)/(\\d+)".r
      .findFirstMatchIn(q.queryExecution.executedPlan.toString)
      .getOrElse(fail("no file-count marker in plan"))
    assert(m.group(1).toInt < m.group(2).toInt,
      s"path-written files must prune on the partition column: ${m.matched}")
    assert(q.head().getLong(0) == 100L)
    assert(q.head().getLong(1) == (0L until 400L).filter(_ % 4 == 2).sum)
    spark.sql("DROP TABLE graftpw.ns.t")
  }

  test("path-based V2 STREAMING writes: exactly-once epochs into a " +
    "table dir") {
    val (srcLake, srcPath) = mkLake("v2-sw-src")
    srcLake.append("t", rows(0, 30))
    srcLake.append("t", rows(30, 60))
    val dstLake = new Lakehouse(spark, tmpDir("v2-sw-dst"))
    val dstPath = dstLake.tablePath("t")
    def run(ckpt: String): Unit =
      spark.readStream.schema(schema)
        .format("graft.sources.LakehouseStreamProvider")
        .option("maxVersionsPerTrigger", "1").load(srcPath)
        .filter(col("k") % 3 =!= 1L)
        .writeStream
        .format("graft.sources.LakehouseBatchProvider")
        .option("schemaDDL", schema.toDDL)
        .option("checkpointLocation", tmpDir(ckpt))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dstPath).awaitTermination()
    run("v2-sw-ck1")
    // checkpoint destroyed, full replay: every epoch re-stages and the
    // commit recognizes its batch marker — content as if run once
    run("v2-sw-ck2")
    assert(v2(dstPath).select("k").collect().map(_.getLong(0)).sorted
      .toSeq == (0L until 60L).filterNot(_ % 3 == 1))
  }

  test("runtime filters from a broadcast join reach the scan (DPP wiring)") {
    val (lake, path) = mkLake("v2-runtime")
    lake.append("t", rows(0, 100).repartition(1), statsCols = Seq("k"))
    lake.append("t", rows(100, 200).repartition(1), statsCols = Seq("k"))
    import spark.implicits._
    val dim = Seq(5L, 7L).toDF("k") // keys only in the first file
    val joined = v2(path).join(dim.hint("broadcast"), "k")
    assert(joined.count() == 2L)
    // the scan declared its filterable attributes; engine-side wiring
    // (whether a runtime IN-filter is injected) is version/plan
    // dependent — the load-bearing part is that a delivered filter cuts
    // files, which skipFiles covers directly:
    val meta = graft.sources.LakehouseBatch.resolve(path)
    val kept = graft.sources.LakehouseBatch.skipFiles(meta,
      Array(org.apache.spark.sql.sources.In("k",
        Array[Any](5L, 7L))))
    assert(kept.map(_.version) == Seq(1L))
  }

  test("reader pushes filters into parquet and prunes columns per file") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = tmpDir("v2-reader-push")
    // many small row groups so the statistics skip has something to cut
    spark.range(0, 10000).toDF("k")
      .withColumn("v", concat(lit("s"), col("k")))
      .withColumn("extra", col("k").cast("double"))
      .orderBy("k").coalesce(1)
      .write.mode("overwrite").option("parquet.block.size", "4096")
      .parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    val want = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    def readAll(filters: Array[org.apache.spark.sql.sources.Filter])
        : Seq[org.apache.spark.sql.catalyst.InternalRow] = {
      val r = new LakehouseGroupReader(
        LakehouseFilePartition(file, 0L, None), want, filters)
      val out = Seq.newBuilder[org.apache.spark.sql.catalyst.InternalRow]
      try while (r.next()) out += r.get().copy() finally r.close()
      out.result()
    }
    // record-level filtering happens INSIDE parquet — no Spark post-filter
    val hit = readAll(Array(
      org.apache.spark.sql.sources.LessThan("k", 100L)))
    assert(hit.size == 100, s"parquet-level filter returned ${hit.size}")
    assert(hit.forall(_.getLong(0) < 100))
    // conjunct on a string column composes
    val both = readAll(Array(
      org.apache.spark.sql.sources.LessThan("k", 100L),
      org.apache.spark.sql.sources.EqualTo("v", "s42")))
    assert(both.size == 1 && both.head.getLong(0) == 42L)
    // a filter on a column ABSENT from this file (schema evolution)
    // drops soundly instead of making parquet throw
    val widened = StructType(want.fields :+ StructField("later", LongType))
    val r2 = new LakehouseGroupReader(
      LakehouseFilePartition(file, 0L, None), widened, Array(
        org.apache.spark.sql.sources.EqualTo("later", 1L),
        org.apache.spark.sql.sources.LessThan("k", 10L)))
    var n2 = 0
    try while (r2.next()) {
      assert(r2.get().isNullAt(2)); n2 += 1
    } finally r2.close()
    assert(n2 == 10, s"dropped-filter read returned $n2")
  }

  test("the batch scan serves COLUMNAR batches (vectorized decode)") {
    import spark.implicits._
    val (lake, path) = mkLake("v2-columnar")
    lake.append("t", rows(0, 100))
    val df = v2(path).filter($"k" % 2 === 0)
    // vectorized batches enter the plan through ColumnarToRow — absent
    // means the scan fell back to the row-at-a-time Group decoder
    assert(df.queryExecution.executedPlan.toString
      .contains("ColumnarToRow"),
      s"no columnar transition in:\n${df.queryExecution.executedPlan}")
    assert(df.count() == 50)
    // a zero-column projection still answers through the row fallback
    assert(v2(path).count() == 100)
  }

  test("merge-on-read equality deletes are served natively") {
    import spark.implicits._
    val (lake, path) = mkLake("v2-eqdel")
    lake.append("t", rows(0, 30))
    lake.deleteByKeys("t", schema, Seq(3L, 7L).toDF("k"), () => ())
    // masked through the V2 scan — no compact-first, result identical
    // to the Lakehouse.read anti-join path
    assert(v2(path).count() == 28L)
    assert(v2(path).select("k").collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 30L).filterNot(Set(3L, 7L)))
    // even when the projection PRUNES the key column, the probe decodes
    // it from the file (widened read schema)
    assert(v2(path).select("grp").count() == 28L)
    // and the scan stays VECTORIZED with tombstones outstanding — the
    // key probe rides the columnar batch, not a row-reader fallback
    val plan = v2(path).select("grp")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan)
    // sequence rule: a key re-inserted AFTER its tombstone survives
    lake.append("t", rows(3, 4))
    assert(v2(path).count() == 29L)
    assert(v2(path).filter(col("k") === 3L).count() == 1L)
    // multi-column and string keys; null-keyed rows are never masked
    lake.deleteByKeys("t", schema,
      Seq((5L, "g2")).toDF("k", "grp"), () => ())
    assert(v2(path).filter(col("k") === 5L).count() == 0L) // 5 % 3 == 2
    // aggregate pushdown declines while tombstones are outstanding:
    // count comes from the masked scan, not footers
    assert(v2(path).agg(count(lit(1))).head().getLong(0) == 28L)
    // compaction materializes the masks; the table reads the same after
    lake.compact("t", schema, numFiles = 1, sortCols = Seq("k"))
    assert(v2(path).count() == 28L)
  }

  test("rows-only manifests never prune files (absent stats ≠ all-null)") {
    val (lake, path) = mkLake("v2-mixed-stats")
    // commit 1 carries zone maps on k; commit 2 is stats-less → its
    // manifest has (file, rows) only. statsCols is the UNION across
    // commits, so a pushed filter on k used to treat commit 2's rows
    // as an all-null file and prune it — silently missing rows.
    lake.append("t", rows(0, 50).repartition(1), statsCols = Seq("k"))
    lake.append("t", rows(50, 100).repartition(1)) // rows-only manifest
    val q = v2(path).filter(col("k") >= 60L && col("k") < 70L)
    assert(q.count() == 10L, "rows in the stats-less commit were pruned")
    val eq = v2(path).filter(col("k") === 75L)
    assert(eq.count() == 1L)
    // the stats-covered commit still prunes: k<40 cuts commit 1 only
    // when it can prove it — here both survive or one is cut, but the
    // result is exact either way
    assert(v2(path).filter(col("k") < 40L).count() == 40L)
  }

  test("min/max pushdown declines per column on mixed stats coverage") {
    val (lake, path) = mkLake("v2-mixed-agg")
    lake.append("t", rows(0, 50), statsCols = Seq("k"))
    lake.append("t", rows(50, 100)) // rows-only: no min_k/max_k
    // folding extremes over only the covered files would answer 49
    val q = v2(path).agg(max(col("k")).as("hi"), min(col("k")).as("lo"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregation"), s"unsound pushdown:\n$plan")
    val r = q.head()
    assert(r.getLong(0) == 99L && r.getLong(1) == 0L)
    // COUNT(*) alone is still answerable: every file has a rows entry
    val c = v2(path).agg(count(lit(1)).as("n"))
    assert(c.queryExecution.executedPlan.toString
      .contains("PushedAggregation"))
    assert(c.head().getLong(0) == 100L)
  }

  test("a MoR delta racing a FULL rewrite aborts instead of corrupting") {
    import org.apache.spark.sql.Row
    val (lake, path) = mkLake("v2-mor-race")
    lake.append("t", rows(0, 40), statsCols = Seq("k"))
    // the compact lands BETWEEN the DV delta's payload write and its
    // commit marker: the delta's positional masks name files the FULL
    // replaced, so the commit must abort (ConcurrentModification), not
    // land a vector that silently masks nothing
    val ex = intercept[java.util.ConcurrentModificationException] {
      lake.deleteRowsMoR("t", schema, col("k") < 10L,
        beforeCommit = () =>
          lake.compact("t", schema, numFiles = 1, sortCols = Seq("k")))
    }
    assert(ex.getMessage.contains("raced FULL/REWRITE commit"))
    // the table is intact: no rows lost, no rows deleted
    assert(v2(path).count() == 40L)
    // and the aborted delta left no committed version behind — a
    // re-run against the new snapshot succeeds and deletes exactly 10
    lake.deleteRowsMoR("t", schema, col("k") < 10L)
    assert(v2(path).count() == 30L)
    assert(v2(path).agg(min(col("k"))).head() == Row(10L))
  }

  test("a MoR delta aborts on a FRESH full-commit intent (in-flight " +
    "rewrite, marker not yet landed); a stale intent stops blocking") {
    val (lake, path) = mkLake("v2-mor-intent")
    lake.append("t", rows(0, 40), statsCols = Seq("k"))
    // simulate an in-flight full: a claimed version dir plus the ROOT
    // intent file but no commit marker (a compaction mid-write; the
    // intent lives at the root because the snapshot's own overwrite
    // write deletes and re-creates the version dir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val inflight = new org.apache.hadoop.fs.Path(path, "_v7")
    fs.mkdirs(inflight)
    fs.create(new org.apache.hadoop.fs.Path(path,
      "_GRAFT_FULL_INTENT_7"), true).close()
    val ex = intercept[java.util.ConcurrentModificationException] {
      lake.deleteRowsMoR("t", schema, col("k") < 10L)
    }
    assert(ex.getMessage.contains("_v7"))
    assert(v2(path).count() == 40L) // nothing committed
    // the intent also conflicts while the dir is ABSENT (the snapshot
    // write's delete-and-recreate window)
    fs.delete(inflight, true)
    val ex2 = intercept[java.util.ConcurrentModificationException] {
      lake.deleteRowsMoR("t", schema, col("k") < 10L)
    }
    assert(ex2.getMessage.contains("_v7"))
    fs.mkdirs(inflight)
    // crash debris: once the intent dir's mtime goes stale (TTL), the
    // delta proceeds — an abandoned full must not block DML forever
    spark.conf.set("spark.graft.fullIntentTtlMs", "1")
    try {
      Thread.sleep(10L)
      lake.deleteRowsMoR("t", schema, col("k") < 10L)
      assert(v2(path).count() == 30L)
    } finally spark.conf.unset("spark.graft.fullIntentTtlMs")
  }

  test("the full-commit intent SURVIVES the snapshot's own overwrite " +
    "payload write (root file) and is dropped once the marker lands") {
    val (lake, path) = mkLake("v2-intent-survives")
    lake.append("t", rows(0, 40), statsCols = Seq("k"))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def liveIntents(): Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("_GRAFT_FULL_INTENT_"))
    var seenMidCommit: Seq[String] = Nil
    // beforeCommit runs AFTER the payload write, BEFORE the marker —
    // exactly the window a mode("overwrite") write wiped the old
    // in-dir intent marker in
    lake.overwritePartitioned("t", rows(0, 30), Nil,
      beforeCommit = () => { seenMidCommit = liveIntents() })
    assert(seenMidCommit.nonEmpty,
      "the intent must still be visible after the snapshot write")
    assert(liveIntents().isEmpty,
      "a committed full's intent must be dropped (marker supersedes it)")
    assert(v2(path).count() == 30L)
  }

  test("pushed COUNT declines when two masks were recorded blind to " +
    "each other (concurrent mutators)") {
    import spark.implicits._
    val (lake, path) = mkLake("v2-blind-masks")
    lake.append("t", rows(0, 60).repartition(1), statsCols = Seq("k"))
    // an equality-delete whose matched counts were computed BEFORE a
    // racing MoR delete committed: k<10 by value, k<5 by position — the
    // masked sets overlap on 5 rows, so Σ(rows − dv − eqMatched) would
    // answer 45 where the truth is 50
    lake.deleteByKeys("t", schema,
      (0L until 10L).toDF("k"),
      beforeCommit = () =>
        lake.deleteRowsMoR("t", schema, col("k") < 5L))
    val c = v2(path).agg(count(lit(1)).as("n"))
    val plan = c.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregation"),
      s"blind-mask COUNT must not push:\n$plan")
    assert(c.head().getLong(0) == 50L) // the scan composes masks exactly
    // a SEQUENTIAL third mask (its basis saw both) keeps the decline:
    // the blind PAIR is still outstanding until a rewrite clears it
    lake.deleteRowsMoR("t", schema, col("k") >= 55L)
    val c2 = v2(path).agg(count(lit(1)).as("n"))
    assert(!c2.queryExecution.executedPlan.toString
      .contains("PushedAggregation"))
    assert(c2.head().getLong(0) == 45L)
  }

  test("a FULL whose basis predates an acknowledged MoR delta aborts " +
    "pre-marker (the delta survives)") {
    import org.apache.spark.sql.Row
    val (lake, path) = mkLake("v2-full-vs-delta")
    lake.append("t", rows(0, 40), statsCols = Seq("k"))
    // snapshot + basis taken BEFORE the delta commits — the classic
    // stale-maintenance race (a compaction that read weeks-old state)
    val (df, basis) = lake.readWithBasis("t", schema)
    val snapshot = df.collect() // materialize before the delete lands
    lake.deleteRowsMoR("t", schema, col("k") < 10L) // acknowledged
    spark.conf.set("spark.graft.fullRaceWaitMs", "200")
    try {
      val ex = intercept[java.util.ConcurrentModificationException] {
        lake.overwritePartitioned("t",
          spark.createDataFrame(
            spark.sparkContext.parallelize(snapshot.toSeq), schema),
          Nil, readBasis = Some(basis))
      }
      assert(ex.getMessage.contains("acknowledged merge-on-read"))
    } finally spark.conf.unset("spark.graft.fullRaceWaitMs")
    // the acknowledged delete is still served — nothing resurrected
    assert(v2(path).count() == 30L)
    assert(v2(path).agg(min(col("k"))).head() == Row(10L))
  }

  test("MIN/MAX push down with deletion vectors outstanding " +
    "(post-mask extremes)") {
    import org.apache.spark.sql.Row
    val (lake, path) = mkLake("v2-dv-minmax")
    lake.append("t", rows(0, 50).repartition(1), statsCols = Seq("k"))
    lake.append("t", rows(50, 100).repartition(1), statsCols = Seq("k"))
    // carve both extremes out via MoR deletes: the manifest zone maps
    // still say [0, 99], the DV commit's `_extremes` manifest says
    // [10, 89] — the pushdown must answer from the latter
    lake.deleteRowsMoR("t", schema, col("k") < 10L || col("k") >= 90L)
    val q = v2(path).agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"),
      s"min/max not pushed under DV:\n$plan")
    assert(q.head() == Row(10L, 89L))
    // a SECOND delete composes: extremes re-computed through the
    // first commit's masks
    lake.deleteRowsMoR("t", schema, col("k") < 25L)
    val q2 = v2(path).agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
    assert(q2.queryExecution.executedPlan.toString
      .contains("PushedAggregation"))
    assert(q2.head() == Row(25L, 89L))
    // the tightened extremes also PRUNE: a range wholly inside the
    // deleted span cuts the file at plan time
    val pr = v2(path).filter(col("k") < 5L)
    assert(pr.queryExecution.executedPlan.toString.contains("files: 0/"),
      pr.queryExecution.executedPlan.toString)
    assert(pr.count() == 0L)
    // an ALL-DEAD file contributes nothing and prunes everywhere
    lake.deleteRowsMoR("t", schema, col("k") < 50L)
    assert(v2(path).agg(min(col("k"))).head() == Row(50L))
  }

  test("COUNT(*) stays pushed with equality-delete tombstones " +
    "outstanding (matched-count index)") {
    import spark.implicits._
    val (lake, path) = mkLake("v2-eq-count")
    lake.append("t", rows(0, 60), statsCols = Seq("k"))
    lake.deleteByKeys("t", schema, Seq(3L, 7L, 11L).toDF("k"), () => ())
    val c = v2(path).agg(count(lit(1)).as("n"))
    val plan = c.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"),
      s"count not pushed under eq-del:\n$plan")
    assert(c.head().getLong(0) == 57L)
    // a key deleted twice is subtracted once (the second commit's
    // counting scan reads through the first's mask)
    lake.deleteByKeys("t", schema, Seq(3L, 20L).toDF("k"), () => ())
    assert(v2(path).agg(count(lit(1))).head().getLong(0) == 56L)
    // composes with a DV delete (disjoint by the masked identity pass)
    lake.deleteRowsMoR("t", schema, col("k") < 5L)
    val c3 = v2(path).agg(count(lit(1)).as("n"))
    assert(c3.queryExecution.executedPlan.toString
      .contains("PushedAggregation"))
    assert(c3.head().getLong(0) == 52L) // lost 0,1,2,4 (3 already dead)
    // a re-inserted key is NOT masked (sequence rule) and counts again
    lake.append("t", rows(7, 8))
    assert(v2(path).agg(count(lit(1))).head().getLong(0) == 53L)
    // MIN/MAX under tombstones still declines — unknowable from
    // metadata
    val mm = v2(path).agg(max(col("k")).as("hi"))
    assert(!mm.queryExecution.executedPlan.toString
      .contains("PushedAggregation"))
    assert(mm.head().getLong(0) == 59L)
    // opting the writer out restores the decline (absent index ≠ zero)
    withSQLConf("spark.graft.eqDelCounts" -> "false") {
      lake.deleteByKeys("t", schema, Seq(30L).toDF("k"), () => ())
    }
    val c4 = v2(path).agg(count(lit(1)).as("n"))
    assert(!c4.queryExecution.executedPlan.toString
      .contains("PushedAggregation"))
    assert(c4.head().getLong(0) == 52L)
  }

  test("repeated MoR deletes keep the pushed COUNT exact (masked identity pass)") {
    val (lake, path) = mkLake("v2-mor-recount")
    lake.append("t", rows(0, 60), statsCols = Seq("k"))
    lake.deleteRowsMoR("t", schema, col("k") < 20L)
    // same predicate again: already-masked positions must NOT re-enter
    // the new vector, or the per-file deleted-count sums over-report
    // and the metadata COUNT(*) under-counts
    lake.deleteRowsMoR("t", schema, col("k") < 30L)
    val c = v2(path).agg(count(lit(1)).as("n"))
    val plan = c.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"), s"count not pushed:\n$plan")
    assert(c.head().getLong(0) == 30L)
    assert(v2(path).count() == 30L)
  }
}

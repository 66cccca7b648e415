package graft.sources

import graft.SparkSpec
import graft.storage.{Lakehouse, MetaCheckpoint}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata checkpointing (MetaCheckpoint): resolve must serve COVERED
  * commits from one checkpoint file — zero per-commit listings, zero
  * manifest reads, zero footer opens — while composing exactly with
  * tail commits, MoR masks, fulls, vacuum and staleness. The
  * checkpoint is DERIVED state: every suspicious shape must fall back
  * to the plain walk, never to a wrong answer.
  */
class CheckpointSpec extends SparkSpec {

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

  private def v2(path: String) =
    spark.read.format("graft.sources.LakehouseBatchProvider")
      .schema(schema).load(path)

  private def mkLake(prefix: String): (Lakehouse, String) = {
    val lake = new Lakehouse(spark, tmpDir(prefix))
    (lake, lake.tablePath("t"))
  }

  private def fsOf(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("checkpointed resolve: identical snapshot, zero footer opens, " +
    "zone maps and pushdowns survive the round trip") {
    val (lake, path) = mkLake("ckpt-roundtrip")
    withSQLConf("spark.graft.checkpointIntervalCommits" -> "0",
      "spark.graft.metaCacheEntries" -> "0") {
      lake.append("t", rows(0, 100).repartition(1),
        statsCols = Seq("k", "ts"))
      lake.append("t", rows(100, 200).repartition(1),
        statsCols = Seq("k", "ts"))
      lake.append("t", rows(200, 300).repartition(1)) // rows-only
      val before = v2(path).orderBy("k").collect().toSeq
      assert(lake.checkpoint("t"))
      val s0 = LakehouseBatch.ckptServes.get()
      val o0 = LakehouseBatch.footerOpens.get()
      val meta = LakehouseBatch.resolve(path)
      assert(LakehouseBatch.ckptServes.get() == s0 + 1,
        "resolve must serve through the checkpoint")
      assert(LakehouseBatch.footerOpens.get() == o0,
        "covered resolve must open zero data-file footers")
      assert(meta.dataFiles.map(_.rowCount).sum == 300)
      assert(v2(path).orderBy("k").collect().toSeq == before)
      // zone maps decoded from the checkpoint still prune files:
      // commit 1 is provably out of range; commit 3 is rows-only and
      // must be KEPT (absent stats are not all-null stats)
      val q = v2(path).filter(col("k") >= 120L && col("k") < 180L)
      assert(q.queryExecution.executedPlan.toString.contains("files: 2/3"),
        q.queryExecution.executedPlan.toString)
      assert(q.count() == 60L)
      // timestamp zone maps survive the typed round trip
      assert(v2(path)
        .filter(col("ts") === ts("2024-01-05 10:00:00")).count() ==
        (0 until 300).count(i => i % 27 + 1 == 5))
      // COUNT pushes from checkpoint metadata; min/max declines per
      // column (commit 3 is rows-only — the mixed-coverage rule)
      val c = v2(path).agg(count(lit(1)).as("n"))
      assert(c.queryExecution.executedPlan.toString
        .contains("PushedAggregation"))
      assert(c.head().getLong(0) == 300L)
      assert(v2(path).agg(max(col("k"))).head().getLong(0) == 299L)
    }
  }

  test("tail commits compose over a checkpoint: appends, MoR deletes " +
    "masking covered files, eq-del tombstones") {
    val (lake, path) = mkLake("ckpt-tail")
    withSQLConf("spark.graft.checkpointIntervalCommits" -> "0",
      "spark.graft.metaCacheEntries" -> "0") {
      lake.append("t", rows(0, 100), statsCols = Seq("k"))
      lake.append("t", rows(100, 200), statsCols = Seq("k"))
      assert(lake.checkpoint("t"))
      // tail: an append, a DV delete whose masks hit COVERED files,
      // and an equality delete
      lake.append("t", rows(200, 250), statsCols = Seq("k"))
      lake.deleteRowsMoR("t", schema, col("k") < 10L)
      import spark.implicits._
      lake.deleteByKeys("t", schema, Seq(150L, 220L).toDF("k"), () => ())
      val s0 = LakehouseBatch.ckptServes.get()
      val got = v2(path).select("k").collect().map(_.getLong(0)).sorted
      assert(LakehouseBatch.ckptServes.get() > s0)
      assert(got.toSeq ==
        (10L until 250L).filterNot(Set(150L, 220L)).toSeq)
      // the DV over covered files reports exact deleted counts
      val meta = LakehouseBatch.resolve(path)
      assert(meta.dataFiles.map(f =>
        f.rowCount - f.dv.map(_.deleted).getOrElse(0L)).sum == 240L)
    }
  }

  test("checkpoint builds are incremental: identity-unchanged records " +
    "carry forward instead of re-encoding their dirs") {
    // retention keeps the pre-compact generation on disk so the FULL-
    // in-tail case below has covered dirs to downgrade identity-only
    val lake = new Lakehouse(spark, tmpDir("ckpt-incr"),
      retainSnapshots = 2)
    val path = lake.tablePath("t")
    withSQLConf("spark.graft.checkpointIntervalCommits" -> "0",
      "spark.graft.metaCacheEntries" -> "0") {
      lake.append("t", rows(0, 100).repartition(2),
        statsCols = Seq("k", "ts"))
      lake.append("t", rows(100, 200).repartition(2),
        statsCols = Seq("k", "ts"))
      // a DV delete with post-mask extremes: the heavy dvx values must
      // survive the carry, not just the core columns
      lake.deleteRowsMoR("t", schema, col("k") < 5L)
      assert(lake.checkpoint("t"))
      val fs = fsOf(path)
      MetaCheckpoint.dropStateCache()
      val st1 = MetaCheckpoint.loadLatest(fs, new Path(path)).get
      lake.append("t", rows(200, 260), statsCols = Seq("k", "ts"))
      val (c0, e0) = (MetaCheckpoint.recsCarried.get(),
        MetaCheckpoint.recsEncoded.get())
      assert(lake.checkpoint("t"))
      assert(MetaCheckpoint.recsCarried.get() - c0 == 3,
        "the three covered live commits must carry forward")
      assert(MetaCheckpoint.recsEncoded.get() - e0 == 1,
        "only the tail commit pays encode IO")
      // the carried checkpoint is indistinguishable from a fresh build
      MetaCheckpoint.dropStateCache()
      val st2 = MetaCheckpoint.loadLatest(fs, new Path(path)).get
      assert(st2.versions.filter(_.v <= 3L) == st1.versions)
      assert(st2.heavy.fileStats.filter(_._1._1 <= 3L) ==
        st1.heavy.fileStats)
      assert(st2.heavy.dvx == st1.heavy.dvx)
      // and the planner still answers from it: exact rows, zone-map
      // prune, DV counts
      val got = v2(path).select("k").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == (5L until 260L).toSeq)
      assert(v2(path).filter(col("k") >= 210L && col("k") < 230L)
        .count() == 20L)
      // a covered dir whose identity moved is re-encoded, not trusted
      val dir2 = new Path(path, "_v2")
      val probe = new Path(dir2, "_identity_probe")
      fs.create(probe, true).close()
      fs.delete(probe, false)
      val e1 = MetaCheckpoint.recsEncoded.get()
      assert(lake.checkpoint("t"))
      assert(MetaCheckpoint.recsEncoded.get() - e1 >= 1,
        "a touched covered dir must pay a fresh encode")
      MetaCheckpoint.dropStateCache()
      assert(v2(path).select("k").collect().map(_.getLong(0)).sorted
        .toSeq == (5L until 260L).toSeq)
      // a FULL in the tail: carried payload recs below it downgrade to
      // identity-only but keep their commit instants (history stays
      // listing-free) without re-listing the dirs
      lake.compact("t", schema, numFiles = 2, sortCols = Seq("k"))
      assert(lake.checkpoint("t"))
      MetaCheckpoint.dropStateCache()
      val st3 = MetaCheckpoint.loadLatest(fs, new Path(path)).get
      val fullV = st3.versions.filter(_.full).map(_.v).max
      val below = st3.versions.filter(_.v < fullV)
      assert(below.nonEmpty && below.forall(r =>
        !r.payload && r.commitMs > 0L))
      val st1cms = st1.versions.map(r => r.v -> r.commitMs).toMap
      below.filter(r => st1cms.contains(r.v)).foreach(r =>
        assert(r.commitMs == st1cms(r.v),
          s"v${r.v}'s commit instant must survive the downgrade"))
    }
  }

  test("a FULL commit in the tail shadows covered commits; vacuum of " +
    "covered dirs below a full keeps the checkpoint valid") {
    val (lake0, path) = mkLake("ckpt-full")
    val lake = new Lakehouse(spark, new Path(path).getParent.toString,
      gcGraceMs = 0L)
    withSQLConf("spark.graft.checkpointIntervalCommits" -> "0",
      "spark.graft.metaCacheEntries" -> "0") {
      lake.append("t", rows(0, 80), statsCols = Seq("k"))
      lake.append("t", rows(80, 160), statsCols = Seq("k"))
      assert(lake.checkpoint("t"))
      // FULL in the tail: compact replaces the covered deltas and (with
      // zero grace + no retention) deletes their dirs
      lake.compact("t", schema, numFiles = 1, sortCols = Seq("k"))
      val s0 = LakehouseBatch.ckptServes.get()
      assert(v2(path).count() == 160L)
      assert(LakehouseBatch.ckptServes.get() > s0,
        "missing covered dirs below a full must not invalidate")
      assert(v2(path).agg(min(col("k")), max(col("k"))).head() ==
        org.apache.spark.sql.Row(0L, 159L))
      // checkpoint again above the full; further reads re-cover
      assert(lake.checkpoint("t"))
      lake.append("t", rows(160, 200), statsCols = Seq("k"))
      assert(v2(path).count() == 200L)
    }
  }

  test("a mutated covered dir distrusts the checkpoint (plain-walk " +
    "fallback, same answer)") {
    val (lake, path) = mkLake("ckpt-stale")
    withSQLConf("spark.graft.checkpointIntervalCommits" -> "0",
      "spark.graft.metaCacheEntries" -> "0") {
      lake.append("t", rows(0, 50), statsCols = Seq("k"))
      assert(lake.checkpoint("t"))
      // simulate the impossible: a committed dir's identity moves
      // (here: a stray file lands inside it)
      val fs = fsOf(path)
      val vdir = graft.storage.Lakehouse.Protocol
        .versionDirs(fs, new Path(path)).head._2
      Thread.sleep(5L)
      fs.create(new Path(vdir, "_stray"), true).close()
      val s0 = LakehouseBatch.ckptServes.get()
      assert(v2(path).count() == 50L)
      assert(LakehouseBatch.ckptServes.get() == s0,
        "a moved committed-dir mtime must fall back to the plain walk")
    }
  }

  test("auto-checkpoint fires on the configured cadence and the warm " +
    "path stops listing covered dirs") {
    val (lake, path) = mkLake("ckpt-auto")
    withSQLConf("spark.graft.checkpointIntervalCommits" -> "5") {
      (0 until 6).foreach(i =>
        lake.append("t", rows(i * 10, i * 10 + 10), statsCols = Seq("k")))
      val fs = fsOf(path)
      assert(MetaCheckpoint.listCkptFiles(fs, new Path(path)).nonEmpty,
        "6 commits at interval 5 must have produced a checkpoint")
      assert(v2(path).count() == 60L)
      // warm hit through the checkpoint-aware fingerprint
      val h0 = LakehouseBatch.metaCacheHits
      assert(v2(path).count() == 60L)
      assert(LakehouseBatch.metaCacheHits > h0)
    }
  }

  test("DV extremes and eq-del matched counts survive the checkpoint " +
    "round trip (pushdowns stay pushed on covered commits)") {
    import org.apache.spark.sql.Row
    import spark.implicits._
    val (lake, path) = mkLake("ckpt-dvx")
    withSQLConf("spark.graft.checkpointIntervalCommits" -> "0",
      "spark.graft.metaCacheEntries" -> "0") {
      lake.append("t", rows(0, 100), statsCols = Seq("k"))
      lake.deleteRowsMoR("t", schema,
        col("k") < 10L || col("k") >= 90L)
      lake.deleteByKeys("t", schema, Seq(50L).toDF("k"), () => ())
      assert(lake.checkpoint("t"))
      val s0 = LakehouseBatch.ckptServes.get()
      // COUNT under eq-del + DV, answered from checkpointed metadata
      val c = v2(path).agg(count(lit(1)).as("n"))
      assert(c.queryExecution.executedPlan.toString
        .contains("PushedAggregation"))
      assert(c.head().getLong(0) == 79L)
      assert(LakehouseBatch.ckptServes.get() > s0)
      // MIN/MAX on a DV-only covered table: the `_extremes` rows ride
      // the checkpoint's typed codec
      val (lake2, path2) = mkLake("ckpt-dvx2")
      lake2.append("t", rows(0, 100), statsCols = Seq("k"))
      lake2.deleteRowsMoR("t", schema,
        col("k") < 10L || col("k") >= 90L)
      assert(lake2.checkpoint("t"))
      val mm = spark.read.format("graft.sources.LakehouseBatchProvider")
        .schema(schema).load(path2)
        .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      assert(mm.queryExecution.executedPlan.toString
        .contains("PushedAggregation"),
        mm.queryExecution.executedPlan.toString)
      assert(mm.head() == Row(10L, 89L))
    }
  }

  test("feed readers and the stream head classify covered commits from " +
    "checkpoint facts: same answers as the plain walk, tampered dirs " +
    "fall back to live probes") {
    import spark.implicits._
    val (lake, path) = mkLake("ckpt-feeds")
    withSQLConf("spark.graft.checkpointIntervalCommits" -> "0",
      "spark.graft.metaCacheEntries" -> "0") {
      lake.append("t", rows(0, 50), statsCols = Seq("k"))
      lake.append("t", rows(50, 100), statsCols = Seq("k"))
      lake.deleteByKeys("t", schema, Seq(10L).toDF("k"), () => ())
      lake.deleteRowsMoR("t", schema, col("k") === 20L)
      lake.append("t", rows(100, 120), statsCols = Seq("k"))
      assert(lake.checkpoint("t"))
      val hist = lake.history("t").map(_._1)
      val (v0, head) = (hist.min - 1, hist.max)
      val eqV = hist.sorted.apply(2) // third commit = the eq-del delta
      def feedSig() = lake.changeFeed("t", v0, head, schema)
        .select(col("k"), col("_change_type"), col("_commit_version"))
        .collect().map(_.toString).sorted.toSeq
      def tailSig() = lake.changesBetween("t", schema, head - 1, head)
        .select("k").collect().map(_.getLong(0)).sorted.toSeq
      val (feedOn, eqOn, tailOn) =
        (feedSig(), lake.equalityDeleteVersions("t", v0, head), tailSig())
      val headOn = LakehouseStream.stableHeadOf(path)
      assert(eqOn == Seq(eqV), "the eq-del delta must classify from facts")
      assert(headOn == head)
      assert(feedOn.exists(_.contains("delete")), "DV + eq-del deletes " +
        "must survive the facts-served classification")
      // changesBetween refuses a masked range identically either way
      intercept[IllegalArgumentException] {
        lake.changesBetween("t", schema, v0, head) }
      withSQLConf("spark.graft.useCheckpoint" -> "false") {
        assert(feedSig() == feedOn)
        assert(lake.equalityDeleteVersions("t", v0, head) == eqOn)
        assert(tailSig() == tailOn)
        assert(LakehouseStream.stableHeadOf(path) == headOn)
        intercept[IllegalArgumentException] {
          lake.changesBetween("t", schema, v0, head) }
      }
      // tamper a covered dir (identity moves): facts must not serve it,
      // and the live probes still classify it correctly
      val fs = fsOf(path)
      val eqDir = graft.storage.Lakehouse.Protocol
        .versionDirs(fs, new Path(path)).find(_._1 == eqV).get._2
      Thread.sleep(5L)
      fs.create(new Path(eqDir, "_stray"), true).close()
      assert(lake.equalityDeleteVersions("t", v0, head) == eqOn)
      assert(feedSig() == feedOn)
      assert(LakehouseStream.stableHeadOf(path) == headOn)
    }
  }

  test("CALL graft.system.checkpoint works from SQL") {
    val wh = tmpDir("ckpt-sql-wh")
    withSQLConf(
      "spark.sql.catalog.graftckpt" -> "graft.sources.GraftCatalog",
      "spark.sql.catalog.graftckpt.root" -> wh,
      "spark.graft.checkpointIntervalCommits" -> "0",
      "spark.graft.metaCacheEntries" -> "0") {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftckpt.cdb")
      spark.sql("CREATE TABLE graftckpt.cdb.ct (k BIGINT, v STRING)")
      spark.sql("INSERT INTO graftckpt.cdb.ct VALUES (1, 'a'), (2, 'b')")
      spark.sql("INSERT INTO graftckpt.cdb.ct VALUES (3, 'c')")
      spark.sql("CALL graftckpt.system.checkpoint('cdb', 'ct')")
      val fs = fsOf(wh)
      assert(MetaCheckpoint.listCkptFiles(fs,
        new Path(s"$wh/cdb/ct")).nonEmpty)
      val s0 = LakehouseBatch.ckptServes.get()
      assert(spark.sql("SELECT count(*) FROM graftckpt.cdb.ct")
        .head().getLong(0) == 3L)
      assert(LakehouseBatch.ckptServes.get() > s0)
      spark.sql("DROP TABLE graftckpt.cdb.ct")
    }
  }
}

package graft.sources

import graft.SparkSpec
import graft.storage.Lakehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The V2 scan's snapshot-keyed metadata cache (LakehouseBatch.resolve).
  * The cache must be INVISIBLE except in cost: every mutation of the
  * commit log — a new commit, a MoR delete, a vacuum, even deleting and
  * recreating the whole table at the same path — has to miss, because a
  * stale TableMeta silently serves the wrong snapshot. The fingerprint
  * is the commit log's own listing (names + mtimes + lengths per
  * version dir), sound because commit dirs are immutable post-marker.
  */
class MetaCacheSpec extends SparkSpec {

  private val schema = StructType.fromDDL("k BIGINT, v BIGINT")

  private def freshLake(name: String): (Lakehouse, String) = {
    val lake = new Lakehouse(spark, tmpDir(name))
    lake.append("t", spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") * 3).as("v")),
      statsCols = Seq("k"))
    (lake, lake.tablePath("t"))
  }

  private def hits: Long = LakehouseBatch.metaCacheHits

  test("warm resolve is a cache hit and returns the identical snapshot") {
    val (_, path) = freshLake("graft-mc-warm")
    val cold = LakehouseBatch.resolve(path)
    val h0 = hits
    val warm = LakehouseBatch.resolve(path)
    assert(hits == h0 + 1, "second resolve of an unchanged table must hit")
    assert(warm eq cold, "a hit serves the SAME immutable TableMeta")
  }

  test("a new commit invalidates — fresh resolve sees the new files") {
    val (lake, path) = freshLake("graft-mc-commit")
    val before = LakehouseBatch.resolve(path)
    lake.append("t", spark.range(1000, 2000)
      .select(col("id").as("k"), (col("id") * 3).as("v")),
      statsCols = Seq("k"))
    val h0 = hits
    val after = LakehouseBatch.resolve(path)
    assert(hits == h0, "resolve after a commit must MISS")
    assert(after.dataFiles.map(_.rowCount).sum ==
      before.dataFiles.map(_.rowCount).sum + 1000)
  }

  test("a MoR delete invalidates — DV refs appear without a restart") {
    val (lake, path) = freshLake("graft-mc-dv")
    assert(LakehouseBatch.resolve(path).dataFiles.forall(_.dv.isEmpty))
    lake.deleteRowsMoR("t", schema, col("k") < 10)
    val after = LakehouseBatch.resolve(path)
    assert(after.dataFiles.exists(_.dv.nonEmpty),
      "post-delete resolve must carry the deletion vectors")
    assert(after.dataFiles.flatMap(_.dv).map(_.deleted).sum == 10)
  }

  test("delete + recreate at the same path never serves the old table") {
    val dir = tmpDir("graft-mc-recreate")
    val lake = new Lakehouse(spark, dir)
    lake.append("t", spark.range(0, 500)
      .select(col("id").as("k"), (col("id") * 3).as("v")))
    val path = lake.tablePath("t")
    LakehouseBatch.resolve(path) // populate
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val lake2 = new Lakehouse(spark, dir)
    lake2.append("t", spark.range(0, 7)
      .select(col("id").as("k"), (col("id") * 3).as("v")))
    val re = LakehouseBatch.resolve(path)
    assert(re.dataFiles.map(_.rowCount).sum == 7,
      "recreated table must resolve to its OWN files, not the cache")
  }

  test("asOf snapshots key separately from the current snapshot") {
    val (lake, path) = freshLake("graft-mc-asof")
    lake.append("t", spark.range(1000, 1100)
      .select(col("id").as("k"), (col("id") * 3).as("v")),
      statsCols = Seq("k"))
    val cur = LakehouseBatch.resolve(path)
    val v1 = LakehouseBatch.resolve(path, asOf = Some(1L))
    assert(cur.dataFiles.map(_.rowCount).sum == 1100)
    assert(v1.dataFiles.map(_.rowCount).sum == 1000)
    val h0 = hits
    assert(LakehouseBatch.resolve(path, asOf = Some(1L))
      .dataFiles.map(_.rowCount).sum == 1000)
    assert(hits == h0 + 1, "the as-of entry hits independently")
  }

  test("spark.graft.metaCacheEntries=0 disables the cache") {
    val (_, path) = freshLake("graft-mc-off")
    withSQLConf("spark.graft.metaCacheEntries" -> "0") {
      val a = LakehouseBatch.resolve(path)
      val h0 = hits
      val b = LakehouseBatch.resolve(path)
      assert(hits == h0, "disabled cache must never hit")
      assert(!(a eq b))
    }
  }

  test("metaRefreshMs trust window: bounded staleness, opt-in only") {
    val (lake, path) = freshLake("graft-mc-refresh")
    // populate + validate once
    assert(LakehouseBatch.resolve(path).dataFiles.map(_.rowCount).sum
      == 1000)
    withSQLConf("spark.graft.metaRefreshMs" -> "3600000") {
      lake.append("t", spark.range(1000, 1500)
        .select(col("id").as("k"), (col("id") * 3).as("v")),
        statsCols = Seq("k"))
      // inside the window the cached snapshot serves WITHOUT the
      // fingerprint listings — the new commit is invisible (that is
      // the documented trade)
      assert(LakehouseBatch.resolve(path).dataFiles.map(_.rowCount).sum
        == 1000, "trust window must serve the validated snapshot")
    }
    // default (0) re-validates: the commit is seen immediately
    assert(LakehouseBatch.resolve(path).dataFiles.map(_.rowCount).sum
      == 1500)
  }

  test("manifest-covered tables resolve with ZERO data-file footer opens") {
    val (lake, path) = freshLake("graft-mc-nofooter")
    lake.append("t", spark.range(1000, 2000).repartition(4)
      .select(col("id").as("k"), (col("id") * 3).as("v")),
      statsCols = Seq("k"))
    withSQLConf("spark.graft.metaCacheEntries" -> "0") {
      val o0 = LakehouseBatch.footerOpens.get()
      val meta = LakehouseBatch.resolve(path)
      assert(LakehouseBatch.footerOpens.get() == o0,
        "row counts must come from the manifest's `rows` column — a " +
          "footer open at plan time is the O(#files) RPC the manifest " +
          "exists to remove")
      assert(meta.dataFiles.map(_.rowCount).sum == 2000)
      assert(meta.fullyCovered)
    }
  }

  test("stats-less commits persist a rows-only manifest; legacy tables " +
    "without one still resolve (footer fallback) with exact counts") {
    val lake = new Lakehouse(spark, tmpDir("graft-mc-fallback"))
    lake.append("t", spark.range(0, 123)
      .select(col("id").as("k"), (col("id") * 3).as("v")))
    val path = lake.tablePath("t")
    withSQLConf("spark.graft.metaCacheEntries" -> "0") {
      // even with NO stats configured, resolve must not open footers —
      // the commit wrote a (file, rows) manifest
      val o0 = LakehouseBatch.footerOpens.get()
      val meta = LakehouseBatch.resolve(path)
      assert(LakehouseBatch.footerOpens.get() == o0,
        "rows-only manifest must serve the counts")
      assert(meta.dataFiles.map(_.rowCount).sum == 123)
      // strip the manifest (a pre-manifest legacy commit): the footer
      // fallback serves the same counts
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      lake.dataPaths("t").foreach { r =>
        fs.delete(new org.apache.hadoop.fs.Path(r, "_GRAFT_STATS"), true)
      }
      val legacy = LakehouseBatch.resolve(path)
      assert(LakehouseBatch.footerOpens.get() > o0)
      assert(legacy.dataFiles.map(_.rowCount).sum == 123)
    }
  }

  test("byte budget: an oversized snapshot is served but never cached, " +
    "and the budget evicts rather than grows") {
    val (_, path) = freshLake("graft-mc-bytes")
    // tiny budget: this snapshot's estimate (hundreds of bytes per
    // file) exceeds it → resolve must work but never hit afterwards
    withSQLConf("spark.graft.metaCacheBytes" -> "64") {
      val a = LakehouseBatch.resolve(path)
      val h0 = hits
      val b = LakehouseBatch.resolve(path)
      assert(hits == h0, "an over-budget snapshot must not be cached")
      assert(a.dataFiles.map(_.rowCount).sum ==
        b.dataFiles.map(_.rowCount).sum)
    }
    // generous budget: normal hit behavior returns
    withSQLConf("spark.graft.metaCacheBytes" -> ((256L << 20).toString)) {
      LakehouseBatch.resolve(path)
      val h1 = hits
      LakehouseBatch.resolve(path)
      assert(hits == h1 + 1)
    }
  }
}

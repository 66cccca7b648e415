package graft.storage

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Partial compaction by delete density (Lakehouse.rewriteDeletes —
  * Iceberg's rewrite_data_files with a delete threshold): only data
  * files whose merge-on-read deleted fraction reaches the threshold are
  * rewritten, in one crash-safe DELTA commit (survivors + whole-file
  * masks + replaced-name list); every reader stays correct unchanged,
  * the V2 scan skips replaced files at PLAN time, feed/stream consumers
  * see no row change, and a rewrite racing a full commit is discarded —
  * never rebased into duplicate rows.
  */
class RewriteDeletesSpec extends SparkSpec {

  private val schema = StructType.fromDDL("k BIGINT, v BIGINT")

  private def mkLake(tag: String): Lakehouse =
    new Lakehouse(spark, tmpDir(s"rw-$tag"))

  private def rows(lo: Long, hi: Long) = {
    import spark.implicits._
    (lo until hi).map(i => (i, i * 10)).toDF("k", "v")
  }

  /** One data file per third of the key space: k∈[0,100) / [100,200) /
    * [200,300), each its own delta commit.
    */
  private def seed(lake: Lakehouse): Unit =
    (0 to 2).foreach(i =>
      lake.append("t", rows(i * 100L, i * 100L + 100L).coalesce(1)))

  private def dataFileNames(lake: Lakehouse): Set[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    lake.dataPaths("t").flatMap { r =>
      val p = new Path(r)
      p.getFileSystem(conf).listStatus(p).map(_.getPath.getName)
    }.filter(_.endsWith(".parquet")).toSet
  }

  test("only files past the threshold are rewritten; both read paths agree") {
    val lake = mkLake("sel")
    seed(lake)
    val before = dataFileNames(lake)
    // 80% of file 1 ([0,100) keep k%5==0), 6% of file 2, none of file 3
    lake.deleteRowsMoR("t", schema,
      (col("k") < 100 && col("k") % 5 =!= 0) ||
        (col("k") >= 100 && col("k") < 106))
    val replaced = lake.rewriteDeletes("t", schema, 0.5)
    assert(replaced.size == 1, s"one dense file expected: $replaced")
    assert(before.contains(replaced.head))
    // replaced file still on disk (time travel) but new files appeared
    val after = dataFileNames(lake)
    assert(after.contains(replaced.head))
    assert((after -- before).nonEmpty)
    // no full commit anywhere: the rewrite is a delta
    assert(lake.versions("t").forall(!_._2))
    val expect = ((0L until 100L).filter(_ % 5 == 0) ++
      (106L until 200L) ++ (200L until 300L)).sorted
    assert(lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq == expect)
    val v2 = spark.read.format("graft.sources.LakehouseBatchProvider")
      .schema(schema).load(lake.tablePath("t"))
    assert(v2.select("k").collect().map(_.getLong(0)).sorted.toSeq == expect)
    // idempotent: nothing else crosses the threshold now
    assert(lake.rewriteDeletes("t", schema, 0.5).isEmpty)
  }

  test("the V2 scan skips replaced files at plan time (zero IO)") {
    val lake = mkLake("skip")
    seed(lake)
    lake.deleteRowsMoR("t", schema, col("k") < 90)
    val replaced = lake.rewriteDeletes("t", schema, 0.5)
    assert(replaced.size == 1)
    // corrupt the replaced file ON DISK: if any plan phase still opened
    // it (footer or data), the read would throw — the plan-time skip is
    // the only thing standing between this table and a crash
    val conf = spark.sparkContext.hadoopConfiguration
    val corrupt = lake.dataPaths("t").iterator.map(new Path(_))
      .flatMap(r => r.getFileSystem(conf).listStatus(r))
      .find(_.getPath.getName == replaced.head).get.getPath
    val out = corrupt.getFileSystem(conf).create(corrupt, true)
    out.write("not a parquet file".getBytes("UTF-8")); out.close()
    val v2 = spark.read.format("graft.sources.LakehouseBatchProvider")
      .schema(schema).load(lake.tablePath("t"))
    assert(v2.select("k").collect().map(_.getLong(0)).sorted.toSeq
      == ((90L until 300L)).sorted)
  }

  test("feed and appends-between treat a rewrite as no change") {
    val lake = mkLake("feed")
    seed(lake)
    lake.deleteRowsMoR("t", schema, col("k") < 80)
    val dvV = lake.versions("t").map(_._1).max
    assert(lake.rewriteDeletes("t", schema, 0.5).nonEmpty)
    val rwV = lake.versions("t").map(_._1).max
    // the typed feed emits the DV deletes once — and NOTHING for the
    // rewrite (its masks cover rows whose deletes were already emitted)
    val feed = lake.changeFeed("t", dvV - 1, rwV, schema)
    assert(feed.filter(col("_change_type") === "delete").count() == 80L)
    assert(feed.filter(col("_commit_version") === rwV).isEmpty)
    // appends-between would refuse a genuine DV commit; across ONLY the
    // rewrite it serves zero appended rows instead of throwing
    assert(lake.changesBetween("t", schema, dvV, rwV).isEmpty)
    // appends after the rewrite flow through normally
    lake.append("t", rows(300, 310).coalesce(1))
    val headV = lake.versions("t").map(_._1).max
    assert(lake.changesBetween("t", schema, rwV, headV).count() == 10L)
  }

  test("a rewrite raced by a full commit is dropped, not rebased") {
    val lake = mkLake("race")
    seed(lake)
    lake.deleteRowsMoR("t", schema, col("k") < 90)
    val expect = (90L until 300L).sorted
    // the racing full commit lands INSIDE the rewrite's commit window
    // (after its data is written, before its marker): the full's
    // snapshot read the originals through their masks, so the rewrite
    // must discard itself — rebasing would re-append its survivors
    // ABOVE the full and duplicate every one of them
    val replaced = lake.rewriteDeletes("t", schema, 0.5,
      beforeCommit = () => lake.compact("t", schema, 2, Nil))
    assert(replaced.isEmpty, "a raced rewrite must report nothing done")
    assert(lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq == expect)
    val v2 = spark.read.format("graft.sources.LakehouseBatchProvider")
      .schema(schema).load(lake.tablePath("t"))
    assert(v2.select("k").collect().map(_.getLong(0)).sorted.toSeq == expect)
  }

  test("a rewrite racing an IN-FLIGHT full (marker not yet landed) " +
    "self-aborts on the full's root intent — neither side can miss " +
    "the other") {
    val lake = mkLake("intent")
    seed(lake)
    lake.deleteRowsMoR("t", schema, col("k") < 90)
    val expect = (90L until 300L).sorted
    // the rewrite starts inside the full's commit window (payload
    // written, marker pending): its pre-marker check must see the
    // full's FRESH root intent and abort — committing would re-express
    // pre-full bytes above the snapshot (duplicated rows), and the
    // full's checks never look above its own version
    var rewriteAborted = false
    lake.overwritePartitioned("t", rows(90, 300), Nil,
      beforeCommit = () => {
        try { lake.rewriteDeletes("t", schema, 0.5); () }
        catch {
          case _: java.util.ConcurrentModificationException =>
            rewriteAborted = true
        }
      })
    assert(rewriteAborted, "the rewrite must abort on the fresh intent")
    assert(lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq == expect)
    // no rewrite commit anywhere on the chain
    val conf = spark.sparkContext.hadoopConfiguration
    val dest = new Path(lake.tablePath("t"))
    val fs = dest.getFileSystem(conf)
    assert(!Lakehouse.Protocol.versionDirs(fs, dest).exists { case (_, p) =>
      fs.exists(new Path(p, Lakehouse.Protocol.MarkerRewrite)) })
  }

  test("COUNT pushdown survives a rewrite when other masks are " +
    "outstanding — the rewrite records its read basis like any " +
    "mask-bearing delta") {
    val lake = mkLake("basis")
    (0 to 2).foreach(i =>
      lake.append("t", rows(i * 100L, i * 100L + 100L).coalesce(1),
        statsCols = Seq("k")))
    lake.deleteRowsMoR("t", schema, col("k") < 90)
    val replaced = lake.rewriteDeletes("t", schema, 0.5)
    assert(replaced.nonEmpty)
    // a second DV AFTER the rewrite: three mask-bearing commits on the
    // chain (DV, rewrite, DV) — the pairwise gate needs all three bases
    lake.deleteRowsMoR("t", schema, col("k") >= 100 && col("k") < 110)
    val v2 = spark.read.format("graft.sources.LakehouseBatchProvider")
      .schema(schema).load(lake.tablePath("t"))
    val c = v2.agg(count(lit(1)).as("n"))
    assert(c.queryExecution.executedPlan.toString
      .contains("PushedAggregation"),
      "pushdown must stay alive across a basis-recorded rewrite:\n" +
        c.queryExecution.executedPlan.toString)
    assert(c.head().getLong(0) == 200L)
  }

  test("CALL graft.system.rewrite_deletes drives it through SQL") {
    val root = tmpDir("rw-sql")
    spark.conf.set("spark.sql.catalog.graftrw", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftrw.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftrw.d")
    spark.sql("""CREATE TABLE graftrw.d.t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('graft.deleteMode' = 'mor')""")
    // two commits with disjoint key ranges: the DELETE fully masks the
    // first commit's files and touches nothing in the second
    spark.sql("INSERT INTO graftrw.d.t SELECT id, id * 10 FROM range(0, 90)")
    spark.sql("INSERT INTO graftrw.d.t SELECT id, id * 10 FROM range(90, 300)")
    spark.sql("DELETE FROM graftrw.d.t WHERE k < 90")
    spark.sql("CALL graftrw.system.rewrite_deletes('d', 't', 0.5D)")
    // still merge-on-read: no full commit — the rewrite is a delta
    assert(spark.sql("SELECT * FROM graftrw.d.`t$history`").collect()
      .forall(!_.getBoolean(1)))
    assert(spark.sql("SELECT count(*), sum(v) FROM graftrw.d.t").head()
      match { case r => r.getLong(0) == 210L &&
        r.getLong(1) == (90L until 300L).map(_ * 10).sum })
  }

  test("eq-del tombstones fold into the rewrite for the files it touches") {
    val lake = mkLake("eqdel")
    seed(lake)
    import spark.implicits._
    // key-based tombstones over file 1 + positional deletes over it too
    lake.deleteByKeys("t", schema,
      (0L until 40L).map(k => (k, k * 10)).toDF("k", "v"), () => ())
    lake.deleteRowsMoR("t", schema, col("k") >= 40 && col("k") < 90)
    val replaced = lake.rewriteDeletes("t", schema, 0.5)
    assert(replaced.size == 1)
    val expect = (90L until 300L).sorted
    assert(lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq == expect)
    // survivors moved ABOVE the eq-del version — they must not be
    // re-masked (they carry keys 90-99 which were never tombstoned),
    // and a key re-inserted after everything survives
    lake.append("t", rows(0, 5).coalesce(1))
    assert(lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq == ((0L until 5L) ++ expect).sorted)
  }
}

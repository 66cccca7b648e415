package graft.tools

import graft.storage.Lakehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** PER-COMMIT FIXED-COST pricing — `runMain graft.tools.StressCommit
  * cost [chainLen]`.
  *
  * Every scenario runs ONE operation against a table whose commit
  * chain is already `chainLen` versions deep, on the [[MeteredFs]]
  * scheme, and reports wall time plus the exact filesystem-op bill
  * (creates / lists / stats / opens / renames / deletes). On an object
  * store each op is an RPC, so the bill IS the engine's commit latency
  * floor at 100 TB ingest rates — the variable behind the q49/q50
  * driver creep the round-10 verdict flagged. The suite prints one
  * JSON line per scenario and a closing summary line; BENCH_NOTES.md
  * records the round's accepted numbers, and MeteredCommitSpec pins
  * the op ceilings so a regression fails the build instead of the
  * benchmark.
  *
  * Scenarios:
  *  - `append_tiny`        1-row [[Lakehouse.append]], no stats
  *  - `append_stats`       1-row append with zone-map + bloom columns
  *  - `insert_sql`         1-row catalog `INSERT INTO` (props reads,
  *                         constraint checks, V1 write bridge included)
  *  - `mor_delete`         one [[Lakehouse.deleteRowsMoR]] masking a
  *                         handful of rows (DV sidecars, `_dv_counts`,
  *                         extremes, basis)
  *  - `read_resolve`       one [[Lakehouse.dataPaths]] live-set resolve
  *                         (the reader-side fixed cost)
  *  - `sql_count`          one `SELECT count(*)` through the V2 scan
  *                         (plan-time resolve + metadata-only answer)
  */
object StressCommitCost {

  private case class Bill(name: String, wallMs: Double,
      ops: Seq[(String, Long)]) {
    def total: Long = ops.map(_._2).sum
    def json: String = {
      val o = ops.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      s"""{"scenario":"$name","wall_ms":${
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(wallMs))
      },"fs_ops_total":$total,"fs_ops":{$o}}"""
    }
  }

  private var traceAll = false
  private def price[A](name: String)(body: => A): Bill = {
    MeteredFs.reset()
    val t0 = System.nanoTime()
    body
    val ms = (System.nanoTime() - t0) / 1e6
    if (traceAll)
      MeteredFs.topPaths(12).foreach { case (k, n) =>
        System.err.println(f"[trace:$name] $n%6d  $k")
      }
    Bill(name, ms, MeteredFs.snapshot())
  }

  def run(args: Array[String]): Unit = {
    val chain = args.headOption.map(_.toInt).getOrElse(20)
    // `trace` as the 2nd arg: per-(op, path) tallies for the heaviest
    // scenario land on stderr — the storm locator
    val trace = args.lift(1).contains("trace")
    traceAll = trace
    MeteredFs.tracePaths = trace
    val spark = graft.GraftSession.get()
    MeteredFs.install(spark.sparkContext.hadoopConfiguration)

    val tmp = java.nio.file.Files
      .createTempDirectory("graft-commit-cost").toString
    val rootUri = s"graftmeter://$tmp"
    val lake = new Lakehouse(spark, s"$rootUri/lake")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("grp", StringType), StructField("v", StringType)))

    // ONE data file per commit (numPartitions = 1): the realistic
    // ingest-batch shape — the default 32-way range split writes ~30
    // tiny part files per 100-row commit and prices file COUNT, not
    // commit protocol
    def batch(from: Long, n: Long) = spark.range(from, from + n, 1, 1)
      .select(col("id").as("k"), concat(lit("g"), col("id") % 8).as("grp"),
        concat(lit("v"), col("id")).as("v"))

    // ---- build the pre-existing chain (not priced) -------------------
    val statsCols = Seq("k"); val bloomCols = Seq("v")
    (0 until chain).foreach(i =>
      lake.append("t", batch(i * 100L, 100L), statsCols = statsCols,
        bloomCols = bloomCols))

    // warm-up so JIT/class-loading doesn't pollute the first bill
    lake.append("t", batch(900000L, 1L), statsCols = statsCols,
      bloomCols = bloomCols)
    lake.dataPaths("t")

    val bills = Seq.newBuilder[Bill]
    bills += price("append_tiny")(
      lake.append("t", batch(1000000L, 1L)))
    bills += price("append_stats")(
      lake.append("t", batch(1000001L, 1L), statsCols = statsCols,
        bloomCols = bloomCols))
    // scan-shape diagnostics: same bytes, three plan shapes
    val roots = lake.dataPaths("t")
    bills += price("scan_one_relation") {
      spark.read.schema(schema).parquet(roots: _*)
        .write.format("noop").mode("overwrite").save()
    }
    bills += price("scan_union_relations") {
      roots.map(r => spark.read.schema(schema).parquet(r))
        .reduce(_ unionByName _)
        .write.format("noop").mode("overwrite").save()
    }
    bills += price("scan_union_meta") {
      roots.map(r => spark.read.schema(schema).parquet(r)
        .select(col("*"),
          substring_index(col("_metadata.file_path"), "/", -1)
            .as("__f"), col("_metadata.row_index").as("__p")))
        .reduce(_ unionByName _)
        .write.format("noop").mode("overwrite").save()
    }
    // phase breakdown of the MoR delete (diagnostic scenarios)
    bills += price("mor_resolve")(lake.maskedCtx("t"))
    val ctx0 = lake.maskedCtx("t")
    bills += price("mor_scan_only") {
      lake.readMaskedWithPosOn(ctx0, schema)
        .filter(coalesce((col("k") % 1000L === 6L).cast("boolean"),
          lit(false)))
        .select(col(Lakehouse.FileCol), col(Lakehouse.PosCol))
        .write.format("noop").mode("overwrite").save()
    }
    bills += price("mor_delete")(
      lake.deleteRowsMoR("t", schema, col("k") % 1000L === 7L))
    if (trace) {
      // aggregate by path SHAPE (version numbers / part files folded)
      // so an op-per-version storm reads as one line, not 100
      val norm = MeteredFs.topPaths(Int.MaxValue).groupMapReduce {
        case (k, _) => k.replaceAll("_v\\d+", "_v#")
          .replaceAll("part-[^/\\t]*", "part#")
          .replaceAll("[0-9a-f-]{20,}", "#")
      }(_._2)(_ + _)
      norm.toSeq.sortBy(-_._2).take(40).foreach { case (k, n) =>
        System.err.println(f"[trace] $n%6d  $k")
      }
      MeteredFs.tracePaths = false
    }
    bills += price("read_resolve")(lake.dataPaths("t"))

    // catalog surface: INSERT pays props/schema reads + the V1 bridge
    spark.conf.set("spark.sql.catalog.gmc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmc.root", s"$rootUri/cat")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmc.m")
    spark.sql("CREATE TABLE gmc.m.t (k BIGINT, grp STRING, v STRING)")
    (0 until chain).foreach(i => spark.sql(
      s"INSERT INTO gmc.m.t SELECT /*+ COALESCE(1) */ id, concat('g', id % 8), " +
        s"concat('v', id) FROM range(${i * 100}, ${i * 100 + 100})"))
    spark.sql("INSERT INTO gmc.m.t VALUES (900000, 'g0', 'w')") // warm
    bills += price("insert_sql")(
      spark.sql("INSERT INTO gmc.m.t VALUES (1000000, 'g0', 'w')"))
    bills += price("sql_count")(
      spark.sql("SELECT count(*) FROM gmc.m.t").collect())

    // FULL-overwrite fixed cost (the SCD dim write path): one snapshot
    // rewrite against a table with a few existing versions
    val lake2 = new Lakehouse(spark, s"$rootUri/lake2")
    (0 until 3).foreach(i => lake2.overwrite("d", batch(i * 100L, 100L)))
    bills += price("overwrite_full")(
      lake2.overwrite("d", batch(1000L, 100L)))

    // the q49 protocol replay end-to-end (round-11 verdict item 3): the
    // 3-day ingest → normalize → mart loop on the metered scheme — the
    // exact op bill behind the headline pipeline query. 33 commits
    // (3 landing + 3 fact + 3 report appends, 24 dim FULLs, 3 truncates)
    // plus every read resolve the loop does.
    MeteredFs.tracePaths = trace // the mor_delete block turned it off
    val replayBill = price("replay_scd2") {
      val rlake = new Lakehouse(spark, s"$rootUri/replay")
      graft.ReplayDump.replay(rlake, graft.mart.MartStaging.Scd2Dims,
        fixtureDir = "/root/repo/src/test/resources/fixtures")
    }
    if (trace) {
      // path-SHAPE aggregation for the replay (same folding as the
      // mor_delete block): where do 16k ops come from, per op kind
      val norm = MeteredFs.topPaths(Int.MaxValue).groupMapReduce {
        case (k, _) => k.replaceAll("_v\\d+", "_v#")
          .replaceAll("part-[^/\\t]*", "part#")
          .replaceAll("attempt_[^/\\t]*", "attempt#")
          .replaceAll("task_[^/\\t]*", "task#")
          .replaceAll("[0-9a-f-]{20,}", "#")
          .replaceAll("replay/[a-z_]+/", "replay/T/")
      }(_._2)(_ + _)
      norm.toSeq.sortBy(-_._2).take(40).foreach { case (k, n) =>
        System.err.println(f"[rtrace] $n%6d  $k")
      }
    }
    bills += replayBill

    val all = bills.result()
    spark.sparkContext.setLogLevel("OFF")
    all.foreach(b => println(b.json))
    println(s"""{"metric":"commit_fixed_cost","chain":$chain,""" +
      s""""scenarios":${all.size},"fs_ops":{${
        all.map(b => s""""${b.name}":${b.total}""").mkString(",")}}}""")
    spark.stop()
  }
}

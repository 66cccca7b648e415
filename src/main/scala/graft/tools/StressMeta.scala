package graft.tools

import graft.storage.Lakehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Plan-time metadata stress: the V2 scan's driver-side walk (commit
  * listing, parquet footers, zone-map/bloom manifests, DV sidecar
  * indexes) grows with #files and #versions — this harness measures
  * HOW it grows, because a superlinear plan cost would cap table size
  * long before data cost does.
  *
  * For each replication factor x (table = 40·x files across 4·x delta
  * commits, stats manifests on `k`, plus one MoR delete so the DV
  * index path is exercised):
  *   - `resolve_ms`: LakehouseBatch.resolve — the raw metadata walk
  *     (listings + one footer open per file + manifest reads + DV
  *     sidecar listing/headers);
  *   - `plan_ms`: end-to-end planning of a pushed-filter COUNT through
  *     the V2 scan (resolve + zone-map skipping + partition planning),
  *     min of 3;
  *   - `files`: live file count (asserted = 40·x).
  * Linear-in-files with a bounded constant is the acceptance bar
  * (VERDICT r6 task 7); the per-file cost should sit in the
  * single-digit-ms range dominated by the footer open.
  *
  * Usage: `sbt "runMain graft.tools.StressMeta [xFactors...]"`
  * (default `1 10 30`). One JSON line per x.
  */
object StressMeta {
  def main(args: Array[String]): Unit = {
    val xs = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 30)
    val spark = graft.GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-metastress")
    val schema = StructType.fromDDL("k BIGINT, v BIGINT")
    import StressUtil.timed

    val out = for (x <- xs) yield {
      val lake = new Lakehouse(spark, dir.resolve(s"lake$x").toString)
      val commits = 4 * x
      val filesPerCommit = 10
      (0 until commits).foreach { c =>
        lake.append("t",
          spark.range(c * 10000L, (c + 1) * 10000L)
            .select(col("id").as("k"), (col("id") * 3).as("v"))
            .repartition(filesPerCommit),
          statsCols = Seq("k"), bloomCols = Seq("v"))
      }
      lake.deleteRowsMoR("t", schema, col("k") % 1000 === 0)
      val path = lake.tablePath("t")
      // cold = the raw walk (cache disabled); warm = the snapshot-keyed
      // cache hit, whose cost is the fingerprint listing alone — the
      // 100 TB contract is "pay the footer/manifest terms once per
      // snapshot, not once per query"
      spark.conf.set("spark.graft.metaCacheEntries", "0")
      val opensBefore = graft.sources.LakehouseBatch.footerOpens.get()
      val (meta, tResolveCold) = StressUtil.timedValue(
        graft.sources.LakehouseBatch.resolve(path))
      // the two r7-verdict 100×-scale claims, asserted per x:
      // (a) ZERO data-file footer opens at plan time (rows come from
      // the manifests the commits wrote);
      val footerOpens =
        graft.sources.LakehouseBatch.footerOpens.get() - opensBefore
      require(footerOpens == 0L,
        s"x=$x resolve opened $footerOpens data-file footers — the " +
          "manifest rows column must serve them")
      // (b) driver heap independent of bloomColumns: no blob rides the
      // collected stats rows; blobs load lazily ONLY when a filter
      // probes the bloom column, candidate-filtered
      require(meta.dataFiles.flatMap(_.stats).forall(
        !_.schema.fieldNames.exists(_.startsWith("bloom_"))),
        s"x=$x plan-time stats rows carry bloom blobs")
      require(meta.bloomCache.bytes == 0L,
        s"x=$x bloom cache non-empty before any probe")
      val bloomProbeMs = StressUtil.timed {
        graft.sources.LakehouseBatch.skipFiles(meta, Array(
          org.apache.spark.sql.sources.EqualTo("v", 12345L)))
        ()
      } * 1000
      val bloomBytes = meta.bloomCache.bytes
      require(meta.dataFiles.length == commits * filesPerCommit,
        s"x=$x expected ${commits * filesPerCommit} files, " +
          s"got ${meta.dataFiles.length}")
      def planOnce(): Unit = {
        val df = spark.read
          .format("graft.sources.LakehouseBatchProvider")
          .schema(schema).load(path)
          .filter(col("k") >= 5000L && col("k") < 15000L)
          .groupBy().count()
        df.queryExecution.executedPlan // forces full planning
        ()
      }
      // plan-only timing: build the filtered scan and force planning
      // (executedPlan), no job submission
      val tPlanCold = (1 to 3).map(_ => timed(planOnce())).min
      spark.conf.set("spark.graft.metaCacheEntries", "64")
      graft.sources.LakehouseBatch.resolve(path) // populate
      val tResolveWarm = (1 to 3).map(_ => timed {
        graft.sources.LakehouseBatch.resolve(path); ()
      }).min
      val tPlanWarm = (1 to 3).map(_ => timed(planOnce())).min
      f"""{"x":$x,"files":${meta.dataFiles.length},"commits":$commits,"resolve_ms":${tResolveCold * 1000}%.0f,"resolve_warm_ms":${tResolveWarm * 1000}%.0f,"plan_ms":${tPlanCold * 1000}%.0f,"plan_warm_ms":${tPlanWarm * 1000}%.0f,"footer_opens":$footerOpens,"bloom_probe_ms":$bloomProbeMs%.0f,"bloom_cache_bytes":$bloomBytes}"""
    }
    out.foreach(println)
    spark.stop()
  }
}

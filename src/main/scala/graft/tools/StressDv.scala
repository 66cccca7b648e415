package graft.tools

import graft.storage.Lakehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Deletion-vector stress: quantifies the executor-side sidecar design —
  * serve cost must track the DATA being read, not the deleted-row
  * count, because positions never transit the driver (the round-6
  * implementation collected every position into scan descriptors /
  * a broadcast anti-join, an O(#deleted rows) driver ceiling).
  *
  * For each replication factor x (table = 1M·x rows, then a MoR delete
  * tombstoning ~10% of them = 100k·x positions across every file):
  *   - `delete_sec`: the deleteRowsMoR commit (identity pass + sidecar
  *     write — scales with the data scanned, as any predicate must);
  *   - `serve_sec`: a full aggregate over the masked table via
  *     Lakehouse.read (the DvSurvives filter path);
  *   - `serve_v2_sec`: the same through the V2 catalog scan (partition
  *     readers opening sidecars executor-side);
  *   - `plan_ms`: time to PLAN (not run) the V2 read — the driver-side
  *     cost, which must stay ~flat in deleted rows (it reads sidecar
  *     names + 16-byte headers only).
  * Row counts are asserted, not assumed (exactly 90% survive).
  *
  * Usage: `sbt "runMain graft.tools.StressDv [xFactors...]"`
  * (default `1 10 30`). One JSON line per x.
  */
object StressDv {
  def main(args: Array[String]): Unit = {
    val xs = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 30)
    val spark = graft.GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-dvstress")
    spark.conf.set("spark.sql.catalog.dvs", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvs.root", dir.resolve("lake").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvs.s")
    val schema = StructType.fromDDL("k BIGINT, v BIGINT")

    import StressUtil.{timed, drain}
    val out = for (x <- xs) yield {
      val rows = 1000000L * x
      val lake = new Lakehouse(spark, dir.resolve("lake/s").toString)
      val t = s"t$x"
      spark.sql(s"DROP TABLE IF EXISTS dvs.s.$t")
      spark.sql(s"CREATE TABLE dvs.s.$t (k BIGINT, v BIGINT)")
      spark.sql(
        s"INSERT INTO dvs.s.$t SELECT id, id * 3 FROM range(0, $rows)")
      val tDelete = timed {
        lake.deleteRowsMoR(t, schema, col("k") % 10 === 0)
      }
      val tServe = timed {
        val got = lake.read(t, schema).agg(count(lit(1))).head().getLong(0)
        require(got == rows - rows / 10, s"x=$x lakehouse read: $got")
      }
      // plan-only: resolve + planInputPartitions, no job
      val tPlanMs = timed {
        drain(spark.table(s"dvs.s.$t").limit(0))
      } * 1000.0
      // COUNT(*) under DVs is a PUSHED metadata answer since round 8 —
      // time it separately from a real masked scan (sum can't push)
      val tCountV2 = timed {
        val got = spark.sql(s"SELECT count(*) FROM dvs.s.$t")
          .head().getLong(0)
        require(got == rows - rows / 10, s"x=$x v2 count: $got")
      }
      val tServeV2 = timed {
        val got = spark.sql(s"SELECT sum(v) FROM dvs.s.$t")
          .head().getLong(0)
        val m = rows / 10
        val want = 3L * (rows * (rows - 1) / 2 - 10L * (m * (m - 1) / 2))
        require(got == want, s"x=$x v2 sum: $got != $want")
      }
      f"""{"x":$x,"rows":$rows,"deleted":${rows / 10},"delete_sec":$tDelete%.2f,"serve_sec":$tServe%.2f,"serve_v2_sec":$tServeV2%.2f,"count_v2_sec":$tCountV2%.2f,"plan_ms":$tPlanMs%.0f}"""
    }
    out.foreach(println)
    spark.stop()
  }
}

package graft.tools

import graft.storage.Lakehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Partial-compaction stress (rewriteDeletes): quantifies the two claims
  * that make delete-threshold rewriting the right standing maintenance
  * job for a 100 TB merge-on-read table —
  *
  *  1. REWRITE COST tracks the delete-dense files, not the table: the
  *     table is seeded in `files` equal slices and only ~`denseFrac` of
  *     them are deleted past the threshold, so the rewrite must touch
  *     that fraction of the bytes no matter how large the table is;
  *  2. SERVE COST after the rewrite returns to clean-table cost: the
  *     V2 scan plans ZERO tasks for replaced files (the masked bytes
  *     are not even listed as work), where the pre-rewrite masked read
  *     pays full scan + sidecar probes on every dense file.
  *
  * For each replication x (table = 1M·x rows in 20 files):
  *   - `delete_sec`: one MoR delete tombstoning 90% of 25% of the files
  *     (dense) and 0.1% of the rest (sparse — stays under threshold);
  *   - `serve_masked_sec`: full V2 aggregate BEFORE the rewrite (reads
  *     every byte incl. the 90%-dead files);
  *   - `rewrite_sec`: `rewriteDeletes(threshold=0.5)` — must replace
  *     exactly the dense files;
  *   - `serve_after_sec`: the same aggregate AFTER — the replaced
  *     files plan no tasks, so this must undercut `serve_masked_sec`
  *     and track the live data.
  * Row counts are asserted at every step, never assumed.
  *
  * Usage: `sbt "runMain graft.tools.StressRewrite [xFactors...]"`
  * (default `1 10 30`). One JSON line per x.
  */
object StressRewrite {
  def main(args: Array[String]): Unit = {
    val xs = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 30)
    val spark = graft.GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-rwstress")
    val schema = StructType.fromDDL("k BIGINT, v BIGINT")
    val files = 20

    import StressUtil.timed
    val out = for (x <- xs) yield {
      val rows = 1000000L * x
      val lake = new Lakehouse(spark, dir.resolve(s"lake$x").toString)
      val slice = rows / files
      // `files` equal contiguous slices, one data file each
      (0 until files).foreach { i =>
        lake.append("t", spark.range(i * slice, (i + 1) * slice)
          .select(col("id").as("k"), (col("id") * 3).as("v"))
          .coalesce(1))
      }
      // dense: 90% of the first 5 files' rows; sparse: 0.1% of the rest
      val denseTop = 5 * slice
      val tDelete = timed {
        lake.deleteRowsMoR("t", schema,
          (col("k") < denseTop && col("k") % 10 =!= 0) ||
            (col("k") >= denseTop && col("k") % 1000 === 0))
      }
      val expect = (denseTop / 10) +
        (rows - denseTop) - (rows - denseTop) / 1000
      val tMasked = timed {
        val got = lake.read("t", schema).agg(count(lit(1))).head().getLong(0)
        require(got == expect, s"x=$x masked read: $got != $expect")
      }
      val tRewrite = timed {
        val replaced = lake.rewriteDeletes("t", schema, 0.5)
        require(replaced.sizeIs == 5,
          s"x=$x exactly the 5 dense files must be replaced: $replaced")
      }
      val tAfter = timed {
        val got = spark.read
          .format("graft.sources.LakehouseBatchProvider")
          .schema(schema).load(lake.tablePath("t"))
          .agg(count(lit(1))).head().getLong(0)
        require(got == expect, s"x=$x post-rewrite read: $got != $expect")
      }
      f"""{"x":$x,"rows":$rows,"files":$files,"delete_sec":$tDelete%.2f,"serve_masked_sec":$tMasked%.2f,"rewrite_sec":$tRewrite%.2f,"serve_after_sec":$tAfter%.2f}"""
    }
    out.foreach(println)
    spark.stop()
  }
}

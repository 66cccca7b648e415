package graft.tools

import graft.storage.Lakehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Merge-on-read UPDATE stress (q90's `updateRowsMoR`): an update must
  * cost the masked identity scan plus writes sized by the MATCHED rows
  * — never a table rewrite — and serving the updated table must track
  * the data read, not the mutation history. The second update runs
  * over the FIRST update's own masks (composition through
  * readMaskedWithPos), which is where a wrong sequence-rule
  * implementation would double-apply or resurrect rows — sums are
  * asserted exactly after each step.
  *
  * For each replication factor x (table = 1M·x rows; each update
  * touches 1% = 10k·x rows, `v := v + 1`):
  *   - `update_sec`: the updateRowsMoR commit (masked scan + DV +
  *     post-image files);
  *   - `update2_sec`: the same update again — now reading through the
  *     previous commit's masks;
  *   - `serve_sec` / `serve_v2_sec`: full masked SUM via Lakehouse.read
  *     and via the V2 catalog scan (vectorized, selection-remapped);
  *   - `plan_ms`: V2 plan-only cost (must stay ~flat — the driver
  *     touches sidecar names + the counts index, never positions).
  *
  * Usage: `sbt "runMain graft.tools.StressMor [xFactors...]"`
  * (default `1 10 30`). One JSON line per x.
  */
object StressMor {
  def main(args: Array[String]): Unit = {
    val xs = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 30)
    val spark = graft.GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-morstress")
    spark.conf.set("spark.sql.catalog.mors", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mors.root",
      dir.resolve("lake").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mors.s")
    val schema = StructType.fromDDL("k BIGINT, v BIGINT")

    import StressUtil.{timed, drain}
    val out = for (x <- xs) yield {
      val rows = 1000000L * x
      val touched = rows / 100
      val lake = new Lakehouse(spark, dir.resolve("lake/s").toString)
      val t = s"t$x"
      spark.sql(s"DROP TABLE IF EXISTS mors.s.$t")
      spark.sql(s"CREATE TABLE mors.s.$t (k BIGINT, v BIGINT)")
      spark.sql(
        s"INSERT INTO mors.s.$t SELECT id, id * 3 FROM range(0, $rows)")
      val base = 3L * (rows * (rows - 1) / 2)
      def assertSum(label: String, want: Long): Unit = {
        val got = spark.sql(s"SELECT sum(v) FROM mors.s.$t")
          .head().getLong(0)
        require(got == want, s"x=$x $label: $got != $want")
      }
      val tUpdate = timed {
        lake.updateRowsMoR(t, schema, col("k") % 100 === 0,
          Seq("v" -> (col("v") + 1L)))
      }
      val tServeV2 = timed(assertSum("after update 1", base + touched))
      // composition: the second update reads THROUGH the first's masks
      val tUpdate2 = timed {
        lake.updateRowsMoR(t, schema, col("k") % 100 === 0,
          Seq("v" -> (col("v") + 1L)))
      }
      val tServe = timed {
        val got = lake.read(t, schema).agg(sum(col("v"))).head().getLong(0)
        require(got == base + 2 * touched, s"x=$x lakehouse read: $got")
      }
      val tPlanMs = timed {
        drain(spark.table(s"mors.s.$t").limit(0))
      } * 1000.0
      f"""{"x":$x,"rows":$rows,"touched":$touched,"update_sec":$tUpdate%.2f,"update2_sec":$tUpdate2%.2f,"serve_sec":$tServe%.2f,"serve_v2_sec":$tServeV2%.2f,"plan_ms":$tPlanMs%.0f}"""
    }
    out.foreach(println)
    spark.stop()
  }
}

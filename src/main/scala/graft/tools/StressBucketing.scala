package graft.tools

import graft.storage.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed-layout stress: quantifies the q54 scale story — what the
  * one-off co-located layout buys per join — at growing data size.
  *
  * For each replication factor x: lineitem/orders (sf0.1) are scaled x×
  * with globally unique order keys, then the same join+per-order
  * aggregate is timed three ways:
  *   - `shuffle_sec`: plain frames — both sides exchange on the key
  *     (what every repeated query pays without a layout);
  *   - `layout_sec`: the one-off bucketed+sorted write of BOTH tables
  *     (the amortized cost);
  *   - `bucketed_sec`: the same query on the bucketed catalog tables —
  *     zero exchanges (the q54 plan, pinned in PlanSpec).
  * The layout pays for itself after ceil(layout/(shuffle−bucketed))
  * queries; at 100 TB the shuffle side also carries network+spill costs
  * local[32] cannot model, so the measured ratio is a LOWER bound on
  * the win.
  *
  * Usage: `sbt "runMain graft.tools.StressBucketing [xFactors...]"`
  * (default `1 10`). One JSON line per x.
  */
object StressBucketing {
  def main(args: Array[String]): Unit = {
    val xs = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10)
    val spark = graft.GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-bstress")
    val lake = new Lakehouse(spark, dir.resolve("lake").toString)

    val li0 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val or0 = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .select(col("o_orderkey"), col("o_orderdate"))
    val keySpan = or0.agg(max(col("o_orderkey"))).head().getLong(0) + 1L

    import StressUtil.{timed, drain}
    def query(a: DataFrame, b: DataFrame): DataFrame =
      a.hint("merge").join(b, "l_orderkey")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .filter(col("n_items") >= 5)

    val out = for (x <- xs) yield {
      val reps = spark.range(0, x).select(col("id").as("_r"))
      // one materialization point each: the replicated frames feed three
      // timed paths; without it the crossJoin re-runs inside every one
      val li = li0.crossJoin(reps)
        .select((col("l_orderkey") + col("_r") * keySpan).as("l_orderkey"),
          col("l_extendedprice"), col("l_discount"))
        .localCheckpoint(eager = true)
      val ord = or0.crossJoin(reps)
        .select((col("o_orderkey") + col("_r") * keySpan).as("l_orderkey"),
          col("o_orderdate"))
        .localCheckpoint(eager = true)
      val nLi = li.count()

      val tShuffle = timed(drain(query(li, ord)))
      val buckets = 32
      val tLayout = timed {
        lake.writeBucketed(s"bs_li_$x",
          li.repartition(buckets, col("l_orderkey")), "l_orderkey", buckets)
        lake.writeBucketed(s"bs_or_$x",
          ord.repartition(buckets, col("l_orderkey")), "l_orderkey", buckets)
      }
      val tBucketed = timed(drain(query(
        lake.readTable(s"bs_li_$x"), lake.readTable(s"bs_or_$x"))))
      f"""{"x":$x,"lineitem_rows":$nLi,"shuffle_sec":$tShuffle%.2f,"layout_sec":$tLayout%.2f,"bucketed_sec":$tBucketed%.2f}"""
    }
    out.foreach(println)
    spark.stop()
  }
}

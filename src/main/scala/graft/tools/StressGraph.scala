package graft.tools

import graft.ops.Components
import org.apache.spark.sql.functions._

/** Skewed-graph stress for connected components (round-2 verdict item 7):
  * one GIANT component containing a heavy-hitter hub node, plus a long
  * tail of small components — the adversarial shape for label
  * propagation, where (a) the hub's neighbor join is maximally skewed on
  * one key and (b) a long path would cost O(diameter) rounds without
  * pointer doubling.
  *
  * Graph at scale x: n = 5000·x nodes.
  *   - hub: node 0 ← edges from every node ≡ 0 (mod 10) — n/10 edges on
  *     ONE join key (the skew stressor; AQE skew-join handles the
  *     symmetrized neighbor join);
  *   - path: i → i+1 for all i < n/2 — one component of diameter n/2
  *     (the pointer-doubling stressor: n=150k at x=30 needs ~17 doubling
  *     rounds, vs 75k propagation rounds without doubling);
  *   - tail: pairs (i, i+1) for even i ≥ n/2 — n/4 two-node components.
  *
  * The hub edges land inside the path's component, so the giant component
  * is n/2 nodes + every 10th node above — one component holding >55% of
  * all nodes. Prints rounds-bounded timings; the assertion of interest is
  * that time grows ≤ linearly in n and the loop converges (no round-count
  * blow-up), regardless of skew.
  *
  * Usage: `sbt "runMain graft.tools.StressGraph [xFactors...]"` (default
  * `1 10 30`).
  */
object StressGraph {
  def main(args: Array[String]): Unit = {
    val xs = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 30)
    val spark = graft.GraftSession.get()

    import StressUtil.{timedValue => timed}

    val out = xs.map { x =>
      val n = 5000L * x
      val nodes = spark.range(0, n).select(col("id"))
      val hub = spark.range(1, n / 10)
        .select((col("id") * 10).as("src"), lit(0L).as("dst"))
      val path = spark.range(0, n / 2 - 1)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val tail = spark.range(n / 4, n / 2)
        .select((col("id") * 2).as("src"), (col("id") * 2 + 1).as("dst"))
      val edges = hub.unionByName(path).unionByName(tail)

      val (comps, sec) = timed {
        Components.connectedComponents(nodes, edges).localCheckpoint(eager = true)
      }
      val nComp = comps.select(col("component")).distinct().count()
      val giant = comps.groupBy(col("component")).count()
        .agg(max(col("count"))).head().getLong(0)
      f"""{"x":$x,"nodes":$n,"cc_sec":$sec%.1f,"components":$nComp,"giant":$giant}"""
    }
    out.foreach(println)
    spark.stop()
  }
}

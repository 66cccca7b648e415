package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {

  test("connected components: chains, triangles, singletons, orientation") {
    import spark.implicits._
    val nodes = (1L to 9L).toDF("id")
    // component {1,2,3,4} as a chain (diameter 3), {5,6,7} as a triangle
    // with mixed edge orientation, {8} {9} singletons
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (5L, 6L), (7L, 6L), (5L, 7L)
    ).toDF("src", "dst")
    val got = Components.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L,
      8L -> 8L, 9L -> 9L))
  }

  test("connected components: 300-node path converges in O(log D) rounds") {
    import spark.implicits._
    val n = 300L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    // pointer doubling covers ~2^k hops after k rounds; without the
    // shortcut this graph needs ~n rounds and maxIter=12 would throw
    val got = Components.connectedComponents(nodes, edges, maxIter = 12)
      .select(countDistinct(col("component"))).first().getLong(0)
    assert(got === 1L)
  }

  test("property: random graphs match a brute-force union-find oracle") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val nEdges = rnd.nextInt(n)
      val edges = Seq.fill(nEdges)(
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n)))
        .filter { case (a, b) => a != b }

      // driver-side union-find oracle
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (1 to n).map(i => i.toLong -> find(i).toLong).toMap

      val got = Components.connectedComponents(
        (1L to n.toLong).toDF("id"), edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial: n=$n edges=$edges")
    }
  }
}

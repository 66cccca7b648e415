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

  test("connected components: long path converges within maxIter") {
    import spark.implicits._
    val n = 20L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Components.connectedComponents(nodes, edges)
      .select(countDistinct(col("component"))).first().getLong(0)
    assert(got === 1L)
  }
}

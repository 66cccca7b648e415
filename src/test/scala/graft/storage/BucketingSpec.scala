package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides bucketed on the join key →
  * the join plan has NO shuffle exchange (the 100 TB answer to repeated
  * large-fact joins on the same key).
  */
class BucketingSpec extends SparkSpec {

  test("join of two co-bucketed tables is exchange-free and correct") {
    // disable broadcast so the test pins the bucketed SortMergeJoin path
    // (a broadcast join would be trivially exchange-free)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val lake = new Lakehouse(spark, tmpDir("bucketing"))
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))

    lake.writeBucketed("b_lineitem", li, "l_orderkey", buckets = 8)
    lake.writeBucketed("b_orders",
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey",
      buckets = 8)

    val joined = lake.readTable("b_lineitem")
      .join(lake.readTable("b_orders"), "l_orderkey")
    val plan = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("SortMergeJoin"), plan)

    // correctness vs the plain (shuffling) join
    val expected = li.join(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey").count()
    assert(joined.count() === expected)

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
  }
}

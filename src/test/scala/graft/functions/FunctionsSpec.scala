package graft.functions

import graft.SparkSpec

/** SQL registration of the native expressions (GraftExtensions). */
class FunctionsSpec extends SparkSpec {

  test("md5_prefix64 is callable from SQL and matches the hex-parse form") {
    val r = spark.sql(
      """SELECT md5_prefix64('key') AS a,
        | CAST(conv(substring(md5('key'), 1, 8), 16, 10) AS BIGINT) AS b
        |""".stripMargin).first()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) === 0x3c6e0b8aL)
  }

  test("eval_once is callable from SQL and is an identity") {
    import spark.implicits._
    Seq(1, 2, 3).toDF("x").createOrReplaceTempView("v_eval_once")
    val rows = spark.sql(
      "SELECT eval_once(x * 10) AS y FROM v_eval_once ORDER BY y")
      .as[Int].collect()
    assert(rows.toSeq === Seq(10, 20, 30))
  }

  test("eval_once blocks filter pushdown through its alias") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // spark.range, not a literal Seq: a LocalRelation would be folded away
    // by the optimizer before the pushdown question even arises
    val df = spark.range(1, 4).select(col("id").cast("int").as("x"))
      .select(col("x"), EvalOnce(col("x") * 10).as("y"))
      .filter(col("y") >= 20)
    val plan = df.queryExecution.optimizedPlan.toString
    // the filter must reference the materialized alias, not an inlined
    // (x * 10) re-evaluation
    assert(plan.contains("eval_once"), plan)
    assert(df.as[(Int, Int)].collect().toSeq.sorted === Seq((2, 20), (3, 30)))
  }
}

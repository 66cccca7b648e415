package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JDBC source/sink against embedded Derby — the external-DB surface
  * (reference insert_from_excel.py ODBC load / plot_report.py read).
  */
class JdbcSpec extends SparkSpec {

  private def freshUrl(): String =
    s"jdbc:derby:${tmpDir("jdbc-spec")}/db;create=true"

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, d("2020-05-01"), dec("10.50"), "O"),
      (2L, d("2020-05-02"), dec("20.25"), "F"),
      (3L, d("2020-06-03"), dec("30.00"), "P"),
      (4L, d("2020-06-04"), dec("40.75"), "O"),
      (5L, d("2020-07-05"), dec("50.10"), "F"))
      .toDF("k", "dt", "amt", "status")
      .withColumn("amt", col("amt").cast("decimal(18,2)"))
  }

  test("write/read round trip preserves rows, dates and decimals") {
    val url = freshUrl()
    Jdbc.write(fixture, url, "t_round",
      columnTypes = Some("status VARCHAR(1)"))
    val back = Jdbc.read(spark, url, "t_round")
    assert(back.count() === 5)
    val got = back.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getDate(1).toString,
        r.getDecimal(2).toPlainString, r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, "2020-05-01", "10.50", "O"), (2L, "2020-05-02", "20.25", "F"),
      (3L, "2020-06-03", "30.00", "P"), (4L, "2020-06-04", "40.75", "O"),
      (5L, "2020-07-05", "50.10", "F")))
  }

  test("partitioned read fans out to N range partitions, filter pushed") {
    val url = freshUrl()
    Jdbc.write(fixture, url, "t_part",
      columnTypes = Some("status VARCHAR(1)"))
    val back = Jdbc.readPartitioned(spark, url, "t_part", "k",
      lowerBound = 1L, upperBound = 5L, numPartitions = 4)
    assert(back.rdd.getNumPartitions === 4)
    val filtered = back.filter(col("status") =!= "P")
    // the status predicate must appear INSIDE the PushedFilters bracket —
    // a bare contains("PushedFilters") would pass on 'PushedFilters: []'
    // with Spark re-filtering locally, silently losing the remote pushdown
    val plan = filtered.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*status[^\\]]*\\]".r
      .findFirstIn(plan).isDefined, plan)
    assert(filtered.count() === 4)
    assert(filtered.agg(sum("k")).head.getLong(0) === 12L)
  }

  test("append mode accumulates across writes") {
    val url = freshUrl()
    Jdbc.write(fixture, url, "t_app", columnTypes = Some("status VARCHAR(1)"))
    Jdbc.write(fixture.filter(col("k") <= 2), url, "t_app",
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(Jdbc.read(spark, url, "t_app").count() === 7)
  }
}

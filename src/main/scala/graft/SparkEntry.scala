package graft

import graft.queries.{PipelinePack, RelationalPack, StreamingPack, TrainingPack}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the operator packs; every entry with an
  * `oracleSql` counterpart is hash-checked against DuckDB at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-table join chain + aggregation (SURVEY §2.3 J3) — the densest
    * single plan in the inventory.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_join5_revenue")(spark, "/root/testdata/sf0.001")

  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalPack.queries, RelationalPack.oracles),
      (TrainingPack.queries, TrainingPack.oracles),
      (StreamingPack.queries, StreamingPack.oracles),
      (PipelinePack.queries, PipelinePack.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.iterator.map(_._2).reduce(_ ++ _)
}

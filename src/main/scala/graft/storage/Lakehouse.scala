package graft.storage

import graft.model.Schemas
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Thin parquet table layer (no Delta/Iceberg jars in this env —
  * SURVEY.md §7.1). One directory per table under `root`.
  *
  * Semantics needed by the DWH:
  *   - `append` — plain parquet append (fact, report, landing loads);
  *   - `overwrite` — SCD merge result snapshots. In-place UPDATE doesn't
  *     exist on parquet, so the merged DataFrame is materialized to a
  *     staging dir first (which forces computation — the plan may read the
  *     table being replaced), then swapped in via delete + rename. The swap
  *     is two metadata ops, not atomic across a crash; a real deployment
  *     would layer Delta/Iceberg commits here, the query-side API is
  *     unchanged.
  *   - day-partitioned fact writes (`partitionBy`) so lookback predicates
  *     prune partitions at 100 TB instead of scanning history.
  */
final class Lakehouse(val spark: SparkSession, val root: String) {
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tablePath(name: String): String = s"$root/$name"
  def exists(name: String): Boolean = fs.exists(new Path(tablePath(name)))

  /** Read a table; absent or empty tables yield an empty DataFrame with the
    * registered schema, so first-run ETL needs no special-casing.
    */
  def read(name: String): DataFrame = {
    val schema = Schemas.byName.getOrElse(name,
      throw new IllegalArgumentException(s"unknown table: $name"))
    if (exists(name))
      // explicit schema: an empty parquet dir or partition-discovery columns
      // must not change the contract
      spark.read.schema(readSchema(name, schema)).parquet(tablePath(name))
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Fact is written with an extra partition column; include it on read. */
  private def readSchema(name: String, schema: StructType): StructType =
    if (name == "fact_transactions")
      schema.add("trans_dt_day", org.apache.spark.sql.types.DateType)
    else schema

  /** Like [[read]] but keeps physical partition columns (e.g. the fact's
    * `trans_dt_day`) so callers can write partition-pruning predicates.
    */
  def readWithPartitionColumns(name: String): DataFrame = {
    val schema = Schemas.byName.getOrElse(name,
      throw new IllegalArgumentException(s"unknown table: $name"))
    val full = readSchema(name, schema)
    if (exists(name))
      spark.read.schema(full).parquet(tablePath(name))
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], full)
  }

  def append(name: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(tablePath(name))

  /** Append with day partitioning (fact table). */
  def appendPartitionedByDay(name: String, df: DataFrame, tsCol: String): Unit =
    df.withColumn("trans_dt_day", to_date(col(tsCol)))
      .write.mode("append").partitionBy("trans_dt_day")
      .parquet(tablePath(name))

  /** Atomic-ish snapshot replace: materialize to staging, then swap. */
  def overwrite(name: String, df: DataFrame): Unit = {
    val dest = new Path(tablePath(name))
    val tmp = new Path(s"$root/.staging/$name-${System.nanoTime()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dest)) fs.delete(dest, true)
    fs.mkdirs(dest.getParent)
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(s"rename failed for $name")
  }

  /** Bucketed write: pre-shuffles into `buckets` files per bucket key and
    * registers a catalog table, so later equi-joins/aggregations on `key`
    * between co-bucketed tables run WITHOUT an exchange — the lakehouse
    * analogue of the reference's `distributed by (key)` co-location
    * (DDL.sql:40,59; verified shuffle-free in BucketingSpec).
    */
  def writeBucketed(name: String, df: DataFrame, key: String,
      buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", tablePath(name))
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(name)
  }

  def readTable(name: String): DataFrame = spark.table(name)

  /** TRUNCATE (ETL.sql:447): drop the data, keep the (virtual) table. */
  def truncate(name: String): Unit = {
    val dest = new Path(tablePath(name))
    if (fs.exists(dest)) fs.delete(dest, true)
  }

  def drop(name: String): Unit = truncate(name)
}

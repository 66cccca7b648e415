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
  *     exist on parquet, so each snapshot is written to a fresh version
  *     directory `<table>/_v<N>/` and committed by atomically creating a
  *     single `_GRAFT_COMMIT` marker file inside it. Readers resolve the
  *     highest committed version; a crash at ANY point before the marker
  *     exists leaves the previous snapshot fully readable (the miniature
  *     form of a Delta/Iceberg commit log — no jars for those ship in this
  *     env). Older versions are garbage-collected after commit; a crash
  *     during GC only leaves shadowed dirs that the next overwrite removes.
  *   - day-partitioned fact writes (`partitionBy`) so lookback predicates
  *     prune partitions at 100 TB instead of scanning history.
  */
final class Lakehouse(val spark: SparkSession, val root: String) {
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tablePath(name: String): String = s"$root/$name"
  def exists(name: String): Boolean = fs.exists(new Path(tablePath(name)))

  private val VersionPrefix = "_v"
  private val CommitMarker = "_GRAFT_COMMIT"

  /** (version, dir) for every `_v<N>` subdir of a table, committed or not. */
  private def versionDirs(dest: Path): Seq[(Long, Path)] =
    if (!fs.exists(dest)) Seq.empty
    else fs.listStatus(dest).toSeq.collect {
      case st if st.isDirectory &&
          st.getPath.getName.startsWith(VersionPrefix) &&
          st.getPath.getName.drop(VersionPrefix.length).forall(_.isDigit) =>
        (st.getPath.getName.drop(VersionPrefix.length).toLong, st.getPath)
    }

  private def isCommitted(vdir: Path): Boolean =
    fs.exists(new Path(vdir, CommitMarker))

  /** The directory readers (and appends) should target: the highest
    * committed version for versioned tables, the table dir itself for the
    * plain append layout. Underscore-prefixed version dirs are invisible to
    * Spark's file listing, so an uncommitted (crashed) version under a plain
    * dir can never leak rows.
    */
  def dataPath(name: String): String = {
    val dest = new Path(tablePath(name))
    val committed = versionDirs(dest).filter { case (_, p) => isCommitted(p) }
    if (committed.isEmpty) dest.toString
    else committed.maxBy(_._1)._2.toString
  }

  /** Read a table; absent or empty tables yield an empty DataFrame with the
    * registered schema, so first-run ETL needs no special-casing.
    */
  def read(name: String): DataFrame = {
    val schema = Schemas.byName.getOrElse(name,
      throw new IllegalArgumentException(s"unknown table: $name"))
    if (exists(name))
      // explicit schema: an empty parquet dir or partition-discovery columns
      // must not change the contract
      spark.read.schema(readSchema(name, schema)).parquet(dataPath(name))
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
      spark.read.schema(full).parquet(dataPath(name))
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], full)
  }

  def append(name: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(dataPath(name))

  /** Append with day partitioning (fact table). */
  def appendPartitionedByDay(name: String, df: DataFrame, tsCol: String): Unit =
    df.withColumn("trans_dt_day", to_date(col(tsCol)))
      .write.mode("append").partitionBy("trans_dt_day")
      .parquet(tablePath(name))

  /** Crash-safe snapshot replace. Protocol:
    *   1. write the new snapshot to `<table>/_v<N>` (N = max existing + 1;
    *      the write may read the table being replaced — the old version's
    *      files are untouched);
    *   2. COMMIT: create the `_GRAFT_COMMIT` marker in the new dir — one
    *      atomic file-create, after which [[dataPath]] resolves to vN;
    *   3. GC older versions and any pre-versioning top-level data files
    *      (post-commit; a crash here leaves shadowed garbage only).
    * A test hook runs between write and commit so LakehouseSpec can prove a
    * crash in the window leaves the previous snapshot readable.
    */
  def overwrite(name: String, df: DataFrame,
      beforeCommit: () => Unit = () => ()): Unit = {
    val dest = new Path(tablePath(name))
    val all = versionDirs(dest)
    val next = all.map(_._1).maxOption.getOrElse(0L) + 1L
    val vdir = new Path(dest, s"$VersionPrefix$next")
    df.write.mode("overwrite").parquet(vdir.toString)
    beforeCommit()
    fs.create(new Path(vdir, CommitMarker), false).close() // the commit point
    // GC: everything except the just-committed version.
    all.foreach { case (_, p) => fs.delete(p, true) }
    fs.listStatus(dest).foreach { st =>
      val n = st.getPath.getName
      if (n != vdir.getName && !n.startsWith("_") && !n.startsWith("."))
        fs.delete(st.getPath, true)
    }
  }

  /** Small-file compaction: rewrite the current snapshot into `numFiles`
    * files via the crash-safe overwrite protocol (readers see the old
    * layout until the commit marker lands). Append-heavy tables accumulate
    * one file per micro-batch/day-load; at cluster scale the open-file and
    * footer-read overhead of thousands of small files dominates scan time,
    * and compaction is the standing maintenance job every lakehouse runs.
    */
  def compact(name: String, numFiles: Int): Unit =
    overwrite(name, read(name).repartition(numFiles))

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

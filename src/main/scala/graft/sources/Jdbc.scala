package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** External-DB connectivity — the reference's ODBC surface, Spark-first.
  *
  * The reference loads its landing table over ODBC
  * (insert_from_excel.py:42-47) and its report reader pulls rows back over
  * pyodbc (plot_report.py:8-13). The Spark-native equivalent is the
  * built-in JDBC relation: a declarative scan Catalyst can push predicates
  * into, not a driver-side cursor loop.
  *
  * Scale contract (the part that matters at 100 TB):
  *   - Reads MUST be partitioned. A bare `spark.read.jdbc(url, table)` is
  *     ONE task pulling the whole table through one connection — fine for
  *     a broadcast-sized dim, fatal for a fact. [[readPartitioned]] issues
  *     `numPartitions` parallel range queries on a numeric/date column,
  *     which is Spark's unit of JDBC parallelism.
  *   - Predicate pushdown is free: filters on the returned frame compile
  *     into the remote WHERE clause (`PushedFilters` in the scan node), so
  *     the database ships only matching rows. JdbcSpec pins this.
  *   - Writes batch inserts (`batchsize`) over a bounded number of
  *     connections — `numPartitions` caps concurrent sessions so a
  *     1000-executor cluster cannot open 1000 connections against one DB.
  *
  * Tested against embedded Derby (the only DB in this container); the
  * options are engine-portable — any JDBC url + driver class works.
  */
object Jdbc {

  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  // Derby writes its engine log to user.dir unless told otherwise — keep
  // it out of the repo checkout
  if (System.getProperty("derby.stream.error.file") == null)
    System.setProperty("derby.stream.error.file",
      s"${System.getProperty("java.io.tmpdir")}/derby.log")

  /** Batched, connection-bounded append/overwrite into a JDBC table.
    *
    * `columnTypes` overrides the dialect's default DDL per column
    * (`"c VARCHAR(10), d DECIMAL(18,2)"`): Derby's dialect maps StringType
    * to CLOB, which Derby refuses to compare or GROUP BY — callers that
    * want pushdown-able string predicates must map those columns to
    * VARCHAR explicitly.
    */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite,
      columnTypes: Option[String] = None,
      driver: String = DerbyDriver,
      batchSize: Int = 10000, numPartitions: Int = 4): Unit = {
    var w = df.repartition(numPartitions).write
      .mode(mode)
      .option("driver", driver)
      .option("batchsize", batchSize.toString)
    columnTypes.foreach(ct => w = w.option("createTableColumnTypes", ct))
    w.jdbc(url, table, new Properties())
  }

  /** Single-connection read — for broadcast-sized dims ONLY. */
  def read(spark: SparkSession, url: String, table: String,
      driver: String = DerbyDriver): DataFrame =
    spark.read
      .option("driver", driver)
      .option("url", url)
      .option("dbtable", table)
      .format("jdbc").load()

  /** Parallel range-partitioned read: `numPartitions` concurrent
    * `WHERE partitionColumn BETWEEN ...` queries. Bounds only steer the
    * stride — rows outside them are still returned (by the first/last
    * partition), so stale bounds degrade parallelism, never correctness.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, driver: String = DerbyDriver): DataFrame =
    spark.read
      .option("driver", driver)
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .format("jdbc").load()
}

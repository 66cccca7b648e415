package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir; reads are
  * plain `spark.read.parquet` so Catalyst's parquet source handles column
  * pruning and filter pushdown. At cluster scale the same call reads a
  * partitioned directory — nothing here assumes single-file layout.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** `events.ts` has shipped in two physical layouts across testdata
    * generations, normalized here to a session-TZ `TimestampType` so every
    * downstream query (`unix_micros`, bigint casts, watermarks) sees one type:
    *
    *  - TIMESTAMP(NANOS): with `spark.sql.legacy.parquet.nanosAsLong=true`
    *    it surfaces as LongType nanoseconds → `timestamp_micros(ns div 1000)`
    *    (µs-grained data, so integer division is lossless; a double roundtrip
    *    would lose precision at 1e18 nanos).
    *  - TIMESTAMP(MICROS) without isAdjustedToUTC: surfaces as
    *    TIMESTAMP_NTZ → plain cast to TimestampType. The engine pins the
    *    session TZ to UTC (GraftSession), so the cast reinterprets the same
    *    micros value and matches the DuckDB oracle exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→TimestampType cast below is value-preserving ONLY under a
    // UTC session TZ; GraftSession pins it. ASSERT rather than set for a
    // self-built session: silently mutating the global session TZ would
    // shift every UNRELATED timestamp cast/parse in the caller's
    // queries, and silently proceeding would shift every NTZ instant
    // here — failing loudly is the only honest option
    require(s.conf.get("spark.sql.session.timeZone") == "UTC",
      "Tables.events requires spark.sql.session.timeZone=UTC (the NTZ " +
        "timestamp layout is reinterpreted as UTC instants); use " +
        "GraftSession.builder() or set the conf on your session")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
}

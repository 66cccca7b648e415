package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for the engine.
  *
  * Sized for the harness (`local[32]`, single JVM) but every setting scales:
  * shuffle partitions match core count locally (the driver prompt pins 32;
  * on a real cluster this would be ~2-3× total cores or AQE-coalesced), AQE
  * is on for runtime re-planning (skew joins, partition coalescing), and the
  * session timezone is pinned UTC so all wall-clock fraud-window arithmetic
  * matches the DuckDB oracle.
  */
object GraftSession {
  def builder(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      : SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which vanilla Spark 4
      // refuses; read as long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NOTE the session keeps Spark's INT96 timestamp default: the
      // driver's oracle compare reads result dumps through pandas,
      // where an isAdjustedToUTC TIMESTAMP(MICROS) surfaces tz-AWARE
      // and hash-mismatches DuckDB's naive values. Lakehouse-INTERNAL
      // writes opt into TIMESTAMP_MICROS per-write instead (the
      // footer-derived zone maps need real INT64 statistics; INT96
      // carries none) — see Lakehouse.writeVersion's scoped override.

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

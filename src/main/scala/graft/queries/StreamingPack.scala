package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-checkable Structured Streaming coverage: the batch parquet
  * testdata replayed through the streaming engine with
  * `Trigger.AvailableNow` (drain everything, then stop), results landed
  * in a memory sink and returned as a plain DataFrame.
  *
  * `Complete` output mode makes the result deterministic — every window's
  * final count is emitted regardless of watermark timing — which is what
  * lets a STREAMING query hash-match a batch DuckDB oracle exactly. The
  * unbounded-state caveats don't apply to a drain-and-stop replay; the
  * production watermarked variants live in streaming/Streams (spec-tested:
  * state there is bounded, but emission timing depends on micro-batch
  * boundaries, which no batch oracle can replicate).
  */
object StreamingPack {

  /** events.ts is TIMESTAMP(NANOS) parquet — same conversion as
    * Tables.events, on the streaming side.
    */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$d/events.parquet").schema
    // the file source wants a directory: stream the sf dir, filtered to
    // the events file
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1-hour windows × event type, streamed then drained; the
    // epoch-aligned window start equals date_trunc('hour') in the oracle
    "s01_stream_hourly_counts" -> ((s, d) => {
      val sink = s"s01_out_${System.nanoTime()}"
      val q = eventsStream(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      drained(s, sink,
        s.table(sink).select(col("window.start").as("w_start"),
          col("event_type"), col("n")))
    }),

    // stream-static join: the event stream enriched against a static
    // dimension (the batch customer table), aggregated per segment —
    // the streaming form of the mart's dim-enrichment joins
    "s02_stream_static_enrich" -> ((s, d) => {
      val sink = s"s02_out_${System.nanoTime()}"
      val cust = s.read.parquet(s"$d/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment"))
      val q = eventsStream(s, d)
        .join(cust, col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        // no DISTINCT aggregates on streams; min/max are the exact,
        // order-insensitive companions
        .agg(count(lit(1)).as("n_events"),
          min(col("user_id")).as("min_user"),
          max(col("user_id")).as("max_user"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      drained(s, sink, s.table(sink))
    })
  )

  /** Detach the (small, final) result from the memory sink and drop the
    * sink table — repeated invocations in one session (3 SFs + bench)
    * would otherwise accumulate every run's full result set on the
    * driver heap. The data already lives on the driver by the memory
    * sink's nature; this only frees it after use.
    */
  private def drained(s: SparkSession, sink: String,
      df: DataFrame): DataFrame = {
    val out = s.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)
    s.catalog.dropTempView(sink)
    out
  }

  val oracles: Map[String, String] = Map(
    "s01_stream_hourly_counts" ->
      """SELECT date_trunc('hour', ts) AS w_start, event_type,
        | count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "s02_stream_static_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        | min(user_id) AS min_user, max(user_id) AS max_user
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin
  )
}

package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events readers' TIMESTAMP_NTZ branch (ADVICE r3): a fixture
  * written with a naive TIMESTAMP(MICROS) `ts` column must surface from
  * both Tables.events and StreamingPack.eventsStream as session-TZ
  * TimestampType with the SAME unix_micros values — the cast is an
  * identity reinterpretation only under the UTC session TZ both readers
  * now REQUIRE (assert, never mutate the caller's global TZ). Until this
  * spec, the branch was exercised only by one testdata generation:
  * simplifying the match back to the LongType if/else would have passed
  * sbt test and broken that layout silently.
  */
class NtzEventsSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    val dir = tmpDir("ntz-events")
    import spark.implicits._
    val micros = Seq(
      1588291200000000L, // 2020-05-01T00:00:00Z
      1588291200000001L, // +1µs — sub-millisecond precision must survive
      1588377599999999L)
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong % 2, "click", 1.5) }
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp_ntz(timestamp_micros(col("us"))))
      .drop("us")
      .coalesce(1)
      .write.parquet(s"$dir/stage")
    // testdata ships events.parquet as a single FILE (and the streaming
    // reader's pathGlobFilter matches file names) — rename the part file
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "stage"))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(dir, "events.parquet"))
    // verify the fixture really persisted as NTZ (to_timestamp_ntz on a
    // TimestampType reinterprets under the session TZ — UTC, so values
    // are unchanged and the physical type is TIMESTAMP without TZ)
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    dir
  }

  private val expected = Set(
    1588291200000000L, 1588291200000001L, 1588377599999999L)

  test("Tables.events normalizes NTZ ts to TimestampType, micros intact") {
    val ev = graft.Tables.events(spark, fixtureDir)
    assert(ev.schema("ts").dataType == TimestampType)
    val got = ev.select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSet
    assert(got == expected, s"micros shifted: $got")
  }

  test("StreamingPack.eventsStream normalizes NTZ ts identically") {
    val sink = s"ntz_out_${System.nanoTime()}"
    val stream = graft.queries.StreamingPack.eventsStream(spark, fixtureDir)
    assert(stream.schema("ts").dataType == TimestampType)
    val q = stream.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream.format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(sink).select(col("us"))
      .collect().map(_.getLong(0)).toSet
    assert(got == expected, s"micros shifted through the stream: $got")
  }
}

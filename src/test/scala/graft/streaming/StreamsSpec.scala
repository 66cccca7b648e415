package graft.streaming

import graft.SparkSpec
import graft.model.Strings
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming specs driven synchronously: parquet fixture dir as the file
  * source, memory sink, processAllAvailable.
  */
class StreamsSpec extends SparkSpec {

  private def stageFixtures(): String = {
    val dir = tmpDir("stream-landing")
    // stage day1 fixture as the first file drop
    val src = getClass.getResource("/fixtures/day1.parquet").getPath
    val df = spark.read.parquet(src)
    graft.ingest.Ingest.conform(df).write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed txn counts with watermark over the file stream") {
    val dir = stageFixtures()
    val q = Streams.txnCountsByWindow(Streams.landingStream(spark, dir))
      .writeStream.outputMode("update").format("memory")
      .queryName("txn_counts").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.sql("SELECT count(*) FROM txn_counts").head().getLong(0)
    assert(n > 0)
    val total = spark.sql("SELECT sum(n_txns) FROM txn_counts")
      .head().getLong(0)
    assert(total === 808) // all of day 1 flows through
  }

  test("lakeSink: exactly-once appends into the lakehouse across restarts") {
    val dir = stageFixtures()
    val lake = new graft.storage.Lakehouse(spark, tmpDir("lake-sink"))
    val ckpt = tmpDir("lake-sink-ckpt")
    def drain(): Unit = {
      val q = Streams.lakeSink(Streams.landingStream(spark, dir), lake,
        "denormalized")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(lake.read("denormalized").count() === 808)
    // restart against the same checkpoint: no new files, no new commits,
    // and any replayed batch is recognized by its id — count unchanged
    drain()
    assert(lake.read("denormalized").count() === 808)
  }

  test("applyCdcBatch: newer-wins merge, out-of-order batches, replay no-op") {
    import spark.implicits._
    val lake = new graft.storage.Lakehouse(spark, tmpDir("cdc-lake"))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def apply(rows: (Long, java.sql.Timestamp, String)*): Unit =
      Streams.applyCdcBatch(lake, "cur",
        rows.toSeq.toDF("k", "ts", "v"),
        keyCols = Seq("k"), versionCols = Seq("ts"))
    def state(): Map[Long, String] = {
      val schema = Seq((1L, ts("2020-01-01 00:00:00"), "x"))
        .toDF("k", "ts", "v").schema
      lake.read("cur", schema).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
    }
    // batch 2 (later data) arrives FIRST
    val b2 = Seq((1L, ts("2020-01-01 02:00:00"), "new1"),
      (3L, ts("2020-01-01 02:00:00"), "new3"))
    val b1 = Seq((1L, ts("2020-01-01 01:00:00"), "old1"),
      (2L, ts("2020-01-01 01:00:00"), "old2"))
    apply(b2: _*)
    assert(state() === Map(1L -> "new1", 3L -> "new3"))
    // the earlier batch must NOT overwrite key 1 (newer-wins), only add 2
    apply(b1: _*)
    assert(state() === Map(1L -> "new1", 2L -> "old2", 3L -> "new3"))
    // at-least-once replay of either batch is a committed no-op
    apply(b2: _*)
    apply(b1: _*)
    assert(state() === Map(1L -> "new1", 2L -> "old2", 3L -> "new3"))
    // within-batch reduce: two versions of one key in a single batch
    apply((2L, ts("2020-01-01 03:00:00"), "v1"),
      (2L, ts("2020-01-01 04:00:00"), "v2"))
    assert(state() === Map(1L -> "new1", 2L -> "v2", 3L -> "new3"))
  }

  test("streaming dedup by fingerprint drops in-watermark duplicates") {
    import spark.implicits._
    val dir = tmpDir("dedup-stream")
    Seq(
      ("a b c", ts("2024-01-01 10:00:00")),
      ("a  B   c", ts("2024-01-01 10:01:00")), // same fingerprint (case/ws)
      ("x y z", ts("2024-01-01 10:02:00")))
      .toDF("text", "ts").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema("text STRING, ts TIMESTAMP").parquet(dir)
    val q = Streams.dedupByFingerprint(stream, "text", "ts", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val texts = spark.sql("SELECT text FROM dedup_out").collect()
      .map(_.getString(0)).sorted
    assert(texts.length === 2)
    assert(texts.contains("x y z"))
  }

  test("stream-static join: landing stream enriched with a static dim") {
    import org.apache.spark.sql.functions._
    val dir = stageFixtures()
    // static dim: terminal -> city (from the same fixture, batch-side)
    val dim = spark.read.parquet(
      getClass.getResource("/fixtures/day1.parquet").getPath)
      .select(col("terminal"), col("city")).distinct()
      .withColumnRenamed("city", "dim_city")
    val q = Streams.landingStream(spark, dir)
      .join(dim, Seq("terminal"))
      .groupBy(col("dim_city")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("enriched").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val total = spark.sql("SELECT sum(n) FROM enriched").head().getLong(0)
    assert(total === 808) // every landing row matched its terminal dim
  }

  test("stateful consecutive-reject alerts fire at the threshold") {
    val dir = stageFixtures()
    val q = Streams.consecutiveRejectAlerts(
      Streams.landingStream(spark, dir), threshold = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("alerts").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val alerts = spark.sql("SELECT * FROM alerts")
    // hand-checked against the fixture: cards with ≥3 consecutive rejects
    val expected = spark.read.parquet(
      getClass.getResource("/fixtures/day1.parquet").getPath)
      // raw fixture is TIMESTAMP_NTZ; cast to session-TZ timestamp like
      // Ingest.conform does
      .select(col("card_num"), col("trans_date").cast("timestamp"),
        col("oper_result"))
      .collect()
      .groupBy(_.getString(0))
      .count { case (_, rows) =>
        val sorted = rows.sortBy(_.getTimestamp(1).getTime).map(_.getString(2))
        sorted.foldLeft((0, false)) { case ((run, hit), r) =>
          val n = if (r == Strings.Rejected) run + 1 else 0
          (n, hit || n == 3)
        }._2
      }
    assert(alerts.count() === expected)
  }
}

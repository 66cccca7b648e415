package graft.sources

import graft.SparkSpec
import graft.storage.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** The DSv2 streaming source over a lakehouse table's commit log:
  * offsets = commit versions, visibility = commit markers, maintenance
  * composition via recorded change feeds, restart from checkpoint.
  */
class LakehouseStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schemaDDL =
    "k BIGINT, name STRING, score DOUBLE, at TIMESTAMP"
  private val schema = StructType.fromDDL(schemaDDL)

  private def batchDf(rows: (Long, String, Double, String)*): DataFrame =
    spark.createDataFrame(
      rows.map { case (k, n, s, t) => (k, n, s, ts(t)) }
        .toDF("k", "name", "score", "at").rdd, schema)

  private def source(lake: Lakehouse, table: String,
      extra: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.readStream.schema(schema)
      .format("graft.sources.LakehouseStreamProvider")
      .option("maxVersionsPerTrigger", "1")
    extra.foreach { case (k, v) => r.option(k, v) }
    r.load(lake.tablePath(table))
  }

  /** Drain via AvailableNow into an in-memory per-batch log. */
  private def drain(src: DataFrame, ckpt: String,
      log: java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[(Long, String)])])
      : Unit = {
    val q = src.writeStream.foreachBatch {
      (b: DataFrame, id: Long) =>
        log.add((id, b.select($"k", $"name").as[(Long, String)]
          .collect().toSeq))
        ()
    }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("tails committed deltas as version-per-batch micro-batches") {
    val lake = new Lakehouse(spark, tmpDir("lhs-tail"))
    lake.append("t", batchDf((1L, "a", 1.5, "2020-05-01 10:00:00")))
    lake.append("t", batchDf((2L, "b", 2.5, "2020-05-01 11:00:00"),
      (3L, "c", 3.5, "2020-05-01 12:00:00")))
    lake.append("t", batchDf((4L, "d", 4.5, "2020-05-01 13:00:00")))
    val log = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[(Long, String)])]()
    drain(source(lake, "t"), tmpDir("lhs-tail-ckpt"), log)
    val batches = log.toArray(Array.empty[(Long, Seq[(Long, String)])])
      .sortBy(_._1)
    // maxVersionsPerTrigger=1 → one micro-batch per commit, in order
    assert(batches.map(_._2.map(_._1).sorted).toSeq ==
      Seq(Seq(1L), Seq(2L, 3L), Seq(4L)))
  }

  test("values round-trip: strings, doubles and timestamps decode exactly") {
    val lake = new Lakehouse(spark, tmpDir("lhs-types"))
    val df = batchDf((1L, "héllo", 1.25, "2020-05-01 10:30:45"),
      (2L, null, -2.5, "1969-12-31 23:59:59"))
    lake.append("t", df)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Row4]]()
    val q = source(lake, "t").writeStream.foreachBatch {
      (b: DataFrame, _: Long) =>
        got.add(b.as[(Long, Option[String], Double, java.sql.Timestamp)]
          .collect().toSeq)
        ()
    }
      .option("checkpointLocation", tmpDir("lhs-types-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val want = df.as[(Long, Option[String], Double, java.sql.Timestamp)]
      .collect().toSeq.sortBy(_._1)
    assert(got.toArray(Array.empty[Seq[Row4]]).flatten
      .sortBy(_._1).toSeq == want)
  }

  test("resumes from the checkpoint and rides through compaction") {
    // grace keeps shadowed dirs; the consumed deltas may be folded away
    // only AFTER the stream's offset passed them
    val lake = new Lakehouse(spark, tmpDir("lhs-resume"),
      gcGraceMs = 3600L * 1000)
    val ckpt = tmpDir("lhs-resume-ckpt")
    lake.append("t", batchDf((1L, "a", 1.0, "2020-05-01 10:00:00")))
    lake.append("t", batchDf((2L, "b", 2.0, "2020-05-01 11:00:00")))
    val log = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[(Long, String)])]()
    drain(source(lake, "t"), ckpt, log)
    assert(log.size == 2)
    // standing maintenance between runs: a compaction (empty recorded
    // feed) + a fresh append
    lake.compact("t", schema, numFiles = 1, sortCols = Seq("k"))
    lake.append("t", batchDf((3L, "c", 3.0, "2020-05-01 12:00:00")))
    log.clear()
    drain(source(lake, "t"), ckpt, log)
    val rows = log.toArray(Array.empty[(Long, Seq[(Long, String)])])
      .flatMap(_._2).map(_._1).sorted.toSeq
    // ONLY the new delta — nothing re-served, the compact skipped
    assert(rows == Seq(3L))
  }

  test("fails loudly on a row-changing FULL commit in the range") {
    val lake = new Lakehouse(spark, tmpDir("lhs-full"),
      gcGraceMs = 3600L * 1000)
    lake.append("t", batchDf((1L, "a", 1.0, "2020-05-01 10:00:00")))
    // a merge rewrites rows (and records no feed here): an append-shaped
    // stream cannot represent it and must not silently skip it
    lake.merge("t", schema, batchDf((1L, "a2", 1.0, "2020-05-01 10:00:00")),
      keyCols = Seq("k"))
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = source(lake, "t").writeStream.foreachBatch {
        (_: DataFrame, _: Long) => ()
      }
        .option("checkpointLocation", tmpDir("lhs-full-ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(boom.getMessage.contains("FULL rewrite"))
  }

  test("the head holds for a fresh in-flight writer, skips stale debris") {
    val lake = new Lakehouse(spark, tmpDir("lhs-head"))
    lake.append("t", batchDf((1L, "a", 1.0, "2020-05-01 10:00:00")))
    // crash an append mid-write: an uncommitted _v2 dir remains
    intercept[RuntimeException] {
      lake.append("t", batchDf((9L, "x", 9.0, "2020-05-01 10:00:00")),
        beforeCommit = () => throw new RuntimeException("crash"))
    }
    lake.append("t", batchDf((2L, "b", 2.0, "2020-05-01 11:00:00")))
    // fresh debris (mtime now) holds the head at v1 — v3 must NOT be
    // served past the pending v2
    val held = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[(Long, String)])]()
    drain(source(lake, "t"), tmpDir("lhs-head-ckpt1"), held)
    assert(held.toArray(Array.empty[(Long, Seq[(Long, String)])])
      .flatMap(_._2).map(_._1).sorted.toSeq == Seq(1L))
    // with the grace collapsed to zero the debris reads as stale and the
    // stream steps over it
    val all = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[(Long, String)])]()
    drain(source(lake, "t", Map("inflightGraceMs" -> "0")),
      tmpDir("lhs-head-ckpt2"), all)
    assert(all.toArray(Array.empty[(Long, Seq[(Long, String)])])
      .flatMap(_._2).map(_._1).sorted.toSeq == Seq(1L, 2L))
  }

  test("CDF mode streams typed change rows with commit lineage") {
    val lake = new Lakehouse(spark, tmpDir("lhs-cdf"),
      gcGraceMs = 3600L * 1000)
    lake.append("t", batchDf((1L, "a", 1.0, "2020-05-01 10:00:00"),
      (2L, "b", 2.0, "2020-05-01 11:00:00")))                   // v1
    lake.merge("t", schema,
      batchDf((2L, "b2", 2.0, "2020-05-01 11:00:00"),
        (3L, "c", 3.0, "2020-05-01 12:00:00")),
      keyCols = Seq("k"), cdf = true)                           // v2 full
    lake.delete("t", schema, $"k" === 1L, cdf = true)           // v3 full
    val feedSchema = StructType.fromDDL(
      schemaDDL + ", _change_type STRING, _commit_version BIGINT")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Seq[(Long, String, String, Long)]]()
    val q = spark.readStream.schema(feedSchema)
      .format("graft.sources.LakehouseStreamProvider")
      .option("readChangeFeed", "true")
      .load(lake.tablePath("t"))
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        got.add(b.select($"k", $"name", $"_change_type", $"_commit_version")
          .as[(Long, String, String, Long)].collect().toSeq)
        ()
      }
      .option("checkpointLocation", tmpDir("lhs-cdf-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = got.toArray(Array.empty[Seq[(Long, String, String, Long)]])
      .flatten.toSet
    assert(rows == Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (2L, "b", "update_preimage", 2L), (2L, "b2", "update_postimage", 2L),
      (3L, "c", "insert", 2L),
      (1L, "a", "delete", 3L)))
  }

  test("CDF mode requires the _change_type column in the schema") {
    val lake = new Lakehouse(spark, tmpDir("lhs-cdf-schema"))
    lake.append("t", batchDf((1L, "a", 1.0, "2020-05-01 10:00:00")))
    val boom = intercept[Exception] {
      val q = source(lake, "t", Map("readChangeFeed" -> "true"))
        .writeStream.foreachBatch { (_: DataFrame, _: Long) => () }
        .option("checkpointLocation", tmpDir("lhs-cdf-schema-ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(boom.getMessage.contains("_change_type"))
  }

  test("equality-delete tombstones: CDF mode types them, append mode refuses") {
    val lake = new Lakehouse(spark, tmpDir("lhs-eqdel"))
    lake.append("t", batchDf((1L, "a", 1.0, "2020-05-01 10:00:00"),
      (2L, "b", 2.0, "2020-05-01 11:00:00")))                     // v1
    lake.deleteByKeys("t", schema,
      spark.createDataFrame(Seq(Tuple1(2L)).toDF("k").rdd,
        StructType.fromDDL("k BIGINT")), () => ())                // v2
    val feedSchema = StructType.fromDDL(
      schemaDDL + ", _change_type STRING, _commit_version BIGINT")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Seq[(Long, Option[String], String, Long)]]()
    val q = spark.readStream.schema(feedSchema)
      .format("graft.sources.LakehouseStreamProvider")
      .option("readChangeFeed", "true")
      .load(lake.tablePath("t"))
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        got.add(b.select($"k", $"name", $"_change_type", $"_commit_version")
          .as[(Long, Option[String], String, Long)].collect().toSeq)
        ()
      }
      .option("checkpointLocation", tmpDir("lhs-eqdel-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(got.toArray(Array.empty[Seq[(Long, Option[String], String, Long)]])
      .flatten.toSet == Set(
      (1L, Some("a"), "insert", 1L), (2L, Some("b"), "insert", 1L),
      (2L, None, "delete", 2L)))
    // the append-shaped stream cannot represent a row delete
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q2 = source(lake, "t").writeStream.foreachBatch {
        (_: DataFrame, _: Long) => ()
      }
        .option("checkpointLocation", tmpDir("lhs-eqdel-ckpt2"))
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
    }
    assert(boom.getMessage.contains("equality-delete"))
  }

  test("unsupported column types fail at plan time") {
    val lake = new Lakehouse(spark, tmpDir("lhs-types-bad"))
    val boom = intercept[Exception] {
      spark.readStream
        .schema(StructType.fromDDL("k BIGINT, v ARRAY<INT>"))
        .format("graft.sources.LakehouseStreamProvider")
        .load(lake.tablePath("t"))
    }
    assert(boom.getMessage.contains("unsupported"))
  }

  private type Row4 = (Long, Option[String], Double, java.sql.Timestamp)
}

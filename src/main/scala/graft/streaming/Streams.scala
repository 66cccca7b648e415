package graft.streaming

import graft.model.Schemas
import graft.storage.Lakehouse
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extensions: the reference's batch protocol
  * re-expressed as streams (README.md models a daily file drop; nothing in
  * the reference is streaming, so these are the engine's forward-looking
  * surface, SURVEY.md §1.3 / §7.5).
  *
  * Scale notes: the file source tracks processed files in the checkpoint
  * (exactly-once per file); watermarks bound state for the windowed aggs;
  * `flatMapGroupsWithState` state is per-key and dropped on timeout.
  */
object Streams {

  /** The daily landing drop as a stream: new parquet files appearing under
    * `dir` stream through the same conform logic as batch ingest.
    * Run with `Trigger.AvailableNow` to drain what's there and stop.
    */
  def landingStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Schemas.denormalized)
      .parquet(dir)

  /** Windowed per-city transaction counts with a watermark — the
    * streaming form of the mart's per-day aggregation.
    */
  def txnCountsByWindow(landing: DataFrame,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    landing
      .withWatermark("trans_date", watermark)
      .groupBy(window(col("trans_date"), window_), col("city"))
      .agg(count(lit(1)).as("n_txns"),
        sum(col("amount")).as("total_amount"))

  /** Streaming exact dedup: drop rows whose content fingerprint was seen
    * within the watermark horizon — the streaming form of
    * `Dedup.exactGroups`. State is bounded by the watermark (old
    * fingerprints age out), which is what makes dedup feasible on an
    * unbounded 100 TB/day stream.
    */
  def dedupByFingerprint(stream: DataFrame, textCol: String,
      tsCol: String, watermark: String): DataFrame =
    stream
      .withColumn("_fp", graft.ops.TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Exactly-once streaming sink into the lakehouse: each micro-batch
    * commits through [[Lakehouse.appendExactlyOnce]] keyed by its batch
    * id, so the batch replays foreachBatch allows after a failure land as
    * already-committed no-ops instead of duplicate rows. Batch ids are
    * per-checkpoint — reuse the checkpoint across restarts (set
    * `checkpointLocation` on the returned writer), as any streaming sink
    * requires for its exactly-once story.
    */
  def lakeSink(stream: DataFrame, lake: Lakehouse,
      table: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch(
      (batch: DataFrame, id: Long) => lake.appendExactlyOnce(table, batch, id))

  /** Streaming CDC apply / MERGE sink: each micro-batch is reduced to its
    * newest row per `keyCols` (ordered by `versionCols`, which must
    * totally order rows within a key — include a unique id as the final
    * tiebreaker) and merged newer-wins into the lakehouse table. The
    * merge is order-independent across batches AND idempotent under
    * foreachBatch's at-least-once replay — a replayed batch can never win
    * against rows it already produced or newer ones — so no batch-id
    * ledger is needed, unlike the append-only [[lakeSink]].
    *
    * Scale note: this rewrites the whole table per batch, which is the
    * correct shape only while the keyed table is compaction-sized. At
    * 100 TB the same foreachBatch body narrows to the touched partitions
    * (join the batch's key-partition set, rewrite only those via
    * [[Lakehouse.overwritePartitioned]]); the per-batch MERGE semantics —
    * within-batch reduce, then newer-wins against the base — are
    * identical. Versioned overwrite makes each merge crash-safe: the new
    * generation computes FROM the old files and lands atomically.
    */
  def upsertSink(stream: DataFrame, lake: Lakehouse, table: String,
      keyCols: Seq[String], versionCols: Seq[String]): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      applyCdcBatch(lake, table, batch, keyCols, versionCols)
    }

  /** One CDC merge step (the foreachBatch body of [[upsertSink]], also
    * usable for batch backfills): newest row per key wins across
    * base ∪ batch.
    */
  def applyCdcBatch(lake: Lakehouse, table: String, batch: DataFrame,
      keyCols: Seq[String], versionCols: Seq[String]): Unit = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(c => col(c).desc): _*)
    val base = lake.read(table, batch.schema)
    val merged = base.unionByName(batch)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    lake.overwrite(table, merged)
  }

  /** Per-card running state for streaming fraud screening: consecutive
    * rejected-operation count, emitting a row whenever a card crosses
    * `threshold` consecutive rejections (the streaming cousin of F4's
    * chain detection — exact chain semantics stay in the batch mart).
    *
    * State is evicted `stateTtlMs` past the event-time watermark per
    * inactive card (EventTimeTimeout) — on an unbounded card keyspace the
    * state store must not grow forever; an evicted card simply restarts
    * its count, which for a consecutive-rejects screen is the intended
    * semantics. (Event-time, not processing-time: wall-clock timers keep
    * an AvailableNow drain alive waiting for them to fire.)
    */
  case class CardState(consecutiveRejects: Int)
  case class RejectAlert(card_num: String, rejects: Int,
      at: java.sql.Timestamp)

  def consecutiveRejectAlerts(landing: DataFrame, threshold: Int,
      watermark: String = "2 hours",
      stateTtlMs: Long = 24L * 3600 * 1000): Dataset[RejectAlert] = {
    val spark = landing.sparkSession
    import spark.implicits._
    landing
      .withWatermark("trans_date", watermark)
      .select(col("card_num"), col("trans_date"), col("oper_result"))
      .as[(String, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (card: String, rows: Iterator[(String, java.sql.Timestamp, String)],
            state: GroupState[CardState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(CardState(0))
            val out = Seq.newBuilder[RejectAlert]
            // microsecond-exact (getTime is millis; see StreamingPack
            // s06); the result string tie-breaks same-microsecond events
            // so iterator order can't leak through on task retries —
            // same-(ts,result) rows are interchangeable for a
            // consecutive-rejects count
            rows.toSeq.sortBy(r =>
              ((r._2.getTime / 1000) * 1000000L + r._2.getNanos / 1000, r._3))
              .foreach { case (_, ts, res) =>
              s =
                if (res == graft.model.Strings.Rejected)
                  CardState(s.consecutiveRejects + 1)
                else CardState(0)
              if (s.consecutiveRejects == threshold)
                out += RejectAlert(card, s.consecutiveRejects, ts)
            }
            state.update(s)
            state.setTimeoutTimestamp(
              state.getCurrentWatermarkMs() + stateTtlMs)
            out.result().iterator
          }
        })
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

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

  /** events.ts ships as either TIMESTAMP(NANOS) or naive TIMESTAMP(MICROS)
    * parquet depending on testdata generation — same normalization as
    * Tables.events (→ session-TZ TimestampType), on the streaming side.
    */
  private[graft] def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // same UTC contract as Tables.events — assert, never mutate the
    // caller's global session TZ (see the rationale there)
    require(s.conf.get("spark.sql.session.timeZone") == "UTC",
      "StreamingPack.eventsStream requires spark.sql.session.timeZone=UTC")
    val schema = s.read.parquet(s"$d/events.parquet").schema
    // the file source wants a directory: stream the sf dir, filtered to
    // the events file
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Per-streaming-job state-partition sizing, scoped and restored
    * (the s03 idiom, r12-audited): a stateful operator materializes one
    * state store PER SHUFFLE PARTITION per micro-batch — load, update,
    * snapshot/delta commit — so the batch-sized 32-partition session
    * default costs 4× the store maintenance this stream's volume needs.
    * Real deployments size shuffle partitions per streaming job (the
    * partition count is even frozen into the checkpoint); the aggregate
    * results are partition-count-independent.
    */
  private def withStreamPartitions[A](s: SparkSession, n: Int = 8)(
      body: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1-hour windows × event type, streamed then drained; the
    // epoch-aligned window start equals date_trunc('hour') in the oracle
    "s01_stream_hourly_counts" -> ((s, d) => withStreamPartitions(s) {
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
    "s02_stream_static_enrich" -> ((s, d) => withStreamPartitions(s) {
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
    }),

    // stream-stream interval join: purchases matched to the same user's
    // clicks within the preceding 10 minutes. Both sides carry watermarks
    // and the join has a time-range bound, so join state is EVICTABLE —
    // the only shape an unbounded stream-stream join can scale with
    // (unbounded state otherwise). Inner-join append output emits every
    // matched pair exactly once, so the drained result is deterministic
    // and hash-comparable to the batch self-join oracle.
    "s03_stream_stream_join" -> ((s, d) => {
      val sink = s"s03_out_${System.nanoTime()}"
      // a stream-stream join materializes FOUR state stores per shuffle
      // partition per micro-batch (left/right × keyToNumValues/
      // keyWithIndexToValue); the session's batch-sized 32-partition
      // default costs ~128 store setups for this stream's volume. Real
      // deployments size shuffle partitions per streaming job — done
      // here scoped to the query (restored after the drain; measured
      // 6.0 s → 3.5 s at sf0.1)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
      val clicks = eventsStream(s, d)
        .filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val purchases = eventsStream(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
      val q = clicks.join(purchases,
          col("c_user") === col("p_user") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") <= col("click_ts") +
              expr("INTERVAL 10 MINUTES"))
        .select(col("c_user").as("user_id"), col("click_id"),
          col("purchase_id"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      drained(s, sink, s.table(sink))
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    // dynamic session windows on the stream — the same declarative
    // session_window plan as batch q44, drained in Complete mode so the
    // final merged sessions are deterministic (merge order across
    // micro-batches doesn't affect the converged result). Production
    // variants add a watermark and emit in append mode as sessions close.
    "s05_stream_sessions" -> ((s, d) => {
      val sink = s"s05_out_${System.nanoTime()}"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = eventsStream(s, d)
          .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("session_window.start").as("s_start"),
            col("session_window.end").as("s_end"), col("user_id"),
            col("n_events"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        drained(s, sink, s.table(sink))
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    // arbitrary stateful processing, driver-visible: per-user consecutive
    // 'error' counter in flatMapGroupsWithState, alert at the 3rd of a
    // run (the driver-checkable cousin of Streams.consecutiveRejectAlerts
    // — same state-machine shape, spec-tested there with event-time TTL).
    // Rows are sorted by event time inside each group's iterator; the
    // single-file AvailableNow drain delivers each group once, so the
    // run positions are deterministic and the batch gaps-and-islands
    // oracle applies exactly.
    "s06_stream_stateful_alerts" -> ((s, d) => {
      val sink = s"s06_out_${System.nanoTime()}"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        import s.implicits._
        val q = eventsStream(s, d)
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"))
          .as[(Long, Long, java.sql.Timestamp, String)]
          .groupByKey(_._1)
          .flatMapGroupsWithState(OutputMode.Append,
            GroupStateTimeout.NoTimeout)(
            (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, String)],
                state: GroupState[Int]) => {
              var consec = state.getOption.getOrElse(0)
              val out = Seq.newBuilder[(Long, Long)]
              // microsecond-exact sort key: getTime alone is millisecond
              // precision, and events carry microsecond timestamps — a
              // same-millisecond tie would order differently than the
              // oracle's ORDER BY ts (the session oracle hit exactly
              // this precision class before)
              def micros(t: java.sql.Timestamp): Long =
                (t.getTime / 1000) * 1000000L + t.getNanos / 1000
              rows.toSeq.sortBy(r => (micros(r._3), r._2)).foreach {
                case (_, eid, _, typ) =>
                  consec = if (typ == "error") consec + 1 else 0
                  if (consec == 3) out += ((user, eid))
              }
              state.update(consec)
              out.result().iterator
            })
          .toDF("user_id", "event_id")
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        drained(s, sink, s.table(sink))
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    // the SAME state machine through Spark 4's arbitrary-state v2 API
    // (transformWithState + StatefulProcessor + ValueState, which
    // REQUIRES the RocksDB state store — exercised here, scoped to the
    // query): the forward-looking replacement for flatMapGroupsWithState,
    // with typed per-key state primitives and store-backed TTL. Same
    // gaps-and-islands oracle as s06 — two engines' worth of evidence
    // that both stateful APIs implement identical semantics.
    "s07_stream_transform_state" -> ((s, d) => {
      val sink = s"s07_out_${System.nanoTime()}"
      val prevPart = s.conf.get("spark.sql.shuffle.partitions")
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = s.conf.getOption(provKey)
      s.conf.set("spark.sql.shuffle.partitions", "8")
      s.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        import s.implicits._
        val q = eventsStream(s, d)
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"))
          .as[(Long, Long, java.sql.Timestamp, String)]
          .groupByKey(_._1)
          .transformWithState(new ConsecErrorProcessor, TimeMode.None(),
            OutputMode.Append())
          .toDF("user_id", "event_id")
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        drained(s, sink, s.table(sink))
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prevPart)
        prevProv match {
          case Some(p) => s.conf.set(provKey, p)
          case None => s.conf.unset(provKey)
        }
      }
    }),

    // streaming dedup: first-occurrence-wins on the content fingerprint.
    // Only the FINGERPRINT is projected before dropDuplicates, so the
    // drained result (the distinct fingerprint set) is deterministic even
    // though which physical row wins per fingerprint depends on
    // micro-batch arrival order — the batch oracle is SELECT DISTINCT.
    // This replay keeps state unbounded (drain-and-stop); the production
    // watermark-TTL'd variant is Streams.dedupByFingerprint (spec-tested,
    // state evicted by event time).
    "s04_stream_dedup" -> ((s, d) => withStreamPartitions(s) {
      val sink = s"s04_out_${System.nanoTime()}"
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
        .select(graft.ops.TextOps.fingerprint(col("text")).as("fp"))
        .dropDuplicates("fp")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      drained(s, sink, s.table(sink))
    }),

    // watermark-bounded streaming dedup (dropDuplicatesWithinWatermark):
    // the production form of s04 — dedup state for an identity is
    // DROPPED once the watermark passes it, so state is bounded by the
    // watermark horizon instead of growing with the stream. Only the
    // duplicate-identity triple is projected after the dedup, so the
    // drained result is the distinct triple set regardless of which
    // physical row won. The fixture replay drains the single events file
    // in ONE micro-batch (the file source's batching unit is a whole
    // file), so no identity straddles a watermark advance and the result
    // is exactly DISTINCT — which is what the oracle checks.
    "s08_stream_dedup_watermark" -> ((s, d) => withStreamPartitions(s) {
      val sink = s"s08_out_${System.nanoTime()}"
      val q = eventsStream(s, d)
        .withWatermark("ts", "1 hour")
        .withColumn("minute", date_trunc("minute", col("ts")))
        .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")
        .select(col("user_id"), col("event_type"), col("minute"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      drained(s, sink, s.table(sink))
    }),

    // exactly-once streaming sink into the lakehouse (Streams.lakeSink →
    // foreachBatch → appendExactlyOnce): the event stream lands in a
    // versioned fact table keyed by micro-batch id, then a FAILURE
    // REPLAY is simulated by re-committing batch 0 with a poison row —
    // the batch-id ledger must make it a committed no-op. The final
    // aggregate is read back from the LAKE (not a memory sink), so the
    // oracle is green only if every streamed row landed exactly once,
    // types survived the lakehouse round trip, and the replayed batch
    // changed nothing (the poison row would add an oper_type group).
    "s09_stream_lake_sink" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s09")
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString)
      val mapped = eventsStream(s, d).select(
        col("event_id").cast("string").as("trans_id"),
        col("ts").as("trans_date"),
        col("user_id").cast("string").as("card_num"),
        col("event_type").as("oper_type"),
        col("value").cast("decimal(18,2)").as("amt"),
        lit("ok").as("oper_result"),
        lit("t0").as("terminal"))
      val q = graft.streaming.Streams.lakeSink(mapped, lake, "fact_transactions")
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val poison = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          "poison", java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
          "c0", "POISON", new java.math.BigDecimal("1.00"), "ok", "t0")),
        graft.model.Schemas.factTransactions)
      lake.appendExactlyOnce("fact_transactions", poison, batchId = 0L)
      lake.read("fact_transactions")
        .groupBy(col("oper_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("trans_id").cast("bigint")).as("key_sum"),
          countDistinct(col("card_num").cast("bigint")).as("users"))
    }),

    // streaming CDC apply (Streams.upsertSink → foreachBatch MERGE): the
    // events table is staged into THREE slice files (event_id mod 3, so
    // every user's history is scattered across slices), streamed with
    // maxFilesPerTrigger=1 — three genuine micro-batches, arriving out of
    // event-time order — and merged newer-wins on (ts, event_id) into a
    // keyed current-state table. The oracle recomputes per-user latest
    // rows from the raw events: green only if every batch's merge kept
    // exactly the newest row per user regardless of batch arrival order —
    // the invariant a CDC upsert must hold under out-of-order delivery.
    "s10_stream_cdc_upsert" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s10")
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString)
      val stage = dir.resolve("stream").toString
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      // three append writes → three part files in one source dir (the ts
      // rewrite also normalizes NANOS → µs, so the stream needs no
      // nanosAsLong special-casing)
      (0 to 2).foreach { sl =>
        ev.filter(pmod(col("event_id"), lit(3)) === sl)
          .coalesce(1).write.mode("append").parquet(stage)
      }
      val schema = s.read.parquet(stage).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val q = graft.streaming.Streams.upsertSink(src, lake,
          "events_current", keyCols = Seq("user_id"),
          versionCols = Seq("ts", "event_id"))
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      lake.read("events_current", schema)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
    }),

    // s12 — restart recovery across a REAL crash (round-3 verdict item
    // 6): the event stream arrives as three single-file micro-batches;
    // the foreachBatch sink commits batch 1 to the lakehouse and THEN
    // dies — the exact at-least-once window (sink committed, checkpoint
    // not yet advanced) every foreachBatch deployment must survive. A
    // NEW query object restarts from the same checkpoint dir: the source
    // replays batch 1, the batch-id ledger recognizes it as committed
    // and no-ops, and the remaining file drains. The final aggregate is
    // read from the LAKE against the all-events oracle — green only if
    // every row landed exactly once ACROSS the restart boundary (a
    // re-landed batch would double its key_sum; a skipped one would
    // drop it).
    "s12_stream_restart_recovery" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s12")
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString)
      val stage = dir.resolve("stream").toString
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      (0 to 2).foreach { sl =>
        ev.filter(pmod(col("event_id"), lit(3)) === sl)
          .coalesce(1).write.mode("append").parquet(stage)
      }
      val schema = s.read.parquet(stage).schema
      def source = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
        .select(col("event_id").cast("string").as("trans_id"),
          col("ts").as("trans_date"),
          col("user_id").cast("string").as("card_num"),
          col("event_type").as("oper_type"),
          col("value").cast("decimal(18,2)").as("amt"),
          lit("ok").as("oper_result"), lit("t0").as("terminal"))
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def run(): Unit = {
        val q = source.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            lake.appendExactlyOnce("fact_transactions", batch, id)
            if (id == 1L && !crashed.getAndSet(true))
              throw new RuntimeException("injected crash after sink commit")
        }
          .option("checkpointLocation", dir.resolve("ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // first run dies mid-feed on the injected crash...
      val died = try { run(); false }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException
            if e.getMessage.contains("injected crash") => true
        }
      require(died, "s12 harness: the injected crash did not fire")
      run() // ...the restart drains from the checkpoint
      lake.read("fact_transactions")
        .groupBy(col("oper_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("trans_id").cast("bigint")).as("key_sum"),
          countDistinct(col("card_num").cast("bigint")).as("users"))
    }),

    // s13 — streaming incremental ANN-index maintenance (round-4 verdict
    // item 4): the continuous-ingest retrieval pattern. An initial build
    // trains and freezes the codebook on the vec_id%3==0 slice; the
    // remaining vectors arrive as two single-file micro-batches through a
    // foreachBatch sink that encodes them against the STORED centroids
    // and commits their code rows with batch-id exactly-once
    // (AnnIndex.appendVectorsExactlyOnce). The sink CRASHES after batch
    // 0's commit — the at-least-once window — and a new query restarts
    // from the checkpoint, replaying batch 0 (must no-op: a re-landed
    // batch doubles code rows and corrupts every ADC sum through join
    // multiplicity) before draining batch 1. Serve then answers from the
    // stored index alone. The oracle re-derives the converged index
    // declaratively: centroids from the initial slice only, PQ codes for
    // ALL vectors against that frozen codebook, coarse cells from the
    // build's label column for initial vectors and from the
    // nearest-centroid assignment rule for streamed ones — green only if
    // continuous ingest + crash + restart converge to exactly the
    // batch-built index state.
    "s13_stream_index_maintenance" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s13")
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString)
      val emb = s.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          col("label"))
      graft.ops.AnnIndex.buildIvfPq(lake,
        emb.filter(pmod(col("id"), lit(3)) === 0))
      val stage = dir.resolve("stream").toString
      (1 to 2).foreach { sl =>
        emb.filter(pmod(col("id"), lit(3)) === sl)
          .select(col("id"), col("vec"))
          .coalesce(1).write.mode("append").parquet(stage)
      }
      val schema = s.read.parquet(stage).schema
      def source = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def run(): Unit = {
        val q = source.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            graft.ops.AnnIndex.appendVectorsExactlyOnce(lake, batch, id)
            if (id == 0L && !crashed.getAndSet(true))
              throw new RuntimeException("injected crash after sink commit")
        }
          .option("checkpointLocation", dir.resolve("ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val died = try { run(); false }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException
            if e.getMessage.contains("injected crash") => true
        }
      require(died, "s13 harness: the injected crash did not fire")
      run() // restart drains from the checkpoint
      graft.ops.AnnIndex.serveIvfPq(lake,
        emb.filter(col("id") < 5).select(col("id"), col("vec")),
        k = 5, nProbe = 2)
    }),

    // s21 — streaming incremental BM25 index maintenance (the text-side
    // s13): the index is built on a third of the corpus, the rest
    // streams in as two batches whose postings + doc-length rows land
    // as exactly-once deltas (Bm25.appendDocs). The injected crash
    // fires BETWEEN batch 0's two table commits — the widest torn
    // window the two-table layout has — and the restarted query's
    // replay heals it (each table dedups independently by batch id, so
    // the retry completes exactly the missing commit). Because the
    // index is append-only with df/corpus stats DERIVED at serve time,
    // the converged index is IDENTICAL to a from-scratch build: the
    // oracle is t17's full-corpus BM25, bit-exact scores included.
    "s21_stream_bm25_maintenance" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s21")
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString)
      val docs = graft.Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
      graft.ops.Bm25.buildIndex(lake,
        docs.filter(pmod(col("doc_id"), lit(3)) === 0), "doc_id", "text")
      val stage = dir.resolve("stream").toString
      (1 to 2).foreach { sl =>
        docs.filter(pmod(col("doc_id"), lit(3)) === sl)
          .coalesce(1).write.mode("append").parquet(stage)
      }
      val schema = s.read.parquet(stage).schema
      def source = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def run(): Unit = {
        val q = source.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            graft.ops.Bm25.appendDocs(lake, batch, "doc_id", "text", id,
              midCrash = () =>
                if (id == 0L && !crashed.getAndSet(true))
                  throw new RuntimeException(
                    "injected crash between index commits"))
        }
          .option("checkpointLocation", dir.resolve("ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val died = try { run(); false }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException
            if e.getMessage.contains("injected crash") => true
        }
      require(died, "s21 harness: the injected crash did not fire")
      run() // restart heals the torn batch and drains the rest
      import s.implicits._
      graft.ops.Bm25.serve(lake, Seq(
        (1L, "spark join window"),
        (2L, "slow query filter"),
        (3L, "merge stream batch data")).toDF("query_id", "qtext"), k = 5)
    }),

    // s22 — STREAMING INCREMENTAL DEDUP: the d36 signature store
    // maintained by a stream. Seed = every doc_id % 3 == 0 (signed
    // once, batch-style); the other two slices arrive as micro-batches
    // that each land THREE exactly-once delta commits (near-dup pairs
    // against the pre-batch store, the batch's band rows, the batch's
    // corpus docs — ops/Dedup.appendBatchIncremental). The injected
    // crash fires between batch 0's pairs and bands commits (the
    // widest torn window); the restart replays the batch, the batch-id
    // markers skip the committed pairs, and the chain converges. The
    // megabucket cap is resolved at SERVE time against the CONVERGED
    // store (monotone bucket growth makes that exactly a from-scratch
    // run's cap — see incrementalMinhashNearDupsBanded), so the oracle
    // is the full-corpus d04 chain restricted to pairs with ≥ one
    // streamed side.
    "s22_stream_incremental_dedup" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s22")
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString)
      val storeSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, band INT, bucket STRING")
      // ONE bands constant for the seed signing, the incremental batches
      // and the convergence arithmetic below — a drift between them would
      // fail (or silently mis-validate) the store-size check
      val bands = 4
      val all = graft.Tables.documents(s, d)
        .select(col("doc_id").as("id"), col("text"))
      val seed = all.filter(pmod(col("id"), lit(3)) === 0)
      lake.append("corpus", seed)
      lake.append("sig_store",
        graft.ops.Dedup.minhashBandedRows(seed, "id", "text", bands, 2)
          .repartitionByRange(8, col("bucket")),
        statsCols = Seq("bucket"))
      val stage = dir.resolve("stream").toString
      (1 to 2).foreach { sl =>
        all.filter(pmod(col("id"), lit(3)) === sl)
          .coalesce(1).write.mode("append").parquet(stage)
      }
      val schema = s.read.parquet(stage).schema
      def source = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def run(): Unit = {
        val q = source.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            graft.ops.Dedup.appendBatchIncremental(lake, "corpus",
              "sig_store", "pairs", batch, "id", "text", bands = bands,
              rowsPerBand = 2, threshold = 0.8, maxBucket = 100,
              batchId = id,
              midCrash = () =>
                if (id == 0L && !crashed.getAndSet(true))
                  throw new RuntimeException(
                    "injected crash between dedup commits"))
        }
          .option("checkpointLocation", dir.resolve("ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val died = try { run(); false }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException
            if e.getMessage.contains("injected crash") => true
        }
      require(died, "s22 harness: the injected crash did not fire")
      run() // restart heals the torn batch and drains the rest
      val store = lake.read("sig_store", storeSchema)
      // minhashBandedRows emits EXACTLY `bands` rows per doc (posexplode
      // over a bands-length literal array — no filter), so convergence is
      // bands × |corpus| arithmetically; the old check re-tokenized and
      // re-signed the whole corpus just to count what 4·count(docs)
      // already says
      require(store.count() == bands * all.count(),
        "sig_store must converge to the full corpus")
      // serve-time cut: converged bucket counts decide the cap
      val small = store.groupBy(col("band"), col("bucket")).count()
        .filter(col("count") <= 100).select(col("band"), col("bucket"))
      lake.read("pairs", org.apache.spark.sql.types.StructType.fromDDL(
        "band INT, bucket STRING, id_a BIGINT, id_b BIGINT, " +
          "jaccard DOUBLE"))
        .join(small, Seq("band", "bucket"), "left_semi")
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .distinct()
    }),

    // s14 — the lakehouse TABLE AS A STREAM (Delta's streaming-source
    // pattern) through the engine's own DataSource V2 source
    // (graft.sources.LakehouseStreamProvider): offsets are commit
    // versions, visibility is the commit MARKER (the same Protocol the
    // write path uses — no file-glob race), one micro-batch per
    // committed delta under maxVersionsPerTrigger=1. The events table
    // lands as THREE delta commits; the stream tails them through a
    // foreachBatch sink into a second lakehouse table with batch-id
    // exactly-once, CRASHES after batch 1's commit (the at-least-once
    // window), and a NEW query restarts from the checkpoint — the
    // VersionOffset round-trips through deserializeOffset, batch 1
    // replays as a committed no-op, batch 2 drains. End-to-end: table →
    // custom source → exactly-once sink → table, with no external queue.
    // Same aggregate contract as s09/s12 plus max(trans_date), which
    // pins the source's parquet timestamp decode (INT64/INT96) against
    // the oracle's raw-parquet max(ts).
    "s14_lakehouse_stream_source" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s14")
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString)
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      (0 to 2).foreach { sl =>
        lake.append("events_feed",
          ev.filter(pmod(col("event_id"), lit(3)) === sl))
      }
      def source = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE"))
        .format("graft.sources.LakehouseStreamProvider")
        .option("maxVersionsPerTrigger", "1")
        .load(lake.tablePath("events_feed"))
        .select(col("event_id").cast("string").as("trans_id"),
          col("ts").as("trans_date"),
          col("user_id").cast("string").as("card_num"),
          col("event_type").as("oper_type"),
          col("value").cast("decimal(18,2)").as("amt"),
          lit("ok").as("oper_result"), lit("t0").as("terminal"))
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def run(): Unit = {
        val q = source.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            lake.appendExactlyOnce("fact_transactions", batch, id)
            if (id == 1L && !crashed.getAndSet(true))
              throw new RuntimeException("injected crash after sink commit")
        }
          .option("checkpointLocation", dir.resolve("ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val died = try { run(); false }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException
            if e.getMessage.contains("injected crash") => true
        }
      require(died, "s14 harness: the injected crash did not fire")
      run() // restart resumes from the checkpointed VersionOffset
      lake.read("fact_transactions")
        .groupBy(col("oper_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("trans_id").cast("bigint")).as("key_sum"),
          countDistinct(col("card_num").cast("bigint")).as("users"),
          max(col("trans_date")).as("last_ts"))
    }),

    // s15 — streaming CHANGE DATA FEED from the lakehouse (Delta's
    // readChangeFeed): the same DSv2 source in CDF mode, where deltas
    // stream as `insert` rows and a row-level DELETE's FULL commit
    // streams its RECORDED removed rows (`_change_type = 'delete'`,
    // written inside the commit by delete(cdf=true)) — row-level CDC
    // from a table with no external queue, the feed a downstream
    // index/aggregate needs to stay incremental through takedowns. The
    // events table lands as three deltas, every event_id%7==0 row is
    // deleted, and the typed feed drains through an exactly-once sink;
    // the aggregate is keyed by change type so a missed delete record,
    // a misattributed insert, or a double-served version
    // hash-mismatches the oracle's two-branch recomputation.
    "s15_stream_cdc_feed" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s15")
      // grace keeps consumed version dirs on disk — a feed consumer IS
      // a reader of old versions (the q65 retention contract)
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString,
        gcGraceMs = 3600000L)
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      (0 to 2).foreach { sl =>
        lake.append("events_feed",
          ev.filter(pmod(col("event_id"), lit(3)) === sl))
      }
      val contract = org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
          "event_type STRING, value DOUBLE")
      lake.delete("events_feed", contract,
        pmod(col("event_id"), lit(7)) === 0, cdf = true)
      val feedSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, _change_type STRING, " +
          "_commit_version BIGINT")
      val source = s.readStream.schema(feedSchema)
        .format("graft.sources.LakehouseStreamProvider")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1")
        .load(lake.tablePath("events_feed"))
      val q = source.writeStream.foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          lake.appendExactlyOnce("cdc_sunk", batch, id)
      }
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      lake.read("cdc_sunk", feedSchema)
        .groupBy(col("_change_type").as("change_type"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("event_id")).as("key_sum"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("val_sum"))
    }),

    // s23 — STRUCT rows through the streaming CDF surface (round-12,
    // lifting the round-11 refusal): the feed table carries a
    // one-level STRUCT payload, lands as three deltas plus a
    // CDF-recorded row-level DELETE, and the change feed streams
    // end-to-end — the source's Group row decoder now decodes struct
    // fields (nested-null-fill and per-leaf widening included), where
    // round 11 refused the schema at plan time. The drained feed is
    // flattened and aggregated by change type against a DuckDB oracle
    // that recomputes both branches from the raw events — a decoder
    // that nulled struct leaves, misattributed a change type, or
    // dropped the delete records hash-mismatches.
    "s23_stream_struct_cdf" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s23")
      // grace keeps consumed version dirs on disk — a feed consumer IS
      // a reader of old versions (the q65 retention contract)
      val lake = new graft.storage.Lakehouse(s,
        dir.resolve("lake").toString, gcGraceMs = 3600000L)
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"),
          struct(col("value").as("v"), col("event_type").as("t"))
            .as("p"))
      (0 to 2).foreach { sl =>
        lake.append("struct_feed",
          ev.filter(pmod(col("event_id"), lit(3)) === sl))
      }
      val contract = org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, p STRUCT<v: DOUBLE, t: STRING>")
      lake.delete("struct_feed", contract,
        pmod(col("event_id"), lit(7)) === 0, cdf = true)
      val feedSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, p STRUCT<v: DOUBLE, t: STRING>, " +
          "_change_type STRING, _commit_version BIGINT")
      val source = s.readStream.schema(feedSchema)
        .format("graft.sources.LakehouseStreamProvider")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1")
        .load(lake.tablePath("struct_feed"))
      val q = source.writeStream.foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          lake.appendExactlyOnce("struct_cdc_sunk", batch, id)
      }
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      lake.read("struct_cdc_sunk", feedSchema)
        .groupBy(col("_change_type").as("change_type"),
          col("p.t").as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("event_id")).as("key_sum"),
          sum(col("p.v").cast("decimal(18,2)")).cast("double")
            .as("val_sum"))
    }),

    // s17 — lakehouse → lakehouse streaming with ZERO user sink code:
    // the DSv2 source tails the feed table's commit log and the
    // first-class sink lands every micro-batch through
    // appendExactlyOnce. The exactly-once probe is brutal: after the
    // first drain completes, the CHECKPOINT IS DESTROYED and the whole
    // query re-runs from scratch — every batch replays with its
    // original id, the sink recognizes each as already committed, and
    // the table must hash as if the stream ran once. (This is the
    // operational story for checkpoint loss — the sink's batch-id
    // ledger, not the checkpoint, is the dedup authority.)
    "s17_stream_lakehouse_sink" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s17")
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString)
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      (0 to 2).foreach { sl =>
        lake.append("events_feed",
          ev.filter(pmod(col("event_id"), lit(3)) === sl))
      }
      def run(ckpt: String): Unit = {
        val q = s.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
              "event_type STRING, value DOUBLE"))
          .format("graft.sources.LakehouseStreamProvider")
          .option("maxVersionsPerTrigger", "1")
          .load(lake.tablePath("events_feed"))
          .filter(col("event_id") % 2 === 0)
          .writeStream
          .format("graft.sources.LakehouseSinkProvider")
          .option("path", lake.tablePath("events_sunk"))
          .option("checkpointLocation", dir.resolve(ckpt).toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      run("ckpt1")
      run("ckpt2") // fresh checkpoint: full replay, sink must dedup all
      lake.read("events_sunk",
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("key_sum"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("val_sum"))
    }),

    // s18 — the MEDALLION pipeline: bronze → silver → gold as TWO
    // chained streaming hops, each tailing the previous table's commit
    // log through the DSv2 source and landing through the exactly-once
    // sink — the standard lakehouse architecture (raw ingest → cleaned/
    // conformed → business-level) with zero user sink code. The probe
    // is INCREMENTAL PROPAGATION: both hops drain slices 0+1, then a
    // late slice lands in bronze and both hops re-run on their KEPT
    // checkpoints — each must process exactly the new commits (the
    // checkpoint's resolved offset, not a rescan) and the gold table
    // must hash as if the pipeline saw all three slices once. At 100 TB
    // this chain is the whole point of the commit log: hop N+1 reads
    // only hop N's new deltas, never the accumulated table.
    "s18_stream_medallion" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s18")
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString)
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val silverDDL = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value2x DOUBLE"
      val goldDDL = "event_id BIGINT, event_type STRING, value2x DOUBLE"
      def hop(src: String, srcDDL: String, dst: String, ckpt: String)(
          xform: org.apache.spark.sql.DataFrame =>
            org.apache.spark.sql.DataFrame): Unit = {
        val q = s.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(srcDDL))
          .format("graft.sources.LakehouseStreamProvider")
          .option("maxVersionsPerTrigger", "1")
          .load(lake.tablePath(src))
          .transform(xform)
          .writeStream
          .format("graft.sources.LakehouseSinkProvider")
          .option("path", lake.tablePath(dst))
          .option("checkpointLocation", dir.resolve(ckpt).toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      def drainAll(): Unit = {
        // bronze → silver: conform (even keys only, derived value2x)
        hop("bronze", "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
          "event_type STRING, value DOUBLE", "silver", "ckpt_silver")(
          _.filter(col("event_id") % 2 === 0)
            .withColumn("value2x", col("value") * 2).drop("value"))
        // silver → gold: business slice (high-value rows, narrow shape)
        hop("silver", silverDDL, "gold", "ckpt_gold")(
          _.filter(col("value2x") > 50)
            .select(col("event_id"), col("event_type"), col("value2x")))
      }
      (0 to 1).foreach { sl =>
        lake.append("bronze", ev.filter(pmod(col("event_id"), lit(3)) === sl))
      }
      drainAll()
      // late-arriving slice: the chain must propagate INCREMENTALLY
      lake.append("bronze", ev.filter(pmod(col("event_id"), lit(3)) === 2))
      drainAll()
      // incrementality pinned structurally: one sink commit per source
      // delta per hop (3 bronze slices → 3 silver commits → 3 gold
      // commits); a rescan would change the commit counts, not just
      // rely on dedup to fix the rows
      require(lake.versions("silver").length == 3 &&
        lake.versions("gold").length == 3,
        s"medallion hops must process each upstream delta exactly once: " +
          s"silver=${lake.versions("silver").length} " +
          s"gold=${lake.versions("gold").length}")
      lake.read("gold",
        org.apache.spark.sql.types.StructType.fromDDL(goldDDL))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("key_sum"),
          sum(col("value2x").cast("decimal(18,2)")).cast("double")
            .as("val_sum"))
    }),

    // s19 — streaming a CATALOG TABLE BY NAME: `readStream.table(
    // "graft.ns.t")` tails the same commit log as the path-based source
    // (admission control riding the read options), with the table
    // CREATED and FED purely through SQL — the full-circle proof that
    // the catalog, the SQL write path and the streaming source share
    // one commit protocol. Events land via INSERT…SELECT in three
    // slices; the stream drains them through the exactly-once sink.
    "s19_stream_table_by_name" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s19")
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.root", dir.resolve("cat").toString)
      // catalog instances cache per name: re-point the fresh root NOW
      // (repeated bench sweeps re-register the same catalog name)
      org.apache.spark.sql.GraftColumnBridge.resetCatalogs(s)
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString)
      graft.Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .createOrReplaceTempView("s19_src")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.s19")
      s.sql("DROP TABLE IF EXISTS graft.s19.feed")
      s.sql("""CREATE TABLE graft.s19.feed (
        event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE)""")
      (0 to 2).foreach { sl =>
        s.sql(s"""INSERT INTO graft.s19.feed
          SELECT event_id, user_id, event_type, value
          FROM s19_src WHERE event_id % 3 = $sl""")
      }
      val q = s.readStream
        .option("maxVersionsPerTrigger", "1")
        .table("graft.s19.feed")
        .filter(col("event_id") % 2 === 1)
        .writeStream
        .format("graft.sources.LakehouseSinkProvider")
        .option("path", lake.tablePath("odd_events"))
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      lake.read("odd_events",
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, user_id BIGINT, event_type STRING, " +
            "value DOUBLE"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("key_sum"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("val_sum"))
    }),

    // s20 — catalog-to-catalog streaming BY NAME with the V2 streaming
    // write: `readStream.table` tails the source's commit log,
    // `writeStream.toTable` stages parquet executor-side and commits
    // each epoch as one exactly-once delta (a REAL V2 write — tasks
    // encode with Spark's parquet encoder, the driver commit only
    // renames; metadata-sized regardless of volume). The probe is
    // s17's brutal one: after the first drain the CHECKPOINT IS
    // DESTROYED and the whole query re-runs — every epoch re-stages,
    // the commit recognizes its batch marker, and the destination
    // must hash as if the stream ran once.
    "s20_stream_to_table" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-s20")
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.root", dir.resolve("cat").toString)
      // catalog instances cache per name: re-point the fresh root NOW
      // (repeated bench sweeps re-register the same catalog name)
      org.apache.spark.sql.GraftColumnBridge.resetCatalogs(s)
      graft.Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .createOrReplaceTempView("s20_src")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.s20")
      s.sql("DROP TABLE IF EXISTS graft.s20.feed")
      s.sql("DROP TABLE IF EXISTS graft.s20.sunk")
      s.sql("""CREATE TABLE graft.s20.feed (
        event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE)""")
      s.sql("""CREATE TABLE graft.s20.sunk (
        event_id BIGINT, event_type STRING, value DOUBLE)""")
      (0 to 2).foreach { sl =>
        s.sql(s"""INSERT INTO graft.s20.feed
          SELECT event_id, user_id, event_type, value
          FROM s20_src WHERE event_id % 3 = $sl""")
      }
      def run(ckpt: String): Unit = {
        val q = s.readStream
          .option("maxVersionsPerTrigger", "1")
          .table("graft.s20.feed")
          .filter(col("event_id") % 2 === 0)
          .select(col("event_id"), col("event_type"), col("value"))
          .writeStream
          .option("checkpointLocation", dir.resolve(ckpt).toString)
          .trigger(Trigger.AvailableNow())
          .toTable("graft.s20.sunk")
        q.awaitTermination()
      }
      run("ckpt1")
      run("ckpt2") // fresh checkpoint: full replay, commit must dedup all
      s.sql("""SELECT event_type, count(*) AS n,
          sum(event_id) AS key_sum,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        FROM graft.s20.sunk GROUP BY 1""")
    }),

    // s16 — CONTINUOUSLY-MAINTAINED materialized view: the lakehouse CDF
    // stream drives MaterializedView.applyFeedBatch, folding each
    // micro-batch's signed change rows (insert +, delete −) into a
    // persisted aggregate EXACTLY ONCE — the batch-id stamp commits
    // atomically with the fold, and the injected crash AFTER batch 1's
    // commit proves the replayed batch is recognized and skipped on
    // restart (a double-fold would double val_sum and hash-mismatch).
    // This is the production composition the batch pieces build toward:
    // continuous ingest + takedowns → an always-fresh rollup, refresh IO
    // proportional to the day's changes, never a base re-scan. The
    // oracle recomputes the final rollup from `events` minus the deleted
    // slice.
    "s16_stream_mv_maintenance" -> ((s, d) => {
      import graft.ops.MaterializedView
      val dir = java.nio.file.Files.createTempDirectory("graft-s16")
      // feed consumers read old versions: q65's retention contract
      val lake = new graft.storage.Lakehouse(s, dir.resolve("lake").toString,
        gcGraceMs = 3600000L)
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      (0 to 2).foreach { sl =>
        lake.append("events_feed",
          ev.filter(pmod(col("event_id"), lit(3)) === sl))
      }
      val contract = org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
          "event_type STRING, value DOUBLE")
      lake.delete("events_feed", contract,
        pmod(col("event_id"), lit(7)) === 0, cdf = true)
      val feedSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, _change_type STRING, " +
          "_commit_version BIGINT")
      // exact decimal algebra through the fold (double sums would drift
      // vs the oracle under incremental ordering); double at serve time
      val spec = MaterializedView.Spec(
        groupCols = Seq("event_type" -> col("event_type")),
        sumCols = Seq(
          "key_sum" -> col("event_id"),
          "val_sum" -> col("value").cast("decimal(18,2)")))
      def source = s.readStream.schema(feedSchema)
        .format("graft.sources.LakehouseStreamProvider")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1")
        .load(lake.tablePath("events_feed"))
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def run(): Unit = {
        val q = source.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            MaterializedView.applyFeedBatch(lake, "mv_event_type",
              contract, spec, batch, id)
            if (id == 1L && !crashed.getAndSet(true))
              throw new RuntimeException("injected crash after MV commit")
        }
          .option("checkpointLocation", dir.resolve("ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val died = try { run(); false }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException
            if e.getMessage.contains("injected crash") => true
        }
      require(died, "s16 harness: the injected crash did not fire")
      run() // restart: batch 1 replays into the stamp check, then 2..n
      MaterializedView.read(lake, "mv_event_type", contract, spec)
        .withColumn("val_sum", col("val_sum").cast("double"))
    }),

    // hopping (sliding) event-time windows: 1-hour windows every 15
    // minutes — each event lands in exactly 4 overlapping windows, the
    // state/update-amplification shape tumbling (s01) doesn't exercise.
    // Spark expands the 4 window assignments map-side; state is keyed on
    // (window, type) so the overlap costs 4× state entries, not 4×
    // shuffles.
    "s11_stream_hopping_counts" -> ((s, d) => withStreamPartitions(s) {
      val sink = s"s11_out_${System.nanoTime()}"
      val q = eventsStream(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      drained(s, sink,
        s.table(sink).select(col("window.start").as("w_start"),
          col("event_type"), col("n")))
    })
  )

  /** s07's state machine as a StatefulProcessor (arbitrary-state v2):
    * one ValueState[Int] per user carries the consecutive-error counter
    * across micro-batches; rows sort microsecond-exact inside each
    * group delivery, as in s06.
    */
  private class ConsecErrorProcessor extends StatefulProcessor[
      Long, (Long, Long, java.sql.Timestamp, String), (Long, Long)] {
    @transient private var consec: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      consec = getHandle.getValueState[Int]("consec",
        org.apache.spark.sql.Encoders.scalaInt, TTLConfig.NONE)

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, java.sql.Timestamp, String)],
        timerValues: TimerValues): Iterator[(Long, Long)] = {
      var c = if (consec.exists()) consec.get() else 0
      val out = Seq.newBuilder[(Long, Long)]
      def micros(t: java.sql.Timestamp): Long =
        (t.getTime / 1000) * 1000000L + t.getNanos / 1000
      rows.toSeq.sortBy(r => (micros(r._3), r._2)).foreach {
        case (_, eid, _, typ) =>
          c = if (typ == "error") c + 1 else 0
          if (c == 3) out += ((user, eid))
      }
      consec.update(c)
      out.result().iterator
    }
  }

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

  private val consecErrorSql =
    """WITH o AS (
      | SELECT user_id, event_id, ts, event_type,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS rn,
      |  row_number() OVER (PARTITION BY user_id, event_type
      |    ORDER BY ts, event_id) AS rne
      | FROM events),
      |runs AS (
      | SELECT user_id, event_id, event_type,
      |  row_number() OVER (PARTITION BY user_id, event_type, rn - rne
      |    ORDER BY ts, event_id) AS pos
      | FROM o)
      |SELECT user_id, event_id FROM runs
      |WHERE event_type = 'error' AND pos = 3""".stripMargin

  /** The converged s13 index, re-derived declaratively: centroids exact
    * floor-means over the INITIAL (vec_id%3=0) slice only — the frozen
    * codebook; PQ codes for every vector against it; coarse cells =
    * build label for initial vectors, nearest-centroid by integer dot
    * (ties → smallest label) for streamed ones — AnnIndex's assignment
    * rule; probes/ADC exactly as the e08 oracle. A doubled (replayed)
    * batch, a dropped one, or codes encoded against retrained centroids
    * all hash-mismatch.
    */
  private lazy val s13Sql: String = {
    val qv = TrainingPack.qv
    s"""WITH sums AS (
       | SELECT label, generate_subscripts(q, 1) - 1 AS dim, unnest(q) AS qc
       | FROM (SELECT label, $qv AS q FROM embeddings
       |       WHERE vec_id % 3 = 0) t),
       |cent AS (
       | SELECT label, dim,
       |  CAST((CAST(sum(qc) AS BIGINT)
       |        - ((CAST(sum(qc) AS BIGINT) % count(*)) + count(*)) % count(*))
       |       / count(*) AS BIGINT) AS c
       | FROM sums GROUP BY label, dim),
       |cd AS (
       | SELECT vec_id, label, dim // 16 AS s,
       |  CAST(sum((qc - c) * (qc - c)) AS BIGINT) AS d2
       | FROM (SELECT vec_id, generate_subscripts(q, 1) - 1 AS dim,
       |        unnest(q) AS qc
       |       FROM (SELECT vec_id, $qv AS q FROM embeddings) t) v
       | JOIN cent USING (dim)
       | GROUP BY vec_id, label, dim // 16),
       |codes AS (
       | SELECT vec_id AS neighbor_id, s, label FROM (
       |  SELECT vec_id, s, label,
       |   row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, label) AS rn
       |  FROM cd) t WHERE rn = 1),
       |qdists AS (SELECT vec_id AS query_id, s, label, d2 FROM cd
       |           WHERE vec_id < 5),
       |vfull AS (SELECT vec_id, generate_subscripts(q, 1) - 1 AS dim,
       |           unnest(q) AS qc
       |          FROM (SELECT vec_id, $qv AS q FROM embeddings) t),
       |vdot AS (SELECT vec_id, label, CAST(sum(qc * c) AS BIGINT) AS cdot
       |         FROM vfull JOIN cent USING (dim) GROUP BY vec_id, label),
       |assigned AS (
       | SELECT vec_id AS neighbor_id, label AS coarse FROM (
       |  SELECT vec_id, label,
       |   row_number() OVER (PARTITION BY vec_id
       |     ORDER BY cdot DESC, label) AS pr
       |  FROM vdot) t WHERE pr = 1),
       |co AS (SELECT vec_id AS neighbor_id, label AS coarse
       |       FROM embeddings WHERE vec_id % 3 = 0
       |       UNION ALL
       |       SELECT neighbor_id, coarse FROM assigned
       |       WHERE neighbor_id % 3 <> 0),
       |probes AS (
       | SELECT query_id, label AS coarse FROM (
       |  SELECT vec_id AS query_id, label,
       |   row_number() OVER (PARTITION BY vec_id
       |     ORDER BY cdot DESC, label) AS pr
       |  FROM vdot WHERE vec_id < 5) t WHERE pr <= 2),
       |adc AS (
       | SELECT qdists.query_id, codes.neighbor_id,
       |  CAST(sum(qdists.d2) AS BIGINT) AS dist
       | FROM codes
       | JOIN co USING (neighbor_id)
       | JOIN probes ON probes.coarse = co.coarse
       | JOIN qdists ON qdists.query_id = probes.query_id
       |            AND qdists.s = codes.s AND qdists.label = codes.label
       | WHERE codes.neighbor_id <> qdists.query_id
       | GROUP BY 1, 2)
       |SELECT query_id, neighbor_id, dist, rk FROM (
       | SELECT query_id, neighbor_id, dist,
       |  row_number() OVER (PARTITION BY query_id
       |    ORDER BY dist, neighbor_id) AS rk
       | FROM adc) t WHERE rk <= 5""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "s13_stream_index_maintenance" -> s13Sql,
    // the converged incremental index == a from-scratch build, so the
    // oracle IS t17's full-corpus BM25 (shared CTEs — zero drift)
    "s21_stream_bm25_maintenance" ->
      s"""WITH ${TrainingPack.bm25Ctes}
         |SELECT CAST(query_id AS BIGINT) AS query_id,
         | CAST(row_number() OVER w AS BIGINT) AS rk, doc_id, score
         |FROM ag
         |WINDOW w AS (PARTITION BY query_id ORDER BY score DESC, doc_id)
         |QUALIFY rk <= 5""".stripMargin,
    // the converged streaming dedup ≡ the from-scratch d04 chain (same
    // shared CTEs) restricted to pairs with at least one streamed side
    // — seed-internal pairs are the only ones no batch ever owns
    "s22_stream_incremental_dedup" ->
      s"""WITH ${TrainingPack.minhashPairsCtes}
         |SELECT id_a, id_b, jaccard FROM pairs
         |WHERE jaccard >= 0.8
         |  AND NOT (id_a % 3 = 0 AND id_b % 3 = 0)""".stripMargin,
    "s01_stream_hourly_counts" ->
      """SELECT date_trunc('hour', ts) AS w_start, event_type,
        | count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "s02_stream_static_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        | min(user_id) AS min_user, max(user_id) AS max_user
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "s03_stream_stream_join" ->
      """SELECT a.user_id, a.event_id AS click_id,
        | b.event_id AS purchase_id
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE""".stripMargin,
    "s05_stream_sessions" -> RelationalPack.sessionWindowSql,
    // each event belongs to the 4 hour-long windows whose 15-min-aligned
    // starts cover it: time_bucket(ts) − k·15min, k ∈ 0..3
    "s11_stream_hopping_counts" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts)
        |  - k * INTERVAL '15 minutes' AS w_start,
        | event_type, count(*) AS n
        |FROM events
        |CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) hop
        |GROUP BY 1, 2""".stripMargin,
    // the 3rd event of every consecutive-error run, per user: runs are
    // islands of (global rownum − per-type rownum), position within the
    // island = the state machine's counter value; shared by both
    // stateful APIs (s06 flatMapGroupsWithState, s07 transformWithState)
    "s06_stream_stateful_alerts" -> consecErrorSql,
    "s07_stream_transform_state" -> consecErrorSql,
    "s04_stream_dedup" ->
      """SELECT DISTINCT
        | md5(array_to_string(regexp_extract_all(lower(text), '\S+'), ' '))
        |   AS fp
        |FROM documents""".stripMargin,
    "s08_stream_dedup_watermark" ->
      """SELECT DISTINCT user_id, event_type,
        | date_trunc('minute', ts) AS minute
        |FROM events""".stripMargin,
    "s09_stream_lake_sink" ->
      """SELECT event_type AS oper_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS users
        |FROM events GROUP BY 1""".stripMargin,
    // the restart replay must land every event exactly once — identical
    // contract (and oracle) to s09, now across a crash+restart boundary
    "s12_stream_restart_recovery" ->
      """SELECT event_type AS oper_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS users
        |FROM events GROUP BY 1""".stripMargin,
    "s10_stream_cdc_upsert" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        | SELECT user_id, event_id, ts, event_type, value,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,
    // the s09/s12 exactly-once contract through the custom DSv2 source,
    // plus max(ts) pinning the source's own timestamp decode
    "s14_lakehouse_stream_source" ->
      """SELECT event_type AS oper_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS users,
        | max(ts) AS last_ts
        |FROM events GROUP BY 1""".stripMargin,
    // inserts = every event (three delta commits); deletes = exactly the
    // rows the takedown removed, as recorded inside its commit
    "s15_stream_cdc_feed" ->
      """SELECT 'insert' AS change_type, event_type,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events GROUP BY 2
        |UNION ALL
        |SELECT 'delete' AS change_type, event_type,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events WHERE event_id % 7 = 0 GROUP BY 2""".stripMargin,
    // same two-branch recomputation as s15 — the struct payload is
    // transparent to the oracle (it reads the raw flat events)
    "s23_stream_struct_cdf" ->
      """SELECT 'insert' AS change_type, event_type,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events GROUP BY 2
        |UNION ALL
        |SELECT 'delete' AS change_type, event_type,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events WHERE event_id % 7 = 0 GROUP BY 2""".stripMargin,
    // one pass of the even-keyed filter, despite the double run
    "s17_stream_lakehouse_sink" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events WHERE event_id % 2 = 0 GROUP BY 1""".stripMargin,
    // even-keyed events, V2-written exactly once despite the replay
    "s20_stream_to_table" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events WHERE event_id % 2 = 0 GROUP BY 1""".stripMargin,
    // odd-keyed events, streamed once off the SQL-fed catalog table
    "s19_stream_table_by_name" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events WHERE event_id % 2 = 1 GROUP BY 1""".stripMargin,
    // gold = both hops' predicates over the source events, seen once
    "s18_stream_medallion" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(value * 2 AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events WHERE event_id % 2 = 0 AND value * 2 > 50
        |GROUP BY 1""".stripMargin,
    // the streamed MV converges to the post-takedown rollup: all events
    // minus the deleted slice — a double-applied batch (crash replay) or
    // a missed delete record breaks n/key_sum/val_sum
    "s16_stream_mv_maintenance" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(event_id) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events WHERE event_id % 7 <> 0 GROUP BY 1""".stripMargin
  )
}

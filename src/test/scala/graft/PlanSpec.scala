package graft

/** Plan-shape regression tests: the perf properties the engine's design
  * depends on, asserted on explain output (AQE wraps the physical plan in
  * AdaptiveSparkPlanExec, so tree `collect` can't see inside — the
  * explain text can). No data is processed.
  */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def explain(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)

  private def count(hay: String, needle: String): Int =
    needle.r.findAllMatchIn(hay).length

  test("q05 join chain: all dims broadcast, exactly one shuffle (final agg)") {
    val p = explain("q05_join5_revenue")
    assert(count(p, "BroadcastHashJoin") === 4, p)
    assert(count(p, "Exchange hashpartitioning") === 1, p)
  }

  test("t01 token stats: map-only (no exchange of any kind)") {
    val p = explain("t01_token_stats")
    assert(!p.contains("Exchange"), p)
  }

  test("scans prune columns: q01 reads only the 3 needed lineitem columns") {
    val p = SparkEntry.queries("q01_agg_grain_min")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val read = p.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(Seq("l_returnflag", "l_linestatus", "l_shipdate")
      .forall(read.contains), read)
    assert(!read.contains("l_extendedprice") && !read.contains("l_orderkey"),
      read)
  }

  test("mart fact scan carries a partition filter") {
    val lake = new graft.storage.Lakehouse(spark, tmpDir("planspec"))
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row("t1", ts("2020-05-01 10:00:00"), "c", "Оплата",
          dec("10"), "Успешно", "T1")),
      graft.model.Schemas.factTransactions)
    lake.appendPartitionedByDay("fact_transactions", df, "trans_date")
    val stg = graft.mart.MartStaging.build(lake, graft.mart.MartStaging.Scd2Dims)
    val p = stg.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("PartitionFilters: [isnotnull(trans_dt_day"), p)
  }

  test("q36 chain detect: one shuffle — island window reuses user_id partitioning") {
    val p = explain("q36_chain_detect")
    // Window.partitionBy(user_id, island) is satisfied by the existing
    // hashpartitioning(user_id) (subset rule) — a second exchange here
    // would double the shuffle bytes for nothing
    assert(count(p, "Exchange hashpartitioning") === 1, p)
  }

  test("e05 IVF: centroids+probes broadcast; corpus shuffles only on cell label") {
    val p = explain("e05_ivf_topk")
    // no sort-merge join anywhere: assignment and list-probe joins are all
    // broadcast-side (the centroid table is |cells|×dims, the probe map
    // |Q|×nProbe)
    assert(!p.contains("SortMergeJoin"), p)
    assert(count(p, "BroadcastHashJoin") >= 2, p)
  }

  test("q39/q40 SCD merges: equi-joins only, no cartesian product") {
    Seq("q39_scd2_merge", "q40_scd1_merge").foreach { q =>
      val p = explain(q)
      assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
        s"$q:\n$p")
    }
  }

  test("t08 trigram profile: map-only native expression, no exchange") {
    val p = explain("t08_char_ngrams")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("char_ngram_profile"), p)
  }

  test("t12 redaction and t13 chunking: map-only (no exchange of any kind)") {
    assert(!explain("t12_pii_redact").contains("Exchange"))
    assert(!explain("t13_chunk").contains("Exchange"))
  }

  test("d19 sharded shuffle: one exchange (per-shard sort, no global window)") {
    val p = explain("d19_shuffle_shards")
    assert(count(p, "Exchange hashpartitioning") === 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("d20 cross-doc grams: gram exchange reused by both aggregations") {
    // exchange reuse happens at AQE runtime — execute, then read the
    // final adaptive plan
    val df = SparkEntry.queries("d20_crossdoc_ngrams")(spark, sf)
    df.collect()
    // explainString appends the pre-AQE "Initial Plan" — trim to the
    // final plan before counting operators
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
      .split("== Initial Plan ==").head
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("ReusedExchange"), p)
    // the expensive gram pipeline (tokenize + 8-gram + md5 explode) must
    // be planned exactly once
    assert(count(p, "Generate explode") === 1, p)
  }

  test("d29 span coverage: one gram pipeline, no global-sort window") {
    val df = SparkEntry.queries("d29_dup_span_coverage")(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
      .split("== Initial Plan ==").head
    assert(p.contains("isFinalPlan=true"), p)
    // the tokenize + 8-gram + md5 posexplode pipeline is planned ONCE:
    // the global occurrence count is a window over the single gram
    // exchange, not a count-agg joined back (which would re-derive the
    // pipeline on the probe side)
    assert(count(p, "Generate posexplode") === 1, p)
    // every window partitions on g or doc_id — never a single-partition
    // global sort
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("d18 simhash pairs: equi-join banding only, no cartesian product") {
    val p = explain("d18_simhash_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t09 repetition signals: map-only (no exchange of any kind)") {
    val p = explain("t09_repetition")
    assert(!p.contains("Exchange"), p)
  }

  test("d16 decontamination: benchmark side broadcast, corpus grams never shuffle") {
    val p = explain("d16_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // exactly two hash exchanges: the BENCHMARK-side shingle distinct
    // (eval-suite-sized, cheap) and the final per-doc count agg — the
    // corpus side's exploded grams must never appear in an exchange
    assert(count(p, "Exchange hashpartitioning") === 2, p)
  }

  test("t11 unigram score: vocab broadcast to the exploded token stream") {
    val p = explain("t11_unigram_score")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d15 packing plan has no global single-partition sort") {
    // the prefix sum must never degenerate to `sum OVER (ORDER BY id)`:
    // a rangepartitioning exchange with numPartitions=1 (or a Window
    // with an empty partition spec) would be that anti-pattern
    val p = explain("d15_seq_pack")
    assert(!p.contains("Window"), p)
    assert(!p.contains("rangepartitioning(id ASC NULLS FIRST, 1)"), p)
  }

  test("q45 bloom semi-join: probe filters the scan before the join") {
    val p = explain("q45_bloom_semi_join")
    // the bloom probe must sit in the lineitem scan's Filter (pre-join
    // row pruning — the whole point), and the exact semi-join must be
    // the broadcast form, never a shuffled SMJ
    assert(p.contains("bloom_might_contain"), p)
    assert(p.indexOf("bloom_might_contain") < p.indexOf("Join LeftSemi") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q42 CMS heavy hitters: prefilter precedes the one count shuffle") {
    val p = explain("q42_cms_heavy_hitters")
    assert(p.contains("cms_estimate"), p)
    // exactly one hash exchange — the exact re-count over candidates;
    // the sketch pass itself is a separate collected job, not a shuffle
    assert(count(p, "Exchange hashpartitioning") === 1, p)
  }

  test("q46 HLL rollup: day sketches union without re-scanning raw rows") {
    val p = explain("q46_hll_monthly_uniques")
    // estimate path: day-grain partial agg → month-grain union agg;
    // the month union consumes sketches, not raw o_custkey rows
    assert(p.contains("hll_union_agg") || p.contains("HllUnionAgg"), p)
    assert(p.contains("hll_sketch_agg") || p.contains("HllSketchAgg"), p)
  }

  test("e08 IVF+PQ: probe map and query distances broadcast, no cartesian") {
    val p = explain("e08_ivfpq_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("e09 rerank: shortlist broadcast into the corpus scan, no cartesian, " +
    "no corpus shuffle for the exact pass") {
    val base = explain("e08_ivfpq_topk")
    val p = explain("e09_ivfpq_rerank")
    assert(!p.contains("CartesianProduct"), p)
    // the rerank stage must add ONLY broadcast joins on top of e08's
    // inner ADC chain — a dropped broadcast() hint would surface as a
    // NEW SortMergeJoin on a corpus-sized side (a bare contains-BHJ
    // check can't see that: the inner chain already has broadcasts)
    assert(count(p, "SortMergeJoin") === count(base, "SortMergeJoin"), p)
    assert(count(p, "BroadcastHashJoin") > count(base, "BroadcastHashJoin"), p)
  }

  test("t14 tf-idf: doc-frequency table broadcast, no SMJ") {
    val p = explain("t14_tfidf_terms")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q48 interpolation: both window frames share one user_id exchange") {
    val p = explain("q48_interpolate")
    // forward and backward carries partition and order identically —
    // a second exchange (or a per-frame re-sort exchange) would double
    // the shuffle for nothing
    assert(count(p, "Exchange hashpartitioning") === 1, p)
  }

  test("d23/d24 star fallback: equi-join banding only, no cartesian; " +
    "hub selection is a min_by aggregate") {
    for (q <- Seq("d23_minhash_star_pairs", "d24_simhash_star_pairs")) {
      val p = explain(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      // the O(m) star path: hubs come from a per-bucket min_by aggregate,
      // not a window or a self-join over the megabucket
      assert(p.contains("min_by"), s"$q: $p")
    }
  }

  test("d25 embedding star: no cartesian, min_by hub aggregate") {
    val p = explain("d25_embedding_star_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("min_by"), p)
  }

  test("q53 JDBC read: 8 range partitions, status predicate pushed to the DB") {
    // building the frame performs the Derby write + bounds lookup (tiny at
    // sf0.001); the assertions pin the SCALE contract — parallel range
    // scan, remote filtering
    val p = explain("q53_jdbc_roundtrip")
    assert(p.contains("JDBCRelation"), p)
    assert(p.contains("numPartitions=8"), p)
    assert("PushedFilters: \\[[^\\]]*o_orderstatus[^\\]]*\\]".r
      .findFirstIn(p).isDefined, p)
  }

  test("q57 profile: exact-distinct Expand stays separate from the HLL " +
    "aggregate (the q24 cliff)") {
    val p = explain("q57_table_profile")
    // one Expand (the multi-column distinct rewrite), and the buffering
    // HLL aggregate must never share an aggregate node with the rewrite
    // (whose FILTER (gid=...) markers tag its functions) — the merged
    // form evaluates every buffer on (k+1)× expanded rows off hash
    // aggregation (~90 s at sf0.1; the split is sub-second). The keyless
    // SortAggregate the sketch side picks is fine: no keys, no sort.
    assert(count(p, "Expand") === 1, p)
    assert(!p.linesIterator.exists(l =>
      l.contains("approx_count_distinct") && l.contains("gid#")), p)
  }

  test("q54 bucketed join: ZERO exchanges — scan, SMJ, and per-order agg " +
    "all ride the bucket partitioning") {
    // building the frame performs the bucketed writes (tiny at sf0.001);
    // the assertion pins the SCALE contract: co-bucketed layout means the
    // join and the bucket-key aggregate never shuffle
    val p = explain("q54_bucketed_join")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("SortMergeJoin"), p)
    // the scan actually uses the bucket metadata (not a plain file scan)
    assert(p.contains("Bucketed: true"), p)
  }

  test("F4 detect: single shuffle on client, no driver-side collect in plan") {
    import org.apache.spark.sql.functions._
    val lake = new graft.storage.Lakehouse(spark, tmpDir("planspec-f4"))
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row("t1", ts("2020-05-01 10:00:00"), "c", "Оплата",
          dec("10"), "Успешно", "T1")),
      graft.model.Schemas.factTransactions)
    lake.appendPartitionedByDay("fact_transactions", df, "trans_date")
    val stg = graft.mart.MartStaging.build(lake, graft.mart.MartStaging.Scd2Dims)
      .select(col("trans_date"), col("client"), col("passport_num"),
        col("fio"), col("phone"), col("oper_result"), col("amount"))
    val p = graft.mart.AmountGuessing.detect(stg, ts("2020-05-09 12:00:00"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("MapGroups"), p)
  }

  test("d32 source quota: rank and partition count share ONE exchange") {
    val p = explain("d32_source_quota")
    // two Window nodes (row_number + count) both partitioned on source —
    // a count-agg + join-back spelling would cost a second shuffle
    assert(count(p, "(?m)^\\s*\\+?-? ?Window ") === 2, p)
    assert(count(p, "Exchange hashpartitioning") === 1, p)
  }

  test("d33 cross-doc dedup: two shuffles (chunk, doc) and rank-limit pushdown") {
    val p = explain("d33_crossdoc_chunk_dedup")
    // chunk-keyed first-occurrence window + doc-keyed reassembly agg;
    // the rn=1 filter must push into the shuffle as WindowGroupLimit
    // (partial mode drops per-chunk non-firsts BEFORE the exchange)
    assert(count(p, "Exchange hashpartitioning") === 2, p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("e11 filtered IVF: candidate filter at list-scan, bounded top-k, no cartesian") {
    val p = explain("e11_filtered_ivf")
    // the predicate evaluates against the stored lists (scan-side
    // Filter), never by rebuilding the index; ranking stays in the
    // bounded aggregator, not a window over the scored set
    assert(p.contains("% 2) = 0"), p)
    assert(p.contains("topkpairs"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d34 span surgery: benchmark grams and spans broadcast, corpus " +
    "tokens never shuffle beyond the doc key") {
    val p = explain("d34_decontaminate_spans")
    // benchmark-gram set and the per-doc span list both broadcast into
    // the doc-partitioned corpus stream; no sort-merge or cartesian
    assert(count(p, "BroadcastHashJoin") >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // island windows ride the doc key (REPARTITION_BY_COL), never a
    // global sort
    assert(!p.contains("rangepartitioning"), p)
  }

  test("CBO: ANALYZE column stats flip the join strategy (q78's feed)") {
    // Three catalog tables; the middle one carries a HIGHLY selective
    // predicate (v < 50 over v uniform in [0, 300k)) that only COLUMN
    // stats can see: without ANALYZE the V2 scan reports file
    // size/row count but the Filter can't be estimated, so the join
    // keeps its sort-merge plan; with ANALYZE the min/max-driven
    // selectivity collapses the estimated build side under the
    // broadcast threshold and the SAME query plans broadcast joins.
    // This is the stats-driven plan change q78 was missing evidence
    // for (VERDICT r6 task 8).
    spark.conf.set("spark.sql.catalog.graftcbo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftcbo.root", tmpDir("cbo-root"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcbo.c")
    spark.sql("CREATE TABLE graftcbo.c.big (k BIGINT, p BIGINT)")
    spark.sql(
      "INSERT INTO graftcbo.c.big SELECT id, id % 97 FROM range(0, 300000)")
    // incompressible pad keeps the FILE size (the no-stats estimate)
    // well above the broadcast threshold
    spark.sql("CREATE TABLE graftcbo.c.sel (k BIGINT, v BIGINT, pad STRING)")
    spark.sql("""INSERT INTO graftcbo.c.sel
      SELECT id, id, md5(CAST(id AS STRING)) FROM range(0, 300000)""")
    spark.sql("CREATE TABLE graftcbo.c.t (p BIGINT, lbl STRING)")
    spark.sql(
      "INSERT INTO graftcbo.c.t SELECT id, concat('x', id) FROM range(0, 97)")
    def plan: String = spark.sql(
      """SELECT count(*) FROM graftcbo.c.big b
        JOIN graftcbo.c.sel s ON b.k = s.k AND s.v < 50
        JOIN graftcbo.c.t t ON b.p = t.p""")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (1024 * 1024).toString) {
      val before = plan
      assert(count(before, "SortMergeJoin") >= 1, before)
      spark.sql("CALL graftcbo.system.analyze('c', 'sel')")
      spark.sql("CALL graftcbo.system.analyze('c', 'big')")
      spark.sql("CALL graftcbo.system.analyze('c', 't')")
      val after = plan
      assert(!after.contains("SortMergeJoin"), after)
      assert(count(after, "BroadcastHashJoin") >= 2, after)
      // VERSION-STAMPED STALENESS (round 9): grow `sel` 100× past its
      // ANALYZE stamp — the scan must STOP serving the stale column
      // stats (an NDV/min-max describing 300k rows would keep pricing
      // the 30M-row filter as broadcastable), and the plan falls back
      // to sort-merge until the next ANALYZE
      spark.sql("""INSERT INTO graftcbo.c.sel
        SELECT id, id, md5(CAST(id AS STRING))
        FROM range(300000, 3300000)""")
      val grown = plan
      assert(count(grown, "SortMergeJoin") >= 1,
        s"stale stats must decline after 100x growth:\n$grown")
      // re-ANALYZE re-stamps: the fresh numbers serve again (the
      // selective filter is still selective, so broadcasts return)
      spark.sql("CALL graftcbo.system.analyze('c', 'sel')")
      val restamped = plan
      assert(count(restamped, "BroadcastHashJoin") >= 1, restamped)
    }
  }

  test("CBO equi-height histograms: a skewed equality filter flips the " +
    "join strategy ONLY with the histogram (NDV alone mis-prices the " +
    "hot value)") {
    spark.conf.set("spark.sql.catalog.gh", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gh.root", tmpDir("hist-root"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gh.c")
    spark.sql("DROP TABLE IF EXISTS gh.c.skew")
    spark.sql("DROP TABLE IF EXISTS gh.c.probe")
    // s is HOT at 0 (95% of rows) with 10k rare distinct values — the
    // uniform NDV estimate prices `s = 0` at rows/ndv ≈ 20 rows
    spark.sql("CREATE TABLE gh.c.skew (k BIGINT, s BIGINT)")
    spark.sql("""INSERT INTO gh.c.skew
      SELECT id, CASE WHEN id < 190000 THEN 0 ELSE id END
      FROM range(0, 200000)""")
    spark.sql("CREATE TABLE gh.c.probe (k BIGINT, w BIGINT)")
    spark.sql(
      "INSERT INTO gh.c.probe SELECT id, id * 3 FROM range(0, 100000)")
    def plan(v: Long): String = spark.sql(
      s"""SELECT count(*) FROM gh.c.skew b
        JOIN gh.c.probe p ON b.k = p.k WHERE b.s = $v""")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString) {
      // NDV-only stats (histograms off): the hot value estimates as
      // ~20 rows -> the filtered side broadcasts. WRONG: it is 95% of
      // the table.
      withSQLConf("spark.graft.histogramBins" -> "0") {
        spark.sql("CALL gh.system.analyze('c', 'skew')")
        spark.sql("CALL gh.system.analyze('c', 'probe')")
      }
      val ndvOnly = plan(0L)
      assert(ndvOnly.contains("BroadcastHashJoin"),
        s"uniform NDV must (mis-)broadcast the hot-value filter:\n$ndvOnly")
      // re-ANALYZE with histograms: the hot value spans most bins ->
      // ~190k estimated rows -> too big to broadcast -> sort-merge
      spark.sql("CALL gh.system.analyze('c', 'skew')")
      val hot = plan(0L)
      assert(hot.contains("SortMergeJoin"),
        s"the histogram must price the hot value at ~95% of rows:\n$hot")
      // ...while a genuinely RARE value stays broadcastable — the
      // histogram sharpens both directions, it doesn't just inflate
      val rare = plan(195123L)
      assert(rare.contains("BroadcastHashJoin"),
        s"a rare value must still broadcast under the histogram:\n$rare")
    }
    spark.sql("DROP TABLE gh.c.skew")
    spark.sql("DROP TABLE gh.c.probe")
  }

  test("CBO histograms price RANGE predicates (round-12): a skewed " +
    "BETWEEN flips the join strategy only with the histogram") {
    spark.conf.set("spark.sql.catalog.ghr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ghr.root", tmpDir("histr-root"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghr.c")
    spark.sql("DROP TABLE IF EXISTS ghr.c.skew")
    spark.sql("DROP TABLE IF EXISTS ghr.c.probe")
    // 95% of s-values are DENSE in [0, 1000); the rest spread to 200k.
    // Uniform range selectivity prices BETWEEN 0 AND 999 as
    // 1000/200000 = 0.5% (~1k rows — broadcastable); the histogram
    // knows those bins hold ~95% of the table.
    spark.sql("CREATE TABLE ghr.c.skew (k BIGINT, s BIGINT)")
    spark.sql("""INSERT INTO ghr.c.skew
      SELECT id, CASE WHEN id < 190000 THEN id % 1000 ELSE id END
      FROM range(0, 200000)""")
    spark.sql("CREATE TABLE ghr.c.probe (k BIGINT, w BIGINT)")
    spark.sql(
      "INSERT INTO ghr.c.probe SELECT id, id * 3 FROM range(0, 100000)")
    def plan(lo: Long, hi: Long): String = spark.sql(
      s"""SELECT count(*) FROM ghr.c.skew b
        JOIN ghr.c.probe p ON b.k = p.k
        WHERE b.s BETWEEN $lo AND $hi""")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString) {
      // NDV/min-max only: the hot range estimates uniform -> ~0.5% ->
      // broadcast. WRONG: it is 95% of the table.
      withSQLConf("spark.graft.histogramBins" -> "0") {
        spark.sql("CALL ghr.system.analyze('c', 'skew')")
        spark.sql("CALL ghr.system.analyze('c', 'probe')")
      }
      val uniform = plan(0L, 999L)
      assert(uniform.contains("BroadcastHashJoin"),
        s"uniform range selectivity must (mis-)broadcast the hot " +
          s"range:\n$uniform")
      // with histograms the spanned bins carry ~95% of rows ->
      // sort-merge
      spark.sql("CALL ghr.system.analyze('c', 'skew')")
      val hot = plan(0L, 999L)
      assert(hot.contains("SortMergeJoin"),
        s"the histogram must price the hot BETWEEN at ~95% of " +
          s"rows:\n$hot")
      // a range over the SPARSE region stays broadcastable — the
      // histogram sharpens both directions
      val sparse = plan(150000L, 151000L)
      assert(sparse.contains("BroadcastHashJoin"),
        s"a sparse range must still broadcast under the histogram:\n$sparse")
    }
    spark.sql("DROP TABLE ghr.c.skew")
    spark.sql("DROP TABLE ghr.c.probe")
  }

  test("e12 serve: reads the stored index tables, broadcasts the probe " +
    "structures, no SMJ/cartesian") {
    // explain() triggers the in-query build job; the returned plan is
    // the SERVE path only
    val p = explain("e12_ann_index_serve")
    // serve scans the persisted index table — the corpus embeddings
    // appear only as the 5-vector query batch (pushed id filter)
    assert(p.contains("ann_index"), p)
    // the kind discriminator pushes down to the index scans
    assert(p.contains("EqualTo(kind,cent)") && p.contains("EqualTo(kind,code)"), p)
    // centroids, probe map, and query-distance table all broadcast; the
    // stored code rows join them without a corpus-sized shuffle
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(count(p, "BroadcastHashJoin") >= 3, p)
  }
}

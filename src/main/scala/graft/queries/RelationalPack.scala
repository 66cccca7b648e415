package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory from SURVEY.md §2, re-expressed as
  * standalone Spark queries over the driver testdata (TESTDATA.md) with
  * DuckDB oracle SQL for the hash-parity gate.
  *
  * Conventions for oracle parity:
  *   - money aggregates go through DecimalType(18,2) so sums are exact in
  *     both engines (double sums are order-dependent and would hash-differ),
  *     then cast to DOUBLE as the very last step: the comparator reads both
  *     results through pandas, which renders DuckDB's DECIMAL(38,2)/HUGEINT
  *     as float64 while Spark's parquet keeps Decimal/int64 — equal values,
  *     different dtype, different hash. The exact-sum-then-cast is
  *     deterministic, so parity survives;
  *   - array-typed output columns are serialized with `array_join` (pandas
  *     cannot factorize ndarray cells when the comparator sorts rows);
  *   - window orderings always include a unique tiebreak column;
  *   - second-level time deltas use integer seconds (`cast(ts as long)` here,
  *     `date_diff('second', …)` in DuckDB — both floor to whole seconds).
  */
object RelationalPack {
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def c(name: String): Column = col(name)

  /** q39/q40's shared setup: events as a (user_id, k) change log split at
    * mid-month into (spec, existing-dim half, incoming-batch half).
    */
  private def scdChangelog(s: SparkSession, d: String)
      : (graft.etl.EntitySpec, DataFrame, DataFrame) = {
    val spec = graft.etl.EntitySpec(
      name = "profiles", key = "user_id",
      attrs = Seq("user_id" -> "user_id", "k" -> "k"),
      scd2Dim = "", scd1Dim = "", scd1Updatable = Seq("k"),
      scd1Distinct = false)
    val ev = Tables.events(s, d).select(
      col("user_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      col("ts").as("trans_date"))
    val cut = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
    (spec, ev.filter(col("trans_date") < cut),
      ev.filter(col("trans_date") >= cut))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: grain extraction — group-by with MIN(event time), the SCD staging
    // aggregation shape (ETL.sql:20-27).
    "q01_agg_grain_min" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(c("l_returnflag"), c("l_linestatus"))
        .agg(min(c("l_shipdate")).as("start_dt"), count(lit(1)).as("cnt"))),

    // A1 + exact money math: decimal sums survive hash comparison.
    "q02_agg_decimal_sum" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(c("l_returnflag"))
        .agg(
          sum(dec(c("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(c("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(c("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("cnt"))),

    // J1: anti-join (NOT EXISTS → LeftAnti, ETL.sql:89-100) — customers
    // with no urgent order.
    "q03_anti_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(c("o_orderpriority") === "1-URGENT"),
          c("c_custkey") === c("o_custkey"), "left_anti")
        .select(c("c_custkey"), c("c_name"))),

    // Semi-join (EXISTS) — completes the subquery-join family.
    "q04_semi_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(c("o_orderstatus") === "F"),
          c("c_custkey") === c("o_custkey"), "left_semi")
        .select(c("c_custkey"), c("c_acctbal"))),

    // J3: 5-table inner equi-join chain (Data_mart.sql:175-183) + agg.
    // region/nation are tiny → broadcast; customer joins shuffle, AQE tunes.
    "q05_join5_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), c("l_orderkey") === c("o_orderkey"))
        .join(Tables.customer(s, d), c("o_custkey") === c("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), c("c_nationkey") === c("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), c("n_regionkey") === c("r_regionkey"))
        .groupBy(c("r_name"), c("n_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(dec(c("l_extendedprice"))).cast("double").as("sum_price"))),

    // W1: lead() → SCD2 end-dating (ETL.sql:19).
    "q06_scd2_lead" -> ((s, d) => {
      val w = Window.partitionBy(c("user_id")).orderBy(c("ts"), c("event_id"))
      Tables.events(s, d)
        .select(c("event_id"), c("user_id"), c("ts").as("start_dt"),
          lead(c("ts"), 1).over(w).as("end_dt"))
    }),

    // W2+W3: last_value full-frame + min/max-over-partition + CASE
    // (SCD1 latest-attribute-wins, ETL.sql:252-260).
    "q07_scd1_last" -> ((s, d) => {
      val ordered = Window.partitionBy(c("user_id")).orderBy(c("ts"), c("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val whole = Window.partitionBy(c("user_id"))
      Tables.events(s, d)
        .select(
          c("user_id"),
          last(c("event_type")).over(ordered).as("last_type"),
          min(c("ts")).over(whole).as("create_dt"),
          when(max(c("ts")).over(whole) === min(c("ts")).over(whole), lit(null))
            .otherwise(max(c("ts")).over(whole)).as("update_dt"))
        .distinct()
    }),

    // W5: lag deltas with the load-bearing defaults (Data_mart.sql:30-31):
    // first row per key → value_diff = -1, sec_diff = 0.
    "q08_lag_delta" -> ((s, d) => {
      val w = Window.partitionBy(c("user_id")).orderBy(c("ts"), c("event_id"))
      Tables.events(s, d)
        .select(c("event_id"), c("user_id"),
          coalesce(c("value") - lag(c("value"), 1).over(w), lit(-1.0)).as("value_diff"),
          coalesce(c("ts").cast("long") - lag(c("ts"), 1).over(w).cast("long"), lit(0L))
            .as("sec_diff"))
    }),

    // P7: DISTINCT (ETL.sql:250).
    "q09_distinct" -> ((s, d) =>
      Tables.events(s, d).select(c("user_id"), c("event_type")).distinct()),

    // U1: UNION ALL of two classification branches (Data_mart.sql:273).
    "q10_union_classify" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val big = o.filter(c("o_totalprice") > 150000.0)
        .select(c("o_orderkey"), to_date(c("o_orderdate")).as("d"),
          lit("high_value").as("tag"))
      val urgent = o.filter(c("o_orderpriority") === "1-URGENT")
        .select(c("o_orderkey"), to_date(c("o_orderdate")).as("d"),
          lit("urgent").as("tag"))
      big.unionByName(urgent)
    }),

    // F1s+F3s: null-propagating concat (GP `||`) + ordered CASE.
    "q11_case_concat" -> ((s, d) =>
      Tables.customer(s, d)
        .select(c("c_custkey"),
          concat(c("c_name"), lit(" "), c("c_mktsegment")).as("fio"),
          when(c("c_acctbal") < 0, "neg")
            .when(c("c_acctbal") < 5000, "low")
            .otherwise("high").as("band"))),

    // P4+A2+F4s+F5s: sliding lookback with a scalar cutoff —
    // `ts >= midnight(max(ts)) - 1h` (Data_mart.sql:139). The cutoff is a
    // 1-row broadcast join, not a driver collect, so the plan stays fully
    // distributed.
    "q12_lookback_cutoff" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cut = ev.agg(
        (date_trunc("DAY", max(c("ts"))) - expr("INTERVAL 1 HOUR")).as("cutoff"))
      ev.join(broadcast(cut), c("ts") >= c("cutoff"))
        .select(c("event_id"), c("user_id"), c("ts"), c("event_type"))
    }),

    // W4+P8: F3 "city hop" shape — value change vs previous row within the
    // hour, filter applied OUTSIDE the window projection (Data_mart.sql:293).
    "q13_city_hop" -> ((s, d) => {
      val w = Window.partitionBy(c("user_id")).orderBy(c("ts"), c("event_id"))
      Tables.events(s, d)
        .select(c("user_id"), c("ts"), c("event_type"),
          lag(c("event_type"), 1).over(w).as("prev_type"),
          lag(c("ts"), 1).over(w).as("prev_ts"))
        .filter(c("prev_type").isNotNull &&
          c("event_type") =!= c("prev_type") &&
          (c("ts").cast("long") - c("prev_ts").cast("long")) < 3600)
        .select(c("user_id"), c("ts").as("fraud_dt"), c("event_type"),
          c("prev_type"))
    }),

    // A4: pivoted daily counts (plot_report.py:16). Conditional aggregation
    // instead of `.pivot()` so empty cells are 0 in both engines.
    "q14_daily_type_counts" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val aggs = types.map(t =>
        count(when(c("event_type") === t, lit(1))).as(t))
      Tables.events(s, d)
        .groupBy(to_date(c("ts")).as("d"))
        .agg(aggs.head, aggs.tail: _*)
    }),

    // Semi-structured props: JSON field extraction.
    "q15_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(c("event_id"),
          get_json_object(c("props"), "$.k").cast("long").as("k"))),

    // Sessionization (gaps-and-islands): running sum over a new-session flag.
    // The training-pipeline shape for event logs; 30-min inactivity gap.
    "q16_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(c("user_id")).orderBy(c("ts"), c("event_id"))
      val flagged = Tables.events(s, d)
        .select(c("user_id"), c("ts"), c("event_id"),
          when(lag(c("ts"), 1).over(w).isNull ||
            (c("ts").cast("long") - lag(c("ts"), 1).over(w).cast("long")) > 1800,
            lit(1)).otherwise(lit(0)).as("new_sess"))
      flagged
        .select(c("user_id"), c("ts"),
          sum(c("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .as("session_id"))
        .groupBy(c("user_id"), c("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(c("ts")).as("sess_start"), max(c("ts")).as("sess_end"))
    }),

    // Dynamic session windows via the DECLARATIVE session_window operator
    // (q16 is the manual gaps-and-islands spelling; this is the built-in
    // that also runs stateful on streams — s05 drains the same plan).
    // Semantics pinned by the shared oracle: a session ends when the gap
    // to the next event is ≥ the 10-minute timeout (window end exclusive),
    // s_end = last event + gap
    "q44_session_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(c("ts"), "10 minutes"), c("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"), c("user_id"),
          col("n_events"))),

    // Top-k per group: row_number with deterministic tiebreak.
    "q17_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(c("user_id"))
        .orderBy(c("value").desc, c("event_id"))
      Tables.events(s, d)
        .select(c("user_id"), c("event_id"), c("value"),
          row_number().over(w).as("rk"))
        .filter(c("rk") <= 3)
    }),

    // As-of (point-in-time) join: each purchase matched to the user's most
    // recent view at-or-before it — composed from union + window
    // (ops/AsOfJoin), one shuffle, no range-join explosion.
    "q18_asof_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.ops.AsOfJoin.backward(
        left = ev.filter(c("event_type") === "purchase")
          .select(c("user_id"), c("event_id"), c("ts")),
        right = ev.filter(c("event_type") === "view"),
        key = "user_id", leftTime = "ts", rightTime = "ts",
        rightId = "event_id", rightCols = Map("ts" -> "view_ts"))
    }),

    // ROLLUP subtotals (grouping-sets family).
    "q19_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(c("l_returnflag"), c("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(c("l_quantity"))).cast("double").as("sum_qty"))),

    // INTERSECT / EXCEPT (distinct set semantics).
    "q20_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(c("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d)
          .select(c("s_nationkey").as("nationkey")))),
    // (user, day) pairs that clicked but made no purchase that day
    "q21_except" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(c("event_type") === "click")
        .select(c("user_id"), to_date(c("ts")).as("d")).distinct()
        .except(ev.filter(c("event_type") === "purchase")
          .select(c("user_id"), to_date(c("ts")).as("d")).distinct())
    }),

    // FULL OUTER join of two aggregates (merged key via using-column).
    "q22_full_outer" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(c("event_type") === "click")
        .groupBy(to_date(c("ts")).as("d")).agg(count(lit(1)).as("clicks"))
      val errors = ev.filter(c("event_type") === "error")
        .groupBy(to_date(c("ts")).as("d")).agg(count(lit(1)).as("errors"))
      clicks.join(errors, Seq("d"), "full_outer")
    }),

    // Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont` — both linear interpolation).
    // both l_extendedprice percentiles from ONE aggregate buffer: two
    // scalar percentile() aggs each materialize their own copy of every
    // group's values; the array form sorts one buffer and reads both
    // ranks (identical interpolation arithmetic, bit-identical output)
    "q23_percentile" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy(c("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_extendedprice, array(0.25, 0.75))").as("_pp"))
        .select(c("l_returnflag"), c("p50_qty"),
          element_at(c("_pp"), 1).as("p25_price"),
          element_at(c("_pp"), 2).as("p75_price"))),

    // Salted skew join — oracle is the UNSALTED join, proving the salt is
    // invisible to results (ops/Skew).
    "q26_salted_join" -> ((s, d) =>
      graft.ops.Skew.saltedJoin(
        Tables.lineitem(s, d).select(c("l_orderkey"), c("l_quantity")),
        Tables.orders(s, d).select(c("o_orderkey").as("l_orderkey"),
          c("o_orderpriority")),
        key = "l_orderkey", factor = 8)
        .groupBy(c("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(c("l_quantity"))).cast("double").as("sum_qty"))),

    // Trailing event-time window (RANGE frame): events per user in the
    // preceding hour — the rate-limiting / feature-engineering shape.
    "q27_trailing_window" -> ((s, d) => {
      val w = Window.partitionBy(c("user_id"))
        .orderBy(c("ts").cast("long"))
        .rangeBetween(-3599, 0)
      Tables.events(s, d)
        .select(c("event_id"), c("user_id"), c("ts"),
          count(lit(1)).over(w).as("n_last_hour"))
    }),

    // CUBE subtotals over two dimensions.
    "q28_cube" -> ((s, d) =>
      Tables.events(s, d)
        .cube(c("event_type"), to_date(c("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))),

    // Approximate aggregates (HLL++ distinct, approx quantiles). Sketch
    // estimates are engine-specific, so the oracle-comparable output is
    // the exact statistic plus a boolean pinning the estimate inside a
    // tolerance band — the estimate is deterministic for fixed data, so
    // the booleans are stable and the oracle (exact + literal true)
    // genuinely fails if Spark's sketch drifts out of band.
    // NB: the exact distinct count aggregates SEPARATELY from everything
    // else and joins on the 3-row group key. count(DISTINCT) in the same
    // agg as any non-distinct aggregate triggers the distinct-rewrite
    // Expand plan (every row duplicated per branch); combined with the
    // percentile's buffering it object-hash fell back and took 90 s at
    // sf0.1, where these two plain aggs take ~1 s. The explicit
    // distinct-then-count is the same two-phase shape the rewrite
    // produces, minus the row expansion; the sketch and percentile
    // aggregates are all non-distinct and share one scan.
    // ANALYZE-style table profile (the statistics pass every engine
    // runs before CBO / data-quality checks): per column — null count,
    // exact distinct count, an HLL estimate pinned within 5 % of exact,
    // and native-ordered min/max rendered as strings; stacked to
    // per-column rows by exploding a struct array (map-side only).
    // Scale note: the exact multi-column count(DISTINCT) rides
    // Catalyst's Expand (k+1 branches = (k+1)× the scan in one shuffle)
    // — affordable as a maintenance job, and the HLL column
    // demonstrates the sketch-only path a 100-TB ANALYZE would keep
    // (mergeable, no Expand); the exact pass here is what FALSIFIES the
    // sketch, q24-style.
    "q57_table_profile" -> ((s, d) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val orders = Tables.orders(s, d)
      // TWO aggregates, joined 1-row × 1-row — never one: the multi-
      // column count(DISTINCT) rewrites to an Expand, and an Expand that
      // also carries buffering aggregates (HLL) falls off hash
      // aggregation (the q24 cliff — measured here too: one combined
      // agg was ~90 s at sf0.1, the split is sub-second)
      val sketchAggs = cols.flatMap(n => Seq(
        // count-minus-count, not sum(when(isNull)): on an EMPTY table the
        // sum form yields NULL where the oracle (and a sane profile)
        // reports 0
        (count(lit(1)) - count(c(n))).as(s"nulls__$n"),
        approx_count_distinct(c(n), 0.02).as(s"and__$n"),
        min(c(n)).cast("string").as(s"min__$n"),
        max(c(n)).cast("string").as(s"max__$n")))
      val sketch = orders.agg(count(lit(1)).as("n_rows"), sketchAggs: _*)
      val exact = orders.agg(
        countDistinct(c(cols.head)).as(s"nd__${cols.head}"),
        cols.tail.map(n => countDistinct(c(n)).as(s"nd__$n")): _*)
      val prof = sketch.crossJoin(broadcast(exact))
      val stacked = cols.map(n => struct(lit(n).as("col_name"),
        c(s"nulls__$n").as("n_nulls"), c(s"nd__$n").as("n_distinct"),
        (abs(c(s"and__$n") - c(s"nd__$n")) <= c(s"nd__$n") * 0.05)
          .as("hll_ok"),
        c(s"min__$n").as("min_s"), c(s"max__$n").as("max_s")))
      prof.select(c("n_rows"), explode(array(stacked: _*)).as("p"))
        .select(c("p.col_name"), c("n_rows"), c("p.n_nulls"),
          c("p.n_distinct"), c("p.hll_ok"), c("p.min_s"), c("p.max_s"))
    }),

    "q24_approx_stats" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val dis = li.select(c("l_returnflag"), c("l_orderkey")).distinct()
        .groupBy(c("l_returnflag"))
        .agg(count(lit(1)).as("exact_orders"))
      val rest = li.groupBy(c("l_returnflag"))
        .agg(approx_count_distinct(c("l_orderkey"), 0.01).as("_a"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("_m"),
          expr("percentile(l_extendedprice, 0.5)").as("p50_price"))
      dis.join(rest, "l_returnflag")
        .select(c("l_returnflag"), c("exact_orders"), c("p50_price"),
          (abs(c("_a") - c("exact_orders")) <=
            c("exact_orders") * 0.05).as("approx_orders_ok"),
          (abs(c("_m") - c("p50_price")) <=
            c("p50_price") * 0.05).as("approx_median_ok"))
    }),

    // Count-Min heavy hitters: shuffle-free sketch pass prefilters to
    // candidate keys, exact re-count confirms — output is exact
    // (ops/Sketches.cmsHeavyHitters; the oracle is the plain HAVING).
    // eps sizing: the output is exact for ANY eps (CMS never
    // underestimates and the final HAVING recounts exactly); eps only
    // trades sketch size against prefilter selectivity. 1e-4 keeps the
    // sketch ~1 MB (7×20k longs) — the previous 1e-5 built an 11 MB
    // blob whose plan-side handling dominated the query (guide §1/§4:
    // the sketch is metadata, keep it orders below the data).
    "q42_cms_heavy_hitters" -> ((s, d) =>
      graft.ops.Sketches.cmsHeavyHitters(
        Tables.events(s, d).select(c("user_id")), "user_id",
        minCount = 80, eps = 1e-4, confidence = 0.99)),

    // Bloom-prefiltered semi-join: MB-scale filter built over the dim
    // side prunes the fact scan before the join; exact semi-join cleans
    // up false positives (ops/Sketches.bloomSemiJoin).
    "q45_bloom_semi_join" -> ((s, d) => {
      val keys = Tables.supplier(s, d)
        .filter(c("s_nationkey") < 5)
        .select(c("s_suppkey").as("l_suppkey"))
      graft.ops.Sketches.bloomSemiJoin(
        Tables.lineitem(s, d)
          .select(c("l_suppkey"), c("l_returnflag"), c("l_quantity")),
        keys, "l_suppkey", expectedItems = 1 << 20)
        .groupBy(c("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(c("l_quantity"))).cast("double").as("sum_qty"))
    }),

    // Mergeable-sketch rollup: per-day HLL sketches union into months
    // without re-scanning raw rows (the re-aggregation exact distinct
    // counts lack). Output = exact count + in-tolerance boolean.
    "q46_hll_monthly_uniques" -> ((s, d) =>
      graft.ops.Sketches.hllMonthlyUniques(
        Tables.orders(s, d), "o_orderdate", "o_custkey")),

    // Time-series linear interpolation: every event gets the value
    // linearly interpolated between the user's surrounding 'purchase'
    // observations (sensor-style gap filling at event positions — the
    // value-interpolating cousin of q43's time-axis gap fill). Exact
    // float parity: the fraction is a mul/div chain over microsecond
    // longs (exact in double) with identical association order in the
    // oracle; a purchase row reproduces its own value via the
    // zero-denominator guard. Two windows per row, one shuffle.
    "q48_interpolate" -> ((s, d) => {
      val w = Window.partitionBy(c("user_id")).orderBy(c("ts"), c("event_id"))
      val wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsV = when(c("event_type") === "purchase", c("value"))
      val obsT = when(c("event_type") === "purchase", unix_micros(c("ts")))
      Tables.events(s, d)
        .select(c("event_id"), c("user_id"), c("ts"),
          last(obsV, ignoreNulls = true).over(wp).as("pv"),
          last(obsT, ignoreNulls = true).over(wp).as("pt"),
          first(obsV, ignoreNulls = true).over(wn).as("nv"),
          first(obsT, ignoreNulls = true).over(wn).as("nt"))
        .select(c("event_id"), c("user_id"),
          when(c("nt") === c("pt"), c("pv"))
            .otherwise(c("pv") + (c("nv") - c("pv")) *
              ((unix_micros(c("ts")).cast("double") - c("pt")) /
                (c("nt") - c("pt"))))
            .as("interp"))
    }),

    // Sketch set algebra: |clickers ∩ purchasers| by inclusion-exclusion
    // over HLL sketches (|A|+|B|−|A∪B|) — audience overlap without a
    // join or a distinct shuffle; the exact count (one agg per user)
    // rides along as the oracle-checked value, the estimate as a
    // tolerance boolean (same pattern as q24/q46).
    "q47_hll_set_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val exact = ev.groupBy(c("user_id"))
        .agg(max(when(c("event_type") === "click", 1).otherwise(0)).as("ck"),
          max(when(c("event_type") === "purchase", 1).otherwise(0)).as("pu"))
        .agg(sum(when(c("ck") === 1 && c("pu") === 1, 1L).otherwise(0L))
          .as("exact_both"))
      val sk = ev.agg(
        hll_sketch_agg(when(c("event_type") === "click", c("user_id")))
          .as("skc"),
        hll_sketch_agg(when(c("event_type") === "purchase", c("user_id")))
          .as("skp"))
        .select(hll_sketch_estimate(c("skc")).as("ec"),
          hll_sketch_estimate(c("skp")).as("ep"),
          hll_sketch_estimate(hll_union(c("skc"), c("skp"))).as("eu"))
      exact.crossJoin(sk)
        .select(c("exact_both"),
          (abs(c("ec") + c("ep") - c("eu") - c("exact_both")) <=
            greatest(c("exact_both") * 0.1, lit(5.0))).as("overlap_ok"))
    }),

    // Key + time-range join (shipments within 30 days of order date).
    "q25_range_join" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o, c("l_orderkey") === c("o_orderkey") &&
        c("l_shipdate") >= c("o_orderdate") &&
        c("l_shipdate") <= c("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(c("o_orderpriority"))
        .agg(count(lit(1)).as("n_shipped"))
    }),

    // Explicit GROUPING SETS (beyond rollup/cube) via the SQL surface.
    "q33_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
          |FROM v_orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
          |                        (o_orderstatus, o_orderpriority))""".stripMargin)
    }),

    // Ranking-function family (rank/dense_rank/ntile/percent_rank) with a
    // deterministic unique ordering.
    "q34_rank_family" -> ((s, d) => {
      val w = Window.partitionBy(c("user_id"))
        .orderBy(c("value").desc, c("event_id"))
      Tables.events(s, d)
        .select(c("user_id"), c("event_id"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prank"))
    }),

    // Typed Aggregator: bounded top-k collector (O(k) buffers + map-side
    // merge instead of a per-group window sort).
    "q35_topk_aggregator" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.events(s, d)
        .select(c("user_id"), c("event_id"), c("value"))
        .as[(Long, Long, Double)]
      ds.groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(new graft.functions.TopKIds(3).toColumn.name("top_ids"))
        .toDF("user_id", "top_ids")
        // serialized: the comparator's pandas sort can't hash ndarray cells
        .select(c("user_id"),
          array_join(transform(c("top_ids"), _.cast("string")), ",")
            .as("top_ids"))
    }),

    // F4 amount-guessing chain detection, windowed reformulation
    // (Data_mart.sql:1-106): the per-client cursor state machine becomes
    // gaps-and-islands — a chain (island) restarts where the previous row
    // is absent / not a reject, the amount stops strictly decreasing, or
    // the time budget is blown; the emitted row is an island's terminal
    // success with >= minRejected rejects behind it inside the budget.
    // Constants scaled to the synthetic event rate (~10 h between a user's
    // events): budget 86400 s, chain >= 2; the reference's 1200 s / >= 3
    // run in mart/AmountGuessing with the exact sequential semantics.
    "q36_chain_detect" -> ((s, d) => {
      val w = Window.partitionBy(c("user_id")).orderBy(c("ts"), c("event_id"))
      val budget = 86400L
      val flagged = Tables.events(s, d)
        .select(c("user_id"), c("ts"), c("event_id"), c("event_type"),
          c("value"),
          when(lag(c("ts"), 1).over(w).isNull ||
            lag(c("event_type"), 1).over(w) =!= "error" ||
            (c("event_type") === "error" &&
              c("value") >= lag(c("value"), 1).over(w)) ||
            (c("ts").cast("long") - lag(c("ts"), 1).over(w).cast("long"))
              >= budget,
            lit(1)).otherwise(lit(0)).as("boundary"))
      val isl = Window.partitionBy(c("user_id"), c("island"))
      flagged
        .select(c("user_id"), c("ts"), c("event_id"), c("event_type"),
          sum(c("boundary")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .as("island"))
        .select(c("user_id"), c("ts"), c("event_id"), c("event_type"),
          count(when(c("event_type") === "error", lit(1))).over(isl)
            .as("n_rejected"),
          min(c("ts")).over(isl).as("chain_start"))
        .filter(c("event_type") =!= "error" && c("n_rejected") >= 2 &&
          (c("ts").cast("long") - c("chain_start").cast("long")) < budget)
        .select(c("user_id"), c("ts").as("fraud_dt"), c("event_id"),
          c("n_rejected"),
          (c("ts").cast("long") - c("chain_start").cast("long"))
            .as("chain_seconds"))
    }),

    // String scalar-function battery.
    "q29_string_funcs" -> ((s, d) =>
      Tables.customer(s, d).select(
        c("c_custkey"),
        upper(c("c_name")).as("up"),
        lower(c("c_mktsegment")).as("lo"),
        substring(c("c_name"), 3, 5).as("sub"),
        regexp_replace(c("c_name"), lit("#"), lit("-")).as("repl"),
        lpad(c("c_custkey").cast("string"), 10, "0").as("padded"),
        reverse(c("c_mktsegment")).as("rev"),
        length(c("c_name")).cast("bigint").as("len"),
        levenshtein(substring(c("c_name"), 1, 8), lit("Customer"))
          .cast("bigint").as("lev"))),

    // Array-function battery over the embeddings' vector column.
    "q31_array_funcs" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          graft.ops.VectorOps.quantize(col("embedding")).as("qv"))
        .select(
          c("vec_id"),
          size(c("qv")).cast("bigint").as("n_dims"),
          element_at(c("qv"), 1).as("first_dim"),
          element_at(sort_array(c("qv")), 1).as("min_q"),
          element_at(sort_array(c("qv"), asc = false), 1).as("max_q"),
          size(array_distinct(c("qv"))).cast("bigint").as("n_distinct"),
          // serialized: the comparator's pandas sort can't hash ndarray cells
          array_join(transform(slice(c("qv"), 1, 4), _.cast("string")), ",")
            .as("head4"),
          array_contains(c("qv"), 0L).as("has_zero"))),

    // The SQL surface: the engine is equally drivable via spark.sql over
    // registered views — the query text below runs verbatim on both
    // engines (modulo none: it is ANSI).
    "q32_sql_surface" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("v_nation")
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      s.sql(
        """SELECT n_name, count(*) AS n_custs,
          |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          |FROM v_customer JOIN v_nation ON c_nationkey = n_nationkey
          |WHERE c_acctbal > 0
          |GROUP BY n_name""".stripMargin)
    }),

    // WITH RECURSIVE on the SQL surface (Spark 4's UnionLoop): the
    // ancestor walk over an implicit binary tree on customer keys
    // (parent(k) = k/2) — the workload class (hierarchies, BOM
    // explosion, org charts) that previously required hand-built
    // iteration. The SAME query text runs on both engines (one template,
    // only the table name substituted). Scale note: each recursion step
    // is one distributed self-join round and all roots advance in
    // parallel, so rounds = max DEPTH (~log2 of the key space), not
    // row count — the right tool for bounded-depth hierarchies;
    // unbounded-depth reachability (near-dup components) stays on d10's
    // pointer doubling, which halves remaining depth per round.
    // (recursion is enabled unconditionally in this Spark build — the
    // only cteRecursion* confs are the level/row limits, defaults ample
    // for the ~log2(keyspace) depth here)
    "q58_recursive_cte" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      s.sql(recursiveWalkSql("v_customer"))
    }),

    // Correlated scalar subqueries — Catalyst's
    // RewriteCorrelatedScalarSubquery decorrelation path (left-outer join +
    // aggregate), incl. the COUNT-on-empty-group case (0, not NULL).
    "q37_correlated_scalar" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT c_custkey,
          | (SELECT count(*) FROM v_orders o
          |  WHERE o.o_custkey = c.c_custkey) AS n_orders,
          | (SELECT max(o_orderdate) FROM v_orders o
          |  WHERE o.o_custkey = c.c_custkey) AS last_order
          |FROM v_customer c""".stripMargin)
    }),

    // LATERAL correlated subquery with ORDER BY + LIMIT — per-group top-n
    // expressed the SQL way (decorrelated by Catalyst), complementing
    // q17's window formulation.
    "q38_lateral_topn" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("v_nation")
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      s.sql(
        """SELECT n_name, c_custkey, c_acctbal
          |FROM v_nation n,
          |LATERAL (SELECT c_custkey, c_acctbal FROM v_customer c
          |         WHERE c.c_nationkey = n.n_nationkey
          |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin)
    }),

    // J2/J4 made driver-visible: the SCD2 close+insert MERGE itself (round
    // 1 verified it only via the builder-side replay). events become a
    // (user_id, k) change log; the first half of the month is the existing
    // dim, the second half the incoming batch, and the output is
    // Scd2.merge's new snapshot — close rows end-dated by the staged
    // current version, NOT-EXISTS-filtered inserts appended.
    "q39_scd2_merge" -> ((s, d) => {
      val (spec, existing, incoming) = scdChangelog(s, d)
      graft.etl.Scd2.merge(
        graft.etl.Scd2.staging(existing, spec),
        graft.etl.Scd2.staging(incoming, spec), spec)
        .select(col("user_id"), col("k"), col("start_dt"), col("end_dt"))
    }),

    // Same for the SCD1 latest-wins upsert: staged latest attributes
    // overwrite changed keys (null-rejecting change predicate), new keys
    // insert with staging multiplicity.
    "q40_scd1_merge" -> ((s, d) => {
      val (spec, existing, incoming) = scdChangelog(s, d)
      graft.etl.Scd1.merge(
        graft.etl.Scd1.staging(existing, spec),
        graft.etl.Scd1.staging(incoming, spec), spec)
        .select(col("user_id"), col("k"), col("create_dt"), col("update_dt"))
    }),

    // UNPIVOT (wide → long melt): the inverse of q14's pivoted counts,
    // via the typed Dataset.unpivot API.
    "q41_unpivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val aggs = types.map(t =>
        count(when(c("event_type") === t, lit(1))).as(t))
      Tables.events(s, d)
        .groupBy(to_date(c("ts")).as("d"))
        .agg(aggs.head, aggs.tail: _*)
        .unpivot(Array(c("d")), types.map(col).toArray, "event_type", "cnt")
    }),

    // Time-series gap fill: per user, a dense daily count series over the
    // user's own [first, last] day span, missing days as 0 — the resample
    // step every event-history feature pipeline needs. sequence + explode
    // generates rows engine-side; no driver loop.
    "q43_gap_fill" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(c("user_id"), to_date(c("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val span = daily.groupBy(c("user_id"))
        .agg(min(c("day")).as("d0"), max(c("day")).as("d1"))
      val days = span.select(c("user_id"),
        explode(sequence(c("d0"), c("d1"), expr("INTERVAL 1 DAY"))).as("day"))
      days.join(daily, Seq("user_id", "day"), "left")
        .select(c("user_id"), c("day"), coalesce(c("n"), lit(0L)).as("n"))
    }),

    // Date/time scalar-function battery.
    "q30_date_funcs" -> ((s, d) =>
      Tables.orders(s, d).select(
        c("o_orderkey"),
        year(c("o_orderdate")).cast("bigint").as("y"),
        month(c("o_orderdate")).cast("bigint").as("m"),
        dayofmonth(c("o_orderdate")).cast("bigint").as("dom"),
        date_trunc("MONTH", c("o_orderdate")).as("month_start"),
        last_day(to_date(c("o_orderdate"))).as("month_end"),
        date_add(to_date(c("o_orderdate")), 30).as("plus30"),
        add_months(to_date(c("o_orderdate")), 2).as("plus2m")))
  )

  /** Session-window oracle (10-min gap, end-exclusive: gap ≥ 600 s breaks;
    * s_end = last event + gap) — shared with the streaming drain s05.
    * The gap compares MICROSECONDS: `date_diff('second', …)` counts
    * second-boundary crossings (truncates both ends), which at sf0.1
    * split a 599.23 s gap that session_window's exact arithmetic merges.
    */
  private[queries] val sessionWindowSql: String =
    """SELECT min(ts) AS s_start, max(ts) + INTERVAL 10 MINUTE AS s_end,
      | user_id, count(*) AS n_events
      |FROM (
      | SELECT user_id, ts,
      |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS UNBOUNDED PRECEDING) AS sid
      | FROM (
      |  SELECT user_id, ts, event_id,
      |   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |          OR date_diff('microsecond',
      |               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      |               ts) >= 600000000
      |        THEN 1 ELSE 0 END AS brk
      |  FROM events) f) g
      |GROUP BY user_id, sid""".stripMargin

  /** q58's dialect-neutral recursive ancestor walk — ONE template for
    * both engines; only the table name differs (registered temp view on
    * the Spark side, raw parquet relation on the DuckDB side). Integer
    * division is spelled CAST(floor(x / 2)) because `/` is float
    * division in both dialects while their int-div operators differ
    * (`div` vs `//`); every aggregate is BIGINT-cast on both sides (the
    * comparator's dtype rule; DuckDB sums to HUGEINT otherwise).
    */
  private def recursiveWalkSql(table: String): String =
    s"""WITH RECURSIVE walk AS (
       |  SELECT c_custkey AS root, c_custkey AS node, 0 AS depth
       |  FROM $table WHERE c_custkey <= 1000
       |  UNION ALL
       |  SELECT root, CAST(floor(node / 2) AS BIGINT) AS node, depth + 1
       |  FROM walk WHERE node > 1
       |)
       |SELECT root, CAST(count(*) AS BIGINT) AS chain_len,
       |  CAST(max(depth) AS BIGINT) AS max_depth,
       |  CAST(sum(node) AS BIGINT) AS node_sum
       |FROM walk GROUP BY root""".stripMargin

  val oracles: Map[String, String] = Map(
    "q44_session_window" -> sessionWindowSql,
    "q01_agg_grain_min" ->
      """SELECT l_returnflag, l_linestatus, min(l_shipdate) AS start_dt,
        | count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_agg_decimal_sum" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |     (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q03_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q04_semi_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q05_join5_revenue" ->
      """SELECT r_name, n_name, count(*) AS n_items,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        | JOIN orders   ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey  = c_custkey
        | JOIN nation   ON c_nationkey = n_nationkey
        | JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q06_scd2_lead" ->
      """SELECT event_id, user_id, ts AS start_dt,
        | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS end_dt
        |FROM events""".stripMargin,
    "q07_scd1_last" ->
      """SELECT DISTINCT user_id,
        | last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
        | min(ts) OVER (PARTITION BY user_id) AS create_dt,
        | CASE WHEN max(ts) OVER (PARTITION BY user_id)
        |        = min(ts) OVER (PARTITION BY user_id) THEN NULL
        |      ELSE max(ts) OVER (PARTITION BY user_id) END AS update_dt
        |FROM events""".stripMargin,
    "q08_lag_delta" ->
      """SELECT event_id, user_id,
        | COALESCE(value - lag(value) OVER
        |   (PARTITION BY user_id ORDER BY ts, event_id), -1) AS value_diff,
        | COALESCE(date_diff('second',
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts), 0) AS sec_diff
        |FROM events""".stripMargin,
    "q09_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q10_union_classify" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, 'high_value' AS tag
        |FROM orders WHERE o_totalprice > 150000
        |UNION ALL
        |SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, 'urgent' AS tag
        |FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q11_case_concat" ->
      """SELECT c_custkey, c_name || ' ' || c_mktsegment AS fio,
        | CASE WHEN c_acctbal < 0 THEN 'neg'
        |      WHEN c_acctbal < 5000 THEN 'low'
        |      ELSE 'high' END AS band
        |FROM customer""".stripMargin,
    "q12_lookback_cutoff" ->
      """SELECT event_id, user_id, ts, event_type FROM events
        |WHERE ts >= (SELECT date_trunc('day', max(ts)) - INTERVAL 1 HOUR FROM events)""".stripMargin,
    "q13_city_hop" ->
      """SELECT user_id, ts AS fraud_dt, event_type, prev_type FROM (
        | SELECT user_id, ts, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events) t
        |WHERE prev_type IS NOT NULL AND event_type <> prev_type
        |  AND date_diff('second', prev_ts, ts) < 3600""".stripMargin,
    "q14_daily_type_counts" ->
      """SELECT CAST(ts AS DATE) AS d,
        | count(*) FILTER (WHERE event_type = 'click')    AS click,
        | count(*) FILTER (WHERE event_type = 'error')    AS error,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | count(*) FILTER (WHERE event_type = 'signup')   AS signup,
        | count(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events GROUP BY CAST(ts AS DATE)""".stripMargin,
    "q15_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "q16_sessionize" ->
      """SELECT user_id, session_id, count(*) AS n_events,
        | min(ts) AS sess_start, max(ts) AS sess_end
        |FROM (
        | SELECT user_id, ts,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
        | FROM (
        |  SELECT user_id, ts, event_id,
        |   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |          OR date_diff('second',
        |               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
        |        THEN 1 ELSE 0 END AS new_sess
        |  FROM events) f) g
        |GROUP BY user_id, session_id""".stripMargin,
    "q17_topk_per_group" ->
      """SELECT user_id, event_id, value, rk FROM (
        | SELECT user_id, event_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
        | FROM events) t
        |WHERE rk <= 3""".stripMargin,
    "q18_asof_funnel" ->
      """WITH u AS (
        | SELECT user_id, event_id, ts, ts AS _t, 1 AS il,
        |        NULL::BIGINT AS ord, NULL::BIGINT AS r_id, NULL::TIMESTAMP AS r_ts
        | FROM events WHERE event_type = 'purchase'
        | UNION ALL
        | SELECT user_id, NULL, NULL, ts, 0, event_id, event_id, ts
        | FROM events WHERE event_type = 'view'),
        |w AS (SELECT user_id, event_id, ts, il,
        |  last_value(r_ts IGNORE NULLS) OVER win AS view_ts,
        |  last_value(r_id IGNORE NULLS) OVER win AS matched_event_id
        | FROM u WINDOW win AS (PARTITION BY user_id ORDER BY _t, il, ord
        |   ROWS UNBOUNDED PRECEDING))
        |SELECT user_id, event_id, ts, view_ts, matched_event_id
        |FROM w WHERE il = 1""".stripMargin,
    "q19_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q20_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q21_except" ->
      """SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        |WHERE event_type = 'click'
        |EXCEPT
        |SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        |WHERE event_type = 'purchase'""".stripMargin,
    "q22_full_outer" ->
      """SELECT d, clicks, errors FROM (
        | SELECT CAST(ts AS DATE) AS d, count(*) AS clicks FROM events
        | WHERE event_type = 'click' GROUP BY 1) c
        |FULL JOIN (
        | SELECT CAST(ts AS DATE) AS d, count(*) AS errors FROM events
        | WHERE event_type = 'error' GROUP BY 1) e USING (d)""".stripMargin,
    "q23_percentile" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS p50_qty,
        | quantile_cont(l_extendedprice, 0.25) AS p25_price,
        | quantile_cont(l_extendedprice, 0.75) AS p75_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // exact stats verified for real; the *_ok literals fail if Spark's
    // sketch estimates drift outside the 5% band (deterministic data →
    // deterministic estimates → stable booleans)
    "q57_table_profile" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      cols.map { n =>
        s"""SELECT '$n' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           | CAST(count(*) - count($n) AS BIGINT) AS n_nulls,
           | CAST(count(DISTINCT $n) AS BIGINT) AS n_distinct,
           | true AS hll_ok,
           | CAST(min($n) AS VARCHAR) AS min_s,
           | CAST(max($n) AS VARCHAR) AS max_s
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
    },
    "q24_approx_stats" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_orderkey) AS exact_orders,
        | quantile_cont(l_extendedprice, 0.5) AS p50_price,
        | true AS approx_orders_ok, true AS approx_median_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q42_cms_heavy_hitters" ->
      """SELECT user_id, count(*) AS cnt FROM events
        |GROUP BY user_id HAVING count(*) >= 80""".stripMargin,
    "q45_bloom_semi_join" ->
      """SELECT l_returnflag, count(*) AS cnt,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
        |GROUP BY l_returnflag""".stripMargin,
    "q46_hll_monthly_uniques" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        | count(DISTINCT o_custkey) AS exact_uniques, true AS hll_ok
        |FROM orders GROUP BY 1""".stripMargin,
    "q48_interpolate" ->
      """WITH b AS (
        | SELECT event_id, user_id, ts,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END
        |    IGNORE NULLS) OVER wp AS pt,
        |  first_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS) OVER wn AS nv,
        |  first_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END
        |    IGNORE NULLS) OVER wn AS nt
        | FROM events
        | WINDOW
        |  wp AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id,
        | CASE WHEN nt = pt THEN pv
        |      ELSE pv + (nv - pv) *
        |        ((CAST(epoch_us(ts) AS DOUBLE) - pt) / (nt - pt)) END
        |   AS interp
        |FROM b""".stripMargin,
    "q47_hll_set_overlap" ->
      """SELECT CAST(sum(CASE WHEN ck = 1 AND pu = 1 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS exact_both,
        | true AS overlap_ok
        |FROM (SELECT user_id,
        |  max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ck,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pu
        | FROM events GROUP BY user_id)""".stripMargin,
    "q26_salted_join" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q27_trailing_window" ->
      """SELECT event_id, user_id, ts,
        | count(*) OVER (PARTITION BY user_id
        |   ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |   RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events""".stripMargin,
    "q28_cube" ->
      """SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS cnt
        |FROM events GROUP BY CUBE(event_type, CAST(ts AS DATE))""".stripMargin,
    "q25_range_join" ->
      """SELECT o_orderpriority, count(*) AS n_shipped
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderpriority""".stripMargin,
    "q35_topk_aggregator" ->
      """SELECT user_id,
        | array_to_string((list(event_id ORDER BY value DESC, event_id))[1:3], ',') AS top_ids
        |FROM events GROUP BY user_id""".stripMargin,
    "q36_chain_detect" ->
      """WITH b AS (
        | SELECT user_id, ts, event_id, event_type, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR lag(event_type) OVER w <> 'error'
        |        OR (event_type = 'error' AND value >= lag(value) OVER w)
        |        OR date_diff('second', lag(ts) OVER w, ts) >= 86400
        |       THEN 1 ELSE 0 END AS boundary
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        | SELECT user_id, ts, event_id, event_type,
        |  sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS island
        | FROM b),
        |a AS (
        | SELECT user_id, ts, event_id, event_type,
        |  count(*) FILTER (WHERE event_type = 'error') OVER isl AS n_rejected,
        |  min(ts) OVER isl AS chain_start
        | FROM g
        | WINDOW isl AS (PARTITION BY user_id, island))
        |SELECT user_id, ts AS fraud_dt, event_id, n_rejected,
        | date_diff('second', chain_start, ts) AS chain_seconds
        |FROM a
        |WHERE event_type <> 'error' AND n_rejected >= 2
        |  AND date_diff('second', chain_start, ts) < 86400""".stripMargin,
    "q33_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority))""".stripMargin,
    "q34_rank_family" ->
      """SELECT user_id, event_id,
        | rank() OVER w AS rnk,
        | dense_rank() OVER w AS drnk,
        | ntile(4) OVER w AS quartile,
        | percent_rank() OVER w AS prank
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)""".stripMargin,
    "q29_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
        | substr(c_name, 3, 5) AS sub,
        | regexp_replace(c_name, '#', '-', 'g') AS repl,
        | lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        | reverse(c_mktsegment) AS rev,
        | length(c_name)::BIGINT AS len,
        | levenshtein(substr(c_name, 1, 8), 'Customer')::BIGINT AS lev
        |FROM customer""".stripMargin,
    "q31_array_funcs" -> {
      val qv = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT))"
      s"""SELECT vec_id,
         | len(qv)::BIGINT AS n_dims,
         | qv[1] AS first_dim,
         | (list_sort(qv))[1] AS min_q,
         | (list_reverse_sort(qv))[1] AS max_q,
         | len(list_distinct(qv))::BIGINT AS n_distinct,
         | array_to_string(list_slice(qv, 1, 4), ',') AS head4,
         | list_contains(qv, 0) AS has_zero
         |FROM (SELECT vec_id, $qv AS qv FROM embeddings) t""".stripMargin
    },
    "q58_recursive_cte" -> recursiveWalkSql("customer"),
    "q32_sql_surface" ->
      """SELECT n_name, count(*) AS n_custs,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 0
        |GROUP BY n_name""".stripMargin,
    "q41_unpivot" ->
      """WITH wide AS (
        | SELECT CAST(ts AS DATE) AS d,
        |  count(*) FILTER (WHERE event_type = 'click')    AS click,
        |  count(*) FILTER (WHERE event_type = 'error')    AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |  count(*) FILTER (WHERE event_type = 'view')     AS view
        | FROM events GROUP BY CAST(ts AS DATE))
        |SELECT d, 'click' AS event_type, click AS cnt FROM wide
        |UNION ALL SELECT d, 'error', error FROM wide
        |UNION ALL SELECT d, 'purchase', purchase FROM wide
        |UNION ALL SELECT d, 'signup', signup FROM wide
        |UNION ALL SELECT d, 'view', view FROM wide""".stripMargin,
    "q43_gap_fill" ->
      """WITH daily AS (
        | SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
        | FROM events GROUP BY 1, 2),
        |span AS (
        | SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily
        | GROUP BY 1),
        |days AS (
        | SELECT user_id,
        |  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        | FROM span)
        |SELECT days.user_id, days.day, CAST(coalesce(n, 0) AS BIGINT) AS n
        |FROM days LEFT JOIN daily
        |  ON days.user_id = daily.user_id AND days.day = daily.day""".stripMargin,
    "q39_scd2_merge" ->
      """WITH ev AS (
        | SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |        ts AS trans_date FROM events),
        |dim0 AS (
        | SELECT user_id, k, start_dt,
        |  lead(start_dt) OVER (PARTITION BY user_id ORDER BY start_dt) AS end_dt
        | FROM (SELECT user_id, k, min(trans_date) AS start_dt FROM ev
        |       WHERE trans_date < TIMESTAMP '2024-01-16 00:00:00'
        |       GROUP BY 1, 2) g),
        |stg AS (
        | SELECT user_id, k, start_dt,
        |  lead(start_dt) OVER (PARTITION BY user_id ORDER BY start_dt) AS end_dt
        | FROM (SELECT user_id, k, min(trans_date) AS start_dt FROM ev
        |       WHERE trans_date >= TIMESTAMP '2024-01-16 00:00:00'
        |       GROUP BY 1, 2) g),
        |newrows AS (
        | SELECT s.* FROM stg s WHERE NOT EXISTS (
        |  SELECT 1 FROM dim0 c WHERE s.user_id = c.user_id AND s.k = c.k)),
        |closers AS (
        | SELECT user_id AS ck, start_dt AS new_end FROM newrows
        | WHERE end_dt IS NULL),
        |closed AS (
        | SELECT c.user_id, c.k, c.start_dt,
        |  CASE WHEN cl.ck IS NOT NULL AND c.end_dt IS NULL THEN cl.new_end
        |       ELSE c.end_dt END AS end_dt
        | FROM dim0 c LEFT JOIN closers cl ON c.user_id = cl.ck)
        |SELECT user_id, k, start_dt, end_dt FROM closed
        |UNION ALL
        |SELECT user_id, k, start_dt, end_dt FROM newrows""".stripMargin,
    "q40_scd1_merge" ->
      """WITH ev AS (
        | SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |        ts AS trans_date FROM events),
        |d1 AS (
        | SELECT user_id,
        |  last_value(k) OVER (PARTITION BY user_id ORDER BY create_dt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS k,
        |  min(create_dt) OVER (PARTITION BY user_id) AS create_dt,
        |  CASE WHEN max(create_dt) OVER (PARTITION BY user_id)
        |          = min(create_dt) OVER (PARTITION BY user_id) THEN NULL
        |       ELSE max(create_dt) OVER (PARTITION BY user_id) END AS update_dt
        | FROM (SELECT user_id, k, min(trans_date) AS create_dt FROM ev
        |       WHERE trans_date < TIMESTAMP '2024-01-16 00:00:00'
        |       GROUP BY 1, 2) g),
        |s1 AS (
        | SELECT user_id,
        |  last_value(k) OVER (PARTITION BY user_id ORDER BY create_dt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS k,
        |  min(create_dt) OVER (PARTITION BY user_id) AS create_dt,
        |  CASE WHEN max(create_dt) OVER (PARTITION BY user_id)
        |          = min(create_dt) OVER (PARTITION BY user_id) THEN NULL
        |       ELSE max(create_dt) OVER (PARTITION BY user_id) END AS update_dt
        | FROM (SELECT user_id, k, min(trans_date) AS create_dt FROM ev
        |       WHERE trans_date >= TIMESTAMP '2024-01-16 00:00:00'
        |       GROUP BY 1, 2) g),
        |ins AS (
        | SELECT s.* FROM s1 s WHERE NOT EXISTS (
        |  SELECT 1 FROM d1 c WHERE c.user_id = s.user_id)),
        |sone AS (SELECT DISTINCT user_id, k, create_dt, update_dt FROM s1),
        |upd AS (
        | SELECT c.user_id,
        |  CASE WHEN s.user_id IS NOT NULL AND s.k <> c.k THEN s.k
        |       ELSE c.k END AS k,
        |  c.create_dt,
        |  CASE WHEN s.user_id IS NOT NULL AND s.k <> c.k
        |       THEN coalesce(s.update_dt, s.create_dt)
        |       ELSE c.update_dt END AS update_dt
        | FROM d1 c LEFT JOIN sone s ON c.user_id = s.user_id)
        |SELECT user_id, k, create_dt, update_dt FROM upd
        |UNION ALL
        |SELECT user_id, k, create_dt, update_dt FROM ins""".stripMargin,
    "q37_correlated_scalar" ->
      """SELECT c_custkey,
        | (SELECT count(*) FROM orders o
        |  WHERE o.o_custkey = c.c_custkey) AS n_orders,
        | (SELECT max(o_orderdate) FROM orders o
        |  WHERE o.o_custkey = c.c_custkey) AS last_order
        |FROM customer c""".stripMargin,
    "q38_lateral_topn" ->
      """SELECT n_name, c_custkey, c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin,
    "q30_date_funcs" ->
      """SELECT o_orderkey,
        | year(o_orderdate)::BIGINT AS y,
        | month(o_orderdate)::BIGINT AS m,
        | day(o_orderdate)::BIGINT AS dom,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m
        |FROM orders""".stripMargin
  )
}

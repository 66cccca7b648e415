package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` on local[32] and prints the result JSON at the
  * very end of stdout, after logging is silenced.
  *
  * Capture discipline (round-3 verdict item 1): the driver keeps only the
  * LAST ~2 KB of stdout, and the full-name per-query map alone is ~4 KB —
  * round 3's line lost its head to the window and parsed as null. The
  * LAST line is now a compact form whose query keys are the unique short
  * prefixes ("q01", "d33", …) so the whole line fits the window even with
  * sbt's trailing "[success]" line; the full-name line is printed just
  * before it and also written to `BENCH_RESULT.json`, with per-sweep
  * detail in `BENCH_DETAIL.json` (both best-effort files in the cwd).
  *
  * Each query is forced through the `noop` sink — a plain `count()` would
  * let Catalyst prune the projected columns (windows, hashes, dot
  * products) and time a skeleton of the real plan.
  *
  * Variance discipline (round-3 verdict item 2): 134 queries × 3 sweeps in
  * one shared JVM showed 3-24× median swings on PlanSpec-pinned, unchanged
  * plans — GC debt and JIT recompilation from NEIGHBORING queries land on
  * whoever runs next. Three countermeasures: the headline number is now
  * the per-query MIN across sweeps (the statistic round 3 showed stable,
  * within ~1.5× round-over-round, while medians swung with suite noise);
  * each sweep visits queries in a different deterministic order (seeded
  * shuffle — a systematic neighbor effect can't bias the same query
  * twice); and a GC quiesce runs between sweeps so one sweep's garbage
  * isn't the next sweep's pause. The q49/q50 protocol replays run twice
  * (interleaved, sweeps 1-2 — see [[RunTwice]]).
  */
object Bench {

  /** Full pipeline replays: timed in the first TWO sweeps only. Round 4
    * ran them once and a 1.4× q50 move was unfalsifiable on n=1 (verdict
    * item 3); two interleaved samples make a real shift distinguishable
    * from one unlucky run, while the third sweep stays cheap (each
    * replay is a ~40-job ETL whose per-job overhead dominates — a third
    * sample buys little variance insight for its wall-clock).
    */
  private val RunTwice = Set("q49_pipeline_scd2", "q50_pipeline_scd1")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1: $runs")
    val spark: SparkSession = GraftSession.get()

    // warm the JVM + parquet footers once per plan shape (not timed, tiny
    // scale factor) so first-heavy-query JIT noise doesn't land on the
    // first timed query: agg, window, broadcast join, HOF-lambda LSH,
    // vector top-k aggregator
    Seq("q01_agg_grain_min", "q34_rank_family", "q05_join5_revenue",
      "d04_minhash_pairs", "e03_lsh_topk",
      // the streaming engine (micro-batch planner, state stores) and the
      // iterative-CC loop JIT separately from the batch shapes
      "s01_stream_hourly_counts", "d10_dedup_components")
      .foreach(n => SparkEntry.queries.get(n).foreach { f =>
        try f(spark, "/root/testdata/sf0.001").write
          .format("noop").mode("overwrite").save()
        catch { case _: Throwable => () } // warm-up failures surface in the timed run
      })
    // the ETL/mart protocol classes (Scd1/Scd2/MartStaging/FraudRules/
    // AmountGuessing + the commit protocol) are exercised ONLY by the
    // q49/q50 replays, so their first run paid ~10 s of class-load+JIT
    // that no other warm query covers — one 2-day replay per family
    // warms the whole shape (same per-plan-shape policy as the list
    // above; measured first-replay 27 s vs steady-state ~12 s). TWO
    // days because day 2 is where the merge-on-read dim-load paths
    // (commitMoRDelta, DvSurvives, the masked anti-joins) first
    // execute — a 1-day warm-up left all of them to JIT inside the
    // first timed replay.
    Seq(graft.mart.MartStaging.Scd2Dims, graft.mart.MartStaging.Scd1Dims)
      .foreach { fam =>
        try {
          val dir = java.nio.file.Files.createTempDirectory("graft-warm")
          graft.ReplayDump.replay(
            new graft.storage.Lakehouse(spark, dir.resolve("lake").toString),
            fam, days = 2,
            fixtureDir = "/root/repo/src/test/resources/fixtures")
        } catch { case _: Throwable => () }
      }

    // SPARK_GRAFT_BENCH_ONLY=q23_percentile,q24_approx_stats,... runs a
    // canary subset in an otherwise-idle JVM. Purpose: separate plan cost
    // from shared-JVM pressure — the full 182-query sweep accumulates GC /
    // code-cache / metaspace debt that inflates individual timings, and a
    // fresh-JVM canary of UNCHANGED queries isolates that effect from real
    // plan regressions when comparing rounds.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown canary queries: ${unknown.mkString(",")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // per-query timings across sweeps; -1 is the machine-readable failure
    // sentinel (stderr drowns in Spark log noise) — a crashed query must
    // not read as a speedup
    val times = scala.collection.mutable.Map(
      names.map(_ -> Vector.empty[Double]): _*)
    // per-query protocol-wait telemetry (round-11 verdict item 1): any
    // commit-protocol wait/retry loop that fires during a query is
    // recorded here and surfaced in the artifacts — a bench number
    // inflated by a silent 10-30 s protocol stall must name its stall
    // instead of reading as "slow engine"
    val waits = scala.collection.mutable.Map(
      names.map(_ -> Vector.empty[Long]): _*)
    val waitDetail = scala.collection.mutable.Map.empty[String, String]
    // JVM-debt telemetry (round-12): per-query GC + JIT-compilation time
    // deltas, surfaced next to the protocol waits. Round 11's one red
    // number (q49 = 164 s driver-side, unreproducible) matched neither a
    // protocol wait (telemetry read 0) nor GC — the round-12 profiler
    // found whole-stage-codegen recompile churn (JIT 125-150 s per
    // replay) as the only mechanism of that size. With these columns an
    // inflated bench number names its JVM debt instead of reading as
    // "slow engine". (MXBean counters are JVM-global; under the bench's
    // serial query loop attribution is exact.)
    import scala.jdk.CollectionConverters._
    def gcNowMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitNowMs: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    val gcs = scala.collection.mutable.Map(
      names.map(_ -> Vector.empty[Long]): _*)
    val jits = scala.collection.mutable.Map(
      names.map(_ -> Vector.empty[Long]): _*)
    for (r <- 1 to runs) {
      // deterministic per-sweep order: same seed → same schedule across
      // rounds (comparable artifacts), different order per sweep (no
      // query inherits the same neighbor's GC/JIT debt twice)
      val order = new scala.util.Random(42L + r).shuffle(names)
      for (name <- order if r <= 2 || !RunTwice.contains(name)) {
        val fn = SparkEntry.queries(name)
        graft.storage.ProtocolTelemetry.reset()
        val (gc0, jit0) = (gcNowMs, jitNowMs)
        val t0 = System.nanoTime()
        val sec =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
                (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
          }
        times(name) :+= sec
        gcs(name) :+= gcNowMs - gc0
        jits(name) :+= jitNowMs - jit0
        val snap = graft.storage.ProtocolTelemetry.snapshot()
        waits(name) :+= snap.values.map(_.waitedMs).sum
        if (snap.values.exists(_.waitedMs > 0)) {
          waitDetail(name) = graft.storage.ProtocolTelemetry.render(snap)
          System.err.println(s"[bench] $name protocol waits: " +
            waitDetail(name))
        }
      }
      // GC quiesce between sweeps: flush this sweep's garbage so its
      // collection pauses don't land inside the next sweep's timings
      System.gc()
      Thread.sleep(200)
    }

    def median(v: Seq[Double]): Double = {
      val s = v.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // a query failed if ANY sweep failed — partial failure must not hide
    // behind clean statistics of the surviving sweeps
    val failedNames = names.filter(n => times(n).exists(_ < 0))
    def stat(f: Seq[Double] => Double): Map[String, Double] =
      names.map(n => n ->
        (if (failedNames.contains(n)) -1.0 else f(times(n)))).toMap
    // headline = per-query MIN across sweeps: the noise floor of a query's
    // plan in this JVM, and the statistic stable round-over-round
    val best = stat(_.min)
    val med = stat(median)
    val total = names.map(best).filter(_ >= 0).sum

    // Locale.ROOT: a comma-decimal default locale would render 0,123 and
    // corrupt both JSON artifacts
    def f3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    def jmap(m: Seq[(String, String)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val detail = jmap(names.map { n =>
      val v = times(n)
      n -> jmap(Seq(
        "runs" -> v.map(f3).mkString("[", ",", "]"),
        "min" -> f3(best(n)),
        "median" -> f3(med(n))) ++
        // protocol-wait ms per sweep + loop breakdown, only when a wait
        // fired: the absent key IS the "zero protocol waits" statement
        (if (waits(n).exists(_ > 0)) Seq(
          "wait_ms" -> waits(n).mkString("[", ",", "]"),
          "wait_loops" -> ("\"" + waitDetail.getOrElse(n, "") + "\""))
         else Nil) ++
        // JVM-debt columns, only when nontrivial (>0.2 s in some sweep):
        // a query whose number is inflated by GC pauses or JIT
        // recompilation names it here
        (if (gcs(n).exists(_ > 200)) Seq(
          "gc_ms" -> gcs(n).mkString("[", ",", "]")) else Nil) ++
        (if (jits(n).exists(_ > 200)) Seq(
          "jit_ms" -> jits(n).mkString("[", ",", "]")) else Nil))
    })
    val totalWaitMs = names.map(n => waits(n).sum).sum
    val totalGcMs = names.map(n => gcs(n).sum).sum
    val totalJitMs = names.map(n => jits(n).sum).sum
    def writeFile(path: String, content: String): Unit =
      // best-effort: an unwritable cwd must not cost the stdout lines
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path), content)
      catch { case e: java.io.IOException =>
        System.err.println(s"[bench] $path not written: $e")
      }
    // a canary subset must not clobber the full-sweep artifacts
    val artifactSuffix = if (only.isDefined) "_CANARY" else ""
    writeFile(s"BENCH_DETAIL$artifactSuffix.json",
      s"""{"sf":"$sfDir","sweeps":$runs,"protocol_wait_ms":$totalWaitMs,"gc_ms":$totalGcMs,"jit_ms":$totalJitMs,"stat":"min (median in detail)","queries":$detail}""")

    // Pinned-canary companion (round-11 verdict item 2): the full sweep
    // launches the FROZEN round-10 jar's fixed 10-query subset in a fresh
    // JVM via tools/canary_bench.sh, in the SAME session as this
    // artifact, so every BENCH_rNN.json ships with the frozen-code
    // number that prices machine drift out of the round-over-round
    // ratio. Best-effort: a missing jar or a canary crash is reported in
    // the artifact (`"canary":"<reason>"`), never fatal to the sweep.
    // SPARK_GRAFT_CANARY=0 skips (used by the canary run itself via the
    // BENCH_ONLY guard, and by quick local iterations).
    val canaryJson: String =
      if (only.isDefined || sys.env.get("SPARK_GRAFT_CANARY").contains("0"))
        "\"skipped\""
      else {
        val sh = new java.io.File("tools/canary_bench.sh")
        val jar = new java.io.File("tools/canary/graft-canary-r10.jar")
        if (!sh.isFile || !jar.isFile) "\"jar or script missing\""
        else try {
          val pb = new ProcessBuilder("bash", sh.getPath,
            "BENCH_CANARY.json")
          pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
          pb.redirectErrorStream(true)
          val proc = pb.start()
          val out = new String(proc.getInputStream.readAllBytes())
          val rc = proc.waitFor()
          if (rc != 0) {
            System.err.println(s"[bench] canary rc=$rc: ${out.takeRight(500)}")
            s""""failed rc=$rc""""
          } else {
            val c = java.nio.file.Files.readString(
              java.nio.file.Paths.get("BENCH_CANARY.json")).trim
            System.err.println("[bench] canary companion written: " +
              "BENCH_CANARY.json")
            c
          }
        } catch { case e: Exception =>
          System.err.println(s"[bench] canary failed: $e")
          "\"failed: " + e.getClass.getSimpleName + "\""
        }
      }

    val fullLine =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":${
        jmap(names.map(n => n -> f3(best(n))))},"stat":"min_of_$runs","failed":${failedNames.size},"runs":$runs,"sf":"$sfDir","protocol_wait_ms":$totalWaitMs,"gc_ms":$totalGcMs,"jit_ms":$totalJitMs,"canary":$canaryJson}"""
    writeFile(s"BENCH_RESULT$artifactSuffix.json", fullLine)
    // compact keys: unique short prefix before the first underscore
    // ("q49_pipeline_scd2" → "q49"). CHECKED, not assumed: a future name
    // collision would silently emit duplicate JSON keys and corrupt the
    // driver-parsed artifact — fall back to full names (losing only
    // compactness, not validity)
    val prefixes = names.map(_.takeWhile(_ != '_'))
    val compactKeys =
      if (prefixes.distinct.sizeIs == names.size) prefixes else names
    val compactLine =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":${
        jmap(compactKeys.zip(names).map { case (k, n) => k -> f3(best(n)) })},"stat":"min_of_$runs","failed":${failedNames.size},"runs":$runs,"sf":"$sfDir"}"""
    // silence everything BEFORE printing so no shutdown log lands after
    // the JSON in a merged stdout+stderr capture; stop() is guarded for
    // the same reason — the lines must print even if shutdown throws
    spark.sparkContext.setLogLevel("OFF")
    try spark.stop()
    catch { case _: Throwable => () }
    println(fullLine)
    println(compactLine)
    // FINAL totals-only line (<200 chars regardless of query count): the
    // driver tail-captures ~2000 chars of stdout and json-parses the LAST
    // line — the compact per-query map outgrew that window at ~175
    // queries, so the line that must always parse carries no per-query
    // data at all. Full detail stays in the two lines above and the
    // BENCH_*.json artifacts.
    println(
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","nqueries":${names.size},"stat":"min_of_$runs","failed":${failedNames.size},"runs":$runs,"sf":"$sfDir","protocol_wait_ms":$totalWaitMs,"gc_ms":$totalGcMs,"jit_ms":$totalJitMs}""")
  }
}

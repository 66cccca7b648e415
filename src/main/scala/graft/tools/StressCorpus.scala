package graft.tools

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Reproducible corpus stress run: the sf0.1 documents table scaled
  * `xFactor`× (unique doc ids per replica; one replica in ten keeps the
  * text verbatim so cross-replica near-duplicates exist, the rest get a
  * replica-salted token appended so signatures spread) through the
  * near-dup family — exact groups, banded MinHash pairs, SimHash hamming
  * pairs, cross-doc duplicate grams. Prints one JSON line with corpus
  * size and per-stage timings; every stage is forced through the noop
  * sink so timings measure the full plan, not a pruned skeleton.
  *
  * Usage: `sbt "runMain graft.tools.StressCorpus [xFactor]"` (default 10
  * ≈ 50k docs / ~10× the bench gate).
  */
object StressCorpus {
  def main(args: Array[String]): Unit = {
    val x = args.headOption.map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.get()

    val base = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val n0 = base.count()
    val replicas = spark.range(0, x).select(col("id").as("_rep"))
    val scaled = base.crossJoin(replicas)
      .select((col("doc_id") + col("_rep") * lit(n0)).as("doc_id"),
        when(pmod(col("_rep"), lit(10L)) === 0L, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("_rep"))).as("text"),
        col("lang"), col("source"))

    import StressUtil.{timed, drain}

    val n = scaled.count()
    // timed stages run UN-audited (comparable across rounds — audit mode
    // pays one extra corpus pass for its metrics job, see CapAudit)
    val tExact = timed(drain(
      Dedup.exactGroups(scaled, "doc_id", "text").filter(col("n_dups") > 1)))
    val tMinhash = timed(drain(
      Dedup.minhashNearDups(scaled.withColumnRenamed("doc_id", "id"),
        "id", "text", bands = 4, rowsPerBand = 2, threshold = 0.8)))
    val tSimhash = timed(drain(
      Dedup.simhashHammingPairs(scaled, "doc_id", "text")))
    val tGrams = timed(drain {
      val grams = scaled
        .filter(TextOps.tokenCount(col("text")) >= 8)
        .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("tk"))
        .repartition(col("doc_id"))
        .select(col("doc_id"), explode(array_distinct(
          transform(TextOps.ngramsFromTokens(col("tk"), 8),
            g => Dedup.hash32(g, 0)))).as("g"))
      grams.groupBy(col("g")).count().filter(col("count") >= 2)
    })
    // d33's corpus-wide chunk dedup: the chunk-keyed first-occurrence
    // shuffle IS the operator — WindowGroupLimit drops per-chunk
    // non-firsts before the exchange, so shuffled bytes track DISTINCT
    // chunk mass (which saturates as replicas repeat chunks), not corpus
    // size; the reassembly rides one id-keyed agg
    val tChunkDedup = timed(drain(
      Dedup.crossDocChunkDedup(scaled, "doc_id", "text")))
    def dropped(o: org.apache.spark.sql.Observation): String = {
      val m = o.get
      s"""{"dropped_buckets":${m("dropped_buckets")},"dropped_rows":${m("dropped_rows")},"total_rows":${m("total_rows")}}"""
    }
    // recall cost of the cap, measured: pairs found under the default cap
    // vs a 100× looser one (the e06 pattern applied to dedup). A truly
    // uncapped reference is itself quadratic in the degenerate buckets —
    // the first version of this harness ran >13 min at ×30 before being
    // killed, which is the cap's raison d'être measured the hard way —
    // so the reference bounds the degenerate class at 10 000 and reports
    // its own dropped mass alongside
    val idDocs = scaled.withColumnRenamed("doc_id", "id")
    // default-cap audit rides the (un-timed) pairsCapped job; simhash
    // gets its own un-timed audit run — dropped megabucket mass at the
    // default caps is the no-silent-caps metric, paid outside timings
    val mhObs = org.apache.spark.sql.Observation()
    val cappedDf = Dedup.minhashNearDups(idDocs, "id", "text",
      bands = 4, rowsPerBand = 2, threshold = 0.8,
      capAudit = Some(mhObs)).localCheckpoint()
    val pairsCapped = cappedDf.count()
    val shObs = org.apache.spark.sql.Observation()
    drain(Dedup.simhashHammingPairs(scaled, "doc_id", "text",
      capAudit = Some(shObs)))
    val looseObs = org.apache.spark.sql.Observation()
    val looseDf = Dedup.minhashNearDups(idDocs, "id", "text",
      bands = 4, rowsPerBand = 2, threshold = 0.8,
      maxBucket = 10000, capAudit = Some(looseObs)).localCheckpoint()
    val pairsLoose = looseDf.count()
    // two recall views of the same cap: PAIR recall collapses on a
    // megabucket by construction (a bucket of m near-identical docs
    // capped at c keeps ~c²/m² of its pairs), DOC recall is the
    // dedup-relevant one — a doc joins its duplicate component with ONE
    // surviving pair. On real corpora exact dedup runs FIRST (the d21
    // funnel), so identical-replica megabuckets never even reach LSH.
    def docCov(pairs: org.apache.spark.sql.DataFrame): Long = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().count()
    val recall =
      if (pairsLoose == 0) 1.0 else pairsCapped.toDouble / pairsLoose
    val docsCapped = docCov(cappedDf)
    val docsLoose = docCov(looseDf)
    val docRecall =
      if (docsLoose == 0) 1.0 else docsCapped.toDouble / docsLoose
    // the star fallback under the SAME default cap: megabuckets emit
    // O(m) hub pairs instead of being dropped — doc coverage should
    // approach (and can exceed) the loose-cap reference at a fraction of
    // its pair volume
    // the eager localCheckpoint IS the timed execution (one pass — the
    // counts below read the materialized blocks)
    var starDf: org.apache.spark.sql.DataFrame = null
    val tStar = timed {
      starDf = Dedup.minhashNearDups(idDocs, "id", "text",
        bands = 4, rowsPerBand = 2, threshold = 0.8, megabucketStar = true)
        .localCheckpoint()
    }
    val pairsStar = starDf.count()
    val docsStar = docCov(starDf)
    val docRecallStar =
      if (docsLoose == 0) 1.0 else docsStar.toDouble / docsLoose

    // the full downstream curation composition on the star pairs: CC
    // (pointer doubling) → d26-style per-cluster ≤5 deterministic
    // representatives — the d10+d26 shape at stress scale; rides the
    // already-materialized star pair set, so cluster_sec isolates the
    // iterative + window cost, not pair generation
    val tCluster = timed(drain {
      import org.apache.spark.sql.expressions.Window
      graft.ops.Components.connectedComponents(
        scaled.select(col("doc_id").as("id")),
        starDf.select(col("id_a").as("src"), col("id_b").as("dst")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("component"))
            .orderBy(md5(col("id").cast("string")), col("id")))
          .cast("bigint"))
        .filter(col("rk") <= 5)
    })
    println(f"""{"docs":$n,"exact_sec":$tExact%.1f,"minhash_sec":$tMinhash%.1f,"simhash_sec":$tSimhash%.1f,"grams_sec":$tGrams%.1f,"chunk_dedup_sec":$tChunkDedup%.1f,"minhash_star_sec":$tStar%.1f,"cluster_sample_sec":$tCluster%.1f,"minhash_cap":${dropped(mhObs)},"simhash_cap":${dropped(shObs)},"cap_pair_recall":$recall%.4f,"cap_doc_recall":$docRecall%.4f,"star_doc_recall":$docRecallStar%.4f,"docs_in_pairs_capped":$docsCapped,"docs_in_pairs_star":$docsStar,"docs_in_pairs_loose":$docsLoose,"pairs_capped":$pairsCapped,"pairs_star":$pairsStar,"pairs_loose_cap":$pairsLoose,"loose_cap":${dropped(looseObs)}}""")
    spark.stop()
  }
}

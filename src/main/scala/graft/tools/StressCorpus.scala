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

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val n = scaled.count()
    val tExact = timed(drain(
      Dedup.exactGroups(scaled, "doc_id", "text").filter(col("n_dups") > 1)))
    // cap audit at the stress point (no-silent-caps): dropped megabucket
    // mass is part of the printed result, so the recall trade the caps
    // make at scale is a number, not a guess
    val mhObs = org.apache.spark.sql.Observation()
    val tMinhash = timed(drain(
      Dedup.minhashNearDups(scaled.withColumnRenamed("doc_id", "id"),
        "id", "text", bands = 4, rowsPerBand = 2, threshold = 0.8,
        capAudit = Some(mhObs))))
    val shObs = org.apache.spark.sql.Observation()
    val tSimhash = timed(drain(
      Dedup.simhashHammingPairs(scaled, "doc_id", "text",
        capAudit = Some(shObs))))
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
    def dropped(o: org.apache.spark.sql.Observation): String = {
      val m = o.get
      s"""{"dropped_buckets":${m("dropped_buckets")},"dropped_rows":${m("dropped_rows")},"total_rows":${m("total_rows")}}"""
    }
    // recall cost of the cap, measured: pairs found under the default cap
    // vs effectively-uncapped (the e06 pattern applied to dedup). On a
    // corpus without degenerate megabuckets these match exactly; when
    // they diverge, dropped_rows above says which buckets paid for it
    val idDocs = scaled.withColumnRenamed("doc_id", "id")
    val pairsCapped = Dedup.minhashNearDups(idDocs, "id", "text",
      bands = 4, rowsPerBand = 2, threshold = 0.8).count()
    val pairsUncapped = Dedup.minhashNearDups(idDocs, "id", "text",
      bands = 4, rowsPerBand = 2, threshold = 0.8,
      maxBucket = Int.MaxValue).count()
    val recall =
      if (pairsUncapped == 0) 1.0 else pairsCapped.toDouble / pairsUncapped
    println(f"""{"docs":$n,"exact_sec":$tExact%.1f,"minhash_sec":$tMinhash%.1f,"simhash_sec":$tSimhash%.1f,"grams_sec":$tGrams%.1f,"minhash_cap":${dropped(mhObs)},"simhash_cap":${dropped(shObs)},"cap_pair_recall":$recall%.4f,"pairs_capped":$pairsCapped,"pairs_uncapped":$pairsUncapped}""")
    spark.stop()
  }
}

package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token-budget sequence packing: lay the corpus out as one deterministic
  * token stream (ordered by id) and assign every document its starting
  * token offset and training-chunk number (`offset / budget`) — the
  * document-concatenation step of an LLM training-data pipeline, where
  * consecutive documents fill fixed-length sequences and may straddle
  * chunk boundaries.
  *
  * The core is an EXCLUSIVE PREFIX SUM over the corpus in id order. The
  * naive spelling — `sum(n) OVER (ORDER BY id)` with no partition — is
  * a single-partition window: the whole corpus funnels through one task,
  * which is exactly the shape that cannot survive 100 TB. Instead the
  * classic two-phase distributed scan:
  *
  *   1. range-repartition by id and sort within partitions (one shuffle;
  *      partition p holds an id range wholly before partition p+1);
  *   2. per-partition token totals — numPartitions rows — come back to
  *      the driver, whose running sum gives each partition its global
  *      starting offset (the ONE legitimate collect: O(partitions), not
  *      O(rows));
  *   3. a partition-local fold (`mapPartitions`) adds the broadcast
  *      offset to the local running sum — map-side, no second shuffle.
  *
  * The repartitioned input is pinned with `localCheckpoint` because both
  * phase 2 and phase 3 must observe the SAME partitioning: range
  * partitioning samples its boundaries, so re-evaluating the lineage
  * could split ids differently between the two passes.
  */
object Packing {

  /** @param df     input with `idCol` (integral, unique) and `tokensCol`
    *               (integral token count)
    * @param budget tokens per training chunk, > 0
    * @param numPartitions explicit range-partition count; None lets
    *               Spark/AQE size it from the data
    * @return (idCol, n_tokens, start_off, chunk_id) — exclusive prefix
    *         sum and `start_off / budget`, both in id order
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, numPartitions: Option[Int] = None): DataFrame = {
    require(budget > 0, s"budget <= 0: $budget")
    val spark = df.sparkSession
    val sel = df
      .where(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("n_tokens"))
    val base = numPartitions
      .map(n => sel.repartitionByRange(n, col("id")))
      .getOrElse(sel.repartitionByRange(col("id")))
      .sortWithinPartitions("id")
      .localCheckpoint(true)

    // one row RDD for both the partition count and the phase-3 fold —
    // `.rdd` plans a fresh deserializing RDD per call, so a second call
    // would pay (and plan) it twice
    val baseRdd = base.rdd
    val partSums = base
      .groupBy(spark_partition_id().as("pid"))
      .agg(sum(col("n_tokens")).as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val nParts = baseRdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    (0 until nParts).foreach { p =>
      offsets(p) = acc
      acc += partSums.getOrElse(p, 0L)
    }
    val bOffsets = spark.sparkContext.broadcast(offsets)

    val out = baseRdd.mapPartitions { it =>
      var cum = bOffsets.value(TaskContext.getPartitionId())
      it.map { row =>
        val id = row.getLong(0)
        val n = row.getLong(1)
        val start = cum
        cum += n
        Row(id, n, start, start / budget)
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("start_off", LongType, nullable = false),
      StructField("chunk_id", LongType, nullable = false))))
      .withColumnRenamed("id", idCol)
  }

  /** Quality-greedy TOKEN-BUDGET SELECTION — "take the best documents
    * until the budget is spent", the data-selection step between scoring
    * and training (DsDm/DataComp-style): documents ordered by
    * (score DESC, tie-break ASC), kept while the running token total
    * stays within `budget`.
    *
    * The naive spelling is a GLOBAL ordered running sum — a
    * single-partition window the whole corpus funnels through, the
    * 100 TB anti-pattern (same trap as [[packOffsets]]). Selection
    * doesn't need the prefix sum, only the CUT POINT, so this runs as:
    *
    *   1. one map-side-combinable aggregate: total tokens per DISTINCT
    *      SCORE (integer scores — the histogram is bounded by the score
    *      domain, metadata-sized, NOT corpus-sized);
    *   2. a driver walk of the sorted histogram finds the threshold
    *      score τ: every doc scoring above τ fits entirely, the budget
    *      remainder falls inside τ's bucket;
    *   3. `score > τ` rows pass with a bare filter (no shuffle, no
    *      order); only the ONE tie bucket pays an ordered running sum,
    *      and a bucket is vanishingly small next to the corpus.
    *
    * Greedy-equivalence to the sorted take-while holds because the
    * running total is monotone: a doc's inclusive prefix sum exceeds
    * the budget iff every later doc's does too.
    *
    * @param budget   max total of `tokensCol` over the selection
    * @param scoreCol integral quality score (higher = better); integral
    *                 because the histogram groups by exact score values
    * @param tieCol   total order within equal scores (determinism)
    */
  def tokenBudgetSelect(df: DataFrame, scoreCol: String, tokensCol: String,
      tieCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"negative budget: $budget")
    // explicit long casts: the contract says INTEGRAL, not LongType —
    // an int score (or int token count) would hit getLong with a
    // java.lang.Integer on the driver; grouping is unchanged for any
    // integral source type. A null score group refuses loudly from the
    // histogram itself (no extra pass) — nulls have no place in a
    // total order over quality.
    val hist = df.groupBy(col(scoreCol).cast("long").as("s"))
      .agg(sum(col(tokensCol).cast("long")).as("t"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"tokenBudgetSelect: null values in score column $scoreCol")
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }.sortBy(-_._1)
    var cum = 0L
    var tau = Option.empty[Long]
    var remaining = 0L
    hist.foreach { case (s, t) =>
      if (tau.isEmpty) {
        if (cum + t <= budget) cum += t
        else { tau = Some(s); remaining = budget - cum }
      }
    }
    tau match {
      case None => df // the whole corpus fits
      case Some(ts) =>
        val fullIn = df.filter(col(scoreCol) > ts)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col(tieCol))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)
        val ties = df.filter(col(scoreCol) === ts)
          .withColumn("__cum", sum(col(tokensCol)).over(w))
          .filter(col("__cum") <= remaining)
          .drop("__cum")
        fullIn.unionByName(ties)
    }
  }
}

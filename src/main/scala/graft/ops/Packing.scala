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

    val partSums = base
      .groupBy(spark_partition_id().as("pid"))
      .agg(sum(col("n_tokens")).as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val nParts = base.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    (0 until nParts).foreach { p =>
      offsets(p) = acc
      acc += partSums.getOrElse(p, 0L)
    }
    val bOffsets = spark.sparkContext.broadcast(offsets)

    val out = base.rdd.mapPartitions { it =>
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
}

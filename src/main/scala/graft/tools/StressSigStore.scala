package graft.tools

import graft.ops.Dedup
import graft.storage.Lakehouse
import org.apache.spark.sql.functions._

/** Signature-store stress: quantifies the d36 scale story — what the
  * persisted band store buys continuous ingestion — at growing corpus
  * size. For each corpus factor x (sf0.1 documents ×x, unique ids, one
  * replica in ten verbatim so cross-batch near-dups exist):
  *
  *   - `store_build_sec`: the ONE-OFF signing of the standing corpus
  *     into the bucket-clustered store (amortized, like a layout);
  *   - `incremental_sec`: a fresh 2%-of-corpus batch deduped AGAINST
  *     the store (sign batch → hot-bucket semi-join → capped pairs →
  *     id-fetched verification) plus its delta append — what every
  *     ingest batch pays;
  *   - `scratch_sec`: the same batch answered by re-running the full
  *     minhash pair pipeline over corpus+batch and filtering to
  *     batch-involved pairs — what ingestion pays WITHOUT a store.
  *
  * The claim under test: `incremental_sec` tracks the BATCH (flat-ish
  * in x), `scratch_sec` tracks the CORPUS (grows with x). At 100 TB
  * the scratch path additionally re-reads and re-shuffles the corpus
  * tokens every batch — costs local[32] underestimates.
  *
  * Usage: `sbt "runMain graft.tools.StressSigStore [xFactors...]"`
  * (default `1 10 30`). One JSON line per x.
  */
object StressSigStore {
  def main(args: Array[String]): Unit = {
    val xs = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 30)
    val spark = graft.GraftSession.get()
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    val n0 = base.count()

    import StressUtil.{timed, drain}
    val out = for (x <- xs) yield {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-sig$x")
      val lake = new Lakehouse(spark, dir.resolve("lake").toString)
      val replicas = spark.range(0, x).select(col("id").as("_rep"))
      val corpus = base.crossJoin(replicas)
        .select((col("doc_id") + col("_rep") * lit(n0)).as("id"),
          when(pmod(col("_rep"), lit(10L)) === 0L, col("text"))
            .otherwise(concat(col("text"), lit(" rep"), col("_rep")))
          .as("text"))
        .localCheckpoint(eager = true)
      val nCorpus = corpus.count()
      // the fresh batch: 2% of corpus size, ids above the corpus range,
      // texts verbatim from the base slice (guaranteed near-dups of the
      // verbatim replicas — the batch has real work to do)
      val batch = base.filter(col("doc_id") < nCorpus / 50)
        .select((col("doc_id") + lit(nCorpus)).as("id"), col("text"))
        .localCheckpoint(eager = true)
      val nBatch = batch.count()
      val all = corpus.unionByName(batch)

      val tBuild = timed {
        lake.overwritePartitioned("sig_store",
          Dedup.minhashBandedRows(corpus, "id", "text", 4, 2)
            .repartitionByRange(32, col("bucket")),
          Nil, statsCols = Seq("bucket"))
      }
      val storeSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, band INT, bucket STRING")
      val tInc = timed {
        drain(Dedup.incrementalMinhashNearDups(all, batch,
          lake.read("sig_store", storeSchema), "id", "text",
          bands = 4, rowsPerBand = 2, threshold = 0.8))
        lake.append("sig_store",
          Dedup.minhashBandedRows(batch, "id", "text", 4, 2),
          statsCols = Seq("bucket"))
      }
      val tScratch = timed(drain(
        Dedup.minhashNearDups(all, "id", "text",
          bands = 4, rowsPerBand = 2, threshold = 0.8)
          .filter(col("id_a") >= nCorpus || col("id_b") >= nCorpus)))
      f"""{"x":$x,"corpus":$nCorpus,"batch":$nBatch,"store_build_sec":$tBuild%.2f,"incremental_sec":$tInc%.2f,"scratch_sec":$tScratch%.2f}"""
    }
    out.foreach(println)
    spark.stop()
  }
}

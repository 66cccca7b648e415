package graft.tools

import graft.{GraftSession, Tables}
import graft.ops.{Dedup, VectorOps}
import org.apache.spark.sql.functions._

/** Dev-only profiler for the LSH-family operators (not engine surface). */
object ProfileD09 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, d).withColumnRenamed("doc_id", "id")
    val embs = Tables.embeddings(spark, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    noop(docs.select(col("id"))) // session warm
    def d09() = Dedup.ngramJaccardPairs(docs, "id", "text", threshold = 0.5,
      maxBucket = 100)
    def d04() = Dedup.minhashNearDups(docs, "id", "text", bands = 4,
      rowsPerBand = 2, threshold = 0.8, maxBucket = 100)
    def d06() = VectorOps.embeddingNearDups(embs, nPlanes = 4,
      minDot = 200000L, maxBucket = 200)
    time("d09 cold")(noop(d09()))
    time("d09 warm")(noop(d09()))
    time("d04 cold")(noop(d04()))
    time("d04 warm")(noop(d04()))
    time("d06 cold")(noop(d06()))
    time("d06 warm")(noop(d06()))
    val bad = d09().queryExecution.executedPlan.toString
    if (bad.contains("isnotnull(array_min(array_distinct"))
      println("[prof] WARNING: md5 pipeline still inlined in a filter")
    else println("[prof] plan clean: no md5 pipeline in filters")
    spark.stop()
  }
}

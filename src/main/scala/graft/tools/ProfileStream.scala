package graft.tools

/** Dev diagnostic: per-micro-batch phase durations for the streaming
  * queries — Structured Streaming's own progress telemetry
  * (durationMs: triggerExecution / queryPlanning / walCommit / getBatch /
  * addBatch / commitOffsets), printed per batch while named SparkEntry
  * s-queries run. Says whether streaming wall goes to planning, WAL io,
  * state commits, or the batch's actual work.
  *
  * Usage: runMain graft.tools.ProfileStream s20_stream_to_table[,s16_...] [runs]
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          import scala.jdk.CollectionConverters._
          println(s"[sprog] batch=${p.batchId} rows=${p.numInputRows} " +
            p.durationMs.asScala.toSeq.sortBy(-_._2)
              .map { case (k, v) => s"$k=$v" }.mkString(" "))
        }
      })
    for (name <- names; r <- 1 to runs) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[sprog] $name run$r total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev diagnostic: generic per-query job census (the ProfileReplayJobs
  * idea for ANY SparkEntry query). For each named query: how many Spark
  * jobs does one noop-sink run launch, how much wall is spent inside jobs
  * (busy) vs in driver-only gaps (planning, commit protocol, fs ops), and
  * how much executor task time the jobs sum to. The busy/gap split says
  * whether to optimize the plans (busy-heavy) or the orchestration
  * (gap-heavy); tasks≫cores×busy says scheduling overhead, tiny tasks.
  *
  * Usage: runMain graft.tools.ProfileQuery q67_point_delete,q95_bucket_evolution [runs]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val taskMs = new AtomicLong
    val active = new AtomicInteger
    val busyNs = new AtomicLong
    val lastEdge = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        jobs.incrementAndGet()
        if (active.getAndIncrement() == 0) lastEdge.set(System.nanoTime())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
        if (active.decrementAndGet() == 0)
          busyNs.addAndGet(System.nanoTime() - lastEdge.get())
      }
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(st.stageInfo.taskMetrics.executorRunTime)
      }
    })
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMs: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    for (name <- names; r <- 1 to runs) {
      val fn = graft.SparkEntry.queries(name)
      jobs.set(0); stages.set(0); taskMs.set(0); busyNs.set(0)
      val (gc0, jit0) = (gcMs, jitMs)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(300) // listener bus drain
      val wall = (System.nanoTime() - t0) / 1e9 - 0.3
      println(f"[profq] $name run$r: jobs=${jobs.get()} stages=${stages.get()} " +
        f"wall=$wall%.2fs busy=${busyNs.get() / 1e9}%.2fs " +
        f"gap=${wall - busyNs.get() / 1e9}%.2fs taskSum=${taskMs.get() / 1e3}%.1fs " +
        f"gc=${(gcMs - gc0) / 1e3}%.1fs jit=${(jitMs - jit0) / 1e3}%.1fs")
    }
    spark.stop()
  }
}

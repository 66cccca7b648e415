package graft.tools

import graft.mart.MartStaging
import graft.storage.Lakehouse
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev diagnostic: job census for the q49 protocol replay — how many
  * Spark jobs does one replay run, how much wall is inside jobs vs in
  * driver-only gaps (planning, commit protocol, fs ops). The gap share
  * tells whether to optimize the plans (in-job) or the orchestration
  * (driver-side).
  *
  * Usage: runMain graft.tools.ProfileReplayJobs [scd2|scd1]
  */
object ProfileReplayJobs {
  def main(args: Array[String]): Unit = {
    val scd =
      if (args.nonEmpty && args(0) == "scd1") MartStaging.Scd1Dims
      else MartStaging.Scd2Dims
    val spark = graft.GraftSession.get()
    val jobs = new AtomicInteger
    // concurrent jobs overlap; track busy wall via active-job refcount
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
    })
    for (round <- 1 to 6) {
      // alternate AQE off/on per round (JIT warms monotonically, so
      // alternation deconfounds it) — how much of the job census is AQE
      // stage materialization on these tiny plans?
      spark.conf.set("spark.sql.adaptive.enabled", round % 2 == 0)
      val dir = java.nio.file.Files.createTempDirectory("graft-profjobs")
      val lake = new Lakehouse(spark, dir.resolve("lake").toString)
      jobs.set(0); busyNs.set(0)
      val t0 = System.nanoTime()
      graft.ReplayDump.replay(lake, scd,
        fixtureDir = "/root/repo/src/test/resources/fixtures")
      // listener events are async; give the bus a beat to drain
      Thread.sleep(300)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[projobs] round $round: jobs=${jobs.get()} wall=$wall%.2fs " +
        f"busy=${busyNs.get() / 1e9}%.2fs gap=${wall - busyNs.get() / 1e9}%.2fs")
    }
    spark.stop()
  }
}

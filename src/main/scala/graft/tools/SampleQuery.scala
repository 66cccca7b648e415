package graft.tools

/** Dev diagnostic: poor-man's wall-clock sampling profiler for one
  * SparkEntry query. Runs the query (noop sink) in the main thread while
  * a sampler thread captures ALL thread stacks every ~10 ms; afterwards
  * prints the most common collapsed frames for (a) the query thread and
  * (b) every RUNNABLE thread, weighted by sample count. Finds the driver
  * hot spots the job/phase censuses can't name (commit io, codegen,
  * scheduling, fs metadata).
  *
  * Usage: runMain graft.tools.SampleQuery <query> [runs] [topFrames]
  */
object SampleQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val top = if (args.length > 2) args(2).toInt else 40
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    val fn = graft.SparkEntry.queries(name)
    // warm run, unprofiled (JIT/codegen caches fill)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val mainThread = Thread.currentThread()
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    def bump(key: String): Unit =
      counts.merge(key, 1, (a, _) => a + 1)
    val sampler = new Thread(() => {
      while (sampling) {
        // executor task threads: top RUNNABLE frames, weighted across
        // all live tasks — names per-task hot spots (codec init, footer
        // io, row codecs) that the driver-thread view can't see
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, frames) =>
          if (t.getName.startsWith("Executor task launch worker") &&
              t.getState == Thread.State.RUNNABLE && frames.nonEmpty) {
            val fs = frames.iterator
              .map(f => s"${f.getClassName}.${f.getMethodName}")
              .filterNot(f => f.startsWith("java.lang.Thread"))
              .take(3).mkString(" <- ")
            if (fs.nonEmpty) bump(s"[task] $fs")
          }
        }
        val st = mainThread.getStackTrace
        if (st.nonEmpty) {
          val all = st.iterator
            .map(f => s"${f.getClassName}.${f.getMethodName}").toVector
          // when a marker frame (shell fork, gzip, conf parse) is on the
          // stack, record the CALLER CHAIN under it — that names the fix
          val marker = Set("java.lang.ProcessImpl.forkAndExec",
            "java.util.zip.Deflater.deflateBytesBytes",
            "java.util.zip.Inflater.inflateBytesBytes",
            "org.apache.hadoop.conf.Configuration.loadResource")
          val mi = all.indexWhere(f => marker.exists(f.startsWith))
          if (mi >= 0) {
            val callers = all.drop(mi).filterNot(f =>
              f.startsWith("java.") || f.startsWith("jdk.") ||
                f.startsWith("scala.")).take(8).mkString(" <- ")
            bump(s"[deep] ${all(mi).takeWhile(_ != '.')}.. $callers")
          }
          val frames = all.iterator
            .filterNot(f => f.startsWith("java.lang.Object") ||
              f.startsWith("jdk.internal.misc.Unsafe") ||
              f.startsWith("java.util.concurrent.locks"))
            .take(3).mkString(" <- ")
          val state =
            if (st.exists(f => f.getClassName.contains("Await") ||
              f.getMethodName == "park")) "WAIT" else "RUN"
          bump(s"[main:$state] $frames")
        }
        Thread.sleep(10)
      }
    }, "graft-sampler")
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    for (_ <- 1 to runs)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    sampler.join()
    println(f"[sample] $name $runs warm runs, ${wall}%.2fs total, " +
      s"${counts.values().stream().mapToInt(_.intValue).sum()} samples")
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy(-_._2.intValue).take(top).foreach {
      case (k, n) => println(f"[sample] $n%5d $k")
    }
    spark.stop()
  }
}

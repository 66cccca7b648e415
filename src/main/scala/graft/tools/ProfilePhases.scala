package graft.tools

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev diagnostic: decompose a query's DRIVER-SIDE gap into Catalyst
  * phases. For every action the named SparkEntry query runs, the
  * QueryExecutionListener reads the QueryPlanningTracker's phase times
  * (parsing / analysis / optimization / planning) and the listener sums
  * them across actions. gap − Σphases ≈ commit protocol + fs ops +
  * scheduling dead time. Says whether driver time is Catalyst CPU
  * (attack plan size / action count) or orchestration io.
  *
  * Usage: runMain graft.tools.ProfilePhases q102_pack_small_files[,…] [runs]
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    val actions = new AtomicInteger
    val phaseMs = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    def record(qe: QueryExecution): Unit = {
      actions.incrementAndGet()
      qe.tracker.phases.foreach { case (phase, summary) =>
        phaseMs.computeIfAbsent(phase, _ => new AtomicLong)
          .addAndGet(summary.durationMs)
      }
    }
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = record(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = record(qe)
    })
    for (name <- names; r <- 1 to runs) {
      actions.set(0); phaseMs.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(500) // listener bus drain
      val wall = (System.nanoTime() - t0) / 1e9 - 0.5
      import scala.jdk.CollectionConverters._
      val phases = phaseMs.asScala.toSeq.sortBy(-_._2.get())
        .map { case (k, v) => f"$k=${v.get() / 1e3}%.2fs" }.mkString(" ")
      println(f"[phases] $name run$r: wall=$wall%.2fs " +
        f"actions=${actions.get()} $phases")
    }
    spark.stop()
  }
}

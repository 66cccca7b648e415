package graft.storage

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Per-JVM counters for every bounded wait / retry loop in the commit
  * protocol. Motivation: a wait that clears before its deadline returns
  * SUCCESS and is invisible in every artifact — a bench run whose
  * headline query silently spun in `awaitSelfAbort` (30 s/delta),
  * `fullRaceWaitMs` (10 s/commit) or `retryChecksum` reads as "slow
  * engine" with nothing to falsify. Every loop records (entries, ms
  * actually slept, timeouts) here; Bench snapshots the deltas per query
  * into BENCH_DETAIL.json, and PipelineReplaySpec asserts ZERO waited
  * ms across the single-writer q49/q50 replay — a driver bench number
  * inflated by protocol waits is now self-diagnosing instead of
  * unexplainable.
  *
  * Loop names in use: `selfAbortWait` (Lakehouse.awaitSelfAbort),
  * `fullRaceWait` (Lakehouse full-commit preMarkerCheck),
  * `checksumRetry` (GraftCatalog.retryChecksum).
  */
object ProtocolTelemetry {
  final case class LoopStat(entries: Long, waitedMs: Long, timeouts: Long)

  // 0 = entries, 1 = waitedMs, 2 = timeouts
  private val stats = new ConcurrentHashMap[String, Array[LongAdder]]()

  private def cells(loop: String): Array[LongAdder] =
    stats.computeIfAbsent(loop, _ => Array.fill(3)(new LongAdder))

  /** Record one loop pass that actually waited/retried. `waitedMs` is
    * wall time spent sleeping/polling; `timedOut` marks the loop giving
    * up at its deadline (the caller then fails loudly — a timeout here
    * pairs with a thrown error, never a silent success).
    */
  def record(loop: String, waitedMs: Long, timedOut: Boolean = false)
      : Unit = {
    val c = cells(loop)
    c(0).increment()
    c(1).add(waitedMs)
    if (timedOut) c(2).increment()
  }

  def snapshot(): Map[String, LoopStat] = {
    import scala.jdk.CollectionConverters._
    stats.asScala.map { case (k, c) =>
      k -> LoopStat(c(0).sum(), c(1).sum(), c(2).sum())
    }.toMap
  }

  def totalWaitedMs(): Long = snapshot().values.map(_.waitedMs).sum

  def reset(): Unit = stats.clear()

  /** Compact single-line rendering for bench artifacts:
    * `loop:entries/waitedMs[/T<timeouts>]` joined by `,`; empty string
    * when no loop fired (the healthy single-writer case).
    */
  def render(s: Map[String, LoopStat] = snapshot()): String =
    s.toSeq.sortBy(_._1).map { case (k, st) =>
      val t = if (st.timeouts > 0) s"/T${st.timeouts}" else ""
      s"$k:${st.entries}/${st.waitedMs}ms$t"
    }.mkString(",")
}

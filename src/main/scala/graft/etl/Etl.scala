package graft.etl

import graft.storage.Lakehouse
import org.apache.spark.sql.functions._

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** `fn_normalize_transactions()` (ETL.sql:1-450) as Spark orchestration.
  *
  * The reference runs the loads serially (SCD2 terminals → fact → SCD2
  * accounts → cards → clients → SCD1 all four, ETL.sql:86-446) because
  * PL/pgSQL is single-threaded. Each load writes a distinct table and is a
  * pure function of the landing snapshot (cached once) plus its own dim, so
  * the nine are order-independent; we submit them concurrently from the
  * driver. Locally that overlaps the fixed per-job overhead (planning +
  * commit) that dominates at fixture scale; on a cluster it keeps executor
  * slots busy that a serial driver would idle between small dim jobs —
  * Spark's scheduler interleaves tasks of independent jobs either way.
  */
object Etl {

  // daemon pool sized to the 13 concurrent load tasks (4 entity chains ×
  // up to 3 live futures + the fact append); driver-side threads that
  // only submit jobs and block on them, so the count is not a CPU concern
  private lazy val loadPool: ExecutionContext =
    ExecutionContext.fromExecutorService(Executors.newFixedThreadPool(13, r => {
      val t = new Thread(r, "graft-etl-load")
      t.setDaemon(true)
      t
    }))

  def normalizeTransactions(lake: Lakehouse): Unit = {
    val landing = lake.read("denormalized").cache()
    try {
      // one count materializes the cache before the fan-out (isEmpty would
      // scan only one partition, leaving nine concurrent loads to contend
      // on the remaining cache-fill locks) and doubles as the empty check
      if (landing.count() == 0L) return // truncate makes rerun a no-op

      // SCD2 family (ETL.sql:86-235), fact (:121-130), SCD1 family
      // (ETL.sql:237-446) — all nine concurrently (doc comment above).
      implicit val ec: ExecutionContext = loadPool
      // Per-entity PIPELINE, no cross-entity barrier (guide §2.6 /
      // pipeline-over-barrier): each entity's grain ([[Scd2.grain]] —
      // the aggregate BOTH families' stagings start from) is cached and
      // count()-materialized (two families racing an unfilled cache
      // would contend on the cache-fill lock, same reason as the
      // landing count above), then THAT entity's two family loads run
      // — while other entities are still on their grain. The previous
      // shape barriered ALL grains before ANY load, so every load
      // waited on the slowest grain (measured ~0.2-0.4 s of idle per
      // day). flatMap chains, not nested Awaits: no pool thread is
      // held across a dependency, so the pool can never deadlock.
      val chains = Entities.all.map { spec =>
        Future { val g = Scd2.grain(landing, spec).cache(); g.count(); g }
          .flatMap { g =>
            Future(Scd2.applyFromGrain(lake, g, spec))
              .zip(Future(Scd1.applyFromGrain(lake, g, spec)))
              .andThen { case _ => g.unpersist() }
              .map(_ => ())
          }
      } :+ Future(loadFact(lake, landing)).map(_ => ())
      Await.result(Future.sequence(chains), Duration.Inf)

      // TRUNCATE landing (ETL.sql:447) — only after every load committed.
      lake.truncate("denormalized")
    } finally landing.unpersist()
  }

  /** Fact load (ETL.sql:121-130): straight projection, day-partitioned so
    * the mart's lookback predicate prunes partitions.
    */
  private def loadFact(lake: Lakehouse, landing: org.apache.spark.sql.DataFrame): Unit =
    lake.appendPartitionedByDay("fact_transactions",
      landing.select(
        col("trans_id"), col("trans_date"), col("card_num"),
        col("oper_type"), col("amount").as("amt"), col("oper_result"),
        col("terminal")),
      tsCol = "trans_date")
}

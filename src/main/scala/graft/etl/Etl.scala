package graft.etl

import graft.storage.Lakehouse
import org.apache.spark.sql.functions._

/** `fn_normalize_transactions()` (ETL.sql:1-450) as Spark orchestration.
  *
  * Stage order follows the reference exactly: SCD2 terminals → fact load →
  * SCD2 accounts → cards → clients → SCD1 all four → truncate landing.
  * (The SCD2 stagings are all derived before any apply in the reference —
  * irrelevant here because each staging is a pure function of the landing
  * DataFrame, which we cache once.)
  */
object Etl {

  def normalizeTransactions(lake: Lakehouse): Unit = {
    val landing = lake.read("denormalized").cache()
    try {
      if (landing.isEmpty) return // truncate semantics make rerun a no-op

      // SCD2 family (ETL.sql:86-235), fact interleaved after terminals
      // (:121-130) as in the reference.
      Scd2(lake, landing, Entities.terminals)
      loadFact(lake, landing)
      Scd2(lake, landing, Entities.accounts)
      Scd2(lake, landing, Entities.cards)
      Scd2(lake, landing, Entities.clients)

      // SCD1 family (ETL.sql:237-446).
      Entities.all.foreach(spec => Scd1(lake, landing, spec))

      // TRUNCATE landing (ETL.sql:447).
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

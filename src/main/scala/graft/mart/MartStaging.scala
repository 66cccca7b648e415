package graft.mart

import graft.storage.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-denormalization staging for the fraud mart —
  * `stg_denormalized_data` (Data_mart.sql:115-257).
  *
  * 5-way inner equi-join of the lookback-filtered fact against the four
  * dims: SCD2 branch uses current rows (`end_dt IS NULL`), SCD1 branch the
  * plain dims. Fact filter is `trans_date >= midnight(max) − 1 h`
  * (the extra hour feeds F3's lag).
  *
  * Scale: the cutoff is resolved to a literal first (one tiny scalar
  * action) so the day-partitioned fact scan prunes partitions — with a
  * scalar subquery the pruning couldn't happen at plan time. Dims are
  * broadcast (they're entity-cardinality, orders below the fact).
  */
object MartStaging {

  sealed trait ScdType
  case object Scd2Dims extends ScdType
  case object Scd1Dims extends ScdType

  /** Midnight of the max fact timestamp (the reference's
    * `to_timestamp(max(trans_date),'YYYY-MM-DD 00:00:00')` idiom —
    * the time template chars are literal zeros, i.e. date_trunc to day).
    */
  def maxDayMidnight(fact: DataFrame): java.sql.Timestamp =
    fact.agg(date_trunc("DAY", max(col("trans_date"))))
      .head().getTimestamp(0)

  def build(lake: Lakehouse, scdType: ScdType): DataFrame = {
    val (terminals, cards, accounts, clients) = scdType match {
      case Scd2Dims =>
        (lake.read("dim_terminals_hist").filter(col("end_dt").isNull),
          lake.read("dim_cards_hist").filter(col("end_dt").isNull),
          lake.read("dim_accounts_hist").filter(col("end_dt").isNull),
          lake.read("dim_clients_hist").filter(col("end_dt").isNull))
      case Scd1Dims =>
        (lake.read("dim_terminals"), lake.read("dim_cards"),
          lake.read("dim_accounts"), lake.read("dim_clients"))
    }
    val fact = lake.readWithPartitionColumns("fact_transactions")
    // metadata-only when provable (append-only day-partitioned layout:
    // the max partition dir IS midnight of max(trans_date) — see
    // [[Lakehouse.maxPartitionDay]]); the scan is the fallback, not the
    // norm — at 100 TB the scan reads all history to find one scalar
    val cutoff = lake.maxPartitionDay("fact_transactions")
      .getOrElse(maxDayMidnight(fact))
    // redundant day-grain predicate on the physical partition column: the
    // trans_date filter alone is only a row-group filter; this one prunes
    // whole day partitions (at 100 TB, the difference between scanning
    // 2 days and scanning all history)
    // (computed in-plan with the session TZ and constant-folded, so it
    // still reaches the scan as a literal partition predicate)
    val cutoffDay = to_date(lit(cutoff) - expr("INTERVAL 1 HOUR"))
    val txns = fact
      .filter(col("trans_dt_day") >= cutoffDay &&
        col("trans_date") >= lit(cutoff) - expr("INTERVAL 1 HOUR"))
      .select("trans_id", "trans_date", "card_num", "amt", "oper_result",
        "terminal")

    // dims are joined without forced broadcast hints: terminals are tiny,
    // but cards/accounts/clients scale with the customer base (at 100 TB
    // they are shuffle-join territory) — AQE broadcasts the small ones at
    // runtime from observed sizes
    val te = broadcast(terminals.select("terminal_id", "terminal_city"))
    val ca = cards.select("card_num", "account_num")
    val ac = accounts.select("account_num", "valid_to", "client")
    val cl = clients.select(
      col("client_id"),
      concat(col("last_name"), lit(" "), col("first_name"), lit(" "),
        col("patrinymic")).as("fio"),
      col("phone"), col("passport_valid_to"), col("passport_num"))

    te.join(txns, col("terminal_id") === col("terminal"))
      .join(ca, txns("card_num") === ca("card_num"))
      .join(ac, ca("account_num") === ac("account_num"))
      .join(cl, col("client_id") === ac("client"))
      .select(col("terminal_city"), col("trans_id"), col("trans_date"),
        txns("card_num"), col("amt").as("amount"), col("oper_result"),
        col("valid_to"), col("client"), col("fio"), col("phone"),
        col("passport_valid_to"), col("passport_num"))
  }
}

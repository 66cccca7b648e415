package graft.mart

import graft.model.Strings
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fraud rules F1/F2 (expired passport/contract) and F3 (city hop) —
  * Data_mart.sql:260-293. F4 lives in [[AmountGuessing]].
  */
object FraudRules {

  /** F1 ∪ F2 (Data_mart.sql:260-272): last-day transactions where
    * trans_date exceeds passport_valid_to (F1) or valid_to (F2); the CASE
    * order makes F1 win when both hold. `timestamp > date` promotes the
    * date to midnight, as in GP.
    */
  def expiredDocs(stg: DataFrame, clock: java.sql.Timestamp): DataFrame = {
    val lastDay = stg.agg(date_trunc("DAY", max(col("trans_date"))).as("_day0"))
    stg.join(broadcast(lastDay), col("trans_date") >= col("_day0"))
      .filter(col("trans_date") > col("passport_valid_to") ||
        col("trans_date") > col("valid_to"))
      .select(
        col("trans_date").as("fraud_dt"),
        col("passport_num").as("passport"),
        col("fio"), col("phone"),
        when(col("trans_date") > col("passport_valid_to"),
          Strings.FraudExpiredPassport)
          .when(col("trans_date") > col("valid_to"),
            Strings.FraudExpiredContract).as("fraud_type"),
        lit(clock).as("report_dt"))
  }

  /** F3 (Data_mart.sql:274-293): per client ordered by trans_date, a city
    * different from the previous transaction's city with interval hour
    * field = 0. Postgres `ts - ts` yields a justified interval (days split
    * out), so `date_part('hour', Δt) = 0` ⇔ `(Δsec / 3600) % 24 == 0` —
    * Δt < 1 h, but also 24 h ≤ Δt < 25 h etc. (SURVEY.md §2.8 trap).
    * Replicated exactly. Runs over the whole staging window (last day
    * + 1 h), like the reference — no last-day filter here.
    */
  def cityHop(stg: DataFrame, clock: java.sql.Timestamp): DataFrame = {
    val w = Window.partitionBy(col("client")).orderBy(col("trans_date"))
    stg.select(
      col("trans_date").as("fraud_dt"),
      col("passport_num").as("passport"),
      col("fio"), col("phone"),
      col("terminal_city"),
      lag(col("terminal_city"), 1).over(w).as("prev_city"),
      (col("trans_date").cast("long") -
        lag(col("trans_date"), 1).over(w).cast("long")).as("sec_delta"))
      .filter(col("terminal_city") =!= col("prev_city") &&
        expr("(sec_delta div 3600) % 24 = 0"))
      .select(col("fraud_dt"), col("passport"), col("fio"), col("phone"),
        lit(Strings.FraudCityHop).as("fraud_type"),
        lit(clock).as("report_dt"))
  }
}

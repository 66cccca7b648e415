package graft.mart

import graft.model.Strings
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F4 — the amount-guessing detector (`fn_find_summ_frauds`,
  * Data_mart.sql:1-106).
  *
  * The reference pulls all candidate rows to the GP master and runs a
  * single-threaded cursor; the state machine is nevertheless per-client
  * independent (both cross-client entry paths reset the state — SURVEY.md
  * §2.10), so the Spark form is a typed
  * `groupByKey(client).flatMapSortedGroups` — each client's chain scan runs
  * in parallel on executors, removing the reference's one serial bottleneck.
  *
  * Input (Data_mart.sql:19-47): staging rows with
  * `trans_date >= midnight(max) − 20 min`, per client ordered by
  * trans_date, with
  *   - amount_diff = amount − lag(amount), first row → −1 ("decreasing");
  *   - sec_diff = hour*3600+min*60+sec fields of Δt, first row → 0. On a
  *     justified Postgres interval that is `Δsec % 86400` (days field is
  *     dropped) — unreachable at >24 h inside a 20-min window, replicated
  *     exactly anyway.
  *
  * Emits the final successful operation of a chain of ≥3 consecutive
  * rejected, strictly-decreasing-amount operations accumulating <1200 s.
  */
object AmountGuessing {

  private[mart] case class Row4(
      client: String,
      fraudDt: java.sql.Timestamp,
      passport: String,
      fio: String,
      phone: String,
      operResult: String,
      amountDiff: java.math.BigDecimal,
      secDiff: Long)

  private[mart] case class Hit(
      fraud_dt: java.sql.Timestamp,
      passport: String,
      fio: String,
      phone: String,
      fraud_type: String,
      report_dt: java.sql.Timestamp)

  /** The cursor-loop state machine (Data_mart.sql:48-99), verbatim branch
    * structure. `it` must be time-ascending rows of ONE client.
    */
  private[mart] def runChain(rows: Iterator[Row4],
      clock: java.sql.Timestamp): Iterator[Hit] = {
    var counter = 0
    var secCount = 0L
    var zeroOnPrev = false
    val out = Seq.newBuilder[Hit]
    rows.foreach { z =>
      val rejected = z.operResult == Strings.Rejected
      val success = z.operResult == Strings.Success
      if (zeroOnPrev && rejected) {
        counter = 1; zeroOnPrev = false
      } else if (zeroOnPrev && success) {
        secCount = 0; counter = 0; zeroOnPrev = true
      } else if (!zeroOnPrev) {
        secCount += z.secDiff
        // (the reference's new-client branch is unreachable here: the
        // group holds a single client and state starts zeroed)
        if (counter >= 3 && success && secCount < 1200) {
          out += Hit(z.fraudDt, z.passport, z.fio, z.phone,
            Strings.FraudAmountGuessing, clock)
          counter = 0; secCount = 0; zeroOnPrev = true
        } else if (success) {
          counter = 0; secCount = 0; zeroOnPrev = true
        } else {
          // amountDiff is never null on the reference semantics: the
          // coalesce(amount - lag(amount), -1) in detect() (mirroring
          // Data_mart.sql:30) maps EVERY null diff — first row or a NULL
          // amount mid-stream — to -1 "decreasing". The Option guard is
          // defensive only, for callers feeding runChain directly.
          val ad = Option(z.amountDiff)
          if (ad.exists(_.signum >= 0) || secCount >= 1200) {
            counter = 1; secCount = 0; zeroOnPrev = false
          } else if (ad.exists(_.signum < 0) && secCount < 1200 && rejected) {
            counter += 1; zeroOnPrev = false
          }
        }
      }
    }
    out.result().iterator
  }

  /** Window prep + distributed chain scan. */
  def detect(stg: DataFrame, clock: java.sql.Timestamp): DataFrame = {
    val spark = stg.sparkSession
    import spark.implicits._

    val cutoff = stg.agg(
      (date_trunc("DAY", max(col("trans_date"))) -
        expr("INTERVAL 20 MINUTES")).as("_cut"))
    val w = Window.partitionBy(col("client")).orderBy(col("trans_date"))
    val prepared = stg
      .join(broadcast(cutoff), col("trans_date") >= col("_cut"))
      .select(
        col("client"),
        col("trans_date").as("fraudDt"),
        col("passport_num").as("passport"),
        col("fio"), col("phone"),
        col("oper_result").as("operResult"),
        coalesce(col("amount") - lag(col("amount"), 1).over(w), lit(-1))
          .cast("decimal(19,2)").as("amountDiff"),
        coalesce(
          pmod(col("trans_date").cast("long") -
            lag(col("trans_date"), 1).over(w).cast("long"), lit(86400L)),
          lit(0L)).as("secDiff"))

    prepared.as[Row4]
      .groupByKey(_.client)
      // cursor order is (client, fraud_dt); the shuffle's sort delivers it,
      // so each group streams through runChain without materializing — a
      // pathological client no longer has to fit in one task's heap
      .flatMapSortedGroups($"fraudDt")((_, it) => runChain(it, clock))
      .toDF()
  }
}

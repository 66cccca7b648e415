package graft.model

import org.apache.spark.sql.types._

/** Table schemas + string constants for the bank-card DWH.
  *
  * Mirrors /root/reference/sql_scripts/DDL.sql (11 tables): all columns
  * nullable (the reference declares no constraints), text→StringType,
  * timestamp→TimestampType, date→DateType, numeric→DecimalType(18,2)
  * (input amounts have ≤2 decimals; see SURVEY.md §1.2).
  */
object Schemas {
  private def s(n: String) = StructField(n, StringType)
  private def ts(n: String) = StructField(n, TimestampType)
  private def dt(n: String) = StructField(n, DateType)
  private def num(n: String) = StructField(n, DecimalType(18, 2))

  /** Landing ("garbage") table — DDL.sql:15-40. Note the reference DB
    * misspells `patrinymic`; the name is part of the contract, keep it.
    */
  val denormalized: StructType = StructType(Seq(
    s("trans_id"), ts("trans_date"), s("card_num"), s("account"),
    dt("account_valid_to"), s("client"), s("last_name"), s("first_name"),
    s("patrinymic"), dt("date_of_birth"), s("passport"),
    dt("passport_valid_to"), s("phone"), s("oper_type"), num("amount"),
    s("oper_result"), s("terminal"), s("terminal_type"), s("city"),
    s("address")))

  /** Fact — DDL.sql:44-67, range-partitioned by day in the reference;
    * we write parquet partitioned by `trans_dt_day` (added at write time).
    */
  val factTransactions: StructType = StructType(Seq(
    s("trans_id"), ts("trans_date"), s("card_num"), s("oper_type"),
    num("amt"), s("oper_result"), s("terminal")))

  // SCD2 history dims — DDL.sql:71-110. Current row ⇔ end_dt IS NULL.
  val dimTerminalsHist: StructType = StructType(Seq(
    s("terminal_id"), s("terminal_type"), s("terminal_city"),
    s("terminal_address"), ts("start_dt"), ts("end_dt")))
  val dimCardsHist: StructType = StructType(Seq(
    s("card_num"), s("account_num"), ts("start_dt"), ts("end_dt")))
  val dimAccountsHist: StructType = StructType(Seq(
    s("account_num"), dt("valid_to"), s("client"), ts("start_dt"),
    ts("end_dt")))
  val dimClientsHist: StructType = StructType(Seq(
    s("client_id"), s("last_name"), s("first_name"), s("patrinymic"),
    dt("date_of_birth"), s("passport_num"), dt("passport_valid_to"),
    s("phone"), ts("start_dt"), ts("end_dt")))

  // SCD1 dims — DDL.sql:113-152. update_dt NULL until first change.
  val dimTerminals: StructType = StructType(Seq(
    s("terminal_id"), s("terminal_type"), s("terminal_city"),
    s("terminal_address"), ts("create_dt"), ts("update_dt")))
  val dimCards: StructType = StructType(Seq(
    s("card_num"), s("account_num"), ts("create_dt"), ts("update_dt")))
  val dimAccounts: StructType = StructType(Seq(
    s("account_num"), dt("valid_to"), s("client"), ts("create_dt"),
    ts("update_dt")))
  val dimClients: StructType = StructType(Seq(
    s("client_id"), s("last_name"), s("first_name"), s("patrinymic"),
    dt("date_of_birth"), s("passport_num"), dt("passport_valid_to"),
    s("phone"), ts("create_dt"), ts("update_dt")))

  /** Cumulative fraud log — DDL.sql:155-161. */
  val report: StructType = StructType(Seq(
    ts("fraud_dt"), s("passport"), s("fio"), s("phone"), s("fraud_type"),
    ts("report_dt")))

  /** name → schema, for Lakehouse empty-table reads. */
  val byName: Map[String, StructType] = Map(
    "denormalized" -> denormalized,
    "fact_transactions" -> factTransactions,
    "dim_terminals_hist" -> dimTerminalsHist,
    "dim_cards_hist" -> dimCardsHist,
    "dim_accounts_hist" -> dimAccountsHist,
    "dim_clients_hist" -> dimClientsHist,
    "dim_terminals" -> dimTerminals,
    "dim_cards" -> dimCards,
    "dim_accounts" -> dimAccounts,
    "dim_clients" -> dimClients,
    "report" -> report)
}

/** Exact UTF-8 string constants (Data_mart.sql / README.md) — operation
  * results and the four fraud-type labels. Byte-exact parity matters for
  * golden tests.
  */
object Strings {
  val Rejected = "Отказ"
  val Success = "Успешно"
  val FraudExpiredPassport = "Совершение операции при просроченном паспорте"
  val FraudExpiredContract = "Совершение операции при недействующем договоре"
  val FraudCityHop = "Совершение операции в разных городах в течение 1 часа"
  val FraudAmountGuessing = "Попытка подбора сумм"
}

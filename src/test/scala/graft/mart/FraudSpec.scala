package graft.mart

import graft.SparkSpec
import graft.model.Strings
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** F1/F2/F3 edge cases (FIXTURES.md §C 5-6) over a hand-built staging. */
class FraudSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val stgSchema = StructType(Seq(
    StructField("terminal_city", StringType),
    StructField("trans_id", StringType),
    StructField("trans_date", TimestampType),
    StructField("card_num", StringType),
    StructField("amount", DecimalType(18, 2)),
    StructField("oper_result", StringType),
    StructField("valid_to", DateType),
    StructField("client", StringType),
    StructField("fio", StringType),
    StructField("phone", StringType),
    StructField("passport_valid_to", DateType),
    StructField("passport_num", StringType)))

  private val clock = ts("2020-05-09 12:00:00")

  private def stg(rows: Row*): DataFrame =
    spark.createDataFrame(rows.asJava, stgSchema)

  private def row(city: String, t: String, client: String, amount: String,
      result: String, validTo: String, passportTo: String): Row =
    Row(city, s"tx-$t", ts(t), "card", dec(amount), result,
      d(validTo), client, "F I O", "+7", d(passportTo), "pass")

  test("F1/F2: precedence, strict >, last-day filter") {
    val out = FraudRules.expiredDocs(stg(
      // both expired → F1 (passport) wins
      row("A", "2020-05-02 10:00:00", "c1", "10", Strings.Success,
        "2020-05-01", "2020-05-01"),
      // only contract expired → F2
      row("A", "2020-05-02 10:30:00", "c2", "10", Strings.Success,
        "2020-05-01", "2040-01-01"),
      // boundary: trans_date == midnight of valid_to day → date promotes to
      // midnight, 10:00 > 00:00 → F2 hit
      row("A", "2020-05-02 10:00:00", "c3", "10", Strings.Success,
        "2020-05-02", "2040-01-01"),
      // valid_to tomorrow → clean
      row("A", "2020-05-02 11:00:00", "c4", "10", Strings.Success,
        "2020-05-03", "2040-01-01"),
      // expired but previous day (staging carries last hour of prev day) →
      // filtered by the last-day filter
      row("A", "2020-05-01 23:30:00", "c5", "10", Strings.Success,
        "2020-04-01", "2040-01-01")),
      clock)
    val types = out.collect().map(_.getString(4)).sorted
    assert(types.toSeq === Seq(Strings.FraudExpiredContract,
      Strings.FraudExpiredContract, Strings.FraudExpiredPassport))
    assert(out.collect().forall(_.getTimestamp(5) == clock))
  }

  test("F3: different city within the hour hits; 1h exact, same city, first txn miss") {
    val out = FraudRules.cityHop(stg(
      row("A", "2020-05-02 10:00:00", "c1", "10", Strings.Success, "2040-01-01", "2040-01-01"),
      row("B", "2020-05-02 10:30:00", "c1", "10", Strings.Success, "2040-01-01", "2040-01-01"), // hit: 30min, A→B
      row("B", "2020-05-02 11:30:00", "c1", "10", Strings.Success, "2040-01-01", "2040-01-01"), // same city → miss
      row("C", "2020-05-02 12:30:00", "c1", "10", Strings.Success, "2040-01-01", "2040-01-01"), // exactly 3600s → hour field 1 → miss
      row("X", "2020-05-02 10:15:00", "c2", "10", Strings.Success, "2040-01-01", "2040-01-01")  // first txn of c2 → miss
    ), clock)
    val got = out.collect().map(_.getTimestamp(0).toString).sorted
    assert(got.toSeq === Seq("2020-05-02 10:30:00.0"))
  }

  test("F3 interval-hour-field quirk: 24h10m gap matches (hour field = 0)") {
    val out = FraudRules.cityHop(stg(
      row("A", "2020-05-01 10:00:00", "c1", "10", Strings.Success, "2040-01-01", "2040-01-01"),
      row("B", "2020-05-02 10:10:00", "c1", "10", Strings.Success, "2040-01-01", "2040-01-01")
    ), clock)
    // Postgres: Δ = '1 day 00:10' → date_part('hour') = 0 → fraud
    assert(out.count() === 1)
  }
}

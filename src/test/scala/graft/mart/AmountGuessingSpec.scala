package graft.mart

import graft.SparkSpec
import graft.model.Strings

/** F4 transition-table tests (SURVEY.md §2.10) on [[AmountGuessing.runChain]]
  * directly, plus a randomized differential oracle.
  */
class AmountGuessingSpec extends SparkSpec {

  private val clock = ts("2020-05-09 12:00:00")

  /** (operResult, amountDiff, secDiff) triples → Row4s of one client. */
  private def rows(triples: (String, String, Long)*): Seq[AmountGuessing.Row4] =
    triples.zipWithIndex.map { case ((res, diff, sec), i) =>
      AmountGuessing.Row4("c1", ts(f"2020-05-02 10:${i}%02d:00"), "pass",
        "fio", "+7", res, new java.math.BigDecimal(diff), sec)
    }

  private def run(triples: (String, String, Long)*): Seq[String] =
    AmountGuessing.runChain(rows(triples: _*).iterator, clock)
      .map(_.fraud_dt.toString).toSeq

  private val R = Strings.Rejected
  private val S = Strings.Success

  test("minimal hit: 3 rejected decreasing + success within budget emits the success row") {
    // first row default diff=-1 counts as decreasing (Data_mart.sql:30)
    assert(run((R, "-1", 0), (R, "-5", 100), (R, "-3", 100), (S, "-2", 100))
      === Seq("2020-05-02 10:03:00.0"))
  }

  test("success after only 2 rejections: no emit") {
    assert(run((R, "-1", 0), (R, "-5", 100), (S, "-2", 100)) === Seq.empty)
  }

  test("non-decreasing amount restarts the chain") {
    // 3rd rejected has diff >= 0 → counter restarts at 1 → success sees counter 1
    assert(run((R, "-1", 0), (R, "-5", 100), (R, "2", 100), (S, "-2", 100))
      === Seq.empty)
  }

  test("sec budget: accumulated 1200s exactly is excluded (< 1200 strict)") {
    assert(run((R, "-1", 0), (R, "-5", 400), (R, "-3", 400), (S, "-2", 400))
      === Seq.empty)
    assert(run((R, "-1", 0), (R, "-5", 400), (R, "-3", 400), (S, "-2", 399))
      === Seq("2020-05-02 10:03:00.0"))
  }

  test("sec_count >= 1200 on a rejected row restarts the chain with fresh budget") {
    // budget blown mid-chain, then a fresh fast chain → emits
    assert(run((R, "-1", 0), (R, "-5", 1300), (R, "-4", 10), (R, "-3", 10),
      (R, "-2", 10), (S, "-1", 10)) === Seq("2020-05-02 10:05:00.0"))
  }

  test("success resets and the next rejected row starts a new chain (zero_on_prev path)") {
    assert(run((S, "-1", 0), (R, "-5", 10), (R, "-4", 10), (R, "-3", 10),
      (S, "-2", 10)) === Seq("2020-05-02 10:04:00.0"))
  }

  test("two back-to-back frauds in one stream") {
    assert(run(
      (R, "-1", 0), (R, "-5", 10), (R, "-3", 10), (S, "-2", 10),
      (R, "-9", 10), (R, "-5", 10), (R, "-3", 10), (S, "-2", 10))
      === Seq("2020-05-02 10:03:00.0", "2020-05-02 10:07:00.0"))
  }

  test("chain longer than 3 rejections still emits on the success") {
    assert(run((R, "-1", 0), (R, "-5", 10), (R, "-3", 10), (R, "-2", 10),
      (R, "-1", 10), (S, "-1", 10)) === Seq("2020-05-02 10:05:00.0"))
  }

  /** Brute-force oracle: an emit at row i (success) requires the maximal run
    * of consecutive rejected rows immediately before i — truncated at the
    * last success/restart — to satisfy the machine. Simpler equivalent
    * oracle: simulate the plpgsql loop literally (independent re-impl).
    */
  private def literalLoop(rs: Seq[AmountGuessing.Row4]): Seq[String] = {
    var counter = 0; var sec = 0L; var zero = false
    val out = Seq.newBuilder[String]
    rs.foreach { z =>
      val rej = z.operResult == R
      if (zero && rej) { counter = 1; zero = false }
      else if (zero && !rej) { sec = 0; counter = 0; zero = true }
      else if (!zero) {
        sec += z.secDiff
        if (counter >= 3 && !rej && sec < 1200) {
          out += z.fraudDt.toString; counter = 0; sec = 0; zero = true
        } else if (!rej) { counter = 0; sec = 0; zero = true }
        else if (z.amountDiff.signum >= 0 || sec >= 1200) { counter = 1; sec = 0; zero = false }
        else { counter += 1; zero = false }
      }
    }
    out.result()
  }

  test("property: runChain matches an independent literal simulation on 500 random streams") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val triples = Seq.fill(40)((
        if (rnd.nextBoolean()) R else S,
        (rnd.nextInt(21) - 10).toString,
        if (rnd.nextBoolean()) rnd.nextInt(101).toLong else 900L + rnd.nextInt(600)))
      val rs = rows(triples: _*)
      assert(AmountGuessing.runChain(rs.iterator, clock).map(_.fraud_dt.toString).toSeq
        === literalLoop(rs))
    }
  }

  test("detect: end-to-end DataFrame path computes diffs/windows and emits") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("terminal_city", StringType), StructField("trans_id", StringType),
      StructField("trans_date", TimestampType), StructField("card_num", StringType),
      StructField("amount", DecimalType(18, 2)), StructField("oper_result", StringType),
      StructField("valid_to", DateType), StructField("client", StringType),
      StructField("fio", StringType), StructField("phone", StringType),
      StructField("passport_valid_to", DateType), StructField("passport_num", StringType)))
    def r(t: String, client: String, amt: String, res: String) =
      Row("A", s"tx-$t-$client", ts(t), "card", dec(amt), res,
        d("2040-01-01"), client, "F I O", "+7", d("2040-01-01"), "pass")
    // c1: 100→90→80 rejected then 85?? — strictly decreasing then success
    val stg = spark.createDataFrame(Seq(
      r("2020-05-02 10:00:00", "c1", "100.00", R),
      r("2020-05-02 10:02:00", "c1", "90.00", R),
      r("2020-05-02 10:04:00", "c1", "80.00", R),
      r("2020-05-02 10:06:00", "c1", "70.00", S), // emit
      r("2020-05-02 10:00:00", "c2", "50.00", R),
      r("2020-05-02 10:01:00", "c2", "60.00", R), // increasing → restart
      r("2020-05-02 10:02:00", "c2", "55.00", R),
      r("2020-05-02 10:03:00", "c2", "50.00", S), // counter=2 only → no emit
      // before the 20-min cutoff (midnight of max − 20 min): filtered out
      r("2020-05-01 23:00:00", "c3", "10.00", R)).asJava, schema)
    val out = AmountGuessing.detect(stg, clock).collect()
    assert(out.map(_.getTimestamp(0).toString).toSeq === Seq("2020-05-02 10:06:00.0"))
    assert(out.head.getString(4) === Strings.FraudAmountGuessing)
  }
}

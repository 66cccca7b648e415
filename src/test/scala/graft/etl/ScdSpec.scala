package graft.etl

import graft.SparkSpec
import graft.model.Schemas
import graft.storage.Lakehouse
import org.apache.spark.sql.{DataFrame, Row}

/** Micro-fixture unit tests for the SCD2/SCD1 merges (FIXTURES.md §C 1-4). */
class ScdSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  /** Landing rows with only the terminal-relevant columns populated. */
  private def landing(rows: (String, String, String, String, String)*): DataFrame = {
    val data = rows.map { case (tid, typ, city, addr, t) =>
      Row(tid + "-tx", ts(t), null, null, null, null, null, null, null, null,
        null, null, null, null, null, null, tid, typ, city, addr)
    }
    spark.createDataFrame(data.asJava, Schemas.denormalized)
  }

  private def lake() = new Lakehouse(spark, tmpDir("scd"))

  test("scd2: first load opens one row per combo, chained intra-batch versions") {
    val lk = lake()
    val day1 = landing(
      ("T1", "POS", "CityA", "Addr1", "2020-05-01 10:00:00"),
      ("T1", "POS", "CityB", "Addr1", "2020-05-01 12:00:00"), // intra-batch change
      ("T2", "ATM", "CityC", "Addr2", "2020-05-01 11:00:00"))
    Scd2(lk, day1, Entities.terminals)
    val dim = lk.read("dim_terminals_hist").collect()
      .map(r => (r.getString(0), r.getString(2), Option(r.getTimestamp(4)).map(_.toString),
        Option(r.getTimestamp(5)).map(_.toString))).toSet
    assert(dim === Set(
      ("T1", "CityA", Some("2020-05-01 10:00:00.0"), Some("2020-05-01 12:00:00.0")),
      ("T1", "CityB", Some("2020-05-01 12:00:00.0"), None),
      ("T2", "CityC", Some("2020-05-01 11:00:00.0"), None)))
  }

  test("scd2: day-2 change closes the open row; unchanged combo untouched") {
    val lk = lake()
    Scd2(lk, landing(("T1", "POS", "CityA", "A", "2020-05-01 10:00:00"),
      ("T2", "ATM", "CityC", "B", "2020-05-01 10:00:00")), Entities.terminals)
    Scd2(lk, landing(("T1", "POS", "CityX", "A", "2020-05-02 09:00:00"),
      ("T2", "ATM", "CityC", "B", "2020-05-02 09:30:00")), Entities.terminals)
    val dim = lk.read("dim_terminals_hist").collect()
      .map(r => (r.getString(0), r.getString(2),
        Option(r.getTimestamp(5)).map(_.toString))).toSet
    assert(dim === Set(
      ("T1", "CityA", Some("2020-05-02 09:00:00.0")), // closed by new version
      ("T1", "CityX", None),
      ("T2", "CityC", None))) // unchanged combo: anti-join filtered, stays open
  }

  test("scd2 quirk: re-appearing combo (A→B→A) is dropped, history stays stale") {
    val lk = lake()
    Scd2(lk, landing(("T1", "POS", "CityA", "A", "2020-05-01 10:00:00")), Entities.terminals)
    Scd2(lk, landing(("T1", "POS", "CityB", "A", "2020-05-02 10:00:00")), Entities.terminals)
    Scd2(lk, landing(("T1", "POS", "CityA", "A", "2020-05-03 10:00:00")), Entities.terminals)
    val dim = lk.read("dim_terminals_hist").collect()
      .map(r => (r.getString(2), Option(r.getTimestamp(5)).map(_.toString))).toSet
    // returning CityA is NOT EXISTS-filtered: no new row, CityB stays open
    assert(dim === Set(
      ("CityA", Some("2020-05-02 10:00:00.0")),
      ("CityB", None)))
  }

  test("scd1: latest combo wins; create_dt=min, update_dt=max or null") {
    val lk = lake()
    Scd1(lk, landing(
      ("T1", "POS", "CityA", "A", "2020-05-01 10:00:00"),
      ("T1", "POS", "CityB", "A", "2020-05-01 12:00:00"),
      ("T2", "ATM", "CityC", "B", "2020-05-01 11:00:00")), Entities.terminals)
    val dim = lk.read("dim_terminals").collect()
      .map(r => (r.getString(0), r.getString(2), r.getTimestamp(4).toString,
        Option(r.getTimestamp(5)).map(_.toString))).toSet
    assert(dim === Set(
      ("T1", "CityB", "2020-05-01 10:00:00.0", Some("2020-05-01 12:00:00.0")),
      ("T2", "CityC", "2020-05-01 11:00:00.0", None)))
  }

  test("scd1: day-2 change overwrites in place; update_dt from staging") {
    val lk = lake()
    Scd1(lk, landing(("T1", "POS", "CityA", "A", "2020-05-01 10:00:00")), Entities.terminals)
    Scd1(lk, landing(("T1", "POS", "CityX", "A", "2020-05-02 09:00:00")), Entities.terminals)
    val dim = lk.read("dim_terminals").collect()
      .map(r => (r.getString(0), r.getString(2), r.getTimestamp(4).toString,
        Option(r.getTimestamp(5)).map(_.toString))).toSet
    // update_dt = coalesce(stg.update_dt=null single version, stg.create_dt)
    assert(dim === Set(
      ("T1", "CityX", "2020-05-01 10:00:00.0", Some("2020-05-02 09:00:00.0"))))
  }

  test("scd1 quirk: terminal_type-only change is silently dropped") {
    val lk = lake()
    Scd1(lk, landing(("T1", "POS", "CityA", "A", "2020-05-01 10:00:00")), Entities.terminals)
    Scd1(lk, landing(("T1", "ATM", "CityA", "A", "2020-05-02 09:00:00")), Entities.terminals)
    val dim = lk.read("dim_terminals").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getTimestamp(5)).map(_.toString))).toSet
    // type not in the change predicate nor the SET list (ETL.sql:356-362)
    assert(dim === Set(("T1", "POS", None)))
  }

  test("scd1 quirk: non-terminal staging keeps duplicate rows per key on first insert") {
    val lk = lake()
    // same card with two accounts in one batch → 2 identical-window rows
    val rows = Seq(
      Row("x1", ts("2020-05-01 10:00:00"), "C1", "ACC1", null, null, null, null,
        null, null, null, null, null, null, null, null, null, null, null, null),
      Row("x2", ts("2020-05-01 11:00:00"), "C1", "ACC2", null, null, null, null,
        null, null, null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(rows.asJava, Schemas.denormalized)
    Scd1(lk, df, Entities.cards)
    val dim = lk.read("dim_cards").collect()
    assert(dim.length === 2) // duplicate insert preserved (no DISTINCT)
    assert(dim.map(_.getString(1)).toSet === Set("ACC2")) // last_value wins in both
  }

  test("shared grain: both families' stagings run on ONE exchange") {
    // The key is an attr, so the grain's key-hash repartition satisfies
    // the grouping distribution AND every downstream key-partitioned
    // window — per entity per batch the whole staging chain pays one
    // shuffle where the independent stagings paid four. Pinned here so
    // a plan change that silently reintroduces the window repartition
    // fails a spec, not a bench ratio.
    val day = landing(
      ("T1", "POS", "CityA", "Addr1", "2020-05-01 10:00:00"),
      ("T1", "POS", "CityB", "Addr1", "2020-05-01 12:00:00"),
      ("T2", "ATM", "CityC", "Addr2", "2020-05-01 11:00:00"))
    Seq(Scd2.staging(day, Entities.terminals),
      Scd1.staging(day, Entities.terminals)).foreach { stg =>
      // AQE hides the tree from `collect`; count on explain text as in
      // PlanSpec
      val p = stg.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert("Exchange".r.findAllMatchIn(p).length === 1,
        s"expected exactly one shuffle in the staging chain:\n$p")
    }
  }
}

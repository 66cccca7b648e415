package graft.mart

import graft.storage.Lakehouse
import org.apache.spark.sql.DataFrame

/** `fn_add_report_data(scd_type)` (Data_mart.sql:109-299): build the
  * re-denormalized staging, run F1+F2, F3, then F4, append everything to
  * the cumulative `report` (non-idempotent by design — rerunning a day
  * duplicates rows, as in the reference).
  *
  * `clock` replaces `current_timestamp` for deterministic goldens (F8s);
  * the reference renders report_dt at second precision, so callers pass a
  * seconds-truncated timestamp (see [[Mart.now]]).
  */
object Mart {

  def now(): java.sql.Timestamp =
    new java.sql.Timestamp(System.currentTimeMillis() / 1000 * 1000)

  def addReportData(lake: Lakehouse, scdType: MartStaging.ScdType,
      clock: java.sql.Timestamp = now(),
      idempotent: Boolean = false): DataFrame = {
    val stg = MartStaging.build(lake, scdType).cache()
    try {
      val rows = FraudRules.expiredDocs(stg, clock)
        .unionByName(FraudRules.cityHop(stg, clock))
        .unionByName(AmountGuessing.detect(stg, clock))
      // default = faithful reference behavior (rerun duplicates rows);
      // idempotent mode anti-joins on the fraud identity (all columns
      // except the stamping clock) — the "fixed" extension SURVEY §7.5.3
      val toInsert =
        if (!idempotent) rows
        else {
          // null-safe (<=>) equality: a NULL identity column (e.g. fio when
          // patrinymic is NULL — concat is null-propagating by design) must
          // still match its already-inserted copy, or "idempotent" reruns
          // would re-append exactly those rows forever
          val existing = lake.read("report")
          val keys = Seq("fraud_dt", "passport", "fio", "phone", "fraud_type")
          val cond = keys.map(k => rows(k) <=> existing(k)).reduce(_ && _)
          rows.join(existing, cond, "left_anti")
        }
      // rebalance: the rules union ends map-side (no final exchange), so
      // the append would inherit one near-empty file per upstream task;
      // AQE sizes the output instead (see Scd2.applyFromGrain note)
      lake.append("report", toInsert.hint("rebalance"))
      lake.read("report")
    } finally stg.unpersist()
  }
}

package graft.ingest

import graft.model.Schemas
import graft.storage.Lakehouse
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Daily feed loader — the Spark form of
  * /root/reference/python_scripts/insert_from_excel.py.
  *
  * The reference's daily files are cumulative; the loader keeps only rows
  * whose date equals the file's max date (insert_from_excel.py:27), casts
  * the typed columns (:7-14, :24-25), and appends into the landing table.
  * Fixtures are pre-converted parquet (tools/xlsx_to_parquet.py) since no
  * xlsx reader ships with Spark; `loadDay` accepts any source DataFrame
  * with the sheet's 20 columns, so a real deployment can plug in csv/jdbc.
  */
object Ingest {

  /** Cast source columns to the landing schema (S2/S3). */
  def conform(src: DataFrame): DataFrame = {
    val casts: Seq[Column] = Schemas.denormalized.fields.toIndexedSeq.map { f =>
      col(f.name).cast(f.dataType).as(f.name)
    }
    src.select(casts: _*)
  }

  /** Keep only the last day present in the feed (S4) — the scalar max is a
    * 1-row broadcast join, the filter itself runs distributed.
    */
  def lastDayOnly(df: DataFrame): DataFrame = {
    val maxDay = df.agg(to_date(max(col("trans_date"))).as("max_day"))
    df.join(broadcast(maxDay), to_date(col("trans_date")) === col("max_day"))
      .drop("max_day")
  }

  /** Full daily load: conform → last-day filter → append to landing.
    * ONE action (the append write) — the replay loop never used the
    * row count, so the old cache + count() pair was a pure extra job
    * per day; throughput harnesses that want the count use
    * [[loadDayCounted]].
    */
  def loadDay(lake: Lakehouse, src: DataFrame): Unit =
    lake.append("denormalized", lastDayOnly(conform(src)))

  /** [[loadDay]] + the loaded-row count (StressPipeline's throughput
    * denominator); cached so the feed is read and filtered once.
    */
  def loadDayCounted(lake: Lakehouse, src: DataFrame): Long = {
    val day = lastDayOnly(conform(src)).cache()
    try {
      lake.append("denormalized", day)
      day.count()
    } finally day.unpersist()
  }

  def loadDayFromParquet(lake: Lakehouse, path: String): Unit =
    loadDay(lake, lake.spark.read.parquet(path))

  /** End-to-end from the reference's raw xlsx feed (S1) — no out-of-band
    * conversion step; see [[Xlsx]].
    */
  def loadDayFromXlsx(lake: Lakehouse, path: String): Unit =
    loadDay(lake, Xlsx.read(lake.spark, path))
}

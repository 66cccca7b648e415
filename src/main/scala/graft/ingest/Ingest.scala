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

  def loadDayFromParquet(lake: Lakehouse, path: String): Unit = {
    val src = lake.spark.read.parquet(path)
    // footer-stats fast path: the feed's last day IS max(trans_date),
    // which the parquet footers already record — a driver-side footer
    // read (one per feed file) replaces [[lastDayOnly]]'s scalar
    // max-scan job + broadcast build. At 100 TB the scan reads the
    // whole feed to find one scalar; the footers are metadata. Decode
    // trust and type mapping are [[FooterStats]]'s (the zone-map
    // decoder): any absent/untrusted statistic falls back to the scan.
    footerMaxTransDate(lake, path) match {
      case Some(maxTs) =>
        lake.append("denormalized", conform(src).filter(
          to_date(col("trans_date")) === to_date(lit(maxTs))))
      case None => loadDay(lake, src)
    }
  }

  /** max(trans_date) across the feed's parquet footers, in the same
    * external form the scan-based aggregate yields — None when any
    * footer lacks a trustworthy statistic (caller scans instead).
    */
  private def footerMaxTransDate(lake: Lakehouse,
      path: String): Option[java.sql.Timestamp] = {
    import org.apache.hadoop.fs.Path
    try {
      val conf = lake.spark.sparkContext.hadoopConfiguration
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).toSeq.map(_.getPath)
            .filter(f => f.getName.endsWith(".parquet") &&
              !f.getName.startsWith("_") && !f.getName.startsWith("."))
        else Seq(p)
      graft.storage.FooterStats.collect(fs, conf, files, Seq("trans_date"))
        .flatMap { case (stats, types) =>
          types.head._2 match {
            case org.apache.spark.sql.types.TimestampType =>
              val maxes = stats.map(_.cols("trans_date")._2)
              if (maxes.exists(_ == null)) None
              else maxes.map(_.asInstanceOf[java.sql.Timestamp])
                .reduceOption((a, b) => if (a.compareTo(b) >= 0) a else b)
            case _ => None
          }
        }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** End-to-end from the reference's raw xlsx feed (S1) — no out-of-band
    * conversion step; see [[Xlsx]].
    */
  def loadDayFromXlsx(lake: Lakehouse, path: String): Unit =
    loadDay(lake, Xlsx.read(lake.spark, path))
}

package graft.report

import graft.storage.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The plot_report.py aggregation (A4): fraud counts per day pivoted by
  * type — `groupby('fraud_type')['fraud_date'].value_counts().unstack(0)`
  * (plot_report.py:16), minus the matplotlib rendering.
  */
object Summary {
  def fraudsByDay(lake: Lakehouse): DataFrame =
    lake.read("report")
      .select(to_date(col("fraud_dt")).as("fraud_date"), col("fraud_type"))
      .groupBy(col("fraud_date"))
      .pivot("fraud_type")
      .count()
      .orderBy(col("fraud_date"))
}

package graft.report

import org.apache.spark.sql.DataFrame

/** Graphical rendering of the fraud report — plot_report.py:16-20 parity.
  *
  * The reference pulls `fraud_dt, fraud_type` over pyodbc and draws a
  * grouped bar chart (`value_counts().unstack(0).plot.bar`, y ticks
  * `range(0, 20, 5)`). The engine-side equivalent renders
  * [[Summary.fraudsByDay]]'s pivoted frame to a self-contained SVG string:
  * pure Scala, no graphics dependency, byte-deterministic for a given
  * frame — so the chart itself is spec-testable.
  *
  * The `.collect()` here is the terminal render step on the REPORT
  * artifact (#days × #fraud-types cells — four types in the reference, a
  * handful of days), the same driver-sized materialization the reference's
  * `fetchall` does; nothing upstream of the pivot runs on the driver.
  */
object Plot {

  private val Palette =
    Seq("#4e79a7", "#f28e2b", "#e15759", "#76b7b4", "#59a14f", "#edc948")

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Render the pivoted fraud-count frame (first column = date, remaining
    * columns = one series per fraud type, null = no frauds that day).
    * `height` is the chart area; the legend renders in an extra band
    * BELOW it (full canvas width — the reference's fraud-type labels are
    * ~50-char Russian strings that would clip or overlap bars in a
    * corner legend).
    */
  def fraudsByDaySvg(pivot: DataFrame, width: Int = 900,
      height: Int = 600): String = {
    val cols = pivot.columns
    require(cols.length >= 2, s"need date + >=1 series, got ${cols.length}")
    val series = cols.drop(1)
    val rows = pivot.collect() // report-sized: #days rows (see scaladoc)
    val days = rows.map(r => esc(String.valueOf(r.get(0))))
    val counts: Array[Array[Long]] = rows.map(r =>
      series.indices.map(i =>
        if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)).toArray)

    val margin = 60
    val plotW = width - 2 * margin
    val plotH = height - 2 * margin
    val totalH = height + series.length * 18 + 8
    val yMax = math.max(1L, counts.flatten.foldLeft(0L)(math.max))
    // reference's yticks(range(0, 20, 5)) generalized: step = 5 while it
    // keeps the tick count sane, else a power-of-ten multiple
    val yStep = Iterator.iterate(5L)(_ * 2).find(s => yMax / s <= 8).get
    val yTop = ((yMax + yStep - 1) / yStep) * yStep

    def y(v: Long): Double = margin + plotH - v.toDouble / yTop * plotH

    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$totalH" font-family="sans-serif">"""
    sb ++= s"""<rect width="$width" height="$totalH" fill="white"/>"""
    // y grid + ticks
    var v = 0L
    while (v <= yTop) {
      val yy = y(v)
      sb ++= f"""<line x1="$margin" y1="$yy%.1f" x2="${width - margin}" y2="$yy%.1f" stroke="#dddddd"/>"""
      sb ++= f"""<text x="${margin - 8}" y="${yy + 4}%.1f" text-anchor="end" font-size="12">$v</text>"""
      v += yStep
    }
    // grouped bars
    val groupW = plotW.toDouble / math.max(1, days.length)
    val barW = groupW * 0.8 / math.max(1, series.length)
    for (di <- days.indices; si <- series.indices) {
      val c = counts(di)(si)
      if (c > 0) {
        val x = margin + di * groupW + groupW * 0.1 + si * barW
        val yy = y(c)
        val h = margin + plotH - yy
        val fill = Palette(si % Palette.length)
        sb ++= f"""<rect x="$x%.1f" y="$yy%.1f" width="$barW%.1f" height="$h%.1f" fill="$fill"><title>${days(di)} ${esc(series(si))}: $c</title></rect>"""
      }
    }
    // x labels + axis titles (reference: xlabel 'fraud date')
    for (di <- days.indices) {
      val x = margin + di * groupW + groupW / 2
      sb ++= f"""<text x="$x%.1f" y="${margin + plotH + 18}" text-anchor="middle" font-size="12">${days(di)}</text>"""
    }
    sb ++= s"""<text x="${width / 2}" y="${height - 12}" text-anchor="middle" font-size="16">fraud date</text>"""
    // legend: its own band under the chart, one row per series
    for (si <- series.indices) {
      val yy = height + 8 + si * 18
      val fill = Palette(si % Palette.length)
      sb ++= s"""<rect x="$margin" y="${yy - 10}" width="12" height="12" fill="$fill"/>"""
      sb ++= s"""<text x="${margin + 18}" y="$yy" font-size="12">${esc(series(si))}</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }
}

package graft.report

import graft.SparkSpec

/** SVG rendering of the pivoted fraud report (plot_report.py parity). */
class PlotSpec extends SparkSpec {

  private def pivot = {
    import spark.implicits._
    Seq(
      ("2020-05-01", Some(3L), None: Option[Long]),
      ("2020-05-02", Some(17L), Some(1L)),
      ("2020-05-03", None: Option[Long], Some(5L)))
      .toDF("fraud_date", "Просроченный паспорт", "A<B&C")
  }

  test("renders one bar per non-null cell, grouped by day") {
    val svg = Plot.fraudsByDaySvg(pivot)
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
    // 4 non-null counts -> 4 bars (+ 2 legend swatches + 1 background)
    assert(svg.sliding(6).count(_ == "<rect ") === 4 + 2 + 1)
    // series names appear in the legend, XML-escaped
    assert(svg.contains("Просроченный паспорт"))
    assert(svg.contains("A&lt;B&amp;C"))
    assert(!svg.contains("A<B&C"))
    // y ticks use the reference's step-5 scale: max 17 -> top tick 20
    assert(svg.contains(">20</text>"))
    assert(svg.contains("fraud date"))
  }

  test("deterministic: same frame renders byte-identical SVG") {
    assert(Plot.fraudsByDaySvg(pivot) === Plot.fraudsByDaySvg(pivot))
  }
}

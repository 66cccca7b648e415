package graft.tools

import graft.GraftSession
import graft.mart.MartStaging
import graft.report.{Plot, Summary}
import graft.storage.Lakehouse

/** End-to-end plot_report.py parity: replay the 3-day protocol, pivot the
  * fraud report ([[Summary.fraudsByDay]] = the pandas
  * `value_counts().unstack(0)` at plot_report.py:16) and render the
  * grouped bar chart to an SVG file ([[Plot.fraudsByDaySvg]] = the
  * `.plot.bar` at plot_report.py:16-20, sans matplotlib).
  *
  * Usage: runMain graft.tools.RenderReport <outSvg> [scd2|scd1]
  */
object RenderReport {
  def main(args: Array[String]): Unit = {
    val outSvg = args.headOption.getOrElse("/tmp/report.svg")
    val scd = if (args.length > 1) args(1) else "scd2"
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-render")
    val lake = new Lakehouse(spark, dir.resolve("lake").toString)
    val scdType =
      if (scd == "scd2") MartStaging.Scd2Dims else MartStaging.Scd1Dims
    graft.ReplayDump.replay(lake, scdType)
    val svg = Plot.fraudsByDaySvg(Summary.fraudsByDay(lake))
    java.nio.file.Files.write(java.nio.file.Paths.get(outSvg),
      svg.getBytes("UTF-8"))
    println(s"wrote $outSvg (${svg.length} bytes)")
    spark.stop()
  }
}

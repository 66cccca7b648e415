package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev scratch runner: prints selected SparkEntry queries at the three
  * local scale factors (tolerance-band sanity for the sketch queries).
  */
object CheckNew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q24_approx_stats", "q42_cms_heavy_hitters",
        "q45_bloom_semi_join", "q46_hll_monthly_uniques")
    for (sf <- Seq("0.001", "0.01", "0.1"); n <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, s"/root/testdata/sf$sf")
      val rows = df.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val bools = df.schema.fields.zipWithIndex.collect {
        case (f, i) if f.dataType == org.apache.spark.sql.types.BooleanType =>
          f.name -> rows.count(r => !r.isNullAt(i) && r.getBoolean(i))
      }
      println(f"[check] sf$sf $n rows=${rows.length} $secs%.2fs " +
        bools.map { case (k, v) => s"$k=$v/${rows.length}" }.mkString(" "))
    }
    spark.stop()
  }
}

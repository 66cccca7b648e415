package graft.tools

/** Dev tool: write `.explain("formatted")` for named SparkEntry queries
  * to files — the before/after plan evidence the optimization rounds
  * commit under plans/rNN/.
  *
  * Usage: runMain graft.tools.DumpPlans <outDir> <suffix> <q1,q2,...>
  *   → <outDir>/<query>_<suffix>.txt
  *
  * Queries whose DataFrame construction runs side effects (the lakehouse
  * lifecycles) execute those side effects once here — same as any single
  * bench iteration; the dumped plan is the final returned query's.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, list) = args.take(3)
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.GraftSession.get()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[plans] wrote $outDir/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}

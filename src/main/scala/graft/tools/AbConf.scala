package graft.tools

/** Dev diagnostic: same-JVM A/B of one session conf over a query set.
  * Alternates the conf value across rounds (JIT warms monotonically, so
  * alternation deconfounds it) and prints per-round totals; the last
  * pairs of rounds are the steady-state comparison.
  *
  * Usage: runMain graft.tools.AbConf <confKey> <valA> <valB> <q1,q2,…> [rounds]
  */
object AbConf {
  def main(args: Array[String]): Unit = {
    val Array(key, valA, valB, list) = args.take(4)
    val rounds = if (args.length > 4) args(4).toInt else 6
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    for (r <- 1 to rounds) {
      val v = if (r % 2 == 1) valA else valB
      spark.conf.set(key, v)
      val t0 = System.nanoTime()
      val per = names.map { n =>
        val q0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        n -> (System.nanoTime() - q0) / 1e9
      }
      println(f"[abconf] round $r $key=$v total ${
        (System.nanoTime() - t0) / 1e9}%.2fs " +
        per.map { case (n, s) => f"${n.take(4)}=$s%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}

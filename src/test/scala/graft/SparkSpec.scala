package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; suites are
  * sequential under sbt's default test runner).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(cores = "4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Set SQL confs for a block, restoring previous values after. */
  def withSQLConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
  def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)
  def dec(s: String): java.math.BigDecimal =
    new java.math.BigDecimal(s).setScale(2)
}

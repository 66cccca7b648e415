package graft.tools

import org.apache.spark.sql.DataFrame

/** Shared timing/drain helpers for the stress harnesses — one spelling
  * (the noop sink forces full evaluation of every projected column
  * without materializing a result) so any change to the timing or sink
  * pattern lands in every tool at once instead of six copies drifting.
  */
private[tools] object StressUtil {

  def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f
    (System.nanoTime() - t0) / 1e9
  }

  /** Timed variant that also returns the body's value (for tools that
    * assert on counts/round numbers as well as wall time).
    */
  def timedValue[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val v = f
    (v, (System.nanoTime() - t0) / 1e9)
  }

  def drain(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}

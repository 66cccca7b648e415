package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key: quantile-bucketize each column, then
  * interleave the bucket ids' bits, so sorting by the key gives locality
  * in EVERY clustered dimension at once — a linear sort clusters only its
  * leading column; the z-curve is what lets one layout serve range
  * predicates on either column (the multi-column companion to
  * [[Lakehouse.readBetween]]'s zone maps; same idea as Delta's OPTIMIZE
  * ZORDER).
  *
  * Bucketization is by rank (approx quantiles), not by value: raw bit
  * interleaving of skewed values lets one column's magnitude dominate
  * the high bits and degenerates to a linear sort. The ≤2^bits−1
  * boundaries are collected once per column (a driver-side sketch array,
  * the planning cost) and the per-row bucket is a branch-free fold over
  * the broadcast literal array — stays inside whole-stage codegen.
  *
  * Numeric, decimal, date and timestamp columns (anything that casts to
  * double order-preservingly); NULLs land in bucket 0.
  */
object ZOrder {

  /** Quantile bucket id of `c` in [0, 2^bits): the number of boundaries
    * at or below the value.
    */
  def bucketCol(df: DataFrame, c: String, bits: Int): Column = {
    val k = 1 << bits
    val bounds = df.select(col(c).cast("double").as(c)).na.drop()
      .stat.approxQuantile(c, (1 until k).map(_.toDouble / k).toArray, 0.001)
      .distinct // heavy ties collapse boundaries; fewer buckets, same order
    aggregate(array(bounds.map(lit(_)).toIndexedSeq: _*), lit(0L),
      (acc, b) => acc + when(col(c).cast("double") >= b, 1L).otherwise(0L))
  }

  /** The interleaved key: bit i of column j lands at position i*n + j. */
  def zkey(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits * cols.length <= 62,
      s"bits=$bits over ${cols.length} columns overflows a long")
    val n = cols.length
    val terms = for {
      (c, j) <- cols.zipWithIndex
      bc = bucketCol(df, c, bits)
      i <- 0 until bits
    } yield shiftleft(shiftright(bc, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }
}

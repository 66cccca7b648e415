package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

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
  * the high bits and degenerates to a linear sort. ALL columns'
  * boundaries come from ONE approxQuantile pass over a normalized
  * projection (per-column passes would scan the table k times); the
  * ≤2^bits−1 boundaries per column are a driver-side sketch array — the
  * planning cost — and the per-row bucket is a branch-free fold over the
  * broadcast literal array, inside whole-stage codegen.
  *
  * Numeric, decimal, timestamp and date columns (dates go through
  * `unix_date` — DATE has no direct double cast); NULLs land in bucket 0.
  */
object ZOrder {

  /** Order-preserving double image of a column. */
  private def norm(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case DateType => unix_date(col(c)).cast("double")
      case TimestampType => col(c).cast("double")
      case _ => col(c).cast("double")
    }

  /** Quantile bucket id of `c` given its boundaries: the number of
    * boundaries at or below the value.
    */
  private def bucketCol(df: DataFrame, c: String,
      bounds: Array[Double]): Column =
    aggregate(array(bounds.map(lit(_)).toIndexedSeq: _*), lit(0L),
      (acc, b) => acc + when(norm(df, c) >= b, 1L).otherwise(0L))

  /** The interleaved key: bit i of column j lands at position i*n + j. */
  def zkey(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits * cols.length <= 62,
      s"bits=$bits over ${cols.length} columns overflows a long")
    val k = 1 << bits
    val probs = (1 until k).map(_.toDouble / k).toArray
    // one full pass computes every column's quantile sketch
    val allBounds = df.select(cols.map(c => norm(df, c).as(c)): _*)
      .stat.approxQuantile(cols.toArray, probs, 0.001)
      // heavy ties collapse boundaries; fewer buckets, same order
      .map(_.distinct)
    val n = cols.length
    val terms = for {
      ((c, bounds), j) <- cols.zip(allBounds).zipWithIndex
      bc = bucketCol(df, c, bounds)
      i <- 0 until bits
    } yield shiftleft(shiftright(bc, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }
}

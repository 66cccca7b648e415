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
    * boundaries at or below the value, as a balanced binary-search tree
    * of nested CASEs — log2(2^bits) comparisons per row on the taken
    * path (codegen'd or interpreted alike). The first version was a
    * linear `aggregate` fold over the boundary array: a 2^bits-step
    * interpreted higher-order eval per row per column, which at bits=8
    * over sf0.1 (150k rows × 2 cols × 255 steps) made the q56 rewrite
    * the slowest query in the bench (~9 s; the tree drops the rewrite to
    * the same band as the linear-sort compaction). A NULL value fails
    * every `>=` probe and descends left to bucket 0.
    */
  private def bucketCol(df: DataFrame, c: String,
      bounds: Array[Double]): Column = {
    val v = norm(df, c)
    // count of bounds <= v over bounds[lo, hi) — classic upper-bound
    // search; both branches are BUILT (tree size 2·n nodes) but each row
    // EVALUATES one root-to-leaf path
    def pos(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo.toLong)
      else {
        val mid = (lo + hi) / 2
        when(v >= lit(bounds(mid)), pos(mid + 1, hi)).otherwise(pos(lo, mid))
      }
    pos(0, bounds.length)
  }

  /** One full pass computes every column's quantile boundary sketch
    * (shared by [[zkey]] and [[withZkey]] — tuning the epsilon or the
    * bits cap happens here, once). Heavy ties collapse boundaries:
    * fewer buckets, same order.
    */
  private def boundsFor(df: DataFrame, cols: Seq[String],
      bits: Int): Array[Array[Double]] = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits * cols.length <= 62,
      s"bits=$bits over ${cols.length} columns overflows a long")
    val k = 1 << bits
    val probs = (1 until k).map(_.toDouble / k).toArray
    df.select(cols.map(c => norm(df, c).as(c)): _*)
      .stat.approxQuantile(cols.toArray, probs, 0.001)
      .map(_.distinct)
  }

  /** The interleaved key: bit i of column j lands at position i*n + j.
    * Self-contained Column form — the per-column search tree is BUILT
    * once per bit (O(bits·2^bits) expression nodes; each row still
    * evaluates one path per occurrence). Fine at small `bits`; for the
    * compaction path use [[withZkey]], which materializes each bucket id
    * once.
    */
  def zkey(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    val allBounds = boundsFor(df, cols, bits)
    val n = cols.length
    val terms = for {
      ((c, bounds), j) <- cols.zip(allBounds).zipWithIndex
      bc = bucketCol(df, c, bounds)
      i <- 0 until bits
    } yield shiftleft(shiftright(bc, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** `df` plus the interleaved key as column `out` — the form
    * [[Lakehouse.compactZOrder]] uses. Unlike [[zkey]] (one self-contained
    * Column, so the O(2^bits) bucket fold is REPEATED per bit — `bits`×
    * redundant work on an interpreted higher-order expression), this
    * materializes each column's bucket id ONCE in a pre-projection and
    * interleaves from it with codegen'd bit arithmetic — also keeping the
    * expression tree O(2^bits) instead of O(bits·2^bits) nodes (the
    * search tree duplicated per bit would bloat codegen).
    */
  def withZkey(df: DataFrame, cols: Seq[String], out: String,
      bits: Int = 8): DataFrame = {
    val allBounds = boundsFor(df, cols, bits)
    val n = cols.length
    val tmp = cols.indices.map(j => s"__zb_$j")
    val bucketed = df.withColumns(
      tmp.zip(cols.zip(allBounds).map { case (c, bounds) =>
        bucketCol(df, c, bounds)
      }).toMap)
    val terms = for {
      (t, j) <- tmp.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(col(t), i).bitwiseAND(lit(1L)), i * n + j)
    bucketed.withColumn(out, terms.reduce(_ bitwiseOR _))
      .drop(tmp: _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime` on the same key (the time-series point-in-time
  * join Spark lacks as a built-in operator).
  *
  * Implementation composes built-ins (preference (a) of the custom-op
  * ladder): tag both sides, union, and carry the latest right row forward
  * with `last(struct, ignoreNulls) over (key, time)` — a single
  * hash-partition shuffle on the key, no range-join explosion, no custom
  * physical node. The right payload travels as ONE struct so the carry is
  * atomic (per-column carries would mix rows when a payload field is
  * legitimately NULL). Each partition streams through the window
  * operator, so arbitrarily long per-key histories don't blow memory.
  *
  * Ties: a right row at exactly leftTime is visible (right sorts before
  * left at equal time); among equal-time right rows the highest `rightId`
  * wins — deterministic. `rightId` must be an integral column (validated
  * at analysis time — a silent cast-to-NULL would destroy the tie-break).
  *
  * NULL keys follow SQL equi-join semantics: right rows with a NULL key
  * are dropped, left rows with a NULL key come through unmatched (window
  * partitioning would otherwise group the NULLs together and match them).
  * Right rows with a NULL time are dropped for the same reason — under
  * the window's nulls-first ordering they would otherwise become a
  * fallback "match" for left rows that have no true at-or-before match,
  * though `NULL <= t` is unknown in SQL.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     reference rows (e.g. quotes, rates, prior events)
    * @param key       equality key column name on both sides
    * @param leftTime  event-time column in `left`
    * @param rightTime event-time column in `right`
    * @param rightId   unique id column in `right` (tie-break), emitted as
    *                  `matched_<rightId>`
    * @param rightCols right payload columns to carry: src → output name
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightId: String,
      rightCols: Map[String, String]): DataFrame = {
    val internal = Set("_t", "_is_left", "_ord", "_p", "_m")
    val colliding = (left.columns ++ right.columns).toSet.intersect(internal)
    require(colliding.isEmpty,
      s"AsOfJoin.backward: input columns collide with internal names " +
        s"${colliding.mkString(", ")} — rename them first")
    // output names must also be fresh on the left side, or the final
    // select would emit duplicate column names
    val outNames = rightCols.values.toSet + s"matched_$rightId"
    val outClash = left.columns.toSet.intersect(outNames)
    require(outClash.isEmpty,
      s"AsOfJoin.backward: output names ${outClash.mkString(", ")} already " +
        s"exist on the left input — pick different rightCols names")
    right.schema(rightId).dataType match {
      case org.apache.spark.sql.types.ByteType |
          org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"AsOfJoin.backward: rightId '$rightId' must be an integral column " +
          s"(tie-break order), got $other")
    }
    val leftCols = left.columns.toSeq
    val payload = rightCols.toSeq.sortBy(_._1)

    val rightStruct = struct(
      col(rightId).cast("bigint").as("_rid") +:
        payload.map { case (src, dst) => col(src).as(dst) }: _*)
    val taggedRight = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull).select(
      col(key), col(rightTime).as("_t"), lit(0).as("_is_left"),
      col(rightId).cast("bigint").as("_ord"), rightStruct.as("_p"))

    val nullStruct = when(lit(false),
      struct(lit(null).cast("bigint").as("_rid") +:
        payload.map { case (src, dst) =>
          lit(null).cast(right.schema(src).dataType).as(dst)
        }: _*))
    val taggedLeft = left.select(
      leftCols.map(col) :+ col(leftTime).as("_t") :+ lit(1).as("_is_left") :+
        lit(null).cast("bigint").as("_ord") :+ nullStruct.as("_p"): _*)

    val unioned = taggedLeft.unionByName(
      taggedRight.select(
        col(key) +: leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
          col("_t") :+ col("_is_left") :+ col("_ord") :+ col("_p"): _*))

    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_is_left"), col("_ord"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .select(leftCols.map(col) ++
        payload.map { case (_, dst) => col(s"_m.$dst").as(dst) } :+
        col("_m._rid").as(s"matched_$rightId"): _*)
  }
}

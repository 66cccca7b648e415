package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `simhash16(tokens, salt)` — the 16-bit SimHash of a token array in ONE
  * compiled pass: per token, the 16-bit hash is the top half of the first
  * 32 md5 bits of `token ++ salt` (≡ `Dedup.hash16(concat(t, salt))`),
  * and bit `j` of the result is the sign of the ±1 vote sum over tokens.
  *
  * Why native (SURVEY.md §7.4 ladder, step (b)): the built-in spelling —
  * `transform(toks, t => hash16(…))` followed by 16 `aggregate` folds,
  * one per bit — evaluates every higher-order lambda INTERPRETED per
  * element and re-scans the hash array 16×; with d18's four salted
  * quadrants that is 4 interpreted map passes + 64 interpreted fold
  * passes per document. Here: one md5 per token per quadrant and one
  * int[16] vote array, all compiled. CodegenFallback costs one virtual
  * call per document (same trade as [[CharNgramProfile]]).
  *
  * Parity contract (pinned by FunctionsSpec): bit-identical to
  * `Dedup.simhash16FromHashes(Dedup.simhashQuadrantHashes(…))` and to
  * the DuckDB oracle spelling — empty array → 0 (a 0-vote bit is 0, the
  * fold's `coalesce(…, 0) > 0` is false); a NULL token votes −1 on every
  * bit (the fold's `otherwise(-1)` branch under a NULL comparison); NULL
  * array → NULL.
  */
case class Simhash16(child: Expression, salt: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 requires an ARRAY<STRING> argument, got ${other.sql}")
    }

  @transient private lazy val saltU8: UTF8String = UTF8String.fromString(salt)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](16)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < 16) { votes(j) -= 1; j += 1 }
      } else {
        val h = Md5Prefix64.hash(
          UTF8String.concat(arr.getUTF8String(i), saltU8)) >>> 16
        var j = 0
        while (j < 16) {
          votes(j) += (if (((h >> j) & 1L) != 0L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) { if (votes(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash16 =
    copy(child = newChild)

  override def prettyName: String = "simhash16"
}

object Simhash16 {
  def apply(toks: Column, salt: String): Column =
    GraftColumnBridge.toColumn(Simhash16(GraftColumnBridge.toExpr(toks), salt))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `char_ngram_profile(s, n)` — one compiled pass over a string yielding
  * struct(best STRING, best_cnt BIGINT, n_distinct BIGINT): the most
  * frequent character n-gram (ties broken by binary order, i.e.
  * `ORDER BY cnt DESC, gram ASC`), its count, and the distinct-gram
  * count. NULL for strings shorter than n code points.
  *
  * Why native (SURVEY.md §7.4 ladder, step (b)): the built-in spelling —
  * `transform(sequence(...), i -> substr(s, i, n))` then sort + fold, or
  * explode + count + rank — runs inside higher-order lambdas, which Spark
  * evaluates INTERPRETED per element; worse, `substr` on a UTF-8 string
  * re-scans from the start per call (variable-width encoding), making
  * gram generation O(len²) per document. Measured on 5000 × ~300-char
  * docs (sf0.1): 3.5–4 s for either built-in plan vs milliseconds here.
  * CodegenFallback: the expression is evaluated once per row and the
  * eval body is already compiled Scala, so staying outside whole-stage
  * codegen costs one virtual call per document, not per gram.
  *
  * Grams are counted over CODE POINTS and compared as [[UTF8String]]
  * (binary = code-point order), so results and tie-breaks agree with
  * SQL `substr` semantics and DuckDB's default collation even for
  * supplementary-plane text — a Java String.compareTo tie-break would
  * order surrogate pairs below U+E000 and silently diverge.
  */
case class CharNgramProfile(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"ngram width < 1: $n")

  override def dataType: DataType = CharNgramProfile.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngram_profile requires a STRING argument, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
    val total = cps.length - n + 1
    if (total <= 0) null
    else {
      val counts = new java.util.HashMap[UTF8String, Long](total * 2)
      var i = 0
      while (i < total) {
        val g = UTF8String.fromString(new String(cps, i, n))
        counts.merge(g, 1L, (a, b) => a + b)
        i += 1
      }
      var best: UTF8String = null
      var bestCnt = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > bestCnt ||
          (e.getValue == bestCnt && e.getKey.compareTo(best) < 0)) {
          best = e.getKey
          bestCnt = e.getValue
        }
      }
      InternalRow(best, bestCnt, counts.size().toLong)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharNgramProfile = copy(child = newChild)

  override def prettyName: String = "char_ngram_profile"
}

object CharNgramProfile {
  val Schema: StructType = StructType(Seq(
    StructField("best", StringType, nullable = false),
    StructField("best_cnt", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.toColumn(CharNgramProfile(GraftColumnBridge.toExpr(c), n))
}

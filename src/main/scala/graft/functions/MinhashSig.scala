package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `minhash_sig(tokens, k)` — the k-seed MinHash signature of a token
  * array in ONE compiled pass: element `i` is
  * `min over tokens of md5_prefix64(token ++ "#i")`, bit-identical to
  * `array_min(transform(toks, t => Dedup.hash32(t, i)))` per seed (and
  * to the DuckDB oracle's `list_min(list_transform(...))`), so swapping
  * it under d03/d04/d10 changes no oracle.
  *
  * Why native (SURVEY.md §7.4 ladder, step (b)): the built-in spelling
  * evaluates k separate higher-order `transform` lambdas INTERPRETED per
  * element — k array scans and k per-element expression-tree walks per
  * document. Here the md5 input is assembled once per (token, seed) from
  * raw bytes (no intermediate UTF8String concat) and all k mins update in
  * one pass. Same trade as [[Simhash16]]: CodegenFallback costs one
  * virtual call per document.
  *
  * Parity contract (pinned by FunctionsSpec): a NULL or empty token set
  * yields NULL per element (`array_min` of an empty/all-null array);
  * NULL tokens are skipped (array_min ignores nulls); NULL array → NULL.
  */
case class MinhashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"minhash signature length < 1: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires an ARRAY<STRING> argument, got ${other.sql}")
    }

  @transient private lazy val suffixes: Array[Array[Byte]] =
    (0 until k).map(i => s"#$i".getBytes("UTF-8")).toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    val md = MinhashSig.digests.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val tok = arr.getUTF8String(i).getBytes
        var s = 0
        while (s < k) {
          md.reset()
          md.update(tok)
          md.update(suffixes(s))
          val d = md.digest()
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins.map(Long.box(_): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinhashSig {
  // MessageDigest is not thread-safe; one per executor thread.
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def apply(toks: Column, k: Int): Column =
    GraftColumnBridge.toColumn(MinhashSig(GraftColumnBridge.toExpr(toks), k))
}

package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_prefix64(s)` — the first 32 bits of md5(s) as an unsigned value in
  * a long: bit-identical to
  * `conv(substring(md5(s), 1, 8), 16, 10) :: bigint` (and to DuckDB's
  * `CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)`), without
  * materializing the 32-char hex string and re-parsing it.
  *
  * This is the hot inner loop of MinHash/LSH (tokens × seeds × documents
  * evaluations), which justifies a native Catalyst expression over the
  * composed built-ins (SURVEY.md §7.4 ladder, step (b)): `doGenCode`
  * emits a direct static call, so the expression stays inside whole-stage
  * codegen with zero intermediate allocations beyond the digest.
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  // fail at analysis, not at codegen/runtime, for non-string inputs
  // (AbstractDataType/ExpectsInputTypes are private[sql] in Spark 4, so
  // the check is spelled out)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_prefix64 requires a STRING argument, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    Md5Prefix64.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix64"
}

object Md5Prefix64 {
  // MessageDigest is not thread-safe; one per executor thread.
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 4 digest bytes, big-endian, as unsigned 32-bit in a long —
    * exactly the value of the first 8 hex chars parsed base-16.
    */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(Md5Prefix64(GraftColumnBridge.toExpr(c)))
}

/** `md5_prefix60(s)` — the first 60 BITS of md5(s) (15 hex chars) as a
  * non-negative long: bit-identical to
  * `conv(substring(md5(s), 1, 15), 16, 10) :: bigint` and to DuckDB's
  * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`. 60 bits, not
  * 64, because a full 64-bit unsigned prefix overflows a signed BIGINT
  * in the oracle engine — and 60 bits already puts n-gram membership
  * false positives at ~|set|/2^60 (negligible where the 32-bit prefix's
  * |set|/2^32 silently cut clean spans at corpus scale — see
  * [[graft.ops.Dedup.decontaminateSpans]]).
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_prefix60 requires a STRING argument, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    Md5Prefix60.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix60"
}

object Md5Prefix60 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 8 digest bytes big-endian, unsigned-shifted right 4 — the
    * value of the first 15 hex chars parsed base-16 (non-negative).
    */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val v = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    v >>> 4
  }

  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(Md5Prefix60(GraftColumnBridge.toExpr(c)))
}

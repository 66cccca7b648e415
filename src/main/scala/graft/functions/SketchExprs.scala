package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Probabilistic-sketch probe expressions (SURVEY.md §7.4 ladder, step (b)).
  *
  * Both take a pre-built sketch as a foldable BINARY argument (the bytes of
  * `spark.util.sketch.BloomFilter`/`CountMinSketch.writeTo`) and probe it
  * per row inside whole-stage codegen — the sketch deserializes once per
  * expression instance, not per row, and reaches generated code through
  * `addReferenceObj` (no per-row deserialization, no UDF boxing).
  *
  * This is the executor half of the driver-built-sketch pattern
  * (`ops/Sketches`): a scan collects a KB-to-MB sketch to the driver, the
  * sketch rides the serialized plan to every task, and the probe prunes
  * rows *before* the shuffle a join or aggregation would pay. Spark's own
  * runtime bloom-filter join injection does the same thing adaptively;
  * the explicit form covers cross-job reuse (build once, probe many) and
  * the CMS threshold shape the optimizer has no rule for.
  *
  * Key hashing matches what `DataFrameStatFunctions.bloomFilter` /
  * `countMinSketch` wrote: longs via the long path, strings via their
  * UTF-8 bytes (`putString` ≡ `putBinary(utf8)`); SketchesSpec pins the
  * round-trip on both types.
  */
/** A serialized sketch as a PLAN-RESIDENT BLOB, not a `Literal`.
  *
  * `Literal` special-cases arrays with DEEP equals/hashCode
  * (`java.util.Arrays.hashCode`), so an MB-scale sketch literal makes
  * every Catalyst expression-map insertion and `semanticEquals` probe
  * re-hash the whole array — measured as tens of seconds of driver-only
  * gap on q42's 11 MB CMS (the optimizer + AQE re-planning touch the
  * predicate's hash hundreds of times). This leaf keeps case-class
  * IDENTITY semantics for the array field (reference equality — two
  * copies of one plan share the reference, distinct sketches stay
  * distinct; the conservative direction only costs a missed
  * common-subexpression merge), and it is deliberately NON-foldable so
  * `ConstantFolding` cannot collapse it back into the `Literal` this
  * exists to avoid. Reaches generated code via `addReferenceObj`, same
  * as the probes' deserialized sketches.
  */
case class SketchBytes(bytes: Array[Byte])
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    bytes
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("sketchBytes", bytes, "byte[]")
    ev.copy(code = code"byte[] ${ev.value} = $ref;", isNull = FalseLiteral)
  }
  override def prettyName: String = "sketch_bytes"
  // render as a placeholder, not MBs of hex, in explain output
  override def toString: String = s"sketch_bytes(${bytes.length}B)"
}

private[graft] trait SketchProbe extends BinaryExpression {
  def key: Expression
  def sketch: Expression

  override def left: Expression = key
  override def right: Expression = sketch

  override def checkInputDataTypes(): TypeCheckResult = {
    val sketchOk = sketch.dataType == BinaryType &&
      (sketch.foldable || sketch.isInstanceOf[SketchBytes])
    if (!sketchOk)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable BINARY sketch argument")
    if (sketch.eval() == null)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName sketch argument must not be NULL")
    key.dataType match {
      case IntegerType | LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName key must be INT, BIGINT or STRING, got ${other.sql}")
    }
  }

  protected def sketchBytes: Array[Byte] =
    sketch.eval().asInstanceOf[Array[Byte]]
}

/** `bloom_might_contain(key, sketchBytes)` — true iff the Bloom filter
  * may contain `key`. No false negatives; false-positive rate is the
  * build-time `fpp`, so callers follow with an exact join when exactness
  * matters (ops/Sketches.bloomSemiJoin does).
  */
case class BloomMightContain(key: Expression, sketch: Expression)
    extends SketchProbe {
  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(sketchBytes))

  override def nullSafeEval(k: Any, ignored: Any): Any = key.dataType match {
    case IntegerType => bloom.mightContainLong(k.asInstanceOf[Int].toLong)
    case LongType => bloom.mightContainLong(k.asInstanceOf[Long])
    case StringType =>
      bloom.mightContainBinary(k.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    key.dataType match {
      case IntegerType | LongType =>
        nullSafeCodeGen(ctx, ev, (k, _) =>
          s"${ev.value} = $ref.mightContainLong((long) $k);")
      case StringType =>
        nullSafeCodeGen(ctx, ev, (k, _) =>
          s"${ev.value} = $ref.mightContainBinary($k.getBytes());")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(key = newLeft, sketch = newRight)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  def apply(key: Column, sketchBytes: Array[Byte]): Column =
    GraftColumnBridge.toColumn(BloomMightContain(
      GraftColumnBridge.toExpr(key), SketchBytes(sketchBytes)))
}

/** `cms_estimate(key, sketchBytes)` — the Count-Min estimate of `key`'s
  * frequency. Never underestimates (one-sided error ≤ eps·N with the
  * build-time confidence), which is exactly the property the
  * heavy-hitter prefilter relies on: `cms_estimate(k) >= t` keeps every
  * key whose true count ≥ t.
  */
case class CmsEstimate(key: Expression, sketch: Expression)
    extends SketchProbe {
  override def dataType: DataType = LongType

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

  override def nullSafeEval(k: Any, ignored: Any): Any = key.dataType match {
    case IntegerType => cms.estimateCount(k.asInstanceOf[Int].toLong: java.lang.Long)
    case LongType => cms.estimateCount(k.asInstanceOf[Long]: java.lang.Long)
    case StringType => cms.estimateCount(k.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    key.dataType match {
      case IntegerType | LongType =>
        nullSafeCodeGen(ctx, ev, (k, _) =>
          s"${ev.value} = $ref.estimateCount((Object) java.lang.Long.valueOf((long) $k));")
      case StringType =>
        nullSafeCodeGen(ctx, ev, (k, _) =>
          s"${ev.value} = $ref.estimateCount((Object) $k.toString());")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(key = newLeft, sketch = newRight)

  override def prettyName: String = "cms_estimate"
}

object CmsEstimate {
  def apply(key: Column, sketchBytes: Array[Byte]): Column =
    GraftColumnBridge.toColumn(CmsEstimate(
      GraftColumnBridge.toExpr(key), SketchBytes(sketchBytes)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** `eval_once(e)` — identity wrapper that reports itself non-deterministic
  * so the optimizer must materialize the aliased result instead of
  * inlining the expression into every consumer.
  *
  * Why it exists: Catalyst's filter pushdown substitutes aliases into the
  * pushed predicate, so `select(expensive.as("x")).filter($"x" >= t)`
  * silently evaluates `expensive` TWICE per row — once in the pushed
  * filter, once in the projection (measured 4× wall-clock on d09's
  * shingle+md5 pipeline before the fix). Pushdown and `CollapseProject`
  * both refuse to move expressions through a projection containing a
  * non-deterministic field, which is exactly the barrier we want around
  * an expensive, *actually deterministic* expression whose alias is both
  * filtered on and emitted.
  *
  * The trade is explicit: the optimizer treats the column as opaque, so
  * ONLY wrap expressions whose filters could not otherwise be pushed to a
  * scan anyway (candidate-pair scores, per-row quality features). Never
  * wrap a column a parquet scan could prune partitions/rows with.
  */
case class EvalOnce(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  // tagging pattern: emit exactly the child's code (no extra locals)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): EvalOnce =
    copy(child = newChild)
  override def prettyName: String = "eval_once"
}

object EvalOnce {
  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(EvalOnce(GraftColumnBridge.toExpr(c)))
}

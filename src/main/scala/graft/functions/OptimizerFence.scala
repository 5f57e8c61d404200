package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.SparkSessionExtensions

/** Identity wrapper that the optimizer must leave in place.
  *
  * The SPARQL compiler hoists expensive computed operands (YEAR(?x),
  * STR(?x), arithmetic…) into temp projection columns so the
  * comparison/EBV CASE trees built on top reference a cheap attribute
  * instead of re-inlining the operand at every one of their ~10-30
  * references. `CollapseProject` respects that for projections (it
  * refuses to duplicate non-cheap aliases), but predicate pushdown
  * (`PushPredicateThroughNonJoin`) substitutes aliases into FILTER /
  * HAVING conditions unconditionally — exploding the condition
  * multiplicatively, overflowing codegen's 64KB method budget, and
  * paying a generate-then-fallback cost on every execution.
  *
  * Reporting `deterministic = false` makes every alias-substituting
  * rule keep its hands off (they all gate on determinism) while eval
  * and codegen stay a zero-cost pass-through — the wrapped expression
  * still runs inside whole-stage codegen. A `when(rand(42) > -1, c)`
  * guard used to achieve this; Spark 4.1's optimizer folds the rand
  * comparison away, so the barrier has to be an expression the
  * optimizer cannot see through by construction.
  *
  * Scan-level key-equality filters are produced separately by the
  * translator's scan() and still reach the parquet reader — the fence
  * never sits between a pushable predicate and its scan.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)
  override def prettyName: String = "graft_fence"
}

object OptimizerFence {
  val name = "graft_fence"

  /** Register via SparkSessionExtensions so Column-side code can call
    * `call_function("graft_fence", c)` — the public route from a
    * Column to a custom catalyst Expression.
    */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[OptimizerFence].getName, name),
      (exprs: Seq[Expression]) => OptimizerFence(exprs.head)))
}

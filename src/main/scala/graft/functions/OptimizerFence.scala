package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper whose ONLY effect is `deterministic = false`: an
  * explicit, self-documenting optimizer fence. Catalyst's pushdown rules
  * (`PushPredicateThroughNonJoin` and friends) move only deterministic
  * predicates, so a condition wrapped in this expression stays exactly
  * where the plan author put it — used by [[graft.ops.RenderTarget]] to
  * keep per-leaf regex selection ABOVE the shared (metric, bucket)
  * aggregate, where canonically-identical subtrees dedupe into one scan
  * via exchange reuse (PlanSpec pins the ReusedExchange).
  *
  * Unlike the `when(rand() < …)` guard it replaces, this cannot be
  * proven away by a smarter future optimizer (the flag is contractual,
  * not an emergent property of an unfoldable guard), adds zero runtime
  * work, and delegates codegen to the child so the filter stays inside
  * WholeStageCodegen.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)
  override def prettyName: String = "optimizer_fence"
}

object OptimizerFence {
  /** Column-level entry point: `fence(cond)` evaluates exactly `cond`
    * but is opaque to predicate pushdown. */
  def fence(c: Column): Column =
    graftbridge.toColumn(OptimizerFence(graftbridge.toExpression(c)))
}

package graft.core

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.DataType

/** Identity expression flagged non-deterministic: a pushdown fence.
  *
  * Catalyst's filter pushdown substitutes projection aliases into the
  * predicate without a cost model, and FilterExec does no subexpression
  * elimination — so `checked.where(_errors isNull)` re-inlines and
  * re-evaluates EVERY check expression 2x (measured 2.2x on a 24-check
  * suite). Wrapping the predicate in this barrier keeps the Filter above the
  * single-eval result projection: the checks compute once in the (CSE'd,
  * codegen'd) Project and the filter reads the finished column.
  *
  * Runtime cost is zero (codegen passes the child's value straight through);
  * the only effect is optimizer placement. Trade-off: for a checked frame
  * re-read from storage (where `_errors` is a physical column), the barrier
  * also disables data-source filter pushdown of the null test — that path
  * should filter the raw column directly instead.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cg = child.genCode(ctx)
    ev.copy(code = cg.code, isNull = cg.isNull, value = cg.value)
  }

  override protected def withNewChildInternal(c: Expression): OptimizerBarrier = copy(child = c)
}

object OptimizerBarrier {
  import org.apache.spark.sql.{Column, GraftColumnBridge}
  def apply(c: Column): Column =
    GraftColumnBridge.column(OptimizerBarrier(GraftColumnBridge.expression(c)))
}

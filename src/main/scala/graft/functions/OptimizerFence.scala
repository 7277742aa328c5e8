package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Identity expression that DECLARES itself non-deterministic: an optimizer
  * fence. Wrapping a predicate in it stops predicate pushdown, conjunct
  * splitting, and constant folding across it, while evaluating exactly the
  * child (codegen passthrough — zero runtime cost).
  *
  * Why it exists: the River routing filter (status = 'passed') over the
  * routing projection must NOT be pushed below it — pushdown substitutes the
  * whole interpreted variant expression tree into the Filter and re-evaluates
  * it per row (measured 3-6x on the envelope queries). Simpler fences lose:
  * an unused non-deterministic projection column is pruned away, and
  * when(rand() > -1, pred) is rewritten by SimplifyConditionalsInPredicate
  * into a splittable conjunction whose rand conjunct is then eliminated.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def nullable: Boolean = child.nullable

  override def dataType: DataType = child.dataType

  override def prettyName: String = "fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OptimizerFence {
  def apply(c: Column): Column = Bridge.column(OptimizerFence(Bridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper declared NON-deterministic: pins exactly one
  * evaluation site for an expensive expression (guide §4.4's mechanism,
  * available to built-ins — the optimizer may not push predicates past
  * it, collapse it into a join condition, or duplicate it across a
  * pushed filter + re-projection). The value is the child's value
  * bit-for-bit; only optimizer placement changes. Use ONLY on expensive
  * kernels whose duplicated evaluation was observed in a plan —
  * non-determinism also blocks legitimate reorderings (its cost).
  *
  * Not foldable and initialized per-partition like any nondeterministic
  * expression; eval and codegen are pure pass-through.
  */
case class OnceGate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "once_gate"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OnceGate =
    copy(child = newChild)
}

object OnceGate {
  /** Pin `c` to a single evaluation site (see [[OnceGate]]). */
  def once(c: Column): Column = GraftShims.toColumn(OnceGate(GraftShims.toExpression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that declares itself non-deterministic so the
  * optimizer will not move or substitute it — the Catalyst-expression
  * analogue of marking an expensive UDF non-deterministic (optimization
  * guide §4.4).
  *
  * Why it exists: `PushPredicateThroughNonJoin` pushes a deterministic
  * filter below a `Project` by SUBSTITUTING each attribute reference
  * with the producing expression — with no common-subexpression reuse
  * across the copies. For a filter like the validator's "any check
  * fails" predicate, which references every derived column once per
  * check, pushing it below a derivation projection re-evaluates each
  * derivation expression once PER REFERENCING CHECK per row (measured
  * ~10x on the flagship validator over the lineitem-derived transcripts:
  * 4.1-5.2 s inline vs 0.45 s with the projection materialized).
  * Wrapping the predicate in a fence keeps it ABOVE the projection, so
  * derived columns are computed once per row and the checks read
  * attributes.
  *
  * The VALUE is a pure function of the input row — `deterministic =
  * false` only switches off rules (pushdown, reordering, constant
  * folding) whose rewrite would duplicate work. Evaluation and codegen
  * delegate to the child unchanged, so the fenced predicate stays
  * inside whole-stage codegen.
  */
case class PushdownFence(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "pushdown_fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PushdownFence {
  /** Column-level wrapper: `df.filter(PushdownFence.fence(pred))`. */
  def fence(c: Column): Column =
    GraftSqlBridge.column(PushdownFence(GraftSqlBridge.expression(c)))
}

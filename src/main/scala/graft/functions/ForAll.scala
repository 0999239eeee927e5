package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ConditionalExpression, Expression, LeafExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, EmptyBlock, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType}

/** Whole-stage-codegen `forall` over an array column.
  *
  * Spark's higher-order functions (`forall`/`filter`/`transform`) are
  * CodegenFallback: every element evaluation goes through an interpreted
  * lambda dispatch, measured at 7-80x slower than codegen on this
  * engine's dedup paths. Per-element constraint checks (JSON-Schema
  * `items`, `patternProperties`, `additionalProperties`) sit on the
  * validation scan's hot path, so this expression generates the element
  * loop INSIDE whole-stage codegen instead: the compiled predicate's
  * generated code is spliced into a plain Java `for` over the ArrayData,
  * with the element exposed through per-instance class fields (fields,
  * not locals, so predicates large enough to be split into helper
  * methods still compile).
  *
  * Three-valued semantics match `forall` exactly: false if any element
  * predicate is false, else null if any was null, else true; a null
  * array yields null.
  *
  * Mechanics: the predicate is built over an [[ElementVar]] placeholder
  * leaf. At codegen time the placeholder is rewritten to a
  * [[BoundLoopVar]] that names the element value/isNull fields; at
  * interpreted-eval time it is rewritten (once per thread) to a
  * [[MutableElem]] slot the loop assigns. Extending
  * [[ConditionalExpression]] keeps common-subexpression elimination from
  * hoisting element-dependent subtrees out of the loop (the predicate is
  * declared conditionally-evaluated, like If/CaseWhen branches).
  */
case class ForAllExpr(arr: Expression, elem: ElementVar, pred: Expression)
    extends Expression with ConditionalExpression {

  override def children: Seq[Expression] = Seq(arr, pred)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "forall_codegen"

  override def alwaysEvaluatedInputs: Seq[Expression] = Seq(arr)
  override def withNewAlwaysEvaluatedInputs(inputs: Seq[Expression]): ConditionalExpression =
    copy(arr = inputs.head)
  override def branchGroups: Seq[Seq[Expression]] = Nil

  override def checkInputDataTypes(): TypeCheckResult = arr.dataType match {
    case ArrayType(et, _)
        if org.apache.spark.sql.catalyst.types.DataTypeUtils.sameType(et, elem.dataType) =>
      if (pred.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"forall_codegen predicate must be boolean, got ${pred.dataType.simpleString}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"forall_codegen needs array<${elem.dataType.simpleString}> input, got ${other.simpleString}")
  }

  // one bound predicate + element slot per thread: expression instances
  // can be shared across tasks in interpreted mode
  @transient private lazy val threadState: ThreadLocal[(MutableElem, Expression)] =
    ThreadLocal.withInitial { () =>
      val slot = MutableElem(elem.dataType, elem.exprId)
      val bound = pred.transform {
        case e: ElementVar if e.exprId == elem.exprId => slot
      }
      (slot, bound)
    }

  override def eval(input: InternalRow): Any = {
    val arrVal = arr.eval(input)
    if (arrVal == null) return null
    val (slot, boundPred) = threadState.get()
    val data = arrVal.asInstanceOf[ArrayData]
    val n = data.numElements()
    var foundNull = false
    var i = 0
    while (i < n) {
      slot.value = if (data.isNullAt(i)) null else data.get(i, elem.dataType)
      val r = boundPred.eval(input)
      if (r == null) foundNull = true
      else if (!r.asInstanceOf[Boolean]) return false
      i += 1
    }
    if (foundNull) null else true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrGen = arr.genCode(ctx)
    // The element value/isNull MUST be class fields, not method locals:
    // when the spliced predicate is large, Spark's splitExpressions
    // extracts parts of predGen.code into separate helper methods that
    // take only the input row — a method-local loop variable would be
    // out of scope there and janino rejects the class ("faElemIsNull_0
    // is not an rvalue"), silently dropping the whole predicate to
    // interpreted mode. Fields are visible to split methods (the same
    // approach Spark's own generated loops use).
    val javaType = CodeGenerator.javaType(elem.dataType)
    val elemValue = ctx.addMutableState(javaType, "faElem")
    val elemIsNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "faElemIsNull")
    val boundPred = pred.transform {
      case e: ElementVar if e.exprId == elem.exprId =>
        BoundLoopVar(e.dataType, elemValue, elemIsNull)
    }
    val predGen = boundPred.genCode(ctx)
    val data = ctx.freshName("faData")
    val n = ctx.freshName("faN")
    val i = ctx.freshName("faI")
    val foundNull = ctx.freshName("faFoundNull")
    val allTrue = ctx.freshName("faAllTrue")
    ev.copy(code =
      code"""
        ${arrGen.code}
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;
        if (!${arrGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $data = ${arrGen.value};
          int $n = $data.numElements();
          boolean $foundNull = false;
          boolean $allTrue = true;
          $elemValue = ${CodeGenerator.defaultValue(elem.dataType)};
          $elemIsNull = true;
          for (int $i = 0; $i < $n; $i++) {
            $elemIsNull = $data.isNullAt($i);
            if (!$elemIsNull) {
              $elemValue = ${CodeGenerator.getValue(data, elem.dataType, i)};
            }
            ${predGen.code}
            if (${predGen.isNull}) {
              $foundNull = true;
            } else if (!${predGen.value}) {
              $allTrue = false;
              break;
            }
          }
          if (!$allTrue) { ${ev.isNull} = false; ${ev.value} = false; }
          else if (!$foundNull) { ${ev.isNull} = false; ${ev.value} = true; }
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(arr = newChildren(0), pred = newChildren(1))
}

/** Placeholder for the current array element inside a [[ForAllExpr]]
  * predicate. Never evaluated directly — the enclosing ForAllExpr
  * rewrites it to a loop-local variable (codegen) or a mutable slot
  * (interpreted) before evaluation.
  */
case class ElementVar(dataType: DataType, exprId: Long) extends LeafExpression {
  override def nullable: Boolean = true
  override def prettyName: String = "element_var"
  override def eval(input: InternalRow): Any =
    throw new IllegalStateException("element_var evaluated outside forall_codegen")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    throw new IllegalStateException("element_var generated outside forall_codegen")
}

object ElementVar {
  private val counter = new AtomicLong(0)
  def fresh(dataType: DataType): ElementVar = ElementVar(dataType, counter.incrementAndGet())
}

/** Codegen splice: evaluates to the loop-local element variables the
  * enclosing ForAllExpr declared. Emits no code of its own.
  */
private[functions] case class BoundLoopVar(dataType: DataType, valueVar: String, isNullVar: String)
    extends LeafExpression {
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any =
    throw new IllegalStateException("bound loop var is codegen-only")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ExprCode(EmptyBlock, JavaCode.isNullVariable(isNullVar), JavaCode.variable(valueVar, dataType))
}

/** Interpreted-eval slot for the current element (one per thread). */
private[functions] case class MutableElem(dataType: DataType, exprId: Long)
    extends LeafExpression {
  @transient var value: Any = null
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    throw new IllegalStateException("mutable elem slot is eval-only")
}

object ForAllFunctions {
  /** `forall(arr, f)` on the whole-stage-codegen path. The element type
    * must be supplied (the Column API builds unresolved expressions, but
    * the predicate needs a typed element placeholder); callers compile
    * against a resolved schema and know it.
    */
  def forallCodegen(arr: Column, elemType: DataType, f: Column => Column): Column = {
    val elem = ElementVar.fresh(elemType)
    val predExpr = expression(f(column(elem)))
    column(ForAllExpr(expression(arr), elem, predExpr))
  }
}

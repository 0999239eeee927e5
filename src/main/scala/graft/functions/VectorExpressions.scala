package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expression for the ANN hot kernel: dot product of two
  * `array<float>` columns accumulated in double precision.
  *
  * Why a custom Expression (SURVEY.md §4 / design-brief preference
  * order): Spark's higher-order array functions (`zip_with` +
  * `aggregate`) express this but are CodegenFallback — every pair of
  * vectors pays interpreted lambda dispatch per element. This expression
  * generates a tight primitive loop via `doGenCode`, keeping the
  * crossJoin scoring stage inside whole-stage codegen. Semantics are
  * identical to the HOF form (sequential left-to-right double
  * accumulation — bit-for-bit the same sums, pinned by tests), so the
  * DuckDB oracle for `ann_cosine_topk` is unaffected.
  *
  * Null behavior: null if either array is null (NullIntolerant-style);
  * null ELEMENTS contribute 0 (treated as missing dimensions).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def okType(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_vec_dot needs two array<float> inputs, got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.GraftSqlBridge
  def floatVecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatVecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** L2 norm via the same kernel. */
  def floatVecNorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(floatVecDot(a, a))
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `format: "regex"` support (reference: `model.scala:19-23` lists the
  * format enum; draft-4 §7.3.8 defines it as "a regular expression,
  * according to the ECMA 262 dialect"): TRUE iff the string value
  * compiles as a regular expression.
  *
  * The reference validates format only at schema-parse time; here the
  * check runs over DATA (a column whose values are themselves regex
  * sources), so compilation cost matters: real columns repeat a small
  * set of patterns, so a bounded per-thread LRU memoizes verdicts
  * (compile once per distinct pattern per task thread, never unbounded
  * driver/executor memory). Java's `Pattern` stands in for ECMA 262 —
  * the same pragmatic substitution every JVM validator makes; the
  * divergence (e.g. lookbehind flavors) is documented in SURVEY §2b.
  *
  * Codegen-friendly: `doGenCode` emits a static call into
  * [[RegexCompiles.compiles]], so the expression participates in
  * whole-stage codegen (no CodegenFallback in validation plans — the
  * round-2 plan invariant PlanSpec pins).
  */
case class RegexCompiles(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess // null in -> null out
    case other => TypeCheckResult.TypeCheckFailure(
      s"regex_compiles needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "regex_compiles"

  override def nullSafeEval(input: Any): Any =
    RegexCompiles.compiles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RegexCompiles.compiles($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexCompiles {
  private final val MaxCacheEntries = 1024

  // per-thread LRU: no locking on the hot path, bounded memory per task
  // thread, evicts least-recently-used on overflow
  private val cache = new ThreadLocal[java.util.LinkedHashMap[String, java.lang.Boolean]] {
    override def initialValue(): java.util.LinkedHashMap[String, java.lang.Boolean] =
      new java.util.LinkedHashMap[String, java.lang.Boolean](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
          size() > MaxCacheEntries
      }
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compiles(s: UTF8String): Boolean = {
    val str = s.toString
    val c = cache.get()
    val hit = c.get(str)
    if (hit != null) hit.booleanValue()
    else {
      // StackOverflowError too: Pattern.compile's recursive-descent
      // parser overflows on deeply nested groups — an adversarial VALUE
      // must be classified invalid, not kill the validation task
      val ok = try { java.util.regex.Pattern.compile(str); true }
               catch {
                 case _: java.util.regex.PatternSyntaxException => false
                 case _: StackOverflowError => false
               }
      c.put(str, java.lang.Boolean.valueOf(ok))
      ok
    }
  }
}

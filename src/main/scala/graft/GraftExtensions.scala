package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's custom Catalyst expressions as SQL functions,
  * so `spark.sql` users get the same codegen kernels the DataFrame API
  * uses:
  *
  *   spark.sql.extensions=graft.GraftExtensions    (config route), or
  *   GraftExtensions.install(spark)                 (live session route)
  *
  * Functions:
  *  - `rolling_hash(str)`       -> bigint  ([[graft.functions.RollingHash]])
  *  - `float_vec_dot(a, b)`     -> double  ([[graft.functions.FloatVecDot]])
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def one(name: String, usage: String, arity: Int,
                  build: Seq[Expression] => Expression) = {
    val builder: Seq[Expression] => Expression = { args =>
      require(args.length == arity, s"$name expects $arity argument(s), got ${args.length}")
      build(args)
    }
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      builder)
  }

  private[graft] val registrations = Seq(
    one("rolling_hash", "rolling_hash(str) - Rabin-Karp byte polynomial mod 1e9+7", 1,
      args => graft.functions.RollingHash(args.head)),
    one("float_vec_dot", "float_vec_dot(a, b) - double-precision dot product of two float arrays", 2,
      args => graft.functions.FloatVecDot(args(0), args(1))))

  /** Register into an already-running session (extensions configs only
    * apply at session construction).
    */
  def install(spark: SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

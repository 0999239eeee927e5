package graft.exprs

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType
import graft.compile.TableSchema

/** The single-pass fused job (SURVEY §4.4: "all per-row constraints +
  * all stats in ONE scan"): runs the violation emission as the job's
  * output while OBSERVING the stats profile and pass/fail counters on
  * the same scan via `Observation` (Spark evaluates observe metrics
  * inline in the pass — no second read of the data).
  */
object FusedRun {

  final case class Result(
      rows: Long,
      violatingRows: Long,
      nullCounts: Map[String, Long],
      mins: Map[String, String],
      maxs: Map[String, String],
      approxDistinct: Map[String, Long])

  /** Returns the violations DataFrame; after an ACTION on it completes,
    * `result(obs)` yields the observed stats of the same pass.
    */
  def violationsWithStats(df: DataFrame, schema: TableSchema, keyCols: Seq[String],
                          obs: Observation): DataFrame = {
    val checks = ConstraintCompiler.compile(schema, df.schema)
      .fold(e => throw new IllegalArgumentException(e), identity)
    val anyViolation = !checks.map(_.ok).reduce(_ && _)
    val statCols = df.schema.fields.toSeq.flatMap { f =>
      val n = f.name
      val c = col(n)
      val orderable = f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType => false
        case _: org.apache.spark.sql.types.MapType => false
        case _: org.apache.spark.sql.types.StructType => false
        case _ => true
      }
      if (!orderable) Nil
      else Seq(
        sum(c.isNull.cast("long")).as(s"${n}__nulls"),
        min(c).cast("string").as(s"${n}__min"),
        max(c).cast("string").as(s"${n}__max"),
        approx_count_distinct(c).as(s"${n}__distinct"))
    }
    val metrics = Seq(
      count(lit(1)).as("rows"),
      sum(when(anyViolation, 1L).otherwise(0L)).as("violating_rows")) ++ statCols
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    Validator.violationsForChecks(observed, checks, keyCols)
  }

  def result(df: DataFrame, obs: Observation): Result = {
    val m = obs.get
    val cols = df.columns.toSeq.filter(n => m.contains(s"${n}__nulls"))
    Result(
      rows = m("rows").asInstanceOf[Long],
      violatingRows = m("violating_rows").asInstanceOf[Long],
      nullCounts = cols.map(n => n -> m(s"${n}__nulls").asInstanceOf[Long]).toMap,
      mins = cols.map(n => n -> Option(m(s"${n}__min")).map(_.toString).orNull).toMap,
      maxs = cols.map(n => n -> Option(m(s"${n}__max")).map(_.toString).orNull).toMap,
      approxDistinct = cols.map(n => n -> m(s"${n}__distinct").asInstanceOf[Long]).toMap)
  }
}

package graft.exprs

import org.apache.spark.sql.{Column, DataFrame, Observation}
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

  /** Size profile of a container column (array/map: element count;
    * struct: non-null field count — "present properties").
    */
  final case class SizeStats(min: Long, p50: Double, max: Long)

  final case class Result(
      rows: Long,
      violatingRows: Long,
      nullCounts: Map[String, Long],
      mins: Map[String, String],
      maxs: Map[String, String],
      approxDistinct: Map[String, Long],
      containerSizes: Map[String, SizeStats] = Map.empty)

  /** Returns the violations DataFrame; after an ACTION on it completes,
    * `result(obs)` yields the observed stats of the same pass.
    *
    * Orderable columns get null/min/max/approx-distinct; container
    * columns (array/map/struct) are NOT skipped — they get null counts
    * plus size quantiles (min/p50/max of the element count, or of the
    * non-null field count for structs), so profile parity holds on
    * nested tables too.
    */
  def violationsWithStats(df: DataFrame, schema: TableSchema, keyCols: Seq[String],
                          obs: Observation): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val checks = ConstraintCompiler.compile(schema, df.schema)
      .fold(e => throw new IllegalArgumentException(e), identity)
    // reduceOption: a schema that compiles to ZERO checks (all-permissive
    // properties) must profile cleanly, not throw empty.reduceLeft
    val anyViolation = !checks.map(_.ok).reduceOption(_ && _).getOrElse(lit(true))
    val statCols = df.schema.fields.toSeq.flatMap { f =>
      val n = f.name
      val c = col(n)
      def sizeStats(sz: Column) = Seq(
        sum(c.isNull.cast("long")).as(s"${n}__nulls"),
        min(sz).cast("long").as(s"${n}__size_min"),
        percentile_approx(sz.cast("double"), lit(0.5), lit(1000)).as(s"${n}__size_p50"),
        max(sz).cast("long").as(s"${n}__size_max"))
      f.dataType match {
        case _: ArrayType | _: MapType =>
          sizeStats(size(c)) // size(null) = null: null rows don't skew the quantile
        case st: StructType =>
          val present = ConstraintCompiler.structPresentCount(c, st)
          sizeStats(when(c.isNull, lit(null)).otherwise(present))
        case _ => Seq(
          sum(c.isNull.cast("long")).as(s"${n}__nulls"),
          min(c).cast("string").as(s"${n}__min"),
          max(c).cast("string").as(s"${n}__max"),
          approx_count_distinct(c).as(s"${n}__distinct"))
      }
    }
    val metrics = Seq(
      count(lit(1)).as("rows"),
      sum(when(anyViolation, 1L).otherwise(0L)).as("violating_rows")) ++ statCols
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    Validator.violationsForChecks(observed, checks, keyCols)
  }

  def result(df: DataFrame, obs: Observation): Result = {
    val m = obs.get
    val scalarCols = df.columns.toSeq.filter(n => m.contains(s"${n}__min"))
    val containerCols = df.columns.toSeq.filter(n => m.contains(s"${n}__size_min"))
    val allCols = scalarCols ++ containerCols
    Result(
      rows = m("rows").asInstanceOf[Long],
      violatingRows = m("violating_rows").asInstanceOf[Long],
      nullCounts = allCols.map(n => n -> m(s"${n}__nulls").asInstanceOf[Long]).toMap,
      mins = scalarCols.map(n => n -> Option(m(s"${n}__min")).map(_.toString).orNull).toMap,
      maxs = scalarCols.map(n => n -> Option(m(s"${n}__max")).map(_.toString).orNull).toMap,
      approxDistinct = scalarCols.map(n => n -> m(s"${n}__distinct").asInstanceOf[Long]).toMap,
      // a container column that is null on every row (or a zero-row
      // input) yields null min/p50/max — omit the entry rather than
      // unboxing null to a fabricated SizeStats(0, 0.0, 0)
      containerSizes = containerCols.flatMap { n =>
        (Option(m(s"${n}__size_min")), Option(m(s"${n}__size_p50")),
          Option(m(s"${n}__size_max"))) match {
          case (Some(mn), Some(p50), Some(mx)) =>
            Some(n -> SizeStats(mn.asInstanceOf[Long],
              p50.asInstanceOf[Double], mx.asInstanceOf[Long]))
          case _ => None
        }
      }.toMap)
  }
}

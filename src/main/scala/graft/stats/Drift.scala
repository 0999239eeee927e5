package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift checks (north_rule): KL divergence and PSI between
  * a reference snapshot and the current snapshot, over role/tool
  * histograms (low-cardinality `groupBy(col).count()`) and text-length
  * histograms (`width_bucket` style banding then `groupBy`).
  *
  * Histograms are distributed aggregations (partial combine before the
  * shuffle, so cardinality — not row count — bounds the shuffled bytes);
  * KL/PSI are computed driver-side on the two collected histograms,
  * which are tiny by construction.
  */
object Drift {

  /** Categorical histogram (roles, tools): one small shuffle keyed by
    * value. NULL becomes the "<null>" bucket.
    */
  def categoricalHistogram(df: DataFrame, column: String): DataFrame =
    df.groupBy(coalesce(col(column).cast("string"), lit("<null>")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Banded numeric histogram for text lengths etc.: bucket i covers
    * [i*width, (i+1)*width), capped at `buckets-1`.
    */
  def bandedHistogram(df: DataFrame, value: Column, width: Int, buckets: Int): DataFrame =
    df.groupBy(
      least(floor(value / width), lit(buckets - 1L)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  def textLengthHistogram(df: DataFrame, column: String = "text",
                          width: Int = 16, buckets: Int = 64): DataFrame =
    bandedHistogram(df, length(coalesce(col(column), lit(""))), width, buckets)

  /** KL(p || q) = sum p_i * ln(p_i / q_i), and
    * PSI = sum (p_i - q_i) * ln(p_i / q_i), over the union of buckets,
    * with epsilon-smoothing for empty buckets (standard PSI practice —
    * both measures are undefined on zero q).
    */
  def klPsi(p: Map[String, Long], q: Map[String, Long], eps: Double = 1e-9): (Double, Double) = {
    val keys = (p.keySet ++ q.keySet).toSeq.sorted
    val pTotal = p.values.sum.toDouble
    val qTotal = q.values.sum.toDouble
    require(pTotal > 0 && qTotal > 0, "empty histogram")
    var kl = 0.0
    var psi = 0.0
    keys.foreach { k =>
      val pi = math.max(p.getOrElse(k, 0L) / pTotal, eps)
      val qi = math.max(q.getOrElse(k, 0L) / qTotal, eps)
      val lr = math.log(pi / qi)
      kl += pi * lr
      psi += (pi - qi) * lr
    }
    (kl, psi)
  }

  /** Jensen-Shannon divergence in bits — symmetric (`jsd(p,q) ==
    * jsd(q,p)`) and bounded [0, 1], the report-friendly companion to
    * [[klPsi]]; same bucket union and epsilon smoothing. Accumulated in
    * nats with one divide by ln 2 at the end (the form the distributed
    * gate expression and the DuckDB oracle both replay exactly).
    */
  def jsd(p: Map[String, Long], q: Map[String, Long], eps: Double = 1e-9): Double = {
    val keys = (p.keySet ++ q.keySet).toSeq.sorted
    val pTotal = p.values.sum.toDouble
    val qTotal = q.values.sum.toDouble
    require(pTotal > 0 && qTotal > 0, "empty histogram")
    var acc = 0.0
    keys.foreach { k =>
      val pi = math.max(p.getOrElse(k, 0L) / pTotal, eps)
      val qi = math.max(q.getOrElse(k, 0L) / qTotal, eps)
      val m = (pi + qi) / 2.0
      acc += 0.5 * pi * math.log(pi / m) + 0.5 * qi * math.log(qi / m)
    }
    acc / math.log(2.0)
  }

  def collectHistogram(h: DataFrame): Map[String, Long] =
    // a null bucket (nulls in the histogrammed column) becomes its own
    // "<null>" key instead of NPEing the driver
    h.collect().map(r =>
      Option(r.get(0)).map(_.toString).getOrElse("<null>") -> r.getLong(1)).toMap

  /** End-to-end drift between two snapshots on a categorical column. */
  def categoricalDrift(current: DataFrame, reference: DataFrame, column: String): (Double, Double) =
    klPsi(
      collectHistogram(categoricalHistogram(current, column)),
      collectHistogram(categoricalHistogram(reference, column)))

  def textLengthDrift(current: DataFrame, reference: DataFrame): (Double, Double) =
    klPsi(
      collectHistogram(textLengthHistogram(current)),
      collectHistogram(textLengthHistogram(reference)))
}

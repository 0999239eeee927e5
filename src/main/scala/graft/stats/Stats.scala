package graft.stats

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.datasketches.tdigest.TDigestDouble
import org.apache.datasketches.memory.Memory

/** Column statistics (north_rule): count / null-rate / min / max /
  * distinct (HyperLogLog++ via Spark's built-in `approx_count_distinct`)
  * / approximate quantiles via a t-digest typed [[Aggregator]] wrapping
  * `datasketches-java`'s `TDigestDouble`.
  *
  * Everything runs in ONE wide `agg(...)` over the scan — the stats pass
  * shares the single-pass physical property of the validator (SURVEY.md
  * §4.4). The t-digest buffer is a live sketch object held by Spark's
  * ObjectHashAggregate; it serializes (kryo) only on spill/shuffle, and
  * partial sketches merge associatively across partitions — the same
  * merge tree a 1000-executor cluster would run.
  */
object Stats {

  /** t-digest quantile aggregator: IN = boxed column value (null =
    * missing), BUF = mutable sketch, OUT = quantiles at `probs`.
    */
  final class TDigestQuantiles(probs: Seq[Double], k: Short = TDigestDouble.DEFAULT_K)
      extends Aggregator[java.lang.Double, TDigestDouble, Array[Double]] {
    override def zero: TDigestDouble = new TDigestDouble(k)
    override def reduce(b: TDigestDouble, a: java.lang.Double): TDigestDouble = {
      if (a != null) b.update(a)
      b
    }
    override def merge(b1: TDigestDouble, b2: TDigestDouble): TDigestDouble = {
      b1.merge(b2); b1
    }
    override def finish(r: TDigestDouble): Array[Double] =
      if (r.isEmpty) Array.empty else probs.map(r.getQuantile).toArray
    override def bufferEncoder: Encoder[TDigestDouble] = Encoders.kryo[TDigestDouble]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** t-digest aggregator returning the serialized sketch, for mergeable
    * per-partition manifests.
    */
  final class TDigestSketch(k: Short = TDigestDouble.DEFAULT_K)
      extends Aggregator[java.lang.Double, TDigestDouble, Array[Byte]] {
    override def zero: TDigestDouble = new TDigestDouble(k)
    override def reduce(b: TDigestDouble, a: java.lang.Double): TDigestDouble = {
      if (a != null) b.update(a); b
    }
    override def merge(b1: TDigestDouble, b2: TDigestDouble): TDigestDouble = {
      b1.merge(b2); b1
    }
    override def finish(r: TDigestDouble): Array[Byte] = r.toByteArray
    override def bufferEncoder: Encoder[TDigestDouble] = Encoders.kryo[TDigestDouble]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Quantile column built from the typed aggregator. */
  def quantileAgg(c: Column, probs: Seq[Double]): Column = {
    val agg = udaf(new TDigestQuantiles(probs), Encoders.DOUBLE)
    agg(c.cast("double"))
  }

  /** Serialized-sketch column (for mergeable per-partition manifests). */
  def sketchAgg(c: Column): Column = {
    val agg = udaf(new TDigestSketch(), Encoders.DOUBLE)
    agg(c.cast("double"))
  }

  def deserializeTDigest(bytes: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(bytes))

  val defaultProbs: Seq[Double] = Seq(0.5, 0.9, 0.99)

  /** One-pass profile: a single wide `agg` producing, per column,
    * count / nullCount / min / max / approxDistinct (+ quantiles for
    * numeric columns). Output is one row; [[profileLong]] reshapes it to
    * one row per column for reporting and oracle checks.
    */
  def profileAggs(df: DataFrame, columns: Seq[String], withQuantiles: Boolean = true): Seq[Column] = {
    val total = count(lit(1)).as("__total")
    val perCol = columns.flatMap { name =>
      val f = df.schema(name)
      val c = col(name)
      val base = Seq(
        sum(c.isNull.cast("long")).as(s"${name}__nulls"),
        min(c).cast("string").as(s"${name}__min"),
        max(c).cast("string").as(s"${name}__max"),
        approx_count_distinct(c).as(s"${name}__distinct"))
      val q = f.dataType match {
        case _: NumericType if withQuantiles =>
          Seq(quantileAgg(c, defaultProbs).as(s"${name}__quantiles"))
        case _ => Nil
      }
      base ++ q
    }
    total +: perCol
  }

  def profile(df: DataFrame, columns: Seq[String], withQuantiles: Boolean = true): DataFrame = {
    val aggs = profileAggs(df, columns, withQuantiles)
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Rows whose `valueExpr` (any SQL expression over the row) reaches
    * the corpus's exact q-quantile — the quality-cutoff primitive
    * ("keep docs above the median quality score"). The threshold comes
    * from ONE exact-percentile aggregation (interpolated; equal to
    * quantile_cont, as the stats_quantiles gate proves) attached by a
    * broadcast cross-join of a single row, so the filter itself stays
    * a map-side scan.
    *
    * The caller chooses the threshold estimator explicitly — there is
    * deliberately NO default (a scale-trap flagged in round 3): the
    * exact form buffers one entry per DISTINCT value of `valueExpr` on
    * the final reducer — fine for low-cardinality measures (lengths,
    * counts, bucketed scores) and for oracle replays, wrong for a
    * continuous score over a 100-TB corpus. [[aboveQuantileApprox]] is
    * the production form there: approx_percentile is a bounded-memory
    * mergeable sketch with the identical plan shape.
    */
  def aboveQuantileExact(df: DataFrame, valueExpr: String, q: Double): DataFrame =
    aboveQuantileWith(df, valueExpr, s"percentile($valueExpr, $q)", q)

  /** Scale-safe quantile cutoff: bounded-memory t-digest-style sketch
    * threshold (`accuracy` trades memory for error, Spark default 10k).
    * Same plan shape as [[aboveQuantileExact]]; the kept set can differ
    * from exact only for rows between the true and sketched quantile
    * (StatsSpec pins the band on a continuous score).
    */
  def aboveQuantileApprox(df: DataFrame, valueExpr: String, q: Double,
                          accuracy: Int = 10000): DataFrame =
    aboveQuantileWith(df, valueExpr, s"approx_percentile($valueExpr, $q, $accuracy)", q)

  private def aboveQuantileWith(df: DataFrame, valueExpr: String,
                                thrExpr: String, q: Double): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    val thr = df.agg(expr(thrExpr).as("__thr"))
    df.crossJoin(broadcast(thr))
      .filter(expr(valueExpr).cast("double") >= col("__thr").cast("double"))
      .drop("__thr")
  }

  /** Per-GROUP quantile cutoff (the CCNet per-language form of
    * [[aboveQuantileExact]]): a row is kept iff `valueExpr` reaches the
    * q-quantile of its OWN group's distribution — one threshold per
    * language/domain/source, so a low-resource group is not filtered
    * against the dominant group's distribution. A NULL group is a
    * group like any other (null-safe threshold join), not a silent
    * drop.
    *
    * Scale shape: thresholds come from ONE groupBy(group) percentile
    * aggregation — |groups| rows, broadcast-sized by construction —
    * attached with a broadcast null-safe equi-join; the filter stays a
    * map-side scan. Same explicit Exact/Approx split as the global
    * cutoffs: exact buffers one entry per DISTINCT value per group on
    * the reducers — fine for low-cardinality measures and oracle
    * replays; [[aboveQuantileByGroupApprox]] is the production form
    * for a continuous score over a 100-TB corpus.
    */
  def aboveQuantileByGroupExact(df: DataFrame, valueExpr: String, q: Double,
                                groupCol: String): DataFrame =
    aboveQuantileByGroupWith(df, valueExpr, s"percentile($valueExpr, $q)", q, groupCol)

  /** Bounded-memory sketch form of [[aboveQuantileByGroupExact]]
    * (approx_percentile partial-aggregates map-side per group).
    */
  def aboveQuantileByGroupApprox(df: DataFrame, valueExpr: String, q: Double,
                                 groupCol: String, accuracy: Int = 10000): DataFrame =
    aboveQuantileByGroupWith(df, valueExpr,
      s"approx_percentile($valueExpr, $q, $accuracy)", q, groupCol)

  private def aboveQuantileByGroupWith(df: DataFrame, valueExpr: String,
                                       thrExpr: String, q: Double,
                                       groupCol: String): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    require(!df.columns.contains("__grp") && !df.columns.contains("__thr"),
      "input already carries a __grp/__thr column; rename it before the cutoff")
    val thr = df.groupBy(col(groupCol).as("__grp")).agg(expr(thrExpr).as("__thr"))
    df.join(broadcast(thr), col(groupCol) <=> col("__grp"))
      .filter(expr(valueExpr).cast("double") >= col("__thr").cast("double"))
      .drop("__grp", "__thr")
  }

  /** Per-group z-score outlier detection: rows whose value sits
    * `threshold` or more POPULATION standard deviations from their own
    * group's mean — the monitoring companion to the drift statistics
    * (drift says the distribution moved; this names the rows). The
    * variance is computed two-pass (per-group mean first, then summed
    * squared deviations from it) — numerically safe where the one-pass
    * moment identity cancels catastrophically; degenerate groups (zero
    * variance, single row) flag nothing rather than dividing by zero.
    * Null values are never outliers.
    *
    * Scale shape: one map-side-combining moments aggregation to
    * |groups| rows, broadcast back (null-safe join, a NULL group is a
    * group); the flagging filter stays a map-side scan. Output keeps
    * the input schema plus a rounded `zscore` column.
    */
  def zscoreOutliers(df: DataFrame, valueCol: String, groupCol: String,
                     threshold: Double = 3.0): DataFrame = {
    require(threshold > 0.0, s"threshold must be positive, got $threshold")
    require(!df.columns.exists(Set("__grp", "__m", "__ss", "__n", "zscore")),
      "input already carries a __grp/__m/__ss/__n/zscore column; rename it first")
    val v = col(valueCol).cast("double")
    // Two-pass centered variance: pass 1 gets the per-group mean, pass 2
    // sums squared deviations FROM that mean. The one-pass identity
    // E[v^2]-E[v]^2 suffers catastrophic cancellation for groups with
    // large mean and small relative variance (epoch-like values collapse
    // the variance to 0 and flag nothing); centering first keeps every
    // addend small. Both passes are map-side-combining aggregations to
    // |groups| rows, so the extra scan buys numerical safety without a
    // data-sized shuffle. Sum of squares is >= 0 by construction — no
    // greatest(...,0) clamp to hide a failure behind.
    val means = df.groupBy(col(groupCol).as("__grp"))
      .agg((sum(v) / count(v)).as("__m"), // count(v): nulls don't shrink the mean
        count(v).as("__n"))
    val moments = df.join(broadcast(means), col(groupCol) <=> col("__grp"))
      .groupBy(col("__grp"), col("__m"), col("__n")) // __m/__n fold into the __grp key
      .agg(sum((v - col("__m")) * (v - col("__m"))).as("__ss"))
    val mean = col("__m")
    val sd = sqrt(col("__ss") / col("__n"))
    df.join(broadcast(moments), col(groupCol) <=> col("__grp"))
      .filter(sd > 0.0 && v.isNotNull && abs((v - mean) / sd) >= threshold)
      .withColumn("zscore", round((v - mean) / sd, 6))
      .drop("__grp", "__m", "__ss", "__n")
  }

  /** Per-group CDF (rank) normalization: each row gains the fraction of
    * its group strictly below its value — the score-calibration
    * transform that makes thresholds comparable across groups with
    * different score distributions (a 0.9 means the same thing in
    * every language). `cdf = |{v' < v}| / n`, exact integer counts, so
    * the output is bit-deterministic (no percentile interpolation).
    * Rows with a null group or value are excluded (no rank is
    * defined for them).
    *
    * Scale shape: the ranking window runs over the AGGREGATED
    * (group, value, count) table — partition sizes bounded by distinct
    * values per group, never row counts — and the result joins back by
    * (group, value); totals are a |groups|-row aggregate. The classic
    * unscalable form (percent_rank over raw rows) shuffles and sorts
    * the full table per group; this shape only ever sorts distinct
    * values.
    */
  def cdfByGroup(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    require(!df.columns.exists(Set("__g", "__g2", "__v", "__c", "__below", "__n", "cdf")),
      "input already carries a __g/__g2/__v/__c/__below/__n/cdf column; rename it first")
    val vc = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__g").orderBy("__v")
    val cum = vc.withColumn("__below", sum(col("__c")).over(w) - col("__c"))
    val tot = vc.groupBy("__g").agg(sum(col("__c")).as("__n"))
    df.join(cum, col(groupCol) === col("__g") && col(valueCol) === col("__v"))
      .join(broadcast(tot.withColumnRenamed("__g", "__g2")), col(groupCol) === col("__g2"))
      .withColumn("cdf", round(col("__below").cast("double") / col("__n"), 6))
      .drop("__g", "__v", "__c", "__below", "__g2", "__n")
  }

  /** Quantile-bucket assignment (the CCNet head/middle/tail shape):
    * split rows into `labels.size` buckets at the quantile fractions
    * `qs` of `valueExpr` — labels ordered LOW to HIGH score, a row
    * lands in the highest bucket whose threshold it meets (`>=`, the
    * same boundary [[aboveQuantileExact]] uses; a NULL score meets no
    * threshold and lands in the lowest bucket). ONE exact-percentile
    * aggregation computes every threshold, broadcast into a map-side
    * CASE — same plan shape as the cutoff, one extra column out.
    *
    * Same estimator caveat as the cutoffs: exact buffers distinct
    * values on one reducer — use [[bucketByQuantilesApprox]] for a
    * continuous score over a 100-TB corpus.
    */
  def bucketByQuantilesExact(df: DataFrame, valueExpr: String, qs: Seq[Double],
                             labels: Seq[String]): DataFrame =
    bucketWith(df, valueExpr,
      s"percentile($valueExpr, array(${qs.mkString(",")}))", qs, labels)

  /** Bounded-memory sketch form of [[bucketByQuantilesExact]]. */
  def bucketByQuantilesApprox(df: DataFrame, valueExpr: String, qs: Seq[Double],
                              labels: Seq[String], accuracy: Int = 10000): DataFrame =
    bucketWith(df, valueExpr,
      s"approx_percentile($valueExpr, array(${qs.mkString(",")}), $accuracy)", qs, labels)

  private def bucketWith(df: DataFrame, valueExpr: String, thrExpr: String,
                         qs: Seq[Double], labels: Seq[String]): DataFrame = {
    require(labels.size == qs.size + 1,
      s"need ${qs.size + 1} labels for ${qs.size} thresholds, got ${labels.size}")
    require(qs == qs.sorted && qs.forall(q => q > 0.0 && q < 1.0),
      s"quantile fractions must be sorted and in (0,1), got $qs")
    val thr = df.agg(expr(thrExpr).as("__thrs"))
    val v = expr(valueExpr).cast("double")
    // outermost WHEN checks the highest threshold: bucket = last label
    // whose threshold the value meets
    val assign = labels.zipWithIndex.tail.foldLeft(lit(labels.head)) {
      case (acc, (lab, i)) =>
        when(v >= col("__thrs").getItem(i - 1).cast("double"), lit(lab)).otherwise(acc)
    }
    df.crossJoin(broadcast(thr)).withColumn("bucket", assign).drop("__thrs")
  }

  /** Long-format profile: (column, count, null_count, min, max,
    * approx_distinct) — one row per column, all from the single agg row.
    */
  def profileLong(df: DataFrame, columns: Seq[String]): DataFrame = {
    val wide = profile(df, columns, withQuantiles = false)
    val structs = columns.map { name =>
      struct(
        lit(name).as("column"),
        col("__total").as("cnt"),
        col(s"${name}__nulls").as("null_count"),
        col(s"${name}__min").as("min_value"),
        col(s"${name}__max").as("max_value"),
        col(s"${name}__distinct").as("approx_distinct"))
    }
    wide.select(explode(array(structs: _*)).as("s")).select(col("s.*"))
  }
}

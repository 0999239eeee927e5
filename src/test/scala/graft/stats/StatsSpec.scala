package graft.stats

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.TranscriptGen

/** Stats + drift golden tests (FIXTURES.md §4 clean-100 exact stats,
  * drift-pair hand-computed KL/PSI to 1e-9).
  */
class StatsSpec extends AnyFlatSpec with Matchers {

  private lazy val spark = SparkTestBase.spark

  "Stats" should "compute exact count/null/min/max and HLL distinct on clean-100" in {
    val df = TranscriptGen.generate(spark, 10, 10)
    val rows = Stats.profileLong(df, Seq("conv_id", "turn_idx", "role", "tool"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap

    rows("conv_id").getAs[Long]("cnt") shouldBe 100L
    rows("conv_id").getAs[Long]("null_count") shouldBe 0L
    rows("turn_idx").getAs[String]("min_value") shouldBe "0"
    rows("turn_idx").getAs[String]("max_value") shouldBe "9"
    rows("turn_idx").getAs[Long]("approx_distinct") shouldBe 10L // HLL exact at tiny n
    rows("role").getAs[Long]("approx_distinct") shouldBe 4L
    // tool is null except on tool turns
    rows("tool").getAs[Long]("null_count") should be > 50L
  }

  it should "compute t-digest quantiles within tolerance in one agg" in {
    import spark.implicits._
    val df = spark.range(1, 10001).select(col("id").cast("double").as("v"))
    val q = df.agg(Stats.quantileAgg(col("v"), Seq(0.5, 0.9, 0.99)).as("q"))
      .collect()(0).getAs[scala.collection.Seq[Double]]("q")
    q(0) shouldBe 5000.0 +- 100.0
    q(1) shouldBe 9000.0 +- 100.0
    q(2) shouldBe 9900.0 +- 50.0
  }

  it should "merge serialized t-digest sketches associatively" in {
    import spark.implicits._
    val df = spark.range(0, 10000).select((col("id") % 100).cast("double").as("v"),
      (col("id") % 4).as("part"))
    val sketches = df.groupBy("part").agg(Stats.sketchAgg(col("v")).as("sk"))
      .collect().map(_.getAs[Array[Byte]]("sk"))
    sketches.length shouldBe 4
    val merged = sketches.map(Stats.deserializeTDigest).reduce { (a, b) => a.merge(b); a }
    merged.getTotalWeight shouldBe 10000L
    merged.getQuantile(0.5) shouldBe 50.0 +- 3.0
  }

  "Drift" should "match hand-computed KL and PSI to 1e-9" in {
    val p = Map("a" -> 50L, "b" -> 50L)
    val q = Map("a" -> 25L, "b" -> 75L)
    val (kl, psi) = Drift.klPsi(p, q)
    val expectedKl = 0.5 * math.log(0.5 / 0.25) + 0.5 * math.log(0.5 / 0.75)
    val expectedPsi = (0.5 - 0.25) * math.log(0.5 / 0.25) + (0.5 - 0.75) * math.log(0.5 / 0.75)
    kl shouldBe expectedKl +- 1e-9
    psi shouldBe expectedPsi +- 1e-9
  }

  "Stats.cdfByGroup" should "rank each row against its own group's exact CDF" in {
    import spark.implicits._
    // group a values 10,20,20,40 -> cdf 0, .25, .25, .75; group b 5 -> 0
    val df = Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("a"), Some(20L)),
      (3L, Some("a"), Some(20L)), (4L, Some("a"), Some(40L)),
      (5L, Some("b"), Some(5L)),
      (6L, None, Some(9L)), (7L, Some("a"), None) // null group/value: excluded
    ).toDF("id", "grp", "v")
    val got = Stats.cdfByGroup(df, "v", "grp")
      .select("id", "cdf").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    got shouldBe Map(1L -> 0.0, 2L -> 0.25, 3L -> 0.25, 4L -> 0.75, 5L -> 0.0)
    // schema passes through plus cdf
    Stats.cdfByGroup(df, "v", "grp").columns.toSeq shouldBe Seq("id", "grp", "v", "cdf")
  }

  "Stats.zscoreOutliers" should "flag rows by their own group's population sigma" in {
    import spark.implicits._
    // group a: 0,0,0,10 -> mean 2.5, var 18.75, sd ~4.33, z(10) ~1.732
    // group b: constant -> sd 0, flags nothing; null value never flags
    val df = Seq(
      (1L, "a", Some(0.0)), (2L, "a", Some(0.0)), (3L, "a", Some(0.0)),
      (4L, "a", Some(10.0)), (5L, "b", Some(7.0)), (6L, "b", Some(7.0)),
      (7L, "a", None)
    ).toDF("id", "grp", "v")
    Stats.zscoreOutliers(df, "v", "grp", threshold = 3.0).count() shouldBe 0L
    val hit = Stats.zscoreOutliers(df, "v", "grp", threshold = 1.5)
      .select("id", "zscore").collect().map(r => (r.getLong(0), r.getDouble(1)))
    hit.map(_._1).toSeq shouldBe Seq(4L)
    hit.head._2 shouldBe (7.5 / math.sqrt(18.75) +- 1e-6)
    // schema passes through plus the zscore column
    Stats.zscoreOutliers(df, "v", "grp").columns.toSeq shouldBe Seq("id", "grp", "v", "zscore")
  }

  it should "match hand-computed JSD, stay symmetric and bounded" in {
    val p = Map("a" -> 50L, "b" -> 50L)
    val q = Map("a" -> 25L, "b" -> 75L)
    def side(x: Double, m: Double) = 0.5 * x * math.log(x / m)
    val expected = (side(0.5, 0.375) + side(0.25, 0.375) +
      side(0.5, 0.625) + side(0.75, 0.625)) / math.log(2.0)
    Drift.jsd(p, q) shouldBe expected +- 1e-9
    Drift.jsd(p, q) shouldBe Drift.jsd(q, p) // symmetric, unlike KL
    Drift.jsd(p, p) shouldBe 0.0 +- 1e-12
    // disjoint supports approach the 1-bit bound (eps keeps it finite)
    val d = Drift.jsd(Map("a" -> 1L), Map("b" -> 1L))
    d should be > 0.99
    d should be <= 1.0 + 1e-9
  }

  it should "hold the JSD/KL invariants on random histograms (property)" in {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val hist: Gen[Map[String, Long]] = Gen.nonEmptyMap(
      Gen.zip(Gen.stringOfN(3, Gen.alphaChar), Gen.chooseNum(1L, 1000L)))
    val p = Prop.forAll(hist, hist) { (a, b) =>
      val d = Drift.jsd(a, b)
      val (kl, _) = Drift.klPsi(a, b)
      d >= 0.0 && d <= 1.0 + 1e-9 &&                  // bounded
        math.abs(d - Drift.jsd(b, a)) < 1e-12 &&      // symmetric
        Drift.jsd(a, a) < 1e-12 &&                    // identity
        kl >= -1e-9                                   // Gibbs (within smoothing)
    }
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(300), p)
    withClue(r.status.toString)(r.passed shouldBe true)
  }

  it should "be ~zero for identical snapshots and positive for shifted ones" in {
    val a = TranscriptGen.generate(spark, 50, 10)
    val b = TranscriptGen.generate(spark, 50, 10, TranscriptGen.Defects(badEnumRole = true, nullRole = true))
    val (klSame, psiSame) = Drift.categoricalDrift(a, a, "role")
    klSame shouldBe 0.0 +- 1e-12
    psiSame shouldBe 0.0 +- 1e-12
    val (klShift, psiShift) = Drift.categoricalDrift(b, a, "role")
    klShift should be > 0.0
    psiShift should be > 0.0
  }

  it should "measure text-length drift through banded histograms" in {
    val a = TranscriptGen.generate(spark, 50, 10)
    val b = TranscriptGen.generate(spark, 50, 10, TranscriptGen.Defects(emptyText = true))
    val (kl, _) = Drift.textLengthDrift(b, a)
    kl should be > 0.0
    val (klSame, _) = Drift.textLengthDrift(a, a)
    klSame shouldBe 0.0 +- 1e-12
  }

  "Stats.aboveQuantileExact" should "cut at the exact interpolated quantile" in {
    import spark.implicits._
    val df = (1 to 10).toDF("v")
    // quantile_cont semantics: the 0.5-quantile of 1..10 is 5.5
    val kept = Stats.aboveQuantileExact(df, "v", 0.5)
      .collect().map(_.getInt(0)).sorted
    kept shouldBe Array(6, 7, 8, 9, 10)
    // q=0 keeps everything; an expression (not a bare column) works too
    Stats.aboveQuantileExact(df, "v * 2", 0.0).count() shouldBe 10
  }

  "Stats.aboveQuantileApprox" should "keep a set within a band of exact on a continuous score" in {
    import spark.implicits._
    // continuous score with all-distinct values: the shape the exact
    // form must NOT be used on at scale (one reducer entry per value)
    val df = (1 to 5000).map(i => math.sin(i.toDouble) * 1000 + i * 0.001).toDF("score")
    val exact = Stats.aboveQuantileExact(df, "score", 0.9).count()
    val approx = Stats.aboveQuantileApprox(df, "score", 0.9).count()
    // sketch error moves the cutoff only within a small rank band
    math.abs(approx - exact).toDouble should be <= (0.01 * 5000)
    // and at default accuracy on this size the sketch is rank-exact
    // for the vast majority of draws; sanity: keeps roughly 10%
    approx.toDouble shouldBe (500.0 +- 50.0)
  }

  "Stats.bucketByQuantilesExact" should "assign terciles with >= boundaries, nulls lowest" in {
    import spark.implicits._
    // 1..9: terciles at quantile_cont(1/3)=11/3~3.67 and (2/3)=19/3~6.33
    val df = ((1 to 9).map(Some(_)) :+ None).toDF("v")
    val got = Stats.bucketByQuantilesExact(df, "v", Seq(1.0 / 3, 2.0 / 3),
        Seq("tail", "middle", "head"))
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    val want = Set(
      Some(1) -> "tail", Some(2) -> "tail", Some(3) -> "tail",
      Some(4) -> "middle", Some(5) -> "middle", Some(6) -> "middle",
      Some(7) -> "head", Some(8) -> "head", Some(9) -> "head",
      None -> "tail") // null meets no threshold -> lowest bucket
    got shouldBe want.map { case (k, v) => (k: Option[Any], v) }
    // a value exactly AT a threshold goes up: with 0..10 the median is 5
    val at = Stats.bucketByQuantilesExact((0 to 10).toDF("v"), "v", Seq(0.5),
        Seq("lo", "hi"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    at(5) shouldBe "hi"
    at(4) shouldBe "lo"
  }

  "Stats.aboveQuantileByGroupExact" should "judge each row against its own group's quantile" in {
    import spark.implicits._
    // group a: 1..4, median (quantile_cont 0.5) = 2.5 -> keeps 3, 4
    // group b: 10,20, median = 15 -> keeps 20
    // null group is a group of its own: 100,200 -> keeps 200
    val df = Seq(
      (1L, Some("a"), 1.0), (2L, Some("a"), 2.0), (3L, Some("a"), 3.0), (4L, Some("a"), 4.0),
      (5L, Some("b"), 10.0), (6L, Some("b"), 20.0),
      (7L, None, 100.0), (8L, None, 200.0)
    ).toDF("id", "grp", "score")
    val kept = Stats.aboveQuantileByGroupExact(df, "score", 0.5, "grp")
      .select("id").as[Long].collect().sorted
    kept.toSeq shouldBe Seq(3L, 4L, 6L, 8L)
    // the output keeps the input schema (threshold plumbing dropped)
    Stats.aboveQuantileByGroupExact(df, "score", 0.5, "grp").columns.toSeq shouldBe
      Seq("id", "grp", "score")
  }

  "Stats.aboveQuantileByGroupApprox" should "track exact within a rank band per group" in {
    import spark.implicits._
    val df = (1 to 4000).map { i =>
      (i.toLong, s"g${i % 4}", math.sin(i.toDouble) * 1000 + i * 0.001)
    }.toDF("id", "grp", "score")
    val exact = Stats.aboveQuantileByGroupExact(df, "score", 0.9, "grp").count()
    val approx = Stats.aboveQuantileByGroupApprox(df, "score", 0.9, "grp").count()
    math.abs(approx - exact).toDouble should be <= (0.01 * 4000)
  }

  "Stats.bucketByQuantilesApprox" should "track the exact buckets within a rank band" in {
    import spark.implicits._
    // continuous all-distinct score: the production shape for the
    // approx form (exact would put every value on one reducer)
    val df = (1 to 5000).map(i => math.sin(i.toDouble) * 1000 + i * 0.001).toDF("score")
    val labels = Seq("tail", "middle", "head")
    def counts(out: org.apache.spark.sql.DataFrame) =
      out.groupBy("bucket").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = counts(Stats.bucketByQuantilesExact(df, "score", Seq(1.0 / 3, 2.0 / 3), labels))
    val approx = counts(Stats.bucketByQuantilesApprox(df, "score", Seq(1.0 / 3, 2.0 / 3), labels))
    labels.foreach { l =>
      math.abs(approx(l) - exact(l)).toDouble should be <= (0.01 * 5000)
    }
    // int-typed column: approx_percentile is type-preserving (returns
    // actual INT data values, no interpolation) — the threshold cast in
    // bucketWith must still assign every value and respect ordering
    val ints = ((1 to 9).map(Some(_)) :+ None).toDF("v")
    val gotInt = Stats.bucketByQuantilesApprox(ints, "v", Seq(1.0 / 3, 2.0 / 3), labels)
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toMap
    gotInt(None) shouldBe "tail" // null meets no threshold -> lowest
    gotInt(Some(1)) shouldBe "tail"
    gotInt(Some(9)) shouldBe "head"
    // bucket assignment is monotone in v
    val order = labels.zipWithIndex.toMap
    (1 to 8).foreach { v =>
      order(gotInt(Some(v))) should be <= order(gotInt(Some(v + 1)))
    }
  }
}

package graft.integrity

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.TranscriptGen

/** Uniqueness + referential fixtures with planted duplicates/orphans and
  * a skewed conv_id (FIXTURES.md §4 skew-50k): the salted anti join must
  * produce identical results to the unsalted one.
  */
class IntegritySpec extends AnyFlatSpec with Matchers {

  private lazy val spark = SparkTestBase.spark

  "Integrity" should "find exactly the planted duplicate keys" in {
    val df = TranscriptGen.generate(spark, 20, 10, TranscriptGen.Defects(duplicates = true))
    val dups = Integrity.duplicateKeys(df, Seq("conv_id", "turn_idx")).collect()
    dups.length should be > 0
    all(dups.map(_.getLong(2))) shouldBe 2L // each planted dup re-emitted once
    // clean data has none
    val clean = TranscriptGen.generate(spark, 20, 10)
    Integrity.duplicateKeys(clean, Seq("conv_id", "turn_idx")).count() shouldBe 0
  }

  it should "emit uniqueness violations with key pointers" in {
    val df = TranscriptGen.generate(spark, 20, 10, TranscriptGen.Defects(duplicates = true))
    val v = Integrity.uniquenessViolations(df, Seq("conv_id", "turn_idx")).collect()
    v.length should be > 0
    val first = v.head
    first.getAs[String]("constraint") shouldBe "uniqueItems"
    first.getAs[String]("pointer") shouldBe
      s"/${first.getAs[String]("conv_id")}/turn_idx"
    first.getAs[String]("actual") shouldBe "count=2"
  }

  it should "find exactly the planted orphan conversations" in {
    val df = TranscriptGen.generate(spark, 100, 5, TranscriptGen.Defects(orphans = true))
    val orphanRows = Integrity.referentialViolations(df).collect()
    // ghosts: numConvs/50 * 3 rows = 2 * 3
    orphanRows.length shouldBe 6
    all(orphanRows.map(_.getAs[String]("constraint"))) shouldBe "ref"
    all(orphanRows.map(_.getAs[Int]("turn_idx"))) should be >= 1
    // conv ids beyond the generated range
    all(orphanRows.map(_.getAs[String]("conv_id").drop(1).toLong)) should be >= 100L
  }

  it should "produce identical orphans salted vs unsalted under skew" in {
    val df = TranscriptGen.generate(spark, 1000, 50,
      TranscriptGen.Defects(orphans = true), skewTopConvFraction = 0.2).cache()
    try {
      val reg = Integrity.conversationRegistry(df)
      val plain = Integrity.orphans(df, reg, "conv_id")
        .select("conv_id", "turn_idx").collect().map(_.toString).sorted
      val salted = Integrity.saltedOrphans(df, reg, "conv_id", col("turn_idx"), salt = 16)
        .select("conv_id", "turn_idx").collect().map(_.toString).sorted
      salted shouldBe plain
      plain.length should be > 0
    } finally df.unpersist()
  }

  it should "produce identical duplicate counts salted vs unsalted under skew" in {
    val df = TranscriptGen.generate(spark, 500, 20,
      TranscriptGen.Defects(duplicates = true), skewTopConvFraction = 0.2).cache()
    try {
      val plain = Integrity.duplicateKeys(df, Seq("conv_id", "turn_idx"))
        .collect().map(_.toString).sorted
      val salted = Integrity.saltedDuplicateKeys(df, Seq("conv_id", "turn_idx"),
        col("text"), salt = 16).collect().map(_.toString).sorted
      salted shouldBe plain
      plain.length should be > 0
    } finally df.unpersist()
  }

  it should "verify the skew fixture actually is skewed (top conv ~20%)" in {
    val df = TranscriptGen.generate(spark, 1000, 50, skewTopConvFraction = 0.2)
    val top = df.groupBy("conv_id").count().orderBy(desc("count")).first()
    top.getAs[String]("conv_id") shouldBe "c0"
    top.getAs[Long]("count").toDouble / (1000 * 50) shouldBe 0.2 +- 0.02
  }

  "Integrity.turnContiguity" should "flag gaps, duplicates, and non-zero roots only" in {
    import spark.implicits._
    val df = Seq(
      ("ok", Some(0)), ("ok", Some(1)), ("ok", Some(2)),   // contiguous: clean
      ("gap", Some(0)), ("gap", Some(2)),                  // hole at 1
      ("dup", Some(0)), ("dup", Some(1)), ("dup", Some(1)),// duplicate index
      ("root", Some(1)), ("root", Some(2)),                // missing 0 root
      ("nulls", None), ("nulls", None),                    // all-null idx: flagged (n_distinct 0 != n)
      ("mixed", Some(0)), ("mixed", None)                  // partial null: flagged
    ).toDF("conv_id", "turn_idx")
    val flagged = Integrity.turnContiguity(df)
      .select("conv_id").as[String].collect().sorted.toSeq
    flagged shouldBe Seq("dup", "gap", "mixed", "nulls", "root")
  }

  "Integrity.functionalDependencyViolations" should "name determinants with >1 dependent value" in {
    import spark.implicits._
    val df = Seq(("s1", "en"), ("s1", "en"), ("s2", "en"), ("s2", "de"), ("s2", "fr"))
      .toDF("source", "lang")
    val got = Integrity.functionalDependencyViolations(df, "source", "lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    got shouldBe List(("s2", 3L, 3L))
  }
}

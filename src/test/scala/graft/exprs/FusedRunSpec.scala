package graft.exprs

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.Observation
import graft.SparkTestBase
import graft.compile.TableSchemaCompiler
import graft.integrity.Integrity
import graft.sources.TranscriptGen

/** Single-pass fusion: violations + full stats profile from ONE scan
  * (observe), and both integrity checks from ONE full-data shuffle.
  */
class FusedRunSpec extends AnyFlatSpec with Matchers {

  private lazy val spark = SparkTestBase.spark
  private val schema = TableSchemaCompiler
    .compileString(graft.compile.Fixtures.flagshipSchema).toOption.get

  it should "profile cleanly when the schema compiles to zero checks" in {
    // an all-permissive schema used to throw empty.reduceLeft before
    // any row was scanned
    val df = graft.sources.TranscriptGen.generate(spark, 5, 4)
    val permissive = TableSchemaCompiler
      .compileString("""{"type":"object","properties":{"text":{}}}""").toOption.get
    val obs = Observation()
    FusedRun.violationsWithStats(df, permissive, Seq("conv_id", "turn_idx"), obs)
      .count() shouldBe 0L
  }

  "FusedRun" should "deliver violations and stats from one scan" in {
    val df = TranscriptGen.generate(spark, 20, 10,
      TranscriptGen.Defects(badEnumRole = true, nullRole = true))
    val obs = Observation()
    val vios = FusedRun.violationsWithStats(df, schema, Seq("conv_id", "turn_idx"), obs)
    val nVios = vios.count()
    val r = FusedRun.result(df, obs)
    r.rows shouldBe 200L
    r.violatingRows should be > 0L
    r.violatingRows should be <= nVios // one row can carry 2 violations
    r.nullCounts("role") should be > 0L
    r.nullCounts("conv_id") shouldBe 0L
    r.mins("turn_idx") shouldBe "0"
    r.maxs("turn_idx") shouldBe "9"
    r.approxDistinct("turn_idx") shouldBe 10L
    // exactly one scan in the physical plan
    val scans = "Scan |FileScan".r.findAllIn(vios.queryExecution.executedPlan.toString).size
    scans should be <= 1
  }

  it should "profile container columns with null counts and size quantiles" in {
    import spark.implicits._
    import NestedColumnSpec.Meta
    val df = Seq(
      ("c1", 0, Seq("a", "b"), Map("k" -> "v"), Meta("a", "ok", null, null)),
      ("c1", 1, Seq("a"), Map("k" -> "v", "j" -> "w"), Meta("a", null, null, null)),
      ("c1", 2, null.asInstanceOf[Seq[String]], Map.empty[String, String],
        null.asInstanceOf[Meta]),
      ("c1", 3, Seq("a", "b", "c", "d"), null.asInstanceOf[Map[String, String]],
        Meta("a", "x", "1", "z"))
    ).toDF("conv_id", "turn_idx", "tags", "attrs", "meta")
    val nestedSchema = TableSchemaCompiler.compileString("""
      { "type": "object", "required": ["conv_id", "turn_idx"],
        "properties": {
          "conv_id": { "type": "string" }, "turn_idx": { "type": "integer" },
          "tags": { "type": "array", "maxItems": 10 } } }""").toOption.get
    val obs = Observation()
    FusedRun.violationsWithStats(df, nestedSchema, Seq("conv_id", "turn_idx"), obs).count()
    val r = FusedRun.result(df, obs)
    r.nullCounts("tags") shouldBe 1L
    r.nullCounts("attrs") shouldBe 1L
    r.nullCounts("meta") shouldBe 1L
    r.containerSizes("tags") shouldBe FusedRun.SizeStats(1, 2.0, 4)
    r.containerSizes("attrs") shouldBe FusedRun.SizeStats(0, 1.0, 2)
    // struct "size" = non-null field count: 2, 1, (null), 4
    r.containerSizes("meta") shouldBe FusedRun.SizeStats(1, 2.0, 4)
    // scalar columns still fully profiled alongside
    r.mins("turn_idx") shouldBe "0"
    r.approxDistinct("conv_id") shouldBe 1L
  }

  it should "omit size stats (not fabricate zeros) for an all-null container column" in {
    import spark.implicits._
    val df = Seq(
      ("c1", 0, null.asInstanceOf[Seq[String]]),
      ("c1", 1, null.asInstanceOf[Seq[String]])
    ).toDF("conv_id", "turn_idx", "tags")
    val s = TableSchemaCompiler.compileString("""
      { "type": "object", "required": ["conv_id", "turn_idx"],
        "properties": { "conv_id": { "type": "string" },
                        "turn_idx": { "type": "integer" },
                        "tags": { "type": "array" } } }""").toOption.get
    val obs = Observation()
    FusedRun.violationsWithStats(df, s, Seq("conv_id", "turn_idx"), obs).count()
    val r = FusedRun.result(df, obs)
    r.nullCounts("tags") shouldBe 2L
    // null min/p50/max must not unbox to SizeStats(0, 0.0, 0)
    r.containerSizes.get("tags") shouldBe None
  }

  "Validator.violationCounts" should "equal the rollup over emitted violation rows" in {
    import org.apache.spark.sql.functions._
    val df = TranscriptGen.generate(spark, 200, 5, TranscriptGen.all)
    val schema = graft.compile.TableSchemaCompiler
      .compileString(graft.compile.Fixtures.flagshipSchema).toOption.get
    val emitted = Validator.validateTranscripts(df, schema).toDF()
      .groupBy(col("constraint"), element_at(split(col("pointer"), "/"), -1).as("column"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val counted = Validator.violationCounts(df, schema)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    emitted.isEmpty shouldBe false
    counted shouldBe emitted
  }

  "Integrity.integrityReport" should "find dups and orphans from one full-data shuffle" in {
    val df = TranscriptGen.generate(spark, 100, 5,
      TranscriptGen.Defects(duplicates = true, orphans = true)).cache()
    try {
      val report = Integrity.integrityReport(df)
      // matches the independent operators
      val expectedDups = Integrity.duplicateKeys(df, Seq("conv_id", "turn_idx"))
        .collect().map(_.toString).sorted
      report.duplicateKeys.collect().map(_.toString).sorted shouldBe expectedDups
      val expectedOrphanConvs = Integrity.referentialViolations(df)
        .select("conv_id").distinct().collect().map(_.getString(0)).sorted
      report.orphanConvs.collect().map(_.getString(0)).sorted shouldBe expectedOrphanConvs
      // row-level emission via broadcast join-back
      Integrity.orphanRows(df, report.orphanConvs).count() shouldBe
        Integrity.referentialViolations(df).count()
      report.unpersist()
    } finally df.unpersist()
  }
}

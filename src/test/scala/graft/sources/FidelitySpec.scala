package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Per-row fidelity (BASELINE.json input_hint): per-turn `text` equality
  * under stable (conv_id, turn_idx) ordering against an independently
  * computed oracle, and read-only validation (the engine never mutates
  * its input).
  */
class FidelitySpec extends AnyFlatSpec with Matchers {

  private lazy val spark = SparkTestBase.spark

  "the transcripts table" should "match the per-turn text oracle under stable ordering" in {
    val df = TranscriptGen.generate(spark, 50, 10)
    val got = df.orderBy(col("conv_id"), col("turn_idx"))
      .select("conv_id", "turn_idx", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))

    // independent Scala-side oracle of the generator rules
    val expected = (0 until 500).map { id =>
      val conv = id / 10; val turn = id % 10
      (s"c$conv", turn, s"turn $conv:$turn " + ("x" * (id % 50)))
    }.sortBy(t => (t._1, t._2))

    got.toSeq shouldBe expected
  }

  it should "be unchanged after a full validation run (engine is read-only)" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_fidelity").toString
    val in = s"$dir/in"
    TranscriptGen.generate(spark, 30, 5, TranscriptGen.all)
      .repartition(2).write.mode("overwrite").parquet(in)
    val before = spark.read.parquet(in).orderBy("conv_id", "turn_idx", "text")
      .collect().map(_.toString).toSeq

    val schema = graft.compile.TableSchemaCompiler
      .compileString(graft.compile.Fixtures.flagshipSchema).toOption.get
    graft.checkpoint.Checkpoint.runValidation(spark, in, schema, s"$dir/v", s"$dir/m.jsonl")
    val report = graft.integrity.Integrity.integrityReport(spark.read.parquet(in))
    report.duplicateKeys.count()
    report.unpersist()

    val after = spark.read.parquet(in).orderBy("conv_id", "turn_idx", "text")
      .collect().map(_.toString).toSeq
    after shouldBe before
  }
}

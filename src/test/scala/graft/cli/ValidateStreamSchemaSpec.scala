package graft.cli

import java.nio.file.Files

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.SparkTestBase

/** Schema pin/drift protocol of the incremental streaming CLI: the
  * first invocation pins the input directory's physical schema, later
  * ones refuse (exit 3 in main) when a pinned column vanished or
  * changed type — including a drifted file APPEARING MID-STREAM, which
  * surfaces as a parquet merge conflict.
  */
class ValidateStreamSchemaSpec extends AnyFlatSpec with Matchers {

  private lazy val spark = SparkTestBase.spark

  private def freshDirs(): (String, String) = {
    val in = Files.createTempDirectory("vss_in").toString
    val out = Files.createTempDirectory("vss_out").toString
    (in, out)
  }

  "pinOrCheckSchema" should "pin on first run and accept an unchanged directory" in {
    import spark.implicits._
    val (in, out) = freshDirs()
    Seq((1L, "a")).toDF("id", "text").write.mode("append").parquet(in)
    val first = pin(in, out)
    first.isRight shouldBe true
    Files.exists(java.nio.file.Paths.get(out, "_schema.json")) shouldBe true
    // second invocation, same files: same pinned schema back
    pin(in, out) shouldBe first
  }

  it should "flag a type conflict among the initial files at pin time" in {
    import spark.implicits._
    val (in, out) = freshDirs()
    Seq((1L, "a")).toDF("id", "text").write.mode("append").parquet(in)
    Seq(("oops", "b")).toDF("id", "text").write.mode("append").parquet(in)
    // first run merges every footer: the conflict is drift, not a crash
    val drift = pin(in, out)
    drift.isLeft shouldBe true
    drift.left.toOption.get.toLowerCase should include("incompatible")
  }

  it should "classify a mid-batch read failure on a drifted file as drift" in {
    // the per-invocation prelude samples ONE footer (O(1) in total file
    // count), so a drifted file can first surface as a task failure
    // inside the stream; the CLI maps that to exit 3 via this classifier
    val convert = new org.apache.spark.sql.execution.datasources
      .SchemaColumnConvertNotSupportedException("id", "INT64", "BINARY")
    val wrapped = new RuntimeException("stage failed",
      new RuntimeException("task failed", convert))
    ValidateStreamMain.isSchemaDriftFailure(wrapped) shouldBe true
    ValidateStreamMain.isSchemaDriftFailure(
      new RuntimeException("disk full", new java.io.IOException("no space"))) shouldBe false
  }

  it should "flag a pinned column that vanished or changed type wholesale" in {
    import spark.implicits._
    val (in, out) = freshDirs()
    Seq((1L, "a")).toDF("id", "text").write.mode("append").parquet(in)
    pin(in, out).isRight shouldBe true
    // compaction rewrote the directory without the pinned text column
    org.apache.commons.io.FileUtils.cleanDirectory(new java.io.File(in))
    Seq(Tuple1(2L)).toDF("id").write.mode("overwrite").parquet(in)
    val drift = pin(in, out)
    drift.isLeft shouldBe true
    drift.left.toOption.get should include("text: missing")
  }

  it should "tolerate an added column (ignored until re-pinned)" in {
    import spark.implicits._
    val (in, out) = freshDirs()
    Seq((1L, "a")).toDF("id", "text").write.mode("append").parquet(in)
    val pinned = pin(in, out)
    Seq((2L, "b", 3.5)).toDF("id", "text", "score").write.mode("append").parquet(in)
    val again = pin(in, out)
    again.isRight shouldBe true
    // the validator keeps reading with the PINNED schema
    again shouldBe pinned
  }

  private def pin(in: String, out: String) =
    ValidateStreamMain.pinOrCheckSchema(spark, in, out)
}

package graft.checkpoint

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.SparkTestBase
import graft.compile.TableSchemaCompiler
import graft.sources.TranscriptGen

/** FIXTURES.md §4 "resume": run with manifest, drop completed entries,
  * re-run -> identical outputs; manifest records lineage + metrics.
  */
class CheckpointSpec extends AnyFlatSpec with Matchers {

  private lazy val spark = SparkTestBase.spark
  private val schema = TableSchemaCompiler
    .compileString(graft.compile.Fixtures.flagshipSchema).toOption.get

  private def tmp(): String = Files.createTempDirectory("graft_ckpt").toString

  private def writeInput(dir: String): Unit =
    TranscriptGen.generate(spark, 40, 10,
      TranscriptGen.Defects(badEnumRole = true, negativeTurnIdx = true))
      .repartition(4).write.mode("overwrite").parquet(dir)

  private def readAllViolations(outDir: String): Seq[String] =
    spark.read.parquet(s"$outDir/*")
      .collect().map(_.toString).sorted.toSeq

  "Checkpoint.listUnits" should "discover units recursively and refuse an empty unit set" in {
    // Hive-partitioned layout: parquet files live in subdirectories —
    // the old top-level listing returned ZERO units and the run printed
    // "valid table" without validating a row
    val in = tmp() + "/in"
    TranscriptGen.generate(spark, 10, 4).write.parquet(s"$in/date=a")
    TranscriptGen.generate(spark, 10, 4).write.parquet(s"$in/date=b")
    val units = Checkpoint.listUnits(spark, in)
    units should not be empty
    all(units) should endWith(".parquet")
    units.exists(_.contains("date=a")) shouldBe true
    units.exists(_.contains("date=b")) shouldBe true
    // an empty directory must be a loud error, never a clean verdict
    val emptyDir = tmp() + "/empty"
    Files.createDirectories(java.nio.file.Paths.get(emptyDir))
    an[IllegalArgumentException] should be thrownBy Checkpoint.listUnits(spark, emptyDir)
  }

  "Checkpoint" should "record one manifest entry per unit with metrics" in {
    val in = tmp() + "/in"; val out = tmp()
    writeInput(in)
    val results = Checkpoint.runValidation(spark, in, schema, s"$out/v", s"$out/manifest.jsonl")
    results.size shouldBe 4
    results.map(_.rows).sum shouldBe 400L
    results.map(_.violations).sum should be > 0L
    results.count(_.passed == false) should be >= 1
    Checkpoint.completedUnits(s"$out/manifest.jsonl").size shouldBe 4
    // wall-clock (batch-level, honest measurement) and lineage present
    all(results.map(_.batchWallMs)) should be >= 0L
    all(results.map(_.batchSize)) shouldBe 4
    all(results.map(_.snapshotId)) shouldBe None
    // per-partition metrics: per-column null counts ride in the manifest
    results.map(_.nullCounts.keySet) foreach
      (_ shouldBe Set("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    results.map(_.nullCounts("tool")).sum should be > 0L // non-tool rows
    results.map(_.nullCounts("conv_id")).sum shouldBe 0L
    val line = Files.readAllLines(Paths.get(s"$out/manifest.jsonl")).get(0)
    line should include(""""null_counts":{""")
  }

  it should "skip completed units on re-run (resume is incremental)" in {
    val in = tmp() + "/in"; val out = tmp()
    writeInput(in)
    val first = Checkpoint.runValidation(spark, in, schema, s"$out/v", s"$out/manifest.jsonl")
    first.size shouldBe 4
    val second = Checkpoint.runValidation(spark, in, schema, s"$out/v", s"$out/manifest.jsonl")
    second shouldBe empty
    // the verdict source of truth survives the no-op re-run: full-manifest
    // metrics still carry every unit's rows and violations
    val metrics = Checkpoint.completedMetrics(s"$out/manifest.jsonl")
    metrics.size shouldBe 4
    metrics.map(_._2).sum shouldBe first.map(_.rows).sum
    metrics.map(_._3).sum shouldBe first.map(_.violations).sum
    metrics.map(_._3).sum should be > 0L
  }

  it should "produce byte-identical violations after a simulated partial failure" in {
    val in = tmp() + "/in"
    writeInput(in)

    // full uninterrupted run
    val outFull = tmp()
    Checkpoint.runValidation(spark, in, schema, s"$outFull/v", s"$outFull/manifest.jsonl")
    val expected = readAllViolations(s"$outFull/v")

    // interrupted run: keep only the first 2 manifest entries (simulating
    // a kill after unit 2), then resume
    val outPart = tmp()
    Checkpoint.runValidation(spark, in, schema, s"$outPart/v", s"$outPart/manifest.jsonl")
    val manifest = Paths.get(s"$outPart/manifest.jsonl")
    val lines = Files.readAllLines(manifest).asScala.toList
    Files.write(manifest, lines.take(2).asJava)
    val resumed = Checkpoint.runValidation(spark, in, schema, s"$outPart/v", s"$outPart/manifest.jsonl")
    resumed.size shouldBe 2 // only the 2 un-checkpointed units re-ran

    readAllViolations(s"$outPart/v") shouldBe expected
    Checkpoint.completedUnits(manifest.toString).size shouldBe 4
  }

  it should "keep lineage correct for paths input_file_name URI-encodes" in {
    // a space in the directory name makes input_file_name() return an
    // encoded URI; a naive string match would silently record 0 rows
    val in = tmp() + "/with space/in"
    writeInput(in)
    val out = tmp()
    val rs = Checkpoint.runValidation(spark, in, schema, s"$out/v", s"$out/manifest.jsonl")
    rs.size shouldBe 4
    rs.map(_.rows).sum shouldBe 400L
    rs.map(_.violations).sum should be > 0L
  }

  it should "not corrupt a literal '+' in a path (percent-decoding, not form-urlencoding)" in {
    // url_decode semantics would turn '+' into a space, break the lineage
    // match, and abort the run via raise_error — a legit filename must work
    val in = tmp() + "/v+1/in"
    writeInput(in)
    val out = tmp()
    val rs = Checkpoint.runValidation(spark, in, schema, s"$out/v", s"$out/manifest.jsonl")
    rs.size shouldBe 4
    rs.map(_.rows).sum shouldBe 400L
  }

  it should "refuse a batch where one unit's encoded path collides with another's raw path" in {
    // 'a b.parquet' percent-encodes to 'a%20b.parquet'; if BOTH exist as
    // files, lineage would be ambiguous — must fail loudly, not misroute
    val in = tmp() + "/in"
    writeInput(in)
    val first = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(first.toPath, Paths.get(in, "a b.parquet"))
    Files.copy(first.toPath, Paths.get(in, "a%20b.parquet"))
    val out = tmp()
    val ex = intercept[IllegalArgumentException] {
      Checkpoint.runValidation(spark, in, schema, s"$out/v", s"$out/manifest.jsonl")
    }
    ex.getMessage should include("ambiguous unit paths")
  }

  it should "handle a batch size far above the unit count (lookup map stays O(1))" in {
    val in = tmp() + "/in"
    writeInput(in)
    val out = tmp()
    val rs = Checkpoint.runValidation(spark, in, schema, s"$out/v", s"$out/manifest.jsonl",
      batchSize = 512)
    rs.size shouldBe 4
    rs.map(_.rows).sum shouldBe 400L
    all(rs.map(_.batchSize)) shouldBe 4 // actual batch, not the cap
  }

  it should "batch units into group jobs and stay resume-correct across batch boundaries" in {
    val in = tmp() + "/in"
    TranscriptGen.generate(spark, 70, 10,
      TranscriptGen.Defects(badEnumRole = true, negativeTurnIdx = true))
      .repartition(7).write.mode("overwrite").parquet(in)

    // reference: everything in one batch
    val outFull = tmp()
    val full = Checkpoint.runValidation(spark, in, schema, s"$outFull/v", s"$outFull/manifest.jsonl",
      batchSize = 64)
    full.size shouldBe 7
    full.map(_.rows).sum shouldBe 700L
    val expected = readAllViolations(s"$outFull/v")

    // small batches + a kill that lands mid-"batch plan" (keep 2 of 7
    // entries, not a multiple of batchSize): resume must redo exactly
    // the 5 missing units and converge to identical outputs and metrics
    val outPart = tmp()
    Checkpoint.runValidation(spark, in, schema, s"$outPart/v", s"$outPart/manifest.jsonl",
      batchSize = 3)
    val manifest = Paths.get(s"$outPart/manifest.jsonl")
    val lines = Files.readAllLines(manifest).asScala.toList
    lines.size shouldBe 7
    Files.write(manifest, lines.take(2).asJava)
    val resumed = Checkpoint.runValidation(spark, in, schema, s"$outPart/v", s"$outPart/manifest.jsonl",
      batchSize = 3)
    resumed.size shouldBe 5

    readAllViolations(s"$outPart/v") shouldBe expected
    val fullMetrics = Checkpoint.completedMetrics(s"$outFull/manifest.jsonl")
      .map { case (u, r, v) => (u.substring(u.lastIndexOf('/')), r, v) }.sorted
    val partMetrics = Checkpoint.completedMetrics(s"$outPart/manifest.jsonl")
      .map { case (u, r, v) => (u.substring(u.lastIndexOf('/')), r, v) }.sorted
    partMetrics shouldBe fullMetrics
  }
}

package graft.checkpoint

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.compile.TableSchema
import graft.exprs.Validator

/** Resumable validation runs (north_rule: "resumable from checkpoint
  * with per-partition lineage + metrics").
  *
  * The unit of lineage is an input file (the natural parallel unit of a
  * lake table; for Iceberg this generalizes to `(snapshotId, manifest
  * entry)` — the manifest schema carries `snapshot_id` as an Option that
  * is None on plain Parquet, keeping the checkpoint logic testable
  * without an Iceberg runtime, SURVEY.md §7).
  *
  * The manifest is JSON-lines, one entry per *completed* unit with its
  * metrics; resume = set-difference of the input's units against the
  * manifest, so a killed run redoes only unfinished units and the final
  * outputs are byte-identical to an uninterrupted run (unit outputs land
  * in per-unit subdirectories; FIXTURES.md §4 "resume").
  */
object Checkpoint {

  final case class UnitResult(
      unit: String,
      snapshotId: Option[Long],
      rows: Long,
      violations: Long,
      passed: Boolean,
      wallMs: Long)

  private def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")

  def toJson(r: UnitResult): String =
    s"""{"unit":"${esc(r.unit)}","snapshot_id":${r.snapshotId.map(_.toString).getOrElse("null")},""" +
      s""""rows":${r.rows},"violations":${r.violations},"passed":${r.passed},"wall_ms":${r.wallMs}}"""

  def parseLine(line: String): Option[String] = {
    // minimal parse: extract the unit field (manifest is engine-written)
    val m = """"unit":"((?:[^"\\]|\\.)*)"""".r
    m.findFirstMatchIn(line).map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
  }

  def completedUnits(manifestPath: String): Set[String] = {
    val p = Paths.get(manifestPath)
    if (!Files.exists(p)) Set.empty
    else Files.readAllLines(p).asScala.flatMap(parseLine).toSet
  }

  private val vioField = """"violations":(\d+)""".r
  private val rowsField = """"rows":(\d+)""".r

  /** Per-unit metrics of every completed unit in the manifest:
    * (unit, rows, violations). The final valid/invalid verdict of a run
    * must sum over the FULL manifest, not just the units processed in
    * the current invocation — a resumed (or already-complete) run would
    * otherwise report 0 row violations for the skipped units.
    */
  def completedMetrics(manifestPath: String): Seq[(String, Long, Long)] = {
    val p = Paths.get(manifestPath)
    if (!Files.exists(p)) Nil
    else Files.readAllLines(p).asScala.toSeq.flatMap { line =>
      parseLine(line).map { unit =>
        val rows = rowsField.findFirstMatchIn(line).map(_.group(1).toLong).getOrElse(0L)
        val vios = vioField.findFirstMatchIn(line).map(_.group(1).toLong).getOrElse(0L)
        (unit, rows, vios)
      }
    }
  }

  def appendResult(manifestPath: String, r: UnitResult): Unit = {
    val p = Paths.get(manifestPath)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, toJson(r) + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Stable directory name for a unit. */
  def unitDirName(unit: String): String = {
    val base = new java.io.File(unit).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    f"unit=${base}_${unit.hashCode & 0x7fffffff}%08x"
  }

  /** List the parquet data files of a table directory (the unit set). */
  def listUnits(spark: SparkSession, inputDir: String): Seq[String] = {
    val d = new java.io.File(inputDir)
    val files =
      if (d.isDirectory)
        d.listFiles().filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(_.getAbsolutePath).toSeq
      else Seq(inputDir)
    files.sorted
  }

  /** Run validation over all pending units; returns results for units
    * processed in THIS run. Each unit: one pass emitting violations
    * (written under `outDir/<unitDir>/`) with row/violation counts
    * observed in the same pass (no second scan of the data).
    */
  def runValidation(spark: SparkSession, inputDir: String, schema: TableSchema,
                    outDir: String, manifestPath: String,
                    snapshotId: Option[Long] = None): Seq[UnitResult] = {
    val done = completedUnits(manifestPath)
    val pending = listUnits(spark, inputDir).filterNot(done)
    pending.map { unit =>
      val t0 = System.nanoTime()
      val df = spark.read.parquet(unit)
      val rowsObs = Observation()
      val observed = df.observe(rowsObs, count(lit(1)).as("rows"))
      val vios = Validator.validateTranscripts(observed, schema)
      val vioObs = Observation()
      vios.toDF().observe(vioObs, count(lit(1)).as("violations"))
        .write.mode("overwrite").parquet(s"$outDir/${unitDirName(unit)}")
      val rows = rowsObs.get("rows").asInstanceOf[Long]
      val nVios = vioObs.get("violations").asInstanceOf[Long]
      val r = UnitResult(unit, snapshotId, rows, nVios, nVios == 0,
        (System.nanoTime() - t0) / 1000000)
      appendResult(manifestPath, r)
      r
    }
  }
}

package graft.checkpoint

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
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

  /** `batchWallMs`/`batchSize` are BATCH-level timing: the wall time of
    * the group job that processed this unit and how many units shared
    * it. A per-unit wall time would be a lie (the batch is one fused
    * Spark job; a slow unit's cost cannot be attributed), so the
    * manifest records the honest batch measurement instead.
    */
  final case class UnitResult(
      unit: String,
      snapshotId: Option[Long],
      rows: Long,
      violations: Long,
      passed: Boolean,
      batchWallMs: Long,
      batchSize: Int = 1,
      nullCounts: Map[String, Long] = Map.empty)

  private def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")

  def toJson(r: UnitResult): String = {
    val nulls =
      if (r.nullCounts.isEmpty) ""
      else r.nullCounts.toSeq.sortBy(_._1)
        .map { case (c, n) => s""""${esc(c)}":$n""" }
        .mkString(""","null_counts":{""", ",", "}")
    s"""{"unit":"${esc(r.unit)}","snapshot_id":${r.snapshotId.map(_.toString).getOrElse("null")},""" +
      s""""rows":${r.rows},"violations":${r.violations},"passed":${r.passed},""" +
      s""""batch_wall_ms":${r.batchWallMs},"batch_size":${r.batchSize}$nulls}"""
  }

  def parseLine(line: String): Option[String] = {
    // minimal parse: extract the unit field (manifest is engine-written)
    val m = """"unit":"((?:[^"\\]|\\.)*)"""".r
    m.findFirstMatchIn(line).map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
  }

  // a unit counts as completed only if its manifest line parsed FULLY
  // (same torn-write rule as completedMetrics — a unit that resume would
  // skip must also contribute its metrics to the verdict)
  def completedUnits(manifestPath: String): Set[String] =
    completedMetrics(manifestPath).map(_._1).toSet

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
      parseLine(line).flatMap { unit =>
        // a line with a unit but no metric fields is a torn write (crash
        // mid-append): treating it as 0 violations would under-count the
        // verdict, so treat the unit as NOT completed — resume
        // re-validates it (idempotent via dynamic partition overwrite)
        for {
          rows <- rowsField.findFirstMatchIn(line).map(_.group(1).toLong)
          vios <- vioField.findFirstMatchIn(line).map(_.group(1).toLong)
        } yield (unit, rows, vios)
      }
    }
  }

  def appendResult(manifestPath: String, r: UnitResult): Unit = {
    val p = Paths.get(manifestPath)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, toJson(r) + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Stable partition-key value for a unit (the `unit=` partition dir). */
  def unitKey(unit: String): String = {
    val base = new java.io.File(unit).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    f"${base}_${unit.hashCode & 0x7fffffff}%08x"
  }

  /** Stable directory name for a unit. */
  def unitDirName(unit: String): String = s"unit=${unitKey(unit)}"

  /** List the parquet data files of a table directory (the unit set).
    * Recursive: a Hive-partitioned layout (date=.../part-0.parquet)
    * previously yielded ZERO units, so the run validated nothing and
    * printed "valid table". Zero units is now a hard error for the same
    * reason — an empty unit set must never read as a clean verdict.
    */
  def listUnits(spark: SparkSession, inputDir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
          .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
          .flatMap(walk)
      else Seq(f)
    val d = new java.io.File(inputDir)
    val files =
      if (d.isDirectory)
        walk(d).filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      else Seq(inputDir)
    require(files.nonEmpty,
      s"no parquet units found under $inputDir — refusing to treat an empty unit set as a valid table")
    files.sorted
  }

  /** Per-unit (rows, per-column null counts) from parquet FOOTERS — a
    * metadata-only read, no data pages decoded (the same stats an
    * Iceberg manifest carries). Runs as one small distributed job over
    * the batch's paths so the driver never loops over files. Returns
    * None when any file lacks complete column statistics (then the
    * caller falls back to a grouped scan).
    */
  private def footerMetrics(spark: SparkSession, files: Seq[String],
                            statCols: Seq[String]): Option[Map[String, (Long, Map[String, Long])]] = {
    val collected =
      spark.sparkContext.parallelize(files, math.min(files.size, 32)).map { f =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          var rows = 0L
          val nulls = scala.collection.mutable.Map.empty[String, Long]
          var ok = true
          reader.getFooter.getBlocks.forEach { b =>
            rows += b.getRowCount
            b.getColumns.forEach { c =>
              val name = c.getPath.toDotString
              val st = c.getStatistics
              if (st == null || !st.isNumNullsSet) ok = false
              else nulls(name) = nulls.getOrElse(name, 0L) + st.getNumNulls
            }
          }
          (f, rows, nulls.toMap, ok)
        } finally reader.close()
      }.collect()
    val complete = collected.forall { case (_, _, nulls, ok) =>
      ok && statCols.forall(nulls.contains)
    }
    if (complete)
      Some(collected.map { case (f, rows, nulls, _) =>
        f -> (rows, statCols.map(c => c -> nulls(c)).toMap)
      }.toMap)
    else None
  }

  /** Run validation over all pending units in BATCHES of `batchSize`
    * files per Spark job (a sequential one-job-per-unit loop is
    * driver-bound at 100k+ lake files: each submission costs scheduler
    * round-trips regardless of data volume). Per batch:
    *
    *  1. one validation job over all the batch's files, lineage via
    *     `input_file_name()`, violations written partitioned by the
    *     stable `unit` key (same `unit=<key>/` layout as per-unit
    *     writes; dynamic partition overwrite keeps a re-run of a
    *     half-finished batch idempotent);
    *  2. one grouped metrics job for per-unit (rows, per-column null
    *     counts) — the manifest's per-partition metrics; violation
    *     counts come from the freshly-written (tiny) violations output.
    *
    * Manifest entries are appended only after the batch's write
    * completes, so a kill mid-batch redoes exactly that batch and the
    * final outputs are identical to an uninterrupted run. Returns
    * results for units processed in THIS run.
    */
  def runValidation(spark: SparkSession, inputDir: String, schema: TableSchema,
                    outDir: String, manifestPath: String,
                    snapshotId: Option[Long] = None,
                    batchSize: Int = 64): Seq[UnitResult] = {
    val done = completedUnits(manifestPath)
    val pending = listUnits(spark, inputDir).filterNot(done)
    pending.grouped(batchSize).flatMap { batch =>
      val t0 = System.nanoTime()
      // normalize file:// URIs back to the local paths listUnits produced.
      // input_file_name() URI-encodes special characters (spaces etc.), so
      // the broadcast lookup map carries BOTH the raw path and its
      // percent-encoded form per unit (url_decode on the column would
      // apply form-urlencoding semantics and corrupt a literal '+' in a
      // filename into a space). The O(1) map lookup replaces a
      // batch-deep nested `when` chain (O(batch) expression depth per
      // row, hostile to codegen at large batch sizes) — and FAILS LOUDLY
      // on any path that matches no unit: a silent null here would
      // record rows=0/violations=0 and flip a dirty table's verdict to
      // valid.
      val unitCol = regexp_replace(input_file_name(), "^file:(//)?", "")
      val keyEntries = batch.flatMap { unit =>
        val k = unitKey(unit)
        val encoded = new java.net.URI(null, null, unit, null).getRawPath
        Seq(unit -> k, encoded -> k)
      }
      // one unit's encoded form colliding with another unit's raw path
      // (e.g. 'a b.parquet' vs 'a%20b.parquet' in one batch) would let
      // toMap silently overwrite an entry and misroute lineage — refuse
      // loudly instead of flipping a dirty unit's verdict
      val ambiguous = keyEntries.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1).keys
      require(ambiguous.isEmpty,
        s"ambiguous unit paths in batch (raw vs percent-encoded collision): ${ambiguous.take(3).mkString(", ")}")
      val keyByPath: Map[String, String] = keyEntries.toMap
      val keyExpr = coalesce(
        try_element_at(typedLit(keyByPath), unitCol),
        raise_error(concat(lit("file not in batch lineage: "), unitCol)).cast("string"))
      val df = spark.read.parquet(batch: _*).withColumn("unit", keyExpr)
      val checks = graft.exprs.ConstraintCompiler.compile(schema, df.schema)
        .fold(e => throw new IllegalArgumentException(e), identity)
      Validator.violationsForChecks(df, checks, Seq("conv_id", "turn_idx"), carryCols = Seq("unit"))
        .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
          col("pointer"), col("constraint"), col("actual"), col("unit"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("unit")
        .parquet(outDir)

      // per-unit metrics (rows + per-column null counts — the manifest's
      // per-partition metrics): from parquet footers when complete
      // statistics exist (metadata only, no second decode of the data
      // the validation job just scanned), else one grouped fallback scan
      val statCols = df.drop("unit").columns.toSeq
      val (rowsByUnit, nullsByUnit) = footerMetrics(spark, batch, statCols) match {
        case Some(m) =>
          (m.map { case (u, (r, _)) => u -> r },
           m.map { case (u, (_, n)) => u -> n })
        case None =>
          // group by the SAME fail-loud lineage key as the validation job
          // (raise_error fires here too if a scanned file is unknown)
          val unitByKey = batch.map(u => unitKey(u) -> u).toMap
          val metricsRows = spark.read.parquet(batch: _*)
            .groupBy(keyExpr.as("unit_key"))
            .agg(count(lit(1)).as("rows"),
              statCols.map(c => sum(col(c).isNull.cast("long")).as(s"__nulls_$c")): _*)
            .collect()
          (metricsRows.map(r => unitByKey(r.getString(0)) -> r.getAs[Long]("rows")).toMap,
           metricsRows.map { r =>
             unitByKey(r.getString(0)) -> statCols.map(c => c -> r.getAs[Long](s"__nulls_$c")).toMap
           }.toMap)
      }
      // all-clean units write no partition dir at all — count only what
      // exists. Existence goes through the Hadoop FileSystem of outDir's
      // scheme: java.io.File was false for every hdfs://-or-s3a:// path,
      // which silently zeroed violations and passed dirty tables
      val outFs = new org.apache.hadoop.fs.Path(outDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val writtenDirs = batch.map(u => s"$outDir/${unitDirName(u)}")
        .filter(p => outFs.exists(new org.apache.hadoop.fs.Path(p)))
      val viosByKey =
        if (writtenDirs.isEmpty) Map.empty[String, Long]
        else spark.read.parquet(writtenDirs: _*)
          .withColumn("unit", regexp_extract(input_file_name(), "unit=([^/]+)/", 1))
          .groupBy("unit").agg(count(lit(1)).as("violations"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batchWallMs = (System.nanoTime() - t0) / 1000000
      batch.map { unit =>
        val rows = rowsByUnit.getOrElse(unit, 0L)
        val nVios = viosByKey.getOrElse(unitKey(unit), 0L)
        val r = UnitResult(unit, snapshotId, rows, nVios, nVios == 0,
          batchWallMs, batch.size, nullsByUnit.getOrElse(unit, Map.empty))
        appendResult(manifestPath, r)
        r
      }
    }.toSeq
  }
}

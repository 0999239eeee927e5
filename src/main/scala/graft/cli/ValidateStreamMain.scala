package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.compile.TableSchemaCompiler
import graft.streaming.StreamingValidator

/** spark-submit entry point for INCREMENTAL validation over a growing
  * parquet directory — the streaming analogue of [[ValidateTableMain]]:
  *
  *   ValidateStreamMain <schema.json> <input-parquet-dir> <outDir>
  *
  * Runs the SAME compiled violation plan as the batch path through
  * Structured Streaming with `Trigger.AvailableNow`: each invocation
  * processes exactly the files that appeared since the previous one
  * (source progress lives in `outDir/_checkpoint` — Spark's own
  * exactly-once file-source ledger, so a re-run after a crash neither
  * skips nor duplicates a file) and then exits. A scheduler invoking
  * this every N minutes gets continuous validation with batch
  * semantics; the same binary with `.trigger(ProcessingTime)` would be
  * the always-on form.
  *
  * Prints `stream pass: N new violation rows (M total at <dir>)` and
  * exits 0 (no violations so far) / 2 (violations exist) / 1 (usage or
  * compile error) — same protocol as the batch CLI.
  */
object ValidateStreamMain {

  def main(args: Array[String]): Unit = args match {
    case Array(schemaPath, inputDir, outDir) =>
      val schema = TableSchemaCompiler
        .compileString(java.nio.file.Files.readString(java.nio.file.Paths.get(schemaPath)))
        .fold(e => { System.err.println(s"invalid schema at $schemaPath: $e"); sys.exit(1) }, identity)
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
        .appName("graft-validate-stream")
        .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        // file streams need an explicit schema; take it from the files
        // present now (later files must share it — parquet evolution is
        // the batch plane's bindReport concern)
        val physical = spark.read.parquet(inputDir).schema
        val violationsDir = s"$outDir/violations"
        def totalViolations(): Long =
          try spark.read.parquet(violationsDir).count()
          catch { case _: org.apache.spark.sql.AnalysisException => 0L } // first run: no output yet
        val before = totalViolations()
        val q = StreamingValidator
          .violations(spark.readStream.schema(physical).parquet(inputDir), schema)
          .writeStream
          .format("parquet")
          .option("path", violationsDir)
          .option("checkpointLocation", s"$outDir/_checkpoint")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val after = totalViolations()
        println(s"stream pass: ${after - before} new violation rows ($after total at $violationsDir)")
        sys.exit(if (after > 0) 2 else 0)
      } finally spark.stop()
    case _ =>
      System.err.println("usage: ValidateStreamMain <schema.json> <input-parquet-dir> <outDir>")
      sys.exit(1)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-layer abstraction (SURVEY.md §7): the engine validates any
  * source that can produce the transcripts DataFrame and (optionally) a
  * snapshot id for checkpoint lineage.
  *
  *  - [[ParquetTranscriptSource]] — the in-sandbox implementation
  *    (snapshot id None; unit lineage = data files).
  *  - [[IcebergTranscriptSource]] — the deployment implementation. It
  *    uses only string-typed catalog APIs (`spark.table`, the `.snapshots`
  *    metadata table, time travel via `VERSION AS OF`), so it compiles
  *    and its plumbing is testable without an Iceberg runtime on the
  *    classpath; at deployment the Iceberg catalog jars + conf make the
  *    same calls resolve.
  */
sealed trait TranscriptSource {
  def load(spark: SparkSession): DataFrame
  /** Current snapshot for checkpoint lineage (None on plain Parquet). */
  def snapshotId(spark: SparkSession): Option[Long]
}

final case class ParquetTranscriptSource(path: String) extends TranscriptSource {
  override def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
  override def snapshotId(spark: SparkSession): Option[Long] = None
}

final case class IcebergTranscriptSource(table: String, asOfSnapshot: Option[Long] = None)
    extends TranscriptSource {
  override def load(spark: SparkSession): DataFrame = asOfSnapshot match {
    case Some(snap) => spark.sql(s"SELECT * FROM $table VERSION AS OF $snap")
    case None       => spark.table(table)
  }
  override def snapshotId(spark: SparkSession): Option[Long] =
    asOfSnapshot.orElse {
      spark.sql(s"SELECT snapshot_id FROM $table.snapshots ORDER BY committed_at DESC LIMIT 1")
        .collect().headOption.map(_.getLong(0))
    }
}

object TranscriptSource {
  /** Config-string factory: `iceberg:<catalog.table>[@snapshot]` or a
    * parquet path.
    */
  def fromConfig(conf: String): TranscriptSource =
    if (conf.startsWith("iceberg:")) {
      val spec = conf.stripPrefix("iceberg:")
      // split with -1 keeps a trailing empty token, so "tbl@" is
      // rejected instead of silently losing its snapshot pin; a
      // non-numeric snapshot gets a contextual error, not a bare
      // NumberFormatException
      spec.split("@", -1) match {
        case Array(t, snap) if t.nonEmpty =>
          val id = snap.toLongOption.getOrElse(
            throw new IllegalArgumentException(s"bad iceberg snapshot id in: $conf"))
          IcebergTranscriptSource(t, Some(id))
        case Array(t) if t.nonEmpty => IcebergTranscriptSource(t)
        case _ => throw new IllegalArgumentException(s"bad iceberg source: $conf")
      }
    } else ParquetTranscriptSource(conf)
}

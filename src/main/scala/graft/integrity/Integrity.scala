package graft.integrity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-level integrity checks (north_rule): uniqueness of
  * `(conv_id, turn_idx)` and referential integrity of `conv_id` across
  * turn groups. These are the engine's only shuffling operators —
  * everything else is a single scan — so skew handling is explicit here
  * (SURVEY.md §2b rows "uniqueness lifted to table level" /
  * "referential integrity").
  *
  * The parse-time analogue in the reference is the strict-set decoder
  * (`Decoders.scala:71-82`, duplicates rejected) and `$ref`-target
  * existence (`ReferenceResolver.scala:44`); here both lift to
  * dataset-level operators.
  */
object Integrity {

  /** Duplicate composite keys.
    *
    * Plan shape: partial hash-aggregate (map-side combine) -> exchange on
    * the key -> final aggregate -> filter count>1. Map-side combine means
    * a hot key's counts collapse to one row per input partition BEFORE
    * the shuffle, so key skew degrades into at most
    * #input-partitions rows per key — the classic two-phase/salted
    * aggregation, supplied by Spark's HashAggregate automatically.
    * AQE (enabled in session conf) re-coalesces post-shuffle partitions.
    */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Explicitly salted two-phase duplicate count: phase 1 aggregates on
    * (key, salt) — a deterministic salt derived from a per-row
    * discriminator spreads one hot key over `salt` reducers — phase 2
    * re-aggregates on the key alone. Equivalent to [[duplicateKeys]] for
    * any salt (tested on the Zipf fixture); use when a single composite
    * key carries so many rows that even one post-combine row per input
    * partition overloads its reducer (the north_rule's explicit-salting
    * requirement for 10^12-turn conv_id skew).
    */
  def saltedDuplicateKeys(df: DataFrame, keyCols: Seq[String],
                          discriminator: Column, salt: Int = 16): DataFrame = {
    require(salt > 0)
    df.withColumn("__salt", pmod(hash(discriminator), lit(salt)))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as("dup_count"))
      .filter(col("dup_count") > 1)
  }

  /** Uniqueness violations as violation rows (pointer to the key). */
  def uniquenessViolations(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val pointer = graft.exprs.ConstraintCompiler.pointerCol(keyCols.dropRight(1), keyCols.last)
    duplicateKeys(df, keyCols).select(
      keyCols.map(col) :+
        pointer.as("pointer") :+
        lit("uniqueItems").as("constraint") :+
        concat(lit("count="), col("dup_count").cast("string")).as("actual"): _*)
  }

  /** Orphan rows: left anti join of `df.keyCol` against the registry of
    * valid keys. Spark picks sort-merge or broadcast by stats; for a
    * small registry, broadcast eliminates the shuffle entirely.
    */
  def orphans(df: DataFrame, registry: DataFrame, keyCol: String,
              broadcastRegistry: Boolean = false): DataFrame = {
    val reg = registry.select(col(keyCol)).distinct()
    df.join(if (broadcastRegistry) broadcast(reg) else reg, Seq(keyCol), "left_anti")
  }

  /** Explicitly salted left-anti join for skewed left keys (north_rule
    * demands explicit skew handling, beyond AQE's skewJoin):
    * the right side is replicated `salt` times, the left side picks a
    * deterministic salt from a high-cardinality discriminator column, so
    * one hot key spreads over `salt` shuffle partitions. Equivalent to
    * the plain anti join for any salt (tested on a Zipf fixture).
    */
  def saltedOrphans(df: DataFrame, registry: DataFrame, keyCol: String,
                    discriminator: Column, salt: Int = 16): DataFrame = {
    require(salt > 0)
    val reg = registry.select(col(keyCol)).distinct()
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    df.withColumn("__salt", pmod(hash(discriminator), lit(salt)))
      .join(reg, Seq(keyCol, "__salt"), "left_anti")
      .drop("__salt")
  }

  /** Both integrity checks from ONE full-data shuffle (the 100-TB
    * shape): a single partial-aggregated `groupBy(conv_id, turn_idx)`
    * reduces the table to its keyspace; duplicate keys, the turn-0
    * registry, and orphan conversations all derive from that reduced
    * set (whose shuffles are bounded by #distinct keys, not #rows).
    * Row-level orphan emission joins the (small) offending-conversation
    * set back via broadcast.
    */
  /** Both report members derive from one persisted reduced keyspace;
    * call [[IntegrityReport.unpersist]] once both have been
    * materialized, or the cached blocks live for the session.
    */
  final case class IntegrityReport(duplicateKeys: DataFrame, orphanConvs: DataFrame,
                                   private val cachedKeyCounts: DataFrame) {
    def unpersist(): Unit = { cachedKeyCounts.unpersist(); () }
  }

  def integrityReport(df: DataFrame): IntegrityReport = {
    // persisted: both report members derive from this reduced keyspace,
    // and separate downstream ACTIONS would otherwise re-plan — and
    // re-run — the full-table scan+shuffle once each (Spark does not
    // reuse shuffle stages across separately submitted jobs)
    val keyCounts = df.groupBy(col("conv_id"), col("turn_idx"))
      .agg(count(lit(1)).as("dup_count"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dups = keyCounts.filter(col("dup_count") > 1)
    val convs = keyCounts.groupBy("conv_id")
      .agg(max(when(col("turn_idx") === 0, 1).otherwise(0)).as("has_root"))
    val orphanConvs = convs.filter(col("has_root") === 0).select("conv_id")
    IntegrityReport(dups, orphanConvs, keyCounts)
  }

  /** Row-level orphan emission from a precomputed (small) orphan set. */
  def orphanRows(df: DataFrame, orphanConvs: DataFrame): DataFrame =
    df.join(broadcast(orphanConvs), Seq("conv_id"), "left_semi")

  /** Conversation registry: conversations that have a `turn_idx = 0`
    * root (FIXTURES.md §2 table-level rule). The filter is pushed into
    * the scan; distinct's partial aggregation handles skew as above.
    */
  def conversationRegistry(transcripts: DataFrame): DataFrame =
    transcripts.filter(col("turn_idx") === 0).select("conv_id").distinct()

  /** Turn-index contiguity audit: conversations whose turn indices are
    * NOT exactly 0..n-1 — gaps, duplicates, a missing root, or null
    * indices (all-null convs flag too: `n_distinct = 0 != n` makes the
    * pass conjunction plainly FALSE, so three-valued null comparisons
    * on min/max never rescue it — same logic as the SQL replay's
    * HAVING). One map-side-combining aggregation per conversation;
    * output is violations only.
    */
  def turnContiguity(df: DataFrame, convCol: String = "conv_id",
                     idxCol: String = "turn_idx"): DataFrame =
    df.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        min(col(idxCol)).cast("long").as("min_idx"),
        max(col(idxCol)).cast("long").as("max_idx"),
        countDistinct(col(idxCol)).as("n_distinct"))
      .filter(!(col("min_idx") === 0 && col("max_idx") === col("n_turns") - 1 &&
        col("n_distinct") === col("n_turns")))

  /** Functional-dependency profile: values of `detCol` that map to more
    * than one `depCol` value — the classic data-profiling check for a
    * dependency the schema claims but the data may not keep (source
    * determines language, user determines region). One aggregation,
    * count-distinct's two-phase rewrite handles hot determinant keys.
    */
  def functionalDependencyViolations(df: DataFrame, detCol: String,
                                     depCol: String): DataFrame =
    df.groupBy(col(detCol))
      .agg(countDistinct(col(depCol)).as("n_dep"), count(lit(1)).as("n_rows"))
      .filter(col("n_dep") > 1)

  /** Referential violations for transcripts, as violation rows. */
  def referentialViolations(transcripts: DataFrame): DataFrame = {
    val reg = conversationRegistry(transcripts)
    orphans(transcripts, reg, "conv_id")
      .select(
        col("conv_id"), col("turn_idx"),
        graft.exprs.ConstraintCompiler.pointerCol(Seq("conv_id", "turn_idx"), "conv_id").as("pointer"),
        lit("ref").as("constraint"),
        col("conv_id").as("actual"))
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-structure operators over the transcripts table
  * (conv_id, turn_idx, role, text, tool, ts): sessionization by
  * event-time gap and role-alternation quality.
  *
  * Scale shape: every window here is PARTITIONED BY CONVERSATION — the
  * per-key sort and lag state are bounded by a single conversation's
  * turns, and the downstream per-conversation aggregation reuses the
  * same hash partitioning (one shuffle total, no single-partition
  * window anywhere).
  *
  * Determinism: the fixture plants duplicate (conv, turn) keys, so the
  * window order must be a TOTAL order or lag() chains differ between
  * runs/engines. The order is (turn_idx, ts, role, text), all
  * ASC NULLS FIRST — replayable in any engine with the same null
  * placement; ASCII payloads make the string collation engine-neutral.
  */
object Conversations {

  private def turnOrder: Seq[Column] = Seq(
    col("turn_idx").asc_nulls_first, col("ts").asc_nulls_first,
    col("role").asc_nulls_first, col("text").asc_nulls_first)

  /** Per-turn session index (0-based): a new session starts when the
    * event-time gap from the previous turn exceeds `maxGapSeconds`.
    */
  def sessionize(df: DataFrame, maxGapSeconds: Long,
                 convCol: String = "conv_id"): DataFrame = {
    val w = Window.partitionBy(convCol).orderBy(turnOrder: _*)
    val prevTs = lag(unix_timestamp(col("ts")), 1).over(w)
    val newSession =
      when(prevTs.isNull || unix_timestamp(col("ts")) - prevTs <= maxGapSeconds, 0L)
        .otherwise(1L)
    df.withColumn("session_idx",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-conversation structure profile: turn count, session count at
    * the given gap, and the role-repetition ratio (adjacent same-role
    * turn pairs / adjacent pairs; 0 for single-turn conversations) —
    * the "is this a real dialogue" quality signal.
    */
  def structureStats(df: DataFrame, maxGapSeconds: Long,
                     convCol: String = "conv_id"): DataFrame = {
    val w = Window.partitionBy(convCol).orderBy(turnOrder: _*)
    val prevTs = lag(unix_timestamp(col("ts")), 1).over(w)
    val newSession =
      when(prevTs.isNull || unix_timestamp(col("ts")) - prevTs <= maxGapSeconds, 0L)
        .otherwise(1L)
    // pair-existence via row_number (not a lagged payload column, which
    // could itself be null), so a null role in the FIRST row is
    // distinguishable from "no previous row"
    val hasPrev = row_number().over(w) > 1
    val sameRole = when(hasPrev &&
      (col("role") <=> lag(col("role"), 1).over(w)), 1L).otherwise(0L)
    df.select(col(convCol), newSession.as("ns"), sameRole.as("rep"))
      .groupBy(col(convCol))
      .agg(
        count(lit(1)).as("n_turns"),
        (sum(col("ns")) + 1).as("n_sessions"),
        round(sum(col("rep")).cast("double") /
          greatest(count(lit(1)) - 1, lit(1L)), 6).as("role_repeat_ratio"))
  }
}

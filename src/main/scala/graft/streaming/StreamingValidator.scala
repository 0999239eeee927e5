package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.compile.TableSchema
import graft.exprs.Validator
import graft.model.Violation

/** Structured-Streaming validation: the SAME compiled constraint plan
  * the batch engine runs (pure select/filter/explode — no
  * batch-only operators), applied to `readStream` sources, plus the two
  * genuinely streaming concerns:
  *
  *  - watermarked windowed violation-rate metrics (event-time windows
  *    on `ts`, late data bounded by the watermark);
  *  - stateful per-conversation uniqueness/ordering via
  *    `flatMapGroupsWithState` — the streaming analogue of the batch
  *    `(conv_id, turn_idx)` uniqueness operator: state is the set-free
  *    high-watermark of turn indexes seen per conversation, with event
  *    -time timeout so state size is bounded by *active* conversations,
  *    not history (the knob that keeps this viable at 10^12 turns).
  */
object StreamingValidator {

  final case class Turn(conv_id: String, turn_idx: Int, role: String,
                        text: String, tool: String, ts: Timestamp)

  /** Per-row violations on a streaming DataFrame — identical plan to the
    * batch path (append-mode friendly: stateless projection).
    */
  def violations(stream: DataFrame, schema: TableSchema): Dataset[Violation] =
    Validator.validateTranscripts(stream, schema)

  /** Windowed violation counts by constraint: event-time tumbling
    * windows over the violation stream, joined back to the row's `ts`.
    */
  def violationRates(stream: DataFrame, schema: TableSchema,
                     windowLength: String = "1 minute",
                     watermark: String = "5 minutes"): DataFrame = {
    // one definition of "row is valid" for batch and streaming — a
    // divergence here would make the two planes disagree on the metric
    val anyViolation = !Validator.validFlag(stream, schema)
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength))
      .agg(
        count(lit(1)).as("rows"),
        sum(when(anyViolation, 1L).otherwise(0L)).as("violating_rows"))
  }

  /** Streaming exact dedup: keep only the FIRST document seen per
    * content fingerprint, with state bounded by the watermark horizon
    * (`dropDuplicatesWithinWatermark` evicts a fingerprint once the
    * watermark passes its event time). Exact-within-horizon is the
    * honest streaming trade — unbounded-history exact dedup is the
    * batch job ([[graft.pipeline.Dedup.exactSurvivors]]); a pipeline
    * runs this on the live stream and reconciles with the batch
    * survivors at compaction time.
    */
  def firstSeenByContent(stream: DataFrame, textCol: String = "text",
                         tsCol: String = "ts",
                         watermark: String = "10 minutes"): DataFrame = {
    val wm = stream.withWatermark(tsCol, watermark)
    val deduped = wm
      .filter(col(textCol).isNotNull)
      .withColumn("__content_hash", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash") // output schema == input schema, so the
      // survivors union cleanly with batch exactSurvivors output
    // null text carries no content to deduplicate on — md5(null) is null,
    // which would silently collapse EVERY null-text row onto the first
    // one seen; such rows pass through instead (callers wanting them
    // gone filter upstream)
    deduped.unionByName(wm.filter(col(textCol).isNull))
  }

  /** maxTsMillis is the conversation's event-time high-watermark: the
    * state timeout must be anchored on it, not on the latest BATCH's
    * max ts — a late-but-admitted row would otherwise REGRESS the
    * timeout and expire state for a still-active conversation.
    */
  final case class ConvState(maxTurnIdx: Int, maxTsMillis: Long)
  final case class OrderViolation(conv_id: String, turn_idx: Int, kind: String)

  /** Stateful uniqueness/ordering: within each conversation, turn
    * indexes must be strictly increasing in arrival order (append-only
    * transcript streams). Emits a violation for every duplicate or
    * regressing turn index. State: one (maxTurnIdx, count) pair per
    * active conversation, dropped after `stateTimeout` of event-time
    * inactivity past the watermark.
    */
  def orderingViolations(turns: Dataset[Turn],
                         watermark: String = "10 minutes",
                         stateTimeoutMs: Long = 30L * 60 * 1000): Dataset[OrderViolation] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (convId: String, rows: Iterator[Turn], state: GroupState[ConvState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(ConvState(Int.MinValue, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer.empty[OrderViolation]
            val sorted = rows.toSeq.sortBy(t => (t.ts.getTime, t.turn_idx))
            sorted.foreach { t =>
              if (t.turn_idx == st.maxTurnIdx)
                out += OrderViolation(convId, t.turn_idx, "duplicate")
              else if (t.turn_idx < st.maxTurnIdx)
                out += OrderViolation(convId, t.turn_idx, "out_of_order")
              st = ConvState(math.max(st.maxTurnIdx, t.turn_idx),
                math.max(st.maxTsMillis, t.ts.getTime))
            }
            state.update(st)
            // timeout anchored to the conversation's event-time
            // HIGH-WATERMARK (monotone): the first batches run with
            // watermark 0 (epoch), which would otherwise expire every
            // state immediately, and a late-but-admitted row must not
            // regress an already-later timeout
            state.setTimeoutTimestamp(st.maxTsMillis + stateTimeoutMs)
            out.iterator
          }
        })
  }
}

package graft.pipeline

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents ordered by id form
  * one virtual token stream, which is cut into fixed-`budget` chunks
  * (concat-and-chunk — documents may straddle a chunk boundary). Each
  * document needs its global token offset, i.e. a GLOBAL prefix sum —
  * the operation Spark's unpartitioned window does on a single
  * partition (the classic scale trap). This implementation is the
  * scalable shape:
  *
  *  1. range-repartition by id (ascending id ranges land in ascending
  *     partition ids) and sort within partitions — the ONLY full
  *     shuffle in the plan;
  *  2. per-partition running totals imperatively in `mapPartitions`
  *     (a window partitioned by partition-id would not satisfy the
  *     range distribution and would force a second full exchange);
  *  3. the result is localCheckpoint()ed BEFORE per-partition totals
  *     are collected — range bounds are sample-based and not
  *     guaranteed identical across executions, so totals and output
  *     must come from the same materialized execution;
  *  4. per-partition totals (one tiny row each) scan into prefix
  *     offsets on the driver and rejoin as a broadcast map lookup.
  *
  * The only driver-side data is one row per partition. Deterministic:
  * offsets are a pure function of (id order, token counts), whatever
  * partition bounds the range sampler picks.
  */
object Packing {

  /** (doc_id, n_tokens, start_offset, first_chunk, last_chunk) for the
    * id-ordered token stream cut into `budget`-token chunks. Empty
    * documents occupy zero tokens: their chunk span collapses to the
    * chunk containing their start offset.
    *
    * Preconditions: ids are unique (the corpus's primary key — a
    * duplicate id would leave its two offsets tie-broken arbitrarily)
    * and castable to long.
    */
  def packChunks(df: DataFrame, budget: Long, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"chunk budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val local = df
      .select(col(idCol).cast("long").as("id"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .as[(Long, Long)]
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var acc = 0L
        it.map { case (id, n) => acc += n; (id, n, pid, acc) }
      }
      .toDF("id", "n_tokens", "pid", "local_end")
      .localCheckpoint() // freeze ONE execution; see scaladoc point 3

    // one row per partition -> driver scan -> broadcast literal map.
    // (Deliberate driver step: #partitions rows, not data rows.)
    val totals = local.groupBy("pid").agg(max(col("local_end")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val prefix: Map[Int, Long] =
      totals.map(_._1).zip(totals.scanLeft(0L)(_ + _._2).dropRight(1)).toMap

    // the map covers every pid of the checkpointed data by
    // construction; coalesce only backstops the empty-input case
    val start = col("local_end") - col("n_tokens") +
      coalesce(element_at(typedLit(prefix), col("pid")), lit(0L))
    // integer `div` (exact at any offset; no double rounding)
    local.select(col("id").as(idCol), col("n_tokens"), start.as("start_offset"))
      .select(col(idCol), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div $budget").as("first_chunk"),
        expr(s"(start_offset + greatest(n_tokens, 1L) - 1) div $budget")
          .as("last_chunk"))
  }
}

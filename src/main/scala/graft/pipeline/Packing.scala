package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  *     partition ids);
  *  2. per-partition running totals through a PARTITIONED window;
  *  3. per-partition totals (one tiny row each) collect to the driver,
  *     scan into prefix offsets, and rejoin as a broadcast map lookup.
  *
  * Every shuffled row is (id, n_tokens); the only driver-side data is
  * one row per partition. Deterministic: offsets are a pure function
  * of (id order, token counts).
  */
object Packing {

  /** (doc_id, n_tokens, start_offset, first_chunk, last_chunk) for the
    * id-ordered token stream cut into `budget`-token chunks. Empty
    * documents occupy zero tokens: their chunk span collapses to the
    * chunk containing their start offset.
    *
    * Precondition: ids are unique (the corpus's primary key). Duplicate
    * ids would leave their relative order — and so their two offsets —
    * tie-broken arbitrarily; run [[Dedup.exactSurvivors]]-style keying
    * first if the input can carry duplicates.
    */
  def packChunks(df: DataFrame, budget: Long, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"chunk budget must be positive, got $budget")
    val toks = df
      .select(col(idCol), TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .repartitionByRange(col(idCol))
      .withColumn("pid", spark_partition_id())
    val w = Window.partitionBy("pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = toks.withColumn("local_end", sum(col("n_tokens")).over(w))

    // one row per partition -> driver scan -> broadcast literal map.
    // (Deliberate driver step: #partitions rows, not data rows.)
    val totals = local.groupBy("pid").agg(max(col("local_end")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val prefix: Map[Int, Long] =
      totals.map(_._1).zip(totals.scanLeft(0L)(_ + _._2).dropRight(1)).toMap

    val start = col("local_end") - col("n_tokens") +
      coalesce(element_at(typedLit(prefix), col("pid")), lit(0L))
    // integer `div` (exact at any offset; no double rounding)
    local.select(col(idCol), col("n_tokens"), start.as("start_offset"))
      .select(col(idCol), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div $budget").as("first_chunk"),
        expr(s"(start_offset + greatest(n_tokens, 1L) - 1) div $budget")
          .as("last_chunk"))
  }
}

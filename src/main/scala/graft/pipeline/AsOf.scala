package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time AS-OF join — the "attach the latest preceding state"
  * operator (each turn/event joined to the most recent config change,
  * price tick, or session event of the same key at-or-before its own
  * timestamp). Spark has no built-in as-of join; the naive theta-join
  * (`l.key = r.key AND r.ts <= l.ts` + per-left max) explodes to the
  * full per-key cross product before aggregating. This is the
  * union-and-carry-forward form: ONE hash shuffle on the key, a per-key
  * sort, and an incrementally-maintained running `last(ignoreNulls)` —
  * O(n log n) per key, never a cross product.
  */
object AsOf {

  /** For each `left` row, attach the LATEST `right` row of the same
    * `keyCol` with `right.ts <= left.ts` (backward as-of; a right row
    * at exactly the left timestamp matches). Right rows tied on
    * (key, ts) resolve deterministically to the greatest `seqCol`.
    * Left rows are preserved: with no preceding right row the payload
    * columns come back null (left as-of semantics). Output = every
    * left column plus `asof_<name>` for each payload column.
    *
    * Right rows with a null key or null timestamp are unmatchable and
    * ignored; a left row with a null timestamp precedes everything and
    * matches nothing (payload null).
    *
    * `keyCol`/`tsCol` must exist under the same names on both sides;
    * `payloadCols`/`seqCol` name right-side columns.
    *
    * Scale shape: both sides are unioned and shuffled ONCE on the key,
    * then sorted within the key partition — the sort-merge as-of shape.
    * The carry-forward `last(__p, ignoreNulls)` over
    * (ts, side, seq) rows UNBOUNDED PRECEDING..CURRENT is a growing
    * frame Spark maintains incrementally (no per-row rescan). State is
    * bounded by the frame's single struct — not the window buffer of a
    * rank-everything form. Skew is per-key stream length, the same
    * exposure as any sessionization; salting cannot apply (the carry
    * crosses every row of a key) — a pathologically hot key is a data
    * problem to cap upstream, and the shuffle carries each row exactly
    * once either way.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               payloadCols: Seq[String], seqCol: String): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    (payloadCols :+ seqCol).foreach(c => require(right.columns.contains(c),
      s"right side has no column '$c' (has: ${right.columns.mkString(", ")})"))
    Seq(keyCol, tsCol).foreach(c => require(
      left.columns.contains(c) && right.columns.contains(c),
      s"both sides must carry '$c'"))
    val outCols = payloadCols.map("asof_" + _)
    outCols.foreach(c => require(!left.columns.contains(c),
      s"left already carries '$c'; rename it before the as-of join"))
    Seq("__side", "__seq", "__p", "__m").foreach(c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"input already carries a '$c' column; rename it before the as-of join"))

    val r2 = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol), lit(0).as("__side"),
        col(seqCol).cast("long").as("__seq"),
        struct(payloadCols.map(col): _*).as("__p"))
    val l2 = left.withColumn("__side", lit(1))
    // unionByName fills the sides' missing columns (left's __seq/__p,
    // right's left-only columns) with nulls
    val all = l2.unionByName(r2, allowMissingColumns = true)

    // right rows sort before left rows at equal ts (side 0 < 1), and
    // among tied right rows the greatest seq is last — so the running
    // last() IS the as-of match. Left null-ts rows sort first (asc
    // nulls first) and therefore see no right row.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = all
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val sel = left.columns.map(col).toSeq ++
      payloadCols.zip(outCols).map { case (p, o) => col("__m").getField(p).as(o) }
    matched.select(sel: _*)
  }
}

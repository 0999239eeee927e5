package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed [[Aggregator]] — the scale-safe replacement
  * for `row_number().over(Window.partitionBy(query))` ranking.
  *
  * The window form shuffles EVERY scored row into one partition per
  * query and sorts there: at |queries| x |candidates| scored rows the
  * exchange is the bottleneck. This aggregator partial-aggregates
  * map-side (ObjectHashAggregate), so each map task contributes at most
  * k rows per query to the exchange; the merge is an O(k) sorted-list
  * merge. Wall-clock and shuffle volume become O(|queries| * k * tasks)
  * instead of O(|queries| * |candidates|).
  *
  * Ordering is (score DESC, id ASC under `Ordering[I]`) — the same
  * deterministic tiebreak the window form used, so results are
  * bit-identical. `I` is the id type (long ids for numeric keys, string
  * ids for URL/hash keys); ids must be non-null — callers filter.
  */
final class TopKAggregator[I: Ordering: TypeTag](k: Int)
    extends Aggregator[(Double, I), List[(Double, I)], Seq[(Double, I)]] {

  require(k > 0, "k must be positive")

  private val iOrd = implicitly[Ordering[I]]

  // (score desc, id asc): a is strictly better than b. Double.compare
  // gives a TOTAL order (NaN sorts greatest, matching Spark's descending
  // sort semantics) — a naive `>` is not total under NaN, which would
  // make results partition-order-dependent and break merge associativity.
  private def better(a: (Double, I), b: (Double, I)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && iOrd.lt(a._2, b._2))
  }

  override def zero: List[(Double, I)] = Nil

  /** Insert into a size-capped sorted list (k is small; O(k) insert). */
  override def reduce(buf: List[(Double, I)], a: (Double, I)): List[(Double, I)] = {
    if (buf.sizeIs >= k && !better(a, buf.last)) buf
    else {
      val (front, back) = buf.span(better(_, a))
      (front ::: a :: back).take(k)
    }
  }

  override def merge(b1: List[(Double, I)], b2: List[(Double, I)]): List[(Double, I)] = {
    // merge two sorted lists, keep best k
    val out = List.newBuilder[(Double, I)]
    var (x, y) = (b1, b2); var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) { out += x.head; x = x.tail }
      else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(r: List[(Double, I)]): Seq[(Double, I)] = r

  override def bufferEncoder: Encoder[List[(Double, I)]] =
    ExpressionEncoder[List[(Double, I)]]()
  override def outputEncoder: Encoder[Seq[(Double, I)]] =
    ExpressionEncoder[Seq[(Double, I)]]()
}

object TopK {
  /** `topK(k)(score, id)` aggregation column: array of (score `_1`,
    * id `_2`) structs, best-first under (score desc, id asc). Long ids.
    */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator[Long](k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)

  /** [[topK]] with STRING ids (URLs, content hashes): tiebreak is
    * lexical id ASC. Ids must be non-null (callers filter).
    *
    * Tie-order caveat: `Ordering[String]` compares UTF-16 CODE UNITS,
    * which diverges from UTF-8 binary order (Spark SQL sorts, DuckDB)
    * exactly when a tie pits a supplementary-plane string against a
    * high-BMP one (surrogates 0xD800-0xDFFF sort below 0xE000-0xFFFF
    * in UTF-16 but encode as 4-byte 0xF0-lead sequences above them in
    * UTF-8). All current callers tie-break on ASCII ids or corpus
    * tokens from the verified-ASCII fixtures, where the two orders
    * agree; a caller feeding supplementary-plane ids must normalize or
    * accept engine-specific tie order.
    */
  def topKStr(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator[String](k), Encoders.tuple(Encoders.scalaDouble, Encoders.STRING))
      .apply(score, id)
}

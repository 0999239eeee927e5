package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
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
  * Ordering is (score DESC, id ASC) — the same deterministic tiebreak
  * the window form used, so results are bit-identical.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // (score desc, id asc): a is strictly better than b. Double.compare
  // gives a TOTAL order (NaN sorts greatest, matching Spark's descending
  // sort semantics) — a naive `>` is not total under NaN, which would
  // make results partition-order-dependent and break merge associativity.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: List[(Double, Long)] = Nil

  /** Insert into a size-capped sorted list (k is small; O(k) insert). */
  override def reduce(buf: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] = {
    if (buf.sizeIs >= k && !better(a, buf.last)) buf
    else {
      val (front, back) = buf.span(better(_, a))
      (front ::: a :: back).take(k)
    }
  }

  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] = {
    // merge two sorted lists, keep best k
    val out = List.newBuilder[(Double, Long)]
    var (x, y) = (b1, b2); var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) { out += x.head; x = x.tail }
      else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopK {
  /** `topK(k)(score, id)` aggregation column: array of (score `_1`,
    * id `_2`) structs, best-first under (score desc, id asc).
    */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)
}

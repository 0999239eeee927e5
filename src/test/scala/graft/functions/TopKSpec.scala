package graft.functions

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Algebraic properties the partial-aggregation contract requires of
  * [[TopKAggregator]]: any reduce/merge tree over any partitioning of
  * the input must equal the global sorted-take-k — Spark is free to
  * split the rows across tasks and merge buffers in any shape.
  */
class TopKSpec extends AnyFlatSpec with Matchers {

  private def ordered(rows: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    rows.sorted(Ordering.comparatorToOrdering[(Double, Long)] { (a, b) =>
      val c = java.lang.Double.compare(b._1, a._1) // desc, NaN greatest
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }).take(k)

  // tuple == is false for NaN == NaN; compare on canonical bits instead
  private def bits(rows: Seq[(Double, Long)]): Seq[(Long, Long)] =
    rows.map { case (s, id) => (java.lang.Double.doubleToLongBits(s), id) }

  private def check(p: Prop): Unit = {
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    withClue(r.status.toString)(r.passed shouldBe true)
  }

  private val rowGen: Gen[(Double, Long)] = for {
    // coarse scores force ties so the id tiebreak is exercised; NaN is
    // generated too — the ordering must stay total under it (0/0 sims)
    s <- Gen.frequency(
      (19, Gen.chooseNum(0, 20).map(_ / 10.0)),
      (1, Gen.const(Double.NaN)))
    id <- Gen.chooseNum(0L, 50L)
  } yield (s, id)

  "TopKAggregator" should "equal sorted-take-k under any partitioning" in {
    val agg = new TopKAggregator[Long](5)
    check(Prop.forAll(Gen.listOf(rowGen), Gen.chooseNum(1, 7)) { (rows, parts) =>
      val chunks = if (rows.isEmpty) Seq(Nil) else rows.grouped(math.max(1, rows.size / parts)).toSeq
      val buffers = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = buffers.reduceLeft(agg.merge)
      bits(agg.finish(merged)) == bits(ordered(rows, 5))
    })
  }

  it should "merge associatively and commutatively" in {
    val agg = new TopKAggregator[Long](3)
    check(Prop.forAll(Gen.listOf(rowGen), Gen.listOf(rowGen), Gen.listOf(rowGen)) { (a, b, c) =>
      def buf(xs: Seq[(Double, Long)]) = xs.foldLeft(agg.zero)(agg.reduce)
      val (ba, bb, bc) = (buf(a), buf(b), buf(c))
      val left = agg.merge(agg.merge(buf(a), buf(b)), buf(c))
      val right = agg.merge(ba, agg.merge(bb, bc))
      val swapped = agg.merge(bb, agg.merge(ba, bc))
      bits(left) == bits(right) && bits(right) == bits(swapped) &&
        bits(left) == bits(ordered(a ++ b ++ c, 3))
    })
  }

  it should "keep the buffer bounded at k" in {
    val agg = new TopKAggregator[Long](4)
    val big = (1 to 1000).map(i => (i / 3.0, i.toLong))
    val buf = big.foldLeft(agg.zero)(agg.reduce)
    buf.size shouldBe 4
    agg.finish(buf) shouldBe ordered(big, 4)
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k aggregator's buffer algebra, exercised directly (no
  * Spark session needed): ordering, tie-breaks, the NaN total order, and
  * the Long-key exactness the streaming admission operators rely on. */
class TopKAggSpec extends AnyFunSuite {

  test("Long keys stay exact above 2^53 where a Double key collapses") {
    val big = 1L << 53
    // the hazard being guarded: adjacent longs above 2^53 are the SAME double
    assert(big.toDouble == (big + 1).toDouble)
    val agg = new TopKAggL(2)
    // admission keys on -id: top-2 largest keys = 2 smallest ids
    val buf = Seq(big + 1, big, big + 3)
      .foldLeft(agg.zero)((b, id) => agg.reduce(b, (-id, id)))
    assert(agg.finish(buf).map(_._2) === Seq(big, big + 1))
  }

  test("merge of partial buffers equals reduce over the concatenation") {
    val agg = new TopKAggL(3)
    val ids = Seq(9L, 2L, 7L, 4L, 1L, 8L)
    val (l, r) = ids.splitAt(3)
    val merged = agg.merge(
      l.foldLeft(agg.zero)((b, id) => agg.reduce(b, (-id, id))),
      r.foldLeft(agg.zero)((b, id) => agg.reduce(b, (-id, id))))
    val direct = ids.foldLeft(agg.zero)((b, id) => agg.reduce(b, (-id, id)))
    assert(agg.finish(merged) === agg.finish(direct))
    assert(agg.finish(merged).map(_._2) === Seq(1L, 2L, 4L))
  }

  test("Double NaN keys cannot block the buffer tail") {
    val agg = new TopKAgg(2)
    val buf = Seq((Double.NaN, 5L), (1.0, 1L), (2.0, 2L))
      .foldLeft(agg.zero)(agg.reduce)
    // NaN sorts greater-than-everything and stays comparable on both sides
    assert(agg.finish(buf).map(_._2) === Seq(5L, 2L))
  }

  test("ties break by id ascending, deterministically") {
    val agg = new TopKAgg(2)
    val buf = Seq((1.0, 3L), (1.0, 1L), (1.0, 2L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).map(_._2) === Seq(1L, 2L))
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra–Gries frequency summary as a bounded mergeable aggregator: at
  * most `m` (value → counter) entries, with the classic guarantee that
  * any value is undercounted by at most n/(m+1) — so every value with
  * true frequency above n/(m+1) SURVIVES with a positive counter
  * (candidates ⊇ heavy hitters), which is all p22's two-pass exact
  * heavy-hitter read needs from pass 1.
  *
  * Merge is the mergeable-summaries construction (Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi — PODS'12): sum counters pointwise; if more
  * than m entries survive, subtract the (m+1)-th largest counter value
  * from every counter and drop the non-positive — the error bounds ADD,
  * so any merge tree shape preserves the n/(m+1) guarantee. Counter
  * VALUES may differ across merge orders (the summary is not a
  * semilattice, unlike p21's bottom-k); the SUPERSET guarantee is
  * order-blind, and p22's exact second pass makes the final answer
  * deterministic anyway.
  *
  * reduce(item) = merge with the singleton summary {v: 1}, so one code
  * path carries both the map-side build and the shuffle combine. */
class MisraGriesAgg(m: Int)
    extends Aggregator[Long, mutable.Map[Long, Long], Map[Long, Long]] {
  require(m > 0, s"Misra-Gries needs m > 0, got $m")

  override def zero: mutable.Map[Long, Long] = mutable.Map.empty

  /** Decrement every counter by `cut` and drop the non-positive. */
  private def decrementBy(buf: mutable.Map[Long, Long], cut: Long): mutable.Map[Long, Long] = {
    val dead = buf.iterator.collect { case (v, c) if c - cut <= 0 => v }.toSeq
    dead.foreach(buf.remove)
    buf.keys.toSeq.foreach(v => buf.update(v, buf(v) - cut))
    buf
  }

  private def prune(buf: mutable.Map[Long, Long]): mutable.Map[Long, Long] = {
    if (buf.size > m) {
      // the (m+1)-th largest counter: everything is decremented by it
      val cut = buf.values.toSeq.sorted(Ordering[Long].reverse)(m)
      decrementBy(buf, cut)
    }
    buf
  }

  override def reduce(buf: mutable.Map[Long, Long], v: Long): mutable.Map[Long, Long] = {
    buf.update(v, buf.getOrElse(v, 0L) + 1L)
    // reduce only ever adds a singleton, so a saturated buffer has
    // EXACTLY m+1 entries and the (m+1)-th largest IS the minimum —
    // O(m) per row on the hot map-side path, not an O(m log m) sort
    // (the round-14 ADVICE item; matters if m ever grows past 16)
    if (buf.size > m) decrementBy(buf, buf.values.min)
    buf
  }

  override def merge(a: mutable.Map[Long, Long],
                     b: mutable.Map[Long, Long]): mutable.Map[Long, Long] = {
    b.foreach { case (v, c) => a.update(v, a.getOrElse(v, 0L) + c) }
    prune(a)
  }

  override def finish(buf: mutable.Map[Long, Long]): Map[Long, Long] = buf.toMap

  override def bufferEncoder: Encoder[mutable.Map[Long, Long]] =
    Encoders.kryo[mutable.Map[Long, Long]]
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}

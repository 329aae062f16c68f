package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Bounded top-k aggregator: keeps the k largest (sortKey, id) pairs per
  * group with map-side partial aggregation.
  *
  * The window-function formulation (`row_number().over(partitionBy…)`)
  * must SORT every partition of every group; this aggregator carries an
  * O(k) buffer through a normal aggregate, so shuffle volume per group is
  * k rows regardless of group size — the right shape for "top k per key"
  * over heavy-hitter keys at 100 TB. Ties break by id ascending
  * (deterministic). Key type is generic so rankings that are really
  * integers (streaming admission keys on −doc_id) stay EXACT — a Double
  * key silently loses ordering above 2^53. */
class TopKAggOf[K](k: Int, dedup: Boolean = false)(implicit ord: Ordering[K],
                           outEnc: Encoder[Seq[(K, Long)]])
    extends Aggregator[(K, Long), mutable.ArrayBuffer[(K, Long)], Seq[(K, Long)]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  // buffer kept sorted descending by (sortKey, -id); length ≤ k
  override def zero: mutable.ArrayBuffer[(K, Long)] = mutable.ArrayBuffer.empty

  private def better(a: (K, Long), b: (K, Long)): Boolean = {
    val c = ord.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: mutable.ArrayBuffer[(K, Long)],
                     v: (K, Long)): mutable.ArrayBuffer[(K, Long)] = {
    if (buf.length < k || better(v, buf.last)) {
      var i = buf.length
      while (i > 0 && better(v, buf(i - 1))) i -= 1
      // dedup = SET semantics: an exact (key, id) pair already present is
      // absorbed, not double-inserted — what makes bottom-k a semilattice
      // (p21's re-delivered-partial idempotence). Equal pairs are
      // adjacent in the sorted buffer, so the containment check is O(1)
      // at the insertion point.
      val dup = dedup && ((i > 0 && buf(i - 1) == v) ||
        (i < buf.length && buf(i) == v))
      if (!dup) {
        buf.insert(i, v)
        if (buf.length > k) buf.remove(k)
      }
    }
    buf
  }

  override def reduce(buf: mutable.ArrayBuffer[(K, Long)],
                      v: (K, Long)): mutable.ArrayBuffer[(K, Long)] =
    insert(buf, v)

  override def merge(a: mutable.ArrayBuffer[(K, Long)],
                     b: mutable.ArrayBuffer[(K, Long)]): mutable.ArrayBuffer[(K, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: mutable.ArrayBuffer[(K, Long)]): Seq[(K, Long)] =
    buf.toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(K, Long)]] =
    Encoders.kryo[mutable.ArrayBuffer[(K, Long)]]
  override def outputEncoder: Encoder[Seq[(K, Long)]] = outEnc
}

/** Double-keyed top-k (q25 score ranking). Total order via
  * `java.lang.Double.compare` — primitive > / == are BOTH false against
  * NaN, which would let one NaN key permanently block the buffer tail
  * (every later candidate fails `better(v, buf.last)`). NaN sorts
  * greater-than-everything, consistently on both sides of the compare. */
class TopKAgg(k: Int) extends TopKAggOf[Double](k)(
  Ordering.Double.TotalOrdering, ExpressionEncoder[Seq[(Double, Long)]]())

/** Long-keyed EXACT top-k — the streaming admission aggregators key on
  * −doc_id, where a Double key corrupts ordering for ids above 2^53
  * while the batch admit stays exact. */
class TopKAggL(k: Int) extends TopKAggOf[Long](k)(
  Ordering.Long, ExpressionEncoder[Seq[(Long, Long)]]())

/** String-keyed BOTTOM-k (smallest keys win, ties by id ascending) — the
  * p21 quantile sketch keeps the k smallest md5-hex draw keys per group:
  * "bottom-k by a uniform hash" IS the classic mergeable uniform sample
  * (KMV), and this aggregator's O(k) buffer + merge is exactly the
  * sketch's bounded state + semilattice merge. */
class BottomKAggS(k: Int) extends TopKAggOf[String](k, dedup = true)(
  Ordering.String.reverse, ExpressionEncoder[Seq[(String, Long)]]())

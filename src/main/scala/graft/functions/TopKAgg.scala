package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
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
  * (deterministic).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), mutable.ArrayBuffer[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  // buffer kept sorted descending by (sortKey, -id); length ≤ k
  override def zero: mutable.ArrayBuffer[(Double, Long)] = mutable.ArrayBuffer.empty

  // total order via Double.compare — primitive > / == are BOTH false
  // against NaN, which would let one NaN key permanently block the buffer
  // tail (every later candidate fails `better(v, buf.last)`). NaN sorts
  // greater-than-everything, consistently on both sides of the compare.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: mutable.ArrayBuffer[(Double, Long)],
                     v: (Double, Long)): mutable.ArrayBuffer[(Double, Long)] = {
    if (buf.length < k || better(v, buf.last)) {
      var i = buf.length
      while (i > 0 && better(v, buf(i - 1))) i -= 1
      buf.insert(i, v)
      if (buf.length > k) buf.remove(k)
    }
    buf
  }

  override def reduce(buf: mutable.ArrayBuffer[(Double, Long)],
                      v: (Double, Long)): mutable.ArrayBuffer[(Double, Long)] =
    insert(buf, v)

  override def merge(a: mutable.ArrayBuffer[(Double, Long)],
                     b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: mutable.ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
    buf.toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

package graft.streaming

import graft.SparkSpec
import graft.operators.Temporal
import org.apache.spark.sql.functions._

/** st38's load-bearing property the shared a10 oracle can't see: session
  * runs are a SEMIGROUP under gap-tolerant island merging — any split of
  * the event stream into micro-batches merges back to exactly the batch
  * sessionization, including sessions that straddle batch boundaries,
  * interleave in time, or touch at exactly the gap threshold. */
class StreamSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gap = 10L

  private def batchRows(ev: Seq[(Long, String, Long)]) =
    Temporal.sessionizeOf(ev.toDF("user_id", "event_id", "us"), gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sorted.toSeq

  private def mergedRows(batches: Seq[Seq[(Long, String, Long)]]) = {
    val partials = batches
      .map(b => Streaming.sessionPartials(b.toDF("user_id", "event_id", "us"), gap))
      .reduce[org.apache.spark.sql.DataFrame](_ unionByName _)
    Streaming.sessionMerge(partials, gap)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_us"), col("end_us"), col("dur_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sorted.toSeq
  }

  test("straddling, interleaved, and exactly-gap-touching runs merge to the batch sessions") {
    // u1: one global session 0..20 split so batch A holds {0, 20} (a
    // within-batch gap of 20 > 10 → TWO local runs) and batch B holds
    // the bridging {10}; plus hull-gap == gap exactly (30 from 20 → one
    // session under the ≤ rule); u2: batches interleave inside one run
    val a = Seq((1L, "e1", 0L), (1L, "e2", 20L), (1L, "e4", 30L),
      (2L, "f1", 0L), (2L, "f3", 8L))
    val b = Seq((1L, "e3", 10L), (2L, "f2", 4L), (2L, "f4", 50L))
    assert(mergedRows(Seq(a, b)) === batchRows(a ++ b))
    // the single-batch degenerate case is the identity
    assert(mergedRows(Seq(a)) === batchRows(a))
  }

  test("fuzz: random batch splits merge to the batch sessions") {
    val rnd = new scala.util.Random(38)
    for (trial <- 1 to 4) {
      val ev = (1 to 60).map { i =>
        (1L + rnd.nextInt(3), s"e$i", rnd.nextInt(300).toLong)
      }
      val nB = 1 + rnd.nextInt(4)
      val batches = ev.groupBy(_ => rnd.nextInt(nB)).values.toSeq
      assert(mergedRows(batches) === batchRows(ev), s"trial $trial ($nB batches)")
    }
  }
}

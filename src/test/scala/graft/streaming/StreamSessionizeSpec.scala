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

  test("st42: per-batch islands re-merge to the batch coverage across any split") {
    val rnd = new scala.util.Random(42)
    def cover(iv: Seq[(Long, Long, Long, Long)]) =
      Temporal.intervalCoverageOf(iv.toDF("user_id", "event_id", "s0", "e0"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    def merged(batches: Seq[Seq[(Long, Long, Long, Long)]]) = {
      val partials = batches.map(b =>
        Temporal.islandsOf(b.toDF("user_id", "event_id", "s0", "e0"))
          .select(col("user_id"), col("i_start"), col("i_end"), col("n")))
        .reduce[org.apache.spark.sql.DataFrame](_ unionByName _)
      Streaming.mergeIslands(partials)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    }
    // hand case: an island straddles batches via a bridging interval,
    // and two islands TOUCH exactly at a bound (touch merges in a9)
    val a = Seq((1L, 1L, 0L, 10L), (1L, 2L, 20L, 30L), (2L, 3L, 0L, 5L))
    val b = Seq((1L, 4L, 10L, 20L), (2L, 5L, 9L, 12L))
    assert(merged(Seq(a, b)) === cover(a ++ b))
    for (trial <- 1 to 4) {
      val iv = (1 to 80).map { i =>
        val s = rnd.nextInt(400).toLong
        (1L + rnd.nextInt(3), i.toLong, s, s + 1 + rnd.nextInt(50))
      }
      val nB = 1 + rnd.nextInt(4)
      val batches = iv.groupBy(_ => rnd.nextInt(nB)).values.toSeq
      assert(merged(batches) === cover(iv), s"trial $trial ($nB batches)")
    }
  }

  test("st47: cohort rewind on late data, replay idempotence, fuzz vs local matrix") {
    import java.time.LocalDate
    def merged(batches: Seq[Seq[(Long, String)]]) = {
      val partials = batches.map(b =>
        b.toDF("user_id", "ds")
          .select(col("user_id"), to_timestamp(col("ds")).as("day"))
          .distinct())
        .reduce[org.apache.spark.sql.DataFrame](_ unionByName _)
      Streaming.retentionMerge(partials)
        .select(col("cohort").cast("date").cast("string"),
          col("offset"), col("n_users"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .sorted.toSeq
    }
    def local(rows: Seq[(Long, String)]) = {
      val act = rows.map { case (u, ds) => (u, LocalDate.parse(ds)) }.distinct
      val cohort = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      act.map { case (u, day) =>
          (u, cohort(u), java.time.temporal.ChronoUnit.DAYS.between(cohort(u), day))
        }
        .filter(_._3 <= 7)
        .groupBy { case (_, c, off) => (c.toString, off.toInt) }
        .map { case ((c, off), us) => (c, off, us.map(_._1).distinct.size.toLong) }
        .toSeq.sorted
    }
    // late batch B rewinds user 1's cohort from 01-05 to 01-02; the
    // day-9 activity (offset 7 from the OLD cohort) falls out of the
    // window under the new one (offset 7 → offset 10... stays only if ≤ 7)
    val a = Seq((1L, "2024-01-05"), (1L, "2024-01-06"), (2L, "2024-01-05"))
    val b = Seq((1L, "2024-01-02"))
    assert(merged(Seq(a, b)) === local(a ++ b))
    assert(merged(Seq(a, b)).exists { case (c, off, _) => c == "2024-01-02" && off == 3 })
    // replay idempotence: duplicating whole batches changes nothing
    assert(merged(Seq(a, b, a, b, b)) === merged(Seq(a, b)))
    // fuzz: random activity, random splits, random per-row duplication
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 4) {
      val rows = (1 to 50).map { _ =>
        (1L + rnd.nextInt(4), f"2024-02-${1 + rnd.nextInt(14)}%02d")
      }
      val nB = 1 + rnd.nextInt(4)
      val batches = rows.flatMap(r => Seq.fill(1 + rnd.nextInt(2))(r))
        .groupBy(_ => rnd.nextInt(nB)).values.toSeq
      assert(merged(batches) === local(rows), s"trial $trial ($nB batches)")
    }
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

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  test("asof join: duplicate (key, ts) left rows do not fan out; null keys keep left-outer semantics") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "e1"), (1L, 100L, "e2"),   // duplicate (key, ts)
      (1L, 50L, "e3"),                       // before any right row
      (2L, 100L, "e4"),                      // key with no right rows
      (-1L, 100L, "e5")                      // becomes a null key below
    ).toDF("k", "ts", "tag")
    val leftWithNull = left.withColumn("k", when(col("k") === -1L, lit(null)).otherwise(col("k")))
    val right = Seq((1L, 60L), (1L, 90L), (3L, 10L))
      .toDF("k", "rts").withColumn("v", concat(lit("v"), col("rts")))
    val out = Temporal.asofJoin(leftWithNull, right, "k", "ts", "rts", Seq("v", "rts"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[String]("v"))))
      .toSet
    assert(out == Set(
      ("e1", Some("v90")), ("e2", Some("v90")), // both dup rows match once each
      ("e3", None),                              // nothing at-or-before
      ("e4", None),                              // no right rows for key
      ("e5", None)))                             // null key -> null payload
    assert(Temporal.asofJoin(leftWithNull, right, "k", "ts", "rts", Seq("v")).count() == 5)
  }

  test("forward asof join: earliest right at-or-after, equal-ts inclusive, left-outer") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "e1"),  // rights at 60, 90, 100, 120 -> 100 (equal ts counts)
      (1L, 101L, "e2"),  // -> 120
      (1L, 130L, "e3"),  // nothing at-or-after
      (2L, 10L, "e4")    // key with no right rows
    ).toDF("k", "ts", "tag")
    val right = Seq((1L, 60L), (1L, 90L), (1L, 100L), (1L, 120L))
      .toDF("k", "rts").withColumn("v", concat(lit("v"), col("rts")))
    val out = Temporal.asofJoinForward(left, right, "k", "ts", "rts", Seq("v"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[String]("v")))).toSet
    assert(out === Set(
      ("e1", Some("v100")), ("e2", Some("v120")), ("e3", None), ("e4", None)))
  }

  test("a7 time bars: open/close pick by (us, event_id), empty bars absent, singleton open==close") {
    import spark.implicits._
    // bar width 100: bar 0 holds three events with a TS TIE at us=10 —
    // event_id must break it (e1 < e2), value must not decide anything.
    // bar 1 is empty (no row emitted); bar 2 is a single event.
    val ev = Seq(
      ("x", 10L, "e2", 50L),  // tied ts, higher id — NOT the open
      ("x", 10L, "e1", 99L),  // tied ts, lower id — the open (despite max value)
      ("x", 90L, "e3", 1L),   // latest in bar 0 — the close (despite min value)
      ("x", 250L, "e4", 7L),  // singleton bar 2
      ("y", 5L, "e5", 3L)     // second key, its own bar 0
    ).toDF("event_type", "us", "event_id", "value")
    val bars = Temporal.timeBarsOf(ev, 100L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(bars(("x", 0L)) === ((99L, 99L, 1L, 1L, 3L)),
      "open must be the (us,event_id)-first value, close the last, high/low the extremes")
    assert(!bars.contains(("x", 1L)), "empty bars must be absent, not zero-filled")
    assert(bars(("x", 2L)) === ((7L, 7L, 7L, 7L, 1L)), "singleton bar: open==high==low==close")
    assert(bars(("y", 0L)) === ((3L, 3L, 3L, 3L, 1L)))
    assert(bars.size === 3)
  }

  test("a8 gap fill: empty bars synthesize with the last close; real bars stay unflagged") {
    import spark.implicits._
    // key x has bars 2, 5, 6 → calendar 2..6 with gaps at 3, 4;
    // key y is a singleton (no gaps, no fill)
    val bars = Seq(
      ("x", 2L, 10.0, 3L), ("x", 5L, 20.0, 1L), ("x", 6L, 30.0, 2L),
      ("y", 7L, 1.5, 1L)
    ).toDF("event_type", "bar", "close", "n")
    val filled = Temporal.gapFillOf(bars).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getDouble(2), r.getInt(3)))).toMap
    assert(filled(("x", 2L)) === ((10.0, 0)))
    assert(filled(("x", 3L)) === ((10.0, 1)), "gap carries the last real close")
    assert(filled(("x", 4L)) === ((10.0, 1)))
    assert(filled(("x", 5L)) === ((20.0, 0)))
    assert(filled(("x", 6L)) === ((30.0, 0)))
    assert(filled(("y", 7L)) === ((1.5, 0)))
    assert(filled.size === 6, "calendar spans exactly min..max per key — no bleed across keys")
  }

  test("a9: islands merge overlap/touch/containment once; fuzz matches a local sweep") {
    import spark.implicits._
    def cov(iv: Seq[(Long, Long, Long, Long)]) =
      Temporal.intervalCoverageOf(iv.toDF("user_id", "event_id", "s0", "e0"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // u1: [0,10]∪[5,20] overlap, [30,40]+[40,50] touch-merge → 2 islands, 20+20
    // u2: [0,100] contains [10,20] → 1 island, 100
    val hand = cov(Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 20L), (1L, 3L, 30L, 40L), (1L, 4L, 40L, 50L),
      (2L, 5L, 0L, 100L), (2L, 6L, 10L, 20L)))
    assert(hand(1L) === ((4L, 2L, 40L)))
    assert(hand(2L) === ((2L, 1L, 100L)))
    // seeded fuzz vs a local point-free sweep (sort + merge)
    val rnd = new scala.util.Random(9)
    val iv = (1 to 120).map { i =>
      val u = 1L + rnd.nextInt(3)
      val s = rnd.nextInt(1000).toLong
      (u, i.toLong, s, s + 1 + rnd.nextInt(60))
    }
    def localCovered(xs: Seq[(Long, Long)]): (Long, Long) = { // (islands, covered)
      val sorted = xs.sorted
      var islands = 0L; var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      for ((s, e) <- sorted) {
        if (s > curE || islands == 0L) {
          if (islands > 0L) covered += curE - curS
          islands += 1; curS = s; curE = e
        } else if (e > curE) curE = e
      }
      if (islands > 0L) covered += curE - curS
      (islands, covered)
    }
    val got = cov(iv)
    iv.groupBy(_._1).foreach { case (u, xs) =>
      val (isl, covd) = localCovered(xs.map(t => (t._3, t._4)))
      assert(got(u) === ((xs.size.toLong, isl, covd)), s"user $u")
    }
  }

  test("a11 lag features: first-row NULLs, deltas through filled bars, rolling window shrinks at the edge") {
    import spark.implicits._
    // key x: closes 10, 10 (filled), 4, 20 — the filled bar must feed
    // the NEXT bar's lag/delta exactly like a real one
    val bars = Seq(
      ("x", 0L, 10.0, 0), ("x", 1L, 10.0, 1), ("x", 2L, 4.0, 0), ("x", 3L, 20.0, 0),
      ("y", 7L, 5.0, 0)
    ).toDF("event_type", "bar", "close_ff", "filled")
    val got = Temporal.lagFeaturesOf(bars).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          r.getDouble(6), r.getDouble(7)))).toMap
    assert(got(("x", 0L)) === ((None, None, 10.0, 10.0)), "first row: NULL lag, self-window")
    assert(got(("x", 1L)) === ((Some(10.0), Some(0.0), 10.0, 10.0)), "filled bar: zero delta")
    assert(got(("x", 2L)) === ((Some(10.0), Some(-6.0), 4.0, 10.0)))
    assert(got(("x", 3L)) === ((Some(4.0), Some(16.0), 4.0, 20.0)), "3-bar window excludes bar 0")
    assert(got(("y", 7L)) === ((None, None, 5.0, 5.0)), "keys independent")
  }

  test("a12: power-of-two buckets at the boundaries, tie gaps in -1, per-user independence") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    // gaps engineered per user: u1 → 0 (tie), 1, 2, 3; u2 → 4, 1024
    // buckets: 0→-1, 1→0, 2→1, 3→1, 4→2, 1024→10; cross-user boundary
    // (u1 last to u2 first) must NOT produce a gap
    val dir = java.nio.file.Files.createTempDirectory("a12").toString
    val rows = Seq(
      (1L, "e1", 0L), (1L, "e2", 0L), (1L, "e3", 1L), (1L, "e4", 3L), (1L, "e5", 6L),
      (2L, "f1", 1000000L), (2L, "f2", 1000004L), (2L, "f3", 1001028L))
    rows.toDF("user_id", "event_id", "us")
      .selectExpr("user_id", "event_id",
        "timestamp_micros(us) AS ts", "CAST(0.0 AS DOUBLE) AS value",
        "'x' AS event_type", "'{}' AS props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val got = Temporal.interarrivalSpectrum(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(-1 -> 1L, 0 -> 1L, 1 -> 2L, 2 -> 1L, 10 -> 1L))
    // real data: total gap count = events - users; buckets sane
    val ev = graft.core.Tables.events(spark, d)
    val expected = ev.count() -
      ev.select(org.apache.spark.sql.functions.col("user_id")).distinct().count()
    val real = Temporal.interarrivalSpectrum(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(real.map(_._2).sum === expected)
    assert(real.forall { case (b, n) => b >= -1 && b < 64 && n > 0 })
  }

  private val d = "/root/testdata/sf0.001"

  test("a10 sessionize: exact-gap stays, gap+1 splits, ties share, dense index; fuzz matches a local scan") {
    import spark.implicits._
    def run(ev: Seq[(Long, String, Long)], gap: Long) =
      Temporal.sessionizeOf(ev.toDF("user_id", "event_id", "us"), gap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // gap=10: u1 events at 0,10,20 chain via EXACT-gap rule (10 ≤ 10);
    // 31 is 11 past 20 → new session; tie at 31 shares it. u2 isolated.
    val hand = run(Seq(
      (1L, "e1", 0L), (1L, "e2", 10L), (1L, "e3", 20L),
      (1L, "e4", 31L), (1L, "e5", 31L),
      (2L, "e6", 5L)), 10L)
    assert(hand((1L, 1L)) === ((3L, 0L, 20L, 20L)), "exact-gap chain is ONE session")
    assert(hand((1L, 2L)) === ((2L, 31L, 31L, 0L)), "tied events share the new session")
    assert(hand((2L, 1L)) === ((1L, 5L, 5L, 0L)), "users are independent")
    assert(hand.size === 3)
    // seeded fuzz vs a local sorted scan
    val rnd = new scala.util.Random(11)
    val ev = (1 to 150).map { i =>
      (1L + rnd.nextInt(4), s"e$i", rnd.nextInt(500).toLong)
    }
    val gap = 25L
    val got = run(ev, gap)
    ev.groupBy(_._1).foreach { case (u, xs) =>
      val sorted = xs.map(t => (t._3, t._2)).sorted
      var idx = 0L; var prev = Long.MinValue
      val local = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
      for ((us, _) <- sorted) {
        if (idx == 0L || us - prev > gap) { idx += 1; local(idx) = (0L, us, us) }
        val (n, s0, _) = local(idx)
        local(idx) = (n + 1, s0, us)
        prev = us
      }
      local.foreach { case (i, (n, s0, e0)) =>
        assert(got((u, i)) === ((n, s0, e0, e0 - s0)), s"user $u session $i")
      }
      assert(got.keys.count(_._1 == u) === local.size, s"user $u session count")
    }
  }
}

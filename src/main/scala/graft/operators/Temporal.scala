package graft.operators

import graft.core.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Temporal join operators Spark lacks natively: as-of join and bounded
  * range join. Both are built by composition (preference (a) of the
  * custom-operator ladder): the as-of join is the union+last_value-window
  * pattern — one shuffle on (key), no per-row probing — and the range
  * join buckets time so candidates come from equi-joins on (key, bucket),
  * never a theta join. Both shapes survive 100 TB: work is proportional
  * to matching pairs, not |L|×|R|.
  */
object Temporal extends QueryModule {

  /** Generic as-of join: for each left row, the latest right row with
    * `rightTs <= leftTs` on the same key (left-outer semantics).
    * right must be unique per (key, ts) for determinism — pre-aggregate
    * if needed. `payload` columns are returned matched onto left rows. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, leftTs: String,
               rightTs: String, payloadCols: Seq[String]): DataFrame =
    asofJoinImpl(left, right, key, leftTs, rightTs, payloadCols, forward = false)

  /** FORWARD as-of join: for each left row, the EARLIEST right row with
    * `rightTs >= leftTs` on the same key (left-outer semantics) — the
    * next-event lookup (next order after a touchpoint, next deploy after
    * an alert) that is the mirror of the backward match. Identical
    * union+window shape, just ordered descending, so the same one-shuffle
    * scale contract holds. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String, leftTs: String,
                      rightTs: String, payloadCols: Seq[String]): DataFrame =
    asofJoinImpl(left, right, key, leftTs, rightTs, payloadCols, forward = true)

  private def asofJoinImpl(left: DataFrame, right: DataFrame, key: String, leftTs: String,
               rightTs: String, payloadCols: Seq[String], forward: Boolean): DataFrame = {
    val payload = struct(payloadCols.map(col): _*).as("__payload")
    val lrowType = org.apache.spark.sql.types.StructType(left.schema.fields)
    // null-key/ts right rows can never match under SQL equality semantics
    val r = right
      .where(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key).as("__key"), col(rightTs).as("__ts"),
        lit(0).as("__side"), payload, lit(null).cast(lrowType).as("__lrow"))
    // left rows travel whole through the union — no join-back, so
    // duplicate (key, ts) left rows cannot fan out, and null-key left
    // rows surface with a null payload (left-outer semantics)
    val l = left.select(col(key).as("__key"), col(leftTs).as("__ts"),
      lit(1).as("__side"), lit(null).cast(r.schema("__payload").dataType).as("__payload"),
      struct(left.columns.map(col): _*).as("__lrow"))
    // desc order makes "last right seen so far" = nearest right with
    // ts >= leftTs; __side asc keeps an equal-ts right visible (>=/<=
    // inclusive semantics in both directions)
    val w = Window.partitionBy(col("__key"))
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("__match",
        when(col("__key").isNotNull && col("__ts").isNotNull,
          last(col("__payload"), ignoreNulls = true).over(w)))
      .where(col("__side") === 1)
    val withLeft = matched.select(col("__lrow.*"), col("__match"))
    payloadCols.foldLeft(withLeft) { (df, c) =>
      df.withColumn(c, col("__match").getField(c))
    }.drop("__match")
  }

  /** a1 — events as-of joined to each user's latest order at-or-before
    * the event time. */
  def eventsAsofOrders(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"))
    // dedupe right per (key, ts) for a deterministic match
    val ord = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    asofJoin(ev, ord, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_orderdate"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_orderdate"))
      .orderBy(col("event_id"))
  }

  val eventsAsofOrdersSql: String =
    """WITH r AS (
      |  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id AS event_id, e.user_id AS user_id,
      |  r.o_orderkey AS o_orderkey, r.o_orderdate AS o_orderdate
      |FROM events e ASOF LEFT JOIN r
      |  ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** a6 — FORWARD as-of: each event joined to the user's NEXT order
    * at-or-after the event time (min orderkey on date ties for a
    * deterministic match) — a1's mirror, gated in its own right because
    * the direction flips both the window order and the tie rule. */
  def eventsNextOrder(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(min(col("o_orderkey")).as("o_orderkey"))
    asofJoinForward(ev, ord, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_orderdate"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_orderdate"))
      .orderBy(col("event_id"))
  }

  val eventsNextOrderSql: String =
    """WITH r AS (
      |  SELECT o_custkey AS user_id, o_orderdate, min(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id AS event_id, e.user_id AS user_id,
      |  r.o_orderkey AS o_orderkey, r.o_orderdate AS o_orderdate
      |FROM events e ASOF LEFT JOIN r
      |  ON e.user_id = r.user_id AND e.ts <= r.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** a2 — bounded range self-join: per user, ordered event pairs at most
    * 5 minutes apart. Candidates come from equi-joins on
    * (user, time-bucket) and (user, bucket+1) — the banding trick that
    * replaces the quadratic theta join. */
  def eventPairsWithin(s: SparkSession, d: String): DataFrame = {
    val windowUs = 5L * 60 * 1000000
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("bucket", floor(col("us") / windowUs))
    val a = ev.select(col("user_id"), col("event_id").as("a_event"),
      col("us").as("a_us"), col("bucket"))
    val b0 = ev.select(col("user_id"), col("event_id").as("b_event"),
      col("us").as("b_us"), col("bucket").as("b_bucket"))
    val cand = a.join(b0, a("user_id") === b0("user_id") &&
      (b0("b_bucket") === a("bucket") || b0("b_bucket") === a("bucket") + 1))
    cand
      .where(col("b_us") - col("a_us") <= windowUs &&
        (col("a_us") < col("b_us") ||
          (col("a_us") === col("b_us") && col("a_event") < col("b_event"))))
      .select(a("user_id"), col("a_event"), col("b_event"),
        (col("b_us") - col("a_us")).as("gap_us"))
      .orderBy(col("user_id"), col("a_event"), col("b_event"))
  }

  val eventPairsWithinSql: String =
    """SELECT a.user_id AS user_id, a.event_id AS a_event, b.event_id AS b_event,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND epoch_us(b.ts) >= epoch_us(a.ts)
      | AND epoch_us(b.ts) - epoch_us(a.ts) <= 5*60*1000000
      | AND (epoch_us(a.ts) < epoch_us(b.ts)
      |      OR (epoch_us(a.ts) = epoch_us(b.ts) AND a.event_id < b.event_id))
      |ORDER BY user_id, a_event, b_event""".stripMargin

  /** a3 — FUNNEL analysis: per user, the earliest strictly-ordered
    * view → click → purchase chain (t₂ = first click AFTER the first
    * view, t₃ = first purchase AFTER that click) and the furthest stage
    * reached — the product-analytics sequence operator (the ordered-
    * chain semantics a naive per-type min gets wrong: a click BEFORE the
    * first view must not count). Each stage is one filtered groupBy +
    * one equi-join on user_id — no window over the full event stream, no
    * per-user sort, so the plan is three narrow shuffles at any scale.
    * Timestamps compare as integer epoch-micros (the q26 parity rule). */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      col("event_type").as("et"),
      unix_micros(col("ts").cast("timestamp")).as("us"))
    val s1 = ev.where(col("et") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val s2 = ev.where(col("et") === "click")
      .join(s1, "user_id").where(col("us") > col("t1"))
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val s3 = ev.where(col("et") === "purchase")
      .join(s2, "user_id").where(col("us") > col("t2"))
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    ev.select(col("user_id")).distinct()
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .withColumn("stage",
        when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1).otherwise(0))
      .select(col("user_id"), col("stage"), col("t1"), col("t2"), col("t3"))
      .orderBy(col("user_id"))
  }

  val funnelSql: String =
    """WITH ev AS (SELECT user_id, event_type AS et, epoch_us(ts) AS us FROM events),
      |s1 AS (SELECT user_id, min(us) AS t1 FROM ev WHERE et = 'view' GROUP BY user_id),
      |s2 AS (SELECT ev.user_id, min(us) AS t2 FROM ev JOIN s1 USING (user_id)
      |       WHERE et = 'click' AND us > t1 GROUP BY ev.user_id),
      |s3 AS (SELECT ev.user_id, min(us) AS t3 FROM ev JOIN s2 USING (user_id)
      |       WHERE et = 'purchase' AND us > t2 GROUP BY ev.user_id)
      |SELECT u.user_id,
      |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
      |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage,
      |  t1, t2, t3
      |FROM (SELECT DISTINCT user_id FROM ev) u
      |LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      |LEFT JOIN s3 USING (user_id)
      |ORDER BY u.user_id""".stripMargin

  /** a4 — COHORT RETENTION: users cohorted by first-activity day, then
    * the classic retention matrix — how many of each cohort were active
    * again `offset` days later (offsets 0..7). Two groupBys and one
    * equi-join on user_id; the distinct-day projection collapses the
    * event stream before anything wide happens, so the joined frame is
    * |users|·|active days|, not |events|. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val act = Tables.events(s, d)
      // cohort stays a TIMESTAMP (midnight): Spark DATE surfaces as a
      // python date object while DuckDB DATE arrives datetime64 — the
      // driver hashes those differently (q21's month_start precedent)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val first = act.groupBy("user_id").agg(min(col("day")).as("cohort"))
    act.join(first, "user_id")
      .withColumn("offset",
        datediff(col("day").cast("date"), col("cohort").cast("date")))
      .where(col("offset") <= 7)
      .groupBy(col("cohort"), col("offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort"), col("offset"))
  }

  val retentionSql: String =
    """WITH act AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
      |  FROM events),
      |f AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id)
      |SELECT cohort,
      |  CAST(CAST(day AS DATE) - CAST(cohort AS DATE) AS INT) AS "offset",
      |  count(DISTINCT act.user_id) AS n_users
      |FROM act JOIN f USING (user_id)
      |WHERE CAST(day AS DATE) - CAST(cohort AS DATE) <= 7
      |GROUP BY cohort, CAST(day AS DATE) - CAST(cohort AS DATE)
      |ORDER BY cohort, "offset"""".stripMargin

  /** a5 — SCD2 POINT-IN-TIME join: each customer's orders form a
    * slowly-changing dimension (version = orderkey, valid from its order
    * date until the next version's date, last version open-ended;
    * same-day re-versions collapse to the day's highest orderkey — the
    * empty-interval rule), and every lineitem joins the version valid at
    * its SHIP date. The oracle states the textbook interval-containment
    * join; the engine runs the equivalent as-of plan ([[asofJoin]]'s
    * union + last-window — one shuffle on the customer key, no theta
    * join), because interval containment over a versioned dimension IS
    * "latest version at or before ts" once empty intervals are dropped. */
  def scd2PointInTime(s: SparkSession, d: String): DataFrame = {
    // the day's last version wins (empty intervals never match)
    val dim = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("c"), col("o_orderdate").as("vfrom"))
      .agg(max(col("o_orderkey")).as("version"))
    val fact = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        col("o_custkey").as("c"))
    asofJoin(fact, dim, "c", "l_shipdate", "vfrom", Seq("version"))
      .select(col("l_orderkey"), col("l_linenumber"), col("version"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val scd2PointInTimeSql: String =
    """WITH v AS (
      |  SELECT o_custkey AS c, o_orderdate AS vfrom, max(o_orderkey) AS version
      |  FROM orders GROUP BY o_custkey, o_orderdate),
      |dim AS (
      |  SELECT c, vfrom, version,
      |    lead(vfrom) OVER (PARTITION BY c ORDER BY vfrom) AS vto
      |  FROM v),
      |fact AS (
      |  SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_custkey AS c
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
      |SELECT f.l_orderkey, f.l_linenumber, d.version
      |FROM fact f LEFT JOIN dim d
      |  ON d.c = f.c AND f.l_shipdate >= d.vfrom
      | AND (d.vto IS NULL OR f.l_shipdate < d.vto)
      |ORDER BY f.l_orderkey, f.l_linenumber""".stripMargin

  /** a7 — TIME-BAR DOWNSAMPLING (OHLC): the time-series resample that
    * turns an event stream into fixed-width bars — per (event_type,
    * hour) the opening/closing value on the deterministic (ts, event_id)
    * order plus high/low/count. One map-combinable aggregation: open and
    * close ride a struct-min/max (partial aggregation keeps only one
    * candidate per partition, so the shuffle carries |bars| rows, not
    * |events|), and every output is a value PICK, never float
    * arithmetic — order-independent, hence hash-stable at any
    * parallelism. This is the 100 TB shape: no window over the raw
    * stream, no per-key sort. */
  def timeBars(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("us"),
      col("event_id"), col("value"))
    timeBarsOf(ev, 3600L * 1000000)
  }

  /** The bar aggregation on an arbitrary (event_type, us, event_id,
    * value) frame — spec-testable seam for [[timeBars]]. */
  private[graft] def timeBarsOf(ev: DataFrame, barUs: Long): DataFrame = {
    // (us, event_id) is unique, so the struct min/max picks exactly the
    // first/last event of the bar — the value field never decides ties
    ev.groupBy(col("event_type"), floor(col("us") / barUs).as("bar"))
      .agg(
        min(struct(col("us"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("us"), col("event_id"), col("value")))
          .getField("value").as("close"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bar"))
  }

  val timeBarsSql: String =
    """WITH b AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS bar,
      |    epoch_us(ts) AS us, event_id, value
      |  FROM events)
      |SELECT event_type, bar,
      |  first(value ORDER BY us, event_id) AS open,
      |  max(value) AS high, min(value) AS low,
      |  last(value ORDER BY us, event_id) AS close,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM b GROUP BY event_type, bar
      |ORDER BY event_type, bar""".stripMargin

  /** a8 — CALENDAR GAP-FILL over a7's bars: densify each event_type to
    * its full contiguous bar range (`sequence` + `explode` — generated,
    * not joined against a calendar table) and forward-fill the close
    * into empty bars (`last(_, ignoreNulls)` over an unbounded-preceding
    * row frame), flagging synthesized rows. The resample-then-ffill
    * primitive every time-series feature pipeline needs before lag
    * features can be computed on regular grids. Scale shape: the
    * calendar explode is O(|bars|) rows keyed by event_type, and the
    * fill is one ordered window per key — no self-join, no per-gap
    * probing. The first bar of each key is real by construction (the
    * range starts at min(bar)), so close_ff is never NULL. */
  def gapFillBars(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("us"),
      col("event_id"), col("value"))
    gapFillOf(timeBarsOf(ev, 3600L * 1000000))
  }

  /** The densify + forward-fill on an arbitrary bars frame (needs
    * event_type, bar, close, n) — spec-testable seam. */
  private[graft] def gapFillOf(bars: DataFrame): DataFrame = {
    val cal = bars.groupBy(col("event_type"))
      .agg(min(col("bar")).as("b0"), max(col("bar")).as("b1"))
      .select(col("event_type"), explode(sequence(col("b0"), col("b1"))).as("bar"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bar"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(bars.select(col("event_type"), col("bar"), col("close"), col("n")),
        Seq("event_type", "bar"), "left")
      .withColumn("close_ff", last(col("close"), ignoreNulls = true).over(w))
      .select(col("event_type"), col("bar"), col("close_ff"),
        when(col("n").isNull, lit(1)).otherwise(lit(0)).as("filled"))
      .orderBy(col("event_type"), col("bar"))
  }

  val gapFillBarsSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS bar,
      |    epoch_us(ts) AS us, event_id, value FROM events),
      |b AS (
      |  SELECT event_type, bar,
      |    last(value ORDER BY us, event_id) AS close, count(*) AS n
      |  FROM e GROUP BY 1, 2),
      |rng AS (
      |  SELECT event_type, unnest(generate_series(min(bar), max(bar))) AS bar
      |  FROM b GROUP BY event_type),
      |j AS (
      |  SELECT r.event_type, r.bar, b.close, b.n
      |  FROM rng r LEFT JOIN b ON b.event_type = r.event_type AND b.bar = r.bar)
      |SELECT event_type, bar,
      |  last_value(close IGNORE NULLS) OVER (PARTITION BY event_type
      |    ORDER BY bar ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ff,
      |  CASE WHEN n IS NULL THEN 1 ELSE 0 END AS filled
      |FROM j ORDER BY event_type, bar""".stripMargin

  /** a9 — INTERVAL-UNION COVERAGE (the gaps-and-islands classic): each
    * event opens a `value`-minute window; per user, how much wall-clock
    * is covered counting overlaps ONCE — the session/uptime/billing
    * primitive none of a1–a8 states. Islands are maximal overlapping
    * runs detected with the running-max-of-ends rule (an interval whose
    * start exceeds every previous end under the (start, end, event_id)
    * total order opens a new island; touching intervals merge), and an
    * island's union is contiguous by construction, so its coverage is
    * max(end) − min(start) — no per-point sweep. Interval ends are
    * exact: value is 2-decimal, so value·6e7 µs is integral on both
    * engines before the bigint cast. Hub-safe shape: the only windows
    * run per USER over that user's intervals. */
  def intervalCoverage(s: SparkSession, d: String): DataFrame = {
    val us = unix_micros(col("ts").cast("timestamp"))
    intervalCoverageOf(Tables.events(s, d)
      .select(col("user_id"), col("event_id"), us.as("s0"),
        (us + (graft.core.Exact.dec(col("value")) * 60000000).cast("long")).as("e0")))
      .orderBy(col("user_id"))
  }

  /** [[intervalCoverage]] over an explicit `(user_id, event_id, s0, e0)`
    * interval frame — the spec's fixture entry. */
  private[graft] def intervalCoverageOf(iv: DataFrame): DataFrame =
    islandsOf(iv)
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_islands"),
        sum(col("i_end") - col("i_start")).as("covered_us"))

  /** The per-user island table behind [[intervalCoverageOf]] — exposed
    * as the st42 partial unit (an island's union is contiguous, so
    * (i_start, i_end, n) rows are re-mergeable downstream). */
  private[graft] def islandsOf(iv: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("s0"), col("e0"), col("event_id"))
    iv.withColumn("prev_max",
        max(col("e0")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max").isNull || col("s0") > col("prev_max"), 1L).otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s0")).as("i_start"), max(col("e0")).as("i_end"),
        count(lit(1)).as("n"))
  }

  val intervalCoverageSql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS s0,
      |    epoch_us(ts) + CAST(CAST(value AS DECIMAL(12,2)) * 60000000 AS BIGINT) AS e0
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, s0, e0,
      |    max(e0) OVER (PARTITION BY user_id ORDER BY s0, e0, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |  FROM iv),
      |i AS (
      |  SELECT user_id, s0, e0,
      |    sum(CASE WHEN prev_max IS NULL OR s0 > prev_max THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY s0, e0, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM m),
      |isl AS (
      |  SELECT user_id, island, min(s0) AS i_start, max(e0) AS i_end,
      |    count(*) AS n
      |  FROM i GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
      |  count(*) AS n_islands,
      |  CAST(sum(i_end - i_start) AS BIGINT) AS covered_us
      |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin

  /** a10 — SESSIONIZATION to per-SESSION rows: q13 counts sessions per
    * user; a10 materialises each session — per user, maximal runs of
    * events whose consecutive gaps are ≤ 30 min under the
    * (us, event_id) total order, one row per session (dense 1-based
    * index, event count, exact bounds, duration). Session ROWS are what
    * retention/funnel/billing pipelines actually key on; the
    * gap rule is the industry-standard inactivity cut (a gap EQUAL to
    * the threshold keeps the session — only strictly-greater splits,
    * stated identically in both engines). Shape: one lag + one running
    * sum per USER over that user's events, then a map-combinable
    * groupBy — no self-join, no global window, so the plan is hub-safe
    * for any realistic user cardinality and survives 100 TB exactly
    * like a9's island windows do. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
      unix_micros(col("ts").cast("timestamp")).as("us"))
    sessionizeOf(ev, 30L * 60 * 1000000)
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** [[sessionize]] over an explicit `(user_id, event_id, us)` frame —
    * the spec's fixture entry. */
  private[graft] def sessionizeOf(ev: DataFrame, gapUs: Long): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val marked = ev
      .withColumn("prev_us", lag(col("us"), 1).over(ord))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
  }

  val sessionizeSql: String =
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |m AS (
      |  SELECT user_id, event_id, us,
      |    lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
      |  FROM ev),
      |s AS (
      |  SELECT user_id, us,
      |    sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
      |        THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM m)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  count(*) AS n_events, min(us) AS start_us, max(us) AS end_us,
      |  CAST(max(us) - min(us) AS BIGINT) AS dur_us
      |FROM s GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  /** a11 — LAG FEATURES over the regular grid: the step a8 exists FOR —
    * once bars are densified and forward-filled, per event_type the
    * previous close, the one-bar delta, and the rolling 3-bar min/max
    * become well-defined features (on the raw irregular stream, "lag 1"
    * means "whatever happened to be previous", which leaks gap length
    * into every feature). Exactness: close_ff values are value PICKS
    * (never arithmetic), so the single IEEE double subtraction in
    * d_close is bit-identical on both engines; min/max are picks again.
    * Scale shape: one ordered window per event_type over |bars| rows —
    * bounded by the time range, not the event volume, which is what
    * makes per-key windows safe here and NOT on the raw stream. */
  def lagFeatures(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("us"),
      col("event_id"), col("value"))
    lagFeaturesOf(gapFillOf(timeBarsOf(ev, 3600L * 1000000)))
      .orderBy(col("event_type"), col("bar"))
  }

  /** [[lagFeatures]] over an explicit gap-filled bars frame (needs
    * event_type, bar, close_ff, filled) — spec-testable seam. */
  private[graft] def lagFeaturesOf(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bar"))
    bars
      .withColumn("prev_close", lag(col("close_ff"), 1).over(w))
      .withColumn("d_close", col("close_ff") - col("prev_close"))
      .withColumn("min3", min(col("close_ff")).over(w.rowsBetween(-2, 0)))
      .withColumn("max3", max(col("close_ff")).over(w.rowsBetween(-2, 0)))
  }

  val lagFeaturesSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS bar,
      |    epoch_us(ts) AS us, event_id, value FROM events),
      |b AS (
      |  SELECT event_type, bar,
      |    last(value ORDER BY us, event_id) AS close, count(*) AS n
      |  FROM e GROUP BY 1, 2),
      |rng AS (
      |  SELECT event_type, unnest(generate_series(min(bar), max(bar))) AS bar
      |  FROM b GROUP BY event_type),
      |j AS (
      |  SELECT r.event_type, r.bar, b.close, b.n
      |  FROM rng r LEFT JOIN b ON b.event_type = r.event_type AND b.bar = r.bar),
      |g AS (
      |  SELECT event_type, bar,
      |    last_value(close IGNORE NULLS) OVER (PARTITION BY event_type
      |      ORDER BY bar ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ff,
      |    CASE WHEN n IS NULL THEN 1 ELSE 0 END AS filled
      |  FROM j)
      |SELECT event_type, bar, close_ff, filled,
      |  lag(close_ff) OVER w AS prev_close,
      |  close_ff - lag(close_ff) OVER w AS d_close,
      |  min(close_ff) OVER (PARTITION BY event_type ORDER BY bar
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min3,
      |  max(close_ff) OVER (PARTITION BY event_type ORDER BY bar
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max3
      |FROM g
      |WINDOW w AS (PARTITION BY event_type ORDER BY bar)
      |ORDER BY event_type, bar""".stripMargin

  /** a12 — INTER-ARRIVAL SPECTRUM: the distribution of per-user gaps
    * between consecutive events, bucketed by power-of-two microseconds
    * (bucket = ⌊log₂ gap⌋ via BIT LENGTH, zero gaps in bucket −1) — the
    * burstiness diagnostic behind every sessionization/watermark/rate-
    * limit threshold choice: a10's 30-minute cut and a watermark's
    * lateness bound should come from THIS table's valley, not folklore.
    * Integer-exact: ⌊log₂ gap⌋ is the binary-digit count minus one
    * (Spark `conv(_,10,2)`, DuckDB `bin(_)` — string length, no float
    * log2 whose boundary cells could disagree); zero gaps (ts ties) get
    * their own −1 bucket. Shape: one lag window per USER (the a9/a10
    * hub-safety argument), then a map-combinable histogram groupBy —
    * output bounded by 64 buckets. */
  def interarrivalSpectrum(s: SparkSession, d: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(ord))
      .where(col("gap").isNotNull)
      .select(when(col("gap") === 0, lit(-1))
        .otherwise(length(conv(col("gap"), 10, 2)) - lit(1)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  val interarrivalSpectrumSql: String =
    """WITH g AS (
      |  SELECT epoch_us(ts)
      |    - lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |        ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events)
      |SELECT CAST(CASE WHEN gap = 0 THEN -1
      |            ELSE length(bin(gap)) - 1 END AS INT) AS bucket,
      |  count(*) AS n
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  /** a13 — TIME-WEIGHTED AVERAGE (TWAP): the value a user's stream HELD
    * over time, not the value it emitted — Σ vᵢ·(tᵢ₊₁−tᵢ) / Σ gaps, the
    * metric behind billing-by-state, position-weighted pricing and
    * resource-utilisation rollups, where a plain avg() over-weights
    * bursts (a hundred ticks in one second count once per SECOND here,
    * not a hundred times). Exactness discipline: cents × second-
    * granularity gaps keep everything in LONG arithmetic (per-user
    * weighted sums stay < 2⁶³ up to ~10⁶ events/user at these value
    * ranges — beyond that the sum column moves to DECIMAL(38,0), noted
    * here for the 100 TB reader); the average itself is floor division,
    * identical in both engines, NULL when a user's events all share one
    * second (zero total duration — the only honest answer). One lead
    * window + one grouped sum; no joins. */
  def twap(s: SparkSession, d: String): DataFrame =
    // unix_micros(cast to timestamp) interprets the NTZ input in the
    // SESSION timezone, while DuckDB's epoch_us treats it as UTC. Every
    // session builder in this repo (Verify, Bench, SparkSpec, tools/*)
    // pins spark.sql.session.timeZone=UTC, which makes the two agree and
    // the gap arithmetic DST-invariant — the round-13 ADVICE item. A
    // non-UTC embedding session would shift individual gaps across DST
    // transitions (constant offsets cancel; transitions don't).
    twapOf(Tables.events(s, d)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"),
        (graft.core.Exact.dec(col("value")) * 100).cast("long").as("v")))
      .orderBy(col("user_id"))

  /** [[twap]] over an explicit (user_id, us, event_id, v) frame. */
  private[graft] def twapOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    ev
      .withColumn("next_us", lead(col("us"), 1).over(w))
      // integer div, never float: a float quotient that lands exactly on
      // an integer after rounding would truncate one second high
      .withColumn("gap_s", expr("(next_us - us) div 1000000"))
      .where(col("gap_s").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_s")).as("dur_s"),
        sum(col("v") * col("gap_s")).as("wsum"))
      .select(col("user_id"), col("n_gaps"), col("dur_s"),
        when(col("dur_s") > 0, expr("wsum div dur_s")).as("twap_cents"))
  }

  val twapSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
      |  FROM events),
      |g AS (
      |  SELECT user_id, v,
      |    (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us)
      |      // 1000000 AS gap_s
      |  FROM ev)
      |SELECT user_id, count(*) AS n_gaps,
      |  CAST(sum(gap_s) AS BIGINT) AS dur_s,
      |  CASE WHEN sum(gap_s) > 0
      |    THEN CAST(sum(v * gap_s) // sum(gap_s) AS BIGINT) END AS twap_cents
      |FROM g WHERE gap_s IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  override val defs: ListMap[String, QueryDef] = ListMap(
    "a1_asof_join"  -> QueryDef(eventsAsofOrders, Some(eventsAsofOrdersSql), bench = true),
    "a2_range_join" -> QueryDef(eventPairsWithin, Some(eventPairsWithinSql)),
    "a3_funnel"     -> QueryDef(funnel, Some(funnelSql)),
    "a4_retention"  -> QueryDef(retention, Some(retentionSql)),
    "a5_scd2_join"  -> QueryDef(scd2PointInTime, Some(scd2PointInTimeSql)),
    "a6_asof_forward" -> QueryDef(eventsNextOrder, Some(eventsNextOrderSql)),
    "a7_time_bars"  -> QueryDef(timeBars, Some(timeBarsSql)),
    "a8_gap_fill"   -> QueryDef(gapFillBars, Some(gapFillBarsSql)),
    "a9_interval_coverage" -> QueryDef(intervalCoverage, Some(intervalCoverageSql)),
    "a10_sessionize" -> QueryDef(sessionize, Some(sessionizeSql)),
    "a11_lag_features" -> QueryDef(lagFeatures, Some(lagFeaturesSql)),
    "a12_interarrival_spectrum" -> QueryDef(interarrivalSpectrum, Some(interarrivalSpectrumSql)),
    "a13_twap" -> QueryDef(twap, Some(twapSql)),
  )
}

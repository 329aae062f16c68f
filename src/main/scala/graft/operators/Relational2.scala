package graft.operators

import graft.core.{Exact, QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Second relational batch: outer/cross joins, cube grouping sets,
  * INTERSECT/EXCEPT, the scalar string/date function families (SURVEY
  * §2.8), and exact percentiles. */
object Relational2 extends QueryModule {
  import Exact._

  /** Full outer join with using-column coalescing. */
  def fullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).where(col("c_nationkey") < 13)
      .select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1999-01-01") && col("o_orderdate") < lit("2000-01-01"))
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, Seq("c_custkey"), "full_outer")
      .orderBy(col("c_custkey"))
  }

  val fullOuterSql: String =
    """SELECT c_custkey, c_nationkey, n_orders
      |FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 13) c
      |FULL OUTER JOIN (
      |  SELECT o_custkey AS c_custkey, count(*) AS n_orders FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1999-01-01' AND o_orderdate < TIMESTAMP '2000-01-01'
      |  GROUP BY o_custkey) o
      |USING (c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Cross join (cartesian of two small sets). */
  def crossJoin(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).select(col("r_name"))
      .crossJoin(Tables.orders(s, d).select(col("o_orderstatus")).distinct())
      .orderBy(col("r_name"), col("o_orderstatus"))

  val crossJoinSql: String =
    """SELECT r_name, o_orderstatus
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
      |ORDER BY r_name, o_orderstatus""".stripMargin

  /** CUBE grouping sets (extends the reference's fixed edge cube A4). */
  def ordersCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val ordersCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** INTERSECT + EXCEPT in one result, tagged by operator. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    val lowCust = Tables.customer(s, d).where(col("c_acctbal") < 0)
      .select(col("c_nationkey").as("nationkey"))
    cn.intersect(sn).withColumn("op", lit("intersect"))
      .union(cn.except(lowCust).withColumn("op", lit("except")))
      .select(col("op"), col("nationkey"))
      .orderBy(col("op"), col("nationkey"))
  }

  val setOpsSql: String =
    """SELECT 'intersect' AS op, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'except', nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT SELECT c_nationkey FROM customer WHERE c_acctbal < 0)
      |ORDER BY op, nationkey""".stripMargin

  /** Scalar string-function family (§2.8: case folding, substrings,
    * concat, translate, regexp replace, padding, reverse, hashing). */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      lower(col("p_type")).as("lo"),
      upper(col("p_name")).as("up"),
      substring(col("p_name"), 1, 5).as("sub"),
      concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
      translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
      regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
      lpad(col("p_brand"), 12, ".").as("pad"),
      reverse(col("p_name")).as("rev"),
      length(col("p_name")).as("len"),
      md5(col("p_name")).as("h"))
      .orderBy(col("p_partkey"))

  val stringFuncsSql: String =
    """SELECT p_partkey,
      |  lower(p_type) AS lo, upper(p_name) AS up,
      |  substr(p_name, 1, 5) AS sub,
      |  p_brand || '|' || p_type AS cat,
      |  translate(p_name, 'aeiou', 'AEIOU') AS tr,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
      |  lpad(p_brand, 12, '.') AS pad,
      |  reverse(p_name) AS rev,
      |  len(p_name) AS len,
      |  md5(p_name) AS h
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date/time scalar family over orders. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dd"),
      dayofweek(col("o_orderdate")).as("dow1"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"))
      .orderBy(col("o_orderkey"))

  val dateFuncsSql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  day(o_orderdate) AS dd,
      |  dayofweek(o_orderdate) + 1 AS dow1,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Exact percentiles (interpolated median / p90 per group — both
    * engines implement the same (1−f)·a + f·b interpolation). */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val percentilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Array/map scalar family over tokenized documents (SURVEY §2.8
    * array/map row: arrayify, element access, dedup/sort, membership). */
  def arrayFuncs(s: SparkSession, d: String): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    Tables.documents(s, d).select(
      col("doc_id"),
      size(words).as("n_words"),
      element_at(words, 1).as("first_word"),
      element_at(words, 2).as("second_word"),
      array_contains(words, "spark").cast("int").as("has_spark"),
      array_join(slice(array_sort(array_distinct(words)), 1, 3), ",").as("top3_sorted"),
      size(array_distinct(words)).as("n_distinct_words"))
      .orderBy(col("doc_id"))
  }

  val arrayFuncsSql: String =
    """SELECT doc_id,
      |  len(string_split_regex(trim(text), '\s+')) AS n_words,
      |  string_split_regex(trim(text), '\s+')[1] AS first_word,
      |  string_split_regex(trim(text), '\s+')[2] AS second_word,
      |  CAST(list_contains(string_split_regex(trim(text), '\s+'), 'spark') AS INT) AS has_spark,
      |  array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+')))[1:3], ',') AS top3_sorted,
      |  len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_distinct_words
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q34 — REGEX-FILTERED ARRAY COMPREHENSION, the hpo notebook's
    * id-extraction idiom (`notebooks/hpo.ipynb`:
    * `[id in term.id WHERE id =~ "hp:[0-9]*" | id][0]`): a higher-order
    * `filter` with an `rlike` predicate, then the first survivor.
    * Cypher's `=~` is a FULL match, so the engine anchors the pattern
    * (`^…$`) — the fixture places a substring-only match (`xhp:<n>`)
    * BEFORE the real id so unanchored search semantics would pick the
    * wrong element, and a trailing-garbage id (`hp:<n>z`) AFTER it so a
    * prefix-only match would change the survivor count. Pure per-row
    * scalar work: no shuffle beyond the presentation sort, codegen'd
    * end to end. */
  def regexArrayProjection(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      array(
        concat(lit("xhp:"), col("doc_id").cast("string")),
        concat(lit("mp:"), col("doc_id").cast("string")),
        concat(lit("hp:"), col("doc_id").cast("string")),
        concat(lit("hp:"), col("doc_id").cast("string"), lit("z"))).as("ids"))
      .select(
        col("doc_id"),
        element_at(expr("filter(ids, x -> x rlike '^hp:[0-9]*$')"), 1).as("from_id"),
        size(expr("filter(ids, x -> x rlike '^hp:[0-9]*$')")).cast("long").as("n_hp"))
      .orderBy(col("doc_id"))

  val regexArrayProjectionSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    ['xhp:' || CAST(doc_id AS VARCHAR), 'mp:' || CAST(doc_id AS VARCHAR),
      |     'hp:' || CAST(doc_id AS VARCHAR), 'hp:' || CAST(doc_id AS VARCHAR) || 'z'] AS ids
      |  FROM documents)
      |SELECT doc_id,
      |  list_filter(ids, x -> regexp_full_match(x, 'hp:[0-9]*'))[1] AS from_id,
      |  CAST(len(list_filter(ids, x -> regexp_full_match(x, 'hp:[0-9]*'))) AS BIGINT) AS n_hp
      |FROM t ORDER BY doc_id""".stripMargin

  /** q35 — ORDINAL EXPLODE: the position-preserving set-returning
    * projection (Spark `posexplode` ≡ SQL `UNNEST ... WITH ORDINALITY`)
    * — the idiom sequence-aware pipelines need everywhere (token
    * positions for n-gram windows, frame indices for m2's sampling,
    * rank-stamped array unrolling) and the one place a bare `explode`
    * silently loses information: element ORDER. A document's leading
    * trigram survives the round-trip as (doc_id, pos, token) rows. The
    * oracle states the same unroll through DuckDB's lateral
    * `unnest(generate_series(...))` + 1-based subscripting — a
    * deliberately different formulation, so an engine explode that
    * scrambled or dropped positions cannot mirror itself green. Scale
    * shape: generator expressions are row-local (no shuffle); the only
    * exchange is the final sort. */
  def ordinalExplode(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .where(col("doc_id") % 100 === 0)
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
      .select(col("doc_id"), posexplode(col("arr")).as(Seq("pos", "token")))
      .where(col("pos") < 3)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
      .orderBy(col("doc_id"), col("pos"))

  val ordinalExplodeSql: String =
    """WITH dd AS (
      |  SELECT doc_id, string_split(text, ' ') AS arr
      |  FROM documents WHERE doc_id % 100 = 0)
      |SELECT doc_id, CAST(u.g - 1 AS BIGINT) AS pos, arr[u.g] AS token
      |FROM dd, unnest(generate_series(1, len(arr))) AS u(g)
      |WHERE u.g <= 3
      |ORDER BY doc_id, pos""".stripMargin

  /** Spark 4 VariantType path for polymorphic JSON (SURVEY §1.5 suggests
    * Variant as the alternative to string+kind tagging): parse once,
    * extract typed. */
  def variantJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", expr("variant_get(v, '$.k', 'bigint')"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  val variantJsonSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin


  /** Custom bounded top-k AGGREGATE (graft.functions.TopKAgg): per-group
    * O(k) buffers with map-side combine instead of the window-function
    * full partition sort — same result as q14, different (scalable)
    * physical shape. */
  def topkAggregate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = new graft.functions.TopKAgg(3)
    Tables.customer(s, d)
      .select(col("c_nationkey").cast("int"), col("c_acctbal"), col("c_custkey"))
      .as[(Int, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (nation, top) =>
        top.zipWithIndex.map { case ((bal, ck), i) => (nation, i + 1, ck, bal) }
      }
      .toDF("c_nationkey", "rank_in_nation", "c_custkey", "c_acctbal")
      .orderBy(col("c_nationkey"), col("rank_in_nation"))
  }

  val topkAggregateSql: String =
    """SELECT c_nationkey, rank_in_nation, c_custkey, c_acctbal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rank_in_nation
      |  FROM customer) WHERE rank_in_nation <= 3
      |ORDER BY c_nationkey, rank_in_nation""".stripMargin

  /** q26 — RANGE-frame moving window: per user, the count and exact
    * decimal sum of event values over the trailing hour (RANGE, not ROWS:
    * the frame is time-bounded, so simultaneous events are peers and a
    * burst widens the frame — the semantics ROWS frames get wrong).
    * Both engines order by integer epoch-MICROseconds with an integer
    * frame bound: Spark's `rangeBetween` takes numeric offsets, and a
    * seconds-granularity cast would disagree with DuckDB's full-precision
    * interval arithmetic on sub-second gaps.
    * Scale: one shuffle on user_id, per-partition sort — the sliding
    * aggregation itself is streaming within the frame. */
  def movingWindow(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      // ts is TIMESTAMP_NTZ; session TZ is pinned UTC, so the LTZ hop is
      // the identity and unix_micros matches DuckDB's epoch_us(naive ts)
      .withColumn("tus", unix_micros(col("ts").cast("timestamp_ltz")))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win", sum(dec(col("value"))).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("n_win"), col("sum_win"))
      .orderBy(col("event_id"))
  }

  val movingWindowSql: String =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS n_win,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_win
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** q27 — PIVOT: long→wide reshape (per-nation counts fanned across the
    * five market segments), the `relationalise`-style wide projection as
    * a first-class operator rather than a sink detail (K1's Neo4j frame
    * pivots the same way). The value list is EXPLICIT — `pivot(col)`
    * without one runs a distinct-scan job just to discover columns,
    * which at 100 TB is a full extra pass; a declared vocabulary keeps
    * the plan one aggregate. Absent combinations fill 0 (count
    * semantics), matching the oracle's FILTER form. */
  def pivotSegments(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .pivot("c_mktsegment",
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("c_nationkey"))

  val pivotSegmentsSql: String = {
    val cols = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      .map(v => s"""CAST(count(*) FILTER (c_mktsegment = '$v') AS BIGINT) AS "$v"""")
      .mkString(",\n  ")
    s"""SELECT c_nationkey,
      |  $cols
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  }

  /** q28 — RUNNING DISTINCT COUNT window: per user ordered by time, how
    * many distinct event types have been seen so far. Neither engine
    * runs `count(DISTINCT)` over a running frame efficiently (Spark
    * doesn't support it at all), so this pins the standard REWRITE:
    * flag each row that is the first occurrence of its (user, type) —
    * one row_number over the small (user, type) partition — then a
    * running sum of flags over the time order. Two narrow window passes,
    * no per-row set state, same total order on both engines. */
  def runningDistinct(s: SparkSession, d: String): DataFrame = {
    val first = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("tus"), col("event_id"))
    val running = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("tus", unix_micros(col("ts").cast("timestamp_ltz")))
      .withColumn("is_first",
        (row_number().over(first) === 1).cast("long"))
      .withColumn("n_types_seen", sum(col("is_first")).over(running))
      .select(col("event_id"), col("user_id"), col("n_types_seen"))
      .orderBy(col("event_id"))
  }

  val runningDistinctSql: String =
    """SELECT event_id, user_id, CAST(n_types_seen AS BIGINT) AS n_types_seen FROM (
      |  SELECT event_id, user_id,
      |    sum(is_first) OVER (PARTITION BY user_id
      |      ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_types_seen
      |  FROM (
      |    SELECT event_id, user_id, us,
      |      CAST(row_number() OVER (PARTITION BY user_id, event_type
      |        ORDER BY us, event_id) = 1 AS BIGINT) AS is_first
      |    FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
      |          FROM events)))
      |ORDER BY event_id""".stripMargin

  /** q29 — CORRELATED MULTI-EXISTS (the TPC-H Q21 "suppliers who kept
    * waiting" shape, adapted to this testdata's columns: a supplier is
    * LATE on an order when one of its lines shipped >60 days after
    * o_orderdate). For each finished ('F') order with at least two
    * suppliers where EXACTLY ONE supplier was late, charge that supplier
    * one wait; top 20 by waits. The reference surface has no correlated
    * subqueries, but any SQL user of a relational engine reaches for
    * EXISTS / NOT EXISTS — this gate pins the decorrelated Spark shape
    * against a DuckDB oracle written with literal correlated
    * EXISTS / NOT EXISTS, i.e. a structurally different formulation, so
    * a decorrelation bug cannot mirror itself into the oracle.
    *
    * Scale shape: one lineitem⋈orders equi-join (orders pre-filtered on
    * status before the shuffle), then two layered aggregations on the
    * SAME orderkey grouping — per-(order, supplier) late flag with
    * map-side combine, per-order supplier/late counts — and a final
    * equi-join back; no correlated per-row probing anywhere. The
    * supplier name dim joins broadcast. */
  def soleLateSupplier(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .agg(max((col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS")).cast("long")).as("late"))
    val perOrder = pairs.groupBy(col("ok"))
      .agg(count(lit(1)).as("nsupp"), sum(col("late")).as("nlate"))
      .where(col("nsupp") > 1 && col("nlate") === 1)
    pairs.where(col("late") === 1)
      .join(perOrder, "ok")
      .groupBy(col("sk")).agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"))), col("sk") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val soleLateSupplierSql: String =
    """WITH l1 AS (
      |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F'
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |SELECT s_name, count(*) AS numwait
      |FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** q30 — explicit GROUPING SETS with grouping flags: the third member
    * of the grouping-set family (q18 covers CUBE; ROLLUP is a prefix
    * chain of this) — callers that want exactly (status, priority),
    * (status), () and NOT the (priority)-only set cube would add, plus
    * the per-row `grouping()` flags every BI layer uses to tell a data
    * NULL from a roll-up NULL. Flags are stated per column (cast to
    * INT) rather than via grouping_id, because the two engines pack the
    * bitmask in different column orders — per-column flags are
    * unambiguous. One shuffle; Spark expands the sets with a single
    * Expand node, same as cube. */
  def orderGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"),
        grouping(col("o_orderstatus")).cast("int").as("gs"),
        grouping(col("o_orderpriority")).cast("int").as("gp"))
      .orderBy(col("gs"), col("gp"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val orderGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS gs,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS gp
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY gs, gp, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** q31 — ROLLUP: the hierarchical prefix chain completing the
    * grouping family (q18 CUBE = every subset, q30 explicit sets, q31 =
    * prefixes only — the drill-down a (status → priority) hierarchy
    * reports). Same per-column grouping flags as q30 so a roll-up NULL
    * is distinguishable from a data NULL. */
  def ordersRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"),
        grouping(col("o_orderstatus")).cast("int").as("gs"),
        grouping(col("o_orderpriority")).cast("int").as("gp"))
      .orderBy(col("gs"), col("gp"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val ordersRollupSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS gs,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS gp
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY gs, gp, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** q32 — NULL-AWARE ANTI-JOIN semantics: the four membership flavors
    * (IN / NOT IN / EXISTS / NOT EXISTS) against a subquery whose key
    * column CONTAINS NULLs — the SQL three-valued-logic trap every
    * migration hits: `NOT IN` over a null-bearing set is vacuously
    * empty (x <> NULL is UNKNOWN, so no row ever passes), while
    * `NOT EXISTS` keeps the rows an engineer usually meant. Stated as
    * literal SQL on both engines so the parity IS the contract, and
    * the counts pin the algebra: in = exists, exists + not_exists =
    * total, not_in = 0 whenever a NULL is present. Scale shape: Spark
    * plans the NOT IN arm as its null-aware anti join (single-key
    * broadcast NAAJ — bounded by the dim side), the others as
    * semi/anti hash joins; nothing here is row-by-row. */
  def nullAntijoin(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("q32_orders")
    Tables.customer(s, d).createOrReplaceTempView("q32_customer")
    s.sql("""
      WITH sub AS (
        SELECT CASE WHEN c_acctbal > 5000 THEN c_custkey END AS k
        FROM q32_customer)
      SELECT 'in' AS variant, count(*) AS n
      FROM q32_orders WHERE o_custkey IN (SELECT k FROM sub)
      UNION ALL
      SELECT 'not_in', count(*)
      FROM q32_orders WHERE o_custkey NOT IN (SELECT k FROM sub)
      UNION ALL
      SELECT 'exists', count(*)
      FROM q32_orders o WHERE EXISTS (SELECT 1 FROM sub WHERE k = o.o_custkey)
      UNION ALL
      SELECT 'not_exists', count(*)
      FROM q32_orders o WHERE NOT EXISTS (SELECT 1 FROM sub WHERE k = o.o_custkey)
      ORDER BY variant""")
  }

  val nullAntijoinSql: String =
    """WITH sub AS (
      |  SELECT CASE WHEN c_acctbal > 5000 THEN c_custkey END AS k
      |  FROM customer)
      |SELECT 'in' AS variant, count(*) AS n
      |FROM orders WHERE o_custkey IN (SELECT k FROM sub)
      |UNION ALL
      |SELECT 'not_in', count(*)
      |FROM orders WHERE o_custkey NOT IN (SELECT k FROM sub)
      |UNION ALL
      |SELECT 'exists', count(*)
      |FROM orders o WHERE EXISTS (SELECT 1 FROM sub WHERE k = o.o_custkey)
      |UNION ALL
      |SELECT 'not_exists', count(*)
      |FROM orders o WHERE NOT EXISTS (SELECT 1 FROM sub WHERE k = o.o_custkey)
      |ORDER BY variant""".stripMargin

  /** q33 — CORRELATED SCALAR SUBQUERIES: per-nation customer count and
    * max balance as SELECT-list scalars, plus a HAVING-style filter on
    * another correlated scalar (nations above the global per-nation
    * average) — the decorrelation surface q29's EXISTS family doesn't
    * touch: Catalyst must rewrite each scalar subquery into an
    * aggregate + left outer join (visible as no per-row re-execution
    * in the plan), and empty groups must surface as COUNT 0 / NULL max
    * per ANSI scalar-subquery semantics, not vanish. Stated as literal
    * SQL on both engines. */
  def correlatedScalar(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("q33_nation")
    Tables.customer(s, d).createOrReplaceTempView("q33_customer")
    s.sql("""
      SELECT n_nationkey, n_name,
        (SELECT count(*) FROM q33_customer WHERE c_nationkey = n_nationkey) AS n_cust,
        (SELECT max(c_acctbal) FROM q33_customer
         WHERE c_nationkey = n_nationkey) AS max_bal
      FROM q33_nation
      WHERE (SELECT count(*) FROM q33_customer WHERE c_nationkey = n_nationkey)
            > (SELECT count(*) FROM q33_customer) / 50
      ORDER BY n_nationkey""")
  }

  val correlatedScalarSql: String =
    """SELECT n_nationkey, n_name,
      |  (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
      |  (SELECT max(c_acctbal) FROM customer
      |   WHERE c_nationkey = n_nationkey) AS max_bal
      |FROM nation
      |WHERE (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey)
      |      > (SELECT count(*) FROM customer) / 50
      |ORDER BY n_nationkey""".stripMargin

  override val defs: ListMap[String, QueryDef] = ListMap(
    "q16_full_outer"  -> QueryDef(fullOuter, Some(fullOuterSql)),
    "q17_cross_join"  -> QueryDef(crossJoin, Some(crossJoinSql)),
    "q18_orders_cube" -> QueryDef(ordersCube, Some(ordersCubeSql)),
    "q19_set_ops"     -> QueryDef(setOps, Some(setOpsSql)),
    "q20_string_funcs" -> QueryDef(stringFuncs, Some(stringFuncsSql)),
    "q21_date_funcs"  -> QueryDef(dateFuncs, Some(dateFuncsSql)),
    "q22_percentiles" -> QueryDef(percentiles, Some(percentilesSql)),
    "q23_array_funcs" -> QueryDef(arrayFuncs, Some(arrayFuncsSql)),
    "q24_variant_json" -> QueryDef(variantJson, Some(variantJsonSql)),
    "q25_topk_aggregate" -> QueryDef(topkAggregate, Some(topkAggregateSql)),
    "q26_moving_window" -> QueryDef(movingWindow, Some(movingWindowSql), bench = true),
    "q27_pivot"       -> QueryDef(pivotSegments, Some(pivotSegmentsSql)),
    "q28_running_distinct" -> QueryDef(runningDistinct, Some(runningDistinctSql)),
    "q29_sole_late_supplier" -> QueryDef(soleLateSupplier, Some(soleLateSupplierSql)),
    "q30_grouping_sets" -> QueryDef(orderGroupingSets, Some(orderGroupingSetsSql)),
    "q31_rollup" -> QueryDef(ordersRollup, Some(ordersRollupSql)),
    "q32_null_antijoin" -> QueryDef(nullAntijoin, Some(nullAntijoinSql)),
    "q33_correlated_scalar" -> QueryDef(correlatedScalar, Some(correlatedScalarSql)),
    "q34_regex_array_projection" -> QueryDef(regexArrayProjection, Some(regexArrayProjectionSql)),
    "q35_ordinal_explode" -> QueryDef(ordinalExplode, Some(ordinalExplodeSql)),
  )
}


package graft.operators

import graft.core.{Exact, QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Generic relational operator layer — the aggregate / join / sort / top-k /
  * set-op shapes that underlie every GrEBI pipeline stage and query
  * (SURVEY.md §2.3–2.8): k-way merge group-by (A1), stats aggregation (A2),
  * broadcast dimension joins (J1/J3), semi/anti joins (J3, negated Solr
  * filters `GrebiSolrQuery.java:118-120`), sorted-distinct (O3,
  * `04_index/grebi_index/src/main.rs:234-242`), top-k
  * (`queries/genes_to_diseases_ranked_by_otar_score.cypher:8-10`), unions
  * (`nextflow/01_create_subgraph.nf:20-27`).
  *
  * Scale notes (100 TB): dimension tables (region/nation/supplier) are
  * broadcast — no shuffle; fact-fact joins (orders⨝lineitem) shuffle on the
  * join key once and reuse the partitioning for the following aggregate.
  * All money arithmetic goes through [[graft.core.Exact]] so results
  * hash-match the DuckDB oracle bit-for-bit.
  */
object Relational extends QueryModule {
  import Exact._

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)

  /** TPC-H Q1 shape: full-scan aggregate with map-side partial agg.
    * GrEBI analog: index stats pass (A2, `04_index/grebi_index/src/main.rs:103-197`). */
  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    val disc  = dec(lit(1.0) - col("l_discount"))
    val tax   = dec(lit(1.0) + col("l_tax"))
    li(s, d)
      .filter(col("l_shipdate") <= lit("2001-06-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * disc).cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * disc * tax).cast("double").as("sum_charge"),
        avgd(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-06-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q5 shape: 6-way star join + aggregate. Dims broadcast; the
    * orders⨝lineitem fact join shuffles on orderkey. GrEBI analog: the
    * canonical 3-hop Cypher queries (Q11, `queries/mouse_phenotypes_by_system.cypher`). */
  def revenueByNation(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d); val o = ord(s, d); val l = li(s, d)
    val su = Tables.supplier(s, d); val n = Tables.nation(s, d); val r = Tables.region(s, d)
    o.filter(col("o_orderdate") >= lit("1998-01-01") && col("o_orderdate") < lit("1999-01-01"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey") && su("s_nationkey") === c("c_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val revenueByNationSql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM orders, customer, lineitem, supplier, nation, region
      |WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
      |  AND o_custkey = c_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |  AND n_nationkey = s_nationkey AND r_regionkey = n_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** TPC-H Q3 shape: join + aggregate + global top-k (O4; `orderBy.limit`
    * compiles to TakeOrderedAndProject — no full sort at scale). */
  def topOrdersByRevenue(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d); val l = li(s, d); val c = Tables.customer(s, d)
    c.filter(col("c_mktsegment") === "BUILDING")
      .join(o, o("o_custkey") === c("c_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val topOrdersByRevenueSql: String =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND o_custkey = c_custkey AND l_orderkey = o_orderkey
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin

  /** Left-semi join (J3 edge detection shape:
    * `05_materialise/grebi_materialise/src/main.rs:286`). */
  def orderPrioritySemi(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d); val l = li(s, d)
    o.filter(col("o_orderdate") >= lit("1998-01-01") && col("o_orderdate") < lit("1999-01-01"))
      .join(l, l("l_orderkey") === o("o_orderkey") && l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val orderPrioritySemiSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Anti join — GrEBI's negated filters (`GrebiSolrQuery.java:118-120`). */
  def customersWithoutOrders(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = ord(s, d).filter(col("o_orderdate") >= lit("1999-01-01"))
    c.join(o, o("o_custkey") === c("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy(col("c_custkey"))
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name, c_nationkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** Semi join with dimension filter pushdown to the parquet scan. */
  def partsWithShipments(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d); val l = li(s, d)
    p.filter(col("p_size") >= 40)
      .join(l.filter(col("l_quantity") >= 45), l("l_partkey") === p("p_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  val partsWithShipmentsSql: String =
    """SELECT p_partkey, p_name, p_size FROM part
      |WHERE p_size >= 40
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 45)
      |ORDER BY p_partkey""".stripMargin

  /** Sorted distinct (O3 — `sort -u` of names/ids,
    * `04_index/grebi_index/src/main.rs:234-242`). */
  def distinctSegments(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_mktsegment")).distinct()
      .orderBy(col("c_mktsegment"))

  val distinctSegmentsSql: String =
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"

  /** Set union + dedup (U1/U2 — union of ingest outputs then `sort -u`). */
  def unionNationkeys(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val su = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    c.union(su).distinct().orderBy(col("nationkey"))
  }

  val unionNationkeysSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** Window: per-supplier argmax line (rarest-type argmin shape, A6 —
    * `05_materialise/grebi_materialise/src/main.rs:213-217`). */
  def topLinePerSupplier(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    li(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_suppkey"))
  }

  val topLinePerSupplierSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
      |  FROM lineitem) WHERE rn = 1 ORDER BY l_suppkey""".stripMargin

  /** Ranked top-k per group (query-time ranking, O4). */
  def topCustomersPerNation(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, d)
      .withColumn("rank_in_nation", row_number().over(w))
      .filter(col("rank_in_nation") <= 3)
      .select(col("c_nationkey"), col("rank_in_nation"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_nationkey"), col("rank_in_nation"))
  }

  val topCustomersPerNationSql: String =
    """SELECT c_nationkey, rank_in_nation, c_custkey, c_acctbal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rank_in_nation
      |  FROM customer) WHERE rank_in_nation <= 3
      |ORDER BY c_nationkey, rank_in_nation""".stripMargin

  /** Time-bucketed aggregate over the events table (batch twin of the
    * streaming windowed agg in graft.streaming). */
  def eventsHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumd(col("value")).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  val eventsHourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** JSON scalar extraction (GrEBI json field access,
    * `grebi_shared/src/lib.rs:26-106`). */
  def eventsJsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val eventsJsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Sessionization via lag window: gap > 30 min starts a new session.
    * Deterministic integer (microsecond) arithmetic on both engines. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 30L * 60 * 1000000, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("new_session")).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  val sessionizeSql: String =
    """SELECT user_id, count(*) AS n_events, CAST(sum(new_session) AS BIGINT) AS n_sessions FROM (
      |  SELECT user_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) > 30*60*1000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Grouped string stats over documents (scalar string functions, §2.8). */
  def docSourceStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("source"))

  val docSourceStatsSql: String =
    """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  count(DISTINCT lang) AS n_langs
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Grouping-sets rollup (extends GrEBI's fixed edge-summary cube A4,
    * `05_materialise/grebi_materialise/src/main.rs:443-452`). */
  def ordersRollup(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val ordersRollupSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  override val defs: ListMap[String, QueryDef] = ListMap(
    "q1_pricing_summary"    -> QueryDef(pricingSummary, Some(pricingSummarySql), bench = true),
    "q2_revenue_by_nation"  -> QueryDef(revenueByNation, Some(revenueByNationSql), bench = true),
    "q3_top_orders"         -> QueryDef(topOrdersByRevenue, Some(topOrdersByRevenueSql), bench = true),
    "q4_order_priority"     -> QueryDef(orderPrioritySemi, Some(orderPrioritySemiSql), bench = true),
    "q5_top_line_per_supplier" -> QueryDef(topLinePerSupplier, Some(topLinePerSupplierSql)),
    "q6_distinct_segments"  -> QueryDef(distinctSegments, Some(distinctSegmentsSql)),
    "q7_union_nationkeys"   -> QueryDef(unionNationkeys, Some(unionNationkeysSql)),
    "q8_customers_no_orders" -> QueryDef(customersWithoutOrders, Some(customersWithoutOrdersSql)),
    "q9_parts_with_shipments" -> QueryDef(partsWithShipments, Some(partsWithShipmentsSql)),
    "q10_events_hourly"     -> QueryDef(eventsHourly, Some(eventsHourlySql), bench = true),
    "q11_events_json"       -> QueryDef(eventsJsonExtract, Some(eventsJsonExtractSql)),
    "q12_doc_source_stats"  -> QueryDef(docSourceStats, Some(docSourceStatsSql)),
    "q13_sessionize"        -> QueryDef(sessionize, Some(sessionizeSql), bench = true),
    "q14_top_customers_per_nation" -> QueryDef(topCustomersPerNation, Some(topCustomersPerNationSql)),
    "q15_orders_rollup"     -> QueryDef(ordersRollup, Some(ordersRollupSql)),
  )
}

package graft.operators

import graft.core.{QueryDef, QueryModule, Tables}
import graft.curie.PrefixTrie
import graft.functions.NormalisePrefix
import graft.identity.{AssignIds, ConnectedComponents, Groups}
import graft.merge.Merge
import graft.model.{IngestNode, RawValue}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** The GrEBI-shaped engine operators (SURVEY §2.2 P1, §2.3 J1/J2/J7,
  * §2.4 A1) driven against the relational testdata so the DuckDB oracle can
  * check them: a synthetic property graph is derived from the TPC-H-ish
  * tables (customers/suppliers/nations/regions as nodes), the real engine
  * code runs on it, and the oracle recomputes the expected closed-form
  * result.
  */
object GraphOps extends QueryModule {

  private def pad(c: Column): Column = graft.core.Pad.col9(c)
  private def node(prefix: String, c: Column): Column = graft.core.Pad.node(prefix, c)
  private val sqlPad = (col: String) => graft.core.Pad.sql(col)

  /** [[RawValue.str]] as a Catalyst column (field names/order must match
    * the RawValue encoder) — lets the gate ingest rows build inside
    * codegen instead of through typed maps (round 16). */
  private def rvCol(v: Column): Column = struct(
    v.as("value"), lit("s").as("kind"),
    map_from_arrays(array().cast("array<string>"),
      array().cast("array<array<string>>")).as("qualifiers"))

  /** IngestNode column list in encoder field order (subgraph fixed to
    * the tpch test subgraph). */
  private def ingestNode(ids: Column, datasource: String, types: Column,
      props: Column): Seq[Column] = Seq(
    ids.as("ids"), lit(datasource).as("datasource"), lit("tpch").as("subgraph"),
    types.as("types"), props.as("props"))

  // ---------------------------------------------------------------------
  // P1 — prefix-trie normalisation (reference `grebi_shared/src/prefix_map.rs`)
  // ---------------------------------------------------------------------

  private val trie = PrefixTrie(Map(
    "CUST:" -> "c:",
    "http://example.org/" -> "ex:",
    "http://example.org/cust/" -> "c:"))

  /** Synthesises ids in four spellings (CURIE, lowercase CURIE, long IRI,
    * unknown prefix) and runs the codegen'd trie rewrite. Exercises
    * longest-prefix-wins and case-insensitivity. */
  def normalisePrefixes(s: SparkSession, d: String): DataFrame = {
    val ck = col("c_custkey")
    val raw = when(ck % 5 === 1, concat(lit("other:"), pad(ck)))
      .when(ck % 7 === 0, concat(lit("http://example.org/thing/"), pad(ck)))
      .when(ck % 3 === 0, concat(lit("cust:"), pad(ck)))
      .when(ck % 2 === 0, concat(lit("CUST:"), pad(ck)))
      .otherwise(concat(lit("http://example.org/cust/"), pad(ck)))
    Tables.customer(s, d)
      .select(ck.as("c_custkey"), raw.as("raw"))
      .withColumn("normalised", NormalisePrefix(col("raw"), trie))
      .orderBy(col("c_custkey"))
  }

  val normalisePrefixesSql: String =
    s"""WITH raws AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 5 = 1 THEN 'other:' || ${sqlPad("c_custkey")}
      |         WHEN c_custkey % 7 = 0 THEN 'http://example.org/thing/' || ${sqlPad("c_custkey")}
      |         WHEN c_custkey % 3 = 0 THEN 'cust:' || ${sqlPad("c_custkey")}
      |         WHEN c_custkey % 2 = 0 THEN 'CUST:' || ${sqlPad("c_custkey")}
      |         ELSE 'http://example.org/cust/' || ${sqlPad("c_custkey")} END AS raw
      |  FROM customer)
      |SELECT c_custkey, raw,
      |  CASE WHEN c_custkey % 5 = 1 THEN raw
      |       WHEN c_custkey % 7 = 0 THEN 'ex:' || substr(raw, 20)
      |       ELSE 'c:' || ${sqlPad("c_custkey")} END AS normalised
      |FROM raws ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // J7 — connected components (reference union-find,
  // `02_assign_ids/grebi_identifiers2groups/src/main.rs:54-115`)
  // ---------------------------------------------------------------------

  /** Graph: customer→nation, supplier→nation, nation→region. True
    * components are the 5 regions (reachable only transitively — the
    * min label must travel customer→nation→region→nation→customer, so
    * convergence needs several propagation rounds). */
  def connectedComponents(s: SparkSession, d: String): DataFrame = {
    val cEdges = Tables.customer(s, d)
      .select(node("c:", col("c_custkey")).as("src"), node("n:", col("c_nationkey")).as("dst"))
    val sEdges = Tables.supplier(s, d)
      .select(node("s:", col("s_suppkey")).as("src"), node("n:", col("s_nationkey")).as("dst"))
    val nEdges = Tables.nation(s, d)
      .select(node("n:", col("n_nationkey")).as("src"), node("r:", col("n_regionkey")).as("dst"))
    ConnectedComponents.run(cEdges.union(sEdges).union(nEdges))
      .orderBy(col("member"))
  }

  val connectedComponentsSql: String =
    s"""WITH members AS (
      |  SELECT 'c:' || ${sqlPad("c_custkey")} AS member, n_regionkey AS rk
      |    FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  UNION ALL
      |  SELECT 's:' || ${sqlPad("s_suppkey")}, n_regionkey
      |    FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  UNION ALL
      |  SELECT 'n:' || ${sqlPad("n_nationkey")}, n_regionkey FROM nation
      |  UNION ALL
      |  SELECT 'r:' || ${sqlPad("r_regionkey")}, r_regionkey FROM region)
      |SELECT member, min(member) OVER (PARTITION BY rk) AS component
      |FROM members ORDER BY member""".stripMargin

  // ---------------------------------------------------------------------
  // J7 + id_score — groups table with canonical-id pick
  // ---------------------------------------------------------------------

  /** Each order row contributes the id-set {order id, customer id}; the
    * customer id merges all of a customer's orders into one clique, and
    * the canonical member ('c:…' sorts below 'o:…' at equal id score) is
    * the customer. */
  def groupsCanonical(s: SparkSession, d: String): DataFrame = {
    val idSets = Tables.orders(s, d)
      .select(array(node("o:", col("o_orderkey")), node("c:", col("o_custkey"))).as("ids"))
    Groups.fromIdSets(idSets)
      .select(col("member"), col("canonical"))
      .orderBy(col("member"))
  }

  val groupsCanonicalSql: String =
    s"""WITH pairs AS (
      |  SELECT 'o:' || ${sqlPad("o_orderkey")} AS member,
      |         'c:' || ${sqlPad("o_custkey")} AS canonical
      |  FROM orders
      |  UNION
      |  SELECT DISTINCT 'c:' || ${sqlPad("o_custkey")}, 'c:' || ${sqlPad("o_custkey")}
      |  FROM orders)
      |SELECT member, canonical FROM pairs ORDER BY member""".stripMargin

  // ---------------------------------------------------------------------
  // J1 + A1 — assign ids and clique-merge with provenance
  // ---------------------------------------------------------------------

  /** Two synthetic datasources over the customer table (ds2 covers even
    * custkeys only, re-asserting `segment` and adding `nat`), pushed
    * through the real AssignIds + Merge aggregator, then flattened to one
    * row per (node, key, value) with its provenance. */
  def mergeProvenance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val idc = node("c:", col("c_custkey"))
    // ingest rows built column-natively (round 16; was two typed maps) —
    // same IngestNode values, constructed with struct/map literals so
    // the whole pre-merge prefix stays in codegen
    val ds1 = c.select(ingestNode(array(idc), "ds1", array(lit("Customer")),
      map(lit("grebi:name"), array(rvCol(col("c_name"))),
        lit("segment"), array(rvCol(col("c_mktsegment"))))): _*).as[IngestNode]
    val ds2 = c.filter(col("c_custkey") % 2 === 0)
      .select(ingestNode(array(idc), "ds2", array().cast("array<string>"),
        map(lit("segment"), array(rvCol(col("c_mktsegment"))),
          lit("nat"), array(rvCol(col("c_nationkey").cast("string"))))): _*)
      .as[IngestNode]
    // Identity groups (each customer is its own clique) — kept distributed:
    // the groups table joins against the candidate strings instead of being
    // collected to the driver, so this shape survives a 100× customer table.
    val groupsDf = c.select(idc.as("member"), idc.as("canonical"))
    val merged = Merge(s, AssignIds.joinBased(s, ds1.union(ds2), groupsDf))
    merged.flatMap { m =>
      m.props.toSeq.flatMap { case (k, vs) =>
        vs.map(v => (m.nodeId, k, v.value, v.datasources.mkString(",")))
      }
    }.toDF("node_id", "key", "value", "datasources")
      .orderBy(col("node_id"), col("key"), col("value"))
  }

  val mergeProvenanceSql: String =
    s"""WITH asserts AS (
      |  SELECT 'c:' || ${sqlPad("c_custkey")} AS node_id, 'grebi:name' AS key, c_name AS value, 'ds1' AS ds FROM customer
      |  UNION ALL
      |  SELECT 'c:' || ${sqlPad("c_custkey")}, 'segment', c_mktsegment, 'ds1' FROM customer
      |  UNION ALL
      |  SELECT 'c:' || ${sqlPad("c_custkey")}, 'grebi:type', 'Customer', 'ds1' FROM customer
      |  UNION ALL
      |  SELECT 'c:' || ${sqlPad("c_custkey")}, 'segment', c_mktsegment, 'ds2' FROM customer WHERE c_custkey % 2 = 0
      |  UNION ALL
      |  SELECT 'c:' || ${sqlPad("c_custkey")}, 'nat', CAST(c_nationkey AS VARCHAR), 'ds2' FROM customer WHERE c_custkey % 2 = 0)
      |SELECT node_id, key, value, string_agg(DISTINCT ds, ',' ORDER BY ds) AS datasources
      |FROM asserts GROUP BY node_id, key, value
      |ORDER BY node_id, key, value""".stripMargin

  // ---------------------------------------------------------------------
  // Full-DAG end-to-end: the entire subgraph build as one gate query
  // ---------------------------------------------------------------------

  /** The flagship workload: two datasources (customers under two
    * equivalent id schemes; orders referencing the NON-canonical customer
    * id) pushed through the complete pipeline — equivalence cliques via
    * CC, id assignment rewriting the order→customer references to the
    * canonical member, provenance merge, then edge materialisation. The
    * output is the combined edge list, which is only correct if every
    * stage (grouping, canonical pick, value rewrite, merge, edge join)
    * is. */
  def pipelineE2e(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ingest rows built column-natively (round 16; was two typed maps):
    // the groups/assign branches downstream are pruned codegen
    // projections, so no IngestNode object is ever constructed on the
    // id-set path
    val custs = Tables.customer(s, d)
      .select(ingestNode(
        array(node("c:", col("c_custkey")), node("alt:", col("c_custkey"))),
        "ds_cust", array(lit("Customer")),
        map(lit("grebi:name"), array(rvCol(col("c_name"))))): _*)
      .as[IngestNode]
    val ords = Tables.orders(s, d)
      .select(ingestNode(
        array(node("o:", col("o_orderkey"))), "ds_ord", array(lit("Order")),
        map(lit("ord:customer"), array(rvCol(node("c:", col("o_custkey")))))): _*)
      .as[IngestNode]
    val build = graft.pipeline.GraftPipeline.run(s,
      graft.pipeline.SubgraphConfig(name = "tpch"), Seq(custs, ords))
    build.edges
      .select(col("fromNodeId"), col("edgeType"), col("toNodeId"))
      .orderBy(col("fromNodeId"))
  }

  /** The expected edge list in closed form: 'alt:…' sorts before 'c:…'
    * at equal id score, so it is every clique's canonical member and the
    * rewritten edge target. */
  val pipelineE2eSql: String =
    s"""SELECT 'o:' || ${sqlPad("o_orderkey")} AS fromNodeId,
      |  'ord:customer' AS edgeType,
      |  'alt:' || ${sqlPad("o_custkey")} AS toNodeId
      |FROM orders ORDER BY fromNodeId""".stripMargin

  override val defs: ListMap[String, QueryDef] = ListMap(
    "g1_normalise_prefixes"   -> QueryDef(normalisePrefixes, Some(normalisePrefixesSql)),
    "g2_connected_components" -> QueryDef(connectedComponents, Some(connectedComponentsSql), bench = true, deep = true),
    "g3_groups_canonical"     -> QueryDef(groupsCanonical, Some(groupsCanonicalSql)),
    "g4_merge_provenance"     -> QueryDef(mergeProvenance, Some(mergeProvenanceSql), bench = true),
    "g14_pipeline_e2e"        -> QueryDef(pipelineE2e, Some(pipelineE2eSql), bench = true, deep = true),
  )
}

package graft.materialise

import graft.model.{MaterialisedEdge, MergedNode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** 05_materialise parity (SURVEY §2.3 J3/J4, §2.4 A4/A6): turn property
  * values that reference other nodes into first-class edges, compute the
  * display type, embed referenced-node metadata, and build the edge
  * summary cube.
  *
  * Reference: `05_materialise/grebi_materialise/src/main.rs` — there the
  * node-id set is an in-RAM map probed per value (`:286,:312`); here edge
  * detection is a JOIN against the metadata projection, so Catalyst
  * broadcasts it while it fits and falls back to a shuffle join beyond
  * that — the plan survives the 100× scale-up the in-RAM probe cannot.
  */
object Materialise {

  /** Candidate (from, key, value, valueDatasources, qualifiers, subgraph,
    * fromSourceIds) assertions — every prop value is a potential edge.
    *
    * Column-native since round 16 (was a typed flatMap): two `explode`s
    * over the props map plus the codegen'd [[graft.functions.QualifiersJson]]
    * rendering — byte-identical output (QualifiersJsonSpec pins the JSON
    * bytes; the g5/g7/g14 edgeId hashes pin it end-to-end), but the scan
    * stays columnar: over a cached/parquet MergedNode source this prunes
    * and never deserializes whole records, where the flatMap paid a
    * DeserializeToObject of every row (ids array + props map) per pass. */
  private def assertions(nodes: Dataset[MergedNode]): DataFrame =
    nodes.toDF()
      .select(col("nodeId").as("fromNodeId"), col("subgraph"),
        col("sourceIds").as("fromSourceIds"),
        explode(col("props")).as(Seq("edgeType", "vs")))
      .select(col("fromNodeId"), col("subgraph"), col("fromSourceIds"),
        col("edgeType"), explode(col("vs")).as("v"))
      .select(col("fromNodeId"), col("subgraph"), col("fromSourceIds"),
        col("edgeType"), col("v.value").as("toNodeId"),
        col("v.datasources").as("datasources"),
        graft.functions.QualifiersJson(col("v.qualifiers")).as("qualifiersJson"))

  /** J3 — emit an edge for every property value that equals another
    * node's id (semi-join against the node-id dimension,
    * `grebi_materialise/src/main.rs:265-331`). Self-referential edges are
    * excluded as in the reference (`:90-111` `exclude_self_referential`).
    * edgeId is a content hash (sha256 here vs the reference's sha1,
    * `:424-432`) — deterministic across runs and shuffles. */
  def edges(nodes: Dataset[MergedNode], metadata: DataFrame,
            excludeProps: Set[String] = Set("grebi:type", "grebi:name"),
            excludeSelfReferential: Boolean = true,
            saltBuckets: Int = 0,
            /** Some(props) = the reference's per-property list
              * (`exclude_self_referential_edges` config key,
              * `main.rs:104-111`): self-edges drop only for these edge
              * types. None = the blanket boolean behaviour. */
            selfReferentialProps: Option[Set[String]] = None): DataFrame = {
    // `metadata` is consumed ONLY for its nodeId column (the node-id
    // dimension the candidates semi-join against) — callers that don't
    // otherwise need the metadata table should pass a pruned projection
    // of the node set (`nodes.toDF().select("nodeId")`) so the edge pass
    // never forces the name/types computation (round 16, guide §2.3:
    // project before the exchange).
    val nodeIds = metadata.select(col("nodeId").as("toNodeId"))
    var cand = assertions(nodes)
      .where(!col("edgeType").isin(excludeProps.toSeq: _*))
    selfReferentialProps match {
      case Some(props) =>
        cand = cand.where(!(col("fromNodeId") === col("toNodeId") &&
          col("edgeType").isin(props.toSeq: _*)))
      case None if excludeSelfReferential =>
        cand = cand.where(col("fromNodeId") =!= col("toNodeId"))
      case None =>
    }
    // saltBuckets > 0: deterministic replicated join (core.Skew) so a hub
    // target id (a species/type node referenced from a large share of all
    // rows) spreads over `saltBuckets` tasks instead of one straggler —
    // the plan-level guarantee for when AQE's runtime skew split can't
    // kick in (SURVEY §7.4.4)
    val joined =
      if (saltBuckets > 0)
        graft.core.Skew.saltedJoin(cand, nodeIds, "toNodeId",
          col("fromNodeId"), saltBuckets)
      else cand.join(nodeIds, "toNodeId")
    joined
      .withColumn("edgeId",
        sha2(concat_ws("\u001f", col("subgraph"), col("fromNodeId"),
          col("edgeType"), col("toNodeId"), col("qualifiersJson")), 256))
      .select(col("edgeId"), col("edgeType"), col("fromNodeId"), col("toNodeId"),
        col("datasources"), col("subgraph"), col("fromSourceIds"), col("qualifiersJson"))
  }

  /** A6 — displayType = the globally rarest of a node's types
    * (`grebi_materialise/src/main.rs:118-124,164-188,213-217`): broadcast
    * the type-count table, argmin via min(struct(count, type)). */
  def displayTypes(nodes: Dataset[MergedNode], typeCounts: DataFrame): DataFrame = {
    val s = nodes.sparkSession
    import s.implicits._
    val nodeTypes = nodes.flatMap(n =>
        n.props.getOrElse("grebi:type", Nil).map(_.value).distinct.map((n.nodeId, _)))
      .toDF("nodeId", "type")
    nodeTypes.join(broadcast(typeCounts), "type")
      .groupBy("nodeId")
      .agg(min(struct(col("count"), col("type"))).getField("type").as("displayType"))
  }

  /** J4 — `_refs`: for each node, a map from every referenced node id to
    * its metadata (name + types), built by explode → join metadata →
    * regroup (`grebi_materialise/src/main.rs:197-210`). Deliberately NOT
    * filtered by the edge exclude list: the reference scans every string
    * in the record (`find_strings(&line)`), so type values that are real
    * node ids DO ref-enrich even though they never become edges. Popular
    * targets (species/type hub nodes) skew the join; AQE skew-join
    * handles the regroup side since the group key is the *from* node.
    * `saltBuckets > 0` adds the deterministic plan-level mitigation for
    * the metadata probe itself (replicated join via core.Skew), spreading
    * each hub id over that many tasks. */
  def refs(nodes: Dataset[MergedNode], metadata: DataFrame,
           saltBuckets: Int = 0): DataFrame = {
    val cand = assertions(nodes)
      .select(col("fromNodeId"), col("toNodeId").as("ref"))
      .distinct()
    val dim = metadata.withColumnRenamed("nodeId", "ref")
    val joined =
      if (saltBuckets > 0)
        graft.core.Skew.saltedJoin(cand, dim, "ref", col("fromNodeId"), saltBuckets)
      else cand.join(dim, "ref")
    joined
      .groupBy("fromNodeId")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("ref"), struct(col("name"), col("types")))))).as("refs"))
  }

  /** A4 — edge summary cube: count edges by (srcTypeSignature, edgeType,
    * dstTypeSignature, datasourcesSignature); a type signature is the
    * sorted comma-joined type list (`grebi_materialise/src/main.rs:70-82,
    * 409-422,443-452`). */
  def edgeSummary(edges: DataFrame, metadata: DataFrame): DataFrame = {
    val sig = (c: String) => array_join(col(c), ",")
    val meta = metadata.select(col("nodeId"), array_join(col("types"), ",").as("typeSig"))
    edges
      .join(meta.withColumnRenamed("nodeId", "fromNodeId")
        .withColumnRenamed("typeSig", "srcTypeSig"), "fromNodeId")
      .join(meta.withColumnRenamed("nodeId", "toNodeId")
        .withColumnRenamed("typeSig", "dstTypeSig"), "toNodeId")
      .groupBy(col("srcTypeSig"), col("edgeType"), col("dstTypeSig"),
        array_join(col("datasources"), ",").as("datasourceSig"))
      .count()
  }
}

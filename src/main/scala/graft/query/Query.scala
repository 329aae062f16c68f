package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Query-time operator surface (SURVEY §2.11 Q1–Q10) as a DataFrame
  * library: the serving capabilities the reference delegates to Solr and
  * Neo4j, re-expressed in-engine.
  */
object Query {

  // -------------------------------------------------------------------
  // Q1 — boosted multi-field search
  // -------------------------------------------------------------------

  /** edismax-style weighted scoring (`GrebiSolrQuery.java:59-108`:
    * id^1000, name^900, synonym^800 … `_text_`^1). For each (column,
    * weight): exact match scores the full weight, case-insensitive token
    * containment scores half — the reference's WHOLE_FIELD vs
    * CASE_INSENSITIVE_TOKENS split (`GrebiSolrQuery.java:195-215`).
    * Pure codegen'd expressions; no UDF in the scan. */
  def searchScore(fields: Map[String, Double], term: String): Column = {
    val lowerTerm = term.toLowerCase
    fields.map { case (f, w) =>
      when(col(f) === term, lit(w))
        .when(lower(col(f)).contains(lowerTerm), lit(w / 2))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
  }

  /** Search a node table: filter score > 0, order by (score desc, id),
    * paginate. `GrebiApi.java:185-227` flow, minus the HTTP. */
  def search(nodes: DataFrame, fields: Map[String, Double], term: String,
             idCol: String, page: Int = 0, size: Int = 10): DataFrame =
    nodes.withColumn("score", searchScore(fields, term))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col(idCol).asc)
      .offset(page * size).limit(size)

  // -------------------------------------------------------------------
  // Q2/Q3 — filters + facet counts with facet-exclusion
  // -------------------------------------------------------------------

  /** Facet counts over a filtered set where each facet field's own filter
    * is excluded from its counts — Solr's `{!ex=grebifacet}` semantics
    * (`GrebiSolrQuery.java:114-116,140-145`). Returns
    * (facetField, facetValue, count). */
  def facets(df: DataFrame, filters: Map[String, Seq[String]],
             facetFields: Seq[String]): DataFrame = {
    def applyFilters(base: DataFrame, except: String): DataFrame =
      filters.filter(_._1 != except).foldLeft(base) { case (d, (f, vs)) =>
        d.where(col(f).isin(vs: _*))
      }
    facetFields.map { ff =>
      applyFilters(df, ff)
        .groupBy(col(ff).cast("string").as("facet_value"))
        .count()
        .select(lit(ff).as("facet_field"), col("facet_value"), col("count"))
    }.reduce(_ unionByName _)
  }

  /** The full REST-search flow composed (Q1+Q2+Q3+Q4 —
    * `GrebiApi.java:185-227`): apply property filters, score the query
    * term, page the hits, and compute facet counts (with facet-exclusion)
    * over the same filtered+matched set. The scored scan runs ONCE: the
    * count action fills a persist, hits and every facet read the cache,
    * and the small results are materialized (localCheckpoint) so the cache
    * can be dropped before returning. */
  def searchPage(nodes: DataFrame, fields: Map[String, Double], term: String,
                 filters: Map[String, Seq[String]], facetFields: Seq[String],
                 idCol: String, page: Int = 0, size: Int = 10): (DataFrame, DataFrame, Long) = {
    val matched = nodes.withColumn("score", searchScore(fields, term))
      .where(col("score") > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val matchedFiltered = filters.foldLeft(matched) { case (d, (f, vs)) => d.where(col(f).isin(vs: _*)) }
      val total = matchedFiltered.count()
      val hits = matchedFiltered
        .orderBy(col("score").desc, col(idCol).asc)
        .offset(page * size).limit(size)
        .localCheckpoint()
      val facetCounts = facets(matched, filters, facetFields).localCheckpoint()
      (hits, facetCounts, total)
    } finally {
      matched.unpersist(false)
      ()
    }
  }

  // -------------------------------------------------------------------
  // Q6 — incoming / outgoing edge listing
  // -------------------------------------------------------------------

  /** Edges of one node, hydrated with the other endpoint's metadata
    * (`GrebiApi.java:81-176`); paginated. The endpoint's metadata comes
    * back as other_name/other_types to avoid colliding with the edge's
    * own provenance columns. */
  private def endpointMeta(metadata: DataFrame, as: String): DataFrame =
    metadata.select(col("nodeId").as(as),
      col("name").as("other_name"), col("types").as("other_types"))

  /** Edge-property membership filter — the reference's
    * `"v" IN edge.prop` clause (`Neo4jClient.java:194-204`): every
    * required (prop → value) must be a member of the edge's multi-valued
    * qualifier; edges lacking the prop are dropped (Cypher IN on a missing
    * property is null). Qualifiers live in the `qualifiersJson` column. */
  private def edgePropsFilter(edges: DataFrame, edgeProps: Map[String, String]): DataFrame =
    if (edgeProps.isEmpty) edges
    else {
      val quals = from_json(col("qualifiersJson"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,array<string>>"))
      edgeProps.foldLeft(edges) { case (d, (k, v)) =>
        d.where(array_contains(quals.getItem(k), v))
      }
    }

  def outgoingEdges(edges: DataFrame, metadata: DataFrame, nodeId: String,
                    page: Int = 0, size: Int = 100,
                    edgeProps: Map[String, String] = Map.empty): DataFrame =
    edgePropsFilter(edges.where(col("fromNodeId") === nodeId), edgeProps)
      .join(endpointMeta(metadata, "toNodeId"), "toNodeId")
      .orderBy(col("edgeId"))
      .offset(page * size).limit(size)

  def incomingEdges(edges: DataFrame, metadata: DataFrame, nodeId: String,
                    page: Int = 0, size: Int = 100,
                    edgeProps: Map[String, String] = Map.empty): DataFrame =
    edgePropsFilter(edges.where(col("toNodeId") === nodeId), edgeProps)
      .join(endpointMeta(metadata, "fromNodeId"), "fromNodeId")
      .orderBy(col("edgeId"))
      .offset(page * size).limit(size)

  // -------------------------------------------------------------------
  // Q7 — typed traversal, 1-hop and bounded recursive
  // -------------------------------------------------------------------

  /** Bounded-depth BFS from a seed set along typed edges — the engine-side
    * form of Cypher `-[:T1|T2*1..n]->` (`Neo4jClient.java:244-280`,
    * type alternation via `makeEdgesList`). Returns (nodeId, depth) of
    * reachable nodes, depth = first reach. Each round is one join +
    * anti-join against the visited set; lineage truncated per round so the
    * plan stays flat at depth n. `edgeProps` adds the reference's
    * `"v" IN edge.prop` membership clause to every traversed edge.
    */
  def reachable(edges: DataFrame, seeds: DataFrame, edgeTypes: Seq[String],
                maxDepth: Int, direction: String = "out",
                edgeProps: Map[String, String] = Map.empty): DataFrame = {
    val byType = if (edgeTypes.isEmpty) edges else edges.where(col("edgeType").isin(edgeTypes: _*))
    val e0 = edgePropsFilter(byType, edgeProps)
    val (srcCol, dstCol) = direction match {
      case "out" => ("fromNodeId", "toNodeId")
      case _     => ("toNodeId", "fromNodeId")
    }
    val step = e0.select(col(srcCol).as("from"), col(dstCol).as("to"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = seeds.select(col("nodeId"), lit(0).as("depth")).localCheckpoint()
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = saveRound(frontier.join(step, frontier("nodeId") === step("from"))
        .select(col("to").as("nodeId")).distinct()
        .join(visited.select("nodeId"), Seq("nodeId"), "left_anti")
        .withColumn("depth", lit(depth)), depth, 0)
      visited = saveRound(visited.union(next), depth, 0)
      frontier = next
    }
    step.unpersist()
    visited
  }

  /** One hop of a Cypher-style MATCH chain ([[matchChain]]): follow edges
    * whose type is in `edgeTypes` (empty = any; >1 = the notebook's
    * `-[:T1|T2|T3]->` alternation) in `direction` ("out" = the pattern's
    * `->`, "in" = `<-`), binding the reached node as column `as`;
    * `nodeType` optionally filters the reached node's label the way
    * Cypher `(x:Label)` does. */
  final case class Hop(edgeTypes: Seq[String], direction: String, as: String,
                       nodeType: Option[String] = None)

  /** Bounded multi-hop MATCH chain with per-hop edge-type alternation and
    * direction — the engine-side form of the gwas notebook's 4-hop
    * pattern (`notebooks/gwas.ipynb`, and `Neo4jClient.java:244-280`'s
    * `makeEdgesList` alternation), keeping EVERY intermediate binding as
    * a column (unlike [[reachable]], which only returns reach + depth).
    * `seeds(seedCol)` is the first binding. Each hop is exactly one
    * equi-join on the previous binding (plus one more against the node
    * metadata when the hop has a label filter) — never a window, never a
    * cartesian — so the chain is as shuffle-deep as it is hops long and
    * every join key is the vertex id. Cypher's relationship-uniqueness
    * (no edge reused within one match) is NOT enforced; with hops drawn
    * from disjoint typed edge sets it is vacuous. */
  def matchChain(edges: DataFrame, nodeTypes: DataFrame, seeds: DataFrame,
                 seedCol: String, hops: Seq[Hop]): DataFrame = {
    var cur = seeds
    var prev = seedCol
    hops.foreach { h =>
      val byType =
        if (h.edgeTypes.isEmpty) edges
        else edges.where(col("edgeType").isin(h.edgeTypes: _*))
      val (src, dst) = h.direction match {
        case "out" => ("fromNodeId", "toNodeId")
        case _     => ("toNodeId", "fromNodeId")
      }
      cur = cur.join(byType.select(col(src).as(prev), col(dst).as(h.as)), prev)
      h.nodeType.foreach { t =>
        cur = cur.join(nodeTypes.where(col("nodeType") === t)
          .select(col("nodeId").as(h.as)), h.as)
      }
      prev = h.as
    }
    cur
  }

  /** Multi-source weighted shortest paths (non-negative integer weights)
    * — distributed Bellman-Ford with a frontier: each round relaxes only
    * edges leaving nodes whose distance improved, so settled regions of
    * the graph stop shuffling (the same semi-naive discipline as
    * ConnectedComponents). Input `edges` needs (fromNodeId, toNodeId,
    * weight); `seeds` one nodeId column, all at distance 0. Converges in
    * O(longest shortest-path hop count) rounds, capped at `maxIter`;
    * per-round lineage truncation keeps the plan O(1). */
  /** Shared iterative-checkpoint policy (see ConnectedComponents.run):
    * `reliableEvery > 0` → every k-th round checkpoints reliably
    * (requires a checkpoint dir) instead of to executor-local blocks.
    * Delegates to [[graft.core.Iterate.save]] so every loop-carried frame
    * gets the checkpoint stats clamp — a bare localCheckpoint inherits
    * its origin plan's size estimate, which compounds multiplicatively
    * across join-loop rounds until the driver stalls in BigInt stats
    * walks (the round-10 k-truss-sweep hang). */
  private def saveRound(df: DataFrame, round: Int, reliableEvery: Int): DataFrame =
    graft.core.Iterate.save(df, reliableEvery, round)

  /** Checkpoint cadence for FIXED-round vector loops with no convergence
    * probe (PageRank family): the per-round localCheckpoint materialised
    * the full rank vector every round, but nothing reads it eagerly — a
    * bounded-round chain is one pipelined plan. Keep a checkpoint every
    * 8th round (lineage/stats-clamp bound for long runs) and on the LAST
    * round (the final vector must be materialised before the loop's
    * persisted inputs are released). `reliableEvery > 0` keeps the
    * original per-round cadence — that is the executor-loss contract.
    * Round 16, guide §1.2: three materialisation jobs → one at the
    * gates' iterations=3. */
  private def saveFixedRound(df: DataFrame, round: Int, total: Int,
      reliableEvery: Int): DataFrame =
    if (reliableEvery > 0 || round % 8 == 0 || round == total)
      saveRound(df, round, reliableEvery)
    else df

  def weightedShortestPaths(edges: DataFrame, seeds: DataFrame,
                            maxIter: Int = 30,
                            reliableEvery: Int = 0): DataFrame = {
    val step = edges.select(col("fromNodeId").as("from"), col("toNodeId").as("to"),
        col("weight").cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = seeds.select(col("nodeId"), lit(0L).as("dist")).localCheckpoint()
    var frontier = dist
    var iter = 0
    while (iter < maxIter && !frontier.isEmpty) {
      iter += 1
      val cand = frontier.join(step, frontier("nodeId") === step("from"))
        .select(col("to").as("nodeId"), (col("dist") + col("w")).as("d2"))
        .groupBy("nodeId").agg(min(col("d2")).as("d2"))
      val improved = saveRound(cand.join(dist, Seq("nodeId"), "left")
        .where(col("dist").isNull || col("d2") < col("dist"))
        .select(col("nodeId"), col("d2").as("dist")), iter, 0) // frontier: small
      dist = saveRound(dist.join(improved, Seq("nodeId"), "left_anti")
        .union(improved), iter, reliableEvery)
      frontier = improved
    }
    step.unpersist()
    dist
  }

  /** PER-SOURCE weighted shortest paths — closeness centrality's core:
    * state is (src, node, dist) for a BOUNDED source set (`sources`:
    * one `src` column), relaxed by the same semi-naive improved-only
    * frontier as [[weightedShortestPaths]]. At 100 TB the dial is the
    * source set, not the graph: state is |sources|·|reached| rows and
    * every round is one equi-join + one min-groupBy on (src, node). */
  def perSourceShortestPaths(edges: DataFrame, sources: DataFrame,
                             maxIter: Int = 30,
                             reliableEvery: Int = 0): DataFrame = {
    val step = edges.select(col("fromNodeId").as("from"), col("toNodeId").as("to"),
        col("weight").cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = sources.select(col("src"), col("src").as("nodeId"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = dist
    var iter = 0
    while (iter < maxIter && !frontier.isEmpty) {
      iter += 1
      val cand = frontier.join(step, frontier("nodeId") === step("from"))
        .select(col("src"), col("to").as("nodeId"), (col("dist") + col("w")).as("d2"))
        .groupBy("src", "nodeId").agg(min(col("d2")).as("d2"))
      val improved = saveRound(cand.join(dist, Seq("src", "nodeId"), "left")
        .where(col("dist").isNull || col("d2") < col("dist"))
        .select(col("src"), col("nodeId"), col("d2").as("dist")), iter, 0)
      dist = saveRound(dist.join(improved, Seq("src", "nodeId"), "left_anti")
        .union(improved), iter, reliableEvery)
      frontier = improved
    }
    step.unpersist()
    dist
  }

  /** [[perSourceShortestPaths]] plus σ — the NUMBER of shortest paths per
    * (src, node): Brandes' forward pass, relationally. After the distance
    * fixpoint, the shortest-path DAG is the edge subset with
    * dist(u) + w = dist(v); σ propagates from σ(src,src)=1 by Jacobi
    * rounds over that DAG (σ' = seed + Σ over DAG-predecessors), which
    * converge in DAG-depth rounds because σ grows monotonically. Every
    * round is one equi-join + one groupBy on the bounded |sources|·
    * |reached| state — the 100 TB dial stays the source-set size. */
  def perSourceShortestPathCounts(edges: DataFrame, sources: DataFrame,
                                  maxIter: Int = 30): DataFrame = {
    val step = edges.select(col("fromNodeId").as("from"),
        col("toNodeId").as("to"), col("weight").cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dist = perSourceShortestPaths(edges, sources, maxIter).localCheckpoint()
    val dag = dist.select(col("src"), col("nodeId").as("from"), col("dist").as("du"))
      .join(step, "from")
      .join(dist.select(col("src"), col("nodeId").as("to"), col("dist").as("dv")),
        Seq("src", "to"))
      .where(col("du") + col("w") === col("dv"))
      .select(col("src"), col("from"), col("to"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seed = sources.select(col("src"), col("src").as("nodeId"), lit(1L).as("sigma"))
    var sigma = seed.localCheckpoint()
    var done = false
    var iter = 0
    while (iter < maxIter && !done) {
      iter += 1
      val contrib = sigma.withColumnRenamed("nodeId", "from")
        .join(dag, Seq("src", "from"))
        .select(col("src"), col("to").as("nodeId"), col("sigma"))
      val next = saveRound(seed.union(contrib).groupBy("src", "nodeId")
        .agg(sum(col("sigma")).as("sigma")), iter, 0)
      // σ only grows row- and value-wise, so one-sided compare suffices
      done = next.join(sigma, Seq("src", "nodeId", "sigma"), "left_anti").isEmpty
      sigma = next
    }
    val out = dist.join(sigma, Seq("src", "nodeId"), "left")
      .select(col("src"), col("nodeId"), col("dist"),
        coalesce(col("sigma"), lit(0L)).as("sigma"))
      .localCheckpoint()
    dag.unpersist()
    step.unpersist()
    out
  }

  /** Transitive closure of an edge set (bounded depth): all (ancestor,
    * descendant) pairs, by iterative path extension with distinct-dedup —
    * the engine-side form of Cypher `(a)<-[*1..]-(d)` used by the
    * reference's information-content analysis (`notebooks/ic_scores.ipynb`,
    * `MATCH (a)<-[:broad_match*1..]-(s) WITH a, count(DISTINCT s)`).
    * Each round extends frontier paths by one hop and drops known pairs;
    * lineage checkpointed per round. */
  def transitiveClosure(edges: DataFrame, maxDepth: Int = 20,
                        reliableEvery: Int = 0): DataFrame = {
    val step = edges.select(col("fromNodeId").as("desc"), col("toNodeId").as("anc"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var closure = step.localCheckpoint()
    var frontier = closure
    var depth = 1
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val extended = frontier.join(step.withColumnRenamed("desc", "mid")
            .withColumnRenamed("anc", "anc2"),
          frontier("anc") === col("mid"))
        .select(col("desc"), col("anc2").as("anc"))
        .distinct()
      val novel = saveRound(
        extended.join(closure, Seq("desc", "anc"), "left_anti"), depth, 0)
      closure = saveRound(closure.union(novel), depth, reliableEvery)
      frontier = novel
    }
    step.unpersist()
    closure
  }

  /** Descendant counts + information-content score per ancestor
    * (ic = 1 − |desc| / max|desc|, the notebooks' scoring). */
  def icScores(edges: DataFrame, maxDepth: Int = 20): DataFrame = {
    val counts = transitiveClosure(edges, maxDepth)
      .groupBy(col("anc").as("nodeId"))
      .agg(count(lit(1)).as("n_descendants"))
    // max() over zero rows is null — an edge-free input yields an empty
    // result, not an unboxing NPE
    val mx = Option(counts.agg(max(col("n_descendants"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(1L)
    counts.withColumn("ic",
      lit(1.0) - col("n_descendants").cast("double") / lit(mx.toDouble))
  }

  /** 2-hop neighborhood count cube around one root node — the reference's
    * exploratory aggregation (`notebooks/util_aggr_counts.py:7-30`): count
    * the 2-hop paths root—ra—n1—rb—n2 grouped by (direction ∈ {in_in,
    * in_out, out_in, out_out}, edge1, n1's display type, edge2, n2's
    * display type), with the Cypher query's constraints — all three nodes
    * pairwise distinct and `id`-typed edges excluded — plus its rendered
    * `path` pattern string. Instead of the notebook's four UNIONed MATCH
    * clauses, ONE plan: orient every edge both ways with a direction tag
    * (`in` = edge points at src), then the four direction combinations
    * fall out of a single pair of equi-joins. Scale shape: hop 1 is a
    * point filter on the root id (partition-prunable on an id-bucketed
    * edge table), so the frontier is one node's incident edges —
    * broadcast it into the hop-2 join and the whole cube costs one scan
    * of the edge table with no shuffle of the big side. `types` is
    * (nodeId, displayType); joined after the path count's group-by keys
    * are fixed, so the big join carries ids only. */
  def aggrCounts(edges: DataFrame, types: DataFrame, rootId: String): DataFrame = {
    val inc = incidentOriented(edges)
    typedCube(twoHopPaths(inc, inc, rootId), types)
  }

  /** Every edge oriented both ways with a direction tag (`in` = the edge
    * points AT src), `id`-typed edges excluded — the single relation the
    * four MATCH directions fall out of. Factored so the streaming IVM
    * (st29) can build old/new incidence sets from the same definition. */
  private[graft] def incidentOriented(edges: DataFrame): DataFrame = {
    val e = edges.where(col("edgeType") =!= "id")
    e.select(col("fromNodeId").as("src"), col("toNodeId").as("dst"),
        col("edgeType"), lit("out").as("dir"))
      .union(e.select(col("toNodeId"), col("fromNodeId"), col("edgeType"), lit("in")))
  }

  /** The 2-hop paths around `rootId` with hop 1 drawn from `hop1Inc` and
    * hop 2 from `hop2Inc` — split so the IVM's delta (paths using at
    * least one NEW edge) is the disjoint union new⋈old ∪ old⋈new ∪
    * new⋈new over the same code path the batch cube uses. */
  private[graft] def twoHopPaths(hop1Inc: DataFrame, hop2Inc: DataFrame,
                                 rootId: String): DataFrame = {
    val hop1 = hop1Inc.where(col("src") === lit(rootId) && col("dst") =!= lit(rootId))
      .select(col("dst").as("n1"), col("edgeType").as("edge1"), col("dir").as("dir1"))
    broadcast(hop1).join(hop2Inc, col("n1") === col("src"))
      .where(col("dst") =!= lit(rootId) && col("dst") =!= col("n1"))
      .select(concat(col("dir1"), lit("_"), col("dir")).as("direction"),
        col("edge1"), col("n1"),
        col("edgeType").as("edge2"), col("dst").as("n2"))
  }

  /** Group raw paths into the typed count cube with the rendered path
    * pattern. */
  private[graft] def typedCube(paths: DataFrame, types: DataFrame): DataFrame = {
    val t1 = types.select(col("nodeId").as("n1"), col("displayType").as("type1"))
    val t2 = types.select(col("nodeId").as("n2"), col("displayType").as("type2"))
    val arrow = (edge: Column, ty: Column, fwd: Column) =>
      when(fwd, concat(lit("-["), edge, lit("]->("), ty, lit(")")))
        .otherwise(concat(lit("<-["), edge, lit("]-("), ty, lit(")")))
    paths.join(t1, "n1").join(t2, "n2")
      .groupBy(col("direction"), col("edge1"), col("type1"), col("edge2"), col("type2"))
      .agg(count(lit(1)).as("num"))
      .withColumn("path", concat(lit("(R)"),
        arrow(col("edge1"), col("type1"), col("direction").startsWith("out")),
        arrow(col("edge2"), col("type2"), col("direction").endsWith("out"))))
  }

  /** PageRank over a directed edge list — fixed iteration count, integer
    * fixed-point arithmetic (damping 0.85 as `(85·Σ) div 100`, scores
    * scaled by `scale`), so parallel summation order can't move the
    * result: sums of longs are exact and `div` truncates identically on
    * every engine. Dangling nodes keep the teleport term only (their
    * mass is dropped, the common web-graph simplification).
    *
    * Scale shape: per iteration one shuffle join of the static
    * (edge ⋈ outdegree) frame against the current rank vector and one
    * groupBy on the target — the textbook distributed PageRank. The rank
    * vector is localCheckpoint'd per round so plan size stays O(1) in
    * `iterations`; the edge frame is computed once and persisted. */
  def pageRank(edges: DataFrame, iterations: Int = 3,
               scale: Long = 1000000L,
               reliableEvery: Int = 0): DataFrame = {
    val e = edges.select(col("fromNodeId").as("src"), col("toNodeId").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val step = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var pr = nodes.select(col("id"), lit(scale).as("pr"))
    var i = 0
    while (i < iterations) {
      val in = step.join(pr.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("pr div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("insum"))
      pr = saveFixedRound(nodes.join(in, Seq("id"), "left")
        .select(col("id"),
          (lit(scale * 15L / 100L) +
            expr("(85 * coalesce(insum, CAST(0 AS BIGINT))) div 100")).as("pr")),
        i + 1, iterations, reliableEvery)
      i += 1
    }
    step.unpersist()
    nodes.unpersist()
    pr
  }

  /** PERSONALIZED PageRank: [[pageRank]] with the teleport vector
    * concentrated on `seeds` (mass `scale div |S|` per seed) instead of
    * spread uniformly — rank then measures proximity TO the seed set,
    * the relevance measure knowledge-graph ranking actually uses
    * ("what matters near these entities"). Same integer fixed-point
    * discipline and per-iteration shape as the global variant: one join
    * of the persisted (edge ⋈ outdegree) frame against the rank vector
    * + one groupBy on the target; the teleport frame is computed once
    * and persisted. Nodes unreachable from the seeds stay at exactly 0. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iterations: Int = 3, scale: Long = 1000000L,
      reliableEvery: Int = 0): DataFrame = {
    val e = edges.select(col("fromNodeId").as("src"), col("toNodeId").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val step = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val seedIds = seeds.select(col("nodeId").as("id")).distinct()
    val tele = nodes.join(seedIds, Seq("id"), "left_semi")
      .crossJoin(broadcast(seedIds.agg(count(lit(1)).as("ns"))))
      .select(col("id"), expr(s"$scale div ns").as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var pr = nodes.join(tele, Seq("id"), "left")
      .select(col("id"), coalesce(col("t"), lit(0L)).as("pr"))
    var i = 0
    while (i < iterations) {
      val in = step.join(pr.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("pr div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("insum"))
      pr = saveFixedRound(nodes.join(in, Seq("id"), "left").join(tele, Seq("id"), "left")
        .select(col("id"),
          (expr("(15 * coalesce(t, CAST(0 AS BIGINT))) div 100") +
            expr("(85 * coalesce(insum, CAST(0 AS BIGINT))) div 100")).as("pr")),
        i + 1, iterations, reliableEvery)
      i += 1
    }
    step.unpersist()
    nodes.unpersist()
    tele.unpersist()
    pr
  }

  /** WEIGHTED personalized PageRank: [[personalizedPageRank]] where each
    * edge carries a positive integer `weight` and a node's rank flows
    * out proportionally — contribution = (pr · w) div Σw(out) — the
    * form a weighted knowledge graph (evidence counts, co-occurrence
    * strengths) actually ranks with. Exact integer fixed-point: pr ≤
    * scale·|V| and weights are longs, so the per-edge product stays far
    * inside Long range; both engines truncate identically. Same
    * one-join-one-groupBy iteration as the unweighted variants. */
  def personalizedPageRankWeighted(edges: DataFrame, seeds: DataFrame,
      iterations: Int = 3, scale: Long = 1000000L,
      reliableEvery: Int = 0): DataFrame = {
    val e = edges.select(col("fromNodeId").as("src"), col("toNodeId").as("dst"),
      col("weight").cast("long").as("w"))
    val wsum = e.groupBy("src").agg(sum(col("w")).as("wsum"))
    val step = e.join(wsum, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val seedIds = seeds.select(col("nodeId").as("id")).distinct()
    val tele = nodes.join(seedIds, Seq("id"), "left_semi")
      .crossJoin(broadcast(seedIds.agg(count(lit(1)).as("ns"))))
      .select(col("id"), expr(s"$scale div ns").as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var pr = nodes.join(tele, Seq("id"), "left")
      .select(col("id"), coalesce(col("t"), lit(0L)).as("pr"))
    var i = 0
    while (i < iterations) {
      val in = step.join(pr.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("(pr * w) div wsum").as("c"))
        .groupBy("id").agg(sum(col("c")).as("insum"))
      pr = saveFixedRound(nodes.join(in, Seq("id"), "left").join(tele, Seq("id"), "left")
        .select(col("id"),
          (expr("(15 * coalesce(t, CAST(0 AS BIGINT))) div 100") +
            expr("(85 * coalesce(insum, CAST(0 AS BIGINT))) div 100")).as("pr")),
        i + 1, iterations, reliableEvery)
      i += 1
    }
    step.unpersist()
    nodes.unpersist()
    tele.unpersist()
    pr
  }

  /** Triangle count over an undirected edge set (`(u, v)` pairs, u < v,
    * self-loop-free) via DEGREE-ORDERED orientation — each edge points
    * from its lower-(degree, id) endpoint to the higher, so every
    * vertex's out-degree is O(√m) even under power-law skew (the
    * hub-node explosion that kills the naive wedge join at web scale:
    * wedge count is Σ outdeg², and orientation moves hubs to the
    * receiving side). One wedge self-join on the spoke vertex + one
    * membership join closes each triangle exactly once. */
  def triangleCount(undirected: DataFrame): DataFrame = {
    val pairs = undirected.select(col("u"), col("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = pairs.select(col("u").as("id")).union(pairs.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val o = pairs
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = o.as("x").join(o.as("y"),
        col("x.s") === col("y.s") && col("x.t") =!= col("y.t"))
      .select(col("x.t").as("a"), col("y.t").as("b"))
    val tri = wedges.join(o, wedges("a") === o("s") && wedges("b") === o("t"))
    val res = pairs.agg(count(lit(1)).as("n_edges"))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
    res
  }

  /** LOCAL CLUSTERING COEFFICIENT per node — triangles(v) divided by the
    * wedge capacity deg(v)·(deg(v)−1)/2, in exact parts-per-million
    * fixed point so both engines truncate identically. Reuses the g19
    * once-oriented triangle discipline (degree-ordered orientation, each
    * triangle materialised exactly once from its lowest-degree vertex)
    * and then attributes the one row to all three corners with a 3-wide
    * explode — per-node counting costs the SAME wedge work as the global
    * count plus one |triangles|·3 shuffle, not a per-vertex neighborhood
    * intersection. Nodes with deg < 2 emit 0 (no wedge capacity). */
  def localClustering(undirected: DataFrame): DataFrame = {
    val pairs = undirected.select(col("u"), col("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = pairs.select(col("u").as("id")).union(pairs.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val o = pairs
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tri = o.as("x").join(o.as("y"),
        col("x.s") === col("y.s") && col("x.t") =!= col("y.t"))
      .select(col("x.s").as("w"), col("x.t").as("a"), col("y.t").as("b"))
      .join(o.as("z"), col("a") === col("z.s") && col("b") === col("z.t"))
    val perNode = tri.select(explode(array(col("w"), col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("lcc_ppm",
        when(col("deg") >= 2,
          expr("(2 * n_tri * 1000000) div (deg * (deg - 1))")).otherwise(lit(0L)))
  }

  /** Per-EDGE triangle support (embeddedness, Granovetter's weak-tie
    * measure): for every canonical (u < v) edge, how many triangles
    * contain it = |N(u) ∩ N(v)|. Same once-oriented degree-ordered
    * triangle plan as [[localClustering]] (each triangle enumerated
    * exactly once, wedge work bounded by the orientation), then a
    * 3-edge attribution explode — the edge-level companion to g37's
    * 3-corner one. Support-0 edges are LOCAL BRIDGES: the only path
    * between their endpoints' neighborhoods, the tie community
    * detection must not cut. */
  def edgeSupport(undirected: DataFrame): DataFrame = {
    val pairs = undirected.select(col("u"), col("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = pairs.select(col("u").as("id")).union(pairs.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val o = pairs
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tri = o.as("x").join(o.as("y"),
        col("x.s") === col("y.s") && col("x.t") =!= col("y.t"))
      .select(col("x.s").as("w"), col("x.t").as("a"), col("y.t").as("b"))
      .join(o.as("z"), col("a") === col("z.s") && col("b") === col("z.t"))
    val sup = tri.select(explode(array(
        struct(least(col("w"), col("a")).as("u"), greatest(col("w"), col("a")).as("v")),
        struct(least(col("w"), col("b")).as("u"), greatest(col("w"), col("b")).as("v")),
        struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
    pairs.join(sup, Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("support"), lit(0L)).as("support"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over an
    * undirected edge set (`(u, v)` pairs, u < v, self-loop-free): every
    * node starts labelled with its own id; each round it adopts the MODE
    * of its neighbours' previous-round labels, ties broken by the
    * smallest label — the deterministic variant (classic LPA breaks ties
    * randomly, which would make the gate unverifiable; min-tie-break is
    * the standard reproducible choice). A FIXED iteration count is part
    * of the contract, not a convergence heuristic: synchronous LPA can
    * oscillate on bipartite structures, so "labels after k rounds" is the
    * well-defined quantity both engines compute.
    *
    * Scale shape: per round one equi-join of the |2E| adjacency (persisted
    * across rounds) against the |V| label frame + one (node, label) count
    * + one per-node argmax window — all hash-partitioned on the node id;
    * state never exceeds |V| rows and the adjacency is shuffled once, so
    * rounds reuse the same partitioning at 100 TB. Lineage is cut per
    * round ([[saveRound]]) exactly like [[pageRank]]. */
  def labelPropagation(undirected: DataFrame, iterations: Int = 3,
                       reliableEvery: Int = 0): DataFrame = {
    val pairs = undirected.select(col("u"), col("v")).distinct()
    val adj = pairs.select(col("u").as("node"), col("v").as("nbr"))
      .union(pairs.select(col("v").as("node"), col("u").as("nbr")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lab = adj.select(col("node").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    val w = Window.partitionBy(col("node"))
      .orderBy(col("cnt").desc, col("label").asc)
    var i = 0
    while (i < iterations) {
      lab = saveRound(
        adj.join(lab.withColumnRenamed("id", "nbr"), "nbr")
          .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("node").as("id"), col("label")),
        i + 1, reliableEvery)
      i += 1
    }
    adj.unpersist()
    lab
  }

  /** Weighted synchronous label propagation: like [[labelPropagation]]
    * but each node adopts the label with the greatest total INCIDENT
    * EDGE WEIGHT (sum, not neighbor count), ties broken by the smallest
    * label — so one heavy relationship outvotes many light ones, the
    * behavior an interaction-count or co-occurrence graph wants.
    * Parallel edges combine by summing up front; integer weights keep
    * the argmax exact and the fixed round count keeps it well-defined
    * (the g23 contract). Uniform weights reduce to the unweighted walk
    * exactly. */
  def labelPropagationWeighted(weighted: DataFrame, iterations: Int = 3,
      reliableEvery: Int = 0): DataFrame = {
    val pairs = weighted.select(col("u"), col("v"), col("weight"))
      .groupBy(col("u"), col("v")).agg(sum(col("weight")).as("weight"))
    val adj = pairs.select(col("u").as("node"), col("v").as("nbr"), col("weight"))
      .union(pairs.select(col("v").as("node"), col("u").as("nbr"), col("weight")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lab = adj.select(col("node").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    val w = Window.partitionBy(col("node"))
      .orderBy(col("wsum").desc, col("label").asc)
    var i = 0
    while (i < iterations) {
      lab = saveRound(
        adj.join(lab.withColumnRenamed("id", "nbr"), "nbr")
          .groupBy(col("node"), col("label")).agg(sum(col("weight")).as("wsum"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("node").as("id"), col("label")),
        i + 1, reliableEvery)
      i += 1
    }
    adj.unpersist()
    lab
  }

  // -------------------------------------------------------------------
  // Q8 — autocomplete
  // -------------------------------------------------------------------

  /** Three-tier autocomplete ranking over the distinct-names table:
    * exact match^10, whole-string prefix^2, any-word prefix^1 — the
    * reference's label / edge-ngram / whitespace-edge-ngram boosts
    * (`GrebiSolrClient.java:147-179`, autocomplete schema
    * `EdgeNGramFilterFactory` 1..35). */
  def autocomplete(names: DataFrame, q: String, size: Int = 10): DataFrame = {
    val lq = q.toLowerCase
    val nameL = lower(col("name"))
    val score = when(nameL === lq, 10.0)
      .when(nameL.startsWith(lq), 2.0)
      .when(exists(split(nameL, "\\s+"), w => w.startsWith(lq)), 1.0)
      .otherwise(0.0)
    names.withColumn("score", score)
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("name").asc)
      .limit(size)
  }

  // -------------------------------------------------------------------
  // Q9 — stats
  // -------------------------------------------------------------------

  /** Graph-wide node/edge counts (`cypher/stats.cypher:1-4`). */
  def stats(nodes: DataFrame, edges: DataFrame): (Long, Long) =
    (nodes.count(), edges.count())
}

package graft.identity

import graft.curie.Ids
import graft.model.{IngestNode, RawValue}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

/** A node after id assignment: keyed by its clique's canonical id, ready
  * for the merge group-by (`02_assign_ids/grebi_assign_ids/src/main.rs:92-138`). */
final case class AssignedNode(
    nodeId: String,
    datasource: String,
    sourceIds: Seq[String],
    subgraph: String,
    props: Map[String, Seq[RawValue]])

/** J1 — map-side hash join of every id, every string value, and every
  * property KEY against the groups table; matches are rewritten to the
  * clique's canonical id (SURVEY §2.3 J1; key rewrite: reference
  * `grebi_assign_ids/src/main.rs:121-129`).
  *
  * Two physical paths, same result (cross-checked in PipelineDriverSpec):
  * `joinBased` (the pipeline default) never moves the groups table off the
  * cluster — candidate strings shuffle-join against it, so group-table
  * size is unbounded. `apply` broadcasts a driver-collected map (the
  * reference loads groups.txt into the RAM of every task — same plan,
  * minus the per-task copy) and is the small-data opt-in: one less
  * shuffle when the cliques for ~40 datasources fit in a few GB.
  */
object AssignIds {

  def apply(spark: SparkSession, nodes: Dataset[IngestNode],
            groups: Map[String, String]): Dataset[AssignedNode] = {
    val bc: Broadcast[Map[String, String]] = spark.sparkContext.broadcast(groups)
    import spark.implicits._
    nodes.mapPartitions { it =>
      val g = bc.value
      it.flatMap { n => assignOne(n, g) }
    }
  }

  /** Scale path — no broadcast: when the groups table exceeds executor
    * memory, candidate strings (ids, prop keys, values) are exploded and
    * shuffle-joined against the groups DataFrame, the per-record hit map
    * is regrouped, and the same rewrite runs with that per-record map.
    * Two shuffles (on the candidate string, then on the record uid);
    * group-table size is unbounded.
    *
    * `bloomFpp`: optionally pre-filter candidates through a Bloom filter
    * built over the group members. At 100 TB the exploded value column
    * dwarfs the group table and almost none of it matches — the filter
    * drops non-members BEFORE the candidate shuffle, shrinking it by
    * roughly the non-member fraction. False positives only cost join
    * work (they find no match), never correctness.
    *
    * `expectedGroupCount` sizes that filter without a counting job: pass
    * a caller estimate, or leave None to use Catalyst's plan statistics
    * (row-count estimate when available, else size-based). An over- or
    * under-estimate only moves the effective false-positive rate. */
  def joinBased(spark: SparkSession, nodes: Dataset[IngestNode],
                groups: org.apache.spark.sql.DataFrame,
                bloomFpp: Option[Double] = None,
                expectedGroupCount: Option[Long] = None): Dataset[AssignedNode] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // uid only needs uniqueness, not density — monotonically_increasing_id
    // keeps the plan inside Catalyst (codegen + AQE stats) where the RDD
    // zipWithUniqueId round-trip severed it. The uid assignment is
    // consumed by TWO plan subtrees (candidates and the final regroup
    // join); a lazy localCheckpoint materialises it exactly once so both
    // sides are guaranteed the SAME uid→record mapping even if upstream
    // partitioning re-evaluates nondeterministically (AQE re-coalesce,
    // stage retry over an unordered shuffle).
    val withUid = nodes.toDF()
      .select(monotonically_increasing_id().as("uid"), struct(col("*")).as("node"))
      .as[(Long, IngestNode)]
      .localCheckpoint(false)
    // Column-native candidate extraction (round 16; was a typed flatMap
    // deserializing every checkpointed record): ids ++ prop keys ++ prop
    // values, deduped per record, straight off the node struct inside
    // codegen. Same candidate SET per uid (array_distinct keeps first
    // occurrence like Seq.distinct; order never matters downstream —
    // candidates go into a join + groupBy).
    // each concat leg is null-guarded (r16 ADVICE): concat propagates a
    // single null leg to NULL and explode would then silently drop ALL of
    // a record's candidates — a null props map from an external adapter
    // must degrade to the ids-only candidate set instead
    val emptyArr = array().cast("array<string>")
    val candsAll = withUid.toDF("uid", "node").select(col("uid"),
      explode(array_distinct(concat(
        coalesce(col("node.ids"), emptyArr),
        coalesce(map_keys(col("node.props")), emptyArr),
        coalesce(flatten(transform(map_values(col("node.props")),
          vs => transform(vs, v => v.getField("value")))), emptyArr)))).as("member"))
    val cands = bloomFpp match {
      case Some(fpp) =>
        // no counting job just to size the filter: caller estimate, else
        // the optimizer's row-count stats, else sizeInBytes / ~64 B per
        // (member, canonical) row. Stats are BigInt and default to
        // Long.MaxValue-ish on stat-less leaves (e.g. a localCheckpoint'd
        // LogicalRDD), so clamp in BigInt space BEFORE narrowing — an
        // unclamped .toLong wrap would crash BloomFilter.create or
        // saturate the filter. The 1e9 cap bounds filter memory (~1.2 GB
        // of bits at fpp=0.01); beyond that a caller estimate is required
        // anyway.
        val MaxExpected = BigInt(1000000000L)
        val expected = expectedGroupCount.getOrElse {
          val stats = groups.queryExecution.optimizedPlan.stats
          val est = stats.rowCount.getOrElse(stats.sizeInBytes / 64)
          est.min(MaxExpected).max(BigInt(1)).toLong
        }.max(1L)
        val bf = spark.sparkContext.broadcast(
          groups.stat.bloomFilter("member", expected, fpp))
        candsAll.as[(Long, String)]
          .filter(t => bf.value.mightContain(t._2))
          .toDF("uid", "member")
      case None => candsAll
    }
    val hits = cands.join(groups, "member")
      .groupBy("uid")
      .agg(map_from_entries(collect_list(struct(col("member"), col("canonical")))).as("hits"))
    withUid.toDF("uid", "node")
      .join(hits, Seq("uid"), "left")
      .select(col("node"), col("hits"))
      .as[(IngestNode, Map[String, String])]
      .flatMap { case (n, hits) =>
        assignOne(n, if (hits == null) Map.empty else hits)
      }
  }

  private[identity] def assignOne(n: IngestNode, g: Map[String, String]): Option[AssignedNode] = {
    val validIds = n.ids.filter(Ids.isValidId)
    if (validIds.isEmpty) None // no-identifier drop (`grebi_assign_ids/src/main.rs:87-90`)
    else {
      val nodeId = g.getOrElse(validIds.head, Ids.canonical(validIds))
      // fold rather than map: two source keys rewriting to the same
      // canonical key (e.g. ols:label and rdfs:label → grebi:name) must
      // MERGE their value lists, not overwrite each other
      val props = n.props.foldLeft(Map.empty[String, Seq[graft.model.RawValue]]) {
        case (acc, (k, vs)) =>
          val key = g.getOrElse(k, k)
          val vals = vs.map { v =>
            g.get(v.value) match {
              case Some(canon) => v.copy(value = canon)
              case None => v
            }
          }
          acc.updated(key, acc.getOrElse(key, Nil) ++ vals)
      }
      val withType =
        if (n.types.isEmpty) props
        else props.updated("grebi:type",
          props.getOrElse("grebi:type", Nil) ++ n.types.map(RawValue.str))
      Some(AssignedNode(nodeId, n.datasource, validIds.sorted, n.subgraph, withType))
    }
  }
}

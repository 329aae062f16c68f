package graft.identity

import graft.curie.Ids
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Identity stage: equivalence cliques over identifier co-occurrence.
  *
  * The reference builds cliques with an in-RAM union-find on one 64 GB node
  * (`02_assign_ids/grebi_identifiers2groups/src/main.rs:54-115`,
  * provisioned in `nextflow/01_create_subgraph.nf:120-121`) — a hard
  * single-machine ceiling. Here it's distributed connected components over
  * a `DataFrame[(src, dst)]` edge list, so the id graph can exceed any one
  * node's RAM.
  */
object ConnectedComponents {

  /** Min-label propagation with per-iteration lineage truncation.
    *
    * Input: edge list with columns (src, dst) — for identifier cliques,
    * every id of a record is linked to the record's first id (star), so
    * edge count ≈ id count, and component diameter stays small (2×
    * transitive-merge depth), which is exactly the regime where min-label
    * propagation converges in a handful of rounds. Each round is one
    * shuffle on the vertex id; `localCheckpoint` breaks the growing
    * lineage so plan size stays O(1) across iterations.
    *
    * Returns (member, component) with component = min member id.
    */
  /** `reliableEvery > 0` swaps every k-th round's `localCheckpoint` for a
    * RELIABLE `checkpoint` (requires `sparkContext.setCheckpointDir`):
    * localCheckpoint stores blocks on executors, so losing one executor
    * after round N forces recomputation of the WHOLE iteration prefix —
    * acceptable for ≤5-round identifier graphs, not for deep graphs on
    * preemptible nodes. Off by default: the gates run single-JVM where
    * executor loss means the app is gone anyway. */
  def run(edges: DataFrame, maxIter: Int = 50,
          reliableEvery: Int = 0): DataFrame = {
    def save(df: DataFrame, round: Int): DataFrame =
      graft.core.Iterate.save(df, reliableEvery, round)
    val src = col("src"); val dst = col("dst")
    val e = edges.select(src.cast("string").as("src"), dst.cast("string").as("dst"))
      .where(src =!= dst)
    val sym = e.union(e.select(dst.as("src"), src.as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Fused first round: the vertex universe needs one pass over `sym`
    // anyway, and the same groupBy can fold in every neighbor's initial
    // id — label₀(v) = min(v, min neighbor). That is exactly what a
    // "round 0 where everyone sends" would compute, for one aggregation
    // instead of a join + aggregation + checkpoint + convergence probe.
    var labels = sym.groupBy(dst.as("member"))
      .agg(min(src).as("nbr"))
      .select(col("member"), least(col("member"), col("nbr")).as("label"))
      .localCheckpoint() // init: always local (cheap, recomputable from sym)
    // Semi-naive: only vertices whose label improved last round send
    // messages; after the fused round that is everyone whose label is a
    // neighbor's id, not its own.
    var frontier = labels.where(col("label") =!= col("member"))

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = sym
        .join(frontier.withColumnRenamed("member", "src"), "src")
        .select(dst.as("member"), col("label"),
          lit(null).cast("string").as("old"))
      // carry the previous label on the self row so convergence falls out
      // of the same aggregation (no second join per round)
      val self = labels.select(col("member"), col("label"), col("label").as("old"))
      val prop = msgs.union(self)
        .groupBy("member")
        .agg(min("label").as("label"), max("old").as("old"))
      // pointer jumping: follow each label to ITS label (path halving).
      // Neighbour propagation alone needs O(diameter) rounds — a deep
      // identifier chain would exhaust maxIter; with compression the
      // combined recurrence converges in O(log diameter) rounds. Shallow
      // graphs (identifier cliques) converge in 2-3 rounds anyway, so the
      // extra self-join only kicks in once depth is evident.
      // (the fused init already counts as one completed round)
      val next = (if (iter < 1) prop
        else {
          val parents = prop.select(col("member").as("label"), col("label").as("label2"))
          prop.join(parents, Seq("label"), "left")
            .select(col("member"),
              least(coalesce(col("label2"), col("label")), col("label")).as("label"),
              col("old"))
        })
      val nextSaved = save(next, iter + 1)
      val changedDf = nextSaved.where(col("label") < col("old"))
      converged = changedDf.isEmpty
      frontier = changedDf.select(col("member"), col("label"))
      labels = nextSaved.select(col("member"), col("label"))
      iter += 1
    }
    sym.unpersist()
    labels.withColumnRenamed("label", "component")
  }
}

object Groups {

  /** Score expression mirroring [[graft.curie.Ids.idScore]] in pure
    * Catalyst (stays codegen'd — no UDF in the canonical-pick path):
    * alphabetic count = length minus length with [A-Za-z] stripped. */
  def idScoreCol(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(id.startsWith("grebi:"), lit(Int.MinValue))
      .when(id.startsWith("biolink:"), lit(Int.MinValue + 1000))
      .otherwise(
        when(id.contains(":") && !id.startsWith("http"), lit(-1000)).otherwise(lit(0))
          - (length(id) - length(regexp_replace(id, "[A-Za-z]", ""))))

  /** From identifier sets (one row per record: array of ids) to the groups
    * table (memberId → canonicalId), the Spark restatement of groups.txt
    * (`grebi_shared/src/load_groups_txt.rs:10-31`).
    *
    * Star edges: each id ↔ first id of its record; CC merges transitively
    * (`grebi_identifiers2groups/src/main.rs:86-104`); canonical member
    * picked per clique by (idScore, id) min — exactly the reference's
    * preference order (`:163-193`).
    */
  def fromIdSets(idSets: DataFrame, saltBuckets: Int = 0): DataFrame = {
    // idSets: single column `ids: array<string>`
    val valid = idSets.select(filter(col("ids"), id => Groups.isValidIdCol(id)).as("ids"))
      .where(size(col("ids")) > 0)
    val members = valid.select(explode(col("ids")).as("member")).distinct()
    val edges = valid.select(explode(col("ids")).as("dst"), element_at(col("ids"), 1).as("src"))
    val cc = ConnectedComponents.run(edges)
    // Singleton cliques never make it into the (self-edge-free) edge list:
    // default them to their own component.
    val full = members.join(cc, Seq("member"), "left")
      .select(col("member"), coalesce(col("component"), col("member")).as("component"))
    pickCanonical(full, saltBuckets)
  }

  /** The canonical pick over a (member, component) frame — split out so
    * the skew fixture (tools/ProfileSkewPick) can measure the pick stage
    * in isolation from the CC rounds that precede it. */
  private[graft] def pickCanonical(full: DataFrame, saltBuckets: Int): DataFrame = {
    if (saltBuckets > 0) {
      // Skew-proof two-phase pick (round 17, guide §2.5): the window form
      // below routes EVERY member of a component through one reducer — a
      // mega-clique (one component owning a large share of all members)
      // becomes a single straggler task, and AQE's skew handling cannot
      // split windows or aggregations, only joins. Two-level aggregation
      // bounds the per-task share of the hot component to ~1/saltBuckets:
      // a salted partial min (deterministic salt off the member hash —
      // guide §2.5, never rand()), a component-level min over
      // ≤ saltBuckets partial rows, then one members ⋈ canonical
      // equi-join to attach — which IS a join, so AQE's runtime skew
      // split covers the attach side. Same (idScore, id)-lexicographic
      // pick; opt-in via SubgraphConfig.hotKeySaltBuckets because the
      // flat shape pays one more (tiny) exchange than the window when no
      // component is hot (tools/ProfileSkewPick measures both).
      val pick = struct(idScoreCol(col("member")).as("score"), col("member").as("id"))
      val partial = full
        .groupBy(col("component"),
          pmod(xxhash64(col("member")), lit(saltBuckets)).as("salt"))
        .agg(min(pick).as("m"))
      val canon = partial.groupBy(col("component"))
        .agg(min(col("m")).getField("id").as("canonical"))
      full.join(canon, Seq("component"))
        .select(col("member"), col("canonical"))
    } else {
      // Canonical pick as ONE window aggregate over the component instead
      // of groupBy + join-back (round 16, guide §2.4): the old shape
      // computed the `full` subtree twice (column pruning diverges between
      // the aggregate and join branches, so the exchange never reuses) and
      // paid a second component-keyed exchange for the join. min(struct)
      // over the partition is the same (idScore, id)-lexicographic pick;
      // skew exposure is unchanged — the join also routed every member of
      // a component to one reducer.
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
      full.select(col("member"),
        min(struct(idScoreCol(col("member")).as("score"), col("member").as("id")))
          .over(w).getField("id").as("canonical"))
    }
  }

  /** Mirror of [[graft.curie.Ids.isValidId]]: all-numeric ids are dropped
    * unless 16+ chars (UUID-like, accepted by the reference check_id). */
  def isValidIdCol(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (id.isNotNull) && (id =!= "") &&
      (length(id) >= 16 || !id.rlike("^[0-9]+$"))

  /** Seeded equivalences (config `additional_equivalence_groups`, e.g.
    * `[grebi:name, ols:label, rdfs:label]`) expressed as extra id-set rows. */
  def seedRows(spark: SparkSession, seeds: Seq[Seq[String]]): DataFrame = {
    import spark.implicits._
    seeds.toDF("ids")
  }
}

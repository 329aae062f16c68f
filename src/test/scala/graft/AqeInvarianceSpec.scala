package graft

/** Differential guard for the second cluster-vs-local bug class: AQE
  * rewrites plans AT RUNTIME (shuffle coalescing, join-strategy
  * switches, skew-join splitting), and production clusters toggle it
  * per workload. A result that depends on the physical plan — join
  * order visible through float summation, partial-agg boundaries, a
  * non-total sort — passes with AQE on and diverges with it off (or
  * vice versa). One representative per shuffle-shaped family runs both
  * ways; row multisets must match. (The oracle gates can't see this:
  * they run one configuration.) */
@graft.DeepTest
class AqeInvarianceSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private val names = Seq(
    "q2_revenue_by_nation",   // broadcast-vs-shuffle join choices
    "q25_topk_aggregate",     // typed aggregator partials
    "g2_connected_components", // iterative loop under replanning
    "d3_minhash_lsh",         // band joins + hot-bucket window
    "g36_aggr_count_cube",    // multi-join DAG
    "t39_source_divergence",  // broadcast dims + word shuffle
    "g45_bounded_sssp",       // min-plus rounds
    "p15_join_size_audit",    // histogram joins
    "a10_sessionize",         // per-user windows
    "g46_triad_census",       // moment + triangle composition
    "s18_sq8_ann",            // two-stage rerank windows (round 12)
    "x15_merge_upsert",       // full-outer merge arms (round 12)
    "g52_landmark_distances", // BFS index + pair probe (round 12)
    "g53_chem_diseases",      // chain + DISTINCT rollup (round 13)
    "g54_temporal_reachability", // date-gated min-merge rounds (round 13)
    "x17_change_feed",        // generation-diff full-outer arms (round 13)
    "g55_hits",               // four-matvec reinforcement chain (round 13)
    "x18_partition_evolution") // cross-spec pruned union (round 13)

  test("results are identical with adaptive execution disabled") {
    val defs = SparkEntry.allDefs
    val missing = names.filterNot(defs.contains)
    assert(missing.isEmpty, s"renamed gates make this spec vacuous: $missing")
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    for (name <- names) {
      val base = defs(name).fn(spark, d).collect().map(_.toString).sorted.toSeq
      spark.conf.set(key, "false")
      try {
        val alt = defs(name).fn(spark, d).collect().map(_.toString).sorted.toSeq
        assert(alt === base, s"$name changed under adaptive=false")
      } finally spark.conf.set(key, prev)
    }
  }
}

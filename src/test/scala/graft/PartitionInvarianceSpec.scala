package graft

/** Differential guard for the classic cluster-vs-local bug class: a
  * result that depends on shuffle fan-out (partition-order-sensitive
  * aggregation, a non-total sort, float summation order) passes every
  * fixed-conf gate and then diverges the day the executor count
  * changes. Each representative query runs under the suite's default
  * `spark.sql.shuffle.partitions` and again at a co-prime fan-out, and
  * the row multisets must be identical — the property that lets the
  * SAME code run on local[4] and a 1000-executor cluster. (The oracle
  * gates can't see this: they always run one configuration.) */
@graft.DeepTest
class PartitionInvarianceSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // one representative per family whose plan has real shuffles:
  // relational agg/join, window, iterative graph, LSH dedup, BPE, text,
  // quantiles, 2-hop cube, triangle attribution, bucketed self-join,
  // temporal gap-fill, filtered ANN, minhash signatures, decorrelated
  // multi-EXISTS, degree-sum stats, first-appearance deciles
  private val names = Seq(
    "q1_pricing_summary", "q3_top_orders", "q25_topk_aggregate",
    "g2_connected_components", "g36_aggr_count_cube", "g37_local_clustering",
    "d3_minhash_lsh", "t27_bpe_merges", "p10_exact_quantiles",
    "s16_filtered_ann", "s17_bucketed_selfjoin", "a8_gap_fill",
    "t35_source_signature", "q29_sole_late_supplier", "g39_assortativity",
    "t36_vocab_growth", "a9_interval_coverage", "g41_rich_club",
    "p11_grouped_mode", "q30_grouping_sets",
    // continuation session: sessionization windows, TV-distance joins,
    // bounded BFS loop, Katz matvec chain, FD/Benford audits, null-aware
    // anti join, grid lag features, KN continuation counts
    "a10_sessionize", "t39_source_divergence", "g42_bfs_layers",
    "g43_katz_walks", "p13_fd_audit", "p14_benford_audit",
    "q32_null_antijoin", "a11_lag_features", "t40_continuation_counts",
    "a12_interarrival_spectrum", "g44_edge_embeddedness",
    "g45_bounded_sssp", "g46_triad_census", "p15_join_size_audit",
    "q33_correlated_scalar", "x12_zorder_index",
    // round 12: parity BFS, cut profile, landmark index, Gini/MAD/
    // contingency audits, collocation lift, compaction plan, MERGE
    // apply, SQ8 two-stage rerank
    "g50_bipartite_check", "g51_partition_edgecut",
    "g52_landmark_distances", "p16_skew_gini", "p17_mad_outliers",
    "p18_contingency_lift", "t41_collocations", "x14_compaction_plan",
    "x15_merge_upsert", "s18_sq8_ann",
    // round 13: notebook chain rollups, temporal reachability, deletion
    // vectors, change feed, drift audit, regex array projection (the
    // streaming twins are covered by their ≡batch shared oracles and
    // split-replay specs — a second full streaming run here buys nothing)
    "g53_chem_diseases", "g54_temporal_reachability",
    "x16_deletion_vectors", "x17_change_feed", "p19_slice_drift",
    "q34_regex_array_projection", "g55_hits", "x18_partition_evolution",
    "x19_vacuum_plan", "g57_mutual_reachability", "a13_twap")

  test("results are identical under a different shuffle fan-out") {
    val defs = SparkEntry.allDefs
    val missing = names.filterNot(defs.contains)
    assert(missing.isEmpty, s"renamed gates make this spec vacuous: $missing")
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    for (name <- names) {
      val base = defs(name).fn(spark, d).collect().map(_.toString).sorted.toSeq
      spark.conf.set(key, "7")
      try {
        val alt = defs(name).fn(spark, d).collect().map(_.toString).sorted.toSeq
        assert(alt === base, s"$name changed under shuffle.partitions=7")
      } finally spark.conf.set(key, prev)
    }
  }
}

package graft.identity

import graft.SparkSpec
import graft.model.{IngestNode, RawValue}

/** The join-based (beyond-broadcast) AssignIds must agree exactly with
  * the broadcast variant. */
class AssignIdsJoinSpec extends SparkSpec {

  test("join-based assign equals broadcast assign") {
    import spark.implicits._
    val nodes = Seq(
      IngestNode(Seq("mondo:0005044", "efo:0000537"), "dsA", "fx", Seq("t"),
        Map("grebi:name" -> Seq(RawValue.str("T2D")),
            "xref" -> Seq(RawValue.str("doid:9352"), RawValue.str("unmapped:1")),
            "old:key" -> Seq(RawValue.str("v")))),
      IngestNode(Seq("doid:9352"), "dsB", "fx", Seq("t"),
        Map("grebi:name" -> Seq(RawValue.str("D")))),
      IngestNode(Seq("12345"), "dsB", "fx", Nil, Map.empty)) // invalid-id drop
    val groups = Map(
      "mondo:0005044" -> "mondo:0005044",
      "efo:0000537" -> "mondo:0005044",
      "doid:9352" -> "doid:9352",
      "old:key" -> "new:key")
    val ds = nodes.toDS()
    val broadcasted = AssignIds(spark, ds, groups).collect()
      .sortBy(n => (n.nodeId, n.datasource))
    val groupsDf = groups.toSeq.toDF("member", "canonical")
    val joined = AssignIds.joinBased(spark, ds, groupsDf).collect()
      .sortBy(n => (n.nodeId, n.datasource))
    assert(joined.length == 2)
    assert(broadcasted.toSeq == joined.toSeq)
    // prop KEY rewritten through the clique in both
    assert(joined.head.props.contains("new:key") || joined(1).props.contains("new:key"))
    // bloom-filtered candidate pruning changes nothing but the shuffle size
    val bloomed = AssignIds.joinBased(spark, ds, groupsDf, bloomFpp = Some(0.01))
      .collect().sortBy(n => (n.nodeId, n.datasource))
    assert(bloomed.toSeq == joined.toSeq)
    // caller-estimated filter sizing: same result, and the plan-side job
    // count shows no extra counting action vs the estimate-supplied run
    def jobsFor(tag: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(tag, tag)
      try body finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(tag).length
    }
    val withEstimate = jobsFor("bloom-estimate") {
      AssignIds.joinBased(spark, ds, groupsDf, bloomFpp = Some(0.01),
        expectedGroupCount = Some(4L)).collect(); ()
    }
    val withStats = jobsFor("bloom-stats") {
      AssignIds.joinBased(spark, ds, groupsDf, bloomFpp = Some(0.01)).collect(); ()
    }
    // stats-derived sizing must not add a counting job over the estimate
    assert(withStats <= withEstimate)
    val est = AssignIds.joinBased(spark, ds, groupsDf, bloomFpp = Some(0.01),
      expectedGroupCount = Some(4L)).collect().sortBy(n => (n.nodeId, n.datasource))
    assert(est.toSeq == joined.toSeq)
  }
}

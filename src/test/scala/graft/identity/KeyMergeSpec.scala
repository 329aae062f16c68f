package graft.identity

import graft.SparkSpec
import graft.model.{IngestNode, RawValue}

class KeyMergeSpec extends SparkSpec {

  test("two source keys in one clique merge their value lists (no overwrite)") {
    import spark.implicits._
    val nodes = Seq(IngestNode(Seq("x:1"), "ds", "fx", Seq("t"),
      Map("ols:label" -> Seq(RawValue.str("A")),
          "rdfs:label" -> Seq(RawValue.str("B"))))).toDS()
    val groups = Map("x:1" -> "x:1",
      "ols:label" -> "grebi:name", "rdfs:label" -> "grebi:name")
    val assigned = AssignIds(spark, nodes, groups).collect().head
    assert(assigned.props("grebi:name").map(_.value).sorted == Seq("A", "B"))
    assert(!assigned.props.contains("ols:label") && !assigned.props.contains("rdfs:label"))
    // join-based path agrees
    val joined = AssignIds.joinBased(spark, nodes,
      groups.toSeq.toDF("member", "canonical")).collect().head
    assert(joined.props("grebi:name").map(_.value).sorted == Seq("A", "B"))
  }
}

package graft.pipeline

import graft.SparkSpec
import graft.query.Query
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The st29 IVM's invariants on a hand fixture: a 2-hop path is counted
  * exactly once even when its two edges arrive in different batches, a
  * redelivered duplicate edge never double-counts, and replaying a batch
  * id overwrites to the identical state. */
class IncrementalAggrCubeSpec extends SparkSpec {
  import spark.implicits._

  private def types =
    Seq("a" -> "A", "b" -> "B", "c" -> "C", "d" -> "D", "r" -> "R")
      .toDF("nodeId", "displayType")

  private def cube(dir: String) =
    IncrementalAggrCube.current(spark, dir)
      .select("root", "direction", "edge1", "type1", "edge2", "type2", "num", "path")
      .as[(String, String, String, String, String, String, Long, String)]
      .collect().toSet

  private def batchEquivalent(all: org.apache.spark.sql.DataFrame) =
    Query.aggrCounts(all, types, "r").withColumn("root", lit("r"))
      .select("root", "direction", "edge1", "type1", "edge2", "type2", "num", "path")
      .as[(String, String, String, String, String, String, Long, String)]
      .collect().toSet

  test("cross-batch paths count once; duplicates and redelivery are idempotent") {
    val dir = Files.createTempDirectory("aggr_cube").toString
    val base = Seq(("a", "r", "x"), ("r", "c", "z")).toDF("fromNodeId", "toNodeId", "edgeType")
    // batch 1 completes an in_in path whose OTHER edge lives in the base
    val b1 = Seq(("b", "a", "y")).toDF("fromNodeId", "toNodeId", "edgeType")
    // batch 2 opens out_out AND redelivers a base edge — the anti-join
    // must drop the duplicate, not count its paths again
    val b2 = Seq(("c", "d", "w"), ("a", "r", "x")).toDF("fromNodeId", "toNodeId", "edgeType")
    IncrementalAggrCube.update(spark, dir, base, types, Seq("r"), 0L)
    IncrementalAggrCube.update(spark, dir, b1, types, Seq("r"), 1L)
    IncrementalAggrCube.update(spark, dir, b2, types, Seq("r"), 2L)
    val all = base.union(b1).union(Seq(("c", "d", "w")).toDF("fromNodeId", "toNodeId", "edgeType"))
    assert(cube(dir) === batchEquivalent(all))
    assert(cube(dir).map(t => (t._2, t._7)) ===
      Set(("in_in", 1L), ("out_out", 1L)))
    // redelivery of batch 2 (same id, same content) recomputes the
    // identical partition — state unchanged
    IncrementalAggrCube.update(spark, dir, b2, types, Seq("r"), 2L)
    assert(cube(dir) === batchEquivalent(all))
  }

  test("both hop orders contribute: a new hop-1 edge picks up old hop-2 edges and vice versa") {
    val dir = Files.createTempDirectory("aggr_cube2").toString
    // base holds only the hop-2 edge b→a; the root-incident hop-1 edge
    // a→r arrives later — the old⋈new / new⋈old split must find both
    val base = Seq(("b", "a", "y")).toDF("fromNodeId", "toNodeId", "edgeType")
    val b1 = Seq(("a", "r", "x")).toDF("fromNodeId", "toNodeId", "edgeType")
    IncrementalAggrCube.update(spark, dir, base, types, Seq("r"), 0L)
    IncrementalAggrCube.update(spark, dir, b1, types, Seq("r"), 1L)
    assert(cube(dir) === batchEquivalent(base.union(b1)))
    assert(cube(dir).exists(t => t._2 == "in_in" && t._8 == "(R)<-[x]-(A)<-[y]-(B)"))
  }

  test("incremental LCC: a triangle spanning three batches credits all corners exactly once") {
    val dir = Files.createTempDirectory("inc_lcc").toString
    // triangle 1-2-3 arrives one edge per batch; edge (1,2) is also
    // redelivered in the last batch and must not re-credit anyone.
    // pendant 1-9 arrives with the base so degree bookkeeping is tested
    IncrementalLcc.update(spark, dir,
      Seq((1L, 2L), (1L, 9L)).toDF("u", "v"), 0L)
    IncrementalLcc.update(spark, dir, Seq((2L, 3L)).toDF("u", "v"), 1L)
    IncrementalLcc.update(spark, dir,
      Seq((1L, 3L), (1L, 2L)).toDF("u", "v"), 2L)
    val got = IncrementalLcc.current(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Query.localClustering(
        Seq((1L, 2L), (1L, 9L), (2L, 3L), (1L, 3L)).toDF("u", "v"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === batch)
    // hand values: node 1 has deg 3 (2, 3, 9), 1 triangle, C(3,2)=3
    // wedges -> 333333 ppm; nodes 2/3 deg 2 -> 1000000; pendant 0
    assert(got.contains((1L, 3L, 1L, 333333L)))
    assert(got.contains((2L, 2L, 1L, 1000000L)))
    assert(got.contains((9L, 1L, 0L, 0L)))
    // replaying the last batch id leaves the state unchanged
    IncrementalLcc.update(spark, dir,
      Seq((1L, 3L), (1L, 2L)).toDF("u", "v"), 2L)
    assert(IncrementalLcc.current(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet === batch)
  }
}

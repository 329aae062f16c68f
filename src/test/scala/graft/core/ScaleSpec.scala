package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-pattern checks: salting equivalence and bucketed co-located
  * joins (shuffle elimination verified against the physical plan). */
class ScaleSpec extends SparkSpec {

  val d = "/root/testdata/sf0.001"

  test("salted count equals plain count under heavy key skew") {
    import spark.implicits._
    // one hot key with 10k rows + a uniform tail
    val skewed = ((1 to 10000).map(i => ("hot", i)) ++ (1 to 500).map(i => (s"k$i", i)))
      .toDF("key", "payload")
    val plain = skewed.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, col("key"), col("payload"), 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val big = ((1 to 5000).map(i => ("hot", i)) ++ (1 to 200).map(i => (s"k$i", i)))
      .toDF("key", "payload")
    val dim = (Seq("hot") ++ (1 to 200).map(i => s"k$i")).zipWithIndex
      .toDF("key", "dimval")
    val plain = big.join(dim, "key").agg(sum("dimval"), count(lit(1)))
      .collect().head
    val salted = Skew.saltedJoin(big, dim, "key", col("payload"), 8)
      .agg(sum("dimval"), count(lit(1))).collect().head
    assert(plain == salted)
  }

  test("salted edge/refs materialise: hub-node fixture matches plain plan") {
    import spark.implicits._
    import graft.model.{MergedNode, PropValue}
    // 500 nodes all referencing ONE hub node (+ a self-looping tail)
    def pv(v: String): PropValue = PropValue(v, "str", Seq("ds"), Seq.empty, Map.empty)
    def node(id: String, refs: Seq[String]): MergedNode =
      MergedNode(id, Seq("ds"), Seq(id), "fx",
        Map("grebi:type" -> Seq(pv("T")), "links" -> refs.map(pv)))
    val hub = node("hub:1", Nil)
    val tail = (1 to 500).map(i => node(s"n:$i", Seq("hub:1", s"n:${i % 7 + 1}")))
    val nodes = (hub +: tail).toDS()
    val metadata = (Seq("hub:1") ++ (1 to 500).map(i => s"n:$i"))
      .map(id => (id, s"name-$id", Seq("T")))
      .toDF("nodeId", "name", "types")

    val plainE = graft.materialise.Materialise.edges(nodes, metadata)
    val saltedE = graft.materialise.Materialise.edges(nodes, metadata, saltBuckets = 8)
    // the salted physical plan replicates the dimension (explode over a
    // sequence) — assert the mitigation is actually in the plan
    assert(saltedE.queryExecution.optimizedPlan.toString.contains("__salt"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("edgeId").collect().map(_.getString(0)).sorted.toSeq
    assert(key(saltedE) == key(plainE) && key(plainE).nonEmpty)

    val plainR = graft.materialise.Materialise.refs(nodes, metadata)
    val saltedR = graft.materialise.Materialise.refs(nodes, metadata, saltBuckets = 8)
    assert(saltedR.queryExecution.optimizedPlan.toString.contains("__salt"))
    def refKey(df: org.apache.spark.sql.DataFrame) =
      df.select(col("fromNodeId"), map_keys(col("refs")))
        .collect().map(r => (r.getString(0), r.getSeq[String](1).sorted.mkString(","))).sorted.toSeq
    assert(refKey(saltedR) == refKey(plainR) && refKey(plainR).nonEmpty)
  }

  test("bucketed tables join without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(s, d).write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Tables.customer(s, d).write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").saveAsTable("customer_b")
      val joined = s.table("orders_b")
        .join(s.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val physical = joined.queryExecution.executedPlan.toString
      // co-located bucket join: no Exchange on either side
      assert(!physical.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in plan:\n$physical")
      assert(joined.count() > 0)
    } finally {
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS customer_b")
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}

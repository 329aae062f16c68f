package graft.tools

import graft.core.Tables
import graft.model.{MergedNode, PropValue}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage probe for g5_edge_materialise (round 16): where does the time
  * go between the typed node construction, the metadata pass, the
  * assertion explode and the join? Cumulative prefixes, per-stage cache
  * clears, noop sink (guide §1.4). */
object ProfileG5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_TIME_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("profile-g5")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def node(prefix: String, c: org.apache.spark.sql.Column) =
      graft.core.Pad.node(prefix, c)
    def pv(v: String): PropValue = PropValue(v, "s", Seq("tpch"), Nil, Map.empty)

    def orderGraph(s: SparkSession, d: String) = {
      val custs = Tables.customer(s, d)
        .select(node("c:", col("c_custkey")).as("id"), col("c_mktsegment").as("t"),
          col("c_name").as("nm"))
        .as[(String, String, String)]
        .map { case (id, seg, nm) => MergedNode(id, Seq("tpch"), Seq(id), "tpch",
          Map("grebi:type" -> Seq(pv(seg)), "grebi:name" -> Seq(pv(nm)))) }
      val ords = Tables.orders(s, d)
        .select(node("o:", col("o_orderkey")).as("id"),
          node("c:", col("o_custkey")).as("cust"), col("o_orderpriority").as("t"))
        .as[(String, String, String)]
        .map { case (id, cust, pri) => MergedNode(id, Seq("tpch"), Seq(id), "tpch",
          Map("grebi:type" -> Seq(pv(pri)), "ord:customer" -> Seq(pv(cust)))) }
      custs.union(ords)
    }

    def stage(name: String)(mk: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"g5-probe: $name")
        mk.write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(null)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[g5probe] $name%-30s median ${times(times.size / 2)}%7.2f s  all ${times.map(t => f"$t%.2f").mkString(",")}")
    }

    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val d = sfDir
    stage("1 orderGraph (typed build)") { orderGraph(spark, d).toDF() }
    stage("2 nodeId only (pruned)") { orderGraph(spark, d).toDF().select(col("nodeId")) }
    stage("3 Index.metadata") { graft.index.Index.metadata(orderGraph(spark, d)) }
    stage("4 assertions (flatMap)") {
      orderGraph(spark, d).flatMap { n =>
        n.props.toSeq.flatMap { case (k, vs) =>
          vs.map(v => (n.nodeId, n.subgraph, n.sourceIds, k, v.value,
            v.datasources, graft.core.Json.strMap(v.qualifiers)))
        }
      }.toDF("fromNodeId", "subgraph", "fromSourceIds", "edgeType", "toNodeId",
        "datasources", "qualifiersJson")
    }
    stage("5 full g5") { graft.operators.MaterialiseOps.edgeMaterialise(spark, d) }
    spark.stop()
  }
}

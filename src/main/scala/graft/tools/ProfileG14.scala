package graft.tools

import graft.model.{IngestNode, RawValue}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level wall-clock breakdown of the g14 pipeline at an arbitrary
  * SF dir — dev tool for finding where the flagship benchmark's time
  * goes (each stage is forced with a count, downstream stages reuse the
  * previous stage only through its own lineage, so numbers are additive
  * upper bounds, not exact).
  */
object ProfileG14 {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // warm-up: full DAG at sf0.001
    graft.SparkEntry.entry(spark).count()
    spark.catalog.clearCache()

    import graft.core.Tables
    import graft.operators.GraphOps
    def node(p: String, c: org.apache.spark.sql.Column) =
      graft.core.Pad.node(p, c)
    val custs = Tables.customer(spark, sfDir)
      .select(node("c:", col("c_custkey")).as("id"), node("alt:", col("c_custkey")).as("alt"),
        col("c_name").as("nm"))
      .as[(String, String, String)]
      .map { case (id, alt, nm) =>
        IngestNode(Seq(id, alt), "ds_cust", "tpch", Seq("Customer"),
          Map("grebi:name" -> Seq(RawValue.str(nm))))
      }
    val ords = Tables.orders(spark, sfDir)
      .select(node("o:", col("o_orderkey")).as("id"), node("c:", col("o_custkey")).as("cust"))
      .as[(String, String)]
      .map { case (id, cust) =>
        IngestNode(Seq(id), "ds_ord", "tpch", Seq("Order"),
          Map("ord:customer" -> Seq(RawValue.str(cust))))
      }

    val all = time("union+ingest count")(custs.union(ords)).persist()
    time("materialise ingest")(all.count())

    val idSets = all.map(_.ids).toDF("ids")
    val groupsDf = time("groups CC")({
      val g = graft.identity.Groups.fromIdSets(idSets); g.count(); g
    })
    val assigned = time("assignIds joinBased")({
      val a = graft.identity.AssignIds.joinBased(spark, all, groupsDf); a.count(); a
    })
    val merged = time("merge")({
      val m = graft.merge.Merge(spark, assigned, Set.empty)
        .map(_.copy(subgraph = "tpch")).cache()
      m.count(); m
    })
    val metadata = time("metadata")({
      val md = graft.index.Index.metadata(merged).cache(); md.count(); md
    })
    val edges = time("edges")({
      val e = graft.materialise.Materialise.edges(merged, metadata,
        excludeProps = Set("grebi:type", "grebi:name")); e.count(); e
    })
    time("edges orderBy out")(edges
      .select(col("fromNodeId"), col("edgeType"), col("toNodeId"))
      .orderBy(col("fromNodeId")).count())

    val t0 = System.nanoTime()
    GraphOps.pipelineE2e(spark, sfDir).count()
    println(f"[profile] full g14 (fresh)          ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    spark.stop()
  }
}

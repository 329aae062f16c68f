package graft.tools

import graft.core.Tables
import graft.model.{IngestNode, RawValue}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level probe of the g14 pipeline (the round-10/11/15 discipline,
  * re-created for round 16): times cumulative plan prefixes of the
  * pipelineE2e DAG with per-stage cache clears, so the cost lands on the
  * stage that causes it. Numbers are additive upper bounds (each prefix
  * recomputes its ancestors). `SPARK_GRAFT_SF_DIR` selects the tier,
  * `SPARK_GRAFT_TIME_REPS` the reps (default 3).
  */
object ProfileG14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_TIME_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("profile-g14")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def node(prefix: String, c: org.apache.spark.sql.Column) =
      graft.core.Pad.node(prefix, c)

    def ingests(s: SparkSession, d: String) = {
      val custs = Tables.customer(s, d)
        .select(node("c:", col("c_custkey")).as("id"), node("alt:", col("c_custkey")).as("alt"),
          col("c_name").as("nm"))
        .as[(String, String, String)]
        .map { case (id, alt, nm) =>
          IngestNode(Seq(id, alt), "ds_cust", "tpch", Seq("Customer"),
            Map("grebi:name" -> Seq(RawValue.str(nm))))
        }
      val ords = Tables.orders(s, d)
        .select(node("o:", col("o_orderkey")).as("id"), node("c:", col("o_custkey")).as("cust"))
        .as[(String, String)]
        .map { case (id, cust) =>
          IngestNode(Seq(id), "ds_ord", "tpch", Seq("Order"),
            Map("ord:customer" -> Seq(RawValue.str(cust))))
        }
      custs.union(ords)
    }

    def stage(name: String)(mk: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"g14-probe: $name")
        mk.write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(null)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[g14probe] $name%-28s median ${times(times.size / 2)}%7.2f s  all ${times.map(t => f"$t%.2f").mkString(",")}")
    }

    // warm-up (JIT + classloading) on the smallest SF
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val d = sfDir
    stage("1 union(typed ingest)") { ingests(spark, d).toDF() }
    stage("2 recordIdSets") { ingests(spark, d).map(_.ids).toDF("ids") }
    stage("3 groups (CC)") {
      graft.identity.Groups.fromIdSets(ingests(spark, d).map(_.ids).toDF("ids"))
    }
    stage("4 assignIds(joinBased)") {
      val all = ingests(spark, d)
      val groupsDf = graft.identity.Groups.fromIdSets(all.map(_.ids).toDF("ids"))
      graft.identity.AssignIds.joinBased(spark, all, groupsDf).toDF()
    }
    stage("5 + merge") {
      val all = ingests(spark, d)
      val groupsDf = graft.identity.Groups.fromIdSets(all.map(_.ids).toDF("ids"))
      val assigned = graft.identity.AssignIds.joinBased(spark, all, groupsDf)
      graft.merge.Merge(spark, assigned).toDF()
    }
    stage("6 full run().edges") {
      val build = graft.pipeline.GraftPipeline.run(spark,
        graft.pipeline.SubgraphConfig(name = "tpch"), Seq(ingests(spark, d)))
      build.edges
    }
    stage("7 full g14 (with orderBy)") {
      graft.operators.GraphOps.pipelineE2e(spark, d)
    }
    spark.stop()
  }
}

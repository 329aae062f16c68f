package graft.tools

import graft.operators.MaterialiseOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc k-truss profile: per-k peel cost for g30/g31 at a given SF.
  * Run: sbt 'runMain graft.tools.ProfileTruss /root/testdata/sf0.01'
  */
object ProfileTruss {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-profile-truss")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[truss-profile] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    time("g30 kTruss k=11")(MaterialiseOps.kTruss(spark, sfDir).count())
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .localCheckpoint()
    var edges = pairs
    Seq(5, 8, 11).foreach { k =>
      time(s"peel k=$k (reused)") {
        val t = MaterialiseOps.kTrussOf(edges, k).localCheckpoint()
        edges = t.select(col("u"), col("v"))
        t.count()
      }
    }
    time("g31 sweep end-to-end")(MaterialiseOps.kTrussSweep(spark, sfDir).count())
    spark.stop()
  }
}

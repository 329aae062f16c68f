package graft.tools

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: per-fold wall cost of [[graft.pipeline
  * .IncrementalSssp.update]] as batches accumulate — the round-12
  * verdict's item 4 asked whether maintaining merged per-(u,v) counts
  * (one prior snapshot + deltas per fold) beats re-aggregating every
  * historical batch partition. Folds the sf lineitem co-order pairs in
  * `nBatches` order-atomic slices and prints one line per fold. */
object MeasureSsspFold {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("sssp_measure").toString
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey"))
    var total = 0L
    for (b <- 0 until nBatches) {
      val slice = li.where(col("l_orderkey") % nBatches === b)
      val pairs = slice.as("a").join(slice.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .agg(count_distinct(col("a.l_orderkey")).as("cnt"))
      val t0 = System.nanoTime()
      graft.pipeline.IncrementalSssp.update(spark, dir, pairs, b.toLong)
      val ms = (System.nanoTime() - t0) / 1000000
      total += ms
      println(s"[sssp-fold] batch=$b ms=$ms")
    }
    println(s"[sssp-fold] total_ms=$total over $nBatches folds at $d")
    spark.stop()
  }
}

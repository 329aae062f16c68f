package graft.tools

import graft.operators.MaterialiseOps
import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev check: H-iteration convergence depth of the co-order graph. */
object CheckCoreness {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .localCheckpoint()
    var prev = MaterialiseOps.corenessOf(pairs, 0).localCheckpoint()
    for (r <- 1 to 12) {
      val cur = MaterialiseOps.corenessOf(pairs, r).localCheckpoint()
      val changed = cur.as("c").join(prev.as("p"), "id")
        .where(col("c.coreness_h") =!= col("p.coreness_h")).count()
      println(s"[coreness] round $r changed=$changed")
      prev = cur
    }
    spark.stop()
  }
}

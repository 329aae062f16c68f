package graft.tools

import graft.operators.MaterialiseOps
import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev check: H-iteration convergence depth of the co-order graph —
  * the decision input for the bounded-round-oracle rule (an incremental
  * or fixpoint coreness gate is buildable only if full convergence fits
  * an unrollable oracle depth, ~20 rounds). Iterates [[MaterialiseOps
  * .hIndexRound]] directly to the fixpoint (the old shape recomputed
  * corenessOf(pairs, r) from scratch per r — O(r²) rounds of work and a
  * 12-round cap that round 10 measured as NOT enough). */
object CheckCoreness {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxRounds = args.drop(1).headOption.map(_.toInt).getOrElse(60)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val adj = pairs.select(col("u").as("node"), col("v").as("nbr"))
      .union(pairs.select(col("v").as("node"), col("u").as("nbr")))
      .localCheckpoint()
    var h = adj.groupBy(col("node")).agg(count(lit(1)).as("h")).localCheckpoint()
    var r = 0
    var changed = -1L
    val t0 = System.nanoTime()
    while (changed != 0L && r < maxRounds) {
      r += 1
      val next = graft.core.Iterate.save(MaterialiseOps.hIndexRound(adj, h), 0, r)
      changed = next.join(h.withColumnRenamed("h", "hp"), "node")
        .where(col("h") =!= col("hp")).count()
      println(s"[coreness] round $r changed=$changed")
      h = next
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      if (changed == 0L) f"[coreness] CONVERGED at round $r ($secs%.1f s total) on $d"
      else f"[coreness] NOT converged after $maxRounds rounds ($secs%.1f s) on $d")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc wall-clock timing of registered gates outside the bench lanes:
  * `runMain graft.tools.TimeQueries <name> [name ...]` against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1), reps via
  * `SPARK_GRAFT_TIME_REPS` (default 3, after one warm-up). Prints one
  * line per (query, rep) plus a median line — the tool behind TUNING's
  * one-off measurements (t28-vs-t35, d3-vs-d12) without promoting
  * anything into the bench lanes. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQueries <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_TIME_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-time-queries")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val defs = graft.SparkEntry.allDefs
    for (name <- args) {
      val fn = defs.getOrElse(name,
        sys.error(s"unknown query $name")).fn
      fn(spark, sfDir).count() // warm-up
      val times = (1 to reps).map { rep =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[time] $name rep $rep: $t%6.2f s")
        t
      }.sorted
      println(f"[time] $name median: ${times(times.size / 2)}%6.2f s")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — prints ONE JSON line the driver collects as
  * BENCH_r{N}.json. Runs the headline (`bench = true`) queries against
  * SPARK_GRAFT_SF_DIR. Each query is forced with .count() (full plan
  * execution, no result materialisation on the driver).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // JVM/codegen warm-up on the smallest SF so measured times reflect the
    // engine, not first-call JIT + classloading.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // optional trailing query names restrict a dev run (same contract as
    // Verify); the driver always runs the full headline set
    val wanted = args.toSet
    // SPARK_GRAFT_BENCH_LANE: "all" (default — the driver's per-round
    // record), "fast" (skip the deep tail for tight dev loops), "deep"
    // (only the expensive six). TUNING.md "Benchmark lanes" documents the
    // split and the ~45 s recorded-total budget it protects.
    val lane = sys.env.getOrElse("SPARK_GRAFT_BENCH_LANE", "all")
    val deep = SparkEntry.deepBenchNames
    val inLane = (k: String) => lane match {
      case "fast" => !deep.contains(k)
      case "deep" => deep.contains(k)
      case _      => true
    }
    val selected = (if (wanted.isEmpty) SparkEntry.benchQueries
      else SparkEntry.benchQueries.filter { case (k, _) => wanted.contains(k) })
      .filter { case (k, _) => inLane(k) }
    // SPARK_GRAFT_BENCH_REPS=N → per-query median of N runs. Shared-host
    // variance is ±50% on single shots (round 5 recorded two 2-5×
    // phantom regressions that a median-of-3 re-run disproved), so the
    // DEFAULT is now 3: every recorded BENCH line is a median. Set 1 for
    // quick dev loops.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        // queries that cache intermediates must not distort later timings
        spark.catalog.clearCache()
        t
      }.sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

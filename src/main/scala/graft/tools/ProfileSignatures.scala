package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall-clock comparison of the two cross-source contamination shapes at
  * an arbitrary SF dir — t28's exact inverted-index overlap (cost ∝ the
  * shared-gram mass) vs t35's constant-state MinHash signature matrix
  * (cost ∝ one corpus pass + S·K signature rows) — the measurement
  * behind TUNING's claim that the signature path is the 100 TB shape. */
object ProfileSignatures {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-signatures")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextAnalysis
    // warm-up both plans once
    TextAnalysis.sourceOverlap(spark, sfDir).count()
    TextAnalysis.sourceSignature(spark, sfDir).count()
    for (rep <- 1 to 3) {
      val exact = time(TextAnalysis.sourceOverlap(spark, sfDir).count())
      val sig = time(TextAnalysis.sourceSignature(spark, sfDir).count())
      println(f"[profile] rep $rep: t28_exact $exact%6.2f s   t35_signature $sig%6.2f s")
    }
    spark.stop()
  }
}

package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession

/** Ad-hoc BPE training profile (round-9 verdict item #3): times the
  * delta-path trainer at increasing round counts so the marginal
  * per-round cost is visible, plus the recount twin at the gate's 10
  * rounds for the before/after. Run:
  *   sbt 'runMain graft.tools.ProfileBpe /root/testdata/sf0.1'
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-profile-bpe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, sfDir)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[bpe-profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    time("warmup delta r=2")(TextAnalysis.bpeMergesFrom(spark, docs, rounds = 2).count())
    for (r <- Seq(5, 10, 20, 40))
      time(s"delta rounds=$r")(TextAnalysis.bpeMergesFrom(spark, docs, rounds = r).count())
    time("recount rounds=10")(TextAnalysis.bpeRunRecount(spark, docs, rounds = 10)._1.count())
    spark.stop()
  }
}

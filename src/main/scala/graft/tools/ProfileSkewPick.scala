package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 skew evidence for the groups canonical pick (guide §2.5).
  *
  * Synthesizes a mega-clique id-set fixture — ONE component owning ~20%
  * of all members (a hub id co-asserted by 20% of records) over a sea of
  * 2-member cliques — and runs `Groups.fromIdSets` with the window pick
  * (saltBuckets=0) vs the two-phase salted pick (saltBuckets=32),
  * interleaved. Reports wall-clock AND the max single task duration (the
  * straggler the window form cannot avoid: every member of the hot
  * component funnels through one window reducer, and AQE cannot split a
  * window partition). Also cross-checks both variants produce identical
  * (member → canonical) rows via a full-row hash + count.
  *
  * Usage: `runMain graft.tools.ProfileSkewPick [nMembers] [reps]`
  * (defaults 2,000,000 / 3).
  */
object ProfileSkewPick {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-skew-pick")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val hot = n / 5 // one clique = 20% of members
    def idSets = {
      val hotSets = spark.range(0, hot)
        .select(array(format_string("m:%09d", col("id")), lit("hub:000000000")).as("ids"))
      val cold = spark.range(hot, n)
        .select(array(format_string("m:%09d", col("id")),
          format_string("p:%09d", col("id"))).as("ids"))
      hotSets.union(cold)
    }

    val maxTaskMs = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val d = e.taskInfo.duration
        var cur = maxTaskMs.get()
        while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
      }
    }

    def runOnce(label: String, saltBuckets: Int): Unit = {
      spark.catalog.clearCache()
      maxTaskMs.set(0L)
      spark.sparkContext.addSparkListener(listener)
      spark.sparkContext.setJobDescription(s"skew-pick $label")
      val t0 = System.nanoTime()
      val out = graft.identity.Groups.fromIdSets(idSets, saltBuckets)
      val row = out.agg(count(lit(1)).as("n"),
        sum(xxhash64(col("member"), col("canonical"))).as("h")).collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBusBridge
        .waitUntilEmpty(spark.sparkContext, 60000L)
      spark.sparkContext.removeSparkListener(listener)
      println(f"[skewpick] $label%-12s wall=$wall%7.2fs maxTask=${maxTaskMs.get() / 1000.0}%7.2fs rows=${row.getLong(0)} hash=${row.getLong(1)}")
    }

    (1 to reps).foreach { r =>
      runOnce(s"window#$r", 0)
      runOnce(s"salted#$r", 32)
    }
    spark.stop()
  }
}

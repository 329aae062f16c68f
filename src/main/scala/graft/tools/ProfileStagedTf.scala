package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 A/B for the t7/t18 staged-tf hypothesis (r16 backlog #2,
  * verdict item #6): at 100 TB the comment in topTerms/bm25 claims the
  * right form is "tf to parquet (the d3s/d16s pattern)" — this measures
  * it instead of asserting it. For each query shape, INLINE is the
  * registered plan verbatim; STAGED tokenizes once, writes the tf table
  * to parquet (timed — the write is part of the cost), and computes
  * every consumer from the staged file (t18's dl derives from staged tf
  * by summing, which is only cheap once tf is a parquet re-read).
  * Per rep the staging dir is deleted first, so every rep computes from
  * the raw inputs (no cross-run caching). Outputs are cross-checked by
  * row count + full-row hash each rep.
  *
  * Usage: `runMain graft.tools.ProfileStagedTf [reps]` against
  * SPARK_GRAFT_SF_DIR (default sf0.1); interleaves inline/staged.
  */
object ProfileStagedTf {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-staged-tf")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stageDir = s"/tmp/graft_staged_tf_${java.util.UUID.randomUUID().toString.take(8)}"

    def clearStage(): Unit = {
      val p = new org.apache.hadoop.fs.Path(stageDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }

    def words = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))

    // ---- t7 shapes -----------------------------------------------------
    def t7From(tf: DataFrame): DataFrame = {
      val df_ = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("word").asc)
      tf.join(df_, "word")
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("word"), col("tf"), col("df"))
        .orderBy(col("doc_id"), col("rank"))
    }
    def t7Inline() = t7From(words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf")))
    def t7Staged() = {
      words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(s"$stageDir/t7_tf.parquet")
      t7From(spark.read.parquet(s"$stageDir/t7_tf.parquet"))
    }

    // ---- t18 shapes ----------------------------------------------------
    def t18From(tf: DataFrame, dl: DataFrame): DataFrame = {
      val st = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
        .select(col("n"), expr("tot div n").as("avgdl"))
      val qterms = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("term").asc).limit(3)
      val w = Window.partitionBy(col("term"))
        .orderBy(col("score").desc, col("doc_id").asc)
      tf.join(broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(st))
        .withColumn("score", expr(
          """((n * 1000000) div df) *
            |((tf * 2200000000) div
            | (tf * 1000000 + (1200 * (250000 + (750000 * dl) div avgdl)) div 1000))"""
            .stripMargin.replace("\n", " ")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select(col("term"), col("rank"), col("doc_id"), col("tf"), col("dl"), col("score"))
        .orderBy(col("term"), col("rank"))
    }
    def t18Inline() = {
      val ws = words.withColumnRenamed("word", "term")
      t18From(ws.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")),
        ws.groupBy("doc_id").agg(count(lit(1)).as("dl")))
    }
    def t18Staged() = {
      words.withColumnRenamed("word", "term")
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(s"$stageDir/t18_tf.parquet")
      val tf = spark.read.parquet(s"$stageDir/t18_tf.parquet")
      // dl = tokens per doc = sum of tf — cheap ONLY off the staged file
      t18From(tf, tf.groupBy("doc_id").agg(sum(col("tf")).as("dl")))
    }

    def hashOf(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), r.getDecimal(1))
    }

    def run(label: String, mk: () => DataFrame): (Double, (Long, java.math.BigDecimal)) = {
      spark.catalog.clearCache()
      clearStage()
      spark.sparkContext.setJobDescription(s"staged-tf $label")
      val t0 = System.nanoTime()
      val df = mk()
      val h = hashOf(df)
      ((System.nanoTime() - t0) / 1e9, h)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "t7_inline" -> (() => t7Inline()), "t7_staged" -> (() => t7Staged()),
      "t18_inline" -> (() => t18Inline()), "t18_staged" -> (() => t18Staged()))
    // warm-up pass (JIT/codegen), then interleaved reps
    variants.foreach { case (_, mk) => run("warmup", mk) }
    val acc = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    val hashes = scala.collection.mutable.Map.empty[String, (Long, java.math.BigDecimal)]
    (1 to reps).foreach { _ =>
      variants.foreach { case (label, mk) =>
        val (t, h) = run(label, mk)
        acc(label) = acc(label) :+ t
        hashes.get(label.takeWhile(_ != '_')) match {
          case Some(prev) => require(prev == h, s"$label output diverged: $prev vs $h")
          case None => hashes(label.takeWhile(_ != '_')) = h
        }
        println(f"[stagedtf] $label%-11s ${t}%6.2f s")
      }
    }
    acc.toSeq.sortBy(_._1).foreach { case (label, ts) =>
      val s = ts.sorted
      println(f"[stagedtf] SUMMARY $label%-11s median=${s(s.length / 2)}%6.2f min=${s.head}%6.2f reps=${s.length} sf=$sfDir")
    }
    clearStage()
    spark.stop()
  }
}

package graft.tools

import graft.curie.PrefixTrie
import graft.model.{IngestNode, RawValue}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 A/B for the P1 whole-record normalise (VERDICT item #5):
  * typed `Dataset.map` twin vs the column-native NormalisePrefix form,
  * over a qualifier-bearing IngestNode corpus synthesized from the
  * orders table (×K replication via an explode, `SPARK_GRAFT_NORM_K`,
  * default 10 → ~1.5M records at sf0.1). Cleared-cache reps, noop sink. */
object ProfileNormalise {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_TIME_REPS", "3").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_NORM_K", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("profile-normalise")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val trie = PrefixTrie(Map(
      "http://example.org/ord/" -> "ord:",
      "http://example.org/cust/" -> "c:",
      "STATUS:" -> "st:"))

    def corpus = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("string").as("ok"),
        col("o_custkey").cast("string").as("ck"),
        col("o_orderstatus").as("st"),
        explode(sequence(lit(1), lit(k))).as("rep"))
      .as[(String, String, String, Int)]
      .map { case (ok, ck, st, rep) =>
        IngestNode(Seq(s"http://example.org/ord/$ok/$rep", s"ord:$ok-$rep"),
          "dsO", "tpch", Seq(s"STATUS:$st"),
          Map(
            s"STATUS:$st" -> Seq(RawValue.str(s"http://example.org/ord/$ok")),
            "ord:customer" -> Seq(RawValue.reified(s"http://example.org/cust/$ck",
              Map("STATUS:q" -> Seq(s"STATUS:$st", "plain"))))))
      }

    def stage(name: String)(mk: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"normalise-ab: $name")
        mk.write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(null)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[normAB] $name%-22s median ${times(times.size / 2)}%7.2f s  all ${times.map(t => f"$t%.2f").mkString(",")}")
    }

    // warm both paths once
    graft.pipeline.GraftPipeline.normalise(corpus.limit(100), trie).toDF().count()
    graft.pipeline.GraftPipeline.normaliseColumnar(corpus.limit(100), trie).toDF().count()

    // Stage the corpus to parquet — the 100 TB shape: ingest adapters
    // read columnar storage, so the A/B must not hand the typed side a
    // free object pipeline (an object-built upstream makes the typed map
    // object-to-object while the native form pays SerializeFromObject).
    val pq = "/tmp/norm_ab_corpus.parquet"
    corpus.write.mode("overwrite").parquet(pq)
    def corpusPq = spark.read.parquet(pq).as[IngestNode]

    stage("0a corpus build (objects)") { corpus.toDF() }
    stage("0b corpus scan (parquet)") { corpusPq.toDF() }
    stage("1a typed over objects") {
      graft.pipeline.GraftPipeline.normalise(corpus, trie).toDF()
    }
    stage("2a native over objects") {
      graft.pipeline.GraftPipeline.normaliseColumnar(corpus, trie).toDF()
    }
    stage("1b typed over parquet") {
      graft.pipeline.GraftPipeline.normalise(corpusPq, trie).toDF()
    }
    stage("2b native over parquet") {
      graft.pipeline.GraftPipeline.normaliseColumnar(corpusPq, trie).toDF()
    }
    spark.stop()
  }
}

package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end corpus build at sf0.001: the composed artifacts must be
  * mutually consistent (the t21 gate pins decisions against DuckDB; this
  * pins the cross-artifact invariants). */
@graft.DeepTest
class CorpusPipelineSpec extends SparkSpec {

  private lazy val build =
    CorpusPipeline.run(spark, "/root/testdata/sf0.001", CorpusConfig())

  test("every input document gets exactly one decision row") {
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(build.decisions.count() === n)
    assert(build.decisions.select("doc_id").distinct().count() === n)
  }

  test("cleaned = kept decisions; split covers exactly the cleaned docs") {
    val kept = build.decisions.where(col("kept") === 1).count()
    assert(build.cleaned.count() === kept)
    assert(build.split.count() === kept)
    assert(build.split.join(build.cleaned, "doc_id").count() === kept)
  }

  test("kept is the conjunction of its flags") {
    val bad = build.decisions.where(
      col("kept") =!= col("exact_keep") * col("neardup_keep") * col("lang_ok")
        * col("len_ok") * col("rep_ok") * col("sem_keep")).count()
    assert(bad === 0)
    // the sem stage is OFF by default: the flag must be vacuous
    assert(build.decisions.where(col("sem_keep") =!= 1).count() === 0)
  }

  test("the d20 dendrogram cut drives the build: decisions change with the cut") {
    val d = "/root/testdata/sf0.001"
    val at2 = CorpusPipeline.run(spark, d, CorpusConfig(semdedupCutStep = 2)).decisions
    val at6 = CorpusPipeline.run(spark, d, CorpusConfig(semdedupCutStep = 6)).decisions
    val drop2 = at2.where(col("sem_keep") === 0).count()
    val drop6 = at6.where(col("sem_keep") === 0).count()
    assert(drop6 > 0, "an aggressive cut must actually drop documents")
    // coarser cut ⇒ bigger clusters ⇒ at least as many verified near-dups
    assert(drop6 >= drop2)
    assert(drop2 !== drop6, "the cut parameter must change the decision table")
    // the sem flag flows into kept
    val inconsistent = at6.where(col("kept") === 1 && col("sem_keep") === 0).count()
    assert(inconsistent === 0)
    // and the stage only ever REMOVES relative to the default build
    val keptDefault = build.decisions.where(col("kept") === 1).count()
    assert(at6.where(col("kept") === 1).count() <= keptDefault)
  }

  test("packed chunks respect the budget unless a single doc overflows it") {
    val over = build.packed
      .where(col("sum_tokens") > 512 && col("n_docs") > 1).count()
    assert(over === 0)
    // chunk doc ranges do not interleave within a source: first_doc of
    // chunk k+1 is greater than last_doc of chunk k
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("chunk"))
    val interleaved = build.packed
      .withColumn("prev_last", lag(col("last_doc"), 1).over(w))
      .where(col("prev_last").isNotNull && col("first_doc") <= col("prev_last"))
      .count()
    assert(interleaved === 0)
  }

  test("config file round-trips thresholds and defaults absent keys") {
    val f = java.nio.file.Files.createTempFile("corpus_cfg", ".json")
    java.nio.file.Files.writeString(f,
      """{"name": "web_crawl", "min_tokens": 20, "max_top_bigram_permille": 100}""")
    val cfg = CorpusConfigLoader.load(f.toString)
    assert(cfg === CorpusConfig(name = "web_crawl", minTokens = 20,
      maxTopBigramPermille = 100))
  }

  test("a config-driven build applies the thresholds (impossible min drops everything)") {
    val strict = CorpusPipeline.run(spark, "/root/testdata/sf0.001",
      CorpusConfig(minTokens = 1000000))
    assert(strict.decisions.where(col("kept") === 1).count() === 0)
    assert(strict.decisions.where(col("len_ok") === 1).count() === 0)
    assert(strict.packed.count() === 0)
  }

  test("write() persists the four artifacts plus a stats summary") {
    val out = java.nio.file.Files.createTempDirectory("corpus_build").toString
    CorpusPipeline.write(build, out)
    for (f <- Seq("decisions.parquet", "cleaned.parquet", "split.parquet", "packed.parquet"))
      assert(new java.io.File(s"$out/$f").exists(), f)
    val stats = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/corpus_summary.json"))
    assert(stats.contains("\"n_docs\":") && stats.contains("\"n_kept\":"))
  }
}

package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental-corpus invariant: batch-applied decisions over
  * monotone-id arrivals equal the one-shot t13 decision table on the
  * union — the property that lets a continuous crawl keep per-document
  * verdicts without ever recomputing the corpus. */
class IncrementalCorpusSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("two incremental batches reproduce the batch corpusFilter exactly") {
    val stateDir = java.nio.file.Files.createTempDirectory("inc_corpus").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val cut = 250L
    val d1 = IncrementalCorpus.update(spark, stateDir,
      docs.where(col("doc_id") < cut), Some("b1"))
    val d2 = IncrementalCorpus.update(spark, stateDir,
      docs.where(col("doc_id") >= cut), Some("b2"))
    val incremental = d1.union(d2)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString).toSeq

    val batch = graft.operators.TextAnalysis.corpusFilter(spark, d)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString).toSeq
    assert(incremental.size === batch.size)
    assert(incremental === batch)
  }

  test("a replayed batch reads back from the persisted decisions log") {
    val stateDir = java.nio.file.Files.createTempDirectory("inc_corpus2").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    IncrementalCorpus.update(spark, stateDir, docs.where(col("doc_id") < 100))
    val persisted = spark.read.parquet(s"$stateDir/decisions.parquet")
    assert(persisted.count() === 100)
    assert(persisted.where(col("kept").isNull).count() === 0)
  }

  test("a redelivered batch is exactly-once: state and decisions unchanged") {
    val stateDir = java.nio.file.Files.createTempDirectory("inc_corpus3").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val first = IncrementalCorpus.update(spark, stateDir,
      docs.where(col("doc_id") < 50), Some("stream-0"))
      .collect().map(_.toSeq).toSet
    // crash-and-retry: same key, same data — must be a no-op replay
    val replay = IncrementalCorpus.update(spark, stateDir,
      docs.where(col("doc_id") < 50), Some("stream-0"))
      .collect().map(_.toSeq).toSet
    assert(replay === first)
    assert(spark.read.parquet(s"$stateDir/decisions.parquet").count() === 50)
    assert(spark.read.parquet(s"$stateDir/bands.parquet")
      .select("doc_id").distinct().count() <= 50)
  }
}

package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental-corpus invariant: batch-applied decisions over
  * monotone-id arrivals equal the one-shot t13 decision table on the
  * union — the property that lets a continuous crawl keep per-document
  * verdicts without ever recomputing the corpus. */
@graft.DeepTest
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

  test("a bridge doc merges two old components and demotes the younger canonical") {
    import spark.implicits._
    // A and B share a word block but are NOT near-dups of each other
    // (no shared band, J < 1/2); C is a verified band-candidate of BOTH —
    // so batch 3 retroactively merges batch 1's and batch 2's components.
    // Texts chosen so the band keys provably fire under the round-15
    // affine family, components 17..32 (deterministic; re-searched when
    // the family migrated off the 16-md5 draws).
    val a = "alpha beta gamma delta epsilon zeta eta theta iota"
    val b = "alpha beta gamma delta epsilon zeta kappa ups pii"
    val c = "alpha beta gamma delta epsilon zeta"
    val all = Seq((1L, a, "en"), (2L, b, "en"), (3L, c, "en"))
    val union = java.nio.file.Files.createTempDirectory("bridge_docs").toString
    all.toDF("doc_id", "text", "lang").write.parquet(s"$union/documents.parquet")
    val stateDir = java.nio.file.Files.createTempDirectory("bridge_state").toString
    val docs = spark.read.parquet(s"$union/documents.parquet")
    val d1 = IncrementalCorpus.update(spark, stateDir,
      docs.where(col("doc_id") === 1), Some("b1"))
    assert(d1.select("neardup_keep").as[Int].collect().toSeq === Seq(1))
    val d2 = IncrementalCorpus.update(spark, stateDir,
      docs.where(col("doc_id") === 2), Some("b2"))
    assert(d2.select("neardup_keep").as[Int].collect().toSeq === Seq(1),
      "A and B must start as separate components for the bridge to mean anything")
    IncrementalCorpus.update(spark, stateDir, docs.where(col("doc_id") === 3), Some("b3"))

    val resolved = IncrementalCorpus.currentDecisions(spark, stateDir)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    val batch = graft.operators.TextAnalysis.corpusFilter(spark, union)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    assert(resolved === batch)
    // and the demotion really happened through a CORRECTION row: doc 2
    // kept its original keep=1 row plus an appended neardup_keep=0 row
    val log = spark.read.parquet(s"$stateDir/decisions.parquet")
    assert(log.where(col("doc_id") === 2).count() === 2)
    assert(IncrementalCorpus.currentDecisions(spark, stateDir)
      .where(col("doc_id") === 2).select("neardup_keep").as[Int].head() === 0)
  }

  test("crash-retry after a partial state write recomputes, not self-poisons") {
    val stateDir = java.nio.file.Files.createTempDirectory("inc_crash").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val b1 = docs.where(col("doc_id") < 100)
    val b2 = docs.where(col("doc_id") >= 100 && col("doc_id") < 200)
    IncrementalCorpus.update(spark, stateDir, b1, Some("b1"))
    val first = IncrementalCorpus.update(spark, stateDir, b2, Some("b2"))
      .collect().map(_.toSeq).toSet
    // simulate the crash: every batch=b2 partition landed, but the marker
    // did not — the retry must ignore its own partial rows (else every
    // b2 doc looks already-seen and exact_keep collapses to 0)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$stateDir/applied_batches/b2"))
    val retry = IncrementalCorpus.update(spark, stateDir, b2, Some("b2"))
      .collect().map(_.toSeq).toSet
    assert(retry === first)
    assert(retry.count(_(1) == 1) > 0, "first-seen docs must keep exact_keep=1 on retry")
    // state is not duplicated either: one hashes row per content hash
    val h = spark.read.parquet(s"$stateDir/hashes.parquet")
    assert(h.groupBy("h").count().where(col("count") > 1).count() === 0)
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

  test("capped candidate joins persist a hot-bucket ledger, never truncate silently") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("inc_hot").toString
    val boiler = "the same boilerplate body text repeated verbatim across every copy in this clique"
    // batch 1: an over-cap clique — the new-new self-join must cap AND ledger
    val b1 = (0L until 1001L).map(i => (i, boiler, "en")).toDF("doc_id", "text", "lang")
    IncrementalCorpus.update(spark, stateDir, b1, Some("b1"))
    val led1 = spark.read.parquet(s"$stateDir/hot_buckets.parquet")
    assert(led1.where(col("side") === "batch").count() > 0,
      "batch self-join capped without a ledger row")
    assert(led1.where(col("side") === "state").count() === 0)

    // batch 2: one more copy probes the now-hot state bucket — the capped
    // probe must ledger too (the batch path's TUNING.md contract)
    val b2 = Seq((2000L, boiler, "en")).toDF("doc_id", "text", "lang")
    IncrementalCorpus.update(spark, stateDir, b2, Some("b2"))
    val led2 = spark.read.parquet(s"$stateDir/hot_buckets.parquet")
    assert(led2.where(col("side") === "state").count() > 0,
      "state probe capped without a ledger row")
    // and the capped probe still classified the arrival correctly
    val d2000 = IncrementalCorpus.currentDecisions(spark, stateDir)
      .where(col("doc_id") === 2000L).select("kept").head().getInt(0)
    assert(d2000 === 0)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
  }
}

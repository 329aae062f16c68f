package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL MIXTURE: [[MixturePipeline]]'s sampling policy as an
  * update path over a growing corpus — the allocation twin of
  * [[IncrementalCorpus]] (which grows the CLEANING state the same way).
  *
  * State is one append-only table, `docs.parquet` — the compact
  * (source, doc_id, tokens) projection, one deterministic `batch=<key>`
  * partition per arrival. An update never re-reads earlier batches'
  * INPUT, only that state; each update returns the refreshed
  * [[MixtureBuild]] over everything seen so far.
  *
  * The semantics that make this genuinely incremental-with-corrections:
  * quotas REDISTRIBUTE as per-source counts grow (t19's weights are
  * ⌊√n⌋, so a source flooded by later batches pulls budget away from the
  * others), which means an earlier batch's admitted document can be
  * retroactively RETIRED by a later update — exactly like
  * IncrementalCorpus's cross-batch merge corrections. The spec pins
  * `update(A); update(B) ≡ runOn(A ∪ B)` including such retirements.
  *
  * Exactly-once under redelivery (the foreachBatch reality): the batch
  * partition is written with Overwrite into its deterministic key — a
  * crashed-and-retried batch replaces its own partial rows — and a
  * marker file written strictly last makes a completed batch a no-op
  * (the Incremental.scala ledger pattern).
  *
  * Scale shape: appending a batch is one projection write of that batch;
  * the rebuild-from-state work is [[MixturePipeline.runOn]]'s — a
  * sources-sized aggregation, one admission window per source partition,
  * and the per-source packing fold. Nothing re-shingles, re-hashes or
  * re-reads raw text. */
object IncrementalMixture {

  private def sanitize(key: String): String =
    key.replaceAll("[^A-Za-z0-9._-]", "_")

  private def docsState(spark: SparkSession, stateDir: String): DataFrame = {
    val p = s"$stateDir/docs.parquet"
    if (new java.io.File(p).exists)
      spark.read.parquet(p).select("source", "doc_id", "tokens")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "source STRING, doc_id BIGINT, tokens BIGINT"))
  }

  /** Apply one arriving batch of documents (source, doc_id, text) and
    * return the refreshed build over the union of all applied batches. */
  def update(spark: SparkSession, stateDir: String, newDocs: DataFrame,
             config: MixtureConfig = MixtureConfig(),
             batchKey: Option[String] = None): MixtureBuild = {
    new java.io.File(stateDir).mkdirs()
    val marker = java.nio.file.Paths.get(
      s"$stateDir/applied_batches/${sanitize(batchKey.getOrElse(""))}")
    if (batchKey.isEmpty || !java.nio.file.Files.exists(marker)) {
      val key = sanitize(batchKey.getOrElse(java.util.UUID.randomUUID.toString))
      MixturePipeline.tokensOf(newDocs)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$stateDir/docs.parquet/batch=$key")
      if (batchKey.isDefined) {
        java.nio.file.Files.createDirectories(marker.getParent)
        java.nio.file.Files.createFile(marker)
      }
    }
    currentBuild(spark, stateDir, config)
  }

  /** The mixture over all applied batches, derived from state only. */
  def currentBuild(spark: SparkSession, stateDir: String,
                   config: MixtureConfig = MixtureConfig()): MixtureBuild =
    MixturePipeline.runOn(docsState(spark, stateDir), config)
}

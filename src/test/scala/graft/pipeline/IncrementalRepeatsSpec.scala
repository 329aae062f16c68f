package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental-repeats invariant: batch-applied cleaning over ANY
  * arrival order equals the one-shot d19 repeat removal on the union —
  * including retroactive corrections when a later arrival makes an
  * earlier document's windows shared. */
@graft.DeepTest
class IncrementalRepeatsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def resolvedRows(stateDir: String): Seq[Seq[Any]] =
    IncrementalRepeats.currentCleaned(spark, stateDir)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq

  private def batchRows(docs: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    graft.operators.Dedup.repeatRemovalOf(spark,
        docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text")))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq

  test("three incremental batches equal the one-shot d19 on real corpus text") {
    val stateDir = java.nio.file.Files.createTempDirectory("inc_rep").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text")).where(col("doc_id") < 120)
    IncrementalRepeats.update(spark, stateDir, docs.where(col("doc_id") < 40), Some("b1"))
    IncrementalRepeats.update(spark, stateDir,
      docs.where(col("doc_id") >= 40 && col("doc_id") < 80), Some("b2"))
    IncrementalRepeats.update(spark, stateDir, docs.where(col("doc_id") >= 80), Some("b3"))
    assert(resolvedRows(stateDir) === batchRows(docs))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
  }

  test("a late arrival retro-cleans the earlier doc it newly shares with") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("inc_rep2").toString
    val boiler = "COPYRIGHT NOTICE ALL RIGHTS RESERVED TEMPLATE v1" // 48 cps
    val other  = "completely unrelated prose with no shared windows at all here"
    // batch 1: doc 1 carries the boilerplate, doc 2 does not — nothing
    // is shared yet, so nothing is removed
    val b1 = Seq((1L, s"alpha $boiler omega"), (2L, other)).toDF("doc_id", "text")
    IncrementalRepeats.update(spark, stateDir, b1, Some("b1"))
    val before = resolvedRows(stateDir)
    assert(before.forall(_(1) === 0L), s"premature removal: $before")

    // batch 2: doc 3 arrives with the SAME boilerplate — doc 1's windows
    // just crossed the shared threshold, so doc 1 must get a corrected
    // row even though it arrived a batch earlier
    val b2 = Seq((3L, s"prefix $boiler suffix")).toDF("doc_id", "text")
    IncrementalRepeats.update(spark, stateDir, b2, Some("b2"))
    val after = resolvedRows(stateDir)
    assert(after.find(_.head === 1L).get(1).asInstanceOf[Long] > 0L,
      "earlier doc was not retro-cleaned")
    assert(after.find(_.head === 2L).get(1) === 0L)
    assert(after === batchRows(b1.union(b2)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
  }

  test("a redelivered batch is exactly-once: state and log unchanged") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("inc_rep3").toString
    val boiler = "THE SAME FORTY PLUS CODEPOINT BOILERPLATE LINE"
    val b1 = Seq((1L, s"a $boiler"), (2L, s"b $boiler")).toDF("doc_id", "text")
    val first = IncrementalRepeats.update(spark, stateDir, b1, Some("b1"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    val replay = IncrementalRepeats.update(spark, stateDir, b1, Some("b1"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    assert(replay === first)
    assert(resolvedRows(stateDir) === batchRows(b1))
    // both docs were actually cleaned (the boilerplate is shared)
    assert(resolvedRows(stateDir).forall(_(1).asInstanceOf[Long] > 0L))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
  }

  test("streaming st14 equals the batch d19 oracle on the replayed corpus") {
    val stateDir = java.nio.file.Files.createTempDirectory("inc_rep_st").toString
    val streamed = graft.streaming.Streaming.streamRepeatRemoval(spark, d, stateDir)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Dedup.repeatRemoval(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
  }
}

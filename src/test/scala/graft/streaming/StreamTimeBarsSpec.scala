package graft.streaming

import graft.SparkSpec
import graft.operators.Temporal
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** st24's load-bearing properties the shared a7 oracle can't see:
  * (1) partial-merge associativity — bars split across micro-batches
  * merge to exactly the one-shot aggregation, and (2) redelivery
  * idempotence — a replayed batch REPLACES its `batch=<id>` partition,
  * so counts never double. */
class StreamTimeBarsSpec extends SparkSpec {
  import spark.implicits._

  private val barUs = 100L

  // bar 0 of key x is SPLIT across the two batches, with the split also
  // separating open (us=10, in b1) from close (us=90, in b2)
  private def b1 = Seq(
    ("x", 10L, 1L, 9.0), ("x", 40L, 2L, 2.0), ("y", 5L, 3L, 4.0)
  ).toDF("event_type", "us", "event_id", "value")
  private def b2 = Seq(
    ("x", 90L, 4L, 1.0), ("x", 250L, 5L, 7.0)
  ).toDF("event_type", "us", "event_id", "value")

  test("partials split across batches merge to the one-shot bars") {
    val merged = Streaming.barMerge(
        Streaming.barPartials(b1, barUs).union(Streaming.barPartials(b2, barUs)))
      .collect().toSeq
    val oneShot = Temporal.timeBarsOf(b1.union(b2), barUs).collect().toSeq
    assert(merged === oneShot)
    // and the split bar really exercises a cross-batch open/close pick
    val x0 = merged.find(r => r.getString(0) == "x" && r.getLong(1) == 0L).get
    assert(x0.getDouble(2) === 9.0 && x0.getDouble(5) === 1.0 && x0.getLong(6) === 3L)
  }

  test("st25 ≡ p9: streamed heavy hitters equal the batch operator on full replay") {
    val dir = Files.createTempDirectory("shh").toString
    val streamed = Streaming.streamHeavyHitters(spark, "/root/testdata/sf0.001", dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = graft.operators.ProfilerOps
      .heavyHitters(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty, "sf0.001 must produce at least one heavy hitter")
  }

  test("redelivered batch overwrites its partition — counts never double") {
    val dir = Files.createTempDirectory("sbars").toString
    def deliver(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      Streaming.barPartials(df, barUs)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$dir/bars.parquet/batch=$id")
    deliver(b1, 0); deliver(b2, 1)
    deliver(b1, 0) // redelivery of batch 0
    val merged = Streaming.barMerge(
        spark.read.parquet(s"$dir/bars.parquet").drop("batch"))
      .collect().toSeq
    assert(merged === Temporal.timeBarsOf(b1.union(b2), barUs).collect().toSeq)
  }

  test("st32 ≡ s16: streamed filtered ANN equals the batch table on full replay") {
    val d = "/root/testdata/sf0.001"
    val streamed = Streaming.streamFilteredAnn(spark, d, "sfann_spec")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val batch = graft.operators.Similarity.filteredAnn(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty, "sf0.001 must produce filtered neighbors")
    // the filter is load-bearing: some query's true top-3 differs from
    // the unfiltered ANN's (otherwise the gate degenerates to st18)
    assert(streamed.exists(_._5 == 0L),
      "at least one true neighbor must sit outside the sign bucket")
  }

  test("st35 ≡ t15: streamed HLL registers equal the batch sketch; split batches max-fold") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val streamed = Streaming.streamHllRegisters(spark, d, "shll_spec")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    val batch = graft.operators.TextAnalysis.hllRegisters(spark, d)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // semigroup fold: per-batch register tables re-max to the one-shot
    val docs = Seq(("a", "x1"), ("a", "x2"), ("b", "y1"), ("a", "x3"), ("b", "y2"))
      .toDF("source", "text")
    val (b1, b2) = (docs.limit(2), docs.exceptAll(docs.limit(2)))
    val folded = graft.operators.TextAnalysis.hllRegistersOf(b1)
      .unionByName(graft.operators.TextAnalysis.hllRegistersOf(b2))
      .groupBy(col("source"), col("bucket"))
      .agg(org.apache.spark.sql.functions.max(col("max_rank")).as("max_rank"))
      .orderBy(col("source"), col("bucket")).collect().toSeq
    val oneShot = graft.operators.TextAnalysis.hllRegistersOf(docs)
      .orderBy(col("source"), col("bucket")).collect().toSeq
    assert(folded === oneShot)
  }

  test("st34 ≡ m5: streamed media-dedup registry equals the batch table on full replay") {
    val d = "/root/testdata/sf0.001"
    val streamed = Streaming.streamMediaDedup(spark, d, "smedia_spec")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val batch = graft.operators.Multimodal.mediaDedup(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(streamed === batch)
    // the registry is per-CONTENT: copies exist and state is bounded by
    // the 50 content classes, not the corpus
    assert(streamed.nonEmpty && streamed.size <= 50)
    assert(streamed.exists(_._4 > 1L), "re-encoded copies must collapse")
  }
}

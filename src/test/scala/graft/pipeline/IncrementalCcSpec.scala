package graft.pipeline

import graft.SparkSpec
import graft.identity.ConnectedComponents
import org.apache.spark.sql.functions._

/** The incremental-CC invariant: batch-applied clique maintenance over ANY
  * arrival order equals one-shot connected components on the edge union —
  * including cross-batch merges, where a later edge joins two components
  * built in earlier batches and every affected member's label must
  * retro-correct. */
@graft.DeepTest
class IncrementalCcSpec extends SparkSpec {

  private def edges(pairs: (String, String)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def resolved(stateDir: String): Map[String, String] =
    IncrementalCc.current(spark, stateDir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def oneShot(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    ConnectedComponents.run(df)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("three batches with cross-batch merges equal one-shot CC on the union") {
    val stateDir = java.nio.file.Files.createTempDirectory("inc_cc").toString
    // b1: two separate chains; b2: a third chain; b3 merges all three
    val b1 = edges("a" -> "b", "c" -> "d")
    val b2 = edges("e" -> "f", "f" -> "g")
    val b3 = edges("b" -> "c", "d" -> "e", "x" -> "y")
    IncrementalCc.update(spark, stateDir, b1, Some("b1"))
    IncrementalCc.update(spark, stateDir, b2, Some("b2"))
    // before the merge batch, the chains are distinct components
    val mid = resolved(stateDir)
    assert(mid("a") === "a" && mid("d") === "c" && mid("g") === "e")
    IncrementalCc.update(spark, stateDir, b3, Some("b3"))
    val fin = resolved(stateDir)
    assert(fin === oneShot(b1.union(b2).union(b3)))
    // the merged chain collapsed to one label and earlier members
    // retro-corrected (labels are monotone non-increasing)
    assert(fin("g") === "a" && fin("c") === "a")
    assert(fin("x") === "x" && fin("y") === "x")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
  }

  test("arrival order does not change the resolved state") {
    val all = Seq("a" -> "b", "b" -> "c", "d" -> "e", "c" -> "d", "p" -> "q")
    val expected = oneShot(edges(all: _*))
    for (perm <- Seq(all, all.reverse, all.sortBy(_._2))) {
      val stateDir = java.nio.file.Files.createTempDirectory("inc_cc_ord").toString
      perm.grouped(2).zipWithIndex.foreach { case (chunk, i) =>
        IncrementalCc.update(spark, stateDir, edges(chunk: _*), Some(s"b$i"))
      }
      assert(resolved(stateDir) === expected, s"order $perm diverged")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
    }
  }

  test("a redelivered batch is exactly-once: state unchanged") {
    val stateDir = java.nio.file.Files.createTempDirectory("inc_cc_once").toString
    IncrementalCc.update(spark, stateDir, edges("a" -> "b"), Some("b1"))
    val first = IncrementalCc.update(spark, stateDir, edges("b" -> "c"), Some("b2"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val before = resolved(stateDir)
    val files = new java.io.File(s"$stateDir/components.parquet").list().sorted.toSeq
    // redeliver b2 (same key, same content — the foreachBatch retry case)
    val replayed = IncrementalCc.update(spark, stateDir, edges("b" -> "c"), Some("b2"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // a replay returns the batch's own recomputed rows, not the full state
    assert(replayed === first)
    assert(resolved(stateDir) === before)
    assert(new java.io.File(s"$stateDir/components.parquet").list().sorted.toSeq === files)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
  }

  test("an empty edge batch is a harmless no-op") {
    val stateDir = java.nio.file.Files.createTempDirectory("inc_cc_empty").toString
    IncrementalCc.update(spark, stateDir, edges("a" -> "b"), Some("b1"))
    val before = resolved(stateDir)
    IncrementalCc.update(spark, stateDir, edges(), Some("b2"))
    assert(resolved(stateDir) === before)
    // and a first batch on an empty store works too
    val fresh = java.nio.file.Files.createTempDirectory("inc_cc_empty2").toString
    IncrementalCc.update(spark, fresh, edges(), Some("b0"))
    assert(IncrementalCc.current(spark, fresh).count() === 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fresh))
  }

  test("an untouched component's rows are not recomputed by later batches") {
    val stateDir = java.nio.file.Files.createTempDirectory("inc_cc_lazy").toString
    IncrementalCc.update(spark, stateDir, edges("a" -> "b", "p" -> "q"), Some("b1"))
    // b2 touches only the a-b component; the p-q rows must come from b1's
    // partition verbatim (no p/q rows in b2's recompute output)
    val out = IncrementalCc.update(spark, stateDir, edges("b" -> "c"), Some("b2"))
    val touched = out.select(col("member")).collect().map(_.getString(0)).toSet
    assert(touched === Set("a", "b", "c"))
    assert(resolved(stateDir) ===
      oneShot(edges("a" -> "b", "p" -> "q", "b" -> "c")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
  }
}

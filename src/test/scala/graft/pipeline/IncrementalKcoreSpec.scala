package graft.pipeline

import graft.SparkSpec
import graft.operators.MaterialiseOps
import org.apache.spark.sql.functions._

/** Pins [[IncrementalKcore]] against the batch peel
  * ([[MaterialiseOps.kCoreOf]]) on the union of all arrived edges —
  * including the unbounded-cascade shape BACKLOG used to reject naive
  * streaming k-core — plus the exactly-once and monotonicity contracts. */
@graft.DeepTest
class IncrementalKcoreSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (String, String)*) =
    rows.toDF("src", "dst")

  private def currentSet(dir: String) =
    IncrementalKcore.current(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def batchSet(rows: Seq[(String, String)], k: Int) =
    MaterialiseOps.kCoreOf(rows.toDF("f", "t"), k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"inc_kcore_$tag").toString

  test("batched arrival equals the one-shot peel, across arrival orders") {
    // K4 {a,b,c,d} (3-core) + pendant chain, split across batches
    val all = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d",
      "c" -> "d", "d" -> "e", "e" -> "f")
    for (perm <- Seq(all, all.reverse, all.grouped(3).toSeq.reverse.flatten)) {
      val dir = tmp("perm")
      perm.grouped(3).zipWithIndex.foreach { case (chunk, i) =>
        IncrementalKcore.update(spark, dir, edges(chunk: _*), 3, Some(s"b$i"))
      }
      assert(currentSet(dir) === batchSet(all, 3), s"order diverged")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("BACKLOG's cascade: one closing edge admits a whole waiting chain") {
    // path a-b-c-d-e-f has no 2-core; closing edge f->a makes the entire
    // cycle the 2-core — the insertion region must cascade from the one
    // new edge's endpoints through every chain vertex
    val dir = tmp("cascade")
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "e" -> "f")
    IncrementalKcore.update(spark, dir, edges(path: _*), 2, Some("b1"))
    assert(currentSet(dir) === Map.empty, "a path has no 2-core")
    val admitted = IncrementalKcore.update(spark, dir, edges("f" -> "a"), 2, Some("b2"))
      .collect().map(_.getString(0)).toSet
    assert(admitted === Set("a", "b", "c", "d", "e", "f"))
    assert(currentSet(dir) === batchSet(path :+ ("f" -> "a"), 2))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("membership is monotone: arrivals never evict an admitted member") {
    val dir = tmp("mono")
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
    IncrementalKcore.update(spark, dir, edges(k4: _*), 3, Some("b1"))
    val before = currentSet(dir).keySet
    IncrementalKcore.update(spark, dir, edges("x" -> "y", "d" -> "x"), 3, Some("b2"))
    assert(before.subsetOf(currentSet(dir).keySet))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("a redelivered batch is exactly-once and returns its own admissions") {
    val dir = tmp("once")
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    IncrementalKcore.update(spark, dir, edges(path.take(2): _*), 2, Some("b1"))
    val first = IncrementalKcore.update(spark, dir, edges(path.drop(2): _*), 2, Some("b2"))
      .collect().map(_.getString(0)).toSet
    val before = currentSet(dir)
    val files = new java.io.File(s"$dir/members.parquet").list().sorted.toSeq
    val replayed = IncrementalKcore.update(spark, dir, edges(path.drop(2): _*), 2, Some("b2"))
      .collect().map(_.getString(0)).toSet
    assert(replayed === first)
    assert(currentSet(dir) === before)
    assert(new java.io.File(s"$dir/members.parquet").list().sorted.toSeq === files)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("reliableEvery parity: the BFS/peel admits the same members") {
    val prev = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("kcore_ckpt").toString)
    try {
      val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "e" -> "f")
      val dirs = Seq(tmp("rel1"), tmp("rel0"))
      for ((dir, re) <- dirs.zip(Seq(1, 0))) {
        IncrementalKcore.update(spark, dir, edges(path: _*), 2, Some("b1"), reliableEvery = re)
        IncrementalKcore.update(spark, dir, edges("f" -> "a"), 2, Some("b2"), reliableEvery = re)
      }
      assert(currentSet(dirs(0)) === currentSet(dirs(1)))
      dirs.foreach(d => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("crash recovery: a retry after a lost marker converges to the same core") {
    val dir = tmp("crash")
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    IncrementalKcore.update(spark, dir, edges(path.take(3): _*), 2, Some("b1"))
    IncrementalKcore.update(spark, dir, edges(path.drop(3): _*), 2, Some("b2"))
    val settled = currentSet(dir)
    assert(settled.keySet === Set("a", "b", "c", "d"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/applied_batches/b2"))
    IncrementalKcore.update(spark, dir, edges(path.drop(3): _*), 2, Some("b2"))
    assert(currentSet(dir) === settled)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("empty batches and an empty store degrade to zero rows") {
    val dir = tmp("empty")
    IncrementalKcore.update(spark, dir, edges(), 2, Some("b0"))
    assert(IncrementalKcore.current(spark, dir).count() === 0L)
    IncrementalKcore.update(spark, dir, edges("a" -> "b", "b" -> "c", "c" -> "a"), 2, Some("b1"))
    val before = currentSet(dir)
    IncrementalKcore.update(spark, dir, edges(), 2, Some("b2"))
    assert(currentSet(dir) === before)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}

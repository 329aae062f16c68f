package graft.pipeline

import graft.SparkSpec
import graft.operators.MaterialiseOps
import org.apache.spark.sql.functions._

/** Pins [[IncrementalRa]] — join-aggregate incremental view maintenance —
  * against the batch RA operator on the union of all arrived
  * memberships: the subtle case is a later batch CHANGING deg(p) and
  * therefore every existing pair's discount through p (replacement
  * semantics, not monotone-append), plus the dynamic-overwrite contract
  * that untouched buckets' files are never rewritten. */
@graft.DeepTest
class IncrementalRaSpec extends SparkSpec {
  import spark.implicits._

  private def mem(rows: (String, String)*) = rows.toDF("sk", "p")

  private def currentMap(dir: String, minCommon: Int = 1) =
    IncrementalRa.current(spark, dir, minCommon).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

  private def batchMap(rows: Seq[(String, String)], minCommon: Int = 1) =
    MaterialiseOps.raScoresOf(rows.toDF("sk", "p"), minCommon).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"inc_ra_$tag").toString

  test("a later membership re-discounts existing pairs through the touched part") {
    val dir = tmp("deg")
    // s1,s2 share part h (deg 2): contrib 500000
    IncrementalRa.update(spark, dir, mem("s1" -> "h", "s2" -> "h"), Some("b1"))
    assert(currentMap(dir) === Map(("s1", "s2") -> ((1L, 500000L))))
    // s3 joins h: deg 3 — the EXISTING s1-s2 pair must drop to 333333
    IncrementalRa.update(spark, dir, mem("s3" -> "h"), Some("b2"))
    assert(currentMap(dir) === Map(
      ("s1", "s2") -> ((1L, 333333L)), ("s1", "s3") -> ((1L, 333333L)),
      ("s2", "s3") -> ((1L, 333333L))))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("random batchings equal the one-shot batch operator") {
    val rng = new scala.util.Random(3141L)
    for (trial <- 1 to 5) {
      val sks = (1 to (3 + rng.nextInt(4))).map(i => s"s$i")
      val ps = (1 to (2 + rng.nextInt(4))).map(i => s"p$i")
      val all = Seq.fill(5 + rng.nextInt(10))(
        (sks(rng.nextInt(sks.length)), ps(rng.nextInt(ps.length)))).distinct
      val dir = tmp(s"fuzz$trial")
      all.grouped(1 + rng.nextInt(3)).zipWithIndex.foreach { case (c, i) =>
        IncrementalRa.update(spark, dir, mem(c: _*), Some(s"b$i"))
      }
      assert(currentMap(dir) === batchMap(all), s"trial $trial diverged on $all")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("exactly-once: a redelivered batch leaves scores and files unchanged") {
    val dir = tmp("once")
    IncrementalRa.update(spark, dir, mem("s1" -> "h", "s2" -> "h"), Some("b1"))
    IncrementalRa.update(spark, dir, mem("s3" -> "h"), Some("b2"))
    val before = currentMap(dir)
    val files = new java.io.File(s"$dir/memberships.parquet").list().sorted.toSeq
    IncrementalRa.update(spark, dir, mem("s3" -> "h"), Some("b2"))
    assert(currentMap(dir) === before)
    assert(new java.io.File(s"$dir/memberships.parquet").list().sorted.toSeq === files)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("crash recovery: a retry after a lost marker converges to the same state") {
    val dir = tmp("crash")
    IncrementalRa.update(spark, dir, mem("s1" -> "h", "s2" -> "h"), Some("b1"))
    IncrementalRa.update(spark, dir, mem("s3" -> "h"), Some("b2"))
    val settled = currentMap(dir)
    // simulate a crash between the state writes and the marker: the
    // marker vanishes, foreachBatch redelivers, update must re-apply
    // idempotently over its own partial leftovers
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/applied_batches/b2"))
    IncrementalRa.update(spark, dir, mem("s3" -> "h"), Some("b2"))
    assert(currentMap(dir) === settled)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/applied_batches/b2")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("untouched buckets' files are not rewritten by later batches") {
    val dir = tmp("lazy")
    // find two parts living in different hash buckets
    val bucketOf = (1 to 50).map(i => s"q$i").map { p =>
      p -> spark.range(1).select(
        pmod(hash(lit(p)), lit(IncrementalRa.Buckets))).head().getInt(0)
    }
    val (pa, ba) = bucketOf.head
    val (pb, _) = bucketOf.find(_._2 != ba).get
    IncrementalRa.update(spark, dir, mem("s1" -> pa, "s2" -> pa, "s1" -> pb, "s3" -> pb), Some("b1"))
    def filesOf(bucket: Int) = {
      val d = new java.io.File(s"$dir/contribs.parquet/pb=$bucket")
      if (d.exists()) d.list().sorted.toSeq else Seq.empty
    }
    val aFilesBefore = filesOf(ba)
    assert(aFilesBefore.nonEmpty)
    // second batch touches only pb's bucket
    IncrementalRa.update(spark, dir, mem("s4" -> pb), Some("b2"))
    assert(filesOf(ba) === aFilesBefore, "untouched bucket was rewritten")
    assert(currentMap(dir) === batchMap(
      Seq("s1" -> pa, "s2" -> pa, "s1" -> pb, "s3" -> pb, "s4" -> pb)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}

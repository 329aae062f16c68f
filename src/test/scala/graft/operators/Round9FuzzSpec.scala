package graft.operators

import graft.SparkSpec
import graft.pipeline.IncrementalKcore

/** Generative coverage for the two round-9 algorithms whose correctness
  * rests on a non-obvious argument: the delta-maintained BPE trainer
  * (≡ the full-recount twin) and incremental k-core admission (≡ the
  * one-shot peel), each on seeded-random inputs chosen to force the
  * hard regimes — tiny alphabets (pair collisions, ties, overlap runs)
  * and random batch splits (cross-batch cascades). Seeded RNG →
  * failures replay. */
@graft.DeepTest
class Round9FuzzSpec extends SparkSpec {
  import spark.implicits._

  test("bpe fuzz: delta path equals the recount twin on random tiny-alphabet corpora") {
    val rng = new scala.util.Random(99991L)
    for (trial <- 1 to 6) {
      val nDocs = 1 + rng.nextInt(3)
      val docs = (1 to nDocs).map { i =>
        val words = Seq.fill(rng.nextInt(6))(
          Seq.fill(1 + rng.nextInt(6))("abc".charAt(rng.nextInt(3))).mkString)
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val rounds = 2 + rng.nextInt(3)
      val (dm, dfin) = TextAnalysis.bpeRun(spark, docs, rounds)
      val (rm, rfin) = TextAnalysis.bpeRunRecount(spark, docs, rounds)
      assert(dm.collect().map(_.toSeq).toSeq === rm.collect().map(_.toSeq).toSeq,
        s"trial $trial: merge tables diverged")
      assert(dfin.collect().map(_.toSeq).toSet === rfin.collect().map(_.toSeq).toSet,
        s"trial $trial: final segmentations diverged")
    }
  }

  test("kcore fuzz: incremental admission equals the one-shot peel across random batchings") {
    val rng = new scala.util.Random(77777L)
    var ran = 0
    for (trial <- 1 to 6) {
      val nV = 5 + rng.nextInt(6)
      val verts = (0 until nV).map(i => s"v$i")
      val all = Seq.fill(4 + rng.nextInt(12))(
        (verts(rng.nextInt(nV)), verts(rng.nextInt(nV))))
        .filter { case (a, b) => a != b }.distinct
      if (all.nonEmpty) {
        ran += 1
        val k = 2 + rng.nextInt(2)
        val dir = java.nio.file.Files.createTempDirectory(s"kcore_fuzz_$trial").toString
        val chunks = all.grouped(1 + rng.nextInt(4)).toSeq
        chunks.zipWithIndex.foreach { case (c, i) =>
          IncrementalKcore.update(spark, dir, c.toDF("src", "dst"), k, Some(s"b$i"))
        }
        val inc = IncrementalKcore.current(spark, dir).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val batch = MaterialiseOps.kCoreOf(all.toDF("f", "t"), k).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(inc === batch,
          s"trial $trial diverged: k=$k chunks=${chunks.length} edges=$all")
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      }
    }
    assert(ran >= 5, "generator degenerated: almost no non-empty graphs")
  }
}

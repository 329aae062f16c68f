package graft.operators

import graft.SparkSpec

/** The staged (parquet-persisted) MinHash+LSH variant must be
  * output-identical to the direct path — same bands, same candidates,
  * same verified pairs. */
class DedupSpec extends SparkSpec {

  test("d3 staged (persist-between-stages) equals the direct path") {
    val d = "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("lsh").toString
    val direct = Dedup.minhashLsh(spark, d).collect().map(_.toString).sorted.toSeq
    val staged = Dedup.minhashLshStaged(spark, d, work).collect().map(_.toString).sorted.toSeq
    assert(staged == direct)
    assert(new java.io.File(s"$work/shingles.parquet").exists())
  }

  test("row-local band keys reproduce the DataFrame path: st8 stream ≡ d3 batch") {
    val d = "/root/testdata/sf0.001"
    val batch = Dedup.minhashLsh(spark, d).collect().map(_.toString).sorted.toSeq
    val streamed = graft.streaming.Streaming.streamNearDup(spark, d, "t_sneardup")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty) // the fixture must actually exercise the path
  }

  test("d11: content-defined chunks survive a prefix insertion (the CDC property)") {
    val rng = new scala.util.Random(7)
    val doc = Seq.fill(400)(('a' + rng.nextInt(26)).toChar).mkString
    val base = Dedup.cdcHashesOf(doc)
    val shifted = Dedup.cdcHashesOf("INSERTED-PREFIX " + doc)
    // every boundary after the edit point is content-local, so most
    // chunks re-align; a fixed-offset windowing would share ~none
    val shared = base.intersect(shifted).size
    assert(base.nonEmpty && shared * 10 >= base.size * 6,
      s"only $shared of ${base.size} chunks survived the shift")
  }
}

package graft.sinks

import graft.SparkSpec

/** The generational KV contract: point lookups are correct across
  * generations, compaction changes layout but never answers, and the
  * generation sequence keeps advancing afterwards. */
class KvGenStoreSpec extends SparkSpec {

  private def dirsOf(path: String): Seq[String] =
    new java.io.File(path).list().toSeq.filter(_.startsWith("gen=")).sorted

  test("point lookups correct across two generations") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("kvgen").toString
    KvGenStore.init(Seq(("a", "a-v0"), ("b", "b-v0")).toDF("key", "value"), path, buckets = 2)
    val g = KvGenStore.append(Seq(("b", "b-v1"), ("c", "c-v1")).toDF("key", "value"), path, buckets = 2)
    assert(g === 1L)
    assert(KvGenStore.lookup(spark, path, "a") === Some("a-v0"), "untouched key keeps base value")
    assert(KvGenStore.lookup(spark, path, "b") === Some("b-v1"), "updated key serves the newer generation")
    assert(KvGenStore.lookup(spark, path, "c") === Some("c-v1"), "new key appears")
    assert(KvGenStore.lookup(spark, path, "zz") === None)
    val merged = KvGenStore.read(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(merged === Map("a" -> "a-v0", "b" -> "b-v1", "c" -> "c-v1"))
  }

  test("compaction folds to one generation without changing any answer") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("kvgen2").toString
    KvGenStore.init(Seq(("a", "a-v0"), ("b", "b-v0")).toDF("key", "value"), path, buckets = 2)
    KvGenStore.append(Seq(("b", "b-v1")).toDF("key", "value"), path, buckets = 2)
    KvGenStore.append(Seq(("a", "a-v2"), ("d", "d-v2")).toDF("key", "value"), path, buckets = 2)
    val before = KvGenStore.read(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val survivor = KvGenStore.compact(spark, path, buckets = 2)
    assert(survivor === 3L)
    assert(dirsOf(path) === Seq("gen=3"), "older generations dropped")
    val after = KvGenStore.read(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(after === before)
    assert(KvGenStore.lookup(spark, path, "a") === Some("a-v2"))
    assert(KvGenStore.lookup(spark, path, "b") === Some("b-v1"))
    // the sequence keeps advancing: a post-compaction update still wins
    KvGenStore.append(Seq(("a", "a-v4")).toDF("key", "value"), path, buckets = 2)
    assert(KvGenStore.lookup(spark, path, "a") === Some("a-v4"))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  test("d13: the prefix filter shrinks the candidate space versus the full inverted index") {
    import graft.core.Tables
    import org.apache.spark.sql.functions._
    val s0 = spark
    val d = "/root/testdata/sf0.001"
    val el = Tables.documents(s0, d)
      .select(col("doc_id"), col("text")).as[(Long, String)](
        org.apache.spark.sql.Encoders.product[(Long, String)])
      .flatMap(t => Dedup.shinglesOf(t._2).map((t._1, _)))(
        org.apache.spark.sql.Encoders.product[(Long, String)])
      .toDF("id", "e")
    val full = el.as("a").join(el.as("b"),
        col("a.e") === col("b.e") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()
    val freq = el.groupBy("e").agg(count(lit(1)).as("f"))
    val sz = el.groupBy("id").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("f").asc, col("e").asc)
    val prefix = el.join(freq, "e").join(sz, "id")
      .withColumn("idx", row_number().over(w))
      .where(col("idx") <= col("n") - expr("(n * 1 + 1) div 2") + 1)
      .select(col("id"), col("e"))
    val pruned = prefix.as("a").join(prefix.as("b"),
        col("a.e") === col("b.e") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()
    assert(pruned < full, s"prefix candidates $pruned !< full $full")
    assert(pruned > 0)
  }

  test("hot-bucket guard: a 1000-copy clique yields O(clique) candidates, not O(clique²)") {
    import spark.implicits._
    // every member shares all 4 band keys — the million-copy boilerplate
    // shape: uncapped, 4 buckets × k²/2 ≈ 2M pairs; capped, a star
    val k = 1000
    val bands = (0L until k).flatMap(id => (0 until 4).map(b => (id, s"band$b")))
      .toDF("doc_id", "band")
    val cand = Dedup.bandCandidates(bands, "doc_id", cap = 100)
    assert(cand.count() === (k - 1).toLong, "star-to-minimum must emit k-1 pairs")
    // connectivity is preserved: every member reaches the bucket minimum
    assert(cand.where(col("da") === 0L).count() === (k - 1).toLong)
    // and the overflow ledger reports exactly the capped buckets
    val ledger = Dedup.hotBandBuckets(bands, "doc_id", cap = 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(ledger === (0 until 4).map(b => (s"band$b", k.toLong)))
  }

  test("hot-bucket guard: buckets at or under the cap keep the exact pair join") {
    import spark.implicits._
    val bands = (0L until 5L).map((_, "shared")).toDF("doc_id", "band")
    val cand = Dedup.bandCandidates(bands, "doc_id", cap = 5)
    assert(cand.count() === 10L) // 5 choose 2 — byte-identical to uncapped
    assert(Dedup.hotBandBuckets(bands, "doc_id", cap = 5).count() === 0L)
  }

  test("d7 exact-dup pre-route: a 1000-copy clique clusters without entering LSH") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("clique").toString
    val docs = ((0L until 1000L).map(i => (i, "all copies share this exact boilerplate text body", "en"))
        :+ (1000L, "a genuinely different document that stands alone entirely", "en"))
      .toDF("doc_id", "text", "lang")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = Dedup.dedupClusters(spark, dir)
    val byRep = out.groupBy("rep_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byRep === Map(0L -> 1000L, 1000L -> 1L))
    assert(out.where(col("keep") === 1).select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(0L, 1000L))
    assert(out.count() === 1001L)
  }

  test("d16: hashed default ≡ raw-window oracle ≡ staged parquet variant") {
    val d = "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("mrep").toString
    val hashed = Dedup.maximalRepeats(spark, d).collect().map(_.toString).sorted.toSeq
    val raw = Dedup.maximalRepeatsRaw(spark, d).collect().map(_.toString).sorted.toSeq
    val staged = Dedup.maximalRepeatsStaged(spark, d, work).collect().map(_.toString).sorted.toSeq
    assert(hashed === raw, "hash-head default diverged from the raw-window oracle")
    assert(staged === hashed)
    assert(hashed.nonEmpty) // the fixture must actually exercise the path
    assert(new java.io.File(s"$work/window_hashes.parquet").exists())
  }

  test("windowHashes slide equals rolling_hash of every window on random strings") {
    import graft.functions.RollingHash
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 40) {
      val n = 1 + rng.nextInt(120)
      val s = Seq.fill(n)((0x20 + rng.nextInt(0x2500)).toChar).mkString
      val w = 1 + rng.nextInt(12)
      val cps = s.codePoints().toArray
      val slid = RollingHash.windowHashes(s, w).toSeq
      val direct = (0 to cps.length - w)
        .map(i => RollingHash.hash(new String(cps, i, w)))
      assert(slid === direct, s"w=$w on [${s.take(20)}...]")
    }
    assert(RollingHash.windowHashes("ab", 3).isEmpty)
    assert(RollingHash.windowHashes(null, 2).isEmpty)
  }

  test("d19: removed intervals + surviving text partition every document exactly") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val out = Dedup.repeatRemoval(spark, d)
    val lens = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), length(coalesce(col("text"), lit(""))).cast("long").as("orig_len"))
    val bad = out.join(lens, "doc_id")
      .where(col("cleaned_len") + col("removed_chars") =!= col("orig_len"))
      .count()
    assert(bad === 0L, "every doc must split exactly into kept + removed codepoints")
    assert(out.where(col("n_removed") > 0).count() > 0L,
      "the fixture must actually exercise removal")
  }

  test("dendrogram cut: +inf folds to one cluster, below-min keeps all, monotone between") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val merges = Dedup.centroidDendrogram(spark, d).localCheckpoint()
    val rows = merges.collect()
    assert(rows.length === 7)
    val leaves = (rows.map(_.getLong(1)) ++ rows.map(_.getLong(2))).distinct
      .toSeq.toDF("id")
    val k = leaves.count()
    def nClusters(h: Long): Long =
      Dedup.cutDendrogram(leaves, merges, h).select("cluster").distinct().count()
    val links = rows.map(_.getLong(3)).sorted
    assert(nClusters(Long.MaxValue) === 1L)
    assert(nClusters(links.head - 1) === k)
    // each merge with a strictly-larger linkage reduces the count by one;
    // cutting just above the i-th smallest linkage leaves ≤ k - i
    val counts = links.map(h => nClusters(h)).toSeq
    assert(counts === counts.sorted.reverse, s"cluster counts not monotone: $counts")
    assert(counts.last === 1L)
  }

  test("d15: suffix-automaton LCS matches the quadratic model on random strings") {
    val rng = new scala.util.Random(99)
    def brute(a: String, b: String): Int = {
      val as = a.codePoints.toArray; val bs = b.codePoints.toArray
      var best = 0
      for (i <- as.indices; j <- bs.indices) {
        var k = 0
        while (i + k < as.length && j + k < bs.length && as(i + k) == bs(j + k)) k += 1
        if (k > best) best = k
      }
      best
    }
    for (_ <- 1 to 60) {
      val alpha = "abc" // small alphabet → long accidental matches
      def rand(n: Int) = Seq.fill(n)(alpha(rng.nextInt(alpha.length))).mkString
      val a = rand(2 + rng.nextInt(40))
      val b = rand(2 + rng.nextInt(40))
      assert(Dedup.lcsLen(a, b) === brute(a, b), s"[$a] vs [$b]")
    }
    assert(Dedup.lcsLen("", "abc") === 0)
    assert(Dedup.lcsLen("xyz", "") === 0)
    assert(Dedup.lcsLen(null, "abc") === 0)
  }

  test("d21: scores are consistent and the d3 survivors are a subset of its candidates") {
    val d = "/root/testdata/sf0.001"
    val rows = Dedup.editVerify(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val prefix = graft.core.Tables.documents(spark, d)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.col("text"), 1, 256).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (da, db, edit, sim, isDup) =>
      assert(da < db)
      assert(sim >= 0 && sim <= 1000)
      assert((isDup == 1) == (sim >= 900))
      assert((edit == 0L) == (prefix(da) == prefix(db)))
    }
    val d21Pairs = rows.map(r => (r._1, r._2)).toSet
    val d3Pairs = Dedup.minhashLsh(spark, d).select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d3Pairs.subsetOf(d21Pairs))
  }

  test("d12 family: components pick independent argmins and match-rate tracks Jaccard") {
    // Pure local mirror of the d12/t35 per-component family
    // (Exact.minhashA/B over the md5-slice reduce) — the property an
    // oracle that mirrors the hash can never check. The ORIGINAL
    // linear-in-j multipliers fail both asserts: every component picks
    // the same argmin, so 16 components carry one hash and the
    // J=0.5 match-rate reads ~1/16.
    import graft.core.Exact.{minhashA, minhashB, MinhashP => P}
    def x(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % P
    }
    val set = (1 to 100).map(i => s"shingle$i")
    val argmins = (1 to 16).map { j =>
      set.minBy(g => (x(g) * minhashA(j) + minhashB(j)) % P)
    }
    assert(argmins.distinct.size >= 8,
      s"components collapsed to ${argmins.distinct.size} argmins — family degenerate")
    // J = 0.5 pair: 100 shared of 150 total... use 50 shared of 100 each
    val a = (1 to 100).map(i => s"s$i")
    val b = ((1 to 50) ++ (201 to 250)).map(i => s"s$i")
    def sig(s: Seq[String]) =
      (1 to 16).map(j => s.map(g => (x(g) * minhashA(j) + minhashB(j)) % P).min)
    val matches = sig(a).zip(sig(b)).count { case (u, v) => u == v }
    val trueJ = 50.0 / 150
    assert(math.abs(matches / 16.0 - trueJ) <= 0.3,
      s"J=$trueJ but signature match rate ${matches / 16.0}")
  }
}

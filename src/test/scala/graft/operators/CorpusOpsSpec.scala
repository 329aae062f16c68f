package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of the corpus-pipeline operators added on top of
  * the pair-level dedup suite: cluster canonicalization (d7),
  * decontamination (t11), trigram familiarity (t12), ANN recall (s5). */
@graft.DeepTest
class CorpusOpsSpec extends SparkSpec {

  val d = "/root/testdata/sf0.001"

  test("d7: clusters partition the corpus and agree with the d3 pairs") {
    val rows = Dedup.dedupClusters(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val nDocs = graft.core.Tables.documents(spark, d).count()
    assert(rows.length == nDocs && rows.map(_._1).distinct.length == nDocs)
    // rep is the cluster MIN, so rep_id <= doc_id everywhere and
    // keep marks exactly the rep row
    rows.foreach { case (doc, rep, _, keep) =>
      assert(rep <= doc)
      assert((keep == 1) == (doc == rep))
    }
    // cluster sizes partition the corpus
    assert(rows.filter(_._4 == 1).map(_._3).sum == nDocs)
    // every verified near-dup pair landed in the same cluster
    val rep = rows.map(r => r._1 -> r._2).toMap
    val pairs = Dedup.minhashLsh(spark, d).select("da", "db").collect()
    pairs.foreach(p => assert(rep(p.getLong(0)) == rep(p.getLong(1))))
  }

  test("t11: only val-split docs, contamination bounded by gram count") {
    val rows = TextAnalysis.decontamination(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val valDocs = TextAnalysis.trainSplit(spark, d)
      .where(col("split") === "val").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == valDocs)
    rows.foreach { case (_, n, c) => assert(c >= 0 && c <= n) }
  }

  test("t12: trigram count is len-2 and familiarity dominates it") {
    val fam = TextAnalysis.trigramFamiliarity(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val lens = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), length(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    fam.foreach { case (doc, n, f) =>
      assert(n == math.max(lens(doc) - 2, 0).toLong)
      // every trigram occurs globally at least once (itself)
      assert(f >= n)
    }
  }

  test("s5: one row per s1 query, hits within [0, k]") {
    val rows = Similarity.annRecall(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 20 && rows.map(_._1).toSet == (0L until 20L).toSet)
    rows.foreach { case (_, k, h) => assert(k == 3 && h >= 0 && h <= 3) }
  }

  test("s13: ranks contiguous per vector, dots non-increasing, ANN dot bounded by exact") {
    val rows = Similarity.knnGraph(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byVec = rows.groupBy(_._1)
    byVec.foreach { case (v, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq)
      sorted.foreach { case (_, _, nbr, _) => assert(nbr != v) }
    }
    // the blocked top-1 can never beat the exact (unblocked) top-1
    val emb = graft.core.Tables.embeddings(spark, d)
      .select(col("vec_id"), graft.core.Exact.quantize(col("embedding"), 10000).as("q"))
    val exact1 = emb.as("a").join(emb.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("v"),
        graft.functions.DotProductL(col("a.q"), col("b.q")).as("dot"))
      .groupBy("v").agg(max("dot").as("best"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byVec.foreach { case (v, rs) =>
      assert(rs.minBy(_._2)._4 <= exact1(v))
    }
  }

  test("s14: recall is monotone in radius and the radius-1 arm matches s13") {
    val rows = Similarity.knnGraphRecallSweep(spark, d).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(r => (r._1, r._2)).toSeq == Seq((0, 1), (1, 9), (2, 37)))
    val recalls = rows.sortBy(_._1).map(_._4)
    assert(recalls.toSeq == recalls.sorted.toSeq, "recall must not drop as probes widen")
    rows.foreach { case (_, _, hits, rec) =>
      assert(hits >= 0 && rec >= 0 && rec <= 1000)
    }
    // the radius-1 arm IS s13's graph: its hit count equals |s13 ∩ exact top-3|
    val s13 = Similarity.knnGraph(spark, d).select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = graft.core.Tables.embeddings(spark, d)
      .select(col("vec_id"), graft.core.Exact.quantize(col("embedding"), 10000).as("q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v")).orderBy(col("dot").desc, col("n").asc)
    val exact = emb.as("a")
      .join(emb.select(col("vec_id").as("n"), col("q").as("nq")), col("n") =!= col("vec_id"))
      .select(col("vec_id").as("v"), col("n"),
        graft.functions.DotProductL(col("q"), col("nq")).as("dot"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
      .select("v", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.find(_._1 == 1).get._3 == (s13 & exact).size.toLong)
  }

  test("t26: buckets are per-lang tertiles over val docs only; table is monotone") {
    val tab = TextAnalysis.surprisalTable
    assert(tab.length == 1001 && tab(1000) == 0L)
    assert(tab.sliding(2).forall { case Seq(a, b) => a >= b }, "surprisal must fall as p rises")
    val rows = TextAnalysis.perplexityFilter(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val valIds = TextAnalysis.trainSplit(spark, d)
      .where(col("split") === "val").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet.subsetOf(valIds), "train docs must never be scored")
    rows.foreach { case (_, _, nb, ms, b) =>
      assert(nb >= 1 && ms >= 0 && ms <= tab(0))
      assert(Set("head", "middle", "tail").contains(b))
    }
    // ntile: per lang, bucket sizes differ by at most one and ordering is
    // consistent — every head score <= every tail score within the lang
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val sizes = rs.groupBy(_._5).view.mapValues(_.length).toMap
      if (rs.length >= 3) {
        assert(sizes.values.max - sizes.values.min <= 1)
        val headMax = rs.filter(_._5 == "head").map(_._4).max
        val tailMin = rs.filter(_._5 == "tail").map(_._4).min
        assert(headMax <= tailMin)
      }
    }
  }

  test("m8: banding is complete at threshold 3 and every pair verifies") {
    val hashes = Multimodal.imagePhashes(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keys.forall(_ % 2 == 0), "only image docs are hashed")
    val pairs = Multimodal.imagePhashPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    pairs.foreach { case (a, b, ham) =>
      assert(a < b && ham <= 3)
      assert(java.lang.Long.bitCount(hashes(a) ^ hashes(b)) == ham)
    }
    // pigeonhole: 4 bands × threshold 3 ⟹ the banded join loses nothing
    val ids = hashes.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- i + 1 until ids.length
      if java.lang.Long.bitCount(hashes(ids(i)) ^ hashes(ids(j))) <= 3
    } yield (ids(i), ids(j))).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == brute)
  }

  test("t25: exactly 100 admitted, ranks dense, weights non-increasing") {
    val rows = TextAnalysis.dsirSelection(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.length == 100)
    assert(rows.map(_._1).toSeq == (1 to 100).toSeq)
    val ws = rows.sortBy(_._1).map(_._4).toSeq
    assert(ws == ws.sortBy(-_))
    // ties within a weight are admitted lowest-id-first
    rows.sortBy(_._1).sliding(2).foreach {
      case Array((_, id1, _, w1), (_, id2, _, w2)) =>
        assert(w1 > w2 || (w1 == w2 && id1 < id2))
      case _ =>
    }
  }

  test("st16: streaming edit-verify equals the batch d21 table") {
    val stream = graft.streaming.Streaming
      .streamEditVerify(spark, d, "t_sedit_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSet
    val batch = Dedup.editVerify(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSet
    assert(stream == batch)
  }

  test("st15: streaming decontamination equals the batch t11 gate") {
    val stream = graft.streaming.Streaming
      .streamDecontamination(spark, d, "t_sdecon_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = TextAnalysis.decontamination(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream == batch)
  }

  test("t27: BPE learns the hand-computable merge sequence, ties lexicographic") {
    import spark.implicits._
    // words "aaab" ×3: round 1 picks (a,a) n=6 (two per word), the
    // left-to-right greedy scan merges only the FIRST overlapping pair;
    // round 2 is a 3-3 tie between (aa,a) and (a,b) → lexicographic
    // tiebreak picks (a,b); round 3 merges (aa,ab); then the corpus is
    // one symbol per word and no further rows appear
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMergesFrom(spark, docs, rounds = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq((1, "a", "a", 6L), (2, "a", "b", 3L), (3, "aa", "ab", 3L)))
  }

  test("p6: the count-min estimate never under-counts and hits exactly without collisions") {
    val rows = ProfilerOps.countMin(spark, d).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (exact, cm) = (r.getLong(1), r.getLong(2))
      assert(cm >= exact, s"CM under-estimated ${r.getString(0)}: $cm < $exact")
    }
  }

  test("t32 ≡ t11: the Bloom pre-filter never changes the decontamination result") {
    val exact = TextAnalysis.decontamination(spark, d).collect().map(_.toSeq).toSeq
    val bloomed = TextAnalysis.bloomDecontamination(spark, d).collect().map(_.toSeq).toSeq
    assert(bloomed === exact)
  }

  test("Bloom.filterAgg/mightContain: no false negatives on inserted keys") {
    import spark.implicits._
    val keys = (1 to 500).map(i => s"key_$i")
    val blob = keys.toDF("g")
      .agg(graft.functions.Bloom.filterAgg(col("g"), 1000L, 8000L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val found = keys.toDF("g")
      .where(graft.functions.Bloom.mightContain(lit(blob), col("g")))
      .count()
    assert(found === 500L, "a Bloom filter must never drop an inserted key")
  }

  test("t31: repetition permille is exact on hand documents; short docs are absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b c"),  // 7 grams: abc,bca,cab,abc,bca,cab,abc -> 3 distinct, 4 dup
      (2L, "x y z w"),            // 2 grams, both unique
      (3L, "a b"),                // < 3 words: absent
      (4L, null.asInstanceOf[String])) // null text: absent
      .toDF("doc_id", "text")
    // reuse the operator's corpus shape via a temp parquet dir
    val dir = java.nio.file.Files.createTempDirectory("t31").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.ngramRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows === Map(1L -> ((7L, 4L, 571L)), 2L -> ((2L, 0L, 0L))))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("p8: the spectrum is the count-of-counts and sums back to the vocabulary") {
    val rows = graft.operators.ProfilerOps.frequencySpectrum(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    // Σ n_words over the spectrum = |vocabulary|
    import spark.implicits._
    val vocab = graft.core.Tables.documents(spark, d)
      .where(col("text").isNotNull).select(col("text")).as[String]
      .flatMap(_.trim.split("\\s+")).distinct().count()
    assert(rows.map(_._2).sum === vocab)
  }

  test("t27 delta path ≡ recount twin: merge tables and final segmentations agree") {
    import spark.implicits._
    // adversarial shapes: overlapping runs ("aaaa"), cross-word ties,
    // repeated words across docs (dictionary weighting), single-symbol
    // and empty words, a word that becomes one symbol mid-training
    val corpora = Seq(
      Seq((1L, "aaab aaab"), (2L, "aaab")),
      Seq((1L, "aaaa")),
      Seq((1L, "abab baba abab"), (2L, "bb aa bb"), (3L, "a b ab")),
      Seq((1L, "xy xy xy zzz"), (2L, "yx")),
      Seq((1L, ""), (2L, "q"), (3L, "q q qq")))
    for (c <- corpora; rounds <- Seq(3, 6)) {
      val docs = c.toDF("doc_id", "text")
      val (dm, df_) = TextAnalysis.bpeRun(spark, docs, rounds)
      val (rm, rf) = TextAnalysis.bpeRunRecount(spark, docs, rounds)
      assert(dm.collect().toSeq.map(_.toSeq) === rm.collect().toSeq.map(_.toSeq),
        s"merge tables diverged on $c rounds=$rounds")
      assert(df_.collect().map(_.toSeq).toSet === rf.collect().map(_.toSeq).toSet,
        s"final segmentations diverged on $c rounds=$rounds")
    }
    // and on real testdata: the gate's own corpus at 5 rounds
    val docs = graft.core.Tables.documents(spark, d)
    assert(TextAnalysis.bpeMergesFrom(spark, docs, rounds = 5).collect().toSeq.map(_.toSeq) ===
      TextAnalysis.bpeRunRecount(spark, docs, rounds = 5)._1.collect().toSeq.map(_.toSeq))
  }

  test("reliableEvery parity: BPE merges and the s14 sweep are unchanged") {
    import spark.implicits._
    val prev = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("corpus_ckpt").toString)
    try {
      val docs = Seq((1L, "aaab aaab"), (2L, "aaab")).toDF("doc_id", "text")
      assert(TextAnalysis.bpeMergesFrom(spark, docs, rounds = 5, reliableEvery = 1)
          .collect().toSeq ===
        TextAnalysis.bpeMergesFrom(spark, docs, rounds = 5).collect().toSeq)
      assert(Similarity.knnGraphRecallSweep(spark, d, reliableEvery = 1)
          .collect().toSeq ===
        Similarity.knnGraphRecallSweep(spark, d).collect().toSeq)
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("t27: overlapping-run resolution is the greedy non-overlapping scan") {
    import spark.implicits._
    // "aaaa": the (a,a) run has 3 overlapping occurrences; greedy keeps
    // positions 0 and 2 → two `aa` symbols, whose pair then merges once
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMergesFrom(spark, docs, rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("t33: temperature quotas are integer-exact, floor at 1, and the draw is deterministic") {
    import spark.implicits._
    // strata sizes 9 / 4 / 1 → w = ⌊√n⌋ = 3 / 2 / 1, W = 6; budget 12:
    // quotas = (12·3) div 6 = 6, (12·2) div 6 = 4 (= whole stratum),
    // (12·1) div 6 = 2 → capped at the single available doc
    val docs = ((1L to 9L).map(i => (i, "en", "a")) ++
        (10L to 13L).map(i => (i, "fr", "b")) ++ Seq((14L, "de", "c")))
      .toDF("doc_id", "lang", "source")
    val sel = TextAnalysis.temperatureSampleOf(docs, budget = 12L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySt = sel.groupBy(t => (t._1, t._2)).view.mapValues(_.length).toMap
    assert(bySt === Map(("en", "a") -> 6, ("fr", "b") -> 4, ("de", "c") -> 1))
    // ranks are contiguous from 1 within each stratum
    assert(sel.filter(_._1 == "en").map(_._4).sorted.toSeq === (1L to 6L))
    // deterministic: an identical second draw returns the identical set
    val again = TextAnalysis.temperatureSampleOf(docs, budget = 12L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(sel.toSeq === again.toSeq)
    // tiny-stratum floor: with a budget so small every quota rounds to 0,
    // each stratum still contributes exactly its guaranteed 1 document
    val floor1 = TextAnalysis.temperatureSampleOf(docs, budget = 1L).collect()
    assert(floor1.length === 3)
  }

  test("t33: the hash-threshold pre-filter draws the identical sample, rescue pass included") {
    import spark.implicits._
    def h(id: Long): Long = (id * 1103515245L + 12345L) % 2147483648L
    // mixed-size strata with ids scattered across the hash space
    val docs = ((1L to 200L).map(i => (i * 977L % 5000L + 1L, "en", "a")) ++
        (1L to 40L).map(i => (i * 661L, "fr", "b")) ++ Seq((7L, "de", "c")))
      .toDF("doc_id", "lang", "source").distinct()
    val direct = TextAnalysis
      .temperatureSampleOf(docs, budget = 30L, preFilterMinStratum = Long.MaxValue)
      .collect().toSeq
    val pre = TextAnalysis
      .temperatureSampleOf(docs, budget = 30L, preFilterMinStratum = 1L)
      .collect().toSeq
    assert(pre === direct, "pre-filtered draw diverged from the direct window")
    // rescue: a stratum built ONLY of ids hashing into the top of the hash
    // space defeats the 8x-margin threshold (every h >= 0.9 * 2^31 while
    // quota 1 of 30 keeps only the bottom 8/30 of the space, so ALL rows
    // are filtered) — the survivor-count check must route it to the
    // unfiltered ranking, not emit an underfilled stratum
    val adversarial = Iterator.iterate(1L)(_ + 1L)
      .filter(id => h(id) >= (2147483648L * 9L) / 10L).take(30).toSeq
    assert(adversarial.forall(id => h(id) >= (2147483648L * 9L) / 10L))
    val docs2 = (adversarial.map(id => (id, "xx", "q")) ++
        (1L to 60L).map(i => (i * 31L, "en", "a"))).toDF("doc_id", "lang", "source")
    val direct2 = TextAnalysis
      .temperatureSampleOf(docs2, budget = 2L, preFilterMinStratum = Long.MaxValue)
      .collect().toSeq
    val pre2 = TextAnalysis
      .temperatureSampleOf(docs2, budget = 2L, preFilterMinStratum = 1L)
      .collect().toSeq
    assert(pre2 === direct2, "rescue pass failed to restore the underfilled stratum")
    assert(pre2.count(_.getString(0) == "xx") > 0, "adversarial stratum lost its guaranteed quota")
  }

  test("p10: inverse-CDF quantiles are type-1 exact under ties, and bucket counts merge exactly") {
    import spark.implicits._
    // n=4 evens: p50 needs cum >= 2 -> 20; p90 needs cum >= ceil(3.6)=4 -> 40
    // ties: [1,1,1,100] -> p50 = 1 (cum(1)=3), p90 = 100
    val gv = (Seq(10L, 20L, 30L, 40L).map(("a", _)) ++
        Seq(1L, 1L, 1L, 100L).map(("b", _))).toDF("g", "v")
    val q = graft.operators.ProfilerOps.quantilesOf(gv, Seq(50, 90, 99))
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, p50, p90, p99) => g -> ((p50, p90, p99)) }.toMap
    assert(q("a") === ((20L, 40L, 40L)))
    assert(q("b") === ((1L, 100L, 100L)))
    // mergeability (the st30 contract): partial bucket counts summed
    // then extracted == extraction over the union
    val part1 = Seq(("a", 10L), ("a", 20L), ("b", 1L)).toDF("g", "v")
      .groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val part2 = Seq(("a", 30L), ("a", 40L), ("b", 1L), ("b", 1L), ("b", 100L))
      .toDF("g", "v").groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val merged = part1.unionByName(part2)
      .groupBy("g", "v").agg(sum(col("cnt")).as("cnt"))
    val qm = graft.operators.ProfilerOps.quantilesOfCounts(merged, Seq(50, 90, 99))
      .as[(String, Long, Long, Long)].collect().toSet
    val qd = graft.operators.ProfilerOps.quantilesOf(gv, Seq(50, 90, 99))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(qm === qd)
  }

  test("p9: MG prefilter loses no heavy hitter even with a sketch far smaller than the vocab") {
    import spark.implicits._
    // 5000 distinct rare words (1×) + two heavy ones — with k=64 ≪
    // vocab the sketch thrashes constantly, but the pigeonhole bound
    // total/(k+1) = 5550/65 ≈ 85 < threshold covers both heavies
    val words = (1 to 5000).map(i => s"rare$i") ++
      Seq.fill(400)("alpha") ++ Seq.fill(150)("beta")
    // deterministic interleave so heavies are spread across partitions
    val ds = spark.createDataset(new util.Random(7).shuffle(words).toSeq)
      .repartition(8)
    // total = 5550, denom 50 → threshold = ceil(5550/50) = 111:
    // alpha(400) and beta(150) qualify, nothing else can
    val hh = ProfilerOps.heavyHittersOf(ds, k = 64, denom = 50L).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(hh.toSeq === Seq(("alpha", 400L), ("beta", 150L)),
      "exact counts, ordered by n desc — and no rare word admitted")
  }

  test("t35: signature estimates track TRUE Jaccard (what a hash-mirroring oracle can't see)") {
    import spark.implicits._
    def gramsOf(m: Map[String, Seq[Int]]) =
      m.toSeq.flatMap { case (s, gs) => gs.map(g => (s, s"gram$g")) }
        .toDF("source", "g")
    // a==b identical, c disjoint from both, d shares 50 of a's 100
    // (|a∪d| = 150 → true J(a,d) = 1/3)
    val fx = Map(
      "a" -> (1 to 100).toSeq,
      "b" -> (1 to 100).toSeq,
      "c" -> (500 to 579).toSeq,
      "d" -> ((1 to 50) ++ (200 to 249)).toSeq)
    val rows = TextAnalysis.sourceSignatureOf(gramsOf(fx)).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(rows.size == 6, "all-pairs matrix, zero-overlap pairs included")
    assert(rows(("a", "b")) == TextAnalysis.SigK.toLong,
      "identical gram sets agree on every component")
    assert(rows(("a", "c")) == 0L && rows(("b", "c")) == 0L,
      "disjoint sets share no component min")
    val estAD = rows(("a", "d")).toDouble / TextAnalysis.SigK
    assert(math.abs(estAD - 1.0 / 3) <= 0.25, s"J(a,d)=1/3, est $estAD")
    // seeded random sources: every pairwise estimate within MinHash
    // noise (K=24 → σ≈0.10; 0.35 ≈ 3.5σ) of the set-arithmetic truth
    val rnd = new scala.util.Random(7)
    val srcs = (0 until 4).map(i =>
      s"s$i" -> (0 until 400).filter(_ => rnd.nextDouble() < 0.5).map(identity)).toMap
    val truth = (for { a <- srcs.keys; b <- srcs.keys if a < b } yield {
      val (sa, sb) = (srcs(a).toSet, srcs(b).toSet)
      (a, b) -> sa.intersect(sb).size.toDouble / sa.union(sb).size
    }).toMap
    val est = TextAnalysis.sourceSignatureOf(gramsOf(srcs)).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(3) / 1e6)).toMap
    truth.foreach { case (k, t) =>
      assert(math.abs(est(k) - t) <= 0.35, s"$k est=${est(k)} true=$t")
    }
  }

  test("st33: per-batch signature mins fold to the one-shot signature, and replay ≡ t35") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, min}
    // min is a semigroup per component: folding batch signatures must be
    // bit-identical to signing the whole corpus at once — the property
    // that makes the Complete-mode streaming state valid.
    val b1 = (1 to 40).map(i => ("a", s"x$i")) ++ (1 to 30).map(i => ("b", s"y$i"))
    val b2 = (41 to 80).map(i => ("a", s"x$i")) ++ (1 to 10).map(i => ("b", s"x$i"))
    val mins = (1 to TextAnalysis.SigK).map(j => min(col(s"m$j")).as(s"m$j"))
    val folded = TextAnalysis.sourceSigFrame(b1.toDF("source", "g"))
      .unionByName(TextAnalysis.sourceSigFrame(b2.toDF("source", "g")))
      .groupBy(col("source")).agg(mins.head, mins.tail: _*)
      .orderBy(col("source")).collect().toSeq
    val oneShot = TextAnalysis.sourceSigFrame((b1 ++ b2).toDF("source", "g"))
      .orderBy(col("source")).collect().toSeq
    assert(folded === oneShot)
    // full replay of the real stream equals the batch gate
    val d = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Streaming.streamSourceSignature(spark, d, "ssig_spec")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val batch = TextAnalysis.sourceSignature(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("p11: lowest value wins count ties; per-group totals partition the input") {
    import spark.implicits._
    // group a: 7 twice, 3 twice (tie → 3 wins), 9 once; group b: single value
    val gv = Seq(("a", 7L), ("a", 3L), ("a", 7L), ("a", 3L), ("a", 9L), ("b", 5L))
      .toDF("g", "v")
    val rows = ProfilerOps.modeOf(gv).orderBy(col("g")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq(("a", 3L, 2L, 3L, 5L), ("b", 5L, 1L, 1L, 1L)))
  }

  test("t37: hand-corpus ratios and testdata invariants (hapax ≤ types ≤ tokens)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t37").toString
    // a: 3 tokens, 2 types, 1 hapax → ttr 2/3, hapax 1/2
    // b: 3 tokens, 3 types, 3 hapax → both ratios exactly 1
    // c: empty text → no vocabulary row at all (never a div-by-zero)
    Seq(("a", "w w b"), ("b", "x y z"), ("c", ""))
      .toDF("source", "text")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.lexicalDiversity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSeq === Seq(
      ("a", 3L, 2L, 1L, 666666L, 500000L),
      ("b", 3L, 3L, 3L, 1000000L, 1000000L)))
    val real = TextAnalysis.lexicalDiversity(spark, d).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(real.nonEmpty)
    real.foreach { case (tok, typ, hap) =>
      assert(hap <= typ && typ <= tok)
    }
  }

  test("p12: planted orphans are counted; clean references report explicit zeros") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val dir = java.nio.file.Files.createTempDirectory("p12").toString
    def w(df: org.apache.spark.sql.DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    w(Seq(0L).toDF("r_regionkey"), "region")
    w(Seq((0L, 0L), (1L, 99L)).toDF("n_nationkey", "n_regionkey"), "nation")
    w(Seq((1L, 0L), (2L, 0L)).toDF("c_custkey", "c_nationkey"), "customer")
    w(Seq((1L, 0L)).toDF("s_suppkey", "s_nationkey"), "supplier")
    w(Seq(1L).toDF("p_partkey"), "part")
    w(Seq((10L, 1L), (11L, 7L)).toDF("o_orderkey", "o_custkey"), "orders")
    w(Seq((10L, 1L, 1L), (99L, 1L, 1L), (10L, 2L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey"), "lineitem")
    val got = ProfilerOps.referentialAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(
      ("customer_nationkey", 0L), ("lineitem_orderkey", 1L),
      ("lineitem_partkey", 1L), ("lineitem_suppkey", 0L),
      ("nation_regionkey", 1L), ("orders_custkey", 1L),
      ("supplier_nationkey", 0L)))
  }

  test("p13: planted FD violations count groups and minimal repairs; holding FDs report zeros; nulls excluded") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val dir = java.nio.file.Files.createTempDirectory("p13").toString
    def w(df: org.apache.spark.sql.DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    // customer: nation 0 → {A, A, B} (1 bad group, 1 repair); nation 1 → {A};
    // a NULL segment row and a NULL nation row must both be invisible
    w(Seq((1L, Option(0L), Option("A")), (2L, Option(0L), Option("A")),
      (3L, Option(0L), Option("B")), (4L, Option(1L), Option("A")),
      (5L, Option(0L), None), (6L, None, Option("Z")))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment"), "customer")
    // lineitem: order 10 → suppliers {1,2,3} (2 repairs); order 11 → {1}
    w(Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 1L), (11L, 1L))
      .toDF("l_orderkey", "l_suppkey"), "lineitem")
    // nation→region HOLDS (explicit zero); orders PK holds; part: brand
    // b1 → {t1, t2} violates, p_partkey→brand holds trivially
    w(Seq((0L, 5L), (1L, 5L)).toDF("n_nationkey", "n_regionkey"), "nation")
    w(Seq((10L, 7L), (11L, 8L)).toDF("o_orderkey", "o_custkey"), "orders")
    w(Seq((1L, "b1", "t1"), (2L, "b1", "t2"), (3L, "b2", "t1"))
      .toDF("p_partkey", "p_brand", "p_type"), "part")
    val got = ProfilerOps.fdAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("customer_nation_to_segment") === ((2L, 1L, 1L)))
    assert(got("lineitem_order_to_supplier") === ((2L, 1L, 2L)))
    assert(got("nation_to_region") === ((2L, 0L, 0L)))
    assert(got("orders_to_custkey") === ((2L, 0L, 0L)))
    assert(got("part_brand_to_type") === ((2L, 1L, 1L)))
    assert(got("part_to_brand") === ((3L, 0L, 0L)))
    // invariants on real data: bad groups ≤ groups, repairs ≥ bad groups
    ProfilerOps.fdAudit(spark, d).collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) >= r.getLong(2))
    }
  }

  test("t39: hand TV matches the closed form; single source is zero; fuzz matches a local recount") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    def run(docs: Seq[(String, String)]): Map[String, (Long, Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("t39").toString
      docs.toDF("source", "text").write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/documents.parquet")
      TextAnalysis.sourceDivergence(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    }
    def localTv(docs: Seq[(String, String)]): Map[String, Long] = {
      val toks = docs.flatMap { case (s, t) =>
        t.trim.split("\\s+").filter(_.nonEmpty).map(s -> _) }
      val csw = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nw = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val ns = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toLong
      ns.map { case (src, nsv) =>
        val num = nw.map { case (w, nwv) =>
          math.abs(csw.getOrElse((src, w), 0L) * n - nwv * nsv) }.sum
        src -> 1000000L * num / (2L * nsv * n)
      }.toMap
    }
    // a: 3×x + 1×y of 8 tokens; b: 4×y. p_a=(3/4,1/4), p=(3/8,5/8)
    // TV(a)=|3/4-3/8|=3/8 → 375000; TV(b)=|0-3/8|... = 3/8 → 375000
    val hand = run(Seq(("a", "x x x y"), ("b", "y y y y")))
    assert(hand("a") === ((4L, 2L, 375000L)))
    assert(hand("b") === ((4L, 1L, 375000L)))
    // one source ⇒ its distribution IS the corpus ⇒ TV exactly 0
    val solo = run(Seq(("only", "p q q r r r")))
    assert(solo("only") === ((6L, 3L, 0L)))
    // seeded fuzz vs the unrestricted local recount (no closed form)
    val rnd = new scala.util.Random(39)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val fuzz = (1 to 24).map { i =>
      (s"s${rnd.nextInt(3)}",
        Seq.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = run(fuzz)
    localTv(fuzz).foreach { case (src, tv) =>
      assert(got(src)._3 === tv, s"source $src")
      assert(tv >= 0L && tv < 1000000L)
    }
  }

  test("p14: the ppm table IS round(log10(1+1/d)*1e6); planted digits count; shares sum to ~1e6") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    // the literal expectation table must be the mathematical one
    ProfilerOps.BenfordPpm.foreach { case (dg, p) =>
      assert(p === math.round(math.log10(1.0 + 1.0 / dg) * 1e6), s"digit $dg")
    }
    assert(ProfilerOps.BenfordPpm.map(_._2).sum === 999999L ||
      ProfilerOps.BenfordPpm.map(_._2).sum === 1000000L)
    // planted prices: leading digits 9, 1, 1, 3 (0.50 → first nonzero is 5)
    val dir = java.nio.file.Files.createTempDirectory("p14").toString
    Seq((1L, 912.34), (2L, 0.50), (3L, 199999.99), (4L, 1.00), (5L, 3.99))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    val got = ProfilerOps.benfordAudit(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got.size === 9)
    assert(got(1L)._1 === 2L && got(3L)._1 === 1L && got(5L)._1 === 1L && got(9L)._1 === 1L)
    assert(got(2L)._1 === 0L && got(2L)._2 === Some(0L), "absent digit: explicit zero share")
    assert(got(1L)._2 === Some(400000L), "2 of 5 → truncating ppm")
    // real data: exactly 9 rows, shares telescope to 1e6 within truncation
    val real = ProfilerOps.benfordAudit(spark, d).collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]).getOrElse(0L)))
    assert(real.length === 9)
    val shareSum = real.map(_._2).sum
    assert(shareSum > 999990L && shareSum <= 1000000L, s"shares sum $shareSum")
  }

  test("t40: the San-Francisco property — continuation counts are type-based, not token-based") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val dir = java.nio.file.Files.createTempDirectory("t40").toString
    // 'francisco' appears 3 times, ALWAYS after 'san' → left_types 1;
    // 'dog' appears twice after DIFFERENT words → left_types 2 beats it
    // despite lower token frequency — the exact KN motivation
    Seq((1L, "san francisco the dog"), (2L, "san francisco a dog"),
      (3L, "san francisco"))
      .toDF("doc_id", "text")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.continuationCounts(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // bigram TYPES: (san,francisco) (francisco,the) (francisco,a)
    // (the,dog) (a,dog) → nb = 5
    assert(got("francisco") === ((1L, 2L, 200000L)))
    assert(got("dog") === ((2L, 0L, 400000L)), "dog follows 2 distinct words, opens none")
    assert(got("san") === ((0L, 1L, 0L)), "sentence-initial only: zero continuations")
    assert(got.size === 5)
    // invariants on real data: Σ left_types = Σ right_types = |types|
    val real = TextAnalysis.continuationCounts(spark, d).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(real.map(_._1).sum === real.map(_._2).sum)
    assert(real.forall { case (l, r) => l >= 0 && r >= 0 })
  }

  test("p15: histogram formula equals the true join count; hot key and nulls handled") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val dir = java.nio.file.Files.createTempDirectory("p15").toString
    def w(df: org.apache.spark.sql.DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    // customer 1 has 3 orders (hot key 1·3), customer 2 has 1; customer 3
    // matches nothing; a NULL custkey order must not join anything
    w(Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("c_custkey", "c_nationkey"), "customer")
    w(Seq(Option(1L), Option(1L), Option(1L), Option(2L), None)
      .toDF("o_custkey").withColumn("o_orderkey",
        org.apache.spark.sql.functions.monotonically_increasing_id()), "orders")
    w(Seq((10L, 1L, 1L)).toDF("l_orderkey", "l_partkey", "l_suppkey"), "lineitem")
    w(Seq(1L).toDF("p_partkey"), "part")
    w(Seq(1L).toDF("s_suppkey"), "supplier")
    w(Seq(0L).toDF("n_nationkey"), "nation")
    val got = ProfilerOps.joinSizeAudit(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("customer_orders") === ((3L, 4L, 4L, 3L)),
      "null key excluded, est = true join rows, hot key = 3")
    // cross-check every row against the actually-executed join
    def tbl(t: String) = spark.read.parquet(s"$dir/$t.parquet")
    val trueCnt = tbl("customer").join(tbl("orders"),
      org.apache.spark.sql.functions.col("c_custkey") ===
        org.apache.spark.sql.functions.col("o_custkey")).count()
    assert(got("customer_orders")._3 === trueCnt)
    // real data: every relationship's estimate equals the executed join
    val real = ProfilerOps.joinSizeAudit(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val li = graft.core.Tables.lineitem(spark, d)
    val actual = graft.core.Tables.part(spark, d).join(li,
      org.apache.spark.sql.functions.col("p_partkey") ===
        org.apache.spark.sql.functions.col("l_partkey")).count()
    assert(real("part_lineitem") === actual)
  }

  test("t38: leakage report equals composing the registered d3 pairs with the t5 split") {
    val pairs = Dedup.minhashLsh(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3) + r.getLong(4)))
    val split = TextAnalysis.trainSplit(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val leaks = pairs.flatMap { case (da, db, inter, tot) =>
      Seq((split(da), split(db), da), (split(db), split(da), db)).collect {
        case ("val", "train", v) => (v, inter, tot)
      }
    }
    val expected = leaks.groupBy(_._1).view.mapValues { xs =>
      (xs.size.toLong, xs.map(t => 2000000L * t._2 / t._3).max)
    }.toMap
    val got = TextAnalysis.splitLeakage(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // every leaked doc is val-side and its similarity is a valid d3 verification
    got.foreach { case (doc, (_, sim)) =>
      assert(split(doc) == "val" && sim >= 666666L && sim <= 1000000L)
    }
  }

  test("t36: first-appearance accounting on a hand corpus; curve invariants on testdata") {
    import spark.implicits._
    // 5 docs → deciles 0,2,4,6,8; doc3 is EMPTY so decile 6 has no token
    // row and must be absent without breaking the running vocabulary
    val docs = Seq(
      (0L, "a b a"), (1L, "a c"), (2L, "c d d"), (3L, ""), (4L, "e a")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.vocabGrowthOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (0L, 3L, 2L, 2L), (2L, 2L, 1L, 3L), (4L, 3L, 1L, 4L), (8L, 2L, 1L, 5L)))
    // corpus invariants: cum_vocab is the non-decreasing running sum
    // ending at the true distinct-word count; tokens partition the corpus
    val curve = TextAnalysis.vocabGrowth(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(curve.map(_._4).toSeq === curve.map(_._3).scanLeft(0L)(_ + _).tail.toSeq)
    val words = graft.core.Tables.documents(spark, d)
      .select(explode(split(trim(coalesce(col("text"), lit(""))), "\\s+")).as("w"))
      .where(col("w") =!= "")
    assert(curve.last._4 === words.distinct().count())
    assert(curve.map(_._2).sum === words.count())
  }
}

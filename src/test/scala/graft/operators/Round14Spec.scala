package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 semantics pins, starting with the x22 OCC commit protocol:
  * exactly-one-winner at a contended version (raced for real across
  * threads), conflict-not-overwrite for a stale writer, loser rebase
  * producing the commuted content, and no-torn-reads through the
  * validating path.
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  private def freshBase(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(tag)
    p.toString
  }

  test("x22 CAS: eight threads race one version — exactly one winner, losers see conflict") {
    val base = freshBase("occ_race")
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Boolean]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        gate.await()
        results.put(i, XmlOps.occTryCommit(base, 5, s"gen_$i"))
      })
    }
    threads.foreach(_.start())
    gate.countDown() // release all racers at once
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val wins = results.asScala.toSeq.filter(_._2)
    assert(wins.size === 1, s"expected exactly one CAS winner, got $wins")
    // the committed content is the WINNER's, complete — never a blend
    val (winner, _) = wins.head
    assert(XmlOps.occHead(base) === Some((5, s"gen_$winner")),
      "head must name exactly the winning generation")
    // no staging debris left behind in the log dir
    val leftovers = new java.io.File(s"$base/_commits").listFiles()
      .map(_.getName).filter(_.startsWith(".tmp_"))
    assert(leftovers.isEmpty, s"staging files leaked: ${leftovers.toSeq}")
  }

  test("x22 protocol: stale writer conflicts, rebases, and the history is linear") {
    val d = "/root/testdata/sf0.001"
    val got = XmlOps.occCommitPublish(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // final content == de deleted AND fr repriced, regardless of race
    // order (the operations commute on disjoint row sets)
    val want = graft.core.Tables.documents(spark, d)
      .where(col("lang") =!= "de")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang") === "fr", col("n_chars") * 2)
          .otherwise(col("n_chars"))).as("sum"))
      .orderBy(col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want, s"committed content drifted: $got vs $want")
    // the log is linear v1..v3 and the STALE prepared generation (B's
    // v1-based reprice, which still contains the de rows A deleted) was
    // never committed: the head must hold zero de rows
    val base = graft.core.LakeDir.scoped(spark, "occ", d)
    assert(XmlOps.occHead(base).map(_._1) === Some(3), "history must be v1,v2,v3")
    val head = XmlOps.occReadCommitted(spark, base)
    assert(head.where(col("lang") === "de").count() === 0L,
      "stale B generation (with resurrected de rows) must never become head")
    // every committed version resolves through the validating read —
    // time travel across the OCC log, no torn generation anywhere
    for (v <- 1 to 3) {
      val gen = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(base, "_commits", s"v$v")), "UTF-8")
      MaterialiseOps.serveValidated(spark, s"$base/$gen").count()
    }
  }

  test("g58: FW-BW labels — one-way bridges don't merge, refinement deletes, tail stays unlabeled") {
    // ring A {1,2,3}, ring B {5,6}, a one-way bridge 3→5 (must NOT merge
    // A and B), and a cycle-free pair 7→8 (7 labels itself; 8 exhausts
    // the round budget and must be ABSENT — the bounded-round refilter)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (5L, 6L), (6L, 5L),
      (3L, 5L), (7L, 8L)).toDF("u", "v")
    val got = MaterialiseOps.sccLabelsOf(edges, MaterialiseOps.SccRounds)
      .orderBy(col("scc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq((1L, 3L, 1L, 3L, 6L), (5L, 2L, 5L, 6L, 11L),
      (7L, 1L, 7L, 7L, 7L)), s"got $got")
  }

  test("g58 bounded semantics: a cycle deeper than BfsMaxDist shatters into singleton pivots") {
    // a 10-ring is ONE true SCC, but depth-4 F∩B from pivot 1 meets only
    // at the pivot itself; after extraction the ring is a path and later
    // pivots are singletons too. This pins that the engine computes the
    // BOUNDED semantics the oracle unrolls — not full Kosaraju — and
    // that each round's walk runs on the FHP-deleted edge set.
    val ring = (1L to 10L).map(i => (i, i % 10 + 1)).toDF("u", "v")
    val got = MaterialiseOps.sccLabelsOf(ring, MaterialiseOps.SccRounds)
      .orderBy(col("scc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L)),
      s"expected three singleton pivot components, got $got")
  }

  test("g58 exhaustion: fewer components than rounds — trailing rounds are vacuous no-ops") {
    val tiny = Seq((1L, 2L), (2L, 1L)).toDF("u", "v")
    val got = MaterialiseOps.sccLabelsOf(tiny, MaterialiseOps.SccRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    // round 1 labels {1,2}; round 2's pivot is min of an EMPTY set →
    // both engines produce nothing more, and the loop exits early
    assert(got === Seq((1L, 2L, 3L)), s"got $got")
  }

  test("x22 commit visibility: a version file is complete the instant it exists") {
    // hard-link semantics: a reader listing the log either sees no v7 or
    // sees v7 with its FULL content — stage-then-link can't surface a
    // half-written pointer. Pin by committing a long generation name and
    // immediately reading it back byte-for-byte.
    val base = freshBase("occ_vis")
    val gen = "gen_" + ("abcd" * 16)
    assert(XmlOps.occTryCommit(base, 7, gen))
    assert(XmlOps.occHead(base) === Some((7, gen)),
      "content must be complete at first visibility")
    // and a SECOND claim of v7 still loses even with identical content
    assert(!XmlOps.occTryCommit(base, 7, gen), "re-claiming a version must conflict")
  }
}

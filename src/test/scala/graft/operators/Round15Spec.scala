package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 semantics pins, opening with the round-14 ADVICE closures:
  * cdcDiffFull's update predicate must compare EVERY carried column, so
  * a lang-only mutation (equal n_chars) still round-trips through
  * apply — the case the x24 fixture never exercises.
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  test("x24: lang-only mutation at equal n_chars is an update, and apply reproduces gen1") {
    val g0 = Seq((1L, "en", 100L), (2L, "fr", 200L), (3L, "de", 300L), (4L, "es", 400L))
      .toDF("doc_id", "lang", "n_chars")
    // doc 2: lang changes, n_chars equal (the ADVICE gap); doc 3: chars
    // change; doc 4: deleted; doc 5: inserted; doc 1: untouched
    val g1 = Seq((1L, "en", 100L), (2L, "pt", 200L), (3L, "de", 333L), (5L, "zh", 500L))
      .toDF("doc_id", "lang", "n_chars")
    val feed = XmlOps.cdcDiffFull(g0, g1)
    val types = feed.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(types === Map(2L -> "update", 3L -> "update", 4L -> "delete", 5L -> "insert"),
      s"change classification drifted: $types")
    val rebuilt = XmlOps.cdcApply(g0, feed)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = g1.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rebuilt === want, s"lang-only mutation lost in round-trip: $rebuilt vs $want")
  }

  test("CommitStore CAS raced across six separate PROCESSES — exactly one winner") {
    // the round-14 verdict gap: the 8-thread x22 race shares one JVM, so
    // it can't distinguish filesystem atomicity from JVM-level exception
    // dispatch. Six java processes share nothing but the directory.
    val base = java.nio.file.Files.createTempDirectory("occ_xproc").toString
    val goFile = s"$base/.go"
    val java17 = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val procs = (0 until 6).map { i =>
      new ProcessBuilder(java17, "-cp", cp, "graft.tools.CommitRacer",
        base, "9", s"gen_$i", goFile)
        .redirectErrorStream(true)
        .start()
    }
    // release all racers at once, then collect exits
    java.nio.file.Files.write(java.nio.file.Paths.get(goFile), Array.emptyByteArray)
    val exits = procs.zipWithIndex.map { case (p, i) =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        s"racer $i hung")
      i -> p.exitValue()
    }
    val winners = exits.filter(_._2 == 0)
    val losers = exits.filter(_._2 == 3)
    assert(winners.size === 1, s"expected exactly one cross-process winner, got $exits")
    assert(losers.size === 5, s"every loser must see a clean CONFLICT, got $exits")
    // the head names exactly the winner's content — complete, never a blend
    assert(XmlOps.occHead(base) === Some((9, s"gen_${winners.head._1}")))
    // and no staging debris survives in the store
    val leftovers = new java.io.File(s"$base/_commits").listFiles()
      .map(_.getName).filter(_.startsWith(".tmp"))
    assert(leftovers.isEmpty, s"staging debris: ${leftovers.toSeq}")
  }
}

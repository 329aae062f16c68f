package graft.operators

import graft.SparkSpec

/** Format-surface properties the roundtrip oracles can't see: x10's
  * compression option must actually reach the files (a silently-ignored
  * writer option would still round-trip losslessly). */
class FormatsSpec extends SparkSpec {

  private def dirBytes(p: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(p))
  }

  test("x10: every codec round-trips AND compresses — smaller files than 'none'") {
    val d = "/root/testdata/sf0.001"
    val rows = XmlOps.codecRoundtrip(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === XmlOps.Codecs.sorted)
    assert(rows.map(t => (t._2, t._3, t._4, t._5)).distinct.length === 1,
      "all codecs must agree on the content stats")
    val none = dirBytes(XmlOps.codecDir(d, "none"))
    for (c <- XmlOps.Codecs if c != "none") {
      val sz = dirBytes(XmlOps.codecDir(d, c))
      assert(sz < none, s"codec $c produced $sz bytes >= uncompressed $none " +
        "— the compression option never reached the files")
    }
  }
}

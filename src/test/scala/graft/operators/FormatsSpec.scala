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

  test("x11: range layout gives disjoint per-file time slices and the pruned read loses nothing") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    // run the registered op once (it writes the layout as a side effect)
    val got = XmlOps.rangeLayout(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sorted.toSeq
    // the layout really is range-partitioned: per-FILE us intervals are
    // pairwise disjoint (this is what lets row-group stats prune)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_range_${math.abs(d.hashCode)}"
    val slices = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(slices.length > 1, "range write should produce multiple files")
    slices.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "file slices overlap")
      case _ =>
    }
    // identity through the layout: the pruned read equals the same
    // filter+aggregate on the original table
    val us = unix_micros(col("ts").cast("timestamp"))
    val b = graft.core.Tables.events(spark, d)
      .select(col("event_id"), col("event_type"), us.as("us"))
    val Array(row) = b.agg(min(col("us")), max(col("us"))).collect()
    val cut = row.getLong(0) + (row.getLong(1) - row.getLong(0)) / 16
    val direct = b.where(col("us") < cut)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("us")).as("min_us"),
        max(col("us")).as("max_us"), min(col("event_id")).as("min_event"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sorted.toSeq
    assert(got === direct, "layout or pruning lost rows")
    assert(got.nonEmpty && got.map(_._2).sum > 0)
  }
}

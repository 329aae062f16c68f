package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  test("asof join: duplicate (key, ts) left rows do not fan out; null keys keep left-outer semantics") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "e1"), (1L, 100L, "e2"),   // duplicate (key, ts)
      (1L, 50L, "e3"),                       // before any right row
      (2L, 100L, "e4"),                      // key with no right rows
      (-1L, 100L, "e5")                      // becomes a null key below
    ).toDF("k", "ts", "tag")
    val leftWithNull = left.withColumn("k", when(col("k") === -1L, lit(null)).otherwise(col("k")))
    val right = Seq((1L, 60L), (1L, 90L), (3L, 10L))
      .toDF("k", "rts").withColumn("v", concat(lit("v"), col("rts")))
    val out = Temporal.asofJoin(leftWithNull, right, "k", "ts", "rts", Seq("v", "rts"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[String]("v"))))
      .toSet
    assert(out == Set(
      ("e1", Some("v90")), ("e2", Some("v90")), // both dup rows match once each
      ("e3", None),                              // nothing at-or-before
      ("e4", None),                              // no right rows for key
      ("e5", None)))                             // null key -> null payload
    assert(Temporal.asofJoin(leftWithNull, right, "k", "ts", "rts", Seq("v")).count() == 5)
  }

  test("forward asof join: earliest right at-or-after, equal-ts inclusive, left-outer") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "e1"),  // rights at 60, 90, 100, 120 -> 100 (equal ts counts)
      (1L, 101L, "e2"),  // -> 120
      (1L, 130L, "e3"),  // nothing at-or-after
      (2L, 10L, "e4")    // key with no right rows
    ).toDF("k", "ts", "tag")
    val right = Seq((1L, 60L), (1L, 90L), (1L, 100L), (1L, 120L))
      .toDF("k", "rts").withColumn("v", concat(lit("v"), col("rts")))
    val out = Temporal.asofJoinForward(left, right, "k", "ts", "rts", Seq("v"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[String]("v")))).toSet
    assert(out === Set(
      ("e1", Some("v100")), ("e2", Some("v120")), ("e3", None), ("e4", None)))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ZOrderL's load-bearing properties: the magic-mask spread equals the
  * naive per-bit interleave (the oracle's formulation), the 31-bit mask
  * keeps codes non-negative, z-sorting gives 2-D box locality, and the
  * expression stays inside WholeStageCodegen (it exists to run once per
  * row of a 100 TB layout job). */
class ZOrderSpec extends SparkSpec {

  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave equals the naive per-bit form; mask keeps codes non-negative") {
    val rnd = new scala.util.Random(12)
    assert(ZOrderL.interleave(0L, 0L) === 0L)
    assert(ZOrderL.interleave(1L, 0L) === 1L)
    assert(ZOrderL.interleave(0L, 1L) === 2L)
    assert(ZOrderL.interleave(3L, 1L) === 7L) // x bits at 0,2; y bit at 1
    for (_ <- 1 to 500) {
      val x = rnd.nextLong().abs
      val y = rnd.nextLong().abs
      val z = ZOrderL.interleave(x, y)
      assert(z === naive(x & 0x7FFFFFFFL, y & 0x7FFFFFFFL))
      assert(z >= 0L, "31-bit mask must keep the code non-negative")
    }
  }

  test("z-sorting gives 2-D box locality: a quadrant is one contiguous code range") {
    // the defining Z-curve property: the box [0,2^k) × [0,2^k) maps to
    // the contiguous code range [0, 4^k) — that is WHY file min/max
    // stats can prune 2-D box filters on a z-sorted layout
    val k = 5
    val inside = for (x <- 0L until (1L << k); y <- 0L until (1L << k))
      yield ZOrderL.interleave(x, y)
    assert(inside.max === (1L << (2 * k)) - 1 && inside.min === 0L)
    assert(inside.toSet.size === inside.size, "interleave must be injective on the box")
    // any point OUTSIDE the box codes outside the range
    assert(ZOrderL.interleave(1L << k, 0L) >= (1L << (2 * k)))
    assert(ZOrderL.interleave(0L, 1L << k) >= (1L << (2 * k)))
  }

  test("the expression runs inside WholeStageCodegen") {
    // a real parquet scan — a local Seq constant-folds to LocalTableScan
    val df = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select(ZOrderL(col("user_id"), col("user_id") + 1).as("z"))
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.linesIterator.exists(l => l.contains("zorder") && l.contains("*(")),
      s"zorder fell out of codegen:\n$executed")
  }
}

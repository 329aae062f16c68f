package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The factored k-means is a library op, not just d9's inline recipe —
  * so seeding must not assume ids start at 0 (ADVICE round 6). */
class KMeansSpec extends SparkSpec {

  test("seed yields k centroids on a non-contiguous, offset id space") {
    import spark.implicits._
    // ids 100, 205, 310, ... — the old `id < k` filter found ZERO of these
    val data = (0 until 12)
      .map(i => (100L + 105L * i, Array.fill(4)(i.toLong + 1)))
      .toDF("id", "qv")
    val (assigned, centroids) = KMeans.fit(data, k = 3, rounds = 1)
    assert(centroids.count() === 3L)
    // every input point is assigned to some cell
    assert(assigned.count() === 12L)
    assert(assigned.where(col("cell").isNull).count() === 0L)
  }

  test("seed on contiguous 0-based ids is unchanged: cells are 0..k-1") {
    import spark.implicits._
    val data = (0 until 10)
      .map(i => (i.toLong, Array.fill(4)(i.toLong)))
      .toDF("id", "qv")
    val cells = KMeans.seed(
      data.withColumn("qq", graft.functions.DotProductL(col("qv"), col("qv"))), 4)
      .select("cell").as[Long].collect().sorted.toSeq
    assert(cells === Seq(0L, 1L, 2L, 3L))
  }
}

package graft.ml

import graft.functions.DotProductL
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer-exact Lloyd's k-means over quantized vectors, entirely as
  * DataFrames (d9's recipe factored for reuse): the model is a k-row
  * centroid frame — never driver state — assignment is a broadcast
  * crossJoin + one row_number argmin window (ties → lower cell id), and
  * the update is one groupBy(cell, dim) integer mean (`div` truncates
  * toward zero on both engines, so every round is engine-exact and an
  * oracle can replay it as chained CTEs).
  *
  * Input `data`: (id: bigint, qv: array<bigint>); centroids seed from the
  * k lowest ids. Each round localCheckpoints the centroid frame (k rows —
  * cheap) so plan size stays O(1) in `rounds`.
  */
object KMeans {

  private def withNorm(df: DataFrame, v: String, n: String): DataFrame =
    df.withColumn(n, DotProductL(col(v), col(v)))

  /** Distance² column between (qv, qq) and (cv, cc) rows. */
  private def dist2: org.apache.spark.sql.Column =
    col("qq") + col("cc") - lit(2L) * DotProductL(col("qv"), col("cv"))

  /** argmin cell per vector against a k-row centroid frame. */
  def assign(data: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(dist2, col("cell"))
    data.crossJoin(broadcast(centroids))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("id"), col("qv"), col("qq"), col("cell"))
  }

  /** One Lloyd update: per-(cell, dim) integer mean, reassembled. Empty
    * cells drop (mirrors the SQL oracle's GROUP BY). */
  def updateCentroids(assigned: DataFrame): DataFrame =
    withNorm(
      assigned.select(col("cell"), posexplode(col("qv")))
        .groupBy("cell", "pos")
        .agg(expr("sum(col) div count(*)").as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cv")),
      "cv", "cc")

  /** Seed centroids: the k lowest ids, cell = id. A TakeOrdered on the id
    * (not a `id < k` filter) so non-contiguous or offset id spaces still
    * yield exactly min(k, |data|) centroids; for 0-based contiguous ids
    * the two are identical, which keeps the d9/p4 oracles byte-stable. */
  def seed(data: DataFrame, k: Int): DataFrame =
    data.orderBy(col("id")).limit(k)
      .select(col("id").as("cell"), col("qv").as("cv"), col("qq").as("cc"))

  /** `rounds` Lloyd updates from the seed, then a final assignment.
    * Returns (assignments, centroids). */
  def fit(raw: DataFrame, k: Int, rounds: Int): (DataFrame, DataFrame) = {
    val data = withNorm(raw.select(col("id"), col("qv")), "qv", "qq")
    var centroids = seed(data, k)
    var r = 0
    while (r < rounds) {
      centroids = graft.core.Iterate.save(updateCentroids(assign(data, centroids)), 0, r)
      r += 1
    }
    (assign(data, centroids), centroids)
  }

  /** Inertia (Σ min dist², exact bigint) of `data` against `centroids` —
    * the per-round fit-quality scalar. */
  def inertia(data: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(dist2, col("cell"))
    data.crossJoin(broadcast(centroids))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .agg(sum(dist2).as("inertia"))
  }
}

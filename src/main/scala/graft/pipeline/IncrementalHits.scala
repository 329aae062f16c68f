package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental HITS under edge insertions — the IVM twin of g55's four
  * mutual-reinforcement matvecs, extending st46's bilinear product rule
  * to an ALTERNATING-TRANSPOSE cascade: with B the directed (c → p)
  * adjacency, the half-step chain a1 = Bᵀ·1, h1 = B·a1, a2 = Bᵀ·h1,
  * h2 = B·a2 grows under ΔB by the same identity at every level,
  *
  *   Δ(M·w) = M'·Δw + ΔM·w_old          (M' = M + ΔM)
  *
  * applied with M alternating between B and Bᵀ — the cascade term pushes
  * this batch's lower-level growth through the WHOLE accumulated graph,
  * the credit term scores walks whose newest step uses a NEW edge
  * against the pre-batch level below. Both terms are sums, so state is
  * additive: per-batch Δ rows (lvl, id, d) in append-only `batch=<id>`
  * partitions (lvl 1..4 = a1, h1, a2, h2); new edges are anti-joined
  * against the accumulated DISTINCT edge set, so a redelivered batch
  * contributes an empty delta at every level (idempotent).
  *
  * Per-batch cost: four Δ-against-graph joins (Σ_Δ deg each) plus four
  * Δ-sized credit joins; the serving read sums deltas per (lvl, id) and
  * restates g55's unpivoted (kind, id, s1, s2) frame.
  *
  * Derivation reference: g55 `MaterialiseOps.hitsScores` (the batch
  * semantics), st46 `IncrementalKatz` (the bilinear discipline this
  * generalises — same-direction A³ chain there, alternating Bᵀ/B here). */
object IncrementalHits {

  private def edgesPath(dir: String) = s"$dir/edges.parquet"
  private def scoresPath(dir: String) = s"$dir/scores.parquet"

  private def exists(s: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(s.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Fold one batch of directed (c, p) pairs into the state. */
  def update(s: SparkSession, dir: String, pairs: DataFrame, batchId: Long): Unit = {
    val prior =
      if (exists(s, edgesPath(dir)))
        s.read.parquet(edgesPath(dir))
          .select(col("c"), col("p"), col("batch").cast("long").as("batch"))
          .where(col("batch") < batchId)
          .select(col("c"), col("p"))
      else
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL("c BIGINT, p BIGINT"))
    val newE = pairs.select(col("c"), col("p")).distinct()
      .join(prior, Seq("c", "p"), "left_anti")
      .localCheckpoint() // written below; never reads its own partition
    newE.write.mode(SaveMode.Overwrite).parquet(s"${edgesPath(dir)}/batch=$batchId")
    val allE = prior.union(newE).localCheckpoint()
    val dE = newE
    val priorS = (
      if (exists(s, scoresPath(dir)))
        s.read.parquet(scoresPath(dir))
          .select(col("lvl"), col("id"), col("d"),
            col("batch").cast("long").as("batch"))
          .where(col("batch") < batchId)
          .groupBy(col("lvl"), col("id")).agg(sum(col("d")).as("sc"))
      else
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "lvl INT, id BIGINT, sc BIGINT"))
      ).localCheckpoint()
    def priorLvl(k: Int): DataFrame =
      priorS.where(col("lvl") === k).select(col("id"), col("sc").as("x"))
    // hub-side scores flow c→p (Bᵀ·w); auth-side scores flow p→c (B·w)
    def toAuth(e: DataFrame, w: DataFrame): DataFrame = e
      .join(w.select(col("id").as("c"), col("x")), Seq("c"))
      .groupBy(col("p").as("id")).agg(sum(col("x")).as("x"))
    def toHub(e: DataFrame, w: DataFrame): DataFrame = e
      .join(w.select(col("id").as("p"), col("x")), Seq("p"))
      .groupBy(col("c").as("id")).agg(sum(col("x")).as("x"))
    // Δa1 = ΔBᵀ·1: the new edges' in-degree contribution
    val d1 = dE.groupBy(col("p").as("id")).agg(count(lit(1)).as("x"))
      .localCheckpoint()
    def step(k: Int, dPrev: DataFrame,
        m: (DataFrame, DataFrame) => DataFrame): DataFrame =
      graft.core.Iterate.save(
        m(allE, dPrev).unionByName(m(dE, priorLvl(k - 1)))
          .groupBy(col("id")).agg(sum(col("x")).as("x")), 0, k)
    val d2 = step(2, d1, toHub)
    val d3 = step(3, d2, toAuth)
    val d4 = step(4, d3, toHub)
    Seq(d1, d2, d3, d4).zipWithIndex
      .map { case (df, i) => df.select(lit(i + 1).as("lvl"), col("id"),
        col("x").as("d")) }
      .reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"${scoresPath(dir)}/batch=$batchId")
  }

  /** The maintained scores — equal to batch g55 on the union of all
    * folded batches. */
  def current(s: SparkSession, dir: String): DataFrame = {
    if (!exists(s, scoresPath(dir)))
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "kind STRING, id BIGINT, s1 BIGINT, s2 BIGINT"))
    val w = s.read.parquet(scoresPath(dir))
      .groupBy(col("lvl"), col("id")).agg(sum(col("d")).as("sc"))
    def lvl(k: Int, n: String): DataFrame =
      w.where(col("lvl") === k).select(col("id"), col("sc").as(n))
    val auth = lvl(1, "s1").join(lvl(3, "s2"), Seq("id"))
      .select(lit("auth").as("kind"), col("id"), col("s1"), col("s2"))
    val hub = lvl(2, "s1").join(lvl(4, "s2"), Seq("id"))
      .select(lit("hub").as("kind"), col("id"), col("s1"), col("s2"))
    auth.unionByName(hub)
  }
}

package graft.core

import org.apache.spark.sql.DataFrame

/** Checkpoint discipline for the engine's long iterative loops (connected
  * components, BPE training, k-NN recall sweeps): per-round
  * `localCheckpoint` truncates lineage cheaply but stores its blocks ON
  * EXECUTORS — non-recomputable, so one lost executor kills a multi-hour
  * run. `reliableEvery > 0` swaps every k-th round's truncation for a
  * RELIABLE `checkpoint` (checkpoint-dir-backed, requires
  * `sparkContext.setCheckpointDir`), bounding replay after a loss to at
  * most k rounds of work. Off by default: the gates run single-JVM where
  * executor loss means the app is gone anyway.
  */
object Iterate {
  def save(df: DataFrame, reliableEvery: Int, round: Int): DataFrame =
    if (reliableEvery > 0 && round % reliableEvery == 0) df.checkpoint()
    else df.localCheckpoint()
}

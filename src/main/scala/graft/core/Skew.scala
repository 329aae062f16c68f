package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew controls (SURVEY §4 "salting for skew"). AQE's runtime
  * skew-join splitting covers sort-merge joins automatically; these are
  * the deterministic, plan-level versions for the cases AQE doesn't reach
  * (skewed aggregation keys; broadcast-ineligible replicated joins) —
  * e.g. the `_refs` hub-node problem where one popular id (a species
  * node) receives a large share of all references.
  */
object Skew {

  /** Two-phase aggregation over a skewed group key: partial-aggregate on
    * (key, salt), then final-aggregate on key. The salt derives from a
    * hash of `saltSource` (NOT rand() — results must be deterministic),
    * so one hot key fans out across `buckets` reducers in phase 1. */
  def saltedCount(df: DataFrame, key: Column, saltSource: Column, buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum(col("__partial")).as("count"))

  /** Replicated ("salted") join for a skewed big side against a small-ish
    * right side that is still too big to broadcast whole: every big row
    * gets a deterministic salt in [0, buckets); the right side is
    * replicated once per bucket, so each hot join key spreads over
    * `buckets` tasks instead of one. */
  def saltedJoin(big: DataFrame, right: DataFrame, key: String,
                 saltSource: Column, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GENERATIONAL id→record store: incremental updates for the sorted K6
  * layout ([[Sinks.writeKvStore]]) without rewriting the store. Each
  * update lands as its own `gen=<n>` directory of key-sorted,
  * range-partitioned parquet (the same row-group-prunable layout as the
  * base store); readers MERGE ON READ by taking each key's row from the
  * highest generation — the LSM contract with parquet files as
  * immutable SSTables and directory names as sequence numbers.
  *
  * Compaction is crash-safe by ordering, not locking: the merged view
  * is first WRITTEN as a new highest generation (readers stay correct
  * at every instant — the new generation dominates by construction),
  * and only then are the older generation directories dropped. A crash
  * between the two steps leaves a correct, merely-uncompacted store.
  *
  * Scale shape: merge-on-read is one window over the key (or, for a
  * point lookup, a per-key max over ≤ #generations row-group-pruned
  * reads); compaction is one sorted rewrite — both shuffle on the key
  * only. Records are (key, value) rows; updates are upserts (the
  * reference rewrites its RocksDB from scratch instead —
  * `grebi_make_rocks/src/main.rs:41-77`). */
object KvGenStore {

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def generations(spark: SparkSession, path: String): Seq[Long] = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong)
      .sorted
  }

  private def writeGen(records: DataFrame, path: String, gen: Long,
                       buckets: Int, maxRecordsPerFile: Long = 0L): Unit = {
    val writer = records.select(col("key"), col("value"))
      .repartitionByRange(buckets, col("key"))
      .sortWithinPartitions("key")
      .write.mode(SaveMode.Overwrite)
    // K9 size-split passthrough: 0 = leave any session-level cap alone
    (if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer).parquet(s"$path/gen=$gen")
    // a new generation changes the store's file set — the serving-path
    // reader cache must not keep the old index (it would serve stale
    // values WITHOUT an error, so the self-heal-on-exception never fires)
    Sinks.kvInvalidate(path)
  }

  /** How many generation directories the store currently holds — what an
    * auto-compaction policy ([[graft.pipeline.Incremental.refreshKv]])
    * checks against its threshold. */
  def generationCount(spark: SparkSession, path: String): Int =
    generations(spark, path).size

  /** Write generation 0 — the full base store. */
  def init(records: DataFrame, path: String, buckets: Int = 32,
           maxRecordsPerFile: Long = 0L): Unit =
    writeGen(records, path, 0L, buckets, maxRecordsPerFile)

  /** Land an update batch (upserts) as the next generation; returns its
    * generation number. */
  def append(records: DataFrame, path: String, buckets: Int = 32): Long = {
    val next = generations(records.sparkSession, path).lastOption.getOrElse(-1L) + 1L
    writeGen(records, path, next, buckets)
    next
  }

  /** The merged current view: latest value per key by generation. A NULL
    * value is a DELETE tombstone — the key is dead as of that generation
    * (how an incremental graph rebuild retires a canonical id whose
    * clique merged away) — so tombstoned keys drop from the view. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("gen").desc)
    spark.read.parquet(path)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("value").isNotNull)
      .select(col("key"), col("value"))
  }

  /** Point lookup under merge-on-read: the key filter row-group-prunes
    * inside every generation's sorted files, so cost is ≤ one row group
    * per generation — compaction exists to keep that factor small. */
  def lookup(spark: SparkSession, path: String, key: String): Option[String] =
    spark.read.parquet(path)
      .where(col("key") === key)
      .orderBy(col("gen").desc)
      .select("value")
      .limit(1)
      .collect().headOption.flatMap(r => Option(r.getString(0)))

  /** Fold all generations into one: write the merged view as the new
    * highest generation FIRST (readers stay correct throughout), then
    * drop the older directories. Returns the surviving generation. */
  def compact(spark: SparkSession, path: String, buckets: Int = 32): Long = {
    val survivor = append(read(spark, path), path, buckets)
    val (f, _) = fs(spark, path)
    generations(spark, path).filter(_ < survivor).foreach { g =>
      f.delete(new org.apache.hadoop.fs.Path(s"$path/gen=$g"), true)
    }
    survivor
  }
}

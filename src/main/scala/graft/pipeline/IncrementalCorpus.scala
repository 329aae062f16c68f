package graft.pipeline

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL corpus decisions: documents arrive in batches (a
  * continuous crawl) and each batch's t13-shaped decision rows
  * (exact_keep, neardup_keep, lang_ok, kept) are computed against a
  * persistent state — WITHOUT recomputing the corpus. Because doc_ids are
  * monotone across batches (the streaming reality), decisions already
  * made never change: an exact/near-dup canonical is the minimum id of
  * its group, and later arrivals only ever have larger ids. That is the
  * property that makes per-batch decisions ≡ a batch rebuild on the
  * union (IncrementalCorpusSpec pins the equivalence).
  *
  * State (all parquet, appended per batch):
  *   - `hashes`: (h, canonical)      — exact-dup content-hash table
  *   - `bands`:  (doc_id, band)      — LSH band index (st8's probe side)
  *   - `sets`:   (doc_id, set, n)    — shingle sets for exact verify
  *
  * Per batch: one broadcastable-or-shuffled join per state table, band
  * keys computed ROW-LOCALLY (Dedup.bandKeysOf), and a batch-local CC
  * over the new verified pairs where any old-connected doc is collapsed
  * into a sentinel node — reachability to ANY smaller id is all the keep
  * bit needs, so old-old topology never has to be consulted. */
object IncrementalCorpus {

  private val Sentinel = "!old!" // '!' < '0': below every padded doc_id

  private def tbl(spark: SparkSession, dir: String, name: String,
                  schema: String): DataFrame = {
    val p = java.nio.file.Paths.get(s"$dir/$name.parquet")
    if (java.nio.file.Files.exists(p)) spark.read.parquet(p.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  private def sanitize(key: String): String =
    key.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Apply one arriving batch; returns its decision rows (also persisted
    * under `$stateDir/decisions.parquet`). `newDocs` needs (doc_id, text,
    * lang). A stable `batchKey` makes the application EXACTLY-ONCE under
    * redelivery (the foreachBatch reality): every state table's batch
    * lands in a deterministic `batch=<key>` partition written with
    * Overwrite — a crashed-and-retried batch replaces its own partial
    * rows — and a marker file, written strictly last, makes a completed
    * batch a no-op (the Incremental.scala ledger pattern). */
  def update(spark: SparkSession, stateDir: String, newDocs: DataFrame,
             batchKey: Option[String] = None): DataFrame = {
    import spark.implicits._
    new java.io.File(stateDir).mkdirs()
    val marker = java.nio.file.Paths.get(
      s"$stateDir/applied_batches/${sanitize(batchKey.getOrElse(""))}")
    if (batchKey.isDefined && java.nio.file.Files.exists(marker)) {
      return spark.read.parquet(s"$stateDir/decisions.parquet")
        .where(col("batch") === sanitize(batchKey.get))
        .select(col("doc_id"), col("exact_keep"), col("neardup_keep"),
          col("lang_ok"), col("kept"))
    }
    val key = sanitize(batchKey.getOrElse(java.util.UUID.randomUUID.toString))
    val docs = newDocs.select(col("doc_id"), col("text"), col("lang"))
      .localCheckpoint() // pin the batch: state tables are rewritten below

    // ---- exact dedup against the hash table
    val stateH = tbl(spark, stateDir, "hashes", "h STRING, canonical BIGINT")
    val withH = docs.select(col("doc_id"), md5(coalesce(col("text"), lit(""))).as("h"))
    val batchMin = withH.groupBy("h").agg(min(col("doc_id")).as("bmin"))
    val exact = withH
      .join(stateH.select(col("h"), lit(1).as("seen")), Seq("h"), "left")
      .join(batchMin, "h")
      .select(col("doc_id"), col("h"),
        when(col("seen").isNotNull, 0)
          .otherwise((col("doc_id") === col("bmin")).cast("int")).as("exact_keep"))

    // ---- near-dup: row-local signatures probe the band index
    val parts = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val sh = Dedup.shinglesOf(t)
        (id, sh, sh.length.toLong, Dedup.bandKeysOf(sh))
      }
      .toDF("doc_id", "set", "n", "bands")
      .localCheckpoint()
    val newBands = parts.select(col("doc_id"), explode(col("bands")).as("band"))
    val newSets = parts.select(col("doc_id"), col("set"), col("n"))
    val stateB = tbl(spark, stateDir, "bands", "doc_id BIGINT, band STRING")
    val stateS = tbl(spark, stateDir, "sets",
      "doc_id BIGINT, set ARRAY<STRING>, n BIGINT")

    // exact candidate verification: a-side sets from `aSets` (state or
    // batch), b-side always the batch
    def verified(cand: DataFrame, aSets: DataFrame): DataFrame = cand
      .join(aSets.select(col("doc_id").as("a_id"), col("set").as("sa"), col("n").as("na")), "a_id")
      .join(newSets.select(col("doc_id").as("b_id"), col("set").as("sb"), col("n").as("nb")), "b_id")
      .where(lit(3) * size(array_intersect(col("sa"), col("sb"))).cast("long")
        >= col("na") + col("nb"))
      .select(col("a_id"), col("b_id"))

    // hot-bucket guard on BOTH candidate joins (Dedup.bandCandidates'
    // rationale): a boilerplate clique in state makes a band bucket with
    // millions of members — probe with its lowest-id members only (they
    // are near-identical, so any one is as good a verify partner), and
    // cap the new-new self-join the same way the batch path does
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band")).orderBy(col("doc_id"))
    val stateBCapped = stateB.withColumn("_rn", row_number().over(wB))
      .where(col("_rn") <= Dedup.HotBucketCap).drop("_rn")
    val candOld = newBands.join(stateBCapped.withColumnRenamed("doc_id", "a_id"), "band")
      .select(col("a_id"), col("doc_id").as("b_id")).distinct()
    val oldConnected = verified(candOld, stateS)
      .select(col("b_id").as("doc_id")).distinct()
    val candNew = Dedup.bandCandidates(newBands, "doc_id")
      .select(col("da").as("a_id"), col("db").as("b_id"))
    val pairsNew = verified(candNew, newSets)

    // keep bit: CC over batch pairs, old-connected collapsed to a node
    // below every real id — keep ⟺ the doc is its component's minimum
    def pad(c: org.apache.spark.sql.Column) = format_string("%020d", c)
    val edges = pairsNew.select(pad(col("a_id")).as("src"), pad(col("b_id")).as("dst"))
      .union(oldConnected.select(pad(col("doc_id")).as("src"), lit(Sentinel).as("dst")))
    val cc = graft.identity.ConnectedComponents.run(edges)
    val nd = docs.select(col("doc_id"))
      .join(cc.withColumnRenamed("member", "m"), pad(col("doc_id")) === col("m"), "left")
      .select(col("doc_id"),
        when(col("component").isNull || col("component") === pad(col("doc_id")), 1)
          .otherwise(0).as("neardup_keep"))

    // ---- language agreement (stateless)
    val lang = docs.select(col("doc_id"), TextAnalysis.langHitCol.as("lang_ok"))

    val decisions = exact.select(col("doc_id"), col("exact_keep"))
      .join(nd, "doc_id").join(lang, "doc_id")
      .select(col("doc_id"), col("exact_keep"), col("neardup_keep"), col("lang_ok"),
        (col("exact_keep") * col("neardup_keep") * col("lang_ok")).as("kept"))
      .localCheckpoint()

    // ---- advance state: each table's batch goes to its own batch=<key>
    // partition with Overwrite (idempotent under retry); hashes only for
    // first-seen content; decisions last, then the marker
    val freshHashes = batchMin
      .join(stateH.select(col("h")), Seq("h"), "left_anti")
      .select(col("h"), col("bmin").as("canonical"))
    def put(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/$t.parquet/batch=$key")
    put(freshHashes, "hashes")
    put(newBands, "bands")
    put(newSets, "sets")
    put(decisions, "decisions")
    if (batchKey.isDefined) {
      java.nio.file.Files.createDirectories(marker.getParent)
      java.nio.file.Files.createFile(marker)
    }
    decisions
  }
}

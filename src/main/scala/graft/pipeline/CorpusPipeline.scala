package graft.pipeline

import graft.core.Tables
import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-cleaning configuration: the rule thresholds a training-data
  * pipeline tunes per corpus (Gopher/Dolma-style bounds composed with the
  * t13 dedup/lang signals). All thresholds are integers — permille rather
  * than float fractions — so decisions replay exactly. */
final case class CorpusConfig(
    name: String = "corpus",
    /** keep documents with `minTokens ≤ n_words ≤ maxTokens` */
    minTokens: Long = 5,
    maxTokens: Long = 100000,
    /** drop when the most repeated bigram exceeds this permille share of
      * all bigram occurrences (Gopher's top-2-gram rule; ignored for
      * documents with no bigram) */
    maxTopBigramPermille: Long = 333,
    /** training-sequence token budget for the packing stage */
    seqBudget: Long = 512,
    /** dendrogram cut driving the SemDeDup stage (d20's operating
      * point): docs dropping under keep-lowest-id at this cut get
      * `sem_keep = 0`; −1 disables the stage (`sem_keep = 1` for all) */
    semdedupCutStep: Long = -1)

/** Everything the corpus build produces, as live DataFrames. */
final case class CorpusBuild(
    /** one row per input doc: every rule flag + the final `kept` */
    decisions: DataFrame,
    /** the kept documents (original columns) */
    cleaned: DataFrame,
    /** kept docs → deterministic content-hash train/val split */
    split: DataFrame,
    /** kept TRAIN docs greedily packed into ≤ seqBudget-token chunks */
    packed: DataFrame)

/** File-driven [[CorpusConfig]] — the corpus-side mirror of
  * [[ConfigLoader.loadSubgraphConfig]]: a JSON document of integer
  * thresholds (`name`, `min_tokens`, `max_tokens`,
  * `max_top_bigram_permille`, `seq_budget`), absent keys defaulting, so a
  * cleaning policy ships as reviewable config rather than code. */
object CorpusConfigLoader {
  def load(path: String): CorpusConfig = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val j = om.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val d = CorpusConfig()
    def long(k: String, default: Long): Long =
      Option(j.get(k)).map(_.asLong).getOrElse(default)
    CorpusConfig(
      name = Option(j.get("name")).map(_.asText).getOrElse(d.name),
      minTokens = long("min_tokens", d.minTokens),
      maxTokens = long("max_tokens", d.maxTokens),
      maxTopBigramPermille = long("max_top_bigram_permille", d.maxTopBigramPermille),
      seqBudget = long("seq_budget", d.seqBudget),
      semdedupCutStep = long("semdedup_cut_step", d.semdedupCutStep))
  }
}

/** The end-to-end corpus build — [[GraftPipeline]]'s analog for the
  * LLM-training-data layer: one Spark DAG
  * `documents → (dedup ∥ lang-id ∥ repetition signals) → decision →
  * (cleaned ∥ split ∥ packed)` where every stage is one of the
  * oracle-gated operators (t13's exact/near-dup/lang conjunction, t10's
  * repetition counters, t5's hash split, t17's packing fold), composed by
  * equi-joins on doc_id. Signals stay visible in `decisions` so a curator
  * can audit WHY a document dropped — the same provenance principle as
  * the graph side's merged-node datasources.
  *
  * Scale shape: every join is on doc_id (or source for packing); no
  * stage is all-pairs; the near-dup component inside t13 is the banded
  * LSH path. The only sequential folds are per-source packing partitions.
  */
object CorpusPipeline {

  def run(s: SparkSession, dir: String, config: CorpusConfig = CorpusConfig()): CorpusBuild = {
    import s.implicits._
    val docs = Tables.documents(s, dir)

    // rule signals (t10) + dedup/lang signals (t13)
    val rep = TextAnalysis.repetition(s, dir)
      .select(col("doc_id"), col("n_words"), col("n_bigrams"), col("top_bigram"))
    val filt = TextAnalysis.corpusFilter(s, dir)

    // SemDeDup stage at the configured dendrogram cut (d20's operating
    // point wired into the build); off ⇒ a constant-1 flag so decisions
    // stay schema-stable and auditable either way
    val semKeep =
      if (config.semdedupCutStep >= 0)
        docs.select(col("doc_id"))
          .join(graft.operators.Dedup
              .semdedupDropSet(s, dir, config.semdedupCutStep.toInt)
              .withColumn("_drop", lit(1)),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("_drop").isNotNull, 0).otherwise(1).as("sem_keep"))
      else docs.select(col("doc_id"), lit(1).as("sem_keep"))

    val decisions = filt.join(rep, "doc_id").join(semKeep, "doc_id")
      .withColumn("len_ok",
        (col("n_words") >= config.minTokens &&
          col("n_words") <= config.maxTokens).cast("int"))
      .withColumn("rep_ok",
        (col("n_bigrams") === 0L ||
          col("top_bigram") * 1000L <= col("n_bigrams") * config.maxTopBigramPermille)
          .cast("int"))
      .withColumn("kept",
        col("kept") * col("len_ok") * col("rep_ok") * col("sem_keep"))
      .select(col("doc_id"), col("exact_keep"), col("neardup_keep"),
        col("lang_ok"), col("len_ok"), col("rep_ok"), col("sem_keep"), col("kept"))

    val keptIds = decisions.where(col("kept") === 1).select(col("doc_id"))
    val cleaned = docs.join(keptIds, "doc_id")
    val split = TextAnalysis.trainSplit(s, dir).join(keptIds, "doc_id")
    val trainIds = split.where(col("split") === "train").select(col("doc_id"))
    val packed = packSequences(
      cleaned.join(trainIds, "doc_id")
        .select(col("source"), col("doc_id"),
          size(org.apache.spark.sql.functions.split(trim(col("text")), "\\s+"))
            .cast("long").as("tokens")),
      config.seqBudget)
    CorpusBuild(decisions, cleaned, split, packed)
  }

  /** Greedy per-source sequence packing over (source, doc_id, tokens) —
    * t17's fold, reusable over any pre-filtered doc set. A new chunk
    * starts when the budget would overflow; an oversize doc gets its own
    * chunk. The scale unit is the source: each source's docs pack in
    * doc_id order inside one partition. */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("source"), col("doc_id"), col("tokens"))
      .repartition(col("source"))
      .sortWithinPartitions(col("source"), col("doc_id"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curSrc: String = null
        var chunk = 0L
        var acc = 0L
        it.map { case (src, id, tok) =>
          if (src != curSrc) { curSrc = src; chunk = 0L; acc = tok }
          else if (acc + tok > budget) { chunk += 1; acc = tok }
          else acc += tok
          (src, chunk, id, tok)
        }
      }
      .toDF("source", "chunk", "doc_id", "tokens")
      .groupBy(col("source"), col("chunk"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("chunk"))
  }

  /** Persist the corpus artifacts: cleaned corpus + split + packed
    * manifest as parquet, and a one-document stats JSON (counts only —
    * bounded driver-side, the corpus summary.json). */
  def write(build: CorpusBuild, outDir: String): Unit = {
    build.decisions.write.mode(SaveMode.Overwrite).parquet(s"$outDir/decisions.parquet")
    build.cleaned.write.mode(SaveMode.Overwrite).parquet(s"$outDir/cleaned.parquet")
    build.split.write.mode(SaveMode.Overwrite).parquet(s"$outDir/split.parquet")
    build.packed.write.mode(SaveMode.Overwrite).parquet(s"$outDir/packed.parquet")
    val n = build.decisions.count()
    val kept = build.decisions.where(col("kept") === 1).count()
    val train = build.split.where(col("split") === "train").count()
    val chunks = build.packed.count()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/corpus_summary.json"),
      s"""{"n_docs":$n,"n_kept":$kept,"n_train":$train,"n_chunks":$chunks}""")
  }
}

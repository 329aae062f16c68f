package graft.pipeline

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture policy: how a multi-source training mix is allocated and cut
  * into sequences. All integers (the CorpusConfig contract) so the same
  * policy file replays to the same mix anywhere. */
final case class MixtureConfig(
    name: String = "mixture",
    /** total document budget across sources, split by t19's
      * temperature-weighted allocator (weight = ⌊√n⌋, α = 0.5) */
    budget: Long = 100000,
    /** training-sequence token budget for the packing stage (t17) */
    seqBudget: Long = 512,
    /** explicit per-source quota overrides — a curator's pin ("never
      * more than N docs of source X, whatever the allocator says", or a
      * manual up-weight) that replaces the computed quota for the named
      * sources only */
    perSourceQuota: Map[String, Long] = Map.empty)

/** File-driven [[MixtureConfig]] — same JSON-of-integer-thresholds shape
  * as [[CorpusConfigLoader]]: keys `name`, `budget`, `seq_budget`, plus
  * an optional `per_source_quota` object of source → quota pins; absent
  * keys defaulting, so a sampling policy ships as reviewable config. */
object MixtureConfigLoader {
  def load(path: String): MixtureConfig = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val j = om.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val d = MixtureConfig()
    def long(k: String, default: Long): Long =
      Option(j.get(k)).map(_.asLong).getOrElse(default)
    val overrides = Option(j.get("per_source_quota")).map { o =>
      import scala.jdk.CollectionConverters._
      o.properties().asScala.map(e => e.getKey -> e.getValue.asLong).toMap
    }.getOrElse(Map.empty[String, Long])
    MixtureConfig(
      name = Option(j.get("name")).map(_.asText).getOrElse(d.name),
      budget = long("budget", d.budget),
      seqBudget = long("seq_budget", d.seqBudget),
      perSourceQuota = overrides)
  }
}

/** Everything the mixture build produces, as live DataFrames. */
final case class MixtureBuild(
    /** per source: n_docs, weight, quota (t19's allocator at `budget`) */
    quotas: DataFrame,
    /** the admitted documents: lowest `quota` doc_ids per source with
      * their token counts (st9's admission rule in batch form) */
    admitted: DataFrame,
    /** admitted docs greedily packed into ≤ seqBudget-token chunks
      * (t17's per-source fold) */
    packed: DataFrame,
    /** repetition-aware admission: (source, doc_id, epoch) rows totalling
      * EXACTLY quota per source even when quota exceeds unique supply
      * ([[MixturePipeline.admitEpochs]]) */
    epochs: DataFrame)

/** The config-driven MIXTURE pipeline: t19's temperature-weighted source
  * quotas + st9's per-source admission + t17's sequence packing composed
  * into one Spark DAG `documents → quotas → admit → pack`. This is the
  * sampling side of corpus curation the way [[CorpusPipeline]] is the
  * cleaning side: CorpusPipeline decides WHICH documents are usable,
  * MixturePipeline decides HOW MANY of each source enter the mix and how
  * they cut into training sequences.
  *
  * Scale shape: quotas are one groupBy + a one-row broadcast; admission
  * is one row_number window per source partition (identical decisions to
  * the streaming st9 admission — MixturePipelineSpec pins batch ≡
  * stream); packing is the secondary-sort fold, parallel by source. No
  * stage is all-pairs; nothing driver-side. */
object MixturePipeline {

  /** t19's allocator against an explicit budget: weight = ⌊√n_docs⌋,
    * quota = (budget·weight) div Σweight. */
  def quotas(docs: DataFrame, budget: Long): DataFrame = {
    val bySrc = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val tot = bySrc.agg(sum(col("weight")).as("wsum"))
    bySrc.crossJoin(broadcast(tot))
      .withColumn("quota", expr(s"($budget * weight) div wsum"))
      .select(col("source"), col("n_docs"), col("weight"), col("quota"))
  }

  /** Admit the lowest-id `quota` documents of each source — st9's
    * streaming admission rule in batch form (the spec pins the
    * equivalence). `docs` needs (source, doc_id); extra columns ride
    * along. `quotasDf` needs (source, quota). */
  def admit(docs: DataFrame, quotasDf: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs.join(quotasDf.select(col("source"), col("quota")), "source")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= col("quota"))
      .drop("quota")
  }

  /** Repetition-aware admission — the data-constrained regime
    * (Muennighoff et al.-style epoching): when a source's quota EXCEEDS
    * its unique supply, the mix repeats documents across epochs instead
    * of silently capping at what's available. Every doc of the source
    * gets `quota div n_docs` full-epoch copies and the lowest
    * `quota mod n_docs` doc_ids one more, so the emitted (source,
    * doc_id, epoch) rows total EXACTLY quota per source — and when quota
    * ≤ supply this degenerates to [[admit]]'s doc set with epoch = 1
    * (full_epochs = 0, remainder = quota). One window + one row-local
    * explode; nothing all-pairs, nothing driver-side. */
  def admitEpochs(docs: DataFrame, quotasDf: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs.select(col("source"), col("doc_id"))
      .join(quotasDf.select(col("source"), col("quota"), col("n_docs")), "source")
      .withColumn("rank", row_number().over(w))
      .withColumn("copies",
        expr("quota div n_docs") +
          (col("rank") <= expr("quota % n_docs")).cast("long"))
      // Spark's sequence(1, 0) would DESCEND — guard before exploding
      .where(col("copies") > 0)
      .select(col("source"), col("doc_id"),
        explode(sequence(lit(1L), col("copies"))).as("epoch"))
  }

  /** Apply a policy's explicit per-source pins over the computed quotas
    * (the pin wins for its source; everyone else keeps the allocator's
    * number). The override map is config-sized — a broadcast dim. */
  def applyOverrides(quotasDf: DataFrame,
                     overrides: Map[String, Long]): DataFrame =
    if (overrides.isEmpty) quotasDf
    else {
      val s = quotasDf.sparkSession
      import s.implicits._
      val o = overrides.toSeq.toDF("source", "pin")
      quotasDf.join(broadcast(o), Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("weight"),
          coalesce(col("pin"), col("quota")).as("quota"))
    }

  /** The per-document token column every mixture entry point derives —
    * ONE definition so the batch run, the incremental state and the spec
    * fixtures can never drift. */
  def tokensOf(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("tokens"))

  /** The full build over an explicit (source, doc_id, tokens) frame —
    * the composition [[run]] and [[IncrementalMixture]] share. */
  def runOn(docs: DataFrame,
            config: MixtureConfig = MixtureConfig()): MixtureBuild = {
    val q = applyOverrides(quotas(docs, config.budget), config.perSourceQuota)
    val admitted = admit(docs, q)
    val packed = CorpusPipeline.packSequences(
      admitted.select(col("source"), col("doc_id"), col("tokens")),
      config.seqBudget)
    MixtureBuild(q, admitted, packed, admitEpochs(docs, q))
  }

  def run(s: SparkSession, dir: String,
          config: MixtureConfig = MixtureConfig()): MixtureBuild =
    runOn(tokensOf(Tables.documents(s, dir)), config)

  /** Persist the mixture artifacts + a bounded one-document stats JSON. */
  def write(build: MixtureBuild, outDir: String): Unit = {
    build.quotas.write.mode(SaveMode.Overwrite).parquet(s"$outDir/quotas.parquet")
    build.admitted.write.mode(SaveMode.Overwrite).parquet(s"$outDir/admitted.parquet")
    build.packed.write.mode(SaveMode.Overwrite).parquet(s"$outDir/packed.parquet")
    build.epochs.write.mode(SaveMode.Overwrite).parquet(s"$outDir/epochs.parquet")
    val sources = build.quotas.count()
    val admitted = build.admitted.count()
    val chunks = build.packed.count()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/mixture_summary.json"),
      s"""{"n_sources":$sources,"n_admitted":$admitted,"n_chunks":$chunks}""")
  }
}

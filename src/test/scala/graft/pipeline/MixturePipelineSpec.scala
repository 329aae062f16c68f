package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mixture pipeline's contracts: its allocator IS t19, its admission
  * IS st9's streaming rule (batch ≡ stream on the same quota), and the
  * policy file round-trips. */
class MixturePipelineSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("batch admission reproduces the streaming st9 quota admission") {
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("source"), col("doc_id"))
    import spark.implicits._
    val fixed = docs.select(col("source")).distinct()
      .withColumn("quota", lit(10L))
    val batch = MixturePipeline.admit(docs, fixed)
      .select(col("source"), col("rank").cast("long"), col("doc_id"))
      .collect().map(_.toSeq).toSet
    val streamed = graft.streaming.Streaming
      .streamQuotaAdmit(spark, d, "t_mixture_admit", quota = 10)
      .select(col("source"), col("rank").cast("long"), col("doc_id"))
      .collect().map(_.toSeq).toSet
    assert(batch === streamed)
    assert(batch.nonEmpty)
  }

  test("streaming mixture admission equals the batch admit on the same policy") {
    val docs = graft.core.Tables.documents(spark, d)
    val batch = MixturePipeline
      .admit(docs.select(col("source"), col("doc_id")),
        MixturePipeline.quotas(docs, budget = 300))
      .select(col("source"), col("rank").cast("long"), col("doc_id"))
      .collect().map(_.toSeq).toSet
    val streamed = graft.streaming.Streaming
      .streamMixtureAdmit(spark, d, "t_mixture_stream", budget = 300)
      .select(col("source"), col("rank").cast("long"), col("doc_id"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("quotas at the default budget equal the t19 gate") {
    val q = MixturePipeline.quotas(
      graft.core.Tables.documents(spark, d), budget = 100000L)
      .orderBy(col("source")).collect().map(_.toSeq).toSeq
    val t19 = graft.operators.TextAnalysis.mixtureWeights(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(q === t19)
  }

  test("per-source quota pins override the allocator for the named sources only") {
    val docs = graft.core.Tables.documents(spark, d)
    val firstSource = docs.select("source").orderBy("source").head().getString(0)
    val f = java.nio.file.Files.createTempFile("mixture_pin", ".json")
    java.nio.file.Files.writeString(f,
      s"""{"budget":300,"per_source_quota":{"$firstSource":2}}""")
    val cfg = MixtureConfigLoader.load(f.toString)
    assert(cfg.perSourceQuota === Map(firstSource -> 2L))
    val build = MixturePipeline.run(spark, d, cfg)
    val byabc = build.admitted.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byabc(firstSource) === 2L, "the pinned source admits exactly its pin")
    // an unpinned source keeps the allocator's quota
    val unpinned = build.quotas.where(col("source") =!= firstSource)
      .orderBy("source").head()
    assert(byabc(unpinned.getString(0)) <= unpinned.getAs[Long]("quota"))
    assert(byabc(unpinned.getString(0)) > 2L, "unpinned sources follow sqrt allocation")
  }

  test("policy file round-trips; absent keys default; quotas bind end-to-end") {
    val f = java.nio.file.Files.createTempFile("mixture", ".json")
    java.nio.file.Files.writeString(f, """{"name":"tiny","budget":300}""")
    val cfg = MixtureConfigLoader.load(f.toString)
    assert(cfg === MixtureConfig(name = "tiny", budget = 300, seqBudget = 512))
    val build = MixturePipeline.run(spark, d, cfg)
    val admitted = build.admitted.count()
    val total = graft.core.Tables.documents(spark, d).count()
    assert(admitted < total, "a 300-doc budget must actually reject documents")
    assert(admitted > 0)
    // every source respects its quota
    val over = build.admitted.groupBy("source").count()
      .join(build.quotas, "source")
      .where(col("count") > col("quota")).count()
    assert(over === 0L)
  }

  test("over-subscribed sources epoch to exactly quota; under-subscribed degenerate to admit") {
    val docs = graft.core.Tables.documents(spark, d).select(col("source"), col("doc_id"))
    // budget far above supply: every source's quota exceeds its unique
    // docs, so admission must REPEAT across epochs, not cap
    val qOver = MixturePipeline.quotas(docs, 10000L)
    assert(qOver.where(col("quota") <= col("n_docs")).count() === 0L,
      "fixture regression: budget no longer over-subscribes")
    val emitted = MixturePipeline.admitEpochs(docs, qOver)
      .groupBy("source").agg(count(lit(1)).as("n"), max(col("epoch")).as("max_epoch"))
      .join(qOver, "source")
    assert(emitted.where(col("n") =!= col("quota")).count() === 0L,
      "per-source emissions must total exactly quota")
    assert(emitted.where(col("max_epoch") < 2).count() === 0L)

    // a binding-but-not-over-subscribed budget: epochs reduce to admit's
    // doc set, every row epoch 1
    val qUnder = MixturePipeline.quotas(docs, 300L)
    val ep = MixturePipeline.admitEpochs(docs, qUnder)
    assert(ep.where(col("epoch") =!= 1L).count() === 0L)
    val admitIds = MixturePipeline.admit(docs, qUnder)
      .select("source", "doc_id").collect().toSet
    assert(ep.select("source", "doc_id").collect().toSet === admitIds)
  }

  test("incremental mixture: update;update equals the union build, retires retroactively, replays idempotently") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("inc_mix").toString
    val cfg = MixtureConfig(budget = 4, seqBudget = 64)
    // A: X has 4 docs (w=2), Y one (w=1) → quotas X=2, Y=1
    val a = Seq(("X", 1L, "one two"), ("X", 2L, "three"), ("X", 3L, "four"),
      ("X", 4L, "five"), ("Y", 10L, "six")).toDF("source", "doc_id", "text")
    // B floods Y (n=9, w=3) → quotas become X=1, Y=2: X's doc 2 retires
    val b = (11L to 18L).map(i => ("Y", i, s"doc $i"))
      .toDF("source", "doc_id", "text")
    def ids(build: MixtureBuild) =
      build.admitted.select("source", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val first = IncrementalMixture.update(spark, dir, a, cfg, Some("b1"))
    assert(ids(first) === Set(("X", 1L), ("X", 2L), ("Y", 10L)))
    val second = IncrementalMixture.update(spark, dir, b, cfg, Some("b2"))
    assert(!ids(second).contains(("X", 2L)),
      "the shrunken quota must retire the earlier admission")
    // every artifact equals the one-shot build on A ∪ B
    val union = MixturePipeline.runOn(MixturePipeline.tokensOf(a.union(b)), cfg)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(second.quotas) === rows(union.quotas))
    assert(rows(second.admitted) === rows(union.admitted))
    assert(rows(second.epochs) === rows(union.epochs))
    assert(rows(second.packed) === rows(union.packed))
    // redelivery of a completed batch is a no-op
    val replay = IncrementalMixture.update(spark, dir, b, cfg, Some("b2"))
    assert(rows(replay.admitted) === rows(second.admitted))
    // and the state-only view agrees
    assert(rows(IncrementalMixture.currentBuild(spark, dir, cfg).admitted)
      === rows(second.admitted))
  }
}

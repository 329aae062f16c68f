package graft

import org.apache.spark.sql.functions._

/** Whole-stage-codegen FALLBACK guard for the pipeline hot paths: with
  * `spark.sql.codegen.fallback=false`, a generated `processNext()` that
  * fails to compile (janino `InternalCompilerException`, e.g. "Code
  * grows beyond 64 KB" from expression-subtree duplication across
  * collapsed broadcast-join spans) FAILS the query instead of silently
  * running interpreted — so a regression that would de-optimize the
  * corpus pipeline at scale turns a green test red here. This is the
  * regression net for the round-6 finding where `langPredictedCol`'s
  * when-chain form blew the 64 KB method limit inside
  * `CorpusPipeline.run`'s collapsed span. */
class CodegenGuardSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def withNoFallback[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("corpus pipeline compiles end-to-end — no interpreted fallback") {
    withNoFallback {
      val b = graft.pipeline.CorpusPipeline.run(spark, d)
      // the cross-flag conjunction is the historical blow-up shape: it
      // references every flag column through the collapsed span
      assert(b.decisions.where(col("kept") =!=
        col("exact_keep") * col("neardup_keep") * col("lang_ok")
          * col("len_ok") * col("rep_ok") * col("sem_keep")).count() === 0L)
      assert(b.cleaned.count() > 0)
      assert(b.split.count() > 0)
      assert(b.packed.count() > 0)
    }
  }

  test("mixture pipeline compiles end-to-end — no interpreted fallback") {
    withNoFallback {
      val b = graft.pipeline.MixturePipeline.run(spark, d)
      assert(b.admitted.count() > 0)
      assert(b.packed.count() > 0)
    }
  }

  test("lang-id and corpus filter compile standalone") {
    withNoFallback {
      assert(graft.operators.TextAnalysis.langId(spark, d).count() > 0)
      assert(graft.operators.TextAnalysis.corpusFilter(spark, d).count() > 0)
    }
  }

  test("column-native materialise path compiles — no interpreted fallback") {
    // round 16: assertions/metadata went column-native with the custom
    // QualifiersJson expression in the span — a codegen regression there
    // would silently de-optimize every edge/refs pass at scale
    withNoFallback {
      assert(graft.operators.MaterialiseOps.edgeMaterialise(spark, d).count() > 0)
      assert(graft.operators.MaterialiseOps.refsExploded(spark, d).count() > 0)
    }
  }
}

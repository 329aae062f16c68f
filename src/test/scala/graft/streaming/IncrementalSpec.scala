package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Incremental ingest semantics: a checkpointed file stream must process
  * each file exactly once across restarts — the property that turns the
  * reference's full-rebuild batch pipeline into an incremental one. */
class IncrementalSpec extends SparkSpec {

  test("checkpointed AvailableNow stream resumes exactly-once across restarts") {
    val src = Files.createTempDirectory("inc_src")
    val ckpt = Files.createTempDirectory("inc_ckpt").toString
    val out = Files.createTempDirectory("inc_out").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = Paths.get("/root/testdata/sf0.001/events.parquet")
    Files.copy(events, src.resolve("batch1.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(src.toString).schema
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src.toString)
        .writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      q.stop()
    }

    runOnce()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == spark.read.parquet(src.toString + "/batch1.parquet").count())

    // restart with NO new files: nothing reprocessed
    runOnce()
    assert(spark.read.parquet(out).count() == n1)

    // add a second file (same content, new name): only the new file lands
    Files.copy(events, src.resolve("batch2.parquet"), StandardCopyOption.REPLACE_EXISTING)
    runOnce()
    assert(spark.read.parquet(out).count() == 2 * n1)
  }

  test("st26/st28 fail loudly when lineitem.parquet is a directory, not a file") {
    // the glob-based stream would silently read nothing (and a multi-file
    // table could split an order across batches) — the precondition must
    // throw at construction instead
    val d = Files.createTempDirectory("li_dir")
    Files.createDirectory(d.resolve("lineitem.parquet"))
    // non-empty: a directory-of-part-files table (the hazardous layout);
    // an EMPTY directory table is admissible — no orders to split
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/lineitem.parquet"),
      d.resolve("lineitem.parquet").resolve("part-00000.parquet"))
    val state = Files.createTempDirectory("li_state").toString
    val e = intercept[IllegalArgumentException] {
      graft.streaming.Streaming.streamTriangleCount(spark, d.toString, state)
    }
    assert(e.getMessage.contains("order-atomic"))
    val e2 = intercept[IllegalArgumentException] {
      graft.streaming.Streaming.streamTrianglesSampled(spark, d.toString, state)
    }
    assert(e2.getMessage.contains("order-atomic"))
  }
}

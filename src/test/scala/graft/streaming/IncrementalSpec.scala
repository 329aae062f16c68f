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
}

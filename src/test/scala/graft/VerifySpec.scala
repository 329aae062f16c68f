package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** The round-9 postmortem gate: one pathological query must cost the
  * correctness sweep ONE red row, never the whole artifact (g30's
  * nested-loop hang turned CORRECTNESS_r09.json into `{}`). */
class VerifySpec extends SparkSpec {

  test("watchdog: a hanging query times out as one err entry; the rest of the sweep completes") {
    val out = Files.createTempDirectory("verify_watchdog").toString
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(5).toDF("n")
    // every task sleeps far past the timeout — interruptOnCancel stops it
    val hang: (SparkSession, String) => DataFrame = (s, _) => {
      import s.implicits._
      s.range(4).mapPartitions { it => Thread.sleep(600000); it }.toDF("n")
    }
    val after: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("m")
    val errs = Verify.runSweep(spark, "unused", out,
      Seq("ok_before" -> good, "hangs" -> hang, "ok_after" -> after),
      timeoutSec = 5)
    assert(errs.keySet === Set("hangs"))
    assert(errs("hangs").contains("TIMEOUT"))
    // the sweep continued: both healthy dumps landed
    assert(spark.read.parquet(s"$out/ok_before").count() === 5L)
    assert(spark.read.parquet(s"$out/ok_after").count() === 3L)
    // and the error is machine-readable for the driver
    val ej = Files.readString(Paths.get(s"$out/errors.json"))
    assert(ej.contains("\"hangs\"") && ej.contains("TIMEOUT"))
  }

  test("watchdog: a DRIVER-side hang times out, and the fence blocks the zombie's late jobs") {
    val out = Files.createTempDirectory("verify_fence").toString
    // hangs in plan/driver code (no Spark job submitted), swallows the
    // watchdog's interrupt, then tries to run its query anyway — the
    // worst case: a zombie thread submitting work AFTER its red row was
    // recorded. cancelJobGroupAndFutureJobs must fence that job out.
    val stubborn: (SparkSession, String) => DataFrame = (s, _) => {
      try new java.util.concurrent.CountDownLatch(1).await() // driver-side hang
      catch { case _: InterruptedException => () }
      s.range(7).toDF("z")
    }
    val after: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("m")
    val errs = Verify.runSweep(spark, "unused", out,
      Seq("stubborn" -> stubborn, "ok_after" -> after), timeoutSec = 3)
    assert(errs.keySet === Set("stubborn"))
    assert(errs("stubborn").contains("TIMEOUT"))
    // no pool starvation: the query after the driver-side hang ran
    assert(spark.read.parquet(s"$out/ok_after").count() === 3L)
    // give the interrupted zombie ample time to attempt its write; the
    // fenced job group must never produce a committed output
    Thread.sleep(10000)
    assert(!Files.exists(Paths.get(s"$out/stubborn/_SUCCESS")),
      "zombie thread committed output after its timeout was recorded")
  }

  test("registry sanity: no null oracle SQL or query fn (object-init-order guard)") {
    // a QueryDef registered above the val holding its SQL captures
    // Some(null) at object init and NPEs the whole oracle dump — caught
    // live with t33; this pins the entire registry
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql != null && sql.nonEmpty, s"$k has null/empty oracle SQL")
    }
    SparkEntry.queries.foreach { case (k, fn) =>
      assert(fn != null, s"$k has a null query fn")
    }
  }

  test("a failing (non-hanging) query records its message and does not stop the sweep") {
    val out = Files.createTempDirectory("verify_fail").toString
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("synthetic failure")
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(2).toDF("n")
    val errs = Verify.runSweep(spark, "unused", out,
      Seq("boom" -> boom, "ok" -> good), timeoutSec = 60)
    assert(errs.keySet === Set("boom"))
    assert(errs("boom").contains("synthetic failure"))
    assert(spark.read.parquet(s"$out/ok").count() === 2L)
  }
}

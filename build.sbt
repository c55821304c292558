ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "janusspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The round driver parses ONE JSON line from `sbt "runMain graft.Bench"`
// stdout. Two sbt defaults broke that parse in every round to date
// (BENCH_rNN.json: "parsed": null since r01): forked run output was
// routed through sbt's logger, prefixing every line — including the
// bench's JSON — with "[info] ", and the "[success] Total time" banner
// trailed it as the final stdout line. Pass forked output through
// verbatim and drop the banner so the bench's own JSON line is the
// last thing on stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// TaskRetrySpec injects a REAL first-attempt task failure, so it needs
// task retries (local[4, 2]); every other suite must run at
// maxFailures=1 so a genuinely flaky first attempt FAILS the suite
// instead of being silently retried and hidden. One SparkSession per
// JVM → the chaos suite gets its own forked JVM with the retry flag.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val base = (Test / javaOptions).value.toVector
  def group(name: String, ts: Seq[TestDefinition], opts: Vector[String]) =
    Tests.Group(name, ts, Tests.SubProcess(
      ForkOptions().withRunJVMOptions(opts)))
  val (chaos, main) = tests.partition(_.name.endsWith("TaskRetrySpec"))
  Seq(group("main", main, base),
    group("chaos", chaos, base :+ "-Dgraft.test.taskMaxFailures=2"))
    .filter(_.tests.nonEmpty)
}
// the two groups each hold a full local SparkSession — run them
// one at a time, not two 8 GiB JVMs side by side
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 1)
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
)

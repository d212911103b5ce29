ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dragnetspark"
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
// Per-suite wall times (scalatest -oD) so the grouping below can be
// rebalanced from evidence instead of guesses.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// The suite is ~66 min sequential on a slow box — past the driver's
// verify cap (r19: tests_ok=false on a time-capped run with zero
// failures). Suites already share nothing across JVMs (per-JVM
// warehouse in SparkSpec, java.io.tmpdir temp dirs elsewhere), so
// `sbt test` forks them as CONCURRENT JVM groups: wall time becomes
// the longest group, not the sum. Suites that spawn their own
// subprocess clusters (local-cluster executors, crash drills) are
// pinned together so at most one such cluster runs at a time.
val testGroupCount = 6
val pinnedTestGroup: Map[String, Int] = Map(
  // spawn multi-JVM local-cluster / executor-loss drills: keep serial
  "graft.LocalClusterSpec" -> 0,
  "graft.ExecutorLossSpec" -> 0,
  // spawn streaming crash-drill subprocesses
  "graft.StreamCrashSpec" -> 1,
  "graft.RocksDbStateSpec" -> 1)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val base = baseDirectory.value
  val groups = tests.groupBy(t => pinnedTestGroup.getOrElse(t.name,
    math.abs(t.name.hashCode) % testGroupCount))
  groups.toSeq.sortBy(_._1).map { case (i, ts) =>
    // per-group store-cache root: two groups cold-building the same
    // fingerprint-keyed artifact must not race on one staging dir
    val gOpts = opts :+ s"-Dgraft.tmp.root=/tmp/graft-test-g$i"
    Tests.Group(s"g$i", ts, Tests.SubProcess(
      ForkOptions().withRunJVMOptions(gOpts).withWorkingDirectory(Some(base))))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(8, java.lang.Runtime.getRuntime.availableProcessors())),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
// Forked run output goes straight to our stdout (no "[info] " prefix) so
// harness scripts can json-parse Bench's single result line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
) ++
  // Measurement aid: extra JVM flags for the forked run (GC logging,
  // profilers) without editing the build. Never set by the driver.
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))

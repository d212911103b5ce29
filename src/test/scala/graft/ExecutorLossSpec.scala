package graft

/**
 * The executor-loss drill (r17 verdict item 4): launch
 * [[graft.tools.ExecutorLossDrill]] as a separate JVM (a second
 * SparkContext cannot share this test JVM) under
 * `local-cluster[2,1,1024]` — two REAL executor processes — SIGKILL
 * one mid-query, and assert both sides of
 * [[graft.plans.Lineage]]'s tradeoff claim:
 *
 *   - `reliable` mode survives the loss and returns identical rows
 *     (exit 0);
 *   - `local` mode fails the re-read (exit 3) — the DOCUMENTED hazard,
 *     now demonstrated rather than asserted.
 *
 * Skipped when the Spark distribution (/opt/spark, needed by
 * local-cluster's worker launcher) is not present.
 */
class ExecutorLossSpec extends SparkSpec {

  private def drill(mode: String): (Int, String) = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val pb = new ProcessBuilder(javaBin,
      "-Xmx1g",
      "-cp", sys.props("java.class.path"),
      // Spark 4 needs the same add-opens the test JVM runs with
      "--add-opens=java.base/java.lang=ALL-UNNAMED",
      "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
      "--add-opens=java.base/java.lang.reflect=ALL-UNNAMED",
      "--add-opens=java.base/java.io=ALL-UNNAMED",
      "--add-opens=java.base/java.net=ALL-UNNAMED",
      "--add-opens=java.base/java.nio=ALL-UNNAMED",
      "--add-opens=java.base/java.util=ALL-UNNAMED",
      "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
      "--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED",
      "--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED",
      "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
      "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
      "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
      "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
      "graft.tools.ExecutorLossDrill", mode, sf001)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    // the worker's executor-command builder needs the scala suffix to
    // locate the jars dir (without it: "Cannot find any build
    // directories" and the app dies before an executor launches)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val done = p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    if (!done) { p.destroyForcibly(); fail(s"drill $mode timed out:\n$out") }
    (p.exitValue(), out)
  }

  test("reliable lineage survives a SIGKILLed executor; local mode " +
      "fails the re-read (the documented tradeoff, demonstrated)") {
    assume(new java.io.File("/opt/spark/bin").isDirectory,
      "no Spark distribution for local-cluster")
    assume(new java.io.File(sf001).isDirectory, "driver testdata not present")

    val (reliableCode, reliableOut) = drill("reliable")
    assert(reliableCode == 0 && reliableOut.contains("DRILL SURVIVED"),
      s"reliable mode should survive executor loss (exit $reliableCode):\n" +
        reliableOut.linesIterator.toSeq.takeRight(15).mkString("\n"))

    val (localCode, localOut) = drill("local")
    assert(localCode == 3 && localOut.contains("DRILL FAILED"),
      s"local mode should FAIL the re-read after executor loss " +
        s"(exit $localCode):\n" +
        localOut.linesIterator.toSeq.takeRight(15).mkString("\n"))
  }
}

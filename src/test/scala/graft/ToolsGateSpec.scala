package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wires the python gate-tooling fixtures into `sbt test` so a
  * regression in tools/check.py's dtype strictness (the class of
  * silent PASS the driver's type-sensitive hash then fails — VERDICT
  * r10 #3) is caught by the same run as the Scala suites. Skips, not
  * fails, where the python toolchain isn't present (the library itself
  * has no python dependency — these scripts are gate scaffolding). */
class ToolsGateSpec extends AnyFunSuite {

  private def run(cmd: String*): Option[(Int, String)] =
    try {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
      p.waitFor()
      Some((p.exitValue(), out))
    } catch { case _: java.io.IOException => None }

  test("check.py dtype-strict fixture: uncast HUGEINT fails, cast twin passes") {
    val probe = run("python3", "-c", "import duckdb, pyarrow")
    assume(probe.exists(_._1 == 0),
      "python3 + duckdb + pyarrow not available — gate tooling untestable here")
    // resolve from CWD but assume-skip (not fail) when the JVM isn't
    // rooted at the repo — the fixture is gate scaffolding, and a
    // file-not-found nonzero exit would otherwise read as a regression
    val script = new java.io.File("tools/test_check_dtype.py")
    assume(script.exists(),
      s"fixture script not found at ${script.getAbsolutePath} — " +
        "test JVM not rooted at the repo; gate tooling untestable here")
    val res = run("python3", script.getAbsolutePath)
    assert(res.isDefined, "could not launch python3")
    val (code, out) = res.get
    assert(code == 0, s"fixture test failed:\n$out")
    assert(out.contains("FIXTURE: PASS"), out)
  }

  test("bench_compare contention sentinel: contended run annotates, " +
      "outsized regression still fails, --update refused") {
    val probe = run("python3", "-c", "import json")
    assume(probe.exists(_._1 == 0), "python3 not available")
    val script = new java.io.File("tools/test_bench_sentinel.py")
    assume(script.exists(),
      s"fixture script not found at ${script.getAbsolutePath} — " +
        "test JVM not rooted at the repo; gate tooling untestable here")
    val res = run("python3", script.getAbsolutePath)
    assert(res.isDefined, "could not launch python3")
    val (code, out) = res.get
    assert(code == 0, s"fixture test failed:\n$out")
    assert(out.contains("FIXTURE: PASS"), out)
  }

  test("every registry query is cited in SURVEY §2 (r16 verdict item 8: " +
      "new rows can't silently orphan queries)") {
    val f = new java.io.File("SURVEY.md")
    assume(f.exists(),
      s"SURVEY.md not found at ${f.getAbsolutePath} — test JVM not " +
        "rooted at the repo")
    val txt = {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.mkString finally src.close()
    }
    val start = txt.indexOf("## §2")
    val end = txt.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md lost its §2/§3 headers")
    val s2 = txt.substring(start, end)
    // a query is "cited" when its exact name appears in backticks
    // anywhere in §2 (row tables or the §2.1 companion list)
    val cited = "`([a-z0-9_]+)`".r.findAllMatchIn(s2).map(_.group(1)).toSet
    val orphans = Registry.all.map(_.name).filterNot(cited)
    assert(orphans.isEmpty,
      s"registry queries uncited in SURVEY §2 — add them to their row " +
        s"or to §2.1: ${orphans.mkString(", ")}")
  }
}

package graft.tools

/** Local-filesystem helpers for gate/bench scaffolding (stores, scratch
  * index trees) — NOT used by distributed operators, which go through
  * the Hadoop FS API.
  *
  * Scope contract: every caller of these helpers (the `ensure*Artifact`
  * per-query caches in *Queries.scala and their `_SUCCESS`/marker
  * probes via `java.io.File`) operates on hard-coded `/tmp/graft-*`
  * roots over driver-local testdata — single-process memoization for
  * the gate/bench sweeps, never a production artifact root. The
  * library-level stateful artifacts those caches wrap (graft.index.Index,
  * graft.dedup.Dedup stores, graft.text.Bm25 lexicons) resolve their
  * FileSystem from the path's scheme and are exercised on explicit
  * `file://` URIs by FileSystemSchemeSpec — an artifact root that is a
  * URI must go through those APIs, not through this object. */
object LocalFs {
  /** Root directory for the fingerprint-keyed store caches
    * (lexicons, chunk stores, PQ codebooks, …). "/tmp" everywhere the
    * driver runs things (bench, verify, the CLI — the property is
    * never set there, so artifact paths are unchanged). `sbt test`
    * forks suites as CONCURRENT JVM groups (build.sbt) and gives each
    * group its own root via -Dgraft.tmp.root: two suites in different
    * groups cold-building the SAME fingerprint key would otherwise
    * race on one staging dir + rename swap. */
  val TmpRoot: String = sys.props.getOrElse("graft.tmp.root", "/tmp")

  /** Content fingerprint of a parquet file-or-directory (length ⊕ mtime
    * over the file / its children): regenerating the dataset changes the
    * fingerprint, so caches keyed on it REBUILD instead of silently
    * serving artifacts derived from dead data; it also disambiguates
    * distinct dirs whose sanitized names collide. */
  def fingerprint(f: java.io.File): String = {
    def stamp(x: java.io.File): Long = 31L * x.length() + x.lastModified()
    val s =
      if (f.isDirectory) f.listFiles().map(stamp).foldLeft(stamp(f))(_ ^ _)
      else stamp(f)
    java.lang.Long.toHexString(s)
  }

  /** Drop cache trees under `root` whose name starts with `keyPrefix`
    * but is not (a sub-tree of) `keep` — the superseded-fingerprint
    * sweep that bounds /tmp to one cache per dataset. */
  def dropStaleSiblings(root: String, keyPrefix: String, keep: String): Unit =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith(keyPrefix) &&
        f.getName != keep && !f.getName.startsWith(keep + "-"))
      .foreach(f => deleteRec(f.toPath))

  /** Recursive delete; missing path is a no-op. */
  def deleteRec(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
}

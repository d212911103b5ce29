package graft

import org.apache.spark.sql.functions._

/** Bounded-frame audit for every PARTITIONLESS window in the query
  * library (r19 verdict item: the `WindowExec: No Partition Defined`
  * warnings are benign ONLY while every such window runs over a
  * provably bounded frame — one unbounded slip is a silent
  * scale-killer, so the sites are enumerated HERE, each with its
  * boundedness proof, and the static scan fails the build when a new
  * site appears without being added to this registry).
  *
  * Registry: source file → number of partitionless window
  * constructors (`Window.orderBy(...)` / `Window.partitionBy()`), with
  * the per-site bound:
  *
  *  - plans/Quantiles.scala (1): walkQuantileBuckets' cum/total sums
  *    run over histogram BUCKET counts — the caller's bucket layout
  *    (lquantize step / power-of-two ladder), never corpus rows.
  *  - dedup/Corpus.scala (3): dsirSelect's nt/nr normalizers ride the
  *    ≤`buckets`-row feature-bucket model (871); tokenBudget's
  *    cum/tot ride the ≤201-row quality-score histogram (kc ∈ 0..200
  *    by construction, asserted dynamically below).
  *  - RetrievalQueries.scala (8): rrfFuse ranks two lists ALREADY cut
  *    to k rows by TakeOrdered (375/379); the six recall gates'
  *    per-mille floors aggregate kiRankOf output — one row per target
  *    query, ≤ TargetCap (collect-capped at RetrievalQueries
  *    targetSample).
  *  - AnalyticsQueries.scala (1): q_rolling_7d's 7-day range frame
  *    runs over one row PER CALENDAR DAY (post-groupBy), bounded by
  *    the dataset's date span, not its row count.
  *  - TextQueries.scala (1): text_token_hist's cumulative sum rides
  *    the same ≤201-row kc histogram as tokenBudget.
  */
class BoundedWindowSpec extends SparkSpec {

  private val registry: Map[String, Int] = Map(
    "plans/Quantiles.scala" -> 1,
    "dedup/Corpus.scala" -> 3,
    "RetrievalQueries.scala" -> 8,
    "AnalyticsQueries.scala" -> 1,
    "TextQueries.scala" -> 1)

  test("every partitionless window site is registered with a bound") {
    val root = new java.io.File("src/main/scala/graft")
    assert(root.isDirectory, s"source root not found from ${new java.io.File(".").getCanonicalPath}")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val pat = java.util.regex.Pattern.compile(
      """Window\s*\.\s*(orderBy\s*\(|partitionBy\s*\(\s*\))""")
    val found: Map[String, Int] = walk(root).flatMap { f =>
      val rel = f.getPath.stripPrefix("src/main/scala/graft/")
      scala.io.Source.fromFile(f, "UTF-8").getLines()
        .map(_.trim)
        // constructor sites only: prose mentions in comments don't count
        .filterNot(l => l.startsWith("//") || l.startsWith("*"))
        .filter(l => pat.matcher(l).find())
        .map(_ => rel)
        .toList
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(found == registry,
      s"partitionless Window sites drifted from the audited registry.\n" +
        s"found:    ${found.toSeq.sorted}\nexpected: ${registry.toSeq.sorted}\n" +
        "New sites must state a boundedness proof in BoundedWindowSpec's scaladoc.")
  }

  test("quality-score histogram frame is <= 201 buckets (kc in 0..200)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val m = graft.text.Text.qualityModelRaw(docs)
      .select(col("doc_id"), col("n_tokens"),
        expr("(num + 1000 * n_tokens) * 100 div (1000 * n_tokens)").as("kc"))
    val mm = m.agg(min("kc"), max("kc"), count(lit(1))).head
    assert(!mm.isNullAt(2) && mm.getLong(2) > 0, "model must be non-empty")
    assert(mm.getLong(0) >= 0 && mm.getLong(1) <= 200,
      s"kc out of the documented 0..200 range: min=${mm.getLong(0)} max=${mm.getLong(1)}")
    val buckets = m.select("kc").distinct().count()
    assert(buckets <= 201, s"histogram frame exceeded 201 buckets: $buckets")
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BM25 lexical retrieval over the documents corpus — the SPARSE side of
 * the retrieval story (the dense side is `graft.ann`'s cosine family).
 * A training-data pipeline uses exactly this pair: lexical scoring for
 * decontamination-adjacent query matching and quality-targeted
 * selection, dense ANN for semantic neighbors, and rank fusion (RRF)
 * when both signals matter.
 *
 * Scale shape (100 TB): for a FIXED query, BM25 needs only (dl, tf per
 * query term) per document — one narrow codegen'd corpus pass, no
 * posting-list explosion and no shuffle — plus a single-row global
 * aggregate (map-side partial → one reduce) for (N, Σdl, df per term),
 * broadcast back over the scoring pass. Top-k resolves through
 * TakeOrderedAndProject (per-partition heaps + driver merge of k rows),
 * never a global sort. A standing query workload would persist the
 * aggregate as corpus stats the way `index/` persists rollups; the
 * per-document features are recomputed streamingly, like dragnet
 * recomputes scan fields per run (reference: lib/dn-index.js keeps
 * rollups, never raw postings).
 *
 * Cross-engine determinism: every constant is rendered from the same
 * Scala value (shortest round-trip string → bit-identical double in
 * DuckDB), every expression tree is parenthesized identically in the
 * Column and SQL renderings, and the one transcendental — the idf log —
 * is [[lnSeries]], a PINNED truncated atanh series of +,*,/ only, so
 * both engines replay the scoring arithmetic IEEE-exactly. The series
 * is monotone in its argument (odd powers of a monotone map), which is
 * the only property ranking needs; its absolute value undershoots
 * ln(x) for large x and that is part of the pinned spec, not an error.
 */
object Bm25 {

  /** Standard BM25 constants (Robertson & Zaragoza 2009). */
  val K1 = 1.2
  val B = 0.75

  /** Reciprocal-rank-fusion constant (Cormack, Clarke & Buettcher,
    * SIGIR 2009 — k=60 as published). */
  val RrfK = 60

  /** The pinned query: terms drawn from the synthetic corpus vocab with
    * slightly different document frequencies. */
  val Terms: Seq[String] = Seq("spark", "vector", "merge", "window")

  /** Truncated-series length: odd powers y^1..y^25. */
  val SeriesTerms = 13

  private val coeffs: Seq[Double] =
    (0 until SeriesTerms).map(i => 1.0 / (2 * i + 1))

  /** Shortest round-trip double literal, forced DOUBLE in DuckDB (a bare
    * decimal literal there is DECIMAL, whose arithmetic would diverge). */
  private def d(x: Double): String = s"CAST(${x.toString} AS DOUBLE)"

  /**
   * ln(x) ≈ 2·y·Σ y^2i/(2i+1), y=(x−1)/(x+1) — Horner form, identical
   * association in both renderings. Monotone increasing for x>0;
   * lnSeries(1)=0.
   */
  def lnSeries(x: Column): Column = {
    val y = (x - lit(1.0)) / (x + lit(1.0))
    val y2 = y * y
    val horner = coeffs.indices.reverse.foldLeft(lit(0.0): Column) {
      (acc, i) => acc * y2 + lit(coeffs(i))
    }
    lit(2.0) * y * horner
  }

  /** SQL twin of [[lnSeries]] — same tree, same parens. */
  def lnSeriesSql(x: String): String = {
    val y = s"(($x - ${d(1.0)}) / ($x + ${d(1.0)}))"
    val y2 = s"($y * $y)"
    val horner = coeffs.indices.reverse.foldLeft(d(0.0)) {
      (acc, i) => s"(($acc * $y2) + ${d(coeffs(i))})"
    }
    s"((${d(2.0)} * $y) * $horner)"
  }

  /** Pure-Scala mirror (specs hand-compute expected scores with it). */
  def lnSeriesDouble(x: Double): Double = {
    val y = (x - 1.0) / (x + 1.0)
    val y2 = y * y
    val horner = coeffs.indices.reverse.foldLeft(0.0) {
      (acc, i) => acc * y2 + coeffs(i)
    }
    2.0 * y * horner
  }

  def tfCol(t: String): String = s"tf_$t"
  def dfCol(t: String): String = s"df_$t"

  /**
   * Per-document features for a fixed term set: (id, dl, tf_term...).
   * One narrow pass — tokenize once, count matches per term with a
   * filtered-size over the same array (Catalyst subexpression-eliminates
   * the shared tokenize).
   */
  def features(docs: DataFrame, terms: Seq[String] = Terms,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val cols = col(idCol) +: size(toks).cast("long").as("dl") +:
      terms.map(t =>
        size(filter(toks, x => x === lit(t))).cast("long").as(tfCol(t)))
    docs.select(cols: _*)
  }

  /** One BM25 term's contribution; `n`/`df`/`sumdl` are the broadcast
    * corpus stats as doubles, `tf`/`dl` the per-doc features. */
  private def termScore(t: String): Column = {
    val nD = col("n").cast("double")
    val dfD = col(dfCol(t)).cast("double")
    val tfD = col(tfCol(t)).cast("double")
    val dlD = col("dl").cast("double")
    val avgdl = col("sumdl").cast("double") / nD
    val idfArg = ((nD - dfD) + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0)
    val idf = lnSeries(idfArg)
    val num = tfD * lit(K1 + 1.0)
    val norm = lit(1.0 - B) + (lit(B) * dlD) / avgdl
    val denom = tfD + lit(K1) * norm
    idf * (num / denom)
  }

  private def termScoreSql(t: String): String = {
    val nD = "CAST(n AS DOUBLE)"
    val dfD = s"CAST(${dfCol(t)} AS DOUBLE)"
    val tfD = s"CAST(${tfCol(t)} AS DOUBLE)"
    val dlD = "CAST(dl AS DOUBLE)"
    val avgdl = s"(CAST(sumdl AS DOUBLE) / $nD)"
    val idfArg = s"(((($nD - $dfD) + ${d(0.5)}) / ($dfD + ${d(0.5)})) + ${d(1.0)})"
    val idf = lnSeriesSql(idfArg)
    val num = s"($tfD * ${d(K1 + 1.0)})"
    val norm = s"(${d(1.0 - B)} + ((${d(B)} * $dlD) / $avgdl))"
    val denom = s"($tfD + (${d(K1)} * $norm))"
    s"($idf * ($num / $denom))"
  }

  /** Σ over terms, left-associated — the fold order IS the spec. */
  def score(terms: Seq[String] = Terms): Column =
    terms.map(termScore).reduceLeft(_ + _)

  def scoreSql(terms: Seq[String] = Terms): String =
    terms.map(termScoreSql).reduceLeft((a, b) => s"($a + $b)")

  /**
   * BM25 top-k: features pass → single-row stats agg, broadcast back
   * (BroadcastNestedLoopJoin over ONE row — not a real cross product)
   * → score → TakeOrderedAndProject. Two corpus scans (stats, scoring),
   * zero corpus shuffles.
   */
  def topK(docs: DataFrame, k: Int, terms: Seq[String] = Terms,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val f = features(docs, terms, idCol, textCol)
    val aggs = sum(col("dl")).as("sumdl") +:
      terms.map(t => sum((col(tfCol(t)) > 0).cast("long")).as(dfCol(t)))
    val stats = f.agg(count(lit(1)).as("n"), aggs: _*)
    f.crossJoin(broadcast(stats))
      .select(col(idCol), score(terms).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** CTE prefix shared by the bm25 gate and the RRF oracle: per-doc
    * features `f`, corpus stats `st`, scored docs `sc`. */
  def sqlCtes(table: String, terms: Seq[String] = Terms): String = {
    val toks = s"string_split_regex(trim(lower(text)), '\\s+')"
    val tfs = terms.map(t =>
      s"CAST(len(list_filter($toks, x -> x = '$t')) AS BIGINT) AS ${tfCol(t)}")
      .mkString(",\n            ")
    val dfs = terms.map(t =>
      s"sum(CASE WHEN ${tfCol(t)} > 0 THEN 1 ELSE 0 END) AS ${dfCol(t)}")
      .mkString(",\n            ")
    s"""f AS (
          SELECT doc_id,
            CAST(len($toks) AS BIGINT) AS dl,
            $tfs
          FROM $table),
        st AS (
          SELECT count(*) AS n, sum(dl) AS sumdl,
            $dfs
          FROM f),
        sc AS (
          SELECT doc_id, ${scoreSql(terms)} AS score FROM f, st)"""
  }

  /** Full oracle for the bm25 top-k gate. */
  def topKSql(table: String, k: Int, terms: Seq[String] = Terms): String =
    s"""
        WITH ${sqlCtes(table, terms)}
        SELECT doc_id, score FROM sc
        ORDER BY score DESC, doc_id LIMIT $k"""
}

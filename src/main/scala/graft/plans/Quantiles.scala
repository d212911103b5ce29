package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Bucket-bounded quantiles: the scale-safe replacement for Spark's
 * exact single-group `percentile`, whose merged aggregation state is a
 * map of every distinct value — bounded only by the value grid, and in
 * the worst case hundreds of MB in the one final-merge task. Here the
 * state is an lquantize histogram instead (dragnet's own primitive,
 * lib/stream-skinner.js bucketizers): one row per OCCUPIED bucket of
 * width `step`, built by an ordinary mergeable groupBy-count, so the
 * partial aggregation is map-side combined and the final state is
 * bounded by the bucket count regardless of corpus size. A cumulative
 * walk over the (tiny) histogram picks, for each requested fraction p,
 * the first bucket whose running count reaches ceil(p·n) — the bucket
 * holding the p-th value. Deterministic, engine-stable (both sides do
 * the same IEEE division and the same integer rank comparison), and
 * replayable in plain SQL — see the oracle builders below.
 *
 * The quantile is resolved to BUCKET precision (its lower edge), not
 * interpolated: at 100 TB the histogram is what you can afford to
 * merge, and a `step`-wide answer is the honest statement of what it
 * knows. Pick `step` from the value grid (scores rounded to 1e-6 →
 * step 1e-3 gives 3 spare digits; prices on a cent grid → step 100).
 */
object Quantiles {

  /**
   * One row, one LONG column per requested (name, p): the INDEX of the
   * histogram bucket — floor(value / step) — holding the p-th value.
   * Use when the caller buckets other rows by the same floor(x / step)
   * expression (e.g. head/middle/tail assignment), so the comparison
   * is integer-exact on both engines.
   */
  def histQuantileBuckets(df: DataFrame, value: Column, step: Double,
      ps: Seq[(String, Double)]): DataFrame = {
    require(step > 0, s"bucket step must be positive: $step")
    // NULLs are excluded on BOTH engines: Spark's Window.orderBy sorts a
    // NULL bucket first while DuckDB's SUM OVER (ORDER BY b) sorts NULLs
    // last, so an un-filtered NULL bucket would shift cumulative ranks
    // differently per engine (and a NULL value holds no quantile anyway).
    val hist = df.filter(value.isNotNull)
      .groupBy(bucket(value, step).as("b"))
      .agg(count(lit(1)).as("c"))
    walkQuantileBuckets(hist, ps)
  }

  /** The cumulative walk over an ALREADY-AGGREGATED (b, c) histogram —
    * exposed so a histogram that arrived some other way (e.g. drained
    * from streaming incremental state) resolves quantiles through the
    * identical arithmetic. One row, one LONG bucket-index column per
    * requested (name, p). */
  def walkQuantileBuckets(hist: DataFrame,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "at least one quantile fraction required")
    ps.foreach { case (n, p) =>
      require(p > 0 && p <= 1, s"quantile fraction out of (0,1]: $n=$p") }
    // the walk runs in one task, but over bucket COUNTS, not rows:
    // its state is bounded by the bucket count, never the corpus.
    // n comes from an unbounded frame over the SAME ordering, so both
    // running and total sums resolve in one Window pass — the histogram
    // aggregation executes once, not once per consumer.
    val ord = Window.orderBy(col("b"))
    val walked = hist
      .withColumn("cum", sum(col("c")).over(ord))
      .withColumn("n", sum(col("c")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    walked.agg(
      ps.head match { case (name, p) => rankPick(p).as(name) },
      ps.tail.map { case (name, p) => rankPick(p).as(name) }: _*)
  }

  // ---- Mergeable quantile sketch (hash-sample histogram) ----
  //
  // The fourth mergeable sketch family here (HLL cardinality, CMS
  // frequency, Bloom membership — this one: DISTRIBUTION): the sketch
  // is the value histogram of a deterministic hash SAMPLE. Row-local
  // membership makes it trivially mergeable (sample of a union is the
  // union of samples; histograms add), and the XHash choice makes the
  // exact same sample replayable in an external engine. Quantile
  // estimates read off the sample histogram through the same bounded
  // walk as the exact path; the DKW inequality bounds the rank error:
  //   P(sup|F_k - F| > eps) <= 2 exp(-2 k eps^2)
  // so eps = sqrt(ln(2/delta)/(2k)) at delta = 0.001. ln(2/delta) is
  // pinned as a decimal LITERAL so both engines compare against the
  // bit-identical bound.

  /** ln(2/0.001), pinned (java.lang.Math.log(2000.0)). */
  val DkwLn2OverDelta = 7.600902459542082

  /** Keep 1-in-`SampleMod` rows by id hash — the sketch's membership
    * rule. */
  val SampleMod = 4

  /**
   * The sketch gate: `full` is a one-LONG-column ("v") frame of every
   * value; `sampleHist` is the hash-sample's (b, c) value histogram
   * (b == v, step-1 buckets), however it was accumulated — one batch
   * groupBy or many streamed micro-batches. One output row per p:
   * `(p, est, exact, err, ok, sample_k)` where est is the sample
   * quantile, exact the full-data quantile (both type-1, bucket walk),
   * err = |rank(est)/n - p| the TRUE rank error of the estimate, and
   * ok the DKW bound check — a sampling change that wrecks accuracy
   * turns ok false even when applied to both engines consistently.
   * Everything after the two histograms is single-row arithmetic.
   */
  def sampleQuantileGate(full: DataFrame, sampleHist: DataFrame,
      ps: Seq[(String, Double)]): DataFrame = {
    val est = walkQuantileBuckets(sampleHist,
      ps.map { case (n, p) => (s"est_$n", p) })
    val exact = histQuantileBuckets(full, col("v"), 1.0,
      ps.map { case (n, p) => (s"exact_$n", p) })
    val k = sampleHist.agg(sum(col("c")).cast("long").as("sample_k"))
    // rank(est_p) = |{v <= est_p}| — one pass over full, est broadcast
    val ranks = full.crossJoin(broadcast(est)).agg(
      count(lit(1)).as("n"),
      ps.map { case (n, _) =>
        sum(when(col("v") <= col(s"est_$n"), 1L).otherwise(0L))
          .as(s"rank_$n") }: _*)
    val wide = ranks.crossJoin(est).crossJoin(exact).crossJoin(k)
    val perP = ps.map { case (n, p) =>
      struct(lit(p).as("p"), col(s"est_$n").as("est"),
        col(s"exact_$n").as("exact"),
        abs(col(s"rank_$n").cast("double") / col("n").cast("double")
          - lit(p)).as("err"),
        (abs(col(s"rank_$n").cast("double") / col("n").cast("double")
          - lit(p)) <=
          sqrt(lit(DkwLn2OverDelta)
            / (lit(2.0) * col("sample_k").cast("double")))).as("ok"),
        col("sample_k").as("sample_k"))
    }
    wide.select(explode(array(perP: _*)).as("r")).select(col("r.*"))
  }

  /** SQL replay of [[sampleQuantileGate]]: `fullFrom` / `sampleFrom`
    * are relations exposing a LONG `v`; emits one row per (p).
    * Returns WITH-clause CONTINUATION text — the caller prepends
    * `WITH <its own CTEs>,`. */
  def sampleQuantileGateSql(fullFrom: String, sampleFrom: String,
      ps: Seq[Double]): String = {
    val estCols = ps.zipWithIndex.map { case (p, i) => (s"e$i", p) }
    val exactCols = ps.zipWithIndex.map { case (p, i) => (s"x$i", p) }
    val rankCols = ps.zipWithIndex.map { case (_, i) =>
      s"SUM(CASE WHEN f.v <= est.e$i THEN 1 ELSE 0 END) AS r$i" }
      .mkString(",\n            ")
    val rows = ps.zipWithIndex.map { case (p, i) =>
      s"""SELECT $p AS p, est.e$i AS est, exact.x$i AS exact,
         |  abs(CAST(rk.r$i AS DOUBLE) / CAST(rk.n AS DOUBLE) - $p) AS err,
         |  abs(CAST(rk.r$i AS DOUBLE) / CAST(rk.n AS DOUBLE) - $p)
         |    <= sqrt($DkwLn2OverDelta / (2.0 * CAST(sk.k AS DOUBLE))) AS ok,
         |  sk.k AS sample_k
         |FROM est, exact, rk, sk""".stripMargin }
      .mkString("\n        UNION ALL\n        ")
    s"""
        est AS ${bucketsSql(sampleFrom, "v", 1.0, estCols)},
        exact AS ${bucketsSql(fullFrom, "v", 1.0, exactCols)},
        sk AS (SELECT COUNT(*) AS k FROM $sampleFrom),
        rk AS (
          SELECT COUNT(*) AS n,
            $rankCols
          FROM $fullFrom f, est)
        $rows"""
  }

  /**
   * Like [[histQuantileBuckets]] but resolved to VALUES: each output
   * column is the lower edge (bucket · step, DOUBLE) of the bucket
   * holding the p-th value — a drop-in for a percentile aggregate
   * whose consumers want numbers on the value axis.
   */
  def histQuantiles(df: DataFrame, value: Column, step: Double,
      ps: Seq[(String, Double)]): DataFrame =
    histQuantileBuckets(df, value, step, ps).select(
      ps.map { case (name, _) =>
        (col(name) * lit(step)).as(name) }: _*)

  /** The shared bucket expression: floor(value / step) as LONG. Division,
    * not multiplication by 1/step — the oracle SQL must do the SAME IEEE
    * operation or grid-edge values land in different buckets. */
  def bucket(value: Column, step: Double): Column =
    floor(value / lit(step)).cast("long")

  /** first bucket whose cumulative count reaches ceil(p·n) */
  private def rankPick(p: Double): Column =
    min(when(col("cum") >= ceil(lit(p) * col("n")), col("b")))

  /** SQL replay of [[bucket]] for oracle builders. */
  def bucketSql(valueExpr: String, step: Double): String =
    s"CAST(floor($valueExpr / $step) AS BIGINT)"

  /**
   * SQL replay of the whole walk for oracle builders: a WITH-clause
   * body (histogram + cumulative walk over `fromSql`, which must
   * expose `valueExpr`) whose final SELECT yields one row with one
   * bucket-INDEX column per (name, p).
   */
  def bucketsSql(fromSql: String, valueExpr: String, step: Double,
      ps: Seq[(String, Double)]): String = {
    val picks = ps.map { case (name, p) =>
      s"MIN(CASE WHEN cum >= CAST(ceil(($p) * n) AS BIGINT) THEN b END) AS $name"
    }.mkString(",\n            ")
    s"""(
          WITH qh AS (
            SELECT ${bucketSql(valueExpr, step)} AS b, COUNT(*) AS c
            FROM $fromSql WHERE ($valueExpr) IS NOT NULL GROUP BY 1),
          qw AS (
            SELECT b, SUM(c) OVER (ORDER BY b) AS cum,
                   SUM(c) OVER () AS n FROM qh)
          SELECT $picks FROM qw)"""
  }
}

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
    require(ps.nonEmpty, "at least one quantile fraction required")
    ps.foreach { case (n, p) =>
      require(p > 0 && p <= 1, s"quantile fraction out of (0,1]: $n=$p") }
    // NULLs are excluded on BOTH engines: Spark's Window.orderBy sorts a
    // NULL bucket first while DuckDB's SUM OVER (ORDER BY b) sorts NULLs
    // last, so an un-filtered NULL bucket would shift cumulative ranks
    // differently per engine (and a NULL value holds no quantile anyway).
    val hist = df.filter(value.isNotNull)
      .groupBy(bucket(value, step).as("b"))
      .agg(count(lit(1)).as("c"))
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

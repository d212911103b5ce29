package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Join strategies for the shapes that break at 100 TB (SURVEY.md §4):
 * skewed keys and repeated fact⋈fact joins on the same key.
 */
object ScaleJoins {

  /**
   * Equi-join for a skew-heavy big side: each big row gets one of `salts`
   * sub-keys, the small side is replicated across all salt values, and
   * the join runs on (key, salt) — a hot key spreads over `salts`
   * reducers instead of melting one. Result set equals the plain inner
   * join. (AQE's skew-join handles moderate skew adaptively; explicit
   * salting is for the pathological keys you know about.)
   *
   * The small side grows ×salts — keep salts modest (8-32) and the small
   * side genuinely small.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // any row-spread works for salting; monotonically_increasing_id is
    // cheap and needs no row content
    val b = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val s = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /**
   * Write a DataFrame as a parquet table bucketed (and sorted) by `key`:
   * two tables bucketed the same way join/aggregate on that key with NO
   * shuffle — the co-location is recorded in the catalog and Catalyst
   * plans a zipped per-bucket join. This is the persistent analog of
   * repartitioning once and reusing the partitioning across stages.
   */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Read back a bucketed table (bucket metadata comes from the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /**
   * Backward as-of join (kdb `aj` / pandas `merge_asof` semantics): every
   * left row, annotated with columns from the LATEST right row of the
   * same key whose time is <= the left row's time (nulls when no right
   * row precedes it).
   *
   * Spark has no built-in as-of join, and the naive formulations melt at
   * scale: a theta-join on `r.t <= l.t` plans as a broadcast
   * nested-loop / cartesian, and a per-row max-subquery rescans the
   * right side per left row. The scalable shape is union-tag + one
   * window pass: tag both sides, union, and carry the right side's
   * columns forward with `last(..., ignoreNulls) OVER (PARTITION BY key
   * ORDER BY time, side ROWS UNBOUNDED PRECEDING)` — ONE shuffle on key,
   * one sort, linear in |L|+|R|, AQE-splittable like any window. Right
   * rows sort before left rows at equal time (side 0 < 1), so a
   * same-timestamp right row IS visible to the left row (<=, not <).
   *
   * Ties among right rows at identical (key, time): the carried row is
   * the last in (`tieBreak`) order — pass it to make results
   * deterministic when right keys can collide at a timestamp.
   *
   * All annotated columns are carried as ONE struct through a single
   * `last(ignoreNulls)` — per-column carries would resurrect an OLDER
   * right row's value wherever the matching row holds a genuine NULL,
   * tearing the annotation across right rows. The struct itself is
   * non-null for every right row (its FIELDS may be null), so the
   * matched row's nulls survive and every `asof_*` column comes from
   * the same right row.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      time: String, rightCols: Seq[String], prefix: String = "asof_",
      tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val l = left.select(
      Seq(col(key).as("_k"), col(time).as("_t"), lit(1).as("_side"),
        struct(left.columns.map(col): _*).as("_lrow"),
        lit(null).cast(rType).as("_r")) ++
        tieBreak.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"_tb_$c")): _*)
    val r = right.select(
      Seq(col(key).as("_k"), col(time).as("_t"), lit(0).as("_side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(
          left.schema.fields)).as("_lrow"),
        struct(rightCols.map(col): _*).as("_r")) ++
        tieBreak.map(c => col(c).as(s"_tb_$c")): _*)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t") +: col("_side") +: tieBreak.map(c => col(s"_tb_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(col("_side"), col("_lrow"),
        last(col("_r"), ignoreNulls = true).over(w).as("_asof"))
      .where(col("_side") === 1)
      .select(col("_lrow.*") +:
        rightCols.map(c => col(s"_asof.`$c`").as(s"$prefix$c")): _*)
  }

  /**
   * Global time-range join — every probe row matched with the build
   * rows whose time lies in the probe's trailing window
   * `[p.t - windowUs, p.t)` — with NO key to equi-join on.
   *
   * The naive theta-join (`b.t >= p.t - w AND b.t < p.t`) has no equi
   * condition, so Catalyst plans a broadcast nested-loop or cartesian —
   * |probe|×|build| comparisons, dead at scale. The scalable shape bins
   * BOTH sides into windowUs-wide time bins: each build row lands in
   * exactly ONE bin (so matches can't double-count), each probe's
   * trailing window spans exactly TWO consecutive bins, and the join
   * becomes bin-equi + residual range predicate. Work is 2|probe| +
   * bin-co-resident pairs — linear in event density, not in |probe|×
   * |build|. Bin indices are integer FLOOR division, never float — a
   * double division can misround at a bin boundary, and Spark's `div`
   * truncates toward zero, which would mis-bin negative times and
   * silently drop matches (the two-consecutive-bins covering argument
   * needs floor semantics), so `div` gets a sign correction.
   *
   * Returns matched pairs (inner): all probe columns plus the build
   * columns. Unmatched probes are absent — the caller aggregates and
   * left-joins back (see q_interval_join) when zero-match rows matter.
   * A probe time column named like a build column must be aliased apart
   * before the call.
   */
  def binnedRangeJoin(probe: DataFrame, probeTime: String,
      build: DataFrame, buildTime: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    // floorDiv(t, w) for w > 0: `div` truncates toward zero, so shift
    // the quotient down by one when a negative t leaves a remainder
    def floorBin(t: String) = expr(
      s"$t div ${windowUs}L - (CASE WHEN $t % ${windowUs}L < 0 " +
        "THEN 1 ELSE 0 END)")
    val tb = floorBin(probeTime)
    val p = probe.withColumn("_bin",
      explode(array(tb - lit(1L), tb)))
    val b = build.withColumn("_bin", floorBin(buildTime))
    p.join(b, Seq("_bin"))
      .where(col(buildTime) >= col(probeTime) - lit(windowUs) &&
        col(buildTime) < col(probeTime))
      .drop("_bin")
  }
}

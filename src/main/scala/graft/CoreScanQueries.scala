package graft

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filter.{And, Cmp, Or}
import graft.sources.Sources

/**
 * SURVEY.md §2 rows 1-17: dragnet's scan surface over the `events` table.
 * Each query is one QueryConfig compiled BOTH to a Spark plan (Scan.scan)
 * and to its DuckDB oracle (Scan.scanSql), so the two sides share one
 * definition and cannot drift.
 */
object CoreScanQueries {

  /** Spark-side field resolution (props is a struct after Sources.events). */
  private[graft] val rs: String => Column = col

  /** DuckDB-side field resolution over the raw events parquet. */
  private[graft] val rq: String => String = {
    case "props.k" => "CAST(props->>'k' AS INTEGER)"
    case f         => f
  }

  private def q(name: String, cfg: QueryConfig): Q =
    Q(name,
      (s, dir) => Scan.scan(Sources.events(s, dir), cfg, rs),
      Some(Scan.scanSql("events", cfg, rq)))

  private val perDay =
    FieldSpec("day", "ts", isDate = true,
      aggr = Some("lquantize"), step = Some(86400))

  /** A config exercising all three drop stages for scan_counters (also
    * reused by stream_counters — same accounting, streaming engine). */
  private[graft] val countersCfg = QueryConfig(
    filter = Some(Cmp("ne", "event_type", "error")),
    breakdowns = Seq(
      FieldSpec("k_nz", "props.k", aggr = Some("quantize"))),
    timeField = Some("ts"),
    after = Some(Instant.parse("2024-01-02T00:00:00Z")))

  /** Config for scan_warnings: a filter whose field can be NULL (eval
    * failure → warning) and an aggr breakdown with non-numeric values. */
  private val warningsCfg = QueryConfig(
    filter = Some(Cmp("ge", "k_nz", 0L)),
    breakdowns = Seq(FieldSpec("m_q", "mix", aggr = Some("quantize"))))

  def all: Seq[Q] = Seq(
    // #1 count all records
    q("scan_count", QueryConfig()),

    // #2 one-field breakdown
    q("scan_by_field", QueryConfig(breakdowns = AttrParser.parse("event_type"))),

    // #3 two-field breakdown (order preserved)
    q("scan_by_two",
      QueryConfig(breakdowns = AttrParser.parse("event_type,user_id"))),

    // #4 krill eq filter + breakdown
    q("scan_filter_eq",
      QueryConfig(
        filter = Some(Cmp("eq", "event_type", "click")),
        breakdowns = AttrParser.parse("user_id"))),

    // #5 numeric comparison filters
    q("scan_filter_cmp",
      QueryConfig(
        filter = Some(And(Seq(
          Cmp("ge", "value", 100L), Cmp("lt", "value", 300L),
          Cmp("ne", "event_type", "error")))),
        breakdowns = AttrParser.parse("event_type"))),

    // #6 compound and/or
    q("scan_filter_bool",
      QueryConfig(
        filter = Some(And(Seq(
          Cmp("ge", "value", 50L),
          Or(Seq(Cmp("eq", "event_type", "click"),
                 Cmp("eq", "event_type", "view")))))),
        breakdowns = AttrParser.parse("event_type,user_id"))),

    // #7 power-of-two histogram ("value" is the count column, so the bucket
    // column borrows dragnet's field= attr for its output name)
    q("scan_quantize",
      QueryConfig(breakdowns = AttrParser.parse("bucket[field=value,aggr=quantize]"))),

    // #8 linear histogram
    q("scan_lquantize",
      QueryConfig(breakdowns =
        AttrParser.parse("bucket[field=value,aggr=lquantize,step=25]"))),

    // #9 date-parse synthetic field (string → unix secs), hourly buckets:
    // exercised through a projected ISO-string column so the string-parse
    // path (stream-synthetic.js analog) is what's under test.
    Q("scan_date_parse",
      (s, dir) => {
        val cfg = QueryConfig(breakdowns = Seq(
          FieldSpec("hour", "ts_str", isDate = true,
            aggr = Some("lquantize"), step = Some(3600))))
        val df = Sources.events(s, dir)
          .withColumn("ts_str", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        Scan.scan(df, cfg, rs)
      },
      Some {
        val cfg = QueryConfig(breakdowns = Seq(
          FieldSpec("hour", "ts_str", isDate = true,
            aggr = Some("lquantize"), step = Some(3600))))
        Scan.scanSql("events", cfg, {
          case "ts_str" =>
            "strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')"
          case f => f
        })
      }),

    // #9b the DATE-FORMAT CONTRACT pinned (r17 verdict "What's
    // missing" #2): the reference's synthetic date fields go through JS
    // Date.parse (stream-synthetic.js:68), which accepts ISO-8601 PLUS
    // implementation-defined extras (RFC-2822 etc. — ECMA-262 §21.4.3.2
    // mandates only the ISO format; the rest varies BY JS ENGINE, so it
    // is not a portable contract even among dragnet deployments). graft
    // pins the portable subset: numeric epoch-seconds and ISO-8601
    // strings parse; everything else is a baddate → row DROPPED (the
    // documented drop semantics, README.md:700-712). This query drives
    // a five-way format zoo — ISO 'T'+Z, ISO space-separated, ISO
    // date-only (midnight UTC), RFC-2822, garbage — through the same
    // projected-string path as scan_date_parse; the oracle replays the
    // CONTRACT (ISO forms parse, the last two drop), so a parser that
    // silently started accepting or rejecting a class hash-fails.
    Q("scan_date_formats",
      (s, dir) => {
        val cfg = QueryConfig(breakdowns = Seq(
          FieldSpec("day", "ts_str", isDate = true,
            aggr = Some("lquantize"), step = Some(86400)),
          FieldSpec.plain("fmt")))
        val v = col("user_id") % 5
        val df = Sources.events(s, dir)
          .withColumn("fmt", concat(lit("f"), v.cast("string")))
          .withColumn("ts_str",
            when(v === 0, date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
              .when(v === 1, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
              .when(v === 2, date_format(col("ts"), "yyyy-MM-dd"))
              .when(v === 3, date_format(col("ts"),
                "EEE, dd MMM yyyy HH:mm:ss 'GMT'"))
              .otherwise(lit("not a date")))
        Scan.scan(df, cfg, rs)
      },
      Some {
        val cfg = QueryConfig(breakdowns = Seq(
          FieldSpec("day", "ts_str", isDate = true,
            aggr = Some("lquantize"), step = Some(86400)),
          FieldSpec.plain("fmt")))
        Scan.scanSql("events", cfg, {
          case "fmt" => "'f' || CAST(user_id % 5 AS VARCHAR)"
          case "ts_str" =>
            // the contract, not the string: ISO forms round-trip
            // through strptime; RFC-2822 and garbage are NULL (dropped)
            "CASE user_id % 5 " +
              "WHEN 0 THEN strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'), " +
                "'%Y-%m-%dT%H:%M:%SZ') " +
              "WHEN 1 THEN strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), " +
                "'%Y-%m-%d %H:%M:%S') " +
              "WHEN 2 THEN CAST(CAST(ts AS DATE) AS TIMESTAMP) " +
              "ELSE NULL END"
          case f => f
        })
      }),

    // #10 per-day counts by type
    q("scan_per_day",
      QueryConfig(breakdowns =
        perDay +: AttrParser.parse("event_type"))),

    // #11 --after/--before time bounds (inclusive/exclusive, ceil-seconds)
    q("scan_time_bounds",
      QueryConfig(
        breakdowns = AttrParser.parse("event_type"),
        timeField = Some("ts"),
        after = Some(Instant.parse("2024-01-02T06:30:15.500Z")),
        before = Some(Instant.parse("2024-01-04T12:00:00Z")))),

    // #12 nested dotted path into JSON props
    q("scan_nested_json",
      QueryConfig(
        filter = Some(Cmp("ne", "event_type", "signup")),
        breakdowns = Seq(
          FieldSpec("k_bucket", "props.k", aggr = Some("quantize")),
          FieldSpec.plain("event_type")))),

    // #16 rows with null/invalid breakdown values are dropped, not grouped:
    // nullif(k, 0) forces nulls through the aggr path.
    Q("scan_drop_invalid",
      (s, dir) => {
        val df = Sources.events(s, dir)
          .withColumn("k_nz", when(col("props.k") =!= 0, col("props.k")))
        Scan.scan(df,
          QueryConfig(breakdowns = AttrParser.parse("k_nz[aggr=quantize]")), rs)
      },
      Some(Scan.scanSql("events",
        QueryConfig(breakdowns = AttrParser.parse("k_nz[aggr=quantize]")),
        { case "k_nz" => "NULLIF(CAST(props->>'k' AS INTEGER), 0)"
          case f => f }))),

    // #16b --counters/--warnings: per-stage drop accounting (input =
    // filter_dropped + time_dropped + invalid_dropped + aggregated)
    Q("scan_counters",
      (s, dir) => {
        val cfg = countersCfg
        Scan.counters(Sources.events(s, dir), cfg, rs)
      },
      Some(Scan.countersSql("events", countersCfg, rq))),

    // #16c --warnings: per-record drop diagnostics (reference-shaped
    // `field "F" is undefined` / non-numeric messages, first failing
    // stage per record), aggregated by message so the oracle check is
    // order-free. Derived columns force both warning shapes: k_nz is
    // NULL where k=0 (filter EVAL failure — the only filter drop that
    // warns) and `mix` is non-numeric for every third user (aggr cast
    // failure). The bad-date shape needs a string time field, which the
    // DuckDB epoch() twin can't replay — DnSpec covers it.
    Q("scan_warnings",
      (s, dir) => {
        val df = Sources.events(s, dir)
          .withColumn("k_nz", when(col("props.k") =!= 0, col("props.k")))
          .withColumn("mix", when(col("user_id") % 3 === 0, lit("xx"))
            .otherwise(col("user_id").cast("string")))
        Scan.warnings(df, warningsCfg, rs)
          .groupBy(col("warning"))
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy(col("warning"))
      },
      Some(s"""
        SELECT warning, CAST(COUNT(*) AS BIGINT) AS n
        FROM (${Scan.warningsSql("events", warningsCfg, {
          case "k_nz" => "NULLIF(CAST(props->>'k' AS INTEGER), 0)"
          case "mix" =>
            "CASE WHEN user_id % 3 = 0 THEN 'xx' ELSE CAST(user_id AS VARCHAR) END"
          case f => f
        })})
        GROUP BY 1 ORDER BY 1""")),

    // #17 skinner-points round trip: aggregate to points, re-aggregate
    // weighting by `value` (dragnet --points / --data-format=json-skinner).
    Q("points_reagg",
      (s, dir) => {
        val points = Scan.scan(Sources.events(s, dir),
          QueryConfig(breakdowns = AttrParser.parse("event_type,user_id")), rs)
        Scan.scan(points,
          QueryConfig(
            breakdowns = AttrParser.parse("event_type"),
            valueField = Some("value")), rs)
      },
      // Equivalent direct count — the round trip must be lossless.
      Some(Scan.scanSql("events",
        QueryConfig(breakdowns = AttrParser.parse("event_type")), rq)))
  )
}

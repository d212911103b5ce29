package graft

import java.time.Instant

import org.apache.spark.sql.Row

import graft.filter.Cmp

/** Scan semantics vs hand counts (reference behaviors: README.md:44-230,
  * lib/stream-scan.js, lib/stream-synthetic.js). */
class ScanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    // (host, latency, time)
    ("a", 1L, "2014-04-01T00:00:00Z"),
    ("a", 3L, "2014-04-01T01:00:00Z"),
    ("b", 4L, "2014-04-01T23:59:59Z"),
    ("b", 17L, "2014-04-02T00:00:00Z"),
    ("c", 100L, "2014-04-03T12:00:00Z")
  ).toDF("host", "latency", "time")

  test("count all records (no breakdowns)") {
    val out = Scan.scan(df, QueryConfig())
    assert(out.collect().toSeq == Seq(Row(5L)))
  }

  test("breakdown by one field, ordered") {
    val out = Scan.scan(df, QueryConfig(breakdowns = Seq(FieldSpec.plain("host"))))
    assert(out.collect().toSeq ==
      Seq(Row("a", 2L), Row("b", 2L), Row("c", 1L)))
  }

  test("quantize buckets are powers of two") {
    val cfg = QueryConfig(breakdowns =
      AttrParser.parse("latency[aggr=quantize]"))
    val out = Scan.scan(df, cfg).collect().toSeq
    // 1→1, 3→2, 4→4, 17→16, 100→64
    assert(out == Seq(Row(1L, 1L), Row(2L, 1L), Row(4L, 1L),
      Row(16L, 1L), Row(64L, 1L)))
  }

  test("aggr breakdown works in non-terminal position too") {
    // reference scan_testcases.sh: "Quantization followed by normal
    // fields: no histogram" — only the DISPLAY treats a trailing aggr
    // specially; the grouping is position-independent
    val lead = Scan.scan(df, QueryConfig(breakdowns =
      AttrParser.parse("latency[aggr=quantize],host")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val trail = Scan.scan(df, QueryConfig(breakdowns =
      AttrParser.parse("host,latency[aggr=quantize]")))
      .collect().map(r => (r.getLong(1), r.getString(0), r.getLong(2))).toSet
    assert(lead == trail && lead.nonEmpty)
  }

  test("lquantize buckets are linear") {
    val cfg = QueryConfig(breakdowns =
      AttrParser.parse("latency[aggr=lquantize,step=10]"))
    val out = Scan.scan(df, cfg).collect().toSeq
    assert(out == Seq(Row(0L, 3L), Row(10L, 1L), Row(100L, 1L)))
  }

  test("fractional lquantize step keeps DOUBLE bucket labels " +
      "(QueryFuzzSpec seed-19 find: the long cast truncated in Spark " +
      "but rounded in DuckDB, merging neighbor buckets differently)") {
    import spark.implicits._
    val vals = Seq(0.2, 0.6, 1.0, 1.5, 1.7, -0.3).map(Tuple1(_))
      .toDF("x")
    val cfg = QueryConfig(breakdowns = Seq(
      FieldSpec("b", "x", aggr = Some("lquantize"), step = Some(0.5))))
    val out = Scan.scan(vals, cfg).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((-0.5, 1L), (0.0, 1L), (0.5, 1L), (1.0, 1L),
      (1.5, 2L)),
      s"fractional buckets wrong: $out")
  }

  test("date parse + per-day bucketing; filter applies before grouping") {
    val cfg = QueryConfig(
      filter = Some(Cmp("ne", "host", "c")),
      breakdowns = AttrParser.parse("day[date,field=time,aggr=lquantize,step=86400]"))
    val out = Scan.scan(df, cfg).collect().toSeq
    val d1 = Instant.parse("2014-04-01T00:00:00Z").getEpochSecond
    val d2 = Instant.parse("2014-04-02T00:00:00Z").getEpochSecond
    assert(out == Seq(Row(d1, 3L), Row(d2, 1L)))
  }

  test("unparseable dates drop the row (reference: stream-synthetic.js)") {
    val bad = Seq(("x", "not-a-date"), ("y", "2014-04-01T00:00:00Z"))
      .toDF("host", "time")
    val cfg = QueryConfig(breakdowns = AttrParser.parse("t[date,field=time]"))
    assert(Scan.scan(bad, cfg).count() == 1)
  }

  test("date-format contract: ISO-8601 parses, Date.parse extras drop " +
      "(ECMA-262 mandates only ISO; the rest is per-JS-engine)") {
    val epoch = Instant.parse("2014-04-01T12:30:45Z").getEpochSecond
    // (string, Some(expected epoch secs) | None = baddate → row drop)
    val zoo: Seq[(String, Option[Long])] = Seq(
      "2014-04-01T12:30:45Z" -> Some(epoch),          // ISO T + Z
      "2014-04-01 12:30:45" -> Some(epoch),           // ISO space form
      "2014-04-01T12:30:45.250Z" -> Some(epoch),      // fractional: FLOOR
      "2014-04-01T12:30:45+00:00" -> Some(epoch),     // explicit offset
      "2014-04-01T14:30:45+02:00" -> Some(epoch),     // non-UTC offset
      "2014-04-01" -> Some(epoch - 45 - 30 * 60 - 12 * 3600), // date-only
      // the implementation-defined Date.parse extras graft REJECTS:
      "Tue, 01 Apr 2014 12:30:45 GMT" -> None,        // RFC 2822
      "Apr 1, 2014" -> None,                          // US month-name
      "04/01/2014" -> None,                           // slash date
      "not a date" -> None,
      "" -> None)
    val in = zoo.zipWithIndex.map { case ((t, _), i) => (i.toLong, t) }
      .toDF("id", "time")
    val cfg = QueryConfig(breakdowns = Seq(
      FieldSpec("t", "time", isDate = true), FieldSpec.plain("id")))
    val got = Scan.scan(in, cfg).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    zoo.zipWithIndex.foreach { case ((str, want), i) =>
      assert(got.get(i.toLong) == want,
        s"'$str': got ${got.get(i.toLong)}, want $want")
    }
  }

  test("time bounds: after inclusive, before exclusive, ceil to seconds") {
    val cfg = QueryConfig(
      breakdowns = Seq(FieldSpec.plain("host")),
      timeField = Some("time"),
      after = Some(Instant.parse("2014-04-01T00:59:59.400Z")), // ceil → 01:00:00
      before = Some(Instant.parse("2014-04-02T00:00:00Z")))    // excludes 04-02
    val out = Scan.scan(df, cfg).collect().toSeq
    assert(out == Seq(Row("a", 1L), Row("b", 1L)))
  }

  test("time bounds without timeField throw") {
    assertThrows[GraftException](Scan.scan(df,
      QueryConfig(after = Some(Instant.EPOCH))))
  }

  test("value-weighted points re-aggregate (skinner points in)") {
    val pts = Seq(("a", 3L), ("a", 4L), ("b", 1L)).toDF("host", "value")
    val cfg = QueryConfig(breakdowns = Seq(FieldSpec.plain("host")),
      valueField = Some("value"))
    assert(Scan.scan(pts, cfg).collect().toSeq ==
      Seq(Row("a", 7L), Row("b", 1L)))
  }

  test("scanSql oracle text and Spark plan agree on the events table") {
    val ev = graft.sources.Sources.events(spark, sf001)
    val cfg = QueryConfig(
      filter = Some(Cmp("eq", "event_type", "click")),
      breakdowns = Seq(FieldSpec.plain("user_id"), FieldSpec.plain("event_type")))
    val sparkRows = Scan.scan(ev, cfg).collect().map(_.toSeq).toSeq
    // scanSql is checked end-to-end by tools/check.py against DuckDB;
    // here we at least pin the generated SQL's shape.
    val sql = Scan.scanSql("events", cfg)
    assert(sql.contains("GROUP BY 1, 2") && sql.contains("(event_type = 'click')"))
    assert(sparkRows.nonEmpty)
  }
}

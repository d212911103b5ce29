package graft

import java.nio.file.Files

import org.apache.spark.sql.Row

/** The dn CLI: scan / build / query flag parity with the reference tool
  * (README.md:44-230, tests/dn/local). */
class DnSpec extends SparkSpec {

  // a copy with a standard TIMESTAMP(MICROS) ts — the testdata file uses
  // TIMESTAMP(NANOS), which only Sources.events knows how to rebuild
  private lazy val events: String = {
    val dir = Files.createTempDirectory("graft-dn-events").toString
    graft.sources.Sources.events(spark, sf001)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    s"$dir/events.parquet"
  }

  test("scan: count, breakdowns, filter, quantize via flags") {
    assert(Dn.run(spark, Seq("scan", s"--data=$events")).collect()
      .head.getLong(0) > 0)
    val by = Dn.run(spark, Seq("scan", s"--data=$events",
      "--breakdowns=event_type",
      """--filter={"ne": ["event_type", "error"]}"""))
      .collect().map(r => r.getString(0)).toSeq
    assert(by.nonEmpty && !by.contains("error"))
    val q = Dn.run(spark, Seq("scan", s"--data=$events",
      "--breakdowns=v[field=value,aggr=quantize]")).collect()
    q.foreach { r =>
      val b = r.getLong(0)
      assert(b == 0 || (b & (b - 1)) == 0, s"not a power of two: $b")
    }
  }

  test("build + query round-trips through a default metric") {
    val idx = Files.createTempDirectory("graft-dn-index").toString
    Dn.run(spark, Seq("build", s"--data=$events", s"--index=$idx",
      "--breakdowns=event_type,user_id", "--time-field=ts"))
    val viaIndex = Dn.run(spark, Seq("query", s"--index=$idx",
      "--breakdowns=event_type", "--metric-breakdowns=event_type,user_id"))
      .collect().map(_.toSeq).toSet
    val viaScan = Dn.run(spark, Seq("scan", s"--data=$events",
      "--breakdowns=event_type")).collect().map(_.toSeq).toSet
    assert(viaIndex == viaScan)
  }

  test("time bounds prune and filter through the CLI") {
    val all = Dn.run(spark, Seq("scan", s"--data=$events")).collect()
      .head.getLong(0)
    val bounded = Dn.run(spark, Seq("scan", s"--data=$events",
      "--time-field=ts", "--after=2024-01-03T00:00:00Z")).collect()
      .head.getLong(0)
    assert(bounded > 0 && bounded < all)
  }

  test("bad arguments throw GraftException") {
    assertThrows[GraftException](Dn.parseArgs(Nil))
    assertThrows[GraftException](Dn.parseArgs(Seq("frobnicate")))
    assertThrows[GraftException](Dn.parseArgs(Seq("scan", "positional")))
    assertThrows[GraftException](Dn.run(spark, Seq("scan")))
    assertThrows[GraftException](Dn.run(spark, Seq("build", s"--data=$events")))
  }

  test("histogram rendering shows scaled bars per bucket") {
    val df = Dn.run(spark, Seq("scan", s"--data=$events",
      "--breakdowns=v[field=value,aggr=quantize]"))
    val out = Format.histogram(df)
    assert(out.contains("Distribution"))
    assert(out.linesIterator.exists(l => l.contains("|@")))
    // grouped variant: leading breakdown renders one histogram per group
    val df2 = Dn.run(spark, Seq("scan", s"--data=$events",
      "--breakdowns=event_type,v[field=value,aggr=quantize]"))
    val out2 = Format.histogram(df2)
    assert(out2.contains("event_type=click"))
  }
}

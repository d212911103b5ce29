package graft

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.filter.Krill
import graft.index.Index
import graft.index.Index.Metric
import graft.sources.Sources

/**
 * CLI parity with the reference's `dn` tool (README.md:9-14): scan raw
 * data, build an index, query an index — same flags, library underneath.
 *
 *   dn scan  --data=PATH --breakdowns=SPECS [--filter=KRILL_JSON]
 *            [--time-field=F] [--after=ISO] [--before=ISO] [--points]
 *   dn build --data=PATH --index=PATH --breakdowns=SPECS
 *            [--filter=…] --time-field=F [--interval=day|hour|all]
 *   dn query --index=PATH --breakdowns=SPECS [--filter=…]
 *            [--time-field=F] [--after=ISO] [--before=ISO]
 *
 * `--data` reads parquet when the path ends in .parquet, a `%Y/%m-%d`
 * ndjson tree when the directory looks date-laid-out (file pruning by
 * --after/--before, like the reference), plain ndjson otherwise.
 * `run(...)` is the testable surface; `main` prints the result (with
 * dragnet-style histograms for trailing aggr columns via [[Format]]).
 */
object Dn {

  final case class DnArgs(
      mode: String,
      flags: Map[String, String],
      points: Boolean,
      counters: Boolean)

  private val knownFlags = Set("data", "breakdowns", "filter", "time-field",
    "after", "before", "index", "interval", "metric-breakdowns",
    "data-format")

  def parseArgs(argv: Seq[String]): DnArgs = {
    if (argv.isEmpty)
      throw new GraftException("usage: dn scan|build|query --flag=value …")
    val mode = argv.head
    if (!Set("scan", "build", "query").contains(mode))
      throw new GraftException(s"unknown command: $mode")
    var points = false
    var counters = false
    val flags = argv.tail.flatMap {
      case "--points" => points = true; None
      case "--counters" | "--warnings" => counters = true; None
      case f if f.startsWith("--") && f.contains("=") =>
        val i = f.indexOf('=')
        val key = f.substring(2, i)
        // reject typos instead of silently computing the wrong answer
        if (!knownFlags.contains(key))
          throw new GraftException(s"unknown flag: --$key")
        Some(key -> f.substring(i + 1))
      case other => throw new GraftException(s"bad argument: $other")
    }.toMap
    if (counters && mode != "scan")
      throw new GraftException("--counters is only meaningful with scan")
    if (counters && points)
      throw new GraftException("--counters and --points are mutually exclusive")
    DnArgs(mode, flags, points, counters)
  }

  private def cfgOf(a: DnArgs): QueryConfig = QueryConfig(
    filter = a.flags.get("filter").map(Krill.parse),
    breakdowns = a.flags.get("breakdowns").map(AttrParser.parse).getOrElse(Nil),
    timeField = a.flags.get("time-field"),
    after = a.flags.get("after").map(Instant.parse),
    before = a.flags.get("before").map(Instant.parse))

  /** Resolve --data to a DataFrame (parquet / json-skinner /
    * date-layout ndjson / ndjson). */
  def readData(spark: SparkSession, a: DnArgs): DataFrame = {
    val path = a.flags.getOrElse("data",
      throw new GraftException("--data is required"))
    val cfg = cfgOf(a)
    if (a.flags.get("data-format").contains("json-skinner"))
      Sources.skinnerPoints(spark, path)
    else if (path.endsWith(".parquet")) spark.read.parquet(path)
    else if (Sources.dateLayoutDirs(spark, path, None, None).nonEmpty)
      Sources.dateLayout(spark, path, cfg.after, cfg.before)
    else Sources.ndjson(spark, path)
  }

  /** Whether --data names a %Y/%m-%d tree (bounds already pruned by path). */
  private def isDateTree(spark: SparkSession, a: DnArgs): Boolean =
    a.flags.get("data").exists(p =>
      !p.endsWith(".parquet") &&
        !a.flags.get("data-format").contains("json-skinner") &&
        Sources.dateLayoutDirs(spark, p, None, None).nonEmpty)

  def run(spark: SparkSession, argv: Seq[String]): DataFrame = {
    val a = parseArgs(argv)
    val cfg0 = cfgOf(a)
    // A date-laid-out tree without --time-field is still boundable: the
    // path enumeration prunes to day granularity (exactly the reference's
    // behavior when only the path carries time). Record-level bounds
    // need --time-field.
    val cfg =
      if (cfg0.timeField.isEmpty && isDateTree(spark, a))
        cfg0.copy(after = None, before = None)
      else cfg0
    a.mode match {
      case "scan" =>
        val base = cfg.copy(valueField =
          if (a.flags.get("data-format").contains("json-skinner"))
            Some("value") else None)
        if (a.counters)
          return Scan.counters(readData(spark, a), base)
        val out = Scan.scan(readData(spark, a), base)
        // --points: emit skinner-format points (fields struct + weight),
        // the reference's machine-readable output mode
        if (a.points && base.breakdowns.nonEmpty)
          out.select(org.apache.spark.sql.functions.struct(
            base.breakdowns.map(fs =>
              org.apache.spark.sql.functions.col(fs.name)): _*).as("fields"),
            org.apache.spark.sql.functions.col("value"))
        else out
      case "build" =>
        val idx = a.flags.getOrElse("index",
          throw new GraftException("--index is required"))
        val tf = a.flags.getOrElse("time-field",
          throw new GraftException("build needs --time-field"))
        val metric = Metric("default", cfg.breakdowns, cfg.filter)
        Index.build(readData(spark, a), Seq(metric), idx, tf,
          a.flags.getOrElse("interval", "day"),
          valueField =
            if (a.flags.get("data-format").contains("json-skinner"))
              Some("value") else None)
        spark.emptyDataFrame
      case "query" =>
        val idx = a.flags.getOrElse("index",
          throw new GraftException("--index is required"))
        val metric = Metric("default",
          a.flags.get("metric-breakdowns").orElse(a.flags.get("breakdowns"))
            .map(AttrParser.parse).getOrElse(Nil), None)
        Index.query(spark, idx, Seq(metric), cfg)
    }
  }

  def main(argv: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = run(spark, argv.toSeq)
    val a = parseArgs(argv.toSeq)
    val lastAggr = a.flags.get("breakdowns").map(AttrParser.parse)
      .getOrElse(Nil).lastOption.exists(_.aggr.isDefined)
    if (df.schema.nonEmpty) {
      if (lastAggr && !a.points && !a.counters) print(Format.histogram(df))
      else df.show(1000, truncate = false)
    }
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Datasource layer. Dragnet reads newline-separated JSON from local files or
 * Manta and prunes input files by a %Y/%m-%d path layout (reference:
 * lib/datasource-file.js, lib/fs-find.js, lib/path-enum.js). On Spark the
 * same roles are played by `spark.read.json` (nested structs ≡ dotted field
 * paths), parquet, and partition pruning on a date-derived column.
 */
object Sources {

  /** Schema METADATA cache for [[parquet]] — (qualified path →
    * (mtime, schema)). Only the StructType is cached, never rows or
    * file listings: every query still reads its data from the parquet
    * bytes. Rationale (r19, guide §6): `spark.read.parquet` re-infers
    * the schema from file footers on EVERY call — a driver-side
    * footer-read job per query per table (measured ~130 ms at sf0.1,
    * and at 100 TB inference touches every file's footer). Production
    * engines serve schemas from catalog metadata (Hive/Iceberg); this
    * cache is that move for the path-addressed layout. Invalidation:
    * the path's modification time — a rebuilt or swapped artifact
    * re-infers (two-rename swaps and fresh builds both touch the
    * root's mtime); appends into an existing layout keep the schema by
    * contract (appendLexicon/store appends are schema-detected against
    * the store they extend). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Long, org.apache.spark.sql.types.StructType)]()

  /** `spark.read.parquet(path)` with the inferred schema memoized per
    * (path, mtime) — identical frame, no per-call footer job. Falls
    * back to plain inference on any FS probe failure. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val st = fs.getFileStatus(p)
      val key = fs.makeQualified(p).toString
      val mt = st.getModificationTime
      val hit = schemaCache.get(key)
      val sch = if (hit != null && hit._1 == mt) hit._2
      else {
        val s0 = spark.read.parquet(path).schema
        schemaCache.put(key, (mt, s0))
        s0
      }
      spark.read.schema(sch).parquet(path)
    } catch {
      case _: java.io.IOException => spark.read.parquet(path)
    }

  /** Read a testdata star-schema table. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    parquet(spark, s"$sfDir/$name.parquet")

  /**
   * The events table with its `props` JSON string parsed to a struct so that
   * dragnet-style dotted paths (`props.k`) resolve naturally.
   */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark 4 rejects;
    // read it as raw nanos and rebuild a (microsecond) TimestampType column.
    // Tables from other producers (e.g. a MakeScale derivation) may carry
    // ts as a plain long of nanos or an ordinary timestamp already — only
    // the long form needs the rebuild.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // json_tuple, not from_json: a Generator is a predicate-pushdown
    // barrier, so each record's JSON is parsed exactly once no matter how
    // many filters/breakdowns reference props.* — from_json gets inlined
    // into every pushed predicate (one parse per reference per row).
    val raw = table(spark, sfDir, "events")
    val tsIsNanos =
      raw.schema("ts").dataType == org.apache.spark.sql.types.LongType
    raw
      .withColumn("ts", if (tsIsNanos)
        timestamp_micros((col("ts") / 1000L).cast("long")) else col("ts"))
      .select(col("*"), json_tuple(col("props"), "k").as("k_json"))
      .withColumn("props", struct(col("k_json").try_cast("int").as("k")))
      .drop("k_json")
  }

  /**
   * Newline-separated JSON datasource — dragnet's native format
   * (README.md:33). Schema inference handles nested objects; dotted paths
   * (`req.method`) then resolve as struct field access.
   */
  /** Options mirroring the reference reader's behavior (lib/fs-find.js
    * + bin/dn warn-and-skip): walk the datasource tree RECURSIVELY (a
    * path-only datasource-add scans nested `%Y/%m-%d` layouts without
    * declaring them) and DROP malformed lines (tests/data plants an
    * "intentionally invalid line"; the reference warns and skips it —
    * counting it would put 2253 where the README prints 2252). */
  private val NdjsonOpts =
    Map("recursiveFileLookup" -> "true", "mode" -> "DROPMALFORMED")

  def ndjson(spark: SparkSession, path: String): DataFrame =
    spark.read.options(NdjsonOpts).json(path)

  /**
   * Read dragnet's json-skinner point format — ndjson of
   * `{"fields": {…record…}, "value": N}` (reference:
   * lib/format-json.js SkinnerAdapterStream, lib/dragnet-impl.js
   * parserFor) — flattened to record columns plus the `value` weight.
   * Scan with `valueField = Some("value")` re-aggregates losslessly.
   */
  def skinnerPoints(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.options(NdjsonOpts).json(path)
    raw.select(col("fields.*"), col("value"))
  }

  /**
   * General strftime path layout (reference: lib/path-enum.js supports
   * any pattern built from %Y %m %d %H, e.g. `%Y/%m/%d/%H` or
   * `%Y/%m-%d`): walk the FS tree level by level matching each pattern
   * segment, parse the time of every matched leaf directory, and keep
   * those whose [start, start+granularity) interval overlaps
   * [after, before). Metadata-only (Hadoop FS listings — works on any
   * scheme), conservative to the pattern's finest unit like the
   * reference; exact record-level bounds still apply in the scan.
   * Returns (interval start, path) sorted by time.
   */
  def timeFormatDirs(spark: SparkSession, root: String, pattern: String,
      after: Option[java.time.Instant], before: Option[java.time.Instant])
      : Seq[(java.time.Instant, String)] = {
    import org.apache.hadoop.fs.Path
    val segSpecs: Seq[(scala.util.matching.Regex, Seq[Char])] =
      pattern.split("/").toSeq.map { seg =>
        val sb = new StringBuilder
        val specs = Seq.newBuilder[Char]
        var i = 0
        while (i < seg.length) {
          if (seg.charAt(i) == '%' && i + 1 < seg.length) {
            seg.charAt(i + 1) match {
              case 'Y' => sb.append("(\\d{4})"); specs += 'Y'
              case c @ ('m' | 'd' | 'H') => sb.append("(\\d{2})"); specs += c
              case other => throw new graft.GraftException(
                s"unsupported time-format specifier %$other in $pattern")
            }
            i += 2
          } else {
            sb.append(java.util.regex.Pattern.quote(seg.charAt(i).toString))
            i += 1
          }
        }
        (sb.toString.r, specs.result())
      }
    val allSpecs = segSpecs.flatMap(_._2)
    if (!allSpecs.contains('Y'))
      throw new graft.GraftException(s"time-format needs %Y: $pattern")
    val granularity: java.time.temporal.TemporalAmount =
      if (allSpecs.contains('H')) java.time.Duration.ofHours(1)
      else if (allSpecs.contains('d')) java.time.Duration.ofDays(1)
      else if (allSpecs.contains('m')) java.time.Period.ofMonths(1)
      else java.time.Period.ofYears(1)

    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var frontier: Seq[(Path, Map[Char, Int])] = Seq((rootPath, Map.empty))
    for ((re, specs) <- segSpecs) {
      frontier = frontier.flatMap { case (p, vals) =>
        fs.listStatus(p).toSeq.filter(_.isDirectory).flatMap { st =>
          re.unapplySeq(st.getPath.getName) match {
            case Some(groups) =>
              Some((st.getPath, vals ++ specs.zip(groups.map(_.toInt))))
            case None => None
          }
        }
      }
    }
    val dirs = frontier.flatMap { case (p, v) =>
      try {
        val start = java.time.LocalDateTime.of(
          v('Y'), v.getOrElse('m', 1), v.getOrElse('d', 1),
          v.getOrElse('H', 0), 0)
          .toInstant(java.time.ZoneOffset.UTC)
        Some((start, p.toString))
      } catch { case _: java.time.DateTimeException => None } // e.g. month 13
    }
    dirs.filter { case (start, _) =>
      val end = start.atZone(java.time.ZoneOffset.UTC).plus(granularity)
        .toInstant
      after.forall(a => end.isAfter(a)) && before.forall(b => start.isBefore(b))
    }.sortBy(_._1)
  }

  /**
   * Read any strftime-pattern ndjson layout, scanning ONLY directories
   * overlapping [after, before); schema-preserving empty frame when all
   * are pruned (like [[dateLayout]]).
   */
  def timeFormatLayout(spark: SparkSession, root: String, pattern: String,
      after: Option[java.time.Instant] = None,
      before: Option[java.time.Instant] = None): DataFrame = {
    val dirs = timeFormatDirs(spark, root, pattern, after, before).map(_._2)
    if (dirs.nonEmpty) spark.read.options(NdjsonOpts).json(dirs: _*)
    else timeFormatDirs(spark, root, pattern, None, None).map(_._2) match {
      case all if all.nonEmpty => spark.read.options(NdjsonOpts).json(all.head).limit(0)
      case _ => spark.emptyDataFrame
    }
  }

  /**
   * Enumerate the day directories of a dragnet-style `%Y/%m-%d` layout
   * that can contain records in [after, before) — the default layout's
   * autodetect path, expressed through the general [[timeFormatDirs]].
   */
  def dateLayoutDirs(spark: SparkSession, root: String,
      after: Option[java.time.Instant], before: Option[java.time.Instant])
      : Seq[(java.time.LocalDate, String)] =
    timeFormatDirs(spark, root, "%Y/%m-%d", after, before).map { case (t, p) =>
      (t.atZone(java.time.ZoneOffset.UTC).toLocalDate, p)
    }

  /**
   * Read a `%Y/%m-%d` ndjson dataset, scanning ONLY day directories that
   * overlap [after, before). When every day is pruned, the frame is
   * empty but keeps the dataset's schema (inferred from one unpruned
   * directory, limit 0) so downstream scans still resolve their columns
   * and return zero rows instead of failing analysis.
   */
  def dateLayout(spark: SparkSession, root: String,
      after: Option[java.time.Instant] = None,
      before: Option[java.time.Instant] = None): DataFrame = {
    val dirs = dateLayoutDirs(spark, root, after, before).map(_._2)
    if (dirs.nonEmpty) spark.read.options(NdjsonOpts).json(dirs: _*)
    else dateLayoutDirs(spark, root, None, None).map(_._2) match {
      case all if all.nonEmpty => spark.read.options(NdjsonOpts).json(all.head).limit(0)
      case _ => spark.emptyDataFrame
    }
  }
}

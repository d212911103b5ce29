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

  /** Read a testdata star-schema table. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /**
   * The events table with its `props` JSON string parsed to a struct so that
   * dragnet-style dotted paths (`props.k`) resolve naturally.
   */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark 4 rejects;
    // read it as raw nanos and rebuild a (microsecond) TimestampType column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // json_tuple, not from_json: a Generator is a predicate-pushdown
    // barrier, so each record's JSON is parsed exactly once no matter how
    // many filters/breakdowns reference props.* — from_json gets inlined
    // into every pushed predicate (one parse per reference per row).
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      .select(col("*"), json_tuple(col("props"), "k").as("k_json"))
      .withColumn("props", struct(col("k_json").try_cast("int").as("k")))
      .drop("k_json")
  }

  /**
   * Newline-separated JSON datasource — dragnet's native format
   * (README.md:33). Schema inference handles nested objects; dotted paths
   * (`req.method`) then resolve as struct field access.
   */
  def ndjson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /**
   * Read dragnet's json-skinner point format — ndjson of
   * `{"fields": {…record…}, "value": N}` (reference:
   * lib/format-json.js SkinnerAdapterStream, lib/dragnet-impl.js
   * parserFor) — flattened to record columns plus the `value` weight.
   * Scan with `valueField = Some("value")` re-aggregates losslessly.
   */
  def skinnerPoints(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    raw.select(col("fields.*"), col("value"))
  }

  private val dayDirRe = "(\\d{2})-(\\d{2})".r
  private val yearRe = "\\d{4}".r

  /**
   * Enumerate the day directories of a dragnet-style `%Y/%m-%d` layout
   * that can contain records in [after, before) — the Spark analog of the
   * reference's path pruning (lib/path-enum.js, lib/fs-find.js): a
   * metadata-only listing through the Hadoop FS API (works on any
   * scheme), conservative to the day like the reference, with exact
   * record-level bounds still applied by the scan.
   */
  def dateLayoutDirs(spark: SparkSession, root: String,
      after: Option[java.time.Instant], before: Option[java.time.Instant])
      : Seq[(java.time.LocalDate, String)] = {
    import org.apache.hadoop.fs.Path
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val days = for {
      y <- fs.listStatus(rootPath).toSeq
      if y.isDirectory && yearRe.matches(y.getPath.getName)
      d <- fs.listStatus(y.getPath).toSeq
      if d.isDirectory
      date <- d.getPath.getName match {
        case dayDirRe(m, dd) =>
          try Some(java.time.LocalDate.of(y.getPath.getName.toInt, m.toInt, dd.toInt))
          catch { case _: java.time.DateTimeException => None }
        case _ => None
      }
    } yield (date, d.getPath.toString)
    days.filter { case (date, _) =>
      val start = date.atStartOfDay(java.time.ZoneOffset.UTC).toInstant
      val end = start.plus(java.time.Duration.ofDays(1))
      after.forall(a => end.isAfter(a)) && before.forall(b => start.isBefore(b))
    }.sortBy(_._1)
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
    if (dirs.nonEmpty) spark.read.json(dirs: _*)
    else dateLayoutDirs(spark, root, None, None).map(_._2) match {
      case all if all.nonEmpty => spark.read.json(all.head).limit(0)
      case _ => spark.emptyDataFrame
    }
  }
}

package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{FieldSpec, GraftException, QueryConfig, Scan}

/**
 * The index layer: dragnet's `dn build` / `dn query`
 * (reference: lib/index-sink.js, lib/index-query.js, README.md:345-420)
 * re-expressed Spark-first.
 *
 * Dragnet writes one sqlite file per day/hour containing the aggregated
 * tuples for each predefined metric, then answers queries by scanning only
 * the index files in the requested time range. The Spark-native analog is a
 * parquet dataset per metric, pre-aggregated to the metric's grain and
 * partitioned by `dn_date` (and `dn_hour` for hourly intervals):
 *
 *  - per-day sqlite files        → hive-style `dn_date=…` partitions
 *  - file pruning by time range  → Catalyst partition pruning (metadata only)
 *  - sqlite row scans            → columnar parquet + pushed filters
 *  - "sum the value column"      → Scan with valueField = "value"
 *
 * At 100 TB this is the layout you want anyway: the index is tiny relative
 * to raw data (unique tuples only), splittable, and time-sliced queries
 * never touch out-of-range partitions.
 */
object Index {

  /** A predefined metric (dragnet `dn metric-add`): a name plus the
    * breakdown columns gathered for it. */
  final case class Metric(name: String, breakdowns: Seq[FieldSpec],
                          filter: Option[graft.filter.Pred] = None)

  val Intervals = Set("day", "hour", "all")

  /** Storage layout: one tree per interval under the index root — the
    * analog of dragnet's by_day/ by_hour/ all-time sqlite directories
    * (lib/index-sink.js) — so day and hour indexes of the same metric
    * coexist and `dn query --interval` selects one. */
  def metricPath(path: String, interval: String, metric: String): String =
    s"$path/by_$interval/$metric"

  /**
   * The aggregated tuples one metric's index would contain (dragnet
   * `dn index-scan` — compute without writing): filter → breakdown dims
   * (+ day/hour partition columns) → pre-summed value.
   */
  def scanRows(df: DataFrame, m: Metric, timeField: String,
               interval: String = "day", resolve: String => Column = col,
               valueField: Option[String] = None): DataFrame = {
    require(Intervals.contains(interval), s"bad interval: $interval")
    var cur = df
    m.filter.foreach(p => cur = cur.where(p.toColumn(resolve)))
    val dims = m.breakdowns.map(fs => Scan.breakdownCol(fs, resolve).as(fs.name))
    // accept TIMESTAMP, ISO strings, or epoch-seconds numerics as the
    // time field (a date-parsed breakdown is epoch secs)
    val ts = resolve(timeField).try_cast("timestamp")
    val partCols = interval match {
      case "day" => Seq(date_format(ts, "yyyy-MM-dd").as("dn_date"))
      case "hour" => Seq(
        date_format(ts, "yyyy-MM-dd").as("dn_date"),
        hour(ts).as("dn_hour"))
      case "all" => Nil
    }
    // a day/hour index has nowhere to put a record whose time is
    // missing or unparseable — the reference warns and SKIPS it for
    // EVERY metric (tests/data plants time:"invalid" and a time-less
    // record; the README's `dn query` counts 2250 of 2252 records),
    // where try_cast alone would file them under a NULL partition
    if (interval != "all") cur = cur.where(ts.isNotNull)
    m.breakdowns.foreach { fs =>
      cur = cur.where(Scan.baseCol(fs, resolve).isNotNull)
    }
    cur.groupBy(dims ++ partCols: _*)
      .agg(sum(valueField.map(resolve).getOrElse(lit(1L)))
        .cast("long").as("value"))
  }

  /**
   * Build the index for each metric. `timeField` provides the partition
   * date/hour (reference: datasource --time-field). `valueField` weights
   * each input row (json-skinner points carry a `value` weight; raw
   * records weigh 1).
   */
  def build(df: DataFrame, metrics: Seq[Metric], path: String,
            timeField: String, interval: String = "day",
            resolve: String => Column = col,
            valueField: Option[String] = None): Unit = {
    require(Intervals.contains(interval), s"bad interval: $interval")
    // Each metric aggregates at its own grain (separate shuffles are
    // inherent), but the RAW SCAN must not repeat per metric — at 100 TB
    // a 3-metric build would read the corpus three times. Persist
    // (memory, spilling to disk) across the per-metric writes.
    val multi = metrics.lengthCompare(1) > 0
    if (multi)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try metrics.foreach { m =>
      val grouped = scanRows(df, m, timeField, interval, resolve, valueField)
      // Directory partitioning stops at the DAY even for hourly grain:
      // hour-level directories are a small-files/commit-storm anti-pattern
      // (24× the directories, tiny files). Instead dn_hour stays a data
      // column, sorted within each day's file, so hour predicates prune
      // via parquet row-group stats. Rows are clustered by day before the
      // write → exactly one file per day directory.
      val clustered = interval match {
        case "hour" => grouped.repartition(col("dn_date"))
          .sortWithinPartitions(col("dn_hour"))
        case "day"  => grouped.repartition(col("dn_date"))
        case "all"  => grouped
      }
      val mp = metricPath(path, interval, m.name)
      (if (interval == "all") clustered.write.mode("overwrite")
       else clustered.write.mode("overwrite").partitionBy("dn_date"))
        .parquet(mp)
      // A partitioned write of ZERO rows leaves only _SUCCESS — no
      // parquet footer, so a later read cannot infer the schema and the
      // "built" index is unqueryable. The reference's empty build is
      // queryable (tst.empty.sh: query over a /dev/null build returns 0).
      // Lay down one footer-only file carrying the full schema (dn_date
      // as a data column — pruning predicates still apply to it).
      // Hadoop FileSystem, not java.io.File: the index path may be
      // hdfs://, s3a://, or a file: URI where File.list() returns null
      // and the check would wrongly truncate a freshly built index.
      if (interval != "all") {
        val p = new org.apache.hadoop.fs.Path(mp)
        val fs = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
        val entries = fs.listStatus(p)
        if (!entries.exists(s =>
            s.isDirectory && s.getPath.getName.startsWith("dn_date=")))
          clustered.limit(0).write.mode("overwrite").parquet(mp)
        else
          // A dynamic-partition update over a previously EMPTY build adds
          // dn_date= dirs without clearing the root-level footer file; a
          // mixed-depth layout breaks partition discovery. Remove it.
          entries.filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
            .foreach(s => fs.delete(s.getPath, false))
      }
    } finally if (multi) df.unpersist(false)
  }

  /**
   * Incremental maintenance, dragnet's re-run of `dn build` over new days
   * (per-day sqlite files get added/replaced; reference:
   * lib/index-sink.js). Spark-native analog: dynamic partition overwrite —
   * ONLY the `dn_date` partitions present in `df` are replaced, the rest
   * of the index is untouched (no read-modify-write of the whole
   * dataset). Day interval only: replacement is day-granular (directories
   * are per-day even at hourly grain), so an "hour" update carrying a
   * partial day would silently erase that day's other hours.
   */
  def update(df: DataFrame, metrics: Seq[Metric], path: String,
             timeField: String, interval: String = "day",
             resolve: String => Column = col): Unit = {
    require(interval == "day",
      "update is day-granular: pass complete days with interval=day " +
        "(hourly indexes replace whole dn_date partitions)")
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try build(df, metrics, path, timeField, interval, resolve)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /**
   * Compact a metric's day partitions back to one file per day.
   *
   * Why it exists: a long-running [[graft.streaming.StreamScan.indexSink]]
   * appends one file per day per micro-batch — an always-on stream turns
   * each day's directory into thousands of small files, and every batch
   * query then pays a footer read + short scan per file (reference:
   * dragnet rewrites a whole day's sqlite file per `dn build` run, so its
   * layout never fragments; the streaming sink needs the equivalent
   * maintenance pass). Batch `Index.update` keeps one file per day by
   * construction, so compaction is a no-op there unless many small
   * update batches targeted the same day.
   *
   * Two layouts, two moves:
   *
   *  - **Streaming sink dir** (`_spark_metadata` present): the sink's
   *    commit log PINS the file list — batch reads list files from the
   *    log, so overwriting only some days would strand the log (it would
   *    reference deleted files) and deleting the log alone would expose
   *    any uncommitted orphan files a failed micro-batch left behind.
   *    The only safe compaction reads THROUGH the log (exactly the
   *    committed rows), rewrites the whole metric clustered one file per
   *    day into a staging dir, then swaps it in and drops the log.
   *    Finalize semantics: stop the stream first; afterwards the index
   *    is a plain batch-managed dataset (maintain with [[update]]; a new
   *    stream needs a fresh path + checkpoint).
   *
   *  - **Plain batch dir**: only the days holding more than
   *    `maxFilesPerDay` files are rewritten, with the same
   *    dynamic-partition-overwrite move as [[update]] — untouched days
   *    keep their files byte-identical. Staged through a temp dir first:
   *    a dynamic overwrite deletes each target partition before writing,
   *    and Spark reads are lazy, so writing over the directory a plan is
   *    still reading corrupts the read.
   *
   * Returns the compacted day strings (empty = nothing to do).
   */
  def compact(spark: SparkSession, path: String, metric: String,
      interval: String = "day", maxFilesPerDay: Int = 1): Seq[String] = {
    require(Intervals.contains(interval), s"bad interval: $interval")
    val mp = metricPath(path, interval, metric)
    val root = new org.apache.hadoop.fs.Path(mp)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    val streamed = fs.exists(new org.apache.hadoop.fs.Path(root, "_spark_metadata"))
    def dayDirs = fs.listStatus(root).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("dn_date="))
    val fragmented = dayDirs.filter(d => fs.listStatus(d.getPath).count(f =>
        f.isFile && f.getPath.getName.startsWith("part-")) > maxFilesPerDay)
      .map(_.getPath.getName.stripPrefix("dn_date=")).toSeq.sorted
    if (fragmented.isEmpty && !streamed) return Nil

    // cluster one file per day; hourly indexes keep the within-day
    // dn_hour sort their row-group-stats pruning relies on
    def clustered(df: DataFrame): DataFrame = {
      val byDay = df.repartition(col("dn_date"))
      if (interval == "hour") byDay.sortWithinPartitions(col("dn_hour")) else byDay
    }
    val staging = new org.apache.hadoop.fs.Path(mp + ".compact-staging")
    if (streamed) {
      // log-aware read → full rewrite → swap (see scaladoc). Finalize
      // REQUIRES the stream stopped; that contract can't be enforced
      // from here (the writer may be another driver), so best-effort
      // guard: snapshot the sink log before the read and re-check it
      // just before the swap — a still-running stream advances the log
      // and must abort the finalize, not race the delete/rename. The
      // swap itself is still two FS ops, not atomic: readers can observe
      // a missing metric dir for that window (documented trade — parquet
      // has no atomic dir replace on generic Hadoop FS).
      val metaDir = new org.apache.hadoop.fs.Path(root, "_spark_metadata")
      def sinkLogState: Seq[(String, Long)] = fs.listStatus(metaDir)
        .map(s => (s.getPath.getName, s.getModificationTime))
        .sortBy(_._1).toSeq
      val logBefore = sinkLogState
      clustered(graft.sources.Sources.parquet(spark, mp))
        .write.mode("overwrite").partitionBy("dn_date").parquet(staging.toString)
      if (sinkLogState != logBefore) {
        fs.delete(staging, true)
        throw new GraftException("compact: the streaming sink advanced " +
          s"while compacting $mp — the stream is still running; stop it " +
          "and re-run (the live index is untouched)")
      }
      fs.delete(root, true)
      // rename failure surfaces as false (HDFS) or a thrown IOException
      // (LocalFileSystem) — fold both into the guidance-carrying error,
      // keeping the thrown dialect's exception as the cause
      (try Right(fs.rename(staging, root))
       catch { case e: java.io.IOException => Left(e) }) match {
        case Right(true) => ()
        case r =>
          val msg = s"compact: rename $staging -> $root failed " +
            "(compacted data is intact in the staging dir)"
          throw r.fold(e => new GraftException(s"$msg [rename threw: $e]", e),
            _ => new GraftException(msg))
      }
      // whole metric rewritten — report every day it now holds
      dayDirs.map(_.getPath.getName.stripPrefix("dn_date=")).toSeq.sorted
    } else {
      val days = fragmented
      clustered(graft.sources.Sources.parquet(spark, mp).where(col("dn_date").isin(days: _*)))
        .write.mode("overwrite").partitionBy("dn_date").parquet(staging.toString)
      // swap each staged day dir in with FS renames — the data moves
      // ONCE (the staging write); the dynamic-partition-overwrite this
      // replaces re-read and re-wrote every staged byte in a second
      // Spark job, and needed a re-cluster pass to keep one file per
      // day, which renames preserve by construction. Failure window is
      // unchanged: a crash between a day's delete and its rename leaves
      // that day's only copy in staging, exactly the window the
      // overwrite path documented — so staging is never deleted on
      // failure here either.
      for (d <- days) {
        val src = new org.apache.hadoop.fs.Path(staging, s"dn_date=$d")
        val dst = new org.apache.hadoop.fs.Path(root, s"dn_date=$d")
        fs.delete(dst, true)
        (try Right(fs.rename(src, dst))
         catch { case e: java.io.IOException => Left(e) }) match {
          case Right(true) => ()
          case r =>
            val msg = s"compact: rename $src -> $dst failed; " +
              s"this day's compacted copy is intact in $staging — restore " +
              "it before re-running"
            throw r.fold(
              e => new GraftException(s"$msg [rename threw: $e]", e),
              _ => new GraftException(msg))
        }
      }
      // only a fully-committed swap releases the staging copy
      fs.delete(staging, true)
      days
    }
  }

  /** Shared front half of query/counters: metric selection, the pruned
    * index read, and the effective config (value-weighted, time field
    * remapped to the indexed column). */
  private def pruned(spark: SparkSession, path: String, metrics: Seq[Metric],
      cfg: QueryConfig, interval: String,
      prune: Boolean = true): (DataFrame, QueryConfig) = {
    require(Intervals.contains(interval), s"bad interval: $interval")
    val needed = cfg.breakdowns.map(_.field).toSet ++
      cfg.filter.map(_.fields).getOrElse(Set.empty)
    val metric = metrics.find(m => needed.subsetOf(m.breakdowns.map(_.name).toSet))
      .getOrElse(throw new GraftException(
        s"no metrics available to serve query (need $needed)"))
    val mp = metricPath(path, interval, metric.name)
    var df =
      try graft.sources.Sources.parquet(spark, mp)
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new GraftException(
          s"no index built at $mp (interval=$interval): ${e.getMessage}") }

    val hasBounds = cfg.after.isDefined || cfg.before.isDefined
    val indexedTime = cfg.timeField.filter(tf =>
      metric.breakdowns.exists(_.name == tf))
    // Bounds rounded the way dragnet rounds them (ceil to whole seconds,
    // Scan.ceilSecs parity), split into the partition day and the
    // hour-of-day for the alignment checks and predicates below.
    def ceiled(t: java.time.Instant): Long =
      math.ceil(t.toEpochMilli / 1000.0).toLong
    def dayOf(t: java.time.Instant): String =
      java.time.LocalDate.ofEpochDay(Math.floorDiv(ceiled(t), 86400L)).toString
    def hourOf(t: java.time.Instant): Int =
      (Math.floorMod(ceiled(t), 86400L) / 3600L).toInt
    def aligned(unit: Long): Boolean =
      (cfg.after.toSeq ++ cfg.before.toSeq)
        .forall(t => Math.floorMod(ceiled(t), unit) == 0L)
    // Day-aligned bounds are exactly servable by dn_date pruning ALONE —
    // the reference serves bounded queries from the per-day index via
    // file pruning (lib/index-query.js + lib/path-enum.js) regardless of
    // what's indexed. We accept only the cases pruning answers EXACTLY
    // (bounds on a UTC midnight after dragnet's ceil-secs rounding),
    // keeping the error for finer bounds the index cannot answer
    // instead of inheriting the reference's over-inclusive whole-day
    // reads. The hourly tree extends this one level down: hour-aligned
    // bounds are served by dn_date pruning for the interior days plus a
    // dn_hour predicate trimming the boundary days — dn_hour is sorted
    // within each day's file, so the trim is a parquet row-group stats
    // skip, the sub-day analog of dragnet's by_hour file pruning.
    val dayServed = hasBounds && indexedTime.isEmpty && prune && aligned(86400L)
    val hourServed = !dayServed && hasBounds && indexedTime.isEmpty && prune &&
      interval == "hour" && aligned(3600L)
    if (hasBounds && indexedTime.isEmpty && !dayServed && !hourServed)
      throw new GraftException(
        "no metrics available to serve query (time bounds need an indexed time column)")

    // Partition pruning on the day directory, the analog of dragnet's
    // by_day file pruning (lib/path-enum.js). `before` is EXCLUSIVE: when
    // pruning is the only enforcement (dayServed) a midnight bound must
    // cut strictly below its day; when dn_hour or an indexed timestamp
    // refines it, <= keeps the boundary day and the finer bound trims it.
    (if (prune) (cfg.after, cfg.before) else (None, None)) match {
      case (None, None) => ()
      case (a, b) =>
        a.foreach { t =>
          df = df.where(col("dn_date") >= lit(dayOf(t)))
          if (hourServed && hourOf(t) != 0)
            df = df.where(col("dn_date") > lit(dayOf(t)) ||
              col("dn_hour") >= lit(hourOf(t)))
        }
        b.foreach { t =>
          val d = lit(dayOf(t))
          df = df.where(if (dayServed) col("dn_date") < d else col("dn_date") <= d)
          if (hourServed && hourOf(t) != 0)
            df = df.where(col("dn_date") < d || col("dn_hour") < lit(hourOf(t)))
          else if (hourServed)
            // midnight `before` under hourServed (the other bound was the
            // sub-day one): exclusive cut strictly below the day, same as
            // the dayServed branch
            df = df.where(col("dn_date") < d)
        }
    }
    // Bounds fully enforced by pruning (+ dn_hour trim) are stripped from
    // the effective config (Scan would otherwise demand a time column for
    // them); otherwise the precise per-second bounds ride the indexed
    // timestamp.
    val effective =
      if (dayServed || hourServed) cfg.copy(valueField = Some("value"),
        timeField = None, after = None, before = None)
      else cfg.copy(valueField = Some("value"), timeField = indexedTime)
    (df, effective)
  }

  /**
   * Answer a query from the index, dragnet `dn query`: pick a metric whose
   * gathered columns cover the query's breakdowns and filter fields, then
   * re-aggregate its pre-summed tuples. Time bounds become partition-pruning
   * predicates on `dn_date` plus the exact per-second bound on any indexed
   * timestamp column.
   */
  /** Resolve against the index's FLAT columns: an indexed breakdown name
    * may contain dots (`req.method`), which a bare col() would re-parse
    * as a nested struct path. */
  private def flatResolve(df: DataFrame): String => Column =
    f => if (df.columns.contains(f)) col(s"`$f`") else col(f)

  def query(spark: SparkSession, path: String, metrics: Seq[Metric],
            cfg: QueryConfig, interval: String = "day"): DataFrame = {
    val (df, effective) = pruned(spark, path, metrics, cfg, interval)
    Scan.scan(df, effective, flatResolve(df))
  }

  /** `dn query --counters`: the same drop accounting as a scan, over the
    * value-weighted index tuples (counts represent raw records). NO
    * partition pruning here — pruning would remove out-of-range rows
    * from `input` instead of counting them as time_dropped, diverging
    * from the scan-side accounting. */
  def counters(spark: SparkSession, path: String, metrics: Seq[Metric],
               cfg: QueryConfig, interval: String = "day"): DataFrame = {
    val (df, effective) = pruned(spark, path, metrics, cfg, interval,
      prune = false)
    Scan.counters(df, effective, flatResolve(df))
  }
}

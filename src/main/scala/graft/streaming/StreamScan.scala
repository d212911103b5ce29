package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.{QueryConfig, Scan}

/**
 * Streaming scan (SURVEY.md §2 row 18): the same QueryConfig semantics —
 * krill filter → breakdown columns → weighted count — over an unbounded
 * source, which dragnet has no answer to (its scan is batch-only over
 * files; reference: lib/stream-scan.js processes a finite stream and
 * emits once at end).
 *
 * Spark-first shape: `readStream → where → groupBy(window, breakdowns) →
 * sum` with an event-time watermark, so state is bounded and late data
 * beyond the watermark is dropped deterministically. The streaming index
 * builder is the same windowed aggregate appended to a `dn_date`-
 * partitioned parquet sink — batch `Index.query` reads it unchanged
 * (partition pruning and all), giving a kappa-style pipeline: one logical
 * plan, batch or streaming.
 */
object StreamScan {

  /**
   * Switch the session to the RECOMMENDED stateful-streaming config:
   * RocksDB state stores with changelog checkpointing. The default
   * HDFS-backed provider keeps every key of every partition's state
   * on-heap — fine for thousands of keys, fatal for the billions a
   * 100 TB corpus-dedup or per-user sessionization stream carries;
   * RocksDB spills state to local disk with bounded memory, and
   * changelog checkpointing uploads per-batch deltas instead of
   * snapshotting the whole store. Session-level conf: applies to
   * streams STARTED afterwards (a running query keeps the provider its
   * first checkpoint recorded). Returns the previous settings so
   * callers can restore them.
   */
  def useRocksDbState(spark: org.apache.spark.sql.SparkSession): Map[String, Option[String]] = {
    val settings = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true")
    val prev = settings.map { case (k, _) => k -> spark.conf.getOption(k) }
    settings.foreach { case (k, v) => spark.conf.set(k, v) }
    prev
  }

  /** Restore conf captured by [[useRocksDbState]]. */
  def restoreState(spark: org.apache.spark.sql.SparkSession,
      prev: Map[String, Option[String]]): Unit =
    prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }

  /**
   * Windowed streaming scan. Output columns: `window_start`, `window_end`
   * (event-time window bounds), one column per breakdown, BIGINT `value`.
   */
  def scanStream(df: DataFrame, cfg: QueryConfig, timeCol: String,
      windowDur: String, watermarkDelay: String,
      resolve: String => Column = col): DataFrame = {
    var cur = df
    cfg.filter.foreach(p => cur = cur.where(p.toColumn(resolve)))
    cfg.breakdowns.foreach { fs =>
      // baseCol, not breakdownCol: same reasoning as Scan.scan — the
      // pushed null-drop predicate must not inline the bucketized CASE
      // chain (and any expensive source expression) per reference.
      cur = cur.where(Scan.baseCol(fs, resolve).isNotNull)
    }
    val cols = cfg.breakdowns.map(fs => Scan.breakdownCol(fs, resolve).as(fs.name))
    val weight = cfg.valueField.map(resolve).getOrElse(lit(1L))
    cur.withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowDur) +: cols: _*)
      .agg(sum(weight).cast("long").as("value"))
      .select(Seq(col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++
        // backtick-quoted: dotted breakdown names are flat columns here
        cfg.breakdowns.map(fs => col(s"`${fs.name}`").as(fs.name)) :+
        col("value"): _*)
  }

  /**
   * Streaming index build: append the windowed aggregate to a parquet
   * index partitioned by `dn_date` — the streaming analog of
   * `Index.build` (dragnet `dn build` re-run per day; reference:
   * lib/index-sink.js). Append mode: a window's row is emitted exactly
   * once, when the watermark passes its end. `path` is the exact sink
   * directory; to make the result addressable by batch
   * [[graft.index.Index.query]], point it at
   * `Index.metricPath(root, "day", metricName)` so it lands inside the
   * per-interval tree the batch reader resolves.
   */
  def indexSink(windowedAgg: DataFrame, path: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)): StreamingQuery =
    windowedAgg
      .withColumn("dn_date", date_format(col("window_start"), "yyyy-MM-dd"))
      // cluster each day into one task before the partitioned write:
      // otherwise every state partition writes its own file into every
      // day directory it touches (shufflePartitions × days small files
      // + commits per micro-batch)
      .repartition(col("dn_date"))
      .writeStream
      .trigger(trigger)
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("dn_date")
      .outputMode("append")
      .start()
}

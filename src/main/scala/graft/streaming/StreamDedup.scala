package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Text

/**
 * Streaming deduplication for document ingest — the unbounded analog of
 * the batch dedup family. State is keyed by content fingerprint and
 * bounded by the event-time watermark: a duplicate arriving within the
 * horizon is dropped, and state for fingerprints older than the horizon
 * is evicted (without a horizon the state would grow with the corpus,
 * which at 100 TB/day of ingest is not an option).
 */
object StreamDedup {

  /**
   * Keep the first occurrence of each normalized-content fingerprint
   * within the watermark horizon. Output carries the computed `fp`
   * column alongside the input columns.
   */
  def dedupExact(df: DataFrame, textCol: String, timeCol: String,
      watermarkDelay: String): DataFrame =
    df.withColumn("fp", Text.fingerprint(col(textCol)))
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /**
   * Same shape for an arbitrary precomputed key (e.g. a MinHash band
   * hash or a SimHash value) — streaming candidate suppression.
   */
  def dedupByKey(df: DataFrame, key: Column, timeCol: String,
      watermarkDelay: String): DataFrame =
    df.withColumn("dn_key", key)
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("dn_key")
}

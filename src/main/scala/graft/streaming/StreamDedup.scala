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
   * within the watermark horizon. Output carries the computed
   * fingerprint in `fpCol` alongside the input columns; `fpCol` must not
   * collide with an input column (it would be silently replaced).
   */
  def dedupExact(df: DataFrame, textCol: String, timeCol: String,
      watermarkDelay: String, fpCol: String = "fp"): DataFrame = {
    require(!df.columns.contains(fpCol),
      s"output column '$fpCol' already exists in the input; pass a " +
        "different fpCol")
    df.withColumn(fpCol, Text.fingerprint(col(textCol)))
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(fpCol)
  }

  /**
   * Same shape for an arbitrary precomputed key (e.g. a MinHash band
   * hash or a SimHash value) — streaming candidate suppression. The
   * internal key column does not appear in the output.
   */
  def dedupByKey(df: DataFrame, key: Column, timeCol: String,
      watermarkDelay: String): DataFrame = {
    val kc = "__graft_dedup_key"
    require(!df.columns.contains(kc), s"reserved column name: $kc")
    df.withColumn(kc, key)
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(kc)
      .drop(kc)
  }
}

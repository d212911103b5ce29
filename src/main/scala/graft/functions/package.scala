package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Bucketing and time helpers — the Spark expressions behind dragnet's
 * DTrace-style aggregations (reference: README.md:185-230, node-skinner
 * bucketizers). All built from codegen'd builtins; no UDFs.
 */
package object functions {

  /**
   * Power-of-two bucketing (`aggr=quantize`): 1→1, 2-3→2, 4-7→4, 16-31→16…
   * Values < 1 land in bucket 0. NULL/non-numeric propagates NULL (callers
   * drop those rows — dragnet drops records whose aggr field isn't numeric,
   * README.md:704-708).
   *
   * Exactly `pow(2, floor(log2(v)))` in double math so a DuckDB oracle using
   * the same formula hashes identically.
   */
  /** 2^62 — the largest power-of-two bucket a signed long can hold; it is
    * the true bucket for every v in [2^62, 2^63). */
  private val TopBucket = 1L << 62

  def quantize(c: Column): Column = {
    // log2 in double math rounds UP for v just under a power of two once
    // v ≥ 2^48-1 (53-bit mantissa), which would put v in a bucket ABOVE
    // it; the halving correction restores bucket ≤ v exactly. Values in
    // [2^62, 2^63) take the top bucket directly — pow(2,63) would
    // saturate the long cast. Same logic on the SQL side keeps the
    // oracle bit-identical.
    val b = pow(lit(2.0), floor(log2(c))).cast("long")
    val fixed = when(b > c, shiftright(b, 1)).otherwise(b).cast("long")
    when(c.isNull, lit(null).cast("long"))
      .when(c < 1, lit(0L))
      .when(c >= lit(TopBucket), lit(TopBucket))
      .otherwise(fixed)
  }

  /** SQL rendering of [[quantize]] for DuckDB oracles. */
  def quantizeSql(c: String): String = {
    val b = s"CAST(pow(2, floor(log2($c))) AS BIGINT)"
    s"CASE WHEN $c < 1 THEN 0 WHEN $c >= ${TopBucket} THEN ${TopBucket} " +
      s"WHEN $b > $c THEN $b // 2 ELSE $b END"
  }

  /** Linear bucketing (`aggr=lquantize,step=S`): floor(v/S)·S. The
    * bucket label's TYPE follows the step: an integral step yields
    * BIGINT labels (the day/hour/integer-grid cases every index and
    * gate uses); a FRACTIONAL step keeps the exact floor multiple as
    * DOUBLE — casting it to long truncates in Spark but rounds in SQL
    * engines, silently merging neighboring buckets differently per
    * engine (found by QueryFuzzSpec seed 19: step=0.5 collapsed 1.0
    * and 1.5 into one Spark bucket while DuckDB split them 17 rows
    * apart). floor(v/S)·S is the same two IEEE ops in both renderings,
    * so fractional labels stay bit-identical. */
  def lquantize(c: Column, step: Double): Column =
    if (step == step.longValue().toDouble)
      (floor(c / lit(step)) * lit(step)).cast("long")
    else floor(c / lit(step)) * lit(step)

  /** SQL rendering of [[lquantize]] for DuckDB oracles. A fractional
    * step is forced DOUBLE (a bare 0.5 literal is DECIMAL in DuckDB,
    * whose arithmetic would diverge from Spark's double math). */
  def lquantizeSql(c: String, step: Double): String =
    if (step == step.longValue().toDouble) {
      val s = step.longValue().toString
      s"CAST(floor($c / $s) * $s AS BIGINT)"
    } else {
      val s = s"CAST(${step.toString} AS DOUBLE)"
      s"(floor($c / $s) * $s)"
    }

  /**
   * Record timestamp -> unix seconds, dragnet's synthetic date field
   * (reference: lib/stream-synthetic.js:57-79 — numeric passes through,
   * strings are ISO-8601 parsed, result floor(ms/1000); unparseable → NULL
   * and the row is dropped by the caller).
   */
  def epochSecs(c: Column): Column = {
    // TimestampType -> truncate to seconds; string -> parse then truncate;
    // numeric -> pass through (already unix seconds). try_cast, not cast:
    // under ANSI mode a malformed date must yield NULL (row dropped by the
    // caller), not fail the job — dragnet's drop semantics.
    floor(unix_micros(c.try_cast("timestamp")) / lit(1000000L)).cast("long")
  }

  /** SQL rendering of [[epochSecs]] over a DuckDB TIMESTAMP column. */
  def epochSecsSql(c: String): String =
    s"CAST(floor(epoch($c)) AS BIGINT)"

  /** Record timestamp -> unix MICROseconds. try_cast because the dirs
    * have carried ts as TIMESTAMP, TIMESTAMP_NTZ (naive micros — the
    * cast is an exact UTC wall-clock relabel under the session's UTC
    * zone), and rebuilt-from-nanos; DuckDB twin: `epoch_us(ts)`. */
  def epochMicros(c: Column): Column =
    unix_micros(c.try_cast("timestamp"))
}

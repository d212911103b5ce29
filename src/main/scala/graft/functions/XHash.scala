package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine 60-bit hashing: the same value is computable in Spark
 * (`conv(substring(md5(s),1,15),16,10)`) and in ANSI-ish SQL engines
 * (DuckDB: `CAST(concat('0x', substring(md5(s),1,15)) AS BIGINT)`), so
 * every hash-dependent operator (MinHash, LSH banding, SimHash) can be
 * replayed by an external oracle — unlike xxhash64, whose seed/variant
 * is Spark-private.
 *
 * One md5 per input yields TWO independent values (hex chars 1-15 and
 * 17-30); a k-member hash family is derived by double hashing
 * `(h1 + i*h2) & mask60` (Kirsch–Mitzenmacher): k minhash functions for
 * the price of a single md5. The family index is capped at i < 112 so
 * `h1 + i*h2` provably fits in a signed 64-bit value in BOTH engines:
 * h1 < 2^60 and i*h2 < 112·2^56 = 7·2^60, so the sum < 2^63 (DuckDB
 * raises on BIGINT overflow; Spark would silently wrap — with the cap,
 * neither happens).
 */
object XHash {

  /** 2^60 - 1: both member() and its SQL twin mask to 60 bits. */
  val Mask60: Long = (1L << 60) - 1

  private def pairCol(s: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      Md5Pair(org.apache.spark.sql.graft.bridge.expression(s)))

  /** Hex chars 1-15 of md5 → 60-bit non-negative Long. Computed by the
    * native [[Md5Pair]] (one digest, no hex round-trip); h60(s) and
    * h56(s) in one projection share the digest via codegen
    * subexpression elimination. */
  def h60(s: Column): Column = element_at(pairCol(s), 1)

  /** Hex chars 17-30 of md5 → 56-bit non-negative Long. */
  def h56(s: Column): Column = element_at(pairCol(s), 2)

  /** Reference (builtin-only) forms — the definition the SQL oracles
    * mirror; XHashSpec pins h60/h56 to these bit-for-bit. */
  def h60Ref(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")
  def h56Ref(s: Column): Column =
    conv(substring(md5(s), 17, 14), 16, 10).cast("long")

  /** Largest overflow-safe family index (exclusive): h1 + i·h2 <
    * 2^60 + 112·2^56 < 2^63. */
  val MaxFamily = 112

  /** [[member]] as plain Long arithmetic, for driver-side replays of
    * the family (e.g. building a Bloom bit array from collected eval
    * hashes) — bit-identical to the column and SQL forms. */
  def memberLong(h1: Long, h2: Long, i: Int): Long = {
    require(i >= 0 && i < MaxFamily,
      s"family index $i out of overflow-safe range [0, $MaxFamily)")
    if (i == 0) h1 else (h1 + h2 * i) & Mask60
  }

  /** i-th member of the double-hashing family over (h1, h2). */
  def member(h1: Column, h2: Column, i: Int): Column = {
    require(i >= 0 && i < MaxFamily,
      s"family index $i out of overflow-safe range [0, $MaxFamily)")
    if (i == 0) h1 // h1 < 2^60: mask is a no-op
    else (h1 + h2 * lit(i.toLong)).bitwiseAND(lit(Mask60))
  }

  // ---- SQL twins (DuckDB dialect, bit-identical results) ----

  def h60Sql(s: String): String =
    s"CAST(concat('0x', substring(md5($s), 1, 15)) AS BIGINT)"

  def h56Sql(s: String): String =
    s"CAST(concat('0x', substring(md5($s), 17, 14)) AS BIGINT)"

  def memberSql(h1: String, h2: String, i: Int): String = {
    require(i >= 0 && i < MaxFamily,
      s"family index $i out of overflow-safe range [0, $MaxFamily)")
    if (i == 0) h1 else s"(($h1 + $h2 * $i) & ${Mask60})"
  }
}

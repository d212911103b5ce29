package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Text

/**
 * Deduplication operators for training-data pipelines (SURVEY.md §2 rows
 * 25-28): exact content-hash grouping, MinHash+LSH banding, SimHash, and
 * an exact n-gram-Jaccard verify pass.
 *
 * Scale shape: every candidate-generation path is a *bucket join* — rows
 * shuffle once on a band/bucket key and pairs are only formed inside a
 * bucket — never an O(n²) cross join. At 100 TB that means the cost is
 * driven by bucket sizes (bounded by banding width), not corpus size².
 */
object Dedup {

  /** Exact-dup content key: md5 of whitespace-normalized lower text. */
  def contentKey(text: Column): Column = Text.fingerprint(text)

  /**
   * Word n-gram shingles (as space-joined strings) of the token array.
   * Documents shorter than n tokens contribute their whole text as a
   * single shingle so they still participate.
   */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = Text.tokens(text)
    when(size(t) < n, array(concat_ws(" ", t)))
      .otherwise(array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + lit(1), lit(n))))))
  }

  /**
   * MinHash+LSH candidate pairs: k=bands*rowsPerBand hash functions
   * (xxhash64 seeded by index), banded so two docs collide iff some band
   * of their signatures matches exactly. Probability of a pair with
   * Jaccard j surfacing = 1-(1-j^rows)^bands — 8 bands × 2 rows targets
   * j ≳ 0.5. Self-join on (band, bandHash): one shuffle on the bucket
   * key, pairs formed only within buckets.
   */
  def minhashCandidates(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val rowHashes = (0 until rowsPerBand).map { r =>
        array_min(transform(col("sh"), s => xxhash64(lit(b * rowsPerBand + r), s)))
      }
      struct(lit(b).as("band"), xxhash64(rowHashes: _*).as("bh"))
    }
    val banded = docs
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .select(col("id"), explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
  }

  /**
   * SimHash: per-token xxhash64, majority vote per bit — near-identical
   * token multisets land within a few bits of each other. 32 bits keeps
   * the expression tree codegen-friendly.
   */
  def simhash(text: Column, bits: Int = 32): Column = {
    val hs = transform(Text.tokens(text), t => xxhash64(t))
    val n = size(hs)
    (0 until bits).map { j =>
      when(size(filter(hs, h =>
        shiftright(h, j).bitwiseAND(lit(1L)) === lit(1L))) * 2 > n,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /**
   * SimHash near-dup pairs: band the 32-bit hash into 4 bytes; a pair is
   * a candidate if any byte matches (pigeonhole: hamming ≤ 3 ⇒ some byte
   * equal); verify with exact hamming ≤ maxHamming via bit_count(xor).
   */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 6): DataFrame = {
    val withSim = docs.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sim"))
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sim"), b * 8).bitwiseAND(lit(255L)).as("byte"))
    }
    val banded = withSim
      .select(col("id"), col("sim"), explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("sim"), col("b.band").as("band"), col("b.byte").as("byte"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.byte") === col("b.byte") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /**
   * Verify pass: exact n-gram Jaccard over MinHash candidate pairs.
   * Candidates shuffle twice (once per side) to pick up their shingle
   * sets — still linear in |candidates|, never corpus².
   */
  def jaccardVerified(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, minJaccard: Double = 0.6): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    minhashCandidates(docs, idCol, textCol, n)
      .join(sh.as("sa"), col("doc_a") === col("sa.id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.id"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sa.sh"), col("sb.sh")).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.Sources

/**
 * SURVEY.md §2 rows 25-28: deduplication over the `documents` table.
 * Exact dedup is oracle-checked; the hash-family ops (MinHash/SimHash)
 * depend on Spark's xxhash64 so they are rows-only — their *verify*
 * passes (exact Jaccard / hamming) make the outputs meaningful anyway.
 */
object DedupQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Sources.table(s, dir, "documents")

  def all: Seq[Q] = Seq(

    // #25 exact dedup: group by normalized content hash, keep min doc_id
    Q("dedup_exact",
      (s, dir) => docs(s, dir)
        .groupBy(Dedup.contentKey(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper")),
      Some("""
        SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(MIN(doc_id) AS BIGINT) AS keeper
        FROM documents GROUP BY 1""")),

    // #26 MinHash+LSH candidate pairs (8 bands × 2 rows over word
    // 3-gram shingles — targets Jaccard ≳ 0.5). Oracle replays the md5
    // double-hash family + banding in DuckDB (DedupSql).
    Q("dedup_minhash",
      (s, dir) => Dedup.minhashCandidates(docs(s, dir)),
      Some(DedupSql.minhashCandidates())),

    // #27 SimHash near-dups: 60-bit hash, 4×15-bit bands, hamming ≤ 3
    // verify (the full-recall bound for 4-band banding)
    Q("dedup_simhash",
      (s, dir) => Dedup.simhashPairs(docs(s, dir)),
      Some(DedupSql.simhashPairs())),

    // #28 exact n-gram Jaccard verify pass over the MinHash candidates
    Q("dedup_jaccard",
      (s, dir) => Dedup.jaccardVerified(docs(s, dir)),
      Some(DedupSql.jaccardVerified())),

    // #28b connected-component near-dup clusters over the verified pair
    // graph (min-label propagation; oracle = recursive transitive
    // closure in DuckDB)
    Q("dedup_clusters",
      (s, dir) => Dedup.clusters(docs(s, dir)),
      Some(DedupSql.clusters())),

    // #25b the composed cleaning pipeline (quality floor → exact dedup →
    // near-dup removal) — the end-to-end training-data story, oracle-
    // checked as one CTE chain; CorpusSpec additionally pins the
    // semantics on planted dups
    Q("corpus_clean",
      (s, dir) => graft.dedup.Corpus.clean(docs(s, dir))
        .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars")),
      Some(DedupSql.corpusClean()))
  )
}

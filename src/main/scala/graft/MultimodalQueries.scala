package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Sources

/**
 * SURVEY.md §2 row 36: multimodal binary-column plumbing, exercised over
 * a real table by treating each document's UTF-8 bytes as an opaque
 * payload. Both decode paths run: the pure-Column stub and the batched
 * mapPartitions extractor (the vectorized-codec shape). Rows-only — the
 * decode is a stub; determinism is what the spec asserts.
 */
object MultimodalQueries {

  def all: Seq[Q] = Seq(
    Q("multimodal_decode",
      (s, dir) => {
        val payloads = Sources.table(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        val batched = Multimodal.extractBatch(payloads, "payload", dim = 8)
        batched.select(col("doc_id"),
          Multimodal.decodeStub(col("payload"), 8).as("stub_features"),
          col("features").as("batch_features"))
          .select(col("doc_id"),
            aggregate(col("stub_features"), lit(0.0), (a, x) => a + x).as("stub_sum"),
            aggregate(col("batch_features"), lit(0.0), (a, x) => a + x).as("batch_sum"))
      },
      None)
  )
}

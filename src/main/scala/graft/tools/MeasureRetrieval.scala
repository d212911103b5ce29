package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Measurement harness for the KNOWN-ITEM retrieval recall gates (r13
 * verdict item 2): each SAMPLED target doc (RetrievalQueries.kiTargets
 * — the hash-capped sample of doc_id % 25 == 7, ≤ TargetCap queries at
 * any corpus size) plants its own query (BM25: its top-k terms by tf;
 * dense: the sign vector of its embedding), and recall@10 counts the
 * targets found. Reports, per
 * corpus: hits for the BM25 leg, the dense leg, and the RRF fusion —
 * plus the BROKEN arms the floors must exclude (constant-score BM25 =
 * rank by doc id; a fusion that returns one leg is read directly off
 * the leg columns). `MeasureRetrieval <sfDir>` — one JSON line.
 * The MinKi*PerMille floors in RetrievalQueries derive from these
 * numbers; a sizing aid like MeasurePermutation, not library surface.
 */
object MeasureRetrieval {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Sources.table(spark, sfDir, "documents")
    val embs = graft.sources.Sources.table(spark, sfDir, "embeddings")

    def hitsOf(df: DataFrame, hitCol: String): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(when(col(hitCol), 1L).otherwise(0L))).collect().head
      (r.getLong(0), r.getLong(1))
    }

    val qTermsList = if (args.length > 1)
      args(1).split(",").map(_.trim.toInt).toSeq else Seq(2, 3, 4)
    val dimsList = if (args.length > 2)
      args(2).split(",").map(_.trim.toInt).toSeq else Seq(4, 8, 16)

    // broken arm: constant scores — ranking degenerates to id order,
    // so a target is a "hit" iff fewer than 10 candidate ids precede it
    val (nQ0, constHits) = hitsOf(
      graft.RetrievalQueries.kiBm25Scored(docs)
        .withColumn("score", lit(0.0))
        .transform(graft.RetrievalQueries.kiRankOf(_, "doc_id")), "hit")
    println(s"""{"sf":"$sfDir","n_queries":$nQ0,"const_score_hits":$constHits}""")

    for (qt <- qTermsList; kd <- dimsList) {
      val (nQ, bm25Hits) = hitsOf(
        graft.RetrievalQueries.kiBm25Hits(docs, qt), "hit")
      val (_, denseHits) = hitsOf(
        graft.RetrievalQueries.kiDenseHits(embs, kd), "hit")
      val (_, rrfHits) = hitsOf(
        graft.RetrievalQueries.kiRrfHits(docs, embs, qt, kd), "hit_rrf")
      def pm(h: Long) = if (nQ == 0) 0L else h * 1000 / nQ
      println(s"""{"q_terms":$qt,"keep_dims":$kd,"n_queries":$nQ,""" +
        s""""bm25_hits":$bm25Hits,"bm25_pm":${pm(bm25Hits)},""" +
        s""""dense_hits":$denseHits,"dense_pm":${pm(denseHits)},""" +
        s""""rrf_hits":$rrfHits,"rrf_pm":${pm(rrfHits)}}""")
    }
    spark.stop()
  }
}

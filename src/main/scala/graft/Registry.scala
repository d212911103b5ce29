package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: the Spark implementation plus (usually) a DuckDB oracle
  * over the same parquet tables. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** All queries exposed through SparkEntry — the coverage list the driver
  * verifies against SURVEY.md §2. */
object Registry {
  def all: Seq[Q] =
    CoreScanQueries.all ++ IndexQueries.all ++ AnalyticsQueries.all ++
      TextQueries.all ++ UrlQueries.all ++ DedupQueries.all ++
      AnnQueries.all ++ RetrievalQueries.all ++ StreamingQueries.all ++
      MultimodalQueries.all
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap
  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

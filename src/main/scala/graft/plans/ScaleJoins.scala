package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Join strategies for the shapes that break at 100 TB (SURVEY.md §4):
 * skewed keys and repeated fact⋈fact joins on the same key.
 */
object ScaleJoins {

  /**
   * Equi-join for a skew-heavy big side: each big row gets one of `salts`
   * sub-keys, the small side is replicated across all salt values, and
   * the join runs on (key, salt) — a hot key spreads over `salts`
   * reducers instead of melting one. Result set equals the plain inner
   * join. (AQE's skew-join handles moderate skew adaptively; explicit
   * salting is for the pathological keys you know about.)
   *
   * The small side grows ×salts — keep salts modest (8-32) and the small
   * side genuinely small.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // any row-spread works for salting; monotonically_increasing_id is
    // cheap and needs no row content
    val b = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val s = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /**
   * Write a DataFrame as a parquet table bucketed (and sorted) by `key`:
   * two tables bucketed the same way join/aggregate on that key with NO
   * shuffle — the co-location is recorded in the catalog and Catalyst
   * plans a zipped per-bucket join. This is the persistent analog of
   * repartitioning once and reusing the partitioning across stages.
   */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Read back a bucketed table (bucket metadata comes from the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}

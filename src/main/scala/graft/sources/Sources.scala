package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Datasource layer. Dragnet reads newline-separated JSON from local files or
 * Manta and prunes input files by a %Y/%m-%d path layout (reference:
 * lib/datasource-file.js, lib/fs-find.js, lib/path-enum.js). On Spark the
 * same roles are played by `spark.read.json` (nested structs ≡ dotted field
 * paths), parquet, and partition pruning on a date-derived column.
 */
object Sources {

  /** Read a testdata star-schema table. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /**
   * The events table with its `props` JSON string parsed to a struct so that
   * dragnet-style dotted paths (`props.k`) resolve naturally.
   */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark 4 rejects;
    // read it as raw nanos and rebuild a (microsecond) TimestampType column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // json_tuple, not from_json: a Generator is a predicate-pushdown
    // barrier, so each record's JSON is parsed exactly once no matter how
    // many filters/breakdowns reference props.* — from_json gets inlined
    // into every pushed predicate (one parse per reference per row).
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      .select(col("*"), json_tuple(col("props"), "k").as("k_json"))
      .withColumn("props", struct(col("k_json").try_cast("int").as("k")))
      .drop("k_json")
  }

  /**
   * Newline-separated JSON datasource — dragnet's native format
   * (README.md:33). Schema inference handles nested objects; dotted paths
   * (`req.method`) then resolve as struct field access.
   */
  def ndjson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.Ann

/**
 * Measurement harness for the knnJoin bucket geometry (round-4 verdict
 * item 6: "re-measure the adaptive-probe threshold at sf1"): for each
 * candidate bit width, reports home-bucket candidate volume, how many
 * left rows underfill k (and therefore explode into hamming-1 probes),
 * the probe-added candidate volume, and wall time for the full join.
 *
 * `MeasureKnn <sfDir> [bits,bits,...] [k]` — prints one JSON line per
 * bit width. Not part of the library surface; a sizing aid like
 * Dedup.bucketStats.
 */
object MeasureKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val bitList = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(4, 5, 6)
    val k = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Sources.table(spark, sfDir, "embeddings")
    val n = emb.count()
    println(s"""{"sf":"$sfDir","rows":$n,"derived_bits":${Ann.bucketBitsFor(n)}}""")
    bitList.foreach { bits =>
      val cand = Ann.knnCandidates(emb, emb, k, "vec_id", "embedding",
        bits, fullProbe = false)
      val byLeft = cand.groupBy("lid").count()
      // LEFT join from the full id set: a left row with ZERO candidates
      // after probing is absent from byLeft and is exactly the worst
      // recall case — it must count as short, not vanish
      val stats = emb.select(col("vec_id").as("lid")).distinct()
        .join(byLeft, Seq("lid"), "left")
        .agg(
          count(lit(1)).as("lids"),
          sum(when(coalesce(col("count"), lit(0L)) < k, 1L).otherwise(0L))
            .as("underfilled"),
          sum(coalesce(col("count"), lit(0L))).as("cands")).collect().head
      val t0 = System.nanoTime()
      Ann.knnJoin(emb, emb, k, bits = bits).count()
      val t = (System.nanoTime() - t0) / 1e9
      // short_lids = left ids still below k candidates AFTER the
      // adaptive probe — the recall shortfall the probe exists to close
      println(f"""{"bits":$bits,"cand_rows":${stats.getLong(2)},""" +
        f""""short_lids":${stats.getLong(1)},"lids":${stats.getLong(0)},""" +
        f""""join_sec":$t%.2f}""")
    }
    spark.stop()
  }
}

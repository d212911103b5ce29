package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.{Ann, Opq}

/**
 * Measurement harness for the OPQ-lite rotation's recall floor (the
 * round-13 verdict item: "gate ann_recall_rotated with a measured
 * floor where rotated PQ beats plain PQ on an anisotropic fixture"):
 * for each candidate fixture shape (how many leading dims carry the
 * boosted variance, and the boost factor) it reports batch-total
 * recall@10 hits (out of 40) for plain PQ and for H·D-rotated PQ
 * against the exact ground truth on the SAME fixture — the two
 * numbers the gate's floor and control are pinned from.
 *
 * `MeasureRotation <sfDir> [boostDims,... ] [lloyd]` — one JSON line
 * per fixture shape.
 */
object MeasureRotation {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val dimList = if (args.length > 1)
      args(1).split(",").map(_.trim.toInt).toSeq else Seq(2, 4, 8, 16)
    val lloyd = if (args.length > 2) args(2).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Sources.table(spark, sfDir, "embeddings")
      .localCheckpoint()
    val mod = Some(math.max(1L, e.count() / 16))
    def qb(c: DataFrame) =
      c.orderBy(col("vec_id")).limit(4)
        .select(col("vec_id").as("qid"), col("embedding"))
    def hits(corpus: DataFrame, approx: DataFrame): Long =
      Ann.bruteForceTopKBatch(corpus, qb(corpus), 10)
        .select(col("qid"), col("vec_id")).as("e")
        .join(approx.as("a"),
          col("e.qid") === col("a.qid") &&
            col("e.vec_id") === col("a.vec_id"))
        .count()
    dimList.foreach { bd =>
      val an = e.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          x.cast("double") * when(i < lit(bd), lit(8.0)).otherwise(lit(0.125))))
        .localCheckpoint()
      val plain = hits(an,
        Ann.pqTopKBatch(an, qb(an), 10, modulus = mod, lloyd = lloyd))
      val ranr = Opq.rotated(an).localCheckpoint()
      val rot = hits(an,
        Ann.pqTopKBatch(ranr, qb(ranr), 10, modulus = mod, lloyd = lloyd))
      println(s"""{"sf":"$sfDir","boost_dims":$bd,"lloyd":$lloyd,""" +
        s""""plain":$plain,"rotated":$rot,"of":40}""")
    }
    spark.stop()
  }
}

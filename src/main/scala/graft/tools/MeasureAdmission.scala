package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timer for the streamed admission pipeline (round-13 sizing
  * aid, the MeasureKnn pattern): isolates the per-row probe expansion,
  * the store-keys build, the stream-static join drain, and the batch
  * tail, so a regression points at a stage instead of the whole op.
  * `MeasureAdmission <sfDir>` — one JSON line. */
object MeasureAdmission {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val d = graft.sources.Sources.table(spark, dir, "documents")
    val crawl = d.where(expr(graft.DedupQueries.NewWhere))
    val (_, tStores) = t {
      graft.DedupQueries.ensureStore(spark, dir)
      graft.DedupQueries.ensureChunkStore(spark, dir)
    }
    val (_, tProbeBatch) = t {
      graft.streaming.Admission.probeRows(crawl).count()
    }
    val keys = graft.streaming.Admission.storeKeys(
      spark.read.parquet(graft.DedupQueries.ensureStore(spark, dir)),
      spark.read.parquet(graft.DedupQueries.ensureChunkStore(spark, dir)))
    val (nKeys, tKeys) = t { keys.count() }
    val (_, tJoinBatch) = t {
      graft.streaming.Admission.probeRows(crawl)
        .join(keys, Seq("kind", "k1", "k2"), "left_outer").count()
    }
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    val stream = spark.readStream.schema(raw.schema)
      .parquet(s"$dir/{documents}.parquet")
      .where(expr(graft.DedupQueries.NewWhere))
    val probed = graft.streaming.Admission.probeRows(stream)
      .join(keys, Seq("kind", "k1", "k2"), "left_outer")
    val (_, tDrain) = t {
      val q = probed.writeStream.format("memory").queryName("m_adm")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val (n, tAdmit) = t {
      graft.streaming.Admission.admit(spark.table("m_adm"),
        d.where(col("doc_id") % 97 === 0)).count()
    }
    println(s"""{"dir":"$dir","stores_s":$tStores,"probe_batch_s":$tProbeBatch,""" +
      s""""keys":$nKeys,"keys_s":$tKeys,"join_batch_s":$tJoinBatch,""" +
      s""""drain_s":$tDrain,"admit_s":$tAdmit,"admitted":$n}""")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-19 measurement aid (guide §1): sub-stage wall times for the
 * bench's hottest operators, plus per-op job/stage counts from the
 * status tracker. Never part of the scored bench — evidence capture
 * for OPTIMIZATION_r19.md only.
 */
object ProfileOps {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def t(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3fs")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // warm: JIT + codegen on the whole path
    t("warm corpus_clean x1") { noop(graft.dedup.Corpus.clean(docs)) }
    t("warm corpus_clean x2") { noop(graft.dedup.Corpus.clean(docs)) }

    // ---- clean() broken into its member passes ----
    import graft.dedup.Dedup
    val cfg = graft.dedup.Corpus.CleanConfig()
    val kept = docs.where(graft.dedup.Corpus.baseFilter(cfg))
    t("c1 baseFilter only") { noop(kept) }
    t("c2 exactKeepers") { noop(Dedup.exactKeepers(kept)) }
    var exactKept: DataFrame = null
    t("c3 exactKept join + localCheckpoint") {
      exactKept = kept.join(Dedup.exactKeepers(kept), "doc_id").localCheckpoint()
    }
    // jaccardVerified internals
    var sh: DataFrame = null
    t("c4 shingleSets + localCheckpoint") {
      sh = Dedup.shingleSets(exactKept).localCheckpoint()
    }
    t("c5 signature+banding candidates (from rows)") {
      // mirrors jaccardVerified's private signatureOfRows(rows, 16)
      val rows = sh.select(col("id"), explode(col("sh")).as("s"))
      val hashed = rows.select(col("id"),
        graft.functions.XHash.h60(col("s")).as("h1"),
        graft.functions.XHash.h56(col("s")).as("h2"))
      val members = hashed.select(col("id") +: (0 until 16).map(i =>
        graft.functions.XHash.member(col("h1"), col("h2"), i).as(s"h$i")): _*)
      val sig = members.groupBy(col("id"))
        .agg((0 until 16).map(i => min(col(s"h$i")).as(s"m$i")).head,
          (1 until 16).map(i => min(col(s"h$i")).as(s"m$i")): _*)
      noop(Dedup.candidatesOfSignature(sig, 8, 2))
    }
    t("c6 full jaccardVerified(exactKept)") {
      noop(Dedup.jaccardVerified(exactKept))
    }
    t("c7 full clean (again)") { noop(graft.dedup.Corpus.clean(docs)) }

    // job/stage counts for one clean()
    val st = spark.sparkContext.statusTracker
    val before = st.getJobIdsForGroup(null).length
    noop(graft.dedup.Corpus.clean(docs))
    val after = st.getJobIdsForGroup(null).length
    println(s"[prof] clean() jobs: ${after - before}")
    spark.stop()
  }
}

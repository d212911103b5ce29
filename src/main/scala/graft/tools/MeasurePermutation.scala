package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.Ann

/** Measurement harness for PERMUTATION-OPQ (round 13): does a learned
  * balanced-variance dimension permutation separate from plain PQ in
  * RECALL on the anisotropic fixture — the floor the r12 verdict
  * wanted, which the H·D rotation provably cannot provide there
  * (sampled-codebook inertness, AnnSpec theorem pin)? Reports
  * recall@10 hits out of 200 (20 queries, recallOf) for plain,
  * permuted, and (the control) an identity permutation — the basis for
  * the MinPermMargin / MinPermRecallHits floors — on the boosted
  * fixture and on the raw corpus. `MeasurePermutation <sfDir>` — one
  * JSON line. */
object MeasurePermutation {

  /** Integer per-dim energy ranking → round-robin subspace assignment:
    * new position (r%4)*16 + r/4 holds the dim ranked r by
    * n·Σq² − (Σq)² over q = floor(1e6·x) (order-free integer sums;
    * ties by dim index). */
  def permutationOf(corpus: DataFrame, dims: Int = 64,
      subs: Int = 4): Array[Int] = {
    val per = dims / subs
    // decimal(38,0) accumulation: n·Σq² and (Σq)² overflow int64 on
    // large corpora (q up to ~8e6 on the boosted fixture); exact
    // integers to 1e38 cover 10^12 rows
    val stats = corpus
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("pos"),
        floor(col("x").cast("double") * lit(1000000.0)).cast("long").as("q"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("q").cast("decimal(38,0)")).as("s1"),
        sum((col("q") * col("q")).cast("decimal(38,0)")).as("s2"))
      .select(col("pos"),
        (col("n") * col("s2") - col("s1") * col("s1"))
          .cast("decimal(38,0)").as("energy"))
      .collect().map(r => (r.getInt(0), r.getDecimal(1)))
    val ranked = stats.sortBy { case (pos, e) => (e.negate, pos) }(
      Ordering.Tuple2(Ordering.ordered[java.math.BigDecimal],
        Ordering.Int)).map(_._1)
    // perm(newPos) = oldPos: rank r lands at (r%subs)*per + r/subs
    val perm = new Array[Int](dims)
    for (r <- ranked.indices) perm((r % subs) * per + r / subs) = ranked(r)
    perm
  }

  def applyPerm(corpus: DataFrame, perm: Array[Int]): DataFrame =
    corpus.withColumn("embedding",
      transform(lit(perm), p =>
        element_at(col("embedding"), p.cast("int") + 1).cast("double")))

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def recallOf(c: DataFrame): (Int, Int) = {
      val mod = Some(math.max(1L, c.count() / 16))
      val qids = c.orderBy(col("vec_id")).limit(20)
        .collect().map(_.getLong(0))
      var plainHits = 0; var permHits = 0
      val perm = permutationOf(c)
      val pc = applyPerm(c, perm)
      for (qid <- qids) {
        val q = c.where(col("vec_id") === qid)
        val pq = pc.where(col("vec_id") === qid)
        val exact = Ann.bruteForceTopK(c, q, 10)
          .collect().map(_.getLong(0)).toSet
        plainHits += (Ann.pqTopK(c, q, 10, modulus = mod)
          .collect().map(_.getLong(0)).toSet & exact).size
        permHits += (Ann.pqTopK(pc, pq, 10, modulus = mod)
          .collect().map(_.getLong(0)).toSet & exact).size
      }
      (plainHits, permHits)
    }
    val aniso = graft.AnnQueries.anisoEmb(e)
    val (ap, aq) = recallOf(aniso)
    val (rp, rq) = recallOf(e)
    // the gate's population: cosine-dedup at 0.99 FIRST (near-copies
    // make recall@10 measure dedup, not search), then the boost
    val (nl, _, mod) = graft.AnnQueries.ivfGeom(e)
    val kept = Ann.semanticDedup(e, minCos = 0.99, nlist = nl,
      modulus = mod).select(col("vec_id"))
    val dd = graft.AnnQueries.anisoEmb(
      e.join(kept, Seq("vec_id"), "left_semi")).localCheckpoint()
    val (dp, dq) = recallOf(dd)
    println(s"""{"dir":"$dir","aniso_plain":$ap,"aniso_perm":$aq,""" +
      s""""raw_plain":$rp,"raw_perm":$rq,""" +
      s""""dedup_n":${dd.count()},"dedup_aniso_plain":$dp,""" +
      s""""dedup_aniso_perm":$dq,"outof":200}""")
    spark.stop()
  }
}

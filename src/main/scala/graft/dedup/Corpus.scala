package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Lineage.LineageOps
import graft.text.Text

/**
 * End-to-end training-corpus cleaning — the composition the individual
 * operators exist for: quality floor → language filter → exact dedup →
 * near-dup removal. Every stage is a DataFrame→DataFrame transform, so
 * the whole pipeline is one lazy plan the optimizer sees at once.
 *
 * Dedup keep-policy is deterministic: the LOWEST doc id of an
 * exact-duplicate group survives, and for each verified near-dup pair
 * the higher id is dropped (greedy pairwise removal — linear and
 * deterministic; a transitive-closure grouping would need iterative
 * connected components, which the pair volume rarely justifies).
 */
object Corpus {

  final case class CleanConfig(
      minQuality: Double = 0.3,
      langs: Option[Seq[String]] = None,
      nearDupJaccard: Double = 0.6,
      idCol: String = "doc_id",
      textCol: String = "text",
      /** false (default): greedy pairwise — drop doc_b of each verified
        * pair. true: connected-component grouping — keep exactly one doc
        * (the min id) per near-dup CLUSTER, so chains a~b~c keep only a
        * even when (a,c) was never a direct pair. Costs the label-
        * propagation iterations of [[Dedup.clusters]]. */
      clusterDedup: Boolean = false,
      /** With [[clusterDedup]]: elect the cluster survivor by BEST
        * per-token model quality instead of min id (the dedup_canonical
        * election — the lowest-id copy of a page is often the
        * worst-scraped one). Exact-integer key, min-id ties. */
      qualityCanonical: Boolean = false,
      /** Strip lines repeated across ≥ N docs before anything else
        * ([[stripBoilerplate]]); None (default) skips the stage. */
      boilerplateMinDocs: Option[Long] = None,
      /** Rewrite emails / long digit runs to placeholder tokens
        * (Text.scrubPii) before quality scoring. */
      scrubPii: Boolean = false)

  /** Quality + language row filter (no shuffle). */
  def baseFilter(cfg: CleanConfig): Column = {
    val q = Text.qualityScore(col(cfg.textCol)) >= cfg.minQuality
    cfg.langs match {
      case Some(ls) => q && Text.langId(col(cfg.textCol)).isInCollection(ls)
      case None => q
    }
  }

  /**
   * Boilerplate line removal (the C4/RefinedWeb move): a line whose
   * whitespace/case-normalized form appears in ≥ `minDocs` DISTINCT
   * documents is navigation/footer/header noise and is stripped from
   * every document; line order is preserved via position sort. Scale
   * shape: one explode + one count-distinct aggregation over lines + an
   * anti join — all shuffles keyed by line hash, never doc². Output:
   * every input row with `textCol` rewritten (possibly to "" when a doc
   * was pure boilerplate) — callers chain a quality floor after.
   */
  def stripBoilerplate(docs: DataFrame, minDocs: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // collision-safe internal alias: idCol may itself be "id", or docs
    // may carry an unrelated "id" column — a bare alias would make the
    // re-join ambiguous
    val k = "__bp_id"
    val lines = docs.select(col(idCol).as(k),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "ln")))
      .withColumn("n", Text.wsNorm(col("ln")))
    val hot = lines.where(col("n") =!= "")
      .groupBy(col("n"))
      .agg(countDistinct(col(k)).as("nd"))
      .where(col("nd") >= minDocs)
      .select(col("n"))
    val rebuilt = lines.join(hot, Seq("n"), "left_anti")
      .groupBy(col(k))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("ln")))),
        s => s.getField("ln")), "\n").as("_clean"))
    docs.join(rebuilt, col(idCol) === col(k), "left")
      .withColumn(textCol, coalesce(col("_clean"), lit("")))
      .drop(k, "_clean")
  }

  /** [[clean]]'s intermediate survivor frames, exposed for the
    * disposition ledger (row 120): `q` = past the base quality/lang
    * filter, `exactKept` = past exact dedup, `losers` = the near-dup
    * drop set over `exactKept`. `clean` == `exactKept` anti-join
    * `losers` — one source of truth for both consumers. */
  private[graft] final case class CleanStages(
      q: DataFrame, exactKept: DataFrame, losers: DataFrame)

  /**
   * Clean the corpus. Output = surviving input rows (original columns),
   * deterministic for a given input.
   */
  def clean(docs: DataFrame, cfg: CleanConfig = CleanConfig()): DataFrame = {
    val st = cleanStages(docs, cfg)
    st.exactKept.join(st.losers, Seq(cfg.idCol), "left_anti")
  }

  private[graft] def cleanStages(docs: DataFrame,
      cfg: CleanConfig = CleanConfig()): CleanStages = {
    // optional text-rewriting stages run FIRST: both change the text the
    // quality floor and the dedup fingerprints see
    var pre = docs
    cfg.boilerplateMinDocs.foreach(n =>
      pre = stripBoilerplate(pre, n, cfg.idCol, cfg.textCol))
    if (cfg.scrubPii)
      pre = pre.withColumn(cfg.textCol, Text.scrubPii(col(cfg.textCol)))
    val kept = pre.where(baseFilter(cfg))
    // exact dedup: keep the lowest id of each normalized-content group.
    // Materialized once (localCheckpoint): the near-dup stage walks it
    // through shingling AND the final anti-join reads it again — without
    // the cut, the filter+self-join pipeline re-executes per consumer.
    val exactKept = kept.join(
      Dedup.exactKeepers(kept, cfg.idCol, cfg.textCol), cfg.idCol)
      .lineageCut
    // near-dup removal: greedy (drop doc_b of each verified pair) or
    // cluster-wide (keep only the min id of each connected component)
    val losers =
      if (cfg.clusterDedup && cfg.qualityCanonical) {
        // quality-aware canonical: drop every cluster member except the
        // per-token quality argmax (exact-integer key — the +940·n
        // shift keeps the dividend non-negative so both engines' int
        // division agrees; ties elect min id). One groupBy max_by —
        // no per-cluster window.
        val cl = Dedup.clusters(exactKept, cfg.idCol, cfg.textCol,
          minJaccard = cfg.nearDupJaccard)
        val qk = Text.qualityModelRaw(exactKept, cfg.idCol, cfg.textCol)
          .withColumn("__qkey",
            expr(Text.qmKeyExpr))
          .select(col("doc_id").as(cfg.idCol), col("__qkey"))
        val win = cl.join(qk, Seq(cfg.idCol))
          .groupBy(col("cluster_id"))
          .agg(max_by(col(cfg.idCol),
            struct(col("__qkey"), col(cfg.idCol) * lit(-1L))).as("__win"))
        cl.join(win, Seq("cluster_id"))
          .where(col(cfg.idCol) =!= col("__win"))
          .select(cfg.idCol)
      } else if (cfg.clusterDedup)
        Dedup.clusters(exactKept, cfg.idCol, cfg.textCol,
          minJaccard = cfg.nearDupJaccard)
          .where(col(cfg.idCol) =!= col("cluster_id"))
          .select(cfg.idCol)
      else Dedup
        .jaccardVerified(exactKept, cfg.idCol, cfg.textCol,
          minJaccard = cfg.nearDupJaccard)
        .select(col("doc_b").as(cfg.idCol)).distinct()
    CleanStages(kept, exactKept, losers)
  }

  /** Sampling modulus: rates are expressed in millionths for exact
    * integer comparison (no float-boundary ambiguity across engines). */
  private val SampleMod = 1000000L

  /**
   * DETERMINISTIC hash sampling: keep a ~`rate` fraction of rows, chosen
   * by the doc id's [[graft.functions.XHash]] residue — reproducible
   * across runs, engines, and partitionings (unlike `df.sample`, whose
   * output depends on the partition layout), stable under re-runs of an
   * incremental pipeline (a doc's fate never changes), and replayable by
   * a SQL oracle. One codegen'd filter, no shuffle.
   */
  def sampleByHash(docs: DataFrame, rate: Double,
      idCol: String = "doc_id"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    docs.where(
      pmod(graft.functions.XHash.h60(col(idCol).cast("string")),
        lit(SampleMod)) < lit((rate * SampleMod).toLong))
  }

  /** Sentinel for "derive `shards` from the corpus size" in
    * [[packChunks]] — the [[graft.ann.Ann.DeriveBits]] convention. */
  val DeriveShards = 0

  /** Assumed on-disk bytes per document row when sizing shards from plan
    * statistics (order of magnitude only — a 2× error halves/doubles the
    * docs-per-shard target, which [[shardsFor]] already tolerates). */
  private val BytesPerDocRow = 4096L

  /**
   * Shard count sized to the corpus: each shard is ONE window-sort task
   * (the running token sum), so `shards` caps both parallelism and
   * per-task volume. ceil(n / targetDocs), floored at `minShards` (a
   * fixed 32 was a 32-task ceiling at cluster scale: 10⁹ docs over 32
   * shards is 30M-doc sort chains; derived, it's ~15k shards of 64k
   * docs), capped at 2²⁰ (beyond that the shard key itself is cheap but
   * per-shard chunk streams get too short to pack).
   */
  private[graft] def shardsFor(n: Long, targetDocs: Long = 65536L,
      minShards: Int = 32): Int = {
    val s = (math.max(0L, n) + targetDocs - 1) / math.max(1L, targetDocs)
    math.min(1L << 20, math.max(minShards.toLong, s)).toInt
  }

  /**
   * Sequence PACKING for training (the concat-and-chunk pipeline): lay
   * each document's tokens end-to-end within a shard and split the
   * stream at fixed `seqLen` boundaries — each doc maps to the context
   * windows [chunk_first, chunk_last] it lands in, starting at token
   * offset `tok_offset` of its shard's stream. Docs shard by id hash
   * and order by id within a shard, so the layout is reproducible
   * run-to-run and engine-to-engine. Scale shape: one shuffle on the
   * shard key, then a per-shard running sum — `shards` bounds the
   * window parallelism, so the default derives it from plan-stats size
   * ([[shardsFor]]; pass an explicit count when the layout must be
   * pinned, e.g. for a cross-engine oracle). The running sum is integer
   * and the chunk math integer division — all-integer output, bit-exact
   * in any engine.
   */
  def packChunks(docs: DataFrame, seqLen: Int = 2048,
      shards: Int = DeriveShards,
      idCol: String = "doc_id", textCol: String = "text",
      shuffleSeed: Option[Long] = None): DataFrame =
    packMembers(docs, seqLen, shards, idCol, textCol, shuffleSeed)
      .drop("n_toks")

  /** [[packChunks]] plus each member's token count — the full member
    * table [[writeShards]] persists so the manifest is recomputable
    * from the artifact alone (offsets re-derive from n_toks).
    *
    * `shuffleSeed`: the trainer's data-order knob. Unseeded, the pack
    * layout is id-deterministic — every epoch reads the corpus in the
    * SAME order, which correlates adjacent gradient steps. Seeded, the
    * permutation key becomes `h60(seed || ':' || id)`: shard
    * assignment AND within-shard order both follow the key, so one
    * integer reshuffles the whole corpus globally while staying fully
    * replayable (re-running epoch 3 re-reads epoch 3's exact order —
    * the property `df.sample`/`rand()` cannot give, since their output
    * depends on partition layout). Same multiset of (id, tokens) for
    * every seed — only the layout moves (QuotaSpec pins both). Id
    * remains the tiebreak so determinism never rests on "h60 never
    * collides". */
  def packMembers(docs: DataFrame, seqLen: Int = 2048,
      shards: Int = DeriveShards,
      idCol: String = "doc_id", textCol: String = "text",
      shuffleSeed: Option[Long] = None,
      /** Curriculum knob: a deterministic integer grade evaluated on
        * the doc row, ordered BEFORE the shuffle key within each shard
        * — so the pack reads grade 0's docs first and the top grade
        * last (the anneal-on-high-quality-late schedule), while the
        * seeded hash still shuffles within each grade. Shard
        * assignment ignores it: shards stay hash-balanced, the
        * curriculum is an ORDER contract, not a placement one. */
      orderPrefix: Option[Column] = None,
      /** What counts as a token. The whitespace default sizes manifests
        * in WORDS; a trainer's loader consumes TOKENIZER tokens, which
        * run ~1.3-2× words (fertility) — a whitespace-sized pack
        * mis-sizes every context window by that factor. Pass the
        * tokenizer's counter (e.g. [[Text.bpeTokenCount]]) to size the
        * layout in the units the training run actually spends. */
      tokenCount: Column => Column = Text.tokenCount): DataFrame = {
    require(seqLen > 0 && shards >= 0, "seqLen and shards must be positive")
    val nShards =
      if (shards == DeriveShards)
        shardsFor(graft.ann.Ann.estimatedRows(docs, BytesPerDocRow))
      else shards
    val key = shuffleSeed match {
      case Some(seed) => graft.functions.XHash.h60(
        concat(lit(s"$seed:"), col(idCol).cast("string")))
      case None => graft.functions.XHash.h60(col(idCol).cast("string"))
    }
    val t = docs.select(col(idCol).as("id") +:
      pmod(key, lit(nShards.toLong)).as("shard") +:
      (shuffleSeed match {
        case Some(_) => key
        case None => col(idCol) // unseeded keeps the id's native order
      }).as("ord") +:
      tokenCount(col(textCol)).cast("long").as("n_toks") +:
      orderPrefix.map(_.as("grade")).toSeq: _*)
    val ordCols = orderPrefix.map(_ => col("grade")).toSeq ++
      Seq(col("ord"), col("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(ordCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    t.withColumn("tok_offset", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select(col("id").as(idCol) +:
        col("shard").cast("long").as("shard") +:
        col("n_toks") +:
        col("tok_offset") +:
        expr(s"tok_offset div $seqLen").as("chunk_first") +:
        // greatest(n_toks, 1): a ZERO-token doc (possible under a
        // tokenizer counter — bpeTokenCount on letterless text; the
        // whitespace counter never returns 0) must land as a zero-width
        // member at its offset, chunk_first == chunk_last. Without the
        // clamp the dividend goes to -1 at offset 0, where Spark's
        // `div` (truncate: 0) and an oracle's `//` (floor: -1) disagree
        // — a cross-engine trap only letterless docs would spring.
        expr(s"(tok_offset + greatest(n_toks, 1) - 1) div $seqLen")
          .as("chunk_last") +:
        // the curriculum grade rides the member table out (consumers
        // would otherwise recompute the scoring pass just to re-join it)
        orderPrefix.map(_ => col("grade")).toSeq: _*)
  }

  /**
   * The PHYSICAL packing the manifest (row 86) summarizes: each shard's
   * token stream in doc-id order, split into fixed `seqLen` context
   * windows — (shard, seq_idx, tokens), every window full except each
   * shard's last. What a trainer's loader memory-maps; until this, the
   * pipeline only ever published the summary.
   *
   * Scale shape: tokenize-explode with the member offsets already
   * computed (one per-shard window over doc-count rows, same as
   * packChunks), then ONE shuffle on (shard, seq_idx) whose groups are
   * bounded by seqLen tokens — the window assembly is embarrassingly
   * parallel at any corpus size. Token order inside a window is pinned
   * by the (pos_in_seq, token) struct sort.
   */
  def packedSequences(docs: DataFrame, seqLen: Int = 2048,
      shards: Int = DeriveShards,
      idCol: String = "doc_id", textCol: String = "text",
      shuffleSeed: Option[Long] = None): DataFrame = {
    val members = packMembers(docs, seqLen, shards, idCol, textCol,
        shuffleSeed)
      .select(col(idCol), col("shard"), col("tok_offset"))
    docs.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .join(members, Seq(idCol))
      .select(col("shard"), col("tok_offset"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("gidx", col("tok_offset") + col("pos"))
      .select(col("shard"), expr(s"gidx div $seqLen").as("seq_idx"),
        expr(s"gidx % $seqLen").as("p"), col("tok"))
      .groupBy(col("shard"), col("seq_idx"))
      .agg(transform(array_sort(collect_list(struct(col("p"), col("tok")))),
        s => s.getField("tok")).as("tokens"))
  }

  /** Persist the packing: `root/members` (the [[packMembers]] table)
    * and `root/seqs` ([[packedSequences]], partitioned by shard — the
    * shard files themselves). The written artifact is self-contained:
    * corpus_pack_written recomputes the manifest from these bytes and
    * gates it against the raw-corpus oracle. */
  def writeShards(docs: DataFrame, root: String, seqLen: Int = 2048,
      shards: Int = DeriveShards,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    packMembers(docs, seqLen, shards, idCol, textCol)
      .write.mode("overwrite").parquet(s"$root/members")
    packedSequences(docs, seqLen, shards, idCol, textCol)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$root/seqs")
  }

  /**
   * Per-source token QUOTAS at pack time — the mixture CONTRACT the
   * rate knob of [[mixture]] can't express: "at most N tokens of
   * source S in the packed corpus", exact to the token. Admission is
   * an ordered prefix per source (doc_id ascending; the first doc
   * whose inclusive running token sum exceeds the quota, and everything
   * after it, is dropped), so the admitted set is deterministic,
   * engine-independent, and all-integer. Quota -1 (or an unlisted
   * source) = uncapped. The quota table is a tiny when-chain in the
   * plan — no join, no driver map.
   *
   * Scale shape: a naive `Window.partitionBy(source)` puts each
   * source's whole corpus in ONE task — a 40%-of-100TB source is a
   * single-partition prefix sum. This is the two-pass formulation
   * instead: bucket each source by doc-id range (bucket width derived
   * from one max-id scalar, ≤ [[QuotaBuckets]] buckets), sum partials
   * per (source, bucket) — a tiny table — prefix those per source, and
   * broadcast the offsets back so the within-bucket window runs on
   * bounded partitions. Same numbers, parallelism sources×buckets.
   */
  def quotaAdmit(docs: DataFrame, quotas: Seq[(String, Long)],
      idCol: String = "doc_id", textCol: String = "text",
      srcCol: String = "source", default: Long = -1L,
      broadcastOffsets: Boolean = true): DataFrame =
    quotaAdmitWith(docs, quotaCol(quotas, srcCol, default), idCol,
      textCol, srcCol, broadcastOffsets)

  /** [[quotaAdmit]] with the cap as an arbitrary EXPRESSION over the
    * doc row — e.g. a per-source residual JOINED IN from a computed
    * plan — instead of a literal when-chain: the learned-mixture shape,
    * where the quotas are themselves corpus-derived columns (the
    * repetition plan's partial-epoch admission). Same two-pass bucketed
    * prefix sum, same inclusive boundary, negative cap = uncapped. */
  def quotaAdmitWith(docs: DataFrame, quota: Column,
      idCol: String = "doc_id", textCol: String = "text",
      srcCol: String = "source",
      broadcastOffsets: Boolean = true,
      /** Precomputed per-doc token count (r19): a caller that already
        * carries the count (corpus_upsample's n_toks) passes it here so
        * the admission never re-tokenizes the text — same integers,
        * one fewer tokenize pass. None = count textCol. */
      tokens: Option[Column] = None): DataFrame = {
    val q = quota
    val maxId = docs.agg(max(col(idCol))).head.getAs[Any](0) match {
      case null => 0L
      case l: Long => l
      case i: Int => i.toLong
    }
    val width = math.max(1L, maxId / QuotaBuckets + 1)
    val toks = tokens.getOrElse(Text.tokenCount(col(textCol)).cast("long"))
    val t = docs.withColumn("__toks", toks)
      .withColumn("__b", expr(s"CAST($idCol AS BIGINT) div $width"))
    val partials = t.groupBy(col(srcCol).as("__s"), col("__b"))
      .agg(sum(col("__toks")).as("__bt"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__s")).orderBy(col("__b"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = partials
      .withColumn("__off", coalesce(sum(col("__bt")).over(wb), lit(0L)))
      .select(col("__s").as(srcCol), col("__b"), col("__off"))
    val ww = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol), col("__b")).orderBy(col(idCol))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val off = if (broadcastOffsets) broadcast(offsets) else offsets
    t.join(off, Seq(srcCol, "__b"))
      .withColumn("__cum", col("__off") + sum(col("__toks")).over(ww))
      .where(q < 0L || col("__cum") <= q)
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /** Offset-table grain of [[quotaAdmit]]'s two-pass prefix sum. */
  private[graft] val QuotaBuckets = 1024L

  /** The quota when-chain: key → token cap, -1 = uncapped. `default`
    * is what an UNLISTED key gets — -1 for the per-source contract
    * (name the sources you cap), a positive cap for the per-DOMAIN
    * contract (a web crawl has millions of registered domains; the
    * contract is "no single domain exceeds N tokens" with a short
    * explicit-exception list, never a million-entry when-chain). With
    * a positive default the offsets table's cardinality is
    * (distinct keys × occupied buckets) — pass
    * `broadcastOffsets = false` there so the planner (AQE) picks the
    * join strategy from actual size instead of forcing a broadcast of
    * an unbounded-key table. */
  private def quotaCol(quotas: Seq[(String, Long)], srcCol: String,
      default: Long = -1L): Column =
    quotas.foldLeft(lit(default): Column) { case (acc, (s0, lim)) =>
      when(col(srcCol) === s0, lit(lim)).otherwise(acc)
    }

  /** [[writeShards]] over the quota-admitted corpus, with the member
    * table additionally carrying each doc's SOURCE — the per-source
    * column the manifest needs so per-source accounting (row 91's
    * quota gates) recomputes from the written bytes alone, never from
    * a join back to the raw corpus. */
  def writeShardsQuota(docs: DataFrame, root: String,
      quotas: Seq[(String, Long)], seqLen: Int = 2048,
      shards: Int = DeriveShards, idCol: String = "doc_id",
      textCol: String = "text", srcCol: String = "source",
      default: Long = -1L, broadcastOffsets: Boolean = true): Unit = {
    val admitted = quotaAdmit(docs, quotas, idCol, textCol, srcCol,
        default, broadcastOffsets)
      .lineageCut
    packMembers(admitted, seqLen, shards, idCol, textCol)
      .join(admitted.select(col(idCol), col(srcCol)), Seq(idCol))
      .write.mode("overwrite").parquet(s"$root/members")
    packedSequences(admitted, seqLen, shards, idCol, textCol)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$root/seqs")
  }

  /**
   * Source-weighted MIXTURE sampling (domain reweighting — the
   * "3 epochs of wikipedia, 0.5 of common crawl" knob of a pretraining
   * data recipe, for the down-weighting case): each source keeps its own
   * deterministic hash fraction. Unlisted sources keep `default`. The
   * rate table is a tiny when-chain (codegen'd), not a join — the pass
   * stays shuffle-free at any corpus size.
   */
  /**
   * Crawl delta: classify every doc id across two snapshots of the
   * same corpus as `added` (new only), `removed` (old only), `changed`
   * (both, different normalized content), or `unchanged` — the
   * incremental pipeline's routing table: `added ∪ changed` is what
   * flows into dedup/clean/index update, `removed` is what retires
   * from the stores. One content fingerprint per side, one full-outer
   * shuffle join on the id — at warehouse scale both snapshots would
   * be bucketed by id so the join co-locates without a shuffle; no
   * content ever crosses the wire, only (id, 32-byte fp).
   */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val o = oldDocs.select(col(idCol), Text.fingerprint(col(textCol)).as("ofp"))
    val n = newDocs.select(col(idCol), Text.fingerprint(col(textCol)).as("nfp"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("ofp").isNull, lit("added"))
          .when(col("nfp").isNull, lit("removed"))
          .when(col("ofp") =!= col("nfp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /**
   * Referential-integrity report across the corpus's parallel tables
   * (documents ↔ embeddings here; any id-keyed pair in general): one
   * row of counts — rows per side, ids missing a partner on either
   * side, duplicated ids on either side. The pre-flight check an
   * embedding-dependent stage (ANN, semantic dedup, DSIR-by-embedding)
   * runs before trusting the join: at 100 TB a silently half-embedded
   * corpus poisons every downstream cosine. Two groupBys and one
   * full-outer join on the id — linear, co-locatable when both tables
   * are id-bucketed.
   */
  def integrityReport(docs: DataFrame, vecs: DataFrame,
      docIdCol: String = "doc_id", vecIdCol: String = "vec_id"): DataFrame = {
    val dd = docs.groupBy(col(docIdCol).as("id")).agg(count(lit(1)).as("dn"))
    val vv = vecs.groupBy(col(vecIdCol).as("id")).agg(count(lit(1)).as("vn"))
    dd.join(vv, Seq("id"), "full_outer").agg(
      sum(coalesce(col("dn"), lit(0L))).cast("long").as("n_docs"),
      sum(coalesce(col("vn"), lit(0L))).cast("long").as("n_vecs"),
      sum(when(col("vn").isNull, 1L).otherwise(0L)).as("docs_without_vec"),
      sum(when(col("dn").isNull, 1L).otherwise(0L)).as("vecs_without_doc"),
      sum(when(col("dn") > 1, 1L).otherwise(0L)).as("dup_doc_ids"),
      sum(when(col("vn") > 1, 1L).otherwise(0L)).as("dup_vec_ids"))
  }

  /**
   * Mixture WATER-FILLING solver (SURVEY row 104): allocate a token
   * budget across sources proportionally to declared weights, capped
   * by each source's actual availability — the feasibility step every
   * mixture recipe (rows 40/92/97) assumes someone already ran: a
   * weight schedule like DoReMi's is a WISH; the corpus has hard
   * per-source supplies, and the allocator must spill a scarce
   * source's unused share onto the others without disturbing their
   * ratios.
   *
   * Exact classic water-filling: sort sources by avail/weight
   * ascending (the integer key avail·(L/weight) with L = lcm of the
   * gcd-NORMALIZED weights, so the RATIONAL order is exact — no float
   * quotients); the saturated set is a PREFIX of that order (standard
   * water-filling lemma), found by the first position whose
   * availability exceeds its proportional share of the REMAINING
   * budget; everyone after gets floor(R·w/W') of the remaining pool.
   *
   * Overflow contract: weights are USER input (`dn curate-add
   * --weights`, arbitrary positive longs). They are normalized by
   * their gcd first (every decision below is scale-invariant in the
   * weights — the rationals avail/w and R·w/W' are unchanged — so the
   * OUTPUT carries the original weights); the lcm and Σw of the
   * normalized set are computed with multiplyExact/addExact and a
   * too-coprime set is REJECTED loudly instead of silently corrupting
   * the sort order. Every product of a data-sized value (avail, the
   * budget) with a weight-sized value runs in DECIMAL(38,0) (DuckDB:
   * HUGEINT) — avail ≤ 2^63 times lcm/w ≤ 2^63 is < 8.6e37, inside
   * 38 digits for ALL representable inputs — and the floor divisions
   * land back in int64 (alloc ≤ budget). Non-negative operands keep
   * trunc == floor cross-engine.
   *
   * Scale shape: one tokenize pass + one groupBy(source); everything
   * after runs on the SOURCE table, which the mixture config bounds by
   * construction (you name the sources you weight — the row-92
   * argument), so the global sort windows sit above a bounded
   * aggregate. Output: (source, weight, avail, alloc, saturated).
   */
  def mixSolve(docs: DataFrame, weights: Map[String, Long],
      budgetNum: Long = 9L, budgetDen: Long = 10L,
      srcCol: String = "source", textCol: String = "text"): DataFrame =
    waterFill(docs, weights, budgetNum, budgetDen, 1L, srcCol, textCol)
      .select(col("source"), col("weight"), col("avail"), col("alloc"),
        col("saturated"))

  /** Stride between a doc's copy ids at pack time (`corpus_pack_repeat`
    * assigns cid = doc_id·stride + epoch, epochs starting at 1). Two
    * docs' copy ranges stay disjoint iff the epoch SPAN stays under
    * the stride, so the stride must exceed maxEpochs+1 (the partial
    * copy's worst-case epoch) for EVERY legal maxEpochs — 32 covers
    * the solver's whole [1, 16] range; 8 (the old stride) silently
    * merged adjacent docs' training copies once maxEpochs reached 9
    * (doc i epoch 9 = 8i+9 = 8(i+1)+1 = doc i+1 epoch 1), identical
    * cid AND identical text, invisible to every downstream gate.
    * Enforced by a `require` in [[mixSolveRepeat]] so the invariant is
    * checked where the epochs are minted, not just where they are
    * packed; QuotaSpec drives the epochCap=9 collision on the old
    * arithmetic. */
  val CopyIdStride = 32L

  /**
   * Water-filling WITH REPETITION (SURVEY row 111): the row-104 solver
   * composed with row 97's data-constrained epoch cap (Muennighoff et
   * al. 2023: repeating data beyond ~4 epochs stops buying loss). Each
   * source's SUPPLY is avail·maxEpochs — a scarce source may be
   * repeated up to the cap before it saturates — and the budget may
   * exceed the unique corpus (budgetNum/budgetDen is still a fraction
   * of Σavail, e.g. 18/10 = train on 1.8× the corpus tokens). Where
   * row 97's planner TRUNCATES a capped source's excess, the solver
   * SPILLS it onto the uncapped sources at their weight ratios — the
   * standard lemma, on the repeated supplies. Output adds the epoch
   * split the executor consumes: full_epochs = alloc div avail whole
   * copies plus resid_toks = alloc mod avail partial-epoch tokens.
   */
  def mixSolveRepeat(docs: DataFrame, weights: Map[String, Long],
      budgetNum: Long = 18L, budgetDen: Long = 10L, maxEpochs: Long = 4L,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    require(maxEpochs >= 1 && maxEpochs <= 16,
      s"mixSolveRepeat: maxEpochs must be in [1, 16], got $maxEpochs")
    require(maxEpochs + 1 < CopyIdStride,
      s"mixSolveRepeat: epoch can reach maxEpochs+1=${maxEpochs + 1}; " +
        s"CopyIdStride=$CopyIdStride would collide copy ids at pack time")
    waterFill(docs, weights, budgetNum, budgetDen, maxEpochs,
        srcCol, textCol)
      .select(col("source"), col("weight"), col("avail"), col("sup"),
        col("alloc"), col("saturated"),
        when(col("avail") === 0L, 0L)
          .otherwise(expr("alloc div avail")).as("full_epochs"),
        when(col("avail") === 0L, 0L)
          .otherwise(col("alloc") % col("avail")).as("resid_toks"))
  }

  /** The shared exact water-fill: availability per source, SUPPLY =
    * avail·epochCap drives every decision, budget stays a fraction of
    * Σavail (the unique corpus). Returns one row per source with
    * (source, weight, avail, sup, alloc, saturated). */
  private def waterFill(docs: DataFrame, weights: Map[String, Long],
      budgetNum: Long, budgetDen: Long, epochCap: Long,
      srcCol: String, textCol: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixSolve: weights must be positive")
    require(budgetNum >= 0 && budgetDen > 0,
      s"mixSolve: budget must be a non-negative fraction, " +
        s"got $budgetNum/$budgetDen")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    // normalize by the gcd (decision-invariant), then lcm/Σ with exact
    // arithmetic: a weight set whose lcm cannot be represented would
    // silently corrupt the rational sort order — reject it instead
    val g = weights.values.reduce(gcd)
    val wn: Map[String, Long] = weights.map { case (k, v) => k -> v / g }
    val (lcmW, twCheck) =
      try (wn.values.reduce((a, b) => Math.multiplyExact(a / gcd(a, b), b)),
        wn.values.reduce((a, b) => Math.addExact(a, b)))
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          "mixSolve: lcm or sum of the gcd-normalized weights overflows " +
            "int64 — reduce the weight set (e.g. round near-coprime " +
            s"weights to a common grid): ${weights.values.toSeq.sorted}")
      }
    require(twCheck > 0, "mixSolve: weight sum must be positive")
    // per-source integer multiplier lcm/w — the division is exact, so
    // key = sup·(lcm/w) carries the rational sup/w order without
    // ever forming sup·lcm (which CAN overflow even decimal(38))
    val lwOf: Map[String, Long] = wn.map { case (k, v) => k -> lcmW / v }
    val w = org.apache.spark.sql.expressions.Window
    val byKey = w.orderBy(col("key"), col("source"))
    val run = byKey.rowsBetween(w.unboundedPreceding, w.currentRow)
    val all = w.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val avail = docs
      .select(col(srcCol).as("source"),
        Text.tokenCount(col(textCol)).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("avail"))
      .withColumn("sup", col("avail") * lit(epochCap))
      // an unweighted source is a CONFIG error, not a silent default
      .withColumn("weight",
        coalesce(element_at(typedLit(weights), col("source")),
          raise_error(concat(lit("mixSolve: unweighted source "),
            col("source"))).cast("long")))
      // the gcd-normalized twin drives every DECISION; `weight` is
      // what the caller declared and what the output reports
      .withColumn("wn", element_at(typedLit(wn), col("source")))
    val totals = avail.agg(sum(col("avail")).as("ta"),
      sum(col("wn")).as("tw"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val srt = avail.crossJoin(broadcast(totals))
      .withColumn("bud",
        expr(s"CAST(ta AS DECIMAL(38,0)) * $budgetNum div $budgetDen"))
      .withColumn("key",
        dec(col("sup")) * element_at(typedLit(lwOf), col("source")))
      .withColumn("pos", row_number().over(byKey))
      .withColumn("cuma", sum(col("sup")).over(run))
      .withColumn("cumw", sum(col("wn")).over(run))
      // exclusive prefixes; saturated iff supply ≤ share of what's left
      .withColumn("satur",
        dec(col("sup")) * (col("tw") - (col("cumw") - col("wn"))) <=
          dec(col("bud") - (col("cuma") - col("sup"))) * col("wn"))
    srt
      .withColumn("kstar",
        min(when(!col("satur"), col("pos"))).over(all))
      .withColumn("cumaK", coalesce(
        max(when(col("pos") < col("kstar"), col("cuma"))).over(all),
        lit(0L)))
      .withColumn("cumwK", coalesce(
        max(when(col("pos") < col("kstar"), col("cumw"))).over(all),
        lit(0L)))
      .select(col("source"), col("weight"), col("avail"), col("sup"),
        when(col("kstar").isNull || col("pos") < col("kstar"),
            col("sup"))
          .otherwise(expr(
            "CAST(bud - cumaK AS DECIMAL(38,0)) * wn div (tw - cumwK)"))
          .as("alloc"),
        (col("kstar").isNull || col("pos") < col("kstar"))
          .as("saturated"))
  }

  def mixBySource(docs: DataFrame, rates: Map[String, Double],
      default: Double = 0.0, sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    (default +: rates.values.toSeq).foreach(r =>
      require(r >= 0 && r <= 1, s"rate must be in [0,1]: $r"))
    // sorted for a deterministic plan (Map iteration order is not)
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (s, r)) => when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    docs.where(
      pmod(graft.functions.XHash.h60(col(idCol).cast("string")),
        lit(SampleMod)) <
        // floor, not a bare cast: Spark's double→long cast truncates
        // while DuckDB's CAST rounds — an explicit floor on BOTH sides
        // (see the oracle SQL) agrees for arbitrary rates, not just
        // those landing exactly on the 1e-6 grid
        floor(rateCol * lit(SampleMod.toDouble)))
  }

  /**
   * Source-weighted RESAMPLING, the full "epochs" knob: where
   * [[mixBySource]] only down-weights (a rate is a keep-probability,
   * capped at 1), this realizes rates ABOVE 1 as deterministic
   * repetition — rate 2.5 keeps two full copies of every doc and a
   * hash-chosen half of the docs gets a third, which is exactly the
   * "2.5 epochs of this source" a pretraining recipe means. Each kept
   * copy carries a 0-based `dn_epoch` index so downstream stages (and
   * the SQL oracle) can tell repeats apart. Shuffle-free: the copy
   * count is a per-row expression and the repetition is a generator
   * (explode), so the pass stays embarrassingly parallel at any corpus
   * size — no join, no shuffle, output size = sum of rates × source
   * sizes.
   */
  def resampleBySource(docs: DataFrame, rates: Map[String, Double],
      default: Double = 1.0, sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    (default +: rates.values.toSeq).foreach(r =>
      require(r >= 0, s"rate must be non-negative: $r"))
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (s, r)) => when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    val h = pmod(graft.functions.XHash.h60(col(idCol).cast("string")),
      lit(SampleMod))
    // floor, not a bare cast, for the fractional threshold: Spark's
    // double→long cast truncates, DuckDB's CAST rounds — explicit floor
    // on both sides agrees for arbitrary rates (1e-6 grid or not)
    val copies = floor(rateCol).cast("long") +
      when(h < floor((rateCol - floor(rateCol)) * lit(SampleMod.toDouble)),
        lit(1L)).otherwise(lit(0L))
    // guard the empty case explicitly: sequence(0, -1) would COUNT DOWN
    // ([0, -1] — two rows) instead of yielding nothing
    docs.withColumn("dn_epoch",
      explode(when(copies > 0, sequence(lit(0L), copies - 1))
        .otherwise(array().cast("array<bigint>"))))
  }

  /**
   * Per-source document CAP (stratified sampling) — the "at most N docs
   * per domain" mixture step that bounds any one domain's share of the
   * corpus, the complement of [[mixBySource]]'s rate-based reweighting
   * (a rate can't cap a domain whose size you don't know in advance).
   * Keeps the `per` docs with the SMALLEST deterministic hash within
   * each source: a uniform pick, stable across runs and engines, and
   * replayable in SQL as a plain row_number() over (hash, id) window —
   * which is exactly the result this computes, by a cheaper route.
   *
   * Scale shape: a naive window ranks every row of every source — a
   * whale domain (hundreds of millions of rows behind one key) pays an
   * O(n log n) single-partition external sort to keep `per` of them.
   * Because the selector is a UNIFORM hash, the winners concentrate in
   * the lowest `per/n` of the hash space, so the rank only needs the
   * rows under a `safety`× threshold: one sort-free shuffle-join
   * against the per-source populations (map-side-combined aggregate,
   * no sort), a hash-threshold filter that keeps ~safety×per rows per
   * source, and the window over the survivors. Sources at or below
   * safety×per skip thinning entirely (threshold = MAX). The result is
   * UNCONDITIONALLY exact, not probabilistic: a source whose survivors
   * fall short of min(per, n) (probability ~exp(-per) per source, only
   * possible for thinned whales) is detected by a count over the capped
   * output and re-ranked without the threshold — one tiny follow-up
   * job that is empty in every non-pathological run.
   */
  def stratifiedSample(docs: DataFrame, per: Int,
      sourceCol: String = "source", idCol: String = "doc_id",
      safety: Double = 4.0): DataFrame = {
    require(per > 0, "per must be positive")
    require(safety > 0, "safety must be positive")
    val h = graft.functions.XHash.h60(col(idCol).cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(h, col(idCol))
    def rank(df: DataFrame): DataFrame =
      df.withColumn("_rn", row_number().over(w))
        .where(col("_rn") <= per).drop("_rn")
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
    // h60 is uniform on [0, 2^60)
    val space = math.pow(2.0, 60)
    val thresh = when(col("_n") <= lit(safety * per), lit(Long.MaxValue))
      .otherwise((lit(safety * per) / col("_n") * lit(space)).cast("long"))
    // materialize the capped survivors once: the exactness guard and the
    // final output would otherwise each replay the thin+rank lineage
    val kept = rank(docs.join(counts, sourceCol).where(h <= thresh))
      .lineageCut
    // shortfall detection must start from the FULL source list (counts):
    // a source whose survivors are zero is absent from `kept` entirely
    // and a guard built on kept alone would never see it
    val keptCounts = kept.groupBy(col(sourceCol)).agg(count(lit(1)).as("_k"))
    val short = counts.join(keptCounts, Seq(sourceCol), "left")
      .where(coalesce(col("_k"), lit(0L)) < least(lit(per.toLong), col("_n")))
      .select(col(sourceCol))
    val out = if (short.isEmpty) kept else {
      // the failed sources are by construction a handful — broadcast
      val redo = rank(docs.join(broadcast(short), sourceCol))
      kept.join(broadcast(short),
        Seq(sourceCol), "left_anti").unionByName(redo, allowMissingColumns = true)
    }
    out.drop("_n")
  }

  /**
   * DSIR-style importance-weighted data selection (Xie et al. 2023,
   * arXiv:2302.03169): score every doc by how much more likely its
   * hashed-n-gram bag is under the TARGET slice's feature distribution
   * than under the whole corpus's, then keep the docs above the
   * corpus-quantile cutoff of a Gumbel-perturbed score — importance
   * resampling without replacement via deterministic Gumbel top-k,
   * with the Gumbel noise derived from the doc id's XHash so an
   * oracle can replay the draw.
   *
   * Features are word unigrams + bigrams hashed into `buckets` bins
   * (the paper's hashed n-gram model). Per-bin Laplace-smoothed log
   * ratio ln((ct+1)/(Nt+B)) − ln((cr+1)/(Nr+B)) lives in a ≤B-row
   * broadcast; a doc's `logw` is the sum over its feature occurrences.
   * Scale shape: tokenization runs ONCE — the exploded features
   * aggregate straight to per-(doc, bucket) counts (map-side combine,
   * ≤ buckets rows per doc) and that bounded table is materialized via
   * localCheckpoint before its three consumers, so neither model count
   * nor the weight sum re-reads the raw text. The target slice rides
   * along as a flag from the first select — no join against a
   * target-id set that might itself be corpus-sized. The keep cutoff
   * comes from the bucket-bounded [[graft.plans.Quantiles]] histogram
   * — no global sort, no corpus-sized shuffle beyond the per-doc agg.
   */
  def dsirSelect(docs: DataFrame, isTarget: Column, buckets: Int = 1024,
      keepQuantile: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("id"), isTarget.as("tgt"),
      Text.tokens(col(textCol)).as("toks"))
    // unigram + bigram features in ONE explode (r19, guide §2.4): the
    // bigram window array comes from the native ShingleWindows kernel
    // (byte-identical to concat_ws(" ", slice(toks, i+1, 2)) per slot)
    // concatenated onto the token array — replacing two explode passes
    // + a union. The size guard keeps the kernel's short-doc arm (a
    // 1-token doc would otherwise mint its whole text as a "bigram",
    // which the old >= 2 filter excluded); the feature MULTISET per
    // doc is identical, and the bucket counts are order-independent.
    val bigrams = org.apache.spark.sql.graft.bridge.column(
      graft.functions.ShingleWindows(
        org.apache.spark.sql.graft.bridge.expression(col("toks")), 2))
    val feats = concat(col("toks"),
      when(size(col("toks")) >= 2, bigrams)
        .otherwise(array().cast("array<string>")))
    val fcnt = base.select(col("id"), col("tgt"),
        explode(feats).as("f"))
      .select(col("id"), col("tgt"),
        pmod(graft.functions.XHash.h60(col("f")), lit(buckets.toLong)).as("bkt"))
      .groupBy(col("id"), col("tgt"), col("bkt"))
      .agg(count(lit(1)).as("n"))
      .lineageCut
    val ct = fcnt.where(col("tgt"))
      .groupBy(col("bkt")).agg(sum(col("n")).as("tc"))
    val cr = fcnt.groupBy(col("bkt")).agg(sum(col("n")).as("rc"))
    // every feature bucket appears in cr (raw spans all docs), so the
    // model rows are cr left-joined with the target counts — and the
    // nt/nr normalizers ride the SAME ≤`buckets`-row frame as
    // partitionless window sums (r19, guide §2.4: they were two
    // separate fcnt aggregates + crossJoin broadcasts). Integer sums
    // are order-independent, so the doubles cast after the window are
    // bit-identical to the old scalar aggregates; sum(coalesce(tc, 0))
    // over the left join == sum(tc) over ct because every ct bucket is
    // a cr bucket.
    val allW = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val model = cr.join(ct, Seq("bkt"), "left")
      .select(col("bkt"), col("tc"), col("rc"),
        coalesce(sum(coalesce(col("tc"), lit(0L))).over(allW), lit(0L))
          .cast("double").as("nt"),
        sum(col("rc")).over(allW).cast("double").as("nr"))
      .select(col("bkt"),
        (log((coalesce(col("tc"), lit(0L)).cast("double") + 1.0)
            / (col("nt") + buckets))
          - log((col("rc").cast("double") + 1.0) / (col("nr") + buckets)))
          .as("lw"))
    val docw = fcnt.join(broadcast(model), Seq("bkt"))
      .groupBy(col("id"))
      .agg(round(sum(col("lw") * col("n")), 6).as("logw"))
    // Gumbel(0,1) from the id's replayable hash: u in (0,1), g=-ln(-ln u)
    val u = (pmod(graft.functions.XHash.h60(col("id").cast("string")),
      lit(1000000L)).cast("double") + 0.5) / 1000000.0
    val keyed = docw.select(col("id").as(idCol), col("logw"),
      round(col("logw") - log(-log(u)), 6).as("gkey"))
    val step = 0.001
    val cut = graft.plans.Quantiles.histQuantileBuckets(
      keyed, col("gkey"), step, Seq("cut" -> keepQuantile))
    keyed.crossJoin(broadcast(cut))
      .select(col(idCol), col("logw"),
        (graft.plans.Quantiles.bucket(col("gkey"), step) > col("cut"))
          .as("selected"))
  }

  /**
   * PageRank over the source co-duplication graph — the CommonCrawl
   * "domain rank" signal pipelines weight quality by: sources are
   * nodes, an edge's weight is the number of distinct word n-grams the
   * two sources share, and `iters` damped power iterations spread rank
   * mass along content-sharing links. Dangling sources (no shared
   * content) donate their mass uniformly, the standard formulation, so
   * total rank stays 1.
   *
   * Scale shape: the edge build routes through [[Dedup.bucketPairs]]
   * with a document-frequency cap — a shingle shared by more than
   * `maxSources` distinct sources is boilerplate (near-zero
   * discriminative weight for co-duplication, the same argument
   * corpus_boilerplate makes for hot lines) and is dropped BEFORE pair
   * generation. Without the cap a shingle shared by K sources emits
   * K² pair rows inside ONE join key (one task): quadratic work and a
   * parallelism ceiling at web scale. With it, every surviving bucket
   * is ≤ maxSources, so the in-bucket expansion is memory-bounded and
   * per-key work is O(maxSources²) constant. The oracle replays the
   * identical cap in its edge CTE.
   * Each iteration is one edge-bounded join+groupBy message pass plus
   * a single-row dangling aggregate crossed in as a broadcast — no
   * driver-side rank state, no corpus-sized shuffle after the edge
   * build; states are localCheckpointed so iteration i+1 replays
   * nothing. Node count is the one driver scalar (like the derived ANN
   * geometry). The oracle unrolls all iterations relationally.
   */
  def sourceRank(docs: DataFrame, n: Int = 5, iters: Int = 5,
      damping: Double = 0.85, srcCol: String = "source",
      textCol: String = "text", maxSources: Int = 64): DataFrame = {
    val sh = docs.select(col(srcCol).as("v"),
      explode(Dedup.shingles(col(textCol), n)).as("s")).distinct()
    // bucketPairs with maxBucket = the DF cap: buckets (shingles) shared
    // by > maxSources sources are skipped, the rest expand in-bucket to
    // ordered (a < b) source pairs — bounded per key, no K² hot task.
    // checkpointed before the symmetric union references it twice —
    // otherwise the whole bucketPairs+groupBy subtree is computed once
    // per union arm unless AQE exchange reuse happens to fire
    val half = Dedup.bucketPairs(
        sh.select(col("s"), col("v").as("item")), Seq("s"),
        heavy = Dedup.HeavyBucket, maxBucket = Some(maxSources))
      .groupBy(col("a").as("src"), col("b").as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
      .lineageCut
    // the co-duplication graph is symmetric: mirror the ordered half
    val edges = half
      .union(half.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      .lineageCut
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
      .lineageCut
    val nodes = docs.select(col(srcCol).as("v")).distinct().lineageCut
    // the DANGLING node set is static across iterations (it depends
    // only on the edge table) — hoisted out of the loop (r19, guide
    // §2.4: the per-iteration pr-vs-outw anti-join re-derived it every
    // round). Source-cardinality rows, one cut.
    val dangNodes = nodes.join(outw.select(col("src").as("v")),
      Seq("v"), "left_anti").lineageCut
    val nN = nodes.count().toDouble
    var pr = nodes.withColumn("p", lit(1.0) / lit(nN))
    for (_ <- 0 until iters) {
      // ordered fold, not sum(): FP addition is order-sensitive in the
      // last ULP and partial-agg order is nondeterministic — on a
      // hostile corpus the drift scrambles the gate's row sort
      // (FuzzCorpus). Fold src-ascending, exactly like the oracle;
      // fan-in is ≤ |sources| (the graph is source-grained), so the
      // collected list is vocabulary-bounded, never corpus-sized.
      val msgs = edges
        .join(outw, Seq("src"))
        .join(pr.select(col("v").as("src"), col("p")), Seq("src"))
        .select(col("dst"),
          struct(col("src"), (col("p") * col("w") / col("ow")).as("t"))
            .as("st"))
        .groupBy(col("dst").as("v"))
        .agg(aggregate(array_sort(collect_list(col("st"))), lit(0.0),
          (a, x) => a + x.getField("t")).as("m"))
      val dang = pr
        .join(dangNodes, Seq("v"), "left_semi")
        .select(struct(col("v"), col("p")).as("st"))
        .agg(coalesce(aggregate(array_sort(collect_list(col("st"))),
          lit(0.0), (a, x) => a + x.getField("p")), lit(0.0)).as("dm"))
      // localCheckpoint, not lazy persist: each pr is referenced twice
      // by the next state (messages + dangling) — eager checkpointing
      // cuts that to one computation AND keeps each iteration a flat
      // plan. (A lazy persist() chain was measured 1.6x SLOWER here:
      // nested InMemoryRelations under AQE replan the whole chain at
      // the final action.)
      pr = nodes.crossJoin(broadcast(dang))
        .join(msgs, Seq("v"), "left_outer")
        .select(col("v"),
          ((lit(1.0) - lit(damping)) / lit(nN) + lit(damping) *
            (coalesce(col("m"), lit(0.0)) + col("dm") / lit(nN))).as("p"))
        .lineageCut
    }
    pr.select(col("v").as(srcCol), col("p").as("pr"))
  }

  /**
   * The CLOSED-LOOP curation pipeline — every stage of a pretraining
   * data build, composed end to end into one plan:
   *
   *   clean (quality floor → exact dedup → near-dup removal)
   *   → chunk-level dedup (docs REWRITTEN to their surviving chunks)
   *   → SemDeDup over the survivors' embeddings (geometry derived from
   *     the survivor population; docs without an embedding pass through
   *     — an un-embedded doc can't be semantically deduplicated)
   *   → decontamination against the eval split (docs ≡ 0 mod `evalMod`,
   *     which are themselves excluded from the training corpus)
   *   → model-based quality filter (keep = exact integer numerator ≥ 0)
   *   → token-budget fill (half the surviving tokens, greedy from the
   *     top at centi-logit bucket granularity)
   *   → sequence packing → per-shard MANIFEST (the gate output: any
   *     drifted doc upstream changes a count or checksum here).
   *
   * Each stage is individually oracle-gated; this proves the CONTRACTS
   * COMPOSE — rewritten text flows into shingling/quality/packing, the
   * semantic stage's derived geometry follows the survivor count, and
   * the budget is a function of what survived, not of the raw corpus.
   *
   * Scale shape: inherits each stage's (clean's banded near-dup join,
   * chunk dedup's struct-min election, SemDeDup's bounded in-cell
   * pairs, decontamination's broadcast eval shingles, the budget's
   * ≤201-bucket window); the only new plumbing is id semi/anti joins
   * between stages. Survivor states are localCheckpointed where more
   * than one downstream stage reads them.
   */
  def pipeline(docs: DataFrame, embs: DataFrame, evalMod: Int = 97,
      seqLen: Int = 256, shards: Int = 8,
      /** Some(floor) prepends stage 0: the per-domain BLOCKLIST (row
        * 91's url_domain_filter decision — drop every doc of a
        * registered domain whose aggregate quality numerator sits
        * below floor·tokens, exact integers). First because it is the
        * cheapest signal: one quality pass + one 23-key rollup prunes
        * whole domains before any dedup join sees them. */
      domainFloorMilli: Option[Long] = None,
      /** Non-empty prepends nothing but REPLACES the pack tail with
        * per-source quota admission (row 92) over the curated,
        * REWRITTEN text — the mixture contract applied to what
        * actually packs — and the manifest gains the (shard, source)
        * grain. */
      quotas: Seq[(String, Long)] = Nil,
      /** true prepends the TRUE stage 0 (SURVEY row 100): the corpus
        * arrives as synthesized HTML pages and Html.extractText strips
        * the markup back to text before any curation signal runs. The
        * extraction round-trips byte-identically (the row-100 gate),
        * so the composed oracle is UNCHANGED — which IS the invariance
        * pin: a markup-only change is invisible downstream, and any
        * extraction defect moves every stage's manifest checksum.
        * The extracted text is localCheckpointed — the in-plan twin of
        * the WET artifact a crawl pipeline materializes — because
        * three consumers read it (the domain-quality rollup, clean,
        * and the eval split). */
      fromHtml: Boolean = false,
      /** Stage D's ACTION on contamination (SURVEY row 108): `doc`
        * drops every contaminated document whole (row 38); `chunk`
        * EXCISES the contaminated chunks and keeps the rest of the
        * document (row 105's surgical decision — the flagged-doc set
        * is provably identical, so this strictly GROWS the surviving
        * token mass on any corpus where contamination is partial;
        * CorpusSpec measures the strict gain). Downstream stages
        * (quality, budget, pack) read the REWRITTEN text either way —
        * the composition is the point. */
      decontam: String = "doc",
      /** Non-empty applies LANGUAGE quota admission (SURVEY row 116)
        * at the pack tail, keyed on the PREDICTED langid bucket of the
        * curated, rewritten text — before the per-source quota if both
        * are set (language is the outer mixture contract; source
        * shares are balanced within what the language budget admits).
        * Same ordered-prefix quotaAdmit machinery; -1/unlisted =
        * uncapped. */
      langQuotas: Seq[(String, Long)] = Nil,
      /** Row-117 epoch seed: Some(N) shuffles the pack tail's layout
        * globally and replayably (shard assignment + within-shard
        * order follow h60(seed:doc_id)); None keeps the
        * id-deterministic layout. Orthogonal to admission — the seed
        * permutes WHAT was admitted, it never changes it. */
      shuffleSeed: Option[Long] = None): DataFrame = {
    require(decontam == "doc" || decontam == "chunk",
      s"pipeline: decontam must be 'doc' or 'chunk', got \"$decontam\"")
    import org.apache.spark.sql.expressions.Window
    val docsIn = if (!fromHtml) docs else docs
      .withColumn("text", graft.text.Html.extractText(
        graft.text.Html.synthHtml(col("doc_id"), col("text"))))
      .lineageCut
    // stage 0 (optional): domain blocklist over the raw corpus —
    // materialized when it ran (r19, guide §2.4): clean's quality
    // filter and exact-dedup join both read docs0, and without the cut
    // each read re-derives the blocklist's quality pass + domain
    // rollup + two joins
    val docs0 = domainFloorMilli.fold(docsIn)(f =>
      domainFilter(docsIn, f).lineageCut)
    val st = pipelineStages(docs0, docsIn, embs, evalMod, decontam)
    val sd = st.sd
    val sel = st.sel
    // G: pack the selected docs, publish the per-shard manifest —
    // with quotas, per-source admission first and the (shard, source)
    // manifest grain (the corpus_pack_quota shape over curated text).
    // Language quotas (row 116) gate FIRST when set: the langid bucket
    // of the curated text caps each language's token mass, and the
    // source quota then balances within the admitted pool.
    val (selected, admitted) =
      packTailAdmit(sd.join(sel, Seq("doc_id"), "left_semi"), docsIn,
        quotas, langQuotas)
    if (quotas.nonEmpty) {
      val adm = admitted.lineageCut
      packMembers(adm, seqLen = seqLen, shards = shards,
          shuffleSeed = shuffleSeed)
        .join(adm.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("shard"), col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_toks"),
          sum(when(col("chunk_first") =!= col("chunk_last"), 1L)
            .otherwise(0L)).as("straddlers"),
          sum(col("doc_id") % lit(1000003L) *
            (graft.functions.XHash.h60(col("doc_id").cast("string"))
              % lit(1000000L)) % lit(1000003L)).as("checksum"))
    } else {
      val packed = packChunks(selected,
        seqLen = seqLen, shards = shards, shuffleSeed = shuffleSeed)
      packed.groupBy(col("shard")).agg(
        count(lit(1)).as("n_docs"),
        (max(col("chunk_last")) + 1).as("n_seqs"),
        sum(when(col("chunk_first") =!= col("chunk_last"), 1L)
          .otherwise(0L)).as("straddlers"),
        sum(col("doc_id") % lit(1000003L) *
          (graft.functions.XHash.h60(col("doc_id").cast("string"))
            % lit(1000000L)) % lit(1000003L)).as("checksum"))
    }
  }

  /** The pack-tail admission shared by [[pipeline]]'s stage G and
    * [[pipelineLedger]] — ONE implementation, so the ledger's
    * `lang_quota`/`source_quota` dispositions can never diverge from
    * what the manifest packed. Language quota gates FIRST when set
    * (the outer mixture contract: the langid bucket of the curated
    * text caps each language's token mass), then the source quota
    * balances within the admitted pool. Returns (lang-admitted,
    * source-admitted-with-source-column); each leg is the identity
    * when its quota list is empty. */
  private def packTailAdmit(base: DataFrame, docsIn: DataFrame,
      quotas: Seq[(String, Long)], langQuotas: Seq[(String, Long)])
      : (DataFrame, DataFrame) = {
    val lq =
      if (langQuotas.isEmpty) base
      else quotaAdmit(base.withColumn("__lang",
          Text.langId(col("text"))), langQuotas, srcCol = "__lang")
        .drop("__lang")
    val sq =
      if (quotas.isEmpty) lq
      else quotaAdmit(lq.join(
        docsIn.select(col("doc_id"), col("source")), Seq("doc_id")),
        quotas)
    (lq, sq)
  }

  /** Every survivor frame of [[pipeline]]'s admission chain, in stage
    * order — the single source of truth shared by the manifest tail and
    * the row-120 disposition ledger. `q`→`sel` are strictly nested
    * id-populations; `sb`/`sd` carry the REWRITTEN text their stage
    * produced. */
  private[graft] final case class PipelineStages(
      q: DataFrame, kept: DataFrame, sa: DataFrame, sb: DataFrame,
      sc: DataFrame, cs: DataFrame, sd: DataFrame, m: DataFrame,
      sel: DataFrame)

  /** The row-91 domain blocklist (pipeline stage 0): keep the docs of
    * registered domains whose aggregate quality numerator clears
    * floor·tokens — factored out so [[pipeline]] and
    * [[pipelineLedger]] apply the identical decision. */
  private def domainFilter(docsIn: DataFrame, floor: Long): DataFrame = {
    val host = parse_url(
      graft.text.Urls.synthUrl(col("doc_id")), lit("HOST"))
    val dd = docsIn.select(col("doc_id"),
      graft.text.Urls.registeredDomain(host).as("domain"))
    val keepDoms = dd.join(Text.qualityModelRaw(docsIn), Seq("doc_id"))
      .groupBy(col("domain"))
      .agg(sum(col("num")).as("dn"), sum(col("n_tokens")).as("dt"))
      .where(col("dn") - lit(floor) * col("dt") >= 0L)
      .select(col("domain"))
    docsIn.join(dd.join(keepDoms, Seq("domain"), "left_semi")
      .select(col("doc_id")), Seq("doc_id"), "left_semi")
  }

  /** Stages A-F of [[pipeline]] over an already-domain-filtered corpus
    * (`docs0`); `docsIn` supplies the eval split (pre-blocklist, the
    * benchmark is immutable). Extracted so [[pipelineLedger]] reads the
    * SAME chain the manifest packs — not a parallel reimplementation. */
  private[graft] def pipelineStages(docs0: DataFrame, docsIn: DataFrame,
      embs: DataFrame, evalMod: Int, decontam: String): PipelineStages = {
    import org.apache.spark.sql.expressions.Window
    // A: document-level clean on the original text — sub-stages exposed
    // (quality floor, exact dedup, near-dup election)
    val cst = cleanStages(docs0)
    val q = cst.q.select(col("doc_id"), col("text"))
    val kept = cst.exactKept.select(col("doc_id"), col("text"))
    // cut: chunkDedup's election+join read sa twice and the ledger
    // unions it a third time — each read re-ran the near-dup verify
    // joins over the checkpointed shingle frames (r19, guide §2.4)
    val sa = cst.exactKept.join(cst.losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"))
      .lineageCut
    // B: chunk dedup rewrites each survivor to its kept chunks
    val sb = Dedup.chunkDedup(sa)
      .where(col("kept_chunks") > 0)
      .select(col("doc_id"), col("kept_text").as("text"))
      .lineageCut
    // C: SemDeDup on the survivor embeddings, geometry from the subset
    // survivor embeddings, materialized ONCE: the geometry count, the
    // centroid sample, the cell assignment, and the survivor-id read
    // each evaluate this frame (4 embeddings scans + semi-joins without
    // the cut — r19, guide §2.4)
    val sbEmb = embs.join(sb.select(col("doc_id").as("vec_id")),
      Seq("vec_id"), "left_semi").lineageCut
    val nVec = sbEmb.count()
    val nl = graft.ann.Ann.nlistFor(nVec)
    val semKeep = graft.ann.Ann.semanticDedup(sbEmb,
        minCos = graft.ann.Ann.SemDedupMinCos,
        nlist = nl, modulus = Some(math.max(1L, nVec / nl)))
      .select(col("vec_id").as("doc_id"))
    // cut: the decontam arms read cs (a trivial filter of sc) twice —
    // chunkDecontam shingles AND chunk-hashes the same frame — and the
    // ledger unions sc and cs; without the cut each read re-ran the
    // union's anti/semi joins (r19, guide §2.4)
    val sc = sb.join(embs.select(col("vec_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .unionByName(sb.join(semKeep, Seq("doc_id"), "left_semi"))
      .lineageCut
    // D: decontamination — eval docs out of the corpus, then either
    // the whole-doc drop (row 38) or the surgical chunk excision
    // (row 105) on what remains
    val evalDocs = docsIn.where(col("doc_id") % evalMod === 0)
    val cs = sc.where(col("doc_id") % evalMod =!= 0)
    val sd = (decontam match {
      case "doc" => cs.join(Dedup.contaminatedIds(cs, evalDocs),
        Seq("doc_id"), "left_anti")
      case _ => Dedup.chunkDecontam(cs, evalDocs)
        .where(col("kept_chunks") > 0)
        .select(col("doc_id"), col("kept_text").as("text"))
    }).lineageCut
    // E: quality-model keep (integer numerator sign) at chunk-rewritten
    // text, with the centi-logit bucket for the budget stage
    val m = Text.qualityModelRaw(sd).where(col("num") >= 0L)
      .select(col("doc_id"), col("n_tokens"),
        expr("(num + 1000 * n_tokens) * 100 div (1000 * n_tokens)").as("kc"))
      .lineageCut
    // F: budget fill — half the kept tokens, whole buckets from the top.
    // The budget scalar rides the SAME ≤201-row histogram frame as the
    // cumulative sum (the buckets' total == sum over m, exact integers),
    // instead of a separate corpus-wide aggregate + crossJoin broadcast
    // (r19, guide §2.4: one fewer corpus pass, two fewer jobs per
    // pipeline run; both windows are partitionless over the bounded
    // bucket frame). Each m row has exactly one kc bucket, so the
    // inner-join+filter it replaces is the same id set as this semi
    // join against the admitted buckets.
    val hist = m.groupBy(col("kc")).agg(sum(col("n_tokens")).as("bt"))
    val cum = hist.select(col("kc"),
      sum(col("bt")).over(Window.orderBy(col("kc").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum"),
      sum(col("bt")).over(Window.partitionBy()
        .rowsBetween(Long.MinValue, Long.MaxValue)).as("tot"))
    val sel = m.join(broadcast(
        cum.where(col("cum") <= expr("tot div 2")).select(col("kc"))),
      Seq("kc"), "left_semi")
      .select(col("doc_id"))
    PipelineStages(q, kept, sa, sb, sc, cs, sd, m, sel)
  }

  /** Stage names in chain order: reaching level i but not i+1 means the
    * doc exited at `LedgerStageNames(i)`; surviving all of them is
    * `packed`. Shared with the ledger oracle via the same literals. */
  private[graft] val LedgerStageNames: Seq[String] = Seq(
    "quality", "exact_dup", "near_dup", "chunks_dup", "semantic_dup",
    "eval_split", "contaminated", "model_quality", "budget")

  /**
   * The per-doc DISPOSITION LEDGER (SURVEY row 120) — the audit
   * artifact a production curation pipeline publishes next to its
   * manifest: for EVERY input document, the stage that removed it, or
   * `packed`. Without it, "why did doc X disappear?" needs a rerun of
   * the whole chain with instrumentation; with it, curation is
   * debuggable (and the per-reason drop counts are the pipeline's
   * health dashboard).
   *
   * Shape: the stage frames are the SAME nested survivor populations
   * the manifest tail packs ([[pipelineStages]]), union-tagged with
   * their stage level and max-aggregated per doc — ONE shuffle over
   * id-only rows regardless of stage count, no per-stage join chain.
   * The disposition is the name of the first stage the doc failed to
   * reach. Eval-split docs flow through dedup like any doc (the
   * benchmark must dedup against the corpus) and exit at stage D —
   * `eval_split` is an exit, not a defect.
   */
  def pipelineLedger(docs: DataFrame, embs: DataFrame,
      evalMod: Int = 97, decontam: String = "doc",
      /** The same optional stages [[pipeline]] takes — a profile's
        * ledger must account for EVERY decision its manifest made:
        * domainFloorMilli prepends a `domain` disposition, langQuotas/
        * quotas append `lang_quota`/`source_quota` tail dispositions
        * mirroring the pack-tail admission exactly. */
      domainFloorMilli: Option[Long] = None,
      quotas: Seq[(String, Long)] = Nil,
      langQuotas: Seq[(String, Long)] = Nil,
      fromHtml: Boolean = false): DataFrame = {
    require(decontam == "doc" || decontam == "chunk",
      s"pipelineLedger: decontam must be 'doc' or 'chunk', got \"$decontam\"")
    val docsIn = if (!fromHtml) docs else docs
      .withColumn("text", graft.text.Html.extractText(
        graft.text.Html.synthHtml(col("doc_id"), col("text"))))
      .lineageCut
    // cut when the blocklist ran — same reasoning as [[pipeline]]'s
    // stage 0 (the ledger additionally unions docs0 as the 'domain'
    // disposition level, a third read)
    val docs0 = domainFloorMilli.fold(docsIn)(f =>
      domainFilter(docsIn, f).lineageCut)
    val st = pipelineStages(docs0, docsIn, embs, evalMod, decontam)
    // the pack-tail admissions: the SAME helper pipeline's stage G
    // packs with — the ledger cannot drift from the manifest
    val (lq, sq) = packTailAdmit(
      st.sd.join(st.sel, Seq("doc_id"), "left_semi"), docsIn,
      quotas, langQuotas)
    val chain: Seq[(String, DataFrame)] =
      domainFloorMilli.map(_ => "domain" -> docs0).toSeq ++
      (LedgerStageNames zip Seq(st.q, st.kept, st.sa, st.sb, st.sc,
        st.cs, st.sd, st.m, st.sel)) ++
      (if (langQuotas.nonEmpty) Seq("lang_quota" -> lq) else Nil) ++
      (if (quotas.nonEmpty) Seq("source_quota" -> sq) else Nil)
    val lvl = chain.zipWithIndex.map { case ((_, s), i) =>
      s.select(col("doc_id"), lit(i + 1).as("l"))
    }.foldLeft(docsIn.select(col("doc_id"), lit(0).as("l")))(_ unionByName _)
    val disposition = chain.map(_._1).zipWithIndex
      .foldRight(lit("packed")) { case ((name, i), rest) =>
        when(col("l") === i, name).otherwise(rest)
      }
    lvl.groupBy(col("doc_id")).agg(max(col("l")).as("l"))
      .select(col("doc_id"), disposition.as("disposition"))
  }
}

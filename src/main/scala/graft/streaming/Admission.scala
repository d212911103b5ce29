package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.XHash
import graft.text.Text
import graft.plans.Lineage.LineageOps

/**
 * The incremental admission pipeline run as a STREAM — crawl N+1
 * admitted as it arrives (SURVEY §2 row 88's incremental twin, the
 * production shape: `dragnet build -u` absorbing a live crawl). The
 * composition follows the stream_corpus_filter discipline end to end:
 *
 *  - [[probeRows]] is a pure PER-ROW expansion (no shuffle, no state):
 *    each arriving document emits its content-fingerprint probe, its 8
 *    MinHash band-bucket probes, and one probe per token chunk — every
 *    key the two persisted store artifacts can answer.
 *  - ONE stream-static left-outer join against [[storeKeys]] (the
 *    signature store's fp + band keys unioned with the chunk store's
 *    pairs, tagged by key kind) marks the hits. Stateless: no state
 *    store at all, so the streaming leg scales to any crawl size and
 *    any micro-batch carve-up, and the drained row set is independent
 *    of arrival order BY CONSTRUCTION (it is a per-row map + join).
 *  - [[admit]] is the batch tail over the DRAINED probe rows: the
 *    crawl-WIDE elections (lowest-id per duplicated fingerprint,
 *    within-crawl LSH candidate drops, chunk first-occurrence-wins +
 *    reassembly) — decisions that by definition need the whole crawl —
 *    then decontamination and the quality keep on the REWRITTEN text
 *    (shingles span surviving-chunk boundaries, so decontam cannot run
 *    before reassembly). Nothing in the tail re-reads the crawl text:
 *    it consumes only what the stream already carried.
 *
 * Equality with the batch twin (corpus_pipeline_incremental) is exact:
 * the per-row MinHash ([[rowSignature]]) is min over the same shingle
 * multiset the shuffle formulation aggregates, and the per-row chunker
 * mirrors Dedup.chunkHashRows chunk for chunk — both pinned by
 * StreamingSpec's multi-batch equality test and by sharing the batch
 * twin's DuckDB oracle.
 */
object Admission {

  // the batch family's derived S-curve geometry (Dedup.scala's declared
  // detection-floor/noise-ceiling contract) — shared, never re-declared
  private val Bands = Dedup.Bands
  private val RowsPerBand = Dedup.RowsPerBand
  private val K = Bands * RowsPerBand


  /** The three probe families of one arriving document, as ONE array
    * of homogeneous structs (kind, k1, k2, idx, chunk, sig):
    * kind 0 = content fingerprint (carries the signature for the
    * tail's crawl-wide elections), kind 1 = the 8 LSH band buckets,
    * kind 2 = one row per token chunk (carries idx + text for
    * reassembly). All string keys so the three key spaces share one
    * join. */
  /** `kinds` selects which probe families to emit (default all three).
    * A consumer that only chunk-dedups must not pay the MinHash: the
    * signature is computed only when a kind-0/1 row asks for it —
    * Catalyst cannot prune it away itself, because the kind filter
    * sits above the explode of the concatenated arrays. */
  def probeRows(newDocs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", width: Int = Dedup.ChunkWidth,
      cdc: Boolean = false, kinds: Set[Int] = Set(0, 1, 2)): DataFrame = {
    // the signature lands in its OWN column: it is referenced 17 times
    // downstream (fp row + 16 band-key lookups), and it must be a
    // NATIVE expression — the HOF array_min(transform(member))
    // formulation re-evaluates the md5 pipeline per (member, shingle)
    // pair in the lambda interpreter (measured 22 s for the sf0.1
    // crawl's probe expansion alone; graft.functions.MinHashSig
    // digests each shingle once, ~1 s). The SHINGLING is fused in too
    // (ShingleMinHashSig over the raw codegen'd token split): building
    // the shingle-string array through interpreted transform+concat_ws
    // lambdas costs ~1 ms/doc, 25× the whole digest kernel.
    val sig = if (kinds(0) || kinds(1)) rowSignature(col(textCol))
      else lit(null).cast("array<bigint>")
    val staged = newDocs.select(col(idCol).as("doc_id"),
      col(textCol).as("__text"), sig.as("__sig"))
    probeRowsStaged(staged, width, cdc, kinds)
  }

  /** One document's k-member MinHash signature as ONE native per-row
    * expression, shingling fused (tokens → n-gram windows → digests →
    * running minima all inside the kernel — no interpreted HOF). */
  private def rowSignature(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.ShingleMinHashSig(
        org.apache.spark.sql.graft.bridge.expression(
          Text.tokens(text)), Dedup.ShingleN, K))

  /** Just the LSH band-bucket probe rows of each document —
    * (doc_id, k1, k2) in [[probeRows]]'s kind-1 key space (pinned
    * expression-equal by StreamingSpec) — for admission gates that need
    * ONLY near-dup candidacy against a persisted band artifact (the
    * eval-split guard), without paying the fingerprint/chunk arms. */
  def bandProbes(newDocs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sig = rowSignature(col(textCol))
    // explode the band INDEX, not an array built from the signature:
    // Generate is a projection-collapse barrier, so __sig is computed
    // ONCE per document below it instead of being substituted into all
    // 16 element_at references (measured 7 s -> ~1 s on the sf0.1
    // corpus — the signature digests every shingle, so re-evaluating
    // it per band key multiplies the whole MinHash cost by 16)
    newDocs.select(col(idCol).as("doc_id"), sig.as("__sig"))
      .select(col("doc_id"), col("__sig"),
        explode(sequence(lit(0), lit(Bands - 1))).as("__b"))
      .select(col("doc_id"),
        col("__b").cast("string").as("k1"),
        concat_ws(",",
          element_at(col("__sig"), col("__b") * RowsPerBand + 1)
            .cast("string"),
          element_at(col("__sig"), col("__b") * RowsPerBand + 2)
            .cast("string")).as("k2"))
  }

  /** `cdc = true` swaps the kind-2 chunk probes from fixed
    * [[Dedup.ChunkWidth]] windows to content-defined boundaries
    * ([[Dedup.cdcChunksArr]]) — same probe-row shape, same one
    * stream-static join, so a crawl whose boilerplate arrives at
    * arbitrary offsets (the case fixed windows lose) dedups through
    * the SAME stateless admission plan. Still a pure per-row
    * expansion: the chunk array is one projection over the token
    * split, no shuffle, no state. */
  private def probeRowsStaged(staged: DataFrame, width: Int,
      cdc: Boolean = false, kinds: Set[Int] = Set(0, 1, 2)): DataFrame = {
    val textCol = "__text"
    val sig = col("__sig")
    val fpRow = array(struct(
      lit(0).as("kind"),
      Dedup.contentKey(col(textCol)).cast("string").as("k1"),
      lit("0").as("k2"),
      lit(-1).as("idx"),
      lit(null).cast("string").as("chunk"),
      sig.as("sig")))
    // a zero-token doc has a NULL signature (no shingles) -> NO band
    // rows; slice(x, 1, 0) is the correctly-typed empty array
    val bandRows0 = transform(sequence(lit(0), lit(Bands - 1)), b =>
      struct(
        lit(1).as("kind"),
        b.cast("string").as("k1"),
        concat_ws(",",
          element_at(sig, b * RowsPerBand + 1).cast("string"),
          element_at(sig, b * RowsPerBand + 2).cast("string")).as("k2"),
        lit(-1).as("idx"),
        lit(null).cast("string").as("chunk"),
        lit(null).cast("array<bigint>").as("sig")))
    val bandRows =
      when(sig.isNotNull, bandRows0).otherwise(slice(bandRows0, 1, 0))
    val ts = Text.tokens(col(textCol))
    // cdc: the md5 cut array MUST stage as its own projection
    // attribute before the assembly lambda references it — embedded
    // inline it re-evaluates per output chunk (see Dedup.cdcCuts).
    // Still a pure per-row expansion: two extra stateless projections,
    // no shuffle, no state.
    // the CDC boundary rule is the STORE's rule, not the probe's knob:
    // cuts must use Dedup.CdcAvgWidth (what cdcChunkStore hashed with),
    // never the fixed-chunk `width` parameter — a diverging modulus
    // would make every probe key miss the persisted store and silently
    // re-admit all stored boilerplate as new.
    val stagedIn =
      if (cdc) staged.withColumn("__cdcts", ts)
        .withColumn("__cdccuts",
          Dedup.cdcCuts(col("__cdcts"), Dedup.CdcAvgWidth))
      else staged
    val chunkRows =
      if (cdc)
        transform(
          Dedup.cdcChunksFromCuts(col("__cdcts"), col("__cdccuts")),
          (chunk, idx) =>
          struct(
            lit(2).as("kind"),
            XHash.h60(chunk).cast("string").as("k1"),
            XHash.h56(chunk).cast("string").as("k2"),
            idx.cast("int").as("idx"),
            chunk.as("chunk"),
            lit(null).cast("array<bigint>").as("sig")))
      else transform(
        sequence(lit(0), floor((size(ts) - 1) / lit(width)).cast("int")),
        idx => {
          val chunk = concat_ws(" ", slice(ts, idx * width + 1, lit(width)))
          struct(
            lit(2).as("kind"),
            XHash.h60(chunk).cast("string").as("k1"),
            XHash.h56(chunk).cast("string").as("k2"),
            idx.as("idx"),
            chunk.as("chunk"),
            lit(null).cast("array<bigint>").as("sig"))
        })
    // zero-token docs chunk to NOTHING (the batch chunkers' contract;
    // the fixed arm's sequence(0, -1) would otherwise DESCEND and mint
    // phantom idx -1 rows — FuzzCorpus)
    val chunkRowsG =
      when(size(ts) > 0, chunkRows).otherwise(slice(chunkRows, 1, 0))
    val parts = Seq(0 -> fpRow, 1 -> bandRows, 2 -> chunkRowsG)
      .collect { case (k, a) if kinds(k) => a }
    require(parts.nonEmpty, "probeRows: kinds must select at least one family")
    stagedIn.select(col("doc_id"),
        explode(if (parts.size == 1) parts.head else concat(parts: _*)).as("p"))
      .select(col("doc_id"), col("p.kind").as("kind"),
        col("p.k1").as("k1"), col("p.k2").as("k2"),
        col("p.idx").as("idx"), col("p.chunk").as("chunk"),
        col("p.sig").as("sig"))
  }

  /** The STATIC side of the one stream-static join: every key the two
    * store artifacts hold, in the probe-row key space. */
  def storeKeys(sigStore: DataFrame, chunkStore: DataFrame): DataFrame = {
    val fpKeys = sigStore
      .select(lit(0).as("kind"), col("fp").cast("string").as("k1"),
        lit("0").as("k2"))
      .distinct()
    val bandKeys = Dedup.bandedKeys(sigStore, Bands, RowsPerBand)
      .select(lit(1).as("kind"), col("band").cast("string").as("k1"),
        col("bh").as("k2"))
      .distinct()
    val chunkKeys = chunkStore
      .select(lit(2).as("kind"), col("h1").cast("string").as("k1"),
        col("h2").cast("string").as("k2"))
    fpKeys.union(bandKeys).union(chunkKeys).withColumn("hit", lit(true))
  }

  /** The batch tail over the drained probe rows: crawl-wide elections
    * (the incrementalKeepers composition), chunk reassembly, then
    * decontamination + quality keep on the rewritten text — the exact
    * corpus_pipeline_incremental semantics, consuming ONLY drained
    * rows (old data saw the stores; new text rode the chunk rows). */
  def admit(drained: DataFrame, evalDocs: DataFrame): DataFrame = {
    val fpRows = drained.where(col("kind") === 0)
      .select(col("doc_id"), col("k1").as("fp"), col("sig"),
        col("hit").isNotNull.as("in_store"))
      .lineageCut
    // (a) lowest id of each within-crawl content group
    val exactKeep = fpRows.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("id")).select(col("id"))
    // (b) fingerprints absent from the store
    val crossExact = fpRows.where(!col("in_store"))
      .select(col("doc_id").as("id"))
    // (c) any band bucket shared with a stored signature
    val bandDrops = drained
      .where(col("kind") === 1 && col("hit").isNotNull)
      .select(col("doc_id").as("id")).distinct()
    // (d) higher id of each within-crawl LSH candidate pair
    val sigDf = fpRows.select(col("doc_id").as("id") +:
      (0 until K).map(i => element_at(col("sig"), i + 1).as(s"m$i")): _*)
    val nearDrops = Dedup.candidatesOfSignature(sigDf, Bands, RowsPerBand)
      .select(col("doc_b").as("id")).distinct()
    val keepers = exactKeep
      .join(crossExact, Seq("id"), "left_semi")
      .join(bandDrops, Seq("id"), "left_anti")
      .join(nearDrops, Seq("id"), "left_anti")
      .select(col("id").as("doc_id"))
    // chunk-store dedup of the stage-1 survivors + reassembly
    val crows = drained.where(col("kind") === 2)
      .join(keepers, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("idx"), col("chunk"),
        col("k1").as("h1"), col("k2").as("h2"),
        col("hit").isNotNull.as("in_store"))
    val winners = crows.groupBy(col("h1"), col("h2"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("w"))
    val b2 = Dedup.chunkReassemble(crows.join(winners, Seq("h1", "h2"))
        .withColumn("kept", !col("in_store") &&
          struct(col("doc_id"), col("idx")) === col("w")))
      .where(col("kept_chunks") > 0)
      .select(col("doc_id"), col("kept_text").as("text"))
      .lineageCut
    // decontamination vs the eval split, then the quality keep — on
    // the REWRITTEN text, as the batch twin
    val cs = b2.where(col("doc_id") % 97 =!= 0)
    val b3 = cs.join(Dedup.contaminatedIds(cs, evalDocs),
      Seq("doc_id"), "left_anti")
    Text.qualityModelRaw(b3).where(col("num") >= 0L)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
  }
}

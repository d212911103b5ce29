package graft

import graft.dedup.Corpus
import graft.dedup.Corpus.CleanConfig

/** The composed corpus-cleaning pipeline. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the house was on the hill and it was a good day for a walk in the park with friends"),
    (2L, "The house was  on the hill and it was a good day for a walk in the park with friends"), // exact dup of 1
    (3L, "the house was on the hill and it was a good night for a walk in the park with friends"), // near dup of 1
    (4L, "an entirely different document about spark catalyst plans and the shuffles they avoid today"),
    (5L, "!!!;;;...???")                                                // garbage
  ).toDF("doc_id", "text")

  test("clean: quality floor, exact dedup keeps lowest id, near-dups dropped") {
    val out = Corpus.clean(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 4L))
  }

  test("near-dup removal can be relaxed independently") {
    val out = Corpus.clean(docs, CleanConfig(nearDupJaccard = 1.01))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L, 4L)) // only exact dup + garbage removed
  }

  test("cluster keep-policy keeps one doc per component, incl. chains") {
    // 6 is a near-dup of 3 but not of 1: greedy drops {2,3,6};
    // clustering also resolves the whole chain 1~3~6 to keeper 1
    val chained = docs.union(Seq(
      (6L, "the house was on that hill and it was a good night for a walk in the park with friends")
    ).toDF("doc_id", "text"))
    val clustered = Corpus.clean(chained,
      CleanConfig(clusterDedup = true)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(clustered == Set(1L, 4L))
    // both policies agree here (every loser pairs directly with 1 or 3)
    val greedy = Corpus.clean(chained).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(greedy == clustered)
  }

  test("boilerplate lines strip everywhere, order and empties preserved") {
    val withBp = Seq(
      (1L, "COOKIE NOTICE\nreal content one\nfooter text"),
      (2L, "cookie notice\nreal content two\nfooter text"),
      (3L, "Cookie Notice\n\nreal content three\nfooter text"),
      (4L, "unrelated document without any shared lines")
    ).toDF("doc_id", "text")
    val out = Corpus.stripBoilerplate(withBp, minDocs = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    // "cookie notice" (normalized) and "footer text" hit 3 docs → gone;
    // case differences collapse; doc 3's empty line survives
    assert(out(1L) == "real content one")
    assert(out(2L) == "real content two")
    assert(out(3L) == "\nreal content three")
    assert(out(4L) == "unrelated document without any shared lines")
    // a doc that is pure boilerplate rewrites to ""
    val pure = withBp.union(Seq((5L, "footer text")).toDF("doc_id", "text"))
    assert(Corpus.stripBoilerplate(pure, minDocs = 3)
      .where(org.apache.spark.sql.functions.col("doc_id") === 5L)
      .collect().head.getAs[String]("text") == "")
  }

  test("full pipeline: boilerplate + scrub stages compose into clean") {
    val messy = Seq(
      (1L, "SHARED FOOTER\nthe house was on the hill and it was a good day for a walk in the park with friends"),
      (2L, "SHARED FOOTER\nThe house was  on the hill and it was a good day for a walk in the park with friends"),
      (3L, "shared footer\ncontact me at bob@example.com for the real content about the hills and the walks we took"),
      (4L, "shared footer\nan entirely different document about spark catalyst plans and the shuffles they avoid today")
    ).toDF("doc_id", "text")
    val out = Corpus.clean(messy, CleanConfig(
      boilerplateMinDocs = Some(3), scrubPii = true))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    // footer stripped BEFORE dedup: docs 1/2 become exact dups -> keep 1
    assert(out.keySet == Set(1L, 3L, 4L))
    assert(!out.values.exists(_.toLowerCase.contains("shared footer")))
    assert(out(3L).contains("<EMAIL>") && !out(3L).contains("bob@"))
  }

  test("language filter composes") {
    // long, punctuation-free French: passes the quality floor on its own
    // (so the assertion below genuinely tests the langs branch)
    val fr = Seq.fill(8)(
      "le chat est dans la maison et il est la pour les amis du jour").mkString(" ")
    val mixed = docs.union(Seq((6L, fr)).toDF("doc_id", "text"))
    val without = Corpus.clean(mixed).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(without.contains(6L)) // survives when no language filter set
    val out = Corpus.clean(mixed, CleanConfig(langs = Some(Seq("en"))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!out.contains(6L) && out.contains(4L))
  }

  test("hash sampling is deterministic, rate-proportional, and nested") {
    val docs = graft.sources.Sources.table(spark, sf001, "documents")
    val n = docs.count()
    val half = Corpus.sampleByHash(docs, 0.5)
    val c1 = half.collect().map(_.getLong(0)).toSet
    val c2 = Corpus.sampleByHash(docs, 0.5).collect().map(_.getLong(0)).toSet
    assert(c1 == c2, "same rate must select the same rows")
    assert(math.abs(c1.size - n / 2.0) < n * 0.15, s"${c1.size} of $n at 0.5")
    // rates nest: a 0.25 sample is a subset of the 0.5 sample (the
    // incremental-pipeline property: lowering the rate never swaps docs)
    val quarter = Corpus.sampleByHash(docs, 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(quarter.subsetOf(c1))
    assert(Corpus.sampleByHash(docs, 1.0).count() == n)
    assert(Corpus.sampleByHash(docs, 0.0).count() == 0)
    // mixture: per-source rates apply independently, unlisted get default
    val mixed = Corpus.mixBySource(docs,
      Map("src0" -> 1.0, "src1" -> 0.0), default = 0.5)
    val bySrc = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val src0Total = docs.where(
      org.apache.spark.sql.functions.col("source") === "src0").count()
    assert(bySrc.get("src0").contains(src0Total))
    assert(!bySrc.contains("src1"))
  }

  test("packChunks: offsets accumulate in id order, chunks split at seqLen") {
    // one shard so the whole stream is a single hand-checkable sequence:
    // token counts 3,2,4,1 → offsets 0,3,5,9; seqLen=4 boundaries at 4,8
    val d = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j")
    ).toDF("doc_id", "text")
    val r = graft.dedup.Corpus.packChunks(d, seqLen = 4, shards = 1)
      .collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toSet
    assert(r == Set(
      (1L, 0L, 0L, 0L),  // tokens 0-2, inside chunk 0
      (2L, 3L, 0L, 1L),  // tokens 3-4, crosses the 4-boundary
      (3L, 5L, 1L, 2L),  // tokens 5-8, crosses the 8-boundary
      (4L, 9L, 2L, 2L)))
  }

  test("shardsFor: derived shard count scales with corpus, floored and capped") {
    import graft.dedup.Corpus.shardsFor
    // small corpora keep the 32-shard floor (local parity with the old
    // fixed default); big ones derive ~64k docs per shard
    assert(shardsFor(0L) == 32)
    assert(shardsFor(500L) == 32)
    assert(shardsFor(32L * 65536) == 32)
    assert(shardsFor(32L * 65536 + 1) == 33)
    assert(shardsFor(1000000000L) == 15259) // 1B docs → ~15k one-task sorts
    assert(shardsFor(Long.MaxValue / 2) == (1 << 20)) // hard cap
  }

  test("packChunks: derived default equals the explicit floor on small input") {
    val d = Seq((1L, "a b"), (2L, "c"), (3L, "d e f")).toDF("doc_id", "text")
    val derived = graft.dedup.Corpus.packChunks(d, seqLen = 4).collect().toSet
    val explicit = graft.dedup.Corpus.packChunks(d, seqLen = 4, shards = 32)
      .collect().toSet
    assert(derived == explicit)
  }

  test("deterministic on the documents table and strictly smaller") {
    val d = graft.sources.Sources.table(spark, sf001, "documents")
    val a = Corpus.clean(d).count()
    val b = Corpus.clean(d).count()
    assert(a == b && a > 0 && a < d.count())
  }

  test("resampleBySource: epochs above 1 repeat deterministically, 0 drops") {
    import org.apache.spark.sql.functions.col
    val d = ((1L to 40L).map(i => (i, s"doc $i", "up")) ++
      (41L to 60L).map(i => (i, s"doc $i", "gone")) ++
      (61L to 80L).map(i => (i, s"doc $i", "keep")))
      .toDF("doc_id", "text", "source")
    val out = Corpus.resampleBySource(d,
      Map("up" -> 2.5, "gone" -> 0.0, "keep" -> 1.0))
    val byDoc = out.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rate 0: no rows at all
    assert((41L to 60L).forall(i => !byDoc.contains(i)))
    // rate 1: exactly one copy each
    assert((61L to 80L).forall(i => byDoc(i) == 1L))
    // rate 2.5: every doc 2 or 3 copies; roughly half get the third
    val ups = (1L to 40L).map(byDoc)
    assert(ups.forall(c => c == 2L || c == 3L))
    assert(ups.count(_ == 3L) > 5 && ups.count(_ == 3L) < 35)
    // epoch indices are exactly 0..copies-1
    val epochs = out.where(col("doc_id") === ups.indexOf(3L) + 1L)
      .select("dn_epoch").collect().map(_.getLong(0)).toSet
    assert(epochs == (0L until byDoc(ups.indexOf(3L) + 1L)).toSet)
    // deterministic
    val again = Corpus.resampleBySource(d,
      Map("up" -> 2.5, "gone" -> 0.0, "keep" -> 1.0))
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == byDoc)
  }

  test("stratifiedSample caps each source at N, uniform-by-hash, deterministic") {
    import org.apache.spark.sql.functions.{col, count}
    val skewed = ((1L to 100L).map(i => (i, s"doc $i", "whale")) ++
      (101L to 103L).map(i => (i, s"doc $i", "minnow")))
      .toDF("doc_id", "text", "source")
    val capped = Corpus.stratifiedSample(skewed, per = 10)
    val bySrc = capped.groupBy("source").agg(count(col("*")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the cap binds on the whale; the minnow keeps everything it has
    assert(bySrc == Map("whale" -> 10L, "minnow" -> 3L))
    val again = Corpus.stratifiedSample(skewed, per = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == capped.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("stratifiedSample: thinning and its exactness fallback match the plain rank") {
    import org.apache.spark.sql.functions.col
    val skewed = ((1L to 200L).map(i => (i, s"doc $i", "whale")) ++
      (201L to 205L).map(i => (i, s"doc $i", "minnow")))
      .toDF("doc_id", "text", "source")
    // the reference semantics: plain rank over everything (huge safety
    // disables thinning so no row is ever cut)
    val plain = Corpus.stratifiedSample(skewed, per = 8, safety = 1e9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // normal thinning (whale 200 > 4×8 → threshold active)
    val thinned = Corpus.stratifiedSample(skewed, per = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(thinned == plain)
    // pathological safety: the threshold keeps ~2 of the whale's rows,
    // fewer than per — the guard must detect the shortfall and redo the
    // whale unthinned, still returning the exact plain-rank answer
    val fallback = Corpus.stratifiedSample(skewed, per = 8, safety = 0.01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fallback == plain)
  }

  test("dsirSelect: target-like docs outweigh off-target docs") {
    import org.apache.spark.sql.functions.col
    // target slice speaks "alpha beta"; raw background speaks "gamma
    // delta" — a raw doc written in the target's vocabulary must score
    // a strictly higher importance weight than the background docs
    val d = ((0L until 4L).map(i => (i, "alpha beta alpha beta", "tgt"))
      ++ (10L until 18L).map(i => (i, "gamma delta gamma delta", "web"))
      ++ Seq((20L, "alpha beta alpha beta", "web"))
      ).toDF("doc_id", "text", "source")
    val out = Corpus.dsirSelect(d, col("source") === "tgt", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 13)
    val onTarget = out(20L)
    for (i <- 10L until 18L)
      assert(onTarget > out(i),
        s"doc 20 ($onTarget) should outweigh off-target doc $i (${out(i)})")
    assert(out(20L) == out(0L), "identical text must get identical logw")
  }

  test("snapshotDiff routes every id: added/removed/changed/unchanged") {
    import org.apache.spark.sql.functions.col
    val old = Seq(
      (1L, "stays the same"),
      (2L, "will be  Edited"),
      (3L, "retires after this crawl")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "STAYS   the same"),      // normalization-equal -> unchanged
      (2L, "will be edited indeed"), // content moved -> changed
      (4L, "brand new page")         // -> added
    ).toDF("doc_id", "text")
    val got = Corpus.snapshotDiff(old, fresh)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("integrityReport counts holes and duplicates on both sides") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "a"), (2L, "b"), (2L, "b dup"), (3L, "c"))
      .toDF("doc_id", "text")
    val vecs = Seq((1L, Array(1f)), (3L, Array(2f)), (3L, Array(3f)),
      (9L, Array(4f))).toDF("vec_id", "embedding")
    val r = Corpus.integrityReport(docs, vecs).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)   // raw row counts
    assert(r.getLong(2) == 1)  // doc id 2 has no vector
    assert(r.getLong(3) == 1)  // vec id 9 has no doc
    assert(r.getLong(4) == 1 && r.getLong(5) == 1)  // one dup id each side
  }

  test("source rank: matches a driver-side power-iteration replay") {
    import org.apache.spark.sql.functions.col
    // graph: A—B (one shared 3-gram), B—C (one shared 3-gram), D dangling
    val docs = Seq(
      (1L, "srcA", "q w e"), (2L, "srcB", "q w e"), (3L, "srcB", "m m m"),
      (4L, "srcC", "m m m"), (5L, "srcD", "u u u")
    ).toDF("doc_id", "source", "text")
    val iters = 5; val d = 0.85
    val nodes = Seq("srcA", "srcB", "srcC", "srcD")
    val edges = Map( // src -> (dst, w)
      "srcA" -> Seq(("srcB", 1.0)),
      "srcB" -> Seq(("srcA", 1.0), ("srcC", 1.0)),
      "srcC" -> Seq(("srcB", 1.0)))
    val nN = nodes.size.toDouble
    var p = nodes.map(_ -> 1.0 / nN).toMap
    for (_ <- 0 until iters) {
      val msgs = nodes.map { v =>
        v -> edges.toSeq.flatMap { case (src, out) =>
          val ow = out.map(_._2).sum
          out.collect { case (dst, w) if dst == v => p(src) * w / ow }
        }.sum
      }.toMap
      val dm = nodes.filterNot(edges.contains).map(p).sum
      p = nodes.map(v =>
        v -> ((1.0 - d) / nN + d * (msgs(v) + dm / nN))).toMap
    }
    val got = Corpus.sourceRank(docs, n = 3, iters = iters, damping = d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach(v => assert(math.abs(got(v) - p(v)) < 1e-12,
      s"$v: ${got(v)} vs ${p(v)}"))
    // rank mass is conserved
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the hub outranks the dangling isolate
    assert(got("srcB") > got("srcD"))
  }

  test("source rank: DF cap drops a planted all-sources boilerplate " +
      "shingle (no K-squared edges from one hot key)") {
    import org.apache.spark.sql.functions.col
    // 6 sources all share one boilerplate 3-gram; with maxSources = 4
    // that shingle is dropped BEFORE pair generation, so the only edge
    // left is the genuine A—B pair.
    val boiler = (1 to 6).map(i => (i.toLong, s"src$i", "z z z"))
    val real = Seq((10L, "src1", "a b c"), (11L, "src2", "a b c"))
    val docs = (boiler ++ real).toDF("doc_id", "source", "text")
    val pr = Corpus.sourceRank(docs, n = 3, iters = 2, maxSources = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr.size == 6)
    // src1/src2 are linked (higher rank); src3..6 are all dangling and
    // identical — the boilerplate shingle contributed zero edges.
    assert(pr("src1") == pr("src2"))
    assert(Set("src3", "src4", "src5", "src6").map(pr).size == 1)
    assert(pr("src1") > pr("src3"))
    // and with the cap lifted the boilerplate DOES link everyone:
    // src3 gains rank from edges, proving the cap (not the data) is
    // what severed the hot key above.
    val uncapped = Corpus.sourceRank(docs, n = 3, iters = 2,
        maxSources = 1000)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(uncapped("src3") > pr("src3"))
  }

  // ---- corpus_pipeline: the composed closed-loop curation chain ----

  private val plWords = Seq("river", "garden", "window", "engine", "basket",
    "yellow", "winter", "market", "signal", "copper", "meadow", "lantern")

  /** Natural-ish sentences (stopwords keep them over the quality floor)
    * with seed-varied content words so lengths and vocab differ. */
  private def sentence(seed: Int): String = {
    val a = plWords(seed % plWords.size)
    val b = plWords((seed * 5 + 3) % plWords.size)
    val c = plWords((seed * 7 + 1) % plWords.size)
    s"the $a by the $b was quiet and we walked past the $c " +
      s"while it rained " + ("softly " * (seed % 4)) + "in town number" +
      s" item$seed"
  }

  /** A base corpus big enough that every pipeline stage has work:
    * varied docs plus the eval doc (id 97). */
  private def plBase: Seq[(Long, String)] =
    (1L to 40L).map(i => (i, sentence(i.toInt))) :+
      (97L, "held out benchmark question about the moon landing date")

  /** Mutually orthogonal one-hot embeddings: no accidental semantic
    * dups, so the pipeline's survivor set is controlled by the planted
    * text, not by lattice coincidences. */
  private def plEmb(ids: Seq[Long]) =
    ids.map(i => (i, Array.tabulate(48)(d =>
      if (d == (i % 48).toInt) 1f else 0f))).toDF("vec_id", "embedding")

  private def manifestOf(rows: Seq[(Long, String)],
      embIds: Seq[Long]): Seq[Seq[Any]] =
    Corpus.pipeline(rows.toDF("doc_id", "text"), plEmb(embIds))
      .orderBy("shard").collect().map(_.toSeq.toVector).toVector

  test("pipeline: adding an exact duplicate changes nothing downstream") {
    val base = plBase
    val dup = base :+ (41L, base.head._2) // same text, higher id, no emb
    val embIds = base.map(_._1).filter(i => i % 3 != 0 && i != 97L)
    val baseMan = manifestOf(base, embIds)
    assert(baseMan.nonEmpty, "fixture must survive to packing")
    assert(manifestOf(dup, embIds) == baseMan,
      "an exact dup must be invisible to the manifest")
  }

  test("pipeline: a contaminated doc drops; its benign twin is visible") {
    val base = plBase
    val embIds = base.map(_._1).filter(i => i % 3 != 0 && i != 97L)
    // 43 shares a 3-gram with the eval doc (id 97) → decontaminated out
    val contaminated = base :+
      (43L, "notes mention the moon landing date among many other things here")
    assert(manifestOf(contaminated, embIds) == manifestOf(base, embIds),
      "a contaminated doc must be invisible to the manifest")
    // the control: same id with benign text shifts the manifest (so the
    // equality above is the decontam stage, not incidental drop-out)
    val benign = base :+
      (43L, "notes mention entirely unrelated calendar trivia and nothing shared")
    assert(manifestOf(benign, embIds) != manifestOf(base, embIds),
      "the benign twin must reach packing (otherwise the test is vacuous)")
  }

  test("pipeline surgical: excision keeps the clean remainder; strictly more tokens pack (row 108)") {
    val base = plBase
    val embIds = base.map(_._1).filter(i => i % 3 != 0 && i != 97L)
    // a LONG doc quoting one eval 3-gram in its FIRST chunk: the
    // doc-drop action loses all of it, the surgical action loses only
    // that chunk (the tail words are hash-model-positive so the
    // remainder provably survives stage E — the quality model is a
    // salted hash, so fixture words are chosen by measurement)
    val quoting = base :+ (43L,
      "notes mention the moon landing date among many " +
        "river signal copper lantern garden warm happy blue " +
        "it was keep about in engine window walked")
    def manifest(dec: String, rows: Seq[(Long, String)]) =
      Corpus.pipeline(rows.toDF("doc_id", "text"), plEmb(embIds),
          decontam = dec)
        .orderBy("shard").collect().map(_.toSeq.toVector).toVector
    // doc mode: the quoting doc is invisible (row 38's decision)
    assert(manifest("doc", quoting) == manifest("doc", base))
    // chunk mode: its clean remainder reaches packing
    assert(manifest("chunk", quoting) != manifest("doc", quoting),
      "the excised doc's remainder must move the surgical manifest")
    // end to end on the gate corpus: the surgical manifest packs
    // strictly MORE tokens than the doc-drop manifest (quota tails
    // carry n_toks; measured 881 → 1766 at sf0.001)
    def packedToks(q: String): Long =
      Registry.queries(q)(spark, sf001)
        .agg(org.apache.spark.sql.functions.sum("n_toks"))
        .head.getLong(0)
    assert(packedToks("corpus_pipeline_surgical") >
      packedToks("corpus_pipeline_full"),
      "surgical decontam must strictly grow the packed token mass")
    // config error: an unknown action fails loudly
    val e = intercept[IllegalArgumentException](
      Corpus.pipeline(base.toDF("doc_id", "text"), plEmb(embIds),
        decontam = "both"))
    assert(e.getMessage.contains("decontam"))
  }

  test("incremental surgical admission (row 113): strictly more admitted tokens than doc-drop") {
    def admitted(q: String): (Long, Long) = {
      val r = Registry.queries(q)(spark, sf001)
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum("n_tokens"))
        .head
      (r.getLong(0), r.getLong(1))
    }
    val (dDocs, dToks) = admitted("corpus_pipeline_incremental")
    val (sDocs, sToks) = admitted("corpus_pipeline_incremental_surgical")
    // every doc-drop survivor survives excision too (it had no
    // contaminated chunk), and excised remainders ADD docs and tokens
    assert(sDocs >= dDocs, "excision must never admit fewer docs")
    assert(sToks > dToks,
      s"surgical admission must strictly grow tokens: $sToks vs $dToks")
  }

  test("packedSequences: windows are full, contiguous, and byte-faithful") {
    val docs = (1L to 12L)
      .map(i => (i, (1 to (3 + i % 5).toInt).map(k => s"d${i}w$k").mkString(" ")))
      .toDF("doc_id", "text")
    val seqLen = 4
    val members = Corpus.packMembers(docs, seqLen = seqLen, shards = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val seqs = Corpus.packedSequences(docs, seqLen = seqLen, shards = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2).toVector))
    // every window full except each shard's last; indices contiguous
    for ((shard, group) <- seqs.groupBy(_._1)) {
      val byIdx = group.sortBy(_._2)
      assert(byIdx.map(_._2).toSeq == byIdx.indices.map(_.toLong),
        s"shard $shard windows not contiguous")
      assert(byIdx.init.forall(_._3.size == seqLen),
        s"shard $shard has a short non-final window")
    }
    // per shard: concatenated windows == members' docs' tokens in id order
    val docToks = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toVector).toMap
    for ((shard, group) <- members.groupBy(_._2)) {
      val expect = group.sortBy(_._1).flatMap(m => docToks(m._1)).toVector
      val got = seqs.filter(_._1 == shard).sortBy(_._2).flatMap(_._3).toVector
      assert(got == expect, s"shard $shard token stream drifted")
    }
  }

  test("pipeline_full: a good doc on a BLOCKED domain is invisible; " +
      "with a non-binding floor it packs (vacuity control)") {
    // ids 20, 43, 66 share registered domain site20.* (i % 150 % 23 =
    // 20). Doc 20's text is PLANTED to pack for certain: stopwords
    // clear the heuristic floor, and every content token carries a
    // near-max quality-model weight (wi ≈ +950), so its centi-logit
    // bucket tops the fill order. 43/66 carry tokens at wi ≈ -1000,
    // dragging the DOMAIN aggregate to ~-75 milli/token — below the
    // -54 floor — while doc 20 stays individually keepable.
    val good = (20L, "the tok83 and tok59 it tok48 we tok142 by tok115 " +
      "was tok102 in tok51 and tok37 it tok105 we tok189")
    val base = plBase.filterNot(_._1 == 20L) :+ good
    val embIds = base.map(_._1).filter(i => i % 3 != 0 && i != 97L)
    val junk = Seq(
      (43L, "tok155 tok184 tok193 tok14 tok147 tok169 tok173 tok185 " +
        "tok198 tok45"),
      (66L, "tok155 tok184 tok193 tok14 tok147 tok169 tok173 tok185 " +
        "tok198 tok45 tok155 tok184"))
    def man(rows: Seq[(Long, String)], floor: Long): Seq[Seq[Any]] =
      Corpus.pipeline(rows.toDF("doc_id", "text"), plEmb(embIds),
        domainFloorMilli = Some(floor))
        .orderBy("shard").collect().map(_.toSeq.toVector).toVector
    // under the real floor, fixtures with and without doc 20 agree:
    // the blocked domain makes it invisible end to end
    val floor = graft.UrlQueries.DomainFloorMilli
    assert(man(base ++ junk, floor) ==
      man(base.filterNot(_._1 == 20L) ++ junk, floor),
      "a doc on a blocked domain must be invisible to the manifest")
    // control: a floor nothing fails → doc 20's presence moves the
    // manifest, so the equality above is the blocklist, not drop-out
    assert(man(base ++ junk, -1000000000L) !=
      man(base.filterNot(_._1 == 20L) ++ junk, -1000000000L),
      "doc 20 must reach packing under a non-binding floor")
  }

  test("pipeline_full: quota tail caps per-source tokens of the " +
      "CURATED text and the manifest carries the source grain") {
    val rows = (1L to 40L)
      .map(i => (i, sentence(i.toInt), if (i % 2 == 0) "even" else "odd")) :+
      ((97L, "held out benchmark question about the moon landing date",
        "odd"))
    val embIds = rows.map(_._1).filter(i => i % 3 != 0 && i != 97L)
    val out = Corpus.pipeline(
      rows.toDF("doc_id", "text", "source"), plEmb(embIds),
      domainFloorMilli = None, quotas = Seq("even" -> 40L))
      .collect()
    assert(out.map(_.getAs[String]("source")).toSet.contains("odd"))
    val evenToks = out.filter(_.getAs[String]("source") == "even")
      .map(_.getAs[Long]("n_toks")).sum
    assert(evenToks <= 40L, s"quota leaked: even packed $evenToks tokens")
    assert(evenToks > 0L, "quota vacuous: nothing of 'even' admitted")
  }

  test("pipeline: manifest shape — bounded shards, integral totals") {
    val base = plBase
    val out = manifestOf(base, base.map(_._1).filter(_ % 3 != 0))
    assert(out.nonEmpty && out.size <= 8)
    val nDocs = out.map(_(1).asInstanceOf[Long]).sum
    assert(nDocs >= 1 && nDocs <= base.size)
    assert(out.forall(_(2).asInstanceOf[Long] >= 1)) // n_seqs
  }

  test("dedup-aware split: leakage real, eval immutable, repair closes it") {
    import org.apache.spark.sql.functions.col
    val split = DedupQueries.all.find(_.name == "corpus_split").get
      .run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getBoolean(3)))
    // the hash split lands in a sane band and leakage is non-vacuous
    val evalIds = split.filter(_._2 == "eval").map(_._1).toSet
    val frac = evalIds.size.toDouble / split.length
    assert(frac > 0.10 && frac < 0.30, s"eval fraction $frac")
    assert(split.count(_._3) > 0, "vacuous: no straddling near-dup pair")
    // the benchmark side is immutable: every eval doc kept, none leaked
    assert(split.filter(_._2 == "eval").forall(r => r._4 && !r._3))
    // dropped ⇔ leaked train member
    assert(split.forall(r => r._4 == !r._3))
    // repair CLOSES the leak: re-verify pairs over the kept docs only —
    // no surviving pair may straddle the split
    val keptIds = split.filter(_._4).map(_._1).toSet
    val kept = graft.sources.Sources.table(spark, sf001, "documents")
      .where(col("doc_id").isin(keptIds.toSeq: _*))
    val straddle = graft.dedup.Dedup.jaccardVerified(kept).collect()
      .count(r => evalIds.contains(r.getLong(0)) !=
        evalIds.contains(r.getLong(1)))
    assert(straddle == 0, s"$straddle pairs still straddle after repair")
  }

  test("quality-canonical clean: same survivor count as min-id clean, " +
      "strictly better total quality, membership actually moves") {
    import org.apache.spark.sql.functions.{col, expr}
    def ids(name: String) = DedupQueries.all.find(_.name == name).get
      .run(spark, sf001).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val best = ids("corpus_clean_best")
    val cc = ids("corpus_clean_cc")
    assert(best.size == cc.size,
      "election must only swap survivors, never change the count")
    assert(best != cc, "vacuous: quality election never moved a survivor")
    // every swap strictly improves the elected key (ties keep min id ==
    // the cc choice), so the kept total must be strictly higher
    val qkey = graft.text.Text.qualityModelRaw(
        graft.sources.Sources.table(spark, sf001, "documents"))
      .select(col("doc_id"),
        expr(graft.text.Text.qmKeyExpr).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(best.toSeq.map(qkey).sum > cc.toSeq.map(qkey).sum)
  }

  test("pipeline ledger (row 120): total coverage, packed == manifest, multiple reasons live") {
    import org.apache.spark.sql.functions.{col, sum}
    val docs = graft.sources.Sources.table(spark, sf001, "documents")
    val ledger = Registry.queries("corpus_pipeline_ledger")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // every input doc gets exactly one disposition — no doc silently
    // vanishes from the audit trail
    assert(ledger.length == docs.count(),
      "the ledger must cover every input doc exactly once")
    assert(ledger.map(_._1).distinct.length == ledger.length)
    // the ledger's 'packed' population IS the manifest's: same chain,
    // not a parallel reimplementation that can drift
    val packed = ledger.count(_._2 == "packed")
    val manifestDocs = Registry.queries("corpus_pipeline")(spark, sf001)
      .agg(sum(col("n_docs"))).head.getLong(0)
    assert(packed.toLong == manifestDocs,
      s"ledger packs $packed docs, the manifest packs $manifestDocs")
    // non-vacuity: the chain exercises several distinct drop reasons on
    // the fixture (at minimum the eval split always fires), and every
    // emitted name is a declared stage
    val reasons = ledger.map(_._2).toSet
    assert(reasons.contains("eval_split") && reasons.contains("packed"))
    assert(reasons.size >= 4,
      s"suspiciously few dispositions on the fixture: $reasons")
    val legal = (graft.dedup.Corpus.LedgerStageNames :+ "packed").toSet
    assert(reasons.subsetOf(legal), s"unknown disposition in $reasons")
  }
}

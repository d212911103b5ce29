package graft

import graft.text.{Bm25, Unigram}

/** Unigram-LM trainer: hand-checkable segmentations on planted corpora,
  * coverage and cap invariants, and the exact-decision properties the
  * oracle relies on. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def train(texts: Seq[String]) =
    Unigram.train(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("a repeated word is learned whole: one piece spans it") {
    // 'data' dominates; the trainer must surface 'data' as a piece with
    // usage == its word count (Viterbi picks the 4-char piece over
    // char-by-char splits: one score beats four saturated-low scores)
    val out = train(Seq.fill(20)("data").mkString(" ") :: Nil)
    val pieces = out.map(_._1).toSet
    assert(pieces.contains("data"), s"pieces=$pieces")
    assert(out.find(_._1 == "data").get._2 == 20L)
    // chars stay for coverage even when unused by the best segmentation
    for (ch <- Seq("d", "a", "t"))
      assert(pieces.contains(ch), s"char $ch pruned: $pieces")
  }

  test("mixed corpus: frequent stems beat char splits; caps hold") {
    val corpus = (Seq.fill(30)("spark") ++ Seq.fill(20)("sparks") ++
      Seq.fill(10)("mark")).mkString(" ")
    val out = train(Seq(corpus))
    val byPiece = out.map(t => t._1 -> t._2).toMap
    // 'mark' (a whole word, 4 chars) must be learned as one piece; the
    // spark/sparks family must be covered by multi-char pieces (the
    // exact split — s+park vs spar+k — is the trainer's tie-break call,
    // not the spec's: both are valid maximum-score segmentations)
    assert(byPiece.get("mark").contains(10L), s"got ${out.toSeq}")
    assert(out.exists(t => t._1.length >= 3 && t._1 != "mark" && t._2 >= 20L),
      s"no multi-char piece covers spark/sparks: ${out.toSeq}")
    assert(out.forall(_._1.length <= Unigram.MaxPieceLen))
    assert(out.count(_._1.length > 1) <= Unigram.VocabTarget)
    // scores are integer micro-nats of c/T via the shared lnSeries
    val t = out.map(_._2).sum
    for ((p, c, s) <- out if c > 0) {
      val expect = math.floor(1e6 *
        Bm25.lnSeriesDouble(c.toDouble / t.toDouble)).toLong
      assert(s == expect, s"$p: $s != $expect")
    }
  }

  test("apply: in-population words use their segmentation, OOV backs off to chars") {
    val train = Seq((1L, Seq.fill(20)("data").mkString(" ")))
      .toDF("doc_id", "text")
    val (_, segs) = Unigram.trainFull(train)
    // 'data' segments as one piece (pinned by the first test); 'datax'
    // is out of the trained population -> character backoff (5)
    val out = Unigram.applyCounts(
      Seq((7L, "data datax DATA"), (8L, "???")).toDF("doc_id", "text"), segs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(7L) == 1L + 5L + 1L, s"got $out") // lowercased DATA joins too
    assert(!out.contains(8L), "a no-word doc has no token rows")
  }

  test("pplScore: dict words score piece sums, OOV words char sums, " +
      "unknown chars take the OOV penalty, keep is multiplicative") {
    val train = Seq((1L, Seq.fill(20)("data").mkString(" ")))
      .toDF("doc_id", "text")
    val (vocab, segs) = Unigram.trainFull(train)
    val scores = vocab.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // 'data' is one piece; 'taad' reuses trained chars; 'zz' is unseen
    val out = Unigram.pplScore(
      Seq((7L, "data"), (8L, "taad"), (9L, "zz"))
        .toDF("doc_id", "text"), vocab, segs)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(7L)._1 == 1L && out(7L)._2 == scores("data"))
    assert(out(8L)._1 == 4L &&
      out(8L)._2 == scores("t") + 2 * scores("a") + scores("d"))
    assert(out(9L)._1 == 2L &&
      out(9L)._2 == 2 * Unigram.OovMicroNats && !out(9L)._3)
    // keep: exact boundary — logprob == floor * n keeps
    for ((_, (n, lp, k)) <- out)
      assert(k == (lp >= Unigram.KeepPerPieceMicroNats * n))
  }

  test("deterministic: two trainings of the same corpus agree exactly") {
    val texts = Seq("the merge window merges the sparks",
      "window after window the spark merges")
    assert(train(texts).toSeq == train(texts).toSeq)
  }

  test("degenerate corpora: empty and no-alpha text train to empty vocabs") {
    assert(train(Nil).isEmpty)
    assert(train(Seq("123 456 !!!", "")).isEmpty)
  }

  test("words over MaxWordLen are out of population; their substrings absent") {
    val out = train(Seq(Seq.fill(10)("extraordinarily").mkString(" ")))
    assert(out.isEmpty, s"over-long word leaked: ${out.toSeq}")
  }

  test("tokenizer eval: winner is the piece-count argmin, totals agree " +
      "with the apply legs") {
    import org.apache.spark.sql.functions.col
    val sf001 = "/root/testdata/sf0.001"
    // row: source, n_docs, chars, words, bpe_pieces, uni_pieces,
    // bpe_fert, uni_fert, bpe_cpp, uni_cpp, winner
    val rows = Registry.queries("text_tokenizer_eval")(spark, sf001)
      .collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val (bpe, uni) = (r.getLong(4), r.getLong(5))
      assert(Seq(2, 3, 4, 5, 6, 7, 8, 9).forall(i => r.getLong(i) > 0L))
      val expect =
        if (bpe < uni) "bpe" else if (uni < bpe) "unigram" else "tie"
      assert(r.getString(10) == expect, s"winner mismatch on $r")
      // fertility/compression replay off the row's own integers
      assert(r.getLong(6) == bpe * 1000000L / r.getLong(3))
      assert(r.getLong(9) == r.getLong(2) * 1000000L / uni)
    }
    // totals agree with the two underlying apply queries
    val bpeTotal = Registry.queries("text_bpe_train_apply")(spark, sf001)
      .agg(org.apache.spark.sql.functions.sum(col("learned_tokens")))
      .head.getLong(0)
    assert(rows.map(_.getLong(4)).sum == bpeTotal)
    val uniTotal = Registry.queries("text_unigram_apply")(spark, sf001)
      .agg(org.apache.spark.sql.functions.sum(col("unigram_tokens")))
      .head.getLong(0)
    assert(rows.map(_.getLong(5)).sum == uniTotal)
  }
}

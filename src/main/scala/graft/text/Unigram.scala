package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM (SentencePiece-style) tokenizer TRAINING — the second
 * subword family next to BPE ([[Text.bpeTrain]]): instead of greedily
 * merging pairs, hold a candidate piece vocabulary, segment the word
 * population by Viterbi under current piece scores, re-estimate counts
 * from the chosen segmentations, and prune to the target vocabulary —
 * hard-EM over a capped candidate set (Kudo 2018's algorithm with
 * Viterbi E-steps; the reference engine has no tokenizer training at
 * all — this is training-pipeline surface, like dragnet's quantize
 * aggregations are analytics surface, bin/dn:1).
 *
 * Decisions are EXACT by the house rule: piece scores are integer
 * micro-nats — floor(1e6 · lnSeries(c/T)) with [[Bm25.lnSeries]], the
 * truncated-series ln both engines evaluate bit-identically — so every
 * Viterbi comparison, tie-break, and prune cut is integer arithmetic
 * the DuckDB oracle replays exactly. Ties: segmentations tie-break by
 * longer last piece (bl DESC); equal (score, bl) implies an identical
 * predecessor state, so the election is total. Prune and cap cuts
 * order by (count DESC, piece) — total because piece is unique.
 *
 * Scale shape: ONE corpus pass (tokenize-explode → word-count groupBy,
 * the only corpus-sized shuffle) caps the trainer's world to the top
 * [[WordCap]] words; every later table is bounded by WordCap ×
 * MaxWordLen × MaxPieceLen rows, piece scores broadcast into the DP
 * joins, and each DP state is localCheckpointed so the unrolled
 * lineage stays flat. At 100 TB only the first pass grows; the
 * training state is a constant-size artifact, exactly like the IVF
 * geometry or the BPE merge table. The oracle unrolls the same DP as
 * generated CTEs ([[trainOracleSql]]).
 */
object Unigram {

  /** Words longer than this are out of the training population (the DP
    * unrolls one CTE per position, so the cap is the unroll depth). */
  val MaxWordLen = 10

  /** Longest candidate piece (SentencePiece's max_sentencepiece_length
    * analog). */
  val MaxPieceLen = 4

  /** Training world: top-WordCap words by (count DESC, word). */
  val WordCap = 2048

  /** Seed candidate cap: top multi-char substrings by weighted
    * frequency; single chars always stay (coverage guarantee). */
  val SeedCap = 96

  /** Multi-char pieces kept after each EM round's prune. */
  val VocabTarget = 64

  /** Hard-EM rounds (Viterbi E-step + count M-step + prune). */
  val Rounds = 2

  private val ScoreScaleSql = "CAST(1000000.0 AS DOUBLE)"

  /** Integer micro-nat score of count/total — the ONLY float arithmetic
    * in the trainer, immediately floored, via the shared truncated-series
    * ln both engines evaluate bit-identically (Bm25's BM25 discipline). */
  private def microNats(c: org.apache.spark.sql.Column,
      t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(lit(1000000.0) *
      Bm25.lnSeries(c.cast("double") / t.cast("double"))).cast("long")

  private def microNatsSql(c: String, t: String): String =
    s"CAST(floor($ScoreScaleSql * ${Bm25.lnSeriesSql(
      s"(CAST($c AS DOUBLE) / CAST($t AS DOUBLE))")}) AS BIGINT)"

  /** (piece, c, s): score every vocab row against the vocab total. */
  private def scored(v: DataFrame): DataFrame = {
    val t = v.agg(sum(col("c")).as("t"))
    v.crossJoin(broadcast(t))
      .select(col("piece"), col("c"), microNats(col("c"), col("t")).as("s"))
  }

  /** One Viterbi pass: best segmentation of every word in `words` under
    * `scores`, DP unrolled over positions 1..MaxWordLen. Returns
    * (word, len, wc, sc, seg) — seg the space-joined chosen pieces. */
  private def viterbi(words: DataFrame, pieces: DataFrame,
      scores: DataFrame): DataFrame = {
    val sc = broadcast(scores.select(col("piece"), col("s")))
    var states = Map(0 -> words.select(col("word"), col("len"), col("wc"),
      lit(0L).as("sc"), lit("").as("seg")))
    for (j <- 1 to MaxWordLen) {
      val branches = (1 to math.min(j, MaxPieceLen)).map { l =>
        pieces.where(col("i") === lit(j - l + 1) && col("l") === lit(l))
          .select(col("word"), col("piece"))
          .join(states(j - l).select(col("word"), col("len"), col("wc"),
            col("sc").as("psc"), col("seg").as("pseg")), Seq("word"))
          .join(sc, Seq("piece"))
          .select(col("word"), col("len"), col("wc"),
            (col("psc") + col("s")).as("sc"), lit(l).as("bl"),
            concat(col("pseg"), lit(" "), col("piece")).as("seg"))
      }
      // the (sc, bl, seg) struct-max IS the election: best score, then
      // longest piece; equal (sc, bl) implies an identical seg
      val dj = branches.reduce(_ unionByName _)
        .groupBy(col("word"), col("len"), col("wc"))
        .agg(max(struct(col("sc"), col("bl"), col("seg"))).as("m"))
        .select(col("word"), col("len"), col("wc"),
          col("m.sc").as("sc"), col("m.seg").as("seg"))
        .localCheckpoint()
      states += j -> dj
    }
    (1 to MaxWordLen).map(j => states(j).where(col("len") === lit(j)))
      .reduce(_ unionByName _)
  }

  /**
   * Train on `docs(textCol)`: returns the final vocabulary as
   * (piece, cnt, score_micro) — counts from the last Viterbi pass,
   * scores in integer micro-nats, ordered (cnt DESC, piece).
   */
  def train(docs: DataFrame, textCol: String = "text"): DataFrame =
    trainFull(docs, textCol)._1

  /**
   * [[train]] exposing BOTH halves (the BPE `bpeTrainFull` shape): the
   * scored final vocabulary AND the final E-step's Viterbi
   * segmentation of the word population (word, seg) — the trained
   * tokenizer APPLIED to its own training corpus; the apply gate joins
   * it as a broadcast dictionary with character-count backoff for
   * out-of-population words.
   */
  def trainFull(docs: DataFrame,
      textCol: String = "text"): (DataFrame, DataFrame) = {
    val words = docs
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("word"))
      .where(length(col("word")).between(1, MaxWordLen))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .orderBy(col("wc").desc, col("word")).limit(WordCap)
      .withColumn("len", length(col("word")))
      .localCheckpoint()
    // every substring occurrence (word, i, l, piece), i+l-1 <= len
    val pieces = words
      .select(col("word"), col("len"), col("wc"),
        explode(sequence(lit(1), col("len"))).as("i"))
      .select(col("word"), col("len"), col("wc"), col("i"),
        explode(sequence(lit(1), lit(MaxPieceLen))).as("l"))
      .where(col("i") + col("l") - lit(1) <= col("len"))
      .withColumn("piece", col("word").substr(col("i"), col("l")))
      .localCheckpoint()
    val seedCounts = pieces.groupBy(col("piece")).agg(sum(col("wc")).as("c"))
    val chars = seedCounts.where(length(col("piece")) === 1)
      .select(col("piece")).localCheckpoint()
    var vocab = seedCounts.where(length(col("piece")) === 1)
      .unionByName(seedCounts.where(length(col("piece")) > 1)
        .orderBy(col("c").desc, col("piece")).limit(SeedCap))
      .localCheckpoint()
    var lastFin: DataFrame = null
    for (_ <- 1 to Rounds) {
      val fin = viterbi(words, pieces, scored(vocab))
      lastFin = fin
      val used = fin
        .select(col("wc"), explode(split(trim(col("seg")), " ")).as("piece"))
        .where(col("piece") =!= "")
        .groupBy(col("piece")).agg(sum(col("wc")).as("c"))
      // chars stay unconditionally (coverage), multi prune to target
      val keptChars = chars.join(used, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("c"), lit(0L)).as("c"))
      val keptMulti = used.where(length(col("piece")) > 1)
        .orderBy(col("c").desc, col("piece")).limit(VocabTarget)
      vocab = keptChars.unionByName(keptMulti).localCheckpoint()
    }
    val out = scored(vocab)
      .select(col("piece"), col("c").cast("long").as("cnt"),
        col("s").as("score_micro"))
      .orderBy(col("cnt").desc, col("piece"))
    (out, lastFin.select(col("word"), col("seg")))
  }

  /**
   * APPLY the trained tokenizer over a corpus: per-doc token count
   * under the learned segmentation — the word-level dictionary
   * ([[trainFull]]'s final E-step, broadcast) resolves in-population
   * words to their piece counts; out-of-population words (beyond the
   * cap or over MaxWordLen) back off to character count. One corpus
   * pass, one broadcast join, one doc-keyed groupBy — the 100 TB
   * shape: the dictionary is WordCap-bounded however big the corpus.
   */
  def applyCounts(docs: DataFrame, segs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dict = broadcast(segs.select(col("word"),
      size(split(trim(col("seg")), " ")).as("np")))
    docs.select(col(idCol),
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+"), lit(0))).as("word"))
      .join(dict, Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("np").cast("long"),
        length(col("word")).cast("long"))).as("unigram_tokens"))
  }

  /** Score a piece scheduled by the final E-step but pruned from the
    * final vocabulary (possible: the prune keeps top-[[VocabTarget]]
    * multi-char pieces of the LAST usage count), and any character the
    * training population never saw: a fixed OOV penalty in micro-nats.
    * One constant, replayed by both engines. */
  val OovMicroNats: Long = -20000000L

  /** The CCNet-style keep floor: mean per-piece logprob ≥ -3.43 nats —
    * the measured MEDIAN of the test corpus's per-piece logprob
    * (bulk range -3.65..-3.29), so the decision actually splits the
    * population instead of passing vacuously. Decided multiplicatively
    * — `logprob ≥ floor · n` — so the gate never divides two integers,
    * where Spark truncates and DuckDB floors differently on
    * negatives. */
  val KeepPerPieceMicroNats: Long = -3430000L

  /**
   * Perplexity scoring under the TRAINED artifact — the self-hosted
   * CCNet filter (Wenzek et al. 2020's perplexity rung, served by a
   * model this engine trained rather than row 44's pinned vocabulary):
   * per doc, the total micro-nat logprob of its words under the
   * learned segmentation (each word's pieces score from the final
   * vocabulary; out-of-population words back off to per-character
   * scores; unknown pieces/chars take [[OovMicroNats]]) and the
   * integer keep decision at [[KeepPerPieceMicroNats]] per piece.
   *
   * Scale shape: the dictionary (WordCap-bounded) and the char table
   * (≤ alphabet) broadcast; the corpus makes ONE pass (word explode →
   * two broadcast joins → doc-keyed groupBy). The OOV char explosion
   * only touches words OUTSIDE the top-WordCap population — the
   * frequency-skewed minority of tokens.
   */
  def pplScore(docs: DataFrame, vocab: DataFrame, segs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scores = vocab.select(col("piece"), col("score_micro"))
    val dict = broadcast(
      segs.select(col("word"),
          explode(split(trim(col("seg")), " ")).as("piece"))
        .where(col("piece") =!= "")
        .join(scores, Seq("piece"), "left")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("np"),
          sum(coalesce(col("score_micro"), lit(OovMicroNats))).as("wlp")))
    val charScores = broadcast(scores.where(length(col("piece")) === 1)
      .select(col("piece").as("ch"), col("score_micro").as("cs")))
    val words = docs.select(col(idCol),
      explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("word"))
    val j = words.join(dict, Seq("word"), "left").localCheckpoint()
    val inDict = j.where(col("wlp").isNotNull)
      .select(col(idCol), col("np"), col("wlp"))
    val oov = j.where(col("wlp").isNull)
      .select(col(idCol), col("word"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col(idCol), col("word"),
        col("word").substr(col("i"), lit(1)).as("ch"))
      .join(charScores, Seq("ch"), "left")
      .groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("np"),
        sum(coalesce(col("cs"), lit(OovMicroNats))).as("wlp"))
      .select(col(idCol), col("np"), col("wlp"))
    inDict.unionByName(oov)
      .groupBy(col(idCol))
      .agg(sum(col("np")).as("n_pieces"),
        sum(col("wlp")).as("logprob_micro"))
      .select(col(idCol), col("n_pieces"), col("logprob_micro"),
        (col("logprob_micro") >=
          lit(KeepPerPieceMicroNats) * col("n_pieces")).as("keep"))
  }

  /**
   * [[pplScore]] as a STATELESS per-row expression — the streaming
   * admission shape: the trained dictionary (WordCap-bounded) and the
   * char table (≤ alphabet) ride the plan as MAP LITERALS (the Bloom
   * bit-words discipline: a driver-bounded artifact embedded in the
   * expression), so an arriving doc scores in one pure map with NO
   * join, NO aggregation, NO state — the drained set of a stream is
   * independent of the micro-batch carve-up by construction. Sums are
   * integer and per-doc, so the numbers equal [[pplScore]]'s exactly
   * (its groupBy is also order-free). The nested `aggregate` lambdas
   * run interpreted (§6.6) — acceptable in the micro-batch admission
   * path, whose per-trigger volume is a crawl increment, not a corpus
   * scan; the corpus-scale batch path stays on [[pplScore]]'s
   * broadcast joins. Docs with no `[a-z]+` word are dropped, matching
   * the batch grouping.
   */
  def pplScoreStateless(docs: DataFrame, vocab: DataFrame,
      segs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val scores = vocab.select(col("piece"), col("score_micro"))
    val dict = segs.select(col("word"),
        explode(split(trim(col("seg")), " ")).as("piece"))
      .where(col("piece") =!= "")
      .join(scores, Seq("piece"), "left")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("np"),
        sum(coalesce(col("score_micro"), lit(OovMicroNats))).as("wlp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val chars = scores.where(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def mapLit(ks: Seq[String], vs: Seq[Long]) =
      if (ks.isEmpty) map_from_arrays(array(), array())
      else map_from_arrays(array(ks.map(lit): _*), array(vs.map(lit): _*))
    val npMap = mapLit(dict.map(_._1).toSeq, dict.map(_._2).toSeq)
    val lpMap = mapLit(dict.map(_._1).toSeq, dict.map(_._3).toSeq)
    val chMap = mapLit(chars.map(_._1).toSeq, chars.map(_._2).toSeq)
    val words = regexp_extract_all(lower(col(textCol)),
      lit("[a-z]+"), lit(0))
    def charSum(w: Column) =
      aggregate(sequence(lit(1), length(w)), lit(0L), (a, i) =>
        a + coalesce(element_at(chMap, w.substr(i, lit(1))),
          lit(OovMicroNats)))
    val np = aggregate(words, lit(0L), (a, w) =>
      a + coalesce(element_at(npMap, w), length(w).cast("long")))
    val lp = aggregate(words, lit(0L), (a, w) =>
      a + coalesce(element_at(lpMap, w), charSum(w)))
    docs.where(size(words) > 0)
      .select(col(idCol), np.as("n_pieces"), lp.as("logprob_micro"))
      .withColumn("keep",
        col("logprob_micro") >= lit(KeepPerPieceMicroNats) * col("n_pieces"))
  }

  // ---- generated DuckDB oracle: the identical chain, unrolled ----

  /** One DP CTE block for round `r`, positions 1..MaxWordLen. */
  private def dpCtes(r: Int): String = {
    val base =
      s"""d${r}_0 AS (
         |  SELECT word, len, wc, CAST(0 AS BIGINT) AS sc, '' AS seg FROM w)"""
        .stripMargin
    val steps = (1 to MaxWordLen).map { j =>
      val branches = (1 to math.min(j, MaxPieceLen)).map { l =>
        s"""SELECT p.word, p.len, p.wc, d.sc + s.s AS sc, $l AS bl,
           |      d.seg || ' ' || p.piece AS seg
           |    FROM p JOIN d${r}_${j - l} d ON p.word = d.word
           |    JOIN s${r - 1} s ON s.piece = p.piece
           |    WHERE p.i = ${j - l + 1} AND p.l = $l""".stripMargin
      }.mkString("\n    UNION ALL\n    ")
      s"""d${r}_$j AS MATERIALIZED (
         |  SELECT word, len, wc, sc, seg FROM (
         |    SELECT word, len, wc, sc, seg, ROW_NUMBER() OVER (
         |      PARTITION BY word ORDER BY sc DESC, bl DESC) AS rn
         |    FROM (
         |    $branches)
         |  ) WHERE rn = 1)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** Round `r`'s E+M step: final states, usage counts, pruned vocab,
    * total, scores — s${r} feeds round r+1's DP. */
  private def roundCtes(r: Int): String = {
    val fin = (1 to MaxWordLen)
      .map(j => s"SELECT word, len, wc, sc, seg FROM d${r}_$j WHERE len = $j")
      .mkString("\n  UNION ALL\n  ")
    s"""${dpCtes(r)},
       |fin$r AS MATERIALIZED (
       |  $fin),
       |use$r AS MATERIALIZED (
       |  SELECT u.piece, SUM(f.wc) AS c
       |  FROM fin$r f, UNNEST(string_split(trim(f.seg), ' ')) u(piece)
       |  WHERE u.piece <> '' GROUP BY 1),
       |v$r AS MATERIALIZED (
       |  SELECT ch.piece, COALESCE(u.c, 0) AS c
       |  FROM chars ch LEFT JOIN use$r u ON ch.piece = u.piece
       |  UNION ALL
       |  SELECT piece, c FROM (
       |    SELECT piece, c FROM use$r WHERE length(piece) > 1
       |    ORDER BY c DESC, piece LIMIT $VocabTarget)),
       |t$r AS (SELECT SUM(c) AS t FROM v$r),
       |s$r AS MATERIALIZED (
       |  SELECT piece, c, ${microNatsSql("c", "t")} AS s
       |  FROM v$r, t$r)""".stripMargin
  }

  /** The [[train]] oracle: seed + `Rounds` unrolled EM rounds, every
    * constant shared with the Scala path. */
  def trainOracleSql(base: String = "documents"): String =
    s"""${chainCtes(base)}
       |SELECT piece, CAST(c AS BIGINT) AS cnt, s AS score_micro
       |FROM s$Rounds
       |ORDER BY cnt DESC, piece""".stripMargin

  /** The apply oracle: the SAME training chain extended one join
    * further (the BPE bpeTrainApplyOracleSql shape) — the final
    * E-step's segmentation becomes a per-word piece-count dictionary
    * over the corpus, with character-count backoff for words outside
    * the trained population; a drifted intermediate state fails both
    * gates coherently. */
  def applyOracleSql(base: String = "documents"): String =
    s"""${chainCtes(base)},
       |dict AS (
       |  SELECT word, len(string_split(trim(seg), ' ')) AS np
       |  FROM fin$Rounds),
       |cw AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |  FROM $base)
       |SELECT doc_id,
       |  CAST(sum(coalesce(d.np, length(cw.word))) AS BIGINT)
       |    AS unigram_tokens
       |FROM cw LEFT JOIN dict d ON cw.word = d.word
       |GROUP BY doc_id""".stripMargin

  /** The [[pplScore]] oracle: the training chain extended by the
    * scoring joins — word dictionary with piece logprobs off
    * fin$Rounds × s$Rounds, per-char backoff for out-of-population
    * words, doc-level sums, multiplicative keep. */
  def pplOracleSql(base: String = "documents",
      scoreWhere: String = "TRUE"): String =
    s"""${chainCtes(base)},
       |dictp AS (
       |  SELECT f.word, u.piece
       |  FROM fin$Rounds f, UNNEST(string_split(trim(f.seg), ' ')) u(piece)
       |  WHERE u.piece <> ''),
       |dict AS MATERIALIZED (
       |  SELECT d.word, CAST(COUNT(*) AS BIGINT) AS np,
       |    CAST(SUM(COALESCE(s.s, $OovMicroNats)) AS BIGINT) AS wlp
       |  FROM dictp d LEFT JOIN s$Rounds s ON s.piece = d.piece
       |  GROUP BY d.word),
       |cw AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |  FROM $base WHERE $scoreWhere),
       |jd AS MATERIALIZED (
       |  SELECT cw.doc_id, cw.word, d.np, d.wlp
       |  FROM cw LEFT JOIN dict d ON cw.word = d.word),
       |oov AS (
       |  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS np,
       |    CAST(SUM(COALESCE(cs.s, $OovMicroNats)) AS BIGINT) AS wlp
       |  FROM (
       |    SELECT doc_id, word, substr(word, CAST(i AS INT), 1) AS ch
       |    FROM (SELECT doc_id, word FROM jd WHERE wlp IS NULL),
       |      UNNEST(range(1, length(word) + 1)) a(i)) o
       |  LEFT JOIN (SELECT piece, s FROM s$Rounds WHERE length(piece) = 1) cs
       |    ON cs.piece = o.ch
       |  GROUP BY doc_id, word),
       |parts AS (
       |  SELECT doc_id, np, wlp FROM jd WHERE wlp IS NOT NULL
       |  UNION ALL
       |  SELECT doc_id, np, wlp FROM oov)
       |SELECT doc_id, CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(wlp) AS BIGINT) AS logprob_micro,
       |  (SUM(wlp) >= $KeepPerPieceMicroNats * SUM(np)) AS keep
       |FROM parts GROUP BY doc_id""".stripMargin

  /** The shared WITH-chain of both oracles: seed vocabulary + `Rounds`
    * unrolled EM rounds (ends after s$Rounds / fin$Rounds). */
  private def chainCtes(base: String): String = {
    val rounds = (1 to Rounds).map(roundCtes).mkString(",\n")
    s"""WITH w0 AS (
       |  SELECT word, COUNT(*) AS wc FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |    FROM $base)
       |  WHERE length(word) BETWEEN 1 AND $MaxWordLen GROUP BY 1),
       |w AS MATERIALIZED (
       |  SELECT word, wc, length(word) AS len FROM w0
       |  ORDER BY wc DESC, word LIMIT $WordCap),
       |p AS MATERIALIZED (
       |  SELECT word, len, wc, CAST(i AS INT) AS i, CAST(l AS INT) AS l,
       |    substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece
       |  FROM w, UNNEST(range(1, len + 1)) a(i),
       |    UNNEST(range(1, $MaxPieceLen + 1)) b(l)
       |  WHERE i + l - 1 <= len),
       |seedc AS MATERIALIZED (SELECT piece, SUM(wc) AS c FROM p GROUP BY 1),
       |chars AS MATERIALIZED (SELECT piece FROM seedc WHERE length(piece) = 1),
       |v0 AS MATERIALIZED (
       |  SELECT piece, c FROM seedc WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, c FROM (
       |    SELECT piece, c FROM seedc WHERE length(piece) > 1
       |    ORDER BY c DESC, piece LIMIT $SeedCap)),
       |t0 AS (SELECT SUM(c) AS t FROM v0),
       |s0 AS MATERIALIZED (
       |  SELECT piece, c, ${microNatsSql("c", "t")} AS s
       |  FROM v0, t0),
       |$rounds""".stripMargin
  }
}

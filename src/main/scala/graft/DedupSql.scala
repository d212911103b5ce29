package graft

import graft.functions.XHash

/**
 * DuckDB oracle SQL for the hash-family dedup operators — generated, not
 * hand-written, so the banding geometry and hash constants stay locked
 * to the Scala implementation ([[graft.dedup.Dedup]]). Every step is
 * bit-identical across engines: tokens via the same regex split,
 * shingles via the same 1-based slice, hashes via [[XHash]]'s md5
 * construction, and Jaccard as exact integer counts divided in IEEE
 * double.
 */
object DedupSql {

  /** CTEs: base relation (doc_id, text) → {p}toks → {p}sh (one row per
    * doc/shingle occurrence, duplicates preserved like shingleRows).
    * `p` prefixes the CTE names so two shingled relations can coexist
    * in one query (e.g. decontamination's corpus + eval set). */
  private def shingleCtes(base: String, n: Int, p: String = ""): String =
    s"""${p}toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \\t\\n\\f\\r\\x0B]+') AS t
       |  FROM $base),
       |${p}idx AS (
       |  SELECT doc_id, t,
       |    unnest(range(0, greatest(len(t) - $n, 0) + 1)) AS i
       |  FROM ${p}toks WHERE len(t) > 0),
       |${p}sh AS (
       |  SELECT doc_id, i,
       |    CASE WHEN len(t) < $n THEN array_to_string(t, ' ')
       |         ELSE array_to_string(list_slice(t, i + 1, i + $n), ' ')
       |    END AS s
       |  FROM ${p}idx)""".stripMargin

  /** dedup_spans oracle: per-doc fraction of n-gram slots covered by
    * n-grams appearing in >= minDocs distinct docs. */
  def sharedSpanFrac(base: String = "documents", n: Int = 8,
      minDocs: Int = 2): String =
    s"""WITH ${shingleCtes(base, n)},
       |dsh AS (SELECT DISTINCT doc_id, s FROM sh),
       |hot AS (SELECT s FROM dsh GROUP BY s HAVING COUNT(*) >= $minDocs),
       |agg AS (
       |  SELECT sh.doc_id, COUNT(*) AS n_slots,
       |    SUM(CASE WHEN hot.s IS NOT NULL THEN 1 ELSE 0 END) AS shared
       |  FROM sh LEFT JOIN hot ON sh.s = hot.s
       |  GROUP BY 1)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(n_slots AS BIGINT) AS n_slots,
       |  CAST(shared AS DOUBLE) / CAST(n_slots AS DOUBLE) AS shared_frac
       |FROM agg""".stripMargin

  /** dedup_span_ranges oracle: maximal contiguous runs of hot n-gram
    * slots per doc — gaps-and-islands (covered slot index minus its
    * per-doc rank is constant within a run). Integer output only. */
  def sharedSpans(base: String = "documents", n: Int = 8,
      minDocs: Int = 2): String =
    s"""WITH ${shingleCtes(base, n)},
       |dsh AS (SELECT DISTINCT doc_id, s FROM sh),
       |hot AS (SELECT s FROM dsh GROUP BY s HAVING COUNT(*) >= $minDocs),
       |cov AS (SELECT sh.doc_id, sh.i FROM sh JOIN hot ON sh.s = hot.s),
       |grp AS (
       |  SELECT doc_id, i,
       |    i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS g
       |  FROM cov)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(MIN(i) AS BIGINT) AS span_start,
       |  CAST(MAX(i) + $n - 1 AS BIGINT) AS span_end,
       |  CAST(COUNT(*) AS BIGINT) AS n_slots
       |FROM grp GROUP BY doc_id, g""".stripMargin

  /** corpus_decontam oracle: corpus docs sharing any word n-gram with
    * the eval split (doc_id % evalMod == 0 plays the benchmark set). */
  def decontam(base: String = "documents", n: Int = 3,
      evalMod: Int = 97): String =
    s"""WITH ev AS (
       |  SELECT doc_id, text FROM $base WHERE doc_id % $evalMod = 0),
       |corpus AS (
       |  SELECT doc_id, text FROM $base WHERE doc_id % $evalMod <> 0),
       |${shingleCtes("ev", n, "e")},
       |${shingleCtes("corpus", n, "c")}
       |SELECT DISTINCT CAST(c.doc_id AS BIGINT) AS doc_id
       |FROM csh c JOIN (SELECT DISTINCT s FROM esh) e USING (s)""".stripMargin

  /** corpus_eval_overlap oracle: the eval-side grain of [[decontam]] —
    * per benchmark item, distinct n-grams, n-grams found anywhere in
    * the corpus, and distinct corpus docs sharing one; zero-overlap
    * items kept with zeros. */
  def evalOverlap(base: String = "documents", n: Int = 3,
      evalMod: Int = 97): String =
    s"""WITH ev AS (
       |  SELECT doc_id, text FROM $base WHERE doc_id % $evalMod = 0),
       |corpus AS (
       |  SELECT doc_id, text FROM $base WHERE doc_id % $evalMod <> 0),
       |${shingleCtes("ev", n, "e")},
       |${shingleCtes("corpus", n, "c")},
       |evd AS (SELECT DISTINCT doc_id AS eval_id, s FROM esh),
       |trd AS (SELECT DISTINCT doc_id AS train_id, s FROM csh),
       |tot AS (
       |  SELECT eval_id, CAST(count(*) AS BIGINT) AS n_shingles
       |  FROM evd GROUP BY eval_id),
       |hit AS (
       |  SELECT e.eval_id,
       |    CAST(count(DISTINCT e.s) AS BIGINT) AS n_shared,
       |    CAST(count(DISTINCT t.train_id) AS BIGINT) AS n_train_docs
       |  FROM evd e JOIN trd t USING (s) GROUP BY e.eval_id)
       |SELECT CAST(tot.eval_id AS BIGINT) AS eval_id, tot.n_shingles,
       |  COALESCE(hit.n_shared, 0) AS n_shared,
       |  COALESCE(hit.n_train_docs, 0) AS n_train_docs
       |FROM tot LEFT JOIN hit USING (eval_id)""".stripMargin

  /** corpus_decontam_bloom / stream_decontam_bloom oracle: the Bloom
    * composition replayed relationally. The filter's SET BIT POSITIONS
    * are a derived relation (distinct eval pair × k family members, mod
    * the derived m); a corpus shingle "might contain" iff all k of its
    * probe positions are set — exactly the bit-array test, expressed as
    * a join + HAVING count = k. m derives from the distinct eval pair
    * count by the same integer power-of-two comparison as
    * `Dedup.bloomBitsFor` (smallest 2^x ≥ 64·n over x ∈ [14, 24],
    * COALESCE to the cap). The final exact_hit column replays the
    * exact-verify-on-survivors composition. */
  def decontamBloom(base: String = "documents", n: Int = 3,
      evalMod: Int = 97, k: Int = 4): String =
    s"""WITH ev AS (
       |  SELECT doc_id, text FROM $base WHERE doc_id % $evalMod = 0),
       |corpus AS (
       |  SELECT doc_id, text FROM $base WHERE doc_id % $evalMod <> 0),
       |${shingleCtes("ev", n, "e")},
       |${shingleCtes("corpus", n, "c")},
       |epairs AS (
       |  SELECT DISTINCT ${XHash.h60Sql("s")} AS h1, ${XHash.h56Sql("s")} AS h2
       |  FROM esh),
       |mbits AS (
       |  SELECT COALESCE(MIN(CAST(1 AS BIGINT) << x), 1 << 24) AS m
       |  FROM range(14, 25) r(x), (SELECT COUNT(*) AS n FROM epairs) en
       |  WHERE (CAST(1 AS BIGINT) << x) >= 64 * GREATEST(en.n, 1)),
       |pos AS (
       |  SELECT DISTINCT ((h1 + rr.r * h2) & ${XHash.Mask60}) % m AS p
       |  FROM epairs, range($k) rr(r), mbits),
       |cpairs AS (
       |  SELECT DISTINCT doc_id, ${XHash.h60Sql("s")} AS h1,
       |    ${XHash.h56Sql("s")} AS h2
       |  FROM csh),
       |flagged AS (
       |  SELECT doc_id FROM (
       |    SELECT cp.doc_id, cp.h1, cp.h2
       |    FROM cpairs cp
       |    CROSS JOIN range($k) rr(r)
       |    CROSS JOIN mbits
       |    JOIN pos ON ((cp.h1 + rr.r * cp.h2) & ${XHash.Mask60}) % m = pos.p
       |    GROUP BY 1, 2, 3 HAVING COUNT(*) = $k)
       |  GROUP BY 1),
       |exact AS (
       |  SELECT DISTINCT c.doc_id
       |  FROM csh c JOIN (SELECT DISTINCT s FROM esh) e USING (s))
       |SELECT CAST(f.doc_id AS BIGINT) AS doc_id,
       |  (x.doc_id IS NOT NULL) AS exact_hit
       |FROM flagged f LEFT JOIN exact x USING (doc_id)""".stripMargin

  /** CTEs: {p}sh → {p}sig (per-doc minhash columns m0..m{k-1}) →
    * {p}banded → {p}cand (distinct candidate pairs, doc_a < doc_b).
    * `p` prefixes the CTE names (matching [[shingleCtes]]) so two
    * signed relations can coexist in one query — the incremental-dedup
    * oracle signs both snapshots. */
  private def minhashCtes(n: Int, bands: Int, rowsPerBand: Int,
      p: String = ""): String = {
    val k = bands * rowsPerBand
    val mins = (0 until k)
      .map(i => s"min(${XHash.memberSql("h1", "h2", i)}) AS m$i")
      .mkString(",\n    ")
    val bandSelects = (0 until bands).map { b =>
      val rowMins = (0 until rowsPerBand).map(r => s"m${b * rowsPerBand + r}")
      val key = rowMins.mkString("concat(", ", ',', ", ")")
      s"SELECT doc_id, $b AS band, $key AS bh FROM ${p}sig"
    }.mkString("\n  UNION ALL ")
    s"""${p}hs AS (
       |  SELECT doc_id, ${XHash.h60Sql("s")} AS h1, ${XHash.h56Sql("s")} AS h2
       |  FROM ${p}sh),
       |${p}sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM ${p}hs GROUP BY doc_id),
       |${p}banded AS (
       |  $bandSelects),
       |${p}cand AS (
       |  SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_a,
       |                  CAST(b.doc_id AS BIGINT) AS doc_b
       |  FROM ${p}banded a JOIN ${p}banded b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** dedup_minhash oracle: LSH candidate pairs over `base`. */
  def minhashCandidates(base: String = "documents", n: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2): String =
    s"""WITH ${shingleCtes(base, n)},
       |${minhashCtes(n, bands, rowsPerBand)}
       |SELECT doc_a, doc_b FROM cand""".stripMargin

  /** dedup_minhash_skew oracle (SURVEY row 25's skew gate, r17 verdict
    * item 6): the same banding replay over the SKEWED corpus (docs
    * below `cut` become boilerplate near-dups), reduced to the gate
    * aggregates — candidate-pair count, the largest band bucket, the
    * count of buckets past the heavy threshold, and the engagement
    * flag. All four derive from the data on both sides, so the hash
    * gate pins the heavy regime's OUTPUT, and at sf0.1 the max_bucket
    * value itself demonstrates HeavyBucket was crossed. */
  def minhashSkewGate(boiler: String, cut: Long,
      heavy: Int = graft.dedup.Dedup.HeavyBucket, n: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2): String =
    s"""WITH skewed AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id < $cut
       |      THEN '$boiler tail' || CAST(doc_id AS VARCHAR)
       |      ELSE text END AS text
       |  FROM documents),
       |${shingleCtes("skewed", n)},
       |${minhashCtes(n, bands, rowsPerBand)},
       |bs AS (
       |  SELECT band, bh, count(*) AS c FROM banded GROUP BY 1, 2)
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_pairs,
       |  CAST(max(c) AS BIGINT) AS max_bucket,
       |  CAST(sum(CASE WHEN c > $heavy THEN 1 ELSE 0 END) AS BIGINT)
       |    AS heavy_buckets,
       |  max(c) > $heavy AS heavy_engaged
       |FROM bs""".stripMargin

  /** dedup_banding_recall oracle (SURVEY row 106): exact ground truth
    * from co-rare-shingle candidates (the TruthDfCap replayed) + exact
    * Jaccard, left-joined against the banding's candidate pairs; the
    * measured recall floor asserted TRUE. */
  def bandingRecall(base: String = "documents", n: Int = 3,
      bands: Int = graft.dedup.Dedup.Bands,
      rowsPerBand: Int = graft.dedup.Dedup.RowsPerBand,
      minJ: Double = graft.dedup.Dedup.MinJaccard,
      dfCap: Int = graft.dedup.Dedup.TruthDfCap,
      perMille: Long = graft.dedup.Dedup.MinBandingRecallPerMille): String = {
    val jac = "CAST(i.i AS DOUBLE) / " +
      "CAST(greatest(ca.c + cb.c - i.i, 1) AS DOUBLE)"
    s"""WITH ${shingleCtes(base, n)},
       |${minhashCtes(n, bands, rowsPerBand)},
       |shd AS (SELECT DISTINCT doc_id, s FROM sh),
       |dfx AS (SELECT s, count(*) AS nd FROM shd GROUP BY 1),
       |sub AS (
       |  SELECT x.doc_id, x.s FROM shd x
       |  JOIN (SELECT s FROM dfx WHERE nd <= $dfCap) r ON x.s = r.s),
       |scnt AS (SELECT doc_id, count(*) AS c FROM sub GROUP BY 1),
       |inter AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
       |  FROM sub x JOIN sub y ON y.s = x.s AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT i.doc_a, i.doc_b, $jac AS jaccard
       |  FROM inter i
       |  JOIN scnt ca ON ca.doc_id = i.doc_a
       |  JOIN scnt cb ON cb.doc_id = i.doc_b
       |  WHERE $jac >= $minJ),
       |caughtx AS (
       |  SELECT t.doc_a, t.doc_b, t.jaccard, c.doc_a IS NOT NULL AS caught
       |  FROM truth t LEFT JOIN cand c
       |    ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
       |SELECT doc_a, doc_b, jaccard, caught,
       |  (SELECT sum(CASE WHEN caught THEN 1 ELSE 0 END) * 1000
       |     >= $perMille * count(*) FROM caughtx) AS recall_ok,
       |  (SELECT max(nd) <= $dfCap FROM dfx) AS truth_exact_ok
       |FROM caughtx ORDER BY doc_a, doc_b""".stripMargin
  }

  /** CTEs appended after minhashCtes: exact n-gram Jaccard per candidate
    * pair (jac). |A∪B| = |A| + |B| - |A∩B| over DISTINCT shingles. */
  private def jaccardCtes: String =
    s"""shd AS (SELECT DISTINCT doc_id, s FROM sh),
       |scnt AS (SELECT doc_id, count(*) AS c FROM shd GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS i
       |  FROM cand c
       |  JOIN shd x ON x.doc_id = c.doc_a
       |  JOIN shd y ON y.doc_id = c.doc_b AND y.s = x.s
       |  GROUP BY c.doc_a, c.doc_b),
       |jac AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(coalesce(i.i, 0) AS DOUBLE)
       |      / CAST(greatest(ca.c + cb.c - coalesce(i.i, 0), 1) AS DOUBLE) AS jaccard
       |  FROM cand c
       |  JOIN scnt ca ON ca.doc_id = c.doc_a
       |  JOIN scnt cb ON cb.doc_id = c.doc_b
       |  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b)""".stripMargin

  /** dedup_jaccard oracle: verified near-dup pairs over `base`. */
  def jaccardVerified(base: String = "documents", n: Int = 3,
      minJaccard: Double = graft.dedup.Dedup.MinJaccard): String =
    s"""WITH ${shingleCtes(base, n)},
       |${minhashCtes(n, 8, 2)},
       |$jaccardCtes
       |SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= $minJaccard""".stripMargin

  /** Exact-dup content fingerprint — mirrors Dedup.contentKey
    * (md5 of whitespace-normalized lower text). */
  private def fpSql(text: String): String =
    s"md5(${graft.text.Text.wsNormSql(text)})"

  /**
   * dedup_incremental oracle: replays BOTH snapshots — signs old and
   * new (prefixes o/w), then applies the four incrementalKeepers
   * filters: within-batch exact keep-min-id, cross-snapshot exact
   * anti-join, cross-snapshot band-bucket collision, within-batch
   * candidate-pair higher-id drop.
   */
  def incrementalKeepers(oldWhere: String, newWhere: String,
      base: String = "documents", n: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2): String =
    s"""WITH od AS (SELECT * FROM $base WHERE $oldWhere),
       |nd AS (SELECT * FROM $base WHERE $newWhere),
       |${shingleCtes("od", n, "o")},
       |${minhashCtes(n, bands, rowsPerBand, "o")},
       |${shingleCtes("nd", n, "w")},
       |${minhashCtes(n, bands, rowsPerBand, "w")},
       |nfp AS (SELECT doc_id, ${fpSql("text")} AS fp FROM nd),
       |ofp AS (SELECT DISTINCT ${fpSql("text")} AS fp FROM od),
       |keepers AS (SELECT MIN(doc_id) AS doc_id FROM nfp GROUP BY fp),
       |crossx AS (
       |  SELECT nfp.doc_id FROM nfp LEFT JOIN ofp USING (fp)
       |  WHERE ofp.fp IS NULL),
       |crossnear AS (
       |  SELECT DISTINCT w.doc_id FROM wbanded w
       |  JOIN obanded o ON w.band = o.band AND w.bh = o.bh),
       |neardrop AS (SELECT DISTINCT doc_b AS doc_id FROM wcand)
       |SELECT CAST(k.doc_id AS BIGINT) AS doc_id
       |FROM keepers k
       |JOIN crossx bx ON bx.doc_id = k.doc_id
       |LEFT JOIN crossnear cx ON cx.doc_id = k.doc_id
       |LEFT JOIN neardrop dx ON dx.doc_id = k.doc_id
       |WHERE cx.doc_id IS NULL AND dx.doc_id IS NULL""".stripMargin

  /**
   * dedup_incremental2 oracle: the CLOSED incremental loop. Replays the
   * whole two-crawl chain from raw documents — batch A's four filters
   * against the old snapshot, the store union (old ∪ A-keepers'
   * signatures), then batch B's four filters against the updated store.
   * Every step reuses the same generated CTE families as
   * [[incrementalKeepers]], so the hash geometry stays locked to the
   * Scala implementation.
   */
  def incrementalChained(oldWhere: String, aWhere: String, bWhere: String,
      base: String = "documents", n: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2): String =
    s"""WITH od AS (SELECT * FROM $base WHERE $oldWhere),
       |ad AS (SELECT * FROM $base WHERE $aWhere),
       |bd AS (SELECT * FROM $base WHERE $bWhere),
       |${shingleCtes("od", n, "o")},
       |${minhashCtes(n, bands, rowsPerBand, "o")},
       |${shingleCtes("ad", n, "a")},
       |${minhashCtes(n, bands, rowsPerBand, "a")},
       |${shingleCtes("bd", n, "b")},
       |${minhashCtes(n, bands, rowsPerBand, "b")},
       |ofp AS (SELECT DISTINCT ${fpSql("text")} AS fp FROM od),
       |afp AS (SELECT doc_id, ${fpSql("text")} AS fp FROM ad),
       |akeepers AS (SELECT MIN(doc_id) AS doc_id FROM afp GROUP BY fp),
       |acrossx AS (
       |  SELECT afp.doc_id FROM afp LEFT JOIN ofp USING (fp)
       |  WHERE ofp.fp IS NULL),
       |acrossnear AS (
       |  SELECT DISTINCT a.doc_id FROM abanded a
       |  JOIN obanded o ON a.band = o.band AND a.bh = o.bh),
       |aneardrop AS (SELECT DISTINCT doc_b AS doc_id FROM acand),
       |akeep AS (
       |  SELECT k.doc_id FROM akeepers k
       |  JOIN acrossx ax ON ax.doc_id = k.doc_id
       |  LEFT JOIN acrossnear cx ON cx.doc_id = k.doc_id
       |  LEFT JOIN aneardrop dx ON dx.doc_id = k.doc_id
       |  WHERE cx.doc_id IS NULL AND dx.doc_id IS NULL),
       |s2fp AS (
       |  SELECT fp FROM ofp
       |  UNION
       |  SELECT fp FROM afp JOIN akeep USING (doc_id)),
       |s2band AS (
       |  SELECT band, bh FROM obanded
       |  UNION ALL
       |  SELECT a.band, a.bh FROM abanded a JOIN akeep USING (doc_id)),
       |bfp AS (SELECT doc_id, ${fpSql("text")} AS fp FROM bd),
       |bkeepers AS (SELECT MIN(doc_id) AS doc_id FROM bfp GROUP BY fp),
       |bcrossx AS (
       |  SELECT bfp.doc_id FROM bfp
       |  LEFT JOIN (SELECT DISTINCT fp FROM s2fp) s USING (fp)
       |  WHERE s.fp IS NULL),
       |bcrossnear AS (
       |  SELECT DISTINCT b.doc_id FROM bbanded b
       |  JOIN s2band s ON b.band = s.band AND b.bh = s.bh),
       |bneardrop AS (SELECT DISTINCT doc_b AS doc_id FROM bcand)
       |SELECT CAST(k.doc_id AS BIGINT) AS doc_id
       |FROM bkeepers k
       |JOIN bcrossx bx ON bx.doc_id = k.doc_id
       |LEFT JOIN bcrossnear cx ON cx.doc_id = k.doc_id
       |LEFT JOIN bneardrop dx ON dx.doc_id = k.doc_id
       |WHERE cx.doc_id IS NULL AND dx.doc_id IS NULL""".stripMargin

  /** dedup_simhash oracle: 60-bit simhash, 4×15-bit bands, hamming ≤ 3. */
  def simhashPairs(base: String = "documents", maxHamming: Int = 3): String = {
    val bits = 60
    val sums = (0 until bits).map(j => s"sum((h >> $j) & 1) AS s$j")
      .mkString(",\n    ")
    val simExpr = (0 until bits)
      .map(j => s"(CASE WHEN s$j * 2 > n THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[^ \\t\\n\\f\\r\\x0B]+')) AS t
       |  FROM $base),
       |th AS (SELECT doc_id, ${XHash.h60Sql("t")} AS h FROM tok),
       |bs AS (
       |  SELECT doc_id, count(*) AS n,
       |    $sums
       |  FROM th GROUP BY doc_id),
       |sims AS (SELECT doc_id, CAST($simExpr AS BIGINT) AS sim FROM bs),
       |sb AS (SELECT doc_id, sim, unnest([0, 1, 2, 3]) AS band FROM sims),
       |sbv AS (
       |  SELECT doc_id, sim, band,
       |    (sim >> (band * ${graft.dedup.Dedup.SimBandBits})) & ${(1L << graft.dedup.Dedup.SimBandBits) - 1} AS bv
       |  FROM sb)
       |SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_a,
       |  CAST(b.doc_id AS BIGINT) AS doc_b,
       |  CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
       |FROM sbv a JOIN sbv b
       |  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= $maxHamming""".stripMargin
  }

  /** dedup_bucket_stats oracle: the banding's bucket-population
    * histogram — same sig/banded CTEs, two grouped counts. */
  def bucketStats(base: String = "documents", n: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2): String =
    s"""WITH ${shingleCtes(base, n)},
       |${minhashCtes(n, bands, rowsPerBand)},
       |sizes AS (
       |  SELECT band, bh, CAST(count(*) AS BIGINT) AS bucket_size
       |  FROM banded GROUP BY band, bh)
       |SELECT CAST(band AS INT) AS band, bucket_size,
       |  CAST(count(*) AS BIGINT) AS n_buckets
       |FROM sizes GROUP BY band, bucket_size""".stripMargin

  /** dedup_clusters oracle: connected components of the verified-pair
    * graph via a recursive transitive-closure CTE; cluster id = min doc
    * id reachable (including self). */
  def clusters(base: String = "documents", n: Int = 3,
      minJaccard: Double = 0.6): String =
    s"""WITH RECURSIVE ${shingleCtes(base, n)},
       |${minhashCtes(n, 8, 2)},
       |$jaccardCtes,
       |edges AS (
       |  SELECT doc_a, doc_b FROM jac WHERE jaccard >= $minJaccard),
       |und AS (
       |  SELECT doc_a AS u, doc_b AS v FROM edges
       |  UNION ALL SELECT doc_b AS u, doc_a AS v FROM edges),
       |reach AS (
       |  SELECT u, v FROM und
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
       |SELECT CAST(u AS BIGINT) AS doc_id,
       |  CAST(least(u, min(v)) AS BIGINT) AS cluster_id
       |FROM reach GROUP BY u""".stripMargin

  /** Quality-score expression over a `text` column — must mirror
    * Text.qualityScore term for term (same associativity). */
  def qualitySql(text: String): String =
    s"""least(CAST(length($text) AS DOUBLE) / 500.0, 1.0) * 0.4
       |    + least((CAST(len(list_filter(regexp_extract_all(lower($text), '[^ \\t\\n\\f\\r\\x0B]+'),
       |        x -> list_contains(['the','a','an','and','of','to','in','is','that','it','was','for','on','with','as'], x))) AS DOUBLE)
       |      / CAST(greatest(len(regexp_extract_all(lower($text), '[^ \\t\\n\\f\\r\\x0B]+')), 1) AS DOUBLE)) * 4.0, 1.0) * 0.4
       |    + (1.0 - least((CAST(len(regexp_extract_all($text, '[.,;:!?]')) AS DOUBLE)
       |      / CAST(greatest(length($text), 1) AS DOUBLE)) * 10.0, 1.0)) * 0.2""".stripMargin

  /** corpus_clean_cc oracle: same pipeline as [[corpusClean]] but the
    * near-dup keep-policy is connected-component based — one survivor
    * (the min id) per CLUSTER of the verified-pair graph, computed with
    * the recursive transitive closure. */
  def corpusCleanClusters(minQuality: Double = 0.3,
      nearDupJaccard: Double = 0.6, n: Int = 3): String =
    s"""WITH RECURSIVE q AS (
       |  SELECT doc_id, text, lang, n_chars FROM documents
       |  WHERE ${qualitySql("text")} >= $minQuality),
       |fp AS (
       |  SELECT doc_id,
       |    md5(regexp_replace(regexp_replace(lower(text), '[ \\t\\n\\f\\r\\x0B]+', ' ', 'g'), '(^ )|( $$)', '', 'g')) AS f
       |  FROM q),
       |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
       |kept AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
       |${shingleCtes("kept", n)},
       |${minhashCtes(n, 8, 2)},
       |$jaccardCtes,
       |edges AS (
       |  SELECT doc_a, doc_b FROM jac WHERE jaccard >= $nearDupJaccard),
       |und AS (
       |  SELECT doc_a AS u, doc_b AS v FROM edges
       |  UNION ALL SELECT doc_b AS u, doc_a AS v FROM edges),
       |reach AS (
       |  SELECT u, v FROM und
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
       |losers AS (
       |  SELECT u AS doc_id FROM reach
       |  GROUP BY u HAVING u <> least(u, min(v)))
       |SELECT CAST(k.doc_id AS BIGINT) AS doc_id, k.lang,
       |  CAST(k.n_chars AS BIGINT) AS n_chars
       |FROM kept k WHERE NOT EXISTS (
       |  SELECT 1 FROM losers l WHERE l.doc_id = k.doc_id)""".stripMargin

  /** [[corpusCleanClusters]] with the QUALITY-canonical election
    * (corpus_clean_best): the cluster survivor is the per-token
    * quality-model argmax over the kept docs (the dedup_canonical key —
    * non-negative dividend, min-id ties) instead of the min id. */
  def corpusCleanBest(minQuality: Double = 0.3,
      nearDupJaccard: Double = 0.6, n: Int = 3): String = {
    val h = graft.functions.XHash.h60Sql("'qm:' || t")
    s"""WITH RECURSIVE q AS (
       |  SELECT doc_id, text, lang, n_chars FROM documents
       |  WHERE ${qualitySql("text")} >= $minQuality),
       |fp AS (
       |  SELECT doc_id,
       |    md5(regexp_replace(regexp_replace(lower(text), '[ \\t\\n\\f\\r\\x0B]+', ' ', 'g'), '(^ )|( $$)', '', 'g')) AS f
       |  FROM q),
       |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
       |kept AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
       |${shingleCtes("kept", n)},
       |${minhashCtes(n, 8, 2)},
       |$jaccardCtes,
       |edges AS (
       |  SELECT doc_a, doc_b FROM jac WHERE jaccard >= $nearDupJaccard),
       |und AS (
       |  SELECT doc_a AS u, doc_b AS v FROM edges
       |  UNION ALL SELECT doc_b AS u, doc_a AS v FROM edges),
       |reach AS (
       |  SELECT u, v FROM und
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
       |cmem AS (
       |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
       |  FROM reach GROUP BY u),
       |qtk AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[^ \\t\\n\\f\\r\\x0B]+')) AS t
       |  FROM kept),
       |qdq AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS nt,
       |    CAST(sum(($h % ${graft.text.Text.QmBuckets})
       |        * 2654435761 % 2000 - 1000)
       |      + ${graft.text.Text.QmBiasNum} * count(*) AS BIGINT) AS num
       |  FROM qtk GROUP BY doc_id),
       |qelect AS (
       |  SELECT c.cluster_id, c.doc_id,
       |    row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY ${graft.text.Text.qmKeySql("d.num", "d.nt")} DESC,
       |        c.doc_id ASC) AS rn
       |  FROM cmem c JOIN qdq d USING (doc_id)),
       |losers AS (SELECT doc_id FROM qelect WHERE rn > 1)
       |SELECT CAST(k.doc_id AS BIGINT) AS doc_id, k.lang,
       |  CAST(k.n_chars AS BIGINT) AS n_chars
       |FROM kept k WHERE NOT EXISTS (
       |  SELECT 1 FROM losers l WHERE l.doc_id = k.doc_id)""".stripMargin
  }

  /** corpus_clean oracle: quality floor → exact dedup (keep lowest id
    * per normalized-content group) → near-dup removal (drop doc_b of
    * each Jaccard-verified pair). Output survivors' (doc_id, lang,
    * n_chars). */
  def corpusClean(minQuality: Double = 0.3, nearDupJaccard: Double = 0.6,
      n: Int = 3): String =
    s"""WITH q AS (
       |  SELECT doc_id, text, lang, n_chars FROM documents
       |  WHERE ${qualitySql("text")} >= $minQuality),
       |fp AS (
       |  SELECT doc_id,
       |    md5(regexp_replace(regexp_replace(lower(text), '[ \\t\\n\\f\\r\\x0B]+', ' ', 'g'), '(^ )|( $$)', '', 'g')) AS f
       |  FROM q),
       |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
       |kept AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
       |${shingleCtes("kept", n)},
       |${minhashCtes(n, 8, 2)},
       |$jaccardCtes,
       |losers AS (
       |  SELECT DISTINCT doc_b AS doc_id FROM jac
       |  WHERE jaccard >= $nearDupJaccard)
       |SELECT CAST(k.doc_id AS BIGINT) AS doc_id, k.lang,
       |  CAST(k.n_chars AS BIGINT) AS n_chars
       |FROM kept k WHERE NOT EXISTS (
       |  SELECT 1 FROM losers l WHERE l.doc_id = k.doc_id)""".stripMargin

  /** corpus_source_rank oracle: the source co-duplication PageRank with
    * all `iters` damped power iterations unrolled as CTEs — counts, the
    * per-edge message expression `(p * w) / ow`, the dangling-mass
    * redistribution, and the damping arithmetic all evaluate in the
    * identical shape the Spark plan uses. */
  def sourceRank(base: String = "documents", n: Int = 5, iters: Int = 5,
      damping: Double = 0.85, maxSources: Int = 64): String = {
    val rounds = (0 until iters).map { i =>
      // ORDERED folds, not sum(): FP addition is order-sensitive in
      // the last ULP and each engine's sum() order is its own — on a
      // hostile corpus the drift scrambles the gate's (pr, source)
      // row sort (FuzzCorpus). Both engines fold src-ascending.
      s"""msg$i AS (
         |  SELECT e.dst AS v,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list(pr.p * e.w / o.ow ORDER BY e.src)), (a, b) -> a + b)
         |      AS m
         |  FROM e JOIN outw o ON o.src = e.src
         |  JOIN pr$i pr ON pr.v = e.src
         |  GROUP BY 1),
         |dang$i AS (
         |  SELECT coalesce(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list(p ORDER BY v)), (a, b) -> a + b), 0.0) AS dm FROM pr$i
         |  WHERE v NOT IN (SELECT src FROM outw)),
         |pr${i + 1} AS (
         |  SELECT nodes.v,
         |    (1.0 - $damping) / n + $damping * (coalesce(m, 0.0) + dm / n)
         |      AS p
         |  FROM nodes CROSS JOIN nn CROSS JOIN dang$i
         |  LEFT JOIN msg$i ON msg$i.v = nodes.v)""".stripMargin
    }
    s"""WITH toks AS (
       |  SELECT source, regexp_extract_all(lower(text), '[^ \\t\\n\\f\\r\\x0B]+') AS t
       |  FROM $base),
       |idx AS (
       |  SELECT source, t,
       |    unnest(range(0, greatest(len(t) - $n, 0) + 1)) AS i
       |  FROM toks WHERE len(t) > 0),
       |sh AS (
       |  SELECT DISTINCT source AS v,
       |    CASE WHEN len(t) < $n THEN array_to_string(t, ' ')
       |         ELSE array_to_string(list_slice(t, i + 1, i + $n), ' ')
       |    END AS s
       |  FROM idx),
       |nodes AS (SELECT DISTINCT source AS v FROM $base),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |sdf AS (
       |  SELECT s FROM sh GROUP BY s
       |  HAVING count(*) <= $maxSources),
       |e AS (
       |  SELECT a.v AS src, b.v AS dst, CAST(count(*) AS DOUBLE) AS w
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.v <> b.v
       |  JOIN sdf ON sdf.s = a.s
       |  GROUP BY 1, 2),
       |outw AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
       |pr0 AS (SELECT v, 1.0 / n AS p FROM nodes CROSS JOIN nn),
       |${rounds.mkString(",\n")}
       |SELECT v AS source, p AS pr FROM pr$iters""".stripMargin
  }

  /** The chunk CTE chain (base → {p}chunks → {p}hashed), shared by the
    * batch and incremental chunk-dedup oracles. */
  private def chunkCtes(base: String, width: Int, p: String = ""): String =
    s"""${p}toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \\t\\n\\f\\r\\x0B]+') AS t
       |  FROM $base),
       |${p}chunks AS (
       |  -- len(t) > 0: DuckDB's // TRUNCATES, so ((0-1)//w)+1 = 1 and a
       |  -- zero-token doc would mint one NULL chunk (md5(NULL) then
       |  -- poisons the hash CTE); the Spark chunker emits nothing there
       |  SELECT doc_id, i AS idx,
       |    array_to_string(list_slice(t, i * $width + 1, i * $width + $width),
       |      ' ') AS chunk
       |  FROM ${p}toks, UNNEST(range(((len(t) - 1) // $width) + 1)) AS u(i)
       |  WHERE len(t) > 0),
       |${p}hashed AS (
       |  SELECT doc_id, idx, chunk,
       |    ${XHash.h60Sql("chunk")} AS h1,
       |    ${XHash.h56Sql("chunk")} AS h2
       |  FROM ${p}chunks)""".stripMargin

  /** The CONTENT-DEFINED chunk CTE chain (base → {p}chunks → {p}hashed)
    * — [[chunkCtes]]' CDC twin, replaying Dedup.cdcChunksArr's boundary
    * rule bit for bit: token position i (1-based) starts a new chunk
    * iff i ≥ 2 and h60(t[i-1] ⊔ t[i]) ≡ 0 (mod avgWidth); the chunk
    * index is the running cut count. */
  private def cdcChunkCtes(base: String, avgWidth: Int,
      p: String = ""): String =
    s"""${p}toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \\t\\n\\f\\r\\x0B]+') AS t
       |  FROM $base),
       |${p}trows AS (
       |  SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
       |  FROM ${p}toks),
       |${p}flagged AS (
       |  -- greatest(i-1, 1): at i = 1 the hash input must still be a
       |  -- VALID string (vectorized CASE evaluates the branch for all
       |  -- rows; t[0] is NULL and '0x' || NULL fails the BIGINT cast)
       |  -- — the i >= 2 guard then discards the unused value
       |  SELECT doc_id, i, t[i] AS tok,
       |    CASE WHEN i >= 2 AND
       |        ${XHash.h60Sql("t[greatest(i-1, 1)] || ' ' || t[i]")}
       |          % $avgWidth = 0
       |      THEN 1 ELSE 0 END AS f
       |  FROM ${p}trows),
       |${p}chunks AS (
       |  SELECT doc_id, CAST(idx AS INT) AS idx,
       |    string_agg(tok, ' ' ORDER BY i) AS chunk
       |  FROM (
       |    SELECT doc_id, i, tok,
       |      SUM(f) OVER (PARTITION BY doc_id ORDER BY i
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS idx
       |    FROM ${p}flagged)
       |  GROUP BY doc_id, idx),
       |${p}hashed AS (
       |  SELECT doc_id, idx, chunk,
       |    ${XHash.h60Sql("chunk")} AS h1,
       |    ${XHash.h56Sql("chunk")} AS h2
       |  FROM ${p}chunks)""".stripMargin

  /** stream_chunks_cdc_state oracle (r16 verdict item 6): the crawl
    * slice's distinct CDC chunk-key population, twice — the Spark side
    * reports the state store's final `numRowsTotal` as `state_rows`
    * and the sink's first-occurrence count as `distinct_keys`, so the
    * hash gate pins STATE ROWS == DISTINCT KEYS == the relational
    * replay: a leaked state row (dup key kept twice) or a lost one
    * (key dropped) moves one of the three numbers. */
  def cdcStateAccounting(newWhere: String,
      avgWidth: Int = graft.dedup.Dedup.CdcAvgWidth): String =
    s"""WITH ${cdcChunkCtes(s"(SELECT * FROM documents WHERE $newWhere)",
            avgWidth)},
       |k AS (SELECT DISTINCT h1, h2 FROM hashed)
       |SELECT CAST(count(*) AS BIGINT) AS state_rows,
       |  CAST(count(*) AS BIGINT) AS distinct_keys
       |FROM k""".stripMargin

  /** dedup_chunks_cdc oracle: [[chunkDedup]]'s election + reassembly
    * over the content-defined chunk table. */
  def cdcChunkDedup(base: String = "documents",
      avgWidth: Int = graft.dedup.Dedup.CdcAvgWidth): String =
    s"""WITH ${cdcChunkCtes(base, avgWidth)},
       |w AS (
       |  SELECT h1, h2, min({'doc_id': doc_id, 'idx': idx}) AS w
       |  FROM hashed GROUP BY h1, h2),
       |decided AS (
       |  SELECT h.doc_id, h.idx, h.chunk,
       |    ({'doc_id': h.doc_id, 'idx': h.idx} = w.w) AS kept
       |  FROM hashed h JOIN w ON h.h1 = w.h1 AND h.h2 = w.h2)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
       |  coalesce(array_to_string(
       |    list(chunk ORDER BY idx) FILTER (WHERE kept), ' '), '') AS kept_text
       |FROM decided GROUP BY doc_id""".stripMargin

  /** dedup_chunks_cdc_incremental oracle: the old slice's distinct CDC
    * chunk-hash set replayed from raw documents, the new batch's CDC
    * chunks kept iff absent there AND first-in-batch. */
  def cdcChunkDedupIncremental(oldWhere: String, newWhere: String,
      avgWidth: Int = graft.dedup.Dedup.CdcAvgWidth): String =
    s"""WITH ${cdcChunkCtes(s"(SELECT * FROM documents WHERE $oldWhere)",
            avgWidth, "o")},
       |store AS (SELECT DISTINCT h1, h2 FROM ohashed),
       |${cdcChunkCtes(s"(SELECT * FROM documents WHERE $newWhere)", avgWidth)},
       |w AS (
       |  SELECT h1, h2, min({'doc_id': doc_id, 'idx': idx}) AS w
       |  FROM hashed GROUP BY h1, h2),
       |decided AS (
       |  SELECT h.doc_id, h.idx, h.chunk,
       |    (NOT EXISTS (SELECT 1 FROM store s
       |       WHERE s.h1 = h.h1 AND s.h2 = h.h2)
       |     AND {'doc_id': h.doc_id, 'idx': h.idx} = w.w) AS kept
       |  FROM hashed h JOIN w ON h.h1 = w.h1 AND h.h2 = w.h2)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
       |  coalesce(array_to_string(
       |    list(chunk ORDER BY idx) FILTER (WHERE kept), ' '), '') AS kept_text
       |FROM decided GROUP BY doc_id""".stripMargin

  /** dedup_chunks oracle: non-overlapping `width`-token chunks, the
    * lexicographically-first (doc_id, idx) occurrence of each chunk
    * text (elected via struct-min over the same [[XHash]] 116-bit pair
    * the Spark plan groups on) survives, and each document reassembles
    * from its surviving chunks in position order. */
  def chunkDedup(base: String = "documents",
      width: Int = graft.dedup.Dedup.ChunkWidth): String =
    s"""WITH ${chunkCtes(base, width)},
       |w AS (
       |  SELECT h1, h2, min({'doc_id': doc_id, 'idx': idx}) AS w
       |  FROM hashed GROUP BY h1, h2),
       |decided AS (
       |  SELECT h.doc_id, h.idx, h.chunk,
       |    ({'doc_id': h.doc_id, 'idx': h.idx} = w.w) AS kept
       |  FROM hashed h JOIN w ON h.h1 = w.h1 AND h.h2 = w.h2)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
       |  coalesce(array_to_string(
       |    list(chunk ORDER BY idx) FILTER (WHERE kept), ' '), '') AS kept_text
       |FROM decided GROUP BY doc_id""".stripMargin

  /** corpus_decontam_chunks oracle (SURVEY row 105): eval shingles
    * matched on the UN-CHUNKED token stream flag every chunk their
    * slot span ⌊i/width⌋..⌊(i+n−1)/width⌋ touches; each train doc
    * reassembles from its unflagged chunks in position order. */
  def chunkDecontam(base: String = "documents",
      width: Int = graft.dedup.Dedup.ChunkWidth,
      n: Int = graft.dedup.Dedup.ShingleN, evalMod: Int = 97): String =
    s"""WITH ev AS (
       |  SELECT doc_id, text FROM $base WHERE doc_id % $evalMod = 0),
       |corpus AS (
       |  SELECT doc_id, text FROM $base WHERE doc_id % $evalMod <> 0),
       |${shingleCtes("ev", n, "e")},
       |${shingleCtes("corpus", n, "c")},
       |${chunkCtes("corpus", width)},
       |bad AS (
       |  SELECT DISTINCT doc_id, idx FROM (
       |    SELECT c.doc_id,
       |      unnest(range(i // $width, (i + ${n - 1}) // $width + 1)) AS idx
       |    FROM csh c JOIN (SELECT DISTINCT s FROM esh) e USING (s))),
       |decided AS (
       |  SELECT h.doc_id, h.idx, h.chunk, b.idx IS NULL AS kept
       |  FROM hashed h LEFT JOIN bad b
       |    ON h.doc_id = b.doc_id AND h.idx = b.idx)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
       |  coalesce(array_to_string(
       |    list(chunk ORDER BY idx) FILTER (WHERE kept), ' '), '') AS kept_text
       |FROM decided GROUP BY doc_id""".stripMargin

  /** stream_decontam_surgical oracle (SURVEY row 110): the Bloom
    * probe replayed bit for bit (same m derivation, same double-hash
    * members — the decontamBloom CTEs) at SHINGLE-SLOT grain, matched
    * slots flagging every chunk their span touches, each document
    * reassembled from its unflagged chunks — rows 55 and 105 composed
    * under one relational replay, so even a Bloom false positive is
    * deterministic and gated. */
  def bloomChunkExcise(base: String = "documents", n: Int = 3,
      width: Int = graft.dedup.Dedup.ChunkWidth, evalMod: Int = 97,
      k: Int = graft.dedup.Dedup.BloomK): String =
    s"""WITH ev AS (
       |  SELECT doc_id, text FROM $base WHERE doc_id % $evalMod = 0),
       |corpus AS (
       |  SELECT doc_id, text FROM $base WHERE doc_id % $evalMod <> 0),
       |${shingleCtes("ev", n, "e")},
       |${shingleCtes("corpus", n, "c")},
       |epairs AS (
       |  SELECT DISTINCT ${XHash.h60Sql("s")} AS h1, ${XHash.h56Sql("s")} AS h2
       |  FROM esh),
       |mbits AS (
       |  SELECT COALESCE(MIN(CAST(1 AS BIGINT) << x), 1 << 24) AS m
       |  FROM range(14, 25) r(x), (SELECT COUNT(*) AS n FROM epairs) en
       |  WHERE (CAST(1 AS BIGINT) << x) >= 64 * GREATEST(en.n, 1)),
       |pos AS (
       |  SELECT DISTINCT ((h1 + rr.r * h2) & ${XHash.Mask60}) % m AS p
       |  FROM epairs, range($k) rr(r), mbits),
       |cpr AS (
       |  SELECT doc_id, i, ${XHash.h60Sql("s")} AS h1,
       |    ${XHash.h56Sql("s")} AS h2
       |  FROM csh),
       |matched AS (
       |  SELECT doc_id, i FROM (
       |    SELECT cp.doc_id, cp.i
       |    FROM cpr cp
       |    CROSS JOIN range($k) rr(r)
       |    CROSS JOIN mbits
       |    JOIN pos ON ((cp.h1 + rr.r * cp.h2) & ${XHash.Mask60}) % m = pos.p
       |    GROUP BY 1, 2 HAVING COUNT(*) = $k)
       |  GROUP BY 1, 2),
       |bad AS (
       |  SELECT DISTINCT doc_id, idx FROM (
       |    SELECT doc_id,
       |      unnest(range(i // $width, (i + ${n - 1}) // $width + 1)) AS idx
       |    FROM matched)),
       |${chunkCtes("corpus", width)},
       |decided AS (
       |  SELECT h.doc_id, h.idx, h.chunk, b.idx IS NULL AS kept
       |  FROM hashed h LEFT JOIN bad b
       |    ON h.doc_id = b.doc_id AND h.idx = b.idx)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
       |  coalesce(array_to_string(
       |    list(chunk ORDER BY idx) FILTER (WHERE kept), ' '), '') AS kept_text
       |FROM decided GROUP BY doc_id""".stripMargin

  /** dedup_chunks_incremental oracle: the old snapshot's distinct chunk
    * hash set replayed from raw documents, the new batch's chunks kept
    * iff absent there AND first-in-batch at their (doc_id, idx). */
  def chunkDedupIncremental(oldWhere: String, newWhere: String,
      width: Int = graft.dedup.Dedup.ChunkWidth): String =
    s"""WITH ${chunkCtes(s"(SELECT * FROM documents WHERE $oldWhere)",
            width, "o")},
       |store AS (SELECT DISTINCT h1, h2 FROM ohashed),
       |${chunkCtes(s"(SELECT * FROM documents WHERE $newWhere)", width)},
       |w AS (
       |  SELECT h1, h2, min({'doc_id': doc_id, 'idx': idx}) AS w
       |  FROM hashed GROUP BY h1, h2),
       |decided AS (
       |  SELECT h.doc_id, h.idx, h.chunk,
       |    (NOT EXISTS (SELECT 1 FROM store s
       |       WHERE s.h1 = h.h1 AND s.h2 = h.h2)
       |     AND {'doc_id': h.doc_id, 'idx': h.idx} = w.w) AS kept
       |  FROM hashed h JOIN w ON h.h1 = w.h1 AND h.h2 = w.h2)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
       |  coalesce(array_to_string(
       |    list(chunk ORDER BY idx) FILTER (WHERE kept), ' '), '') AS kept_text
       |FROM decided GROUP BY doc_id""".stripMargin

  /** corpus_pipeline_incremental oracle: crawl N+1's admission chain
    * replayed from raw snapshots — the four incrementalKeepers filters
    * against the old snapshot (stage 1), chunk-level dedup against the
    * old chunk-hash set with first-in-batch election (stage 2, text
    * REWRITTEN), decontamination vs the eval split (stage 3), and the
    * quality-model sign test (stage 4). The Spark side touches old
    * data ONLY through the persisted signature/chunk stores; this
    * replays their contents from documents, so a stale or torn store
    * hash-mismatches (the dedup_incremental discipline, composed). */
  def pipelineIncremental(oldWhere: String, newWhere: String,
      base: String = "documents", n: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2,
      width: Int = graft.dedup.Dedup.ChunkWidth,
      evalMod: Int = 97,
      /** Stage-3 action: `doc` (drop contaminated batch docs whole) or
        * `chunk` (excise the contaminated chunks — row 105's fragment
        * at the crawl grain). */
      decontam: String = "doc"): String = {
    val qmB = graft.text.Text.QmBuckets
    val qmBias = graft.text.Text.QmBiasNum
    val qh = XHash.h60Sql("'qm:' || t")
    s"""WITH od AS (SELECT * FROM $base WHERE $oldWhere),
       |nd AS (SELECT * FROM $base WHERE $newWhere),
       |${shingleCtes("od", n, "o")},
       |${minhashCtes(n, bands, rowsPerBand, "o")},
       |${shingleCtes("nd", n, "w")},
       |${minhashCtes(n, bands, rowsPerBand, "w")},
       |nfp AS (SELECT doc_id, ${fpSql("text")} AS fp FROM nd),
       |ofp AS (SELECT DISTINCT ${fpSql("text")} AS fp FROM od),
       |keepers AS (SELECT MIN(doc_id) AS doc_id FROM nfp GROUP BY fp),
       |crossx AS (
       |  SELECT nfp.doc_id FROM nfp LEFT JOIN ofp USING (fp)
       |  WHERE ofp.fp IS NULL),
       |crossnear AS (
       |  SELECT DISTINCT w.doc_id FROM wbanded w
       |  JOIN obanded o ON w.band = o.band AND w.bh = o.bh),
       |neardrop AS (SELECT DISTINCT doc_b AS doc_id FROM wcand),
       |k1 AS (
       |  SELECT k.doc_id FROM keepers k
       |  JOIN crossx bx ON bx.doc_id = k.doc_id
       |  LEFT JOIN crossnear cx ON cx.doc_id = k.doc_id
       |  LEFT JOIN neardrop dx ON dx.doc_id = k.doc_id
       |  WHERE cx.doc_id IS NULL AND dx.doc_id IS NULL),
       |b1 AS (SELECT nd.doc_id, nd.text FROM nd JOIN k1 USING (doc_id)),
       |${chunkCtes(s"(SELECT * FROM $base WHERE $oldWhere)", width, "co")},
       |chstore AS (SELECT DISTINCT h1, h2 FROM cohashed),
       |${chunkCtes("b1", width, "cn")},
       |w2 AS (
       |  SELECT h1, h2, min({'doc_id': doc_id, 'idx': idx}) AS w
       |  FROM cnhashed GROUP BY h1, h2),
       |dec AS (
       |  SELECT h.doc_id, h.idx, h.chunk,
       |    (NOT EXISTS (SELECT 1 FROM chstore s
       |       WHERE s.h1 = h.h1 AND s.h2 = h.h2)
       |     AND {'doc_id': h.doc_id, 'idx': h.idx} = w2.w) AS kept
       |  FROM cnhashed h JOIN w2 ON h.h1 = w2.h1 AND h.h2 = w2.h2),
       |b2 AS MATERIALIZED (
       |  SELECT doc_id, kept_text AS text FROM (
       |    SELECT doc_id,
       |      sum(CASE WHEN kept THEN 1 ELSE 0 END) AS kept_chunks,
       |      coalesce(array_to_string(
       |        list(chunk ORDER BY idx) FILTER (WHERE kept), ' '), '')
       |        AS kept_text
       |    FROM dec GROUP BY doc_id)
       |  WHERE kept_chunks > 0),
       |ev AS (
       |  SELECT doc_id, text FROM $base WHERE doc_id % $evalMod = 0),
       |cs AS (
       |  SELECT doc_id, text FROM b2 WHERE doc_id % $evalMod <> 0),
       |${shingleCtes("ev", n, "e")},
       |${shingleCtes("cs", n, "c")},
       |${if (decontam == "doc") s"""contam AS (
       |  SELECT DISTINCT c.doc_id
       |  FROM csh c JOIN (SELECT DISTINCT s FROM esh) e USING (s)),
       |b3 AS (
       |  SELECT cs.doc_id, cs.text FROM cs WHERE NOT EXISTS (
       |    SELECT 1 FROM contam x WHERE x.doc_id = cs.doc_id)),"""
        else s"""${chunkCtes("cs", width, "dx")},
       |dxbad AS (
       |  SELECT DISTINCT doc_id, idx FROM (
       |    SELECT c.doc_id,
       |      unnest(range(i // $width, (i + ${n - 1}) // $width + 1)) AS idx
       |    FROM csh c JOIN (SELECT DISTINCT s FROM esh) e USING (s))),
       |dxdec AS (
       |  SELECT h.doc_id, h.idx, h.chunk, b.idx IS NULL AS kept
       |  FROM dxhashed h LEFT JOIN dxbad b
       |    ON h.doc_id = b.doc_id AND h.idx = b.idx),
       |b3 AS (
       |  SELECT doc_id, kept_text AS text FROM (
       |    SELECT doc_id,
       |      sum(CASE WHEN kept THEN 1 ELSE 0 END) AS kept_chunks,
       |      coalesce(array_to_string(
       |        list(chunk ORDER BY idx) FILTER (WHERE kept), ' '), '')
       |        AS kept_text
       |    FROM dxdec GROUP BY doc_id)
       |  WHERE kept_chunks > 0),"""}
       |qtoks AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[^ \\t\\n\\f\\r\\x0B]+')) AS t
       |  FROM b3),
       |feats AS (
       |  SELECT doc_id, ($qh % $qmB) * 2654435761 % 2000 - 1000 AS wi
       |  FROM qtoks),
       |m AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    sum(wi) + $qmBias * count(*) AS num
       |  FROM feats GROUP BY doc_id)
       |SELECT doc_id, n_tokens FROM m WHERE num >= 0""".stripMargin
  }

  /** corpus_pipeline oracle: the whole closed-loop curation chain —
    * clean → chunk dedup (text REWRITTEN) → SemDeDup on the survivor
    * embeddings (derived geometry over the survivor subset) →
    * decontamination vs the eval split → quality-model keep →
    * token-budget fill → pack → per-shard manifest — as ONE generated
    * CTE chain sharing every constant with the Spark composition
    * ([[graft.dedup.Corpus.pipeline]]). Stage fragments are the same
    * generators the individual gates use (prefixes keep the three
    * tokenize chains apart); the semantic fragment reuses
    * [[AnnQueries]]' norm/dot/geometry SQL verbatim. */
  def pipeline(minQuality: Double = 0.3, nearDupJaccard: Double = 0.6,
      n: Int = 3, width: Int = graft.dedup.Dedup.ChunkWidth,
      evalMod: Int = 97, seqLen: Int = 256, shards: Int = 8,
      domainFloorMilli: Option[Long] = None,
      quotas: Seq[(String, Long)] = Nil,
      /** Stage D's action — `doc` (whole-doc drop, row 38) or `chunk`
        * (surgical excision, row 105's CTE fragment spliced in). */
      decontam: String = "doc"): String =
    pipelinePrefix(minQuality, nearDupJaccard, n, width, evalMod,
      domainFloorMilli, decontam) +
      (if (quotas.isEmpty) plainPackTail(seqLen, shards)
       else quotaPackTail(seqLen, shards, quotas))

  /** corpus_pipeline_ledger oracle (SURVEY row 120): the identical
    * admission-chain CTEs, tailed with the union-tagged max-level
    * disposition — every input doc, the stage that removed it or
    * 'packed'. Stage names shared with
    * [[graft.dedup.Corpus.LedgerStageNames]] by construction. */
  def pipelineLedger(minQuality: Double = 0.3,
      nearDupJaccard: Double = 0.6, n: Int = 3,
      width: Int = graft.dedup.Dedup.ChunkWidth,
      evalMod: Int = 97, decontam: String = "doc"): String = {
    val names = graft.dedup.Corpus.LedgerStageNames
    val whens = names.zipWithIndex.map { case (nm, i) =>
      s"WHEN $i THEN '$nm'" }.mkString(" ")
    pipelinePrefix(minQuality, nearDupJaccard, n, width, evalMod,
      None, decontam) +
      s"""lvl AS (
         |  SELECT doc_id, 0 AS l FROM documents
         |  UNION ALL SELECT doc_id, 1 FROM q
         |  UNION ALL SELECT doc_id, 2 FROM kept
         |  UNION ALL SELECT doc_id, 3 FROM sa
         |  UNION ALL SELECT doc_id, 4 FROM sb
         |  UNION ALL SELECT doc_id, 5 FROM sc
         |  UNION ALL SELECT doc_id, 6 FROM cs
         |  UNION ALL SELECT doc_id, 7 FROM sd
         |  UNION ALL SELECT doc_id, 8 FROM m
         |  UNION ALL SELECT doc_id, 9 FROM sel)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |  CASE max(l) $whens ELSE 'packed' END AS disposition
         |FROM lvl GROUP BY doc_id""".stripMargin
  }

  private[graft] def pipelinePrefix(minQuality: Double, nearDupJaccard: Double,
      n: Int, width: Int, evalMod: Int,
      domainFloorMilli: Option[Long], decontam: String): String = {
    val minCos = AnnQueries.SemDedupMinCos
    val qmB = graft.text.Text.QmBuckets
    val qmBias = graft.text.Text.QmBiasNum
    val qh = XHash.h60Sql("'qm:' || t")
    val sbIn = "vec_id IN (SELECT doc_id FROM sb)"
    // stage 0 (optional): the domain-blocklist CTEs — quality-model
    // numerators over the RAW corpus, rolled up by the closed-form
    // registered domain, floor applied multiplicatively
    val domainCtes = domainFloorMilli.fold("") { floor =>
      s"""dtoks AS (
         |  SELECT doc_id,
         |    unnest(regexp_extract_all(lower(text), '[^ \\t\\n\\f\\r\\x0B]+')) AS t
         |  FROM documents),
         |dagg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(($qh % $qmB) * 2654435761 % 2000 - 1000)
         |      + $qmBias * count(*) AS BIGINT) AS num
         |  FROM dtoks GROUP BY doc_id),
         |ddom AS (
         |  SELECT doc_id, ${graft.text.Urls.registeredSql("doc_id")}
         |    AS domain
         |  FROM documents),
         |dkeep AS (
         |  SELECT domain FROM ddom JOIN dagg USING (doc_id)
         |  GROUP BY domain
         |  HAVING sum(num) - ($floor) * sum(n_tokens) >= 0),
         |d0 AS (
         |  SELECT doc_id FROM ddom JOIN dkeep USING (domain)),
         |""".stripMargin
    }
    val domainWhere = if (domainFloorMilli.isDefined)
      " AND doc_id IN (SELECT doc_id FROM d0)" else ""
    s"""WITH ${domainCtes}q AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE ${qualitySql("text")} >= $minQuality$domainWhere),
       |fp AS (
       |  SELECT doc_id,
       |    md5(regexp_replace(regexp_replace(lower(text), '[ \\t\\n\\f\\r\\x0B]+', ' ', 'g'), '(^ )|( $$)', '', 'g')) AS f
       |  FROM q),
       |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
       |kept AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
       |${shingleCtes("kept", n)},
       |${minhashCtes(n, 8, 2)},
       |$jaccardCtes,
       |losers AS (
       |  SELECT DISTINCT doc_b AS doc_id FROM jac
       |  WHERE jaccard >= $nearDupJaccard),
       |sa AS (
       |  SELECT k.doc_id, k.text FROM kept k WHERE NOT EXISTS (
       |    SELECT 1 FROM losers l WHERE l.doc_id = k.doc_id)),
       |${chunkCtes("sa", width, "ck")},
       |ckw AS (
       |  SELECT h1, h2, min({'doc_id': doc_id, 'idx': idx}) AS w
       |  FROM ckhashed GROUP BY h1, h2),
       |ckdec AS (
       |  SELECT h.doc_id, h.idx, h.chunk,
       |    ({'doc_id': h.doc_id, 'idx': h.idx} = w.w) AS kept
       |  FROM ckhashed h JOIN ckw w ON h.h1 = w.h1 AND h.h2 = w.h2),
       |sb AS MATERIALIZED (
       |  SELECT doc_id, kept_text AS text FROM (
       |    SELECT doc_id,
       |      sum(CASE WHEN kept THEN 1 ELSE 0 END) AS kept_chunks,
       |      coalesce(array_to_string(
       |        list(chunk ORDER BY idx) FILTER (WHERE kept), ' '), '')
       |        AS kept_text
       |    FROM ckdec GROUP BY doc_id)
       |  WHERE kept_chunks > 0),
       |vn AS (
       |  SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
       |      ${AnnQueries.normSql}) AS vn
       |  FROM embeddings WHERE $sbIn),${AnnQueries.ivfGeomCtes(sbIn)}
       |cent AS (
       |  SELECT id AS cid, vn AS cv FROM vn, mm
       |  WHERE ${XHash.h60Sql("CAST(id AS VARCHAR)")} % mm.m = 0),
       |dists AS (
       |  SELECT vn.id, vn.vn, c.cid,
       |    ${AnnQueries.dotSql("vn.vn", "c.cv")} AS d
       |  FROM vn CROSS JOIN cent c),
       |asg AS (
       |  SELECT id, vn, cid AS cell,
       |    row_number() OVER (PARTITION BY id ORDER BY d DESC, cid DESC)
       |      AS rn
       |  FROM dists),
       |a1 AS (SELECT id, vn, cell FROM asg WHERE rn = 1),
       |dup AS (
       |  SELECT DISTINCT b.id AS id
       |  FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.id < b.id
       |  WHERE ${AnnQueries.dotSql("a.vn", "b.vn")} >= $minCos),
       |sc AS (
       |  -- un-embedded docs pass through; embedded ones drop iff they
       |  -- are a dup's higher id — exactly semanticDedup's anti-join
       |  -- (dup ⊆ embedded ids, so one NOT EXISTS covers both legs)
       |  SELECT sb.doc_id, sb.text FROM sb
       |  WHERE NOT EXISTS (SELECT 1 FROM dup d WHERE d.id = sb.doc_id)),
       |ev AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % $evalMod = 0),
       |cs AS (
       |  SELECT doc_id, text FROM sc WHERE doc_id % $evalMod <> 0),
       |${shingleCtes("ev", n, "e")},
       |${shingleCtes("cs", n, "c")},
       |${if (decontam == "doc") s"""contam AS (
       |  SELECT DISTINCT c.doc_id
       |  FROM csh c JOIN (SELECT DISTINCT s FROM esh) e USING (s)),
       |sd AS MATERIALIZED (
       |  SELECT cs.doc_id, cs.text FROM cs WHERE NOT EXISTS (
       |    SELECT 1 FROM contam x WHERE x.doc_id = cs.doc_id)),"""
        else s"""${chunkCtes("cs", width, "dx")},
       |dxbad AS (
       |  SELECT DISTINCT doc_id, idx FROM (
       |    SELECT c.doc_id,
       |      unnest(range(i // $width, (i + ${n - 1}) // $width + 1)) AS idx
       |    FROM csh c JOIN (SELECT DISTINCT s FROM esh) e USING (s))),
       |dxdec AS (
       |  SELECT h.doc_id, h.idx, h.chunk, b.idx IS NULL AS kept
       |  FROM dxhashed h LEFT JOIN dxbad b
       |    ON h.doc_id = b.doc_id AND h.idx = b.idx),
       |sd AS MATERIALIZED (
       |  SELECT doc_id, kept_text AS text FROM (
       |    SELECT doc_id,
       |      sum(CASE WHEN kept THEN 1 ELSE 0 END) AS kept_chunks,
       |      coalesce(array_to_string(
       |        list(chunk ORDER BY idx) FILTER (WHERE kept), ' '), '')
       |        AS kept_text
       |    FROM dxdec GROUP BY doc_id)
       |  WHERE kept_chunks > 0),"""}
       |qtoks AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[^ \\t\\n\\f\\r\\x0B]+')) AS t
       |  FROM sd),
       |feats AS (
       |  SELECT doc_id, ($qh % $qmB) * 2654435761 % 2000 - 1000 AS wi
       |  FROM qtoks),
       |m AS MATERIALIZED (
       |  SELECT doc_id, n_tokens,
       |    ((num + 1000 * n_tokens) * 100) // (1000 * n_tokens) AS kc
       |  FROM (
       |    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |      sum(wi) + $qmBias * count(*) AS num
       |    FROM feats GROUP BY doc_id)
       |  WHERE num >= 0),
       |bud AS (SELECT sum(n_tokens) // 2 AS budget FROM m),
       |hist AS (SELECT kc, sum(n_tokens) AS bt FROM m GROUP BY kc),
       |cum AS (
       |  SELECT kc, SUM(bt) OVER (ORDER BY kc DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM hist),
       |sel AS (
       |  SELECT m.doc_id FROM m JOIN cum USING (kc), bud
       |  WHERE cum <= budget),
       |""".stripMargin
  }

  /** The default [[pipeline]] tail: pack every selected doc, manifest
    * at the shard grain. */
  private def plainPackTail(seqLen: Int, shards: Int): String =
    s"""pt AS (
       |  SELECT sd.doc_id,
       |    ${XHash.h60Sql("CAST(sd.doc_id AS VARCHAR)")} % $shards AS shard,
       |    ${XHash.h60Sql("CAST(sd.doc_id AS VARCHAR)")} % 1000000 AS ck,
       |    CAST(len(regexp_extract_all(lower(sd.text), '[^ \\t\\n\\f\\r\\x0B]+'))
       |      AS BIGINT) AS n_toks
       |  FROM sd JOIN sel USING (doc_id)),
       |pc AS (
       |  SELECT doc_id, shard, ck, n_toks,
       |    COALESCE(SUM(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS tok_offset
       |  FROM pt)
       |SELECT CAST(shard AS BIGINT) AS shard,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(max((tok_offset + n_toks - 1) // $seqLen) + 1 AS BIGINT)
       |    AS n_seqs,
       |  CAST(sum(CASE WHEN tok_offset // $seqLen <>
       |    (tok_offset + n_toks - 1) // $seqLen THEN 1 ELSE 0 END)
       |    AS BIGINT) AS straddlers,
       |  CAST(sum(doc_id % 1000003 * ck % 1000003) AS BIGINT) AS checksum
       |FROM pc GROUP BY shard""".stripMargin

  /** The quota [[pipeline]] tail (row 92 applied to the CURATED,
    * rewritten text): per-source ordered-prefix admission against the
    * quota when-chain, then the manifest at the (shard, source)
    * grain — the corpus_pack_quota shape. */
  private def quotaPackTail(seqLen: Int, shards: Int,
      quotas: Seq[(String, Long)]): String = {
    val qcase = "CASE source " + quotas.map { case (s0, q) =>
      s"WHEN '$s0' THEN $q" }.mkString(" ") + " ELSE -1 END"
    s"""seld AS (
       |  SELECT sd.doc_id, doc.source,
       |    CAST(len(regexp_extract_all(lower(sd.text), '[^ \\t\\n\\f\\r\\x0B]+'))
       |      AS BIGINT) AS n_toks
       |  FROM sd JOIN sel USING (doc_id)
       |  JOIN documents doc USING (doc_id)),
       |qadm AS (
       |  SELECT doc_id, source, n_toks FROM (
       |    SELECT doc_id, source, n_toks,
       |      SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM seld)
       |  WHERE ($qcase) < 0 OR cum <= ($qcase)),
       |qpt AS (
       |  SELECT doc_id, source, n_toks,
       |    ${XHash.h60Sql("CAST(doc_id AS VARCHAR)")} % $shards AS shard,
       |    ${XHash.h60Sql("CAST(doc_id AS VARCHAR)")} % 1000000 AS ck
       |  FROM qadm),
       |qpc AS (
       |  SELECT doc_id, source, shard, ck, n_toks,
       |    COALESCE(SUM(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS tok_offset
       |  FROM qpt)
       |SELECT CAST(shard AS BIGINT) AS shard, source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS n_toks,
       |  CAST(sum(CASE WHEN tok_offset // $seqLen <>
       |    (tok_offset + n_toks - 1) // $seqLen THEN 1 ELSE 0 END)
       |    AS BIGINT) AS straddlers,
       |  CAST(sum(doc_id % 1000003 * ck % 1000003) AS BIGINT) AS checksum
       |FROM qpc GROUP BY shard, source""".stripMargin
  }
}

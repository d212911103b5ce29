package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * OPQ-lite structured rotation for product quantization: R = (1/√d)·H·D
 * — a deterministic ±1 diagonal (D, signs from the XHash family) then a
 * fast Walsh–Hadamard transform (H, log₂d butterfly stages), the
 * standard cheap stand-in for learned OPQ (Ge et al. CVPR'13 §4 notes
 * random rotation recovers most of OPQ's gain; H·D is the structured
 * random rotation of Andoni et al.'s cross-polytope LSH). Rotating
 * before the sub-vector split decorrelates dimensions so PQ subspaces
 * share the variance instead of one subspace carrying it.
 *
 * Exactness: every butterfly is two double adds in a FIXED association
 * order and the diagonal/scale are exact literals (±1, 1/8), so the
 * DuckDB replay ([[rotateCtes]]) is bit-identical — the rotated-PQ gate
 * needs no tolerance beyond the PQ oracle's own.
 *
 * What the rotation does and does NOT buy (measured, round 13; pinned
 * in OpqSpec): with hash-SAMPLED codebooks, H·D is EXACTLY inert for
 * any axis-aligned variance concentration — any subset of Hadamard
 * columns is orthogonal-scaled, so every subspace block A_s of the
 * rotation restricted to an axis subspace satisfies AᵀₛAₛ = I/m; the
 * per-subspace argmin over sampled codes then elects the SAME latent
 * sample in every subspace, and rotated PQ returns bit-identical top-k
 * to plain PQ (OpqSpec pins this collapse on a zero-tail fixture). On
 * per-vector-sparse fixtures the rotation INCREASES sampled-codebook
 * distortion (~1.3× measured — sampled sparse codes match sparse data
 * better than dense Gaussian data). So no recall floor separating
 * rotated from plain is pinnable at gate scale; the rotation's
 * falsifiable contract is Ge et al.'s own criterion — BALANCED
 * per-subspace variance — gated exactly by ann_rotated_balance
 * (unrotated max share ≥ 90% vs rotated max share ≤ 40%, integer
 * millionths; a no-op rotation fails the 40% arm).
 *
 * Scale shape: d·log d adds per row, all inside one chain of projected
 * columns (each stage references the PREVIOUS stage's named column, so
 * the expression tree stays linear — no 3^stages blowup); no shuffle,
 * no UDF. The signs are compile-time constants; nothing is learned, so
 * the "codebook" story is unchanged — a 100 TB corpus rotates in the
 * same pass that normalizes.
 */
object Opq {

  /** Embedding width this rotation is generated for (the corpus's). */
  val Dim = 64

  /** log₂(Dim) butterfly stages. */
  val Stages = 6

  /** 1/√Dim — exact in binary (2⁻³). */
  val Scale = 0.125

  /** The ±1 diagonal: parity of the pure-JVM mirror of
    * XHash.h60("opq:<i>") — the same md5-hex-chars-1-15 definition the
    * SQL family uses, so the provenance is the house hash, while both
    * engines consume the resulting literals. */
  val signs: IndexedSeq[Double] = (0 until Dim).map { i =>
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"opq:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1.0
    else -1.0
  }

  private def stageExpr(cur: Column, bit: Int): Column =
    transform(cur, (_, i) =>
      when(i.bitwiseAND(lit(bit)) === lit(0),
        element_at(cur, i + 1) + element_at(cur, i.bitwiseXOR(lit(bit)) + 1))
        .otherwise(
          element_at(cur, i.bitwiseXOR(lit(bit)) + 1) - element_at(cur, i + 1)))

  /**
   * Rotate `vecCol` (array&lt;float&gt;, width [[Dim]]) in place; the
   * result is the scaled rotated DOUBLE array (kept double so the SQL
   * replay shares every bit — a float round-trip would fork the two
   * engines' roundings). Runs as ONE fused native expression
   * ([[graft.functions.OpqRotate]], whole-stage codegen'd) — the six
   * chained `transform` lambdas it replaces re-entered the lambda
   * interpreter per stage per element, the §6.6 hot-path shape; the
   * expression raises the same loud error on a non-[[Dim]] corpus the
   * old assert_true guard did. [[rotatedHof]] keeps the composed-HOF
   * formulation as the bit-equality reference (OpqSpec pins the two
   * paths identical, and the DuckDB replay [[rotateCtes]] mirrors the
   * HOF form stage for stage).
   */
  def rotated(corpus: DataFrame, vecCol: String = "embedding"): DataFrame =
    corpus.withColumn(vecCol, org.apache.spark.sql.graft.bridge.column(
      graft.functions.OpqRotate(
        org.apache.spark.sql.graft.bridge.expression(col(vecCol)),
        signs.toArray, Scale)))

  /** The composed-builtin twin of [[rotated]] (six chained transform
    * stages) — retained as the native expression's bit-equality
    * reference, not used in any hot path. */
  private[graft] def rotatedHof(corpus: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val sg = lit(signs.toArray)
    // a narrower vector would silently yield nulls past the array end,
    // so a mismatched corpus must error loudly, per row, in the same
    // projected expression (a separate guard column could be pruned)
    val guard = assert_true(size(col(vecCol)) === lit(Dim),
      concat(lit(s"Opq.rotated: $vecCol must be exactly $Dim-dim, got "),
        size(col(vecCol)).cast("string")))
    var df = corpus.withColumn("__opq",
      when(guard.isNull,
        transform(col(vecCol), (x, i) =>
          x.cast("double") * element_at(sg, i + 1))))
    for (k <- 0 until Stages)
      df = df.withColumn("__opq", stageExpr(col("__opq"), 1 << k))
    df.withColumn(vecCol, transform(col("__opq"), x => x * lit(Scale)))
      .drop("__opq")
  }

  /** The DuckDB replay: CTEs `opq0`..`opq<Stages>` rotating `vecExpr`
    * of relation `base` (carrying `id`), ending in `opqr` =
    * (id, r: the scaled rotated double list). */
  def rotateCtes(base: String, vecExpr: String): String = {
    val sg = signs.map(s => if (s > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]")
    val stages = (0 until Stages).map { k =>
      val bit = 1 << k
      s"""opq${k + 1} AS (
         |  SELECT id, list_transform(range(0, $Dim), i ->
         |    CASE WHEN (i & $bit) = 0
         |    THEN r[i + 1] + r[xor(i, $bit) + 1]
         |    ELSE r[xor(i, $bit) + 1] - r[i + 1] END) AS r
         |  FROM opq$k)""".stripMargin
    }.mkString(",\n")
    s"""opq0 AS (
       |  SELECT id, list_transform(range(0, $Dim), i ->
       |    CAST($vecExpr[i + 1] AS DOUBLE) * ($sg)[i + 1]) AS r
       |  FROM $base),
       |$stages,
       |opqr AS (
       |  SELECT id, list_transform(r, x -> x * $Scale) AS r
       |  FROM opq$Stages)""".stripMargin
  }
}

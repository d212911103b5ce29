package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Row-level kernel shared by interpreted eval and generated code. */
object MinHashSigUtil {
  /** The k-member MinHash signature of a shingle array in one tight
    * loop: per shingle ONE md5 digest ([[Md5PairUtil]]'s (h1, h2)
    * split), then the Kirsch–Mitzenmacher family
    * `(h1 + i·h2) & mask60` folded into k running minima —
    * bit-identical to min-aggregating [[XHash.member]] columns over
    * shingle rows (the batch formulation), and to the HOF
    * `array_min(transform(...))` form, but ~50× cheaper than either
    * evaluated per row: the HOF interpreter re-evaluates the digest
    * pipeline per (member, shingle) pair, this digests each shingle
    * once. */
  def sig(shingles: ArrayData, k: Int): ArrayData = {
    // no shingles -> no signature (NULL): a zero-token doc must not
    // get the md5("")-derived signature every other empty doc shares
    if (shingles.numElements() == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var j = 0
    val n = shingles.numElements()
    while (j < n) {
      fold(md, shingles.getUTF8String(j).getBytes, mins, k)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** md5 one shingle's bytes and fold its Kirsch–Mitzenmacher members
    * into the running minima. */
  private def fold(md: java.security.MessageDigest, bytes: Array[Byte],
      mins: Array[Long], k: Int): Unit = {
    md.reset()
    val d = md.digest(bytes)
    var hi = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
    var lo = 0L
    i = 8
    while (i < 16) { lo = (lo << 8) | (d(i) & 0xffL); i += 1 }
    val h1 = hi >>> 4
    val h2 = lo >>> 8
    i = 0
    while (i < k) {
      val m = if (i == 0) h1 else (h1 + h2 * i) & XHash.Mask60
      if (m < mins(i)) mins(i) = m
      i += 1
    }
  }

  /** [[sig]] with the SHINGLING fused in: takes the raw token array
    * (a codegen'd `split`) and digests each n-token window directly —
    * the window bytes are the tokens' UTF-8 bytes joined on 0x20,
    * byte-identical to `concat_ws(" ", slice(...))`, and fewer-than-n
    * tokens digest as one all-tokens window, byte-identical to
    * [[graft.dedup.Dedup.shingles]]' short arm. Shingle DEDUP is
    * irrelevant here (min over the multiset == min over the set). This
    * exists because the shingle-array HOF (transform + concat_ws in the
    * lambda interpreter) costs ~1 ms/doc — 25× this whole kernel — and
    * the admission path runs it per arriving row. */
  def sigTokens(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val cnt = tokens.numElements()
    if (cnt == 0) return null // the [[sig]] zero-shingle contract
    val mins = Array.fill(k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    def windowBytes(from: Int, len: Int): Array[Byte] = {
      var total = if (len > 0) len - 1 else 0
      var i = from
      while (i < from + len) { total += tokens.getUTF8String(i).numBytes(); i += 1 }
      val out = new Array[Byte](total)
      var pos = 0
      i = from
      while (i < from + len) {
        if (i > from) { out(pos) = ' '.toByte; pos += 1 }
        val b = tokens.getUTF8String(i).getBytes
        System.arraycopy(b, 0, out, pos, b.length)
        pos += b.length
        i += 1
      }
      out
    }
    if (cnt < n) fold(md, windowBytes(0, cnt), mins, k)
    else {
      var i = 0
      while (i + n <= cnt) { fold(md, windowBytes(i, n), mins, k); i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** The `bits`-wide SimHash of a token array in one pass: per token
    * one md5 (the h1 = first-8-bytes >>> 4 slice, exactly
    * [[XHash.h60]]), per-bit counts, bit j set iff count·2 > n —
    * bit-identical to the per-bit SUM aggregation over exploded token
    * rows. `null` (boxed) on zero tokens. */
  def simhashOrNull(tokens: ArrayData, bits: Int): java.lang.Long = {
    val n = tokens.numElements()
    if (n == 0) return null
    val counts = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var j = 0
    while (j < n) {
      md.reset()
      val d = md.digest(tokens.getUTF8String(j).getBytes)
      var hi = 0L
      var i = 0
      while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
      val h1 = hi >>> 4
      i = 0
      while (i < bits) {
        if (((h1 >> i) & 1L) == 1L) counts(i) += 1
        i += 1
      }
      j += 1
    }
    var sim = 0L
    var i = 0
    while (i < bits) {
      if (counts(i) * 2L > n) sim |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(sim)
  }

  /** The 1-based CDC cut positions of a token array in one pass (r19):
    * a cut falls between positions p and p+1 iff
    * h60(md5(token_p ⊔ ' ' ⊔ token_{p+1})) ≡ 0 (mod avgWidth) — the
    * byte stream is exactly `concat_ws(" ", t_p, t_{p+1})`, so the
    * positions are bit-identical to the interpreted
    * `filter(sequence(1, n-1), p -> h60(...) % avg == 0)` HOF this
    * replaces (one md5 per adjacent pair either way; the HOF paid the
    * lambda interpreter + expression re-evaluation per position).
    * Empty (never null) for n ≤ 1. */
  def cdcCuts(tokens: ArrayData, avgWidth: Int): ArrayData = {
    val n = tokens.numElements()
    if (n <= 1)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var p = 1
    while (p < n) {
      val a = tokens.getUTF8String(p - 1).getBytes
      val b = tokens.getUTF8String(p).getBytes
      val bytes = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, bytes, 0, a.length)
      bytes(a.length) = ' '.toByte
      System.arraycopy(b, 0, bytes, a.length + 1, b.length)
      md.reset()
      val d = md.digest(bytes)
      var hi = 0L
      var i = 0
      while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
      if (((hi >>> 4) % avgWidth) == 0L) out += p
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** The n-gram shingle STRINGS of a token array, slot-ordered with
    * duplicates kept (one window per slot; fewer-than-n tokens yield
    * the single all-tokens window) — byte-identical to the exploded
    * `concat_ws(" ", slice(toks, i+1, n))` formulation, built in one
    * kernel pass instead of one codegen'd slice+concat per slot row.
    * Feeds the batch dedup family (jaccard / spans / decontam /
    * bucket-stats) the way [[sigTokens]] feeds the signature path. */
  def windows(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    def windowOf(from: Int, len: Int): org.apache.spark.unsafe.types.UTF8String = {
      var total = if (len > 0) len - 1 else 0
      var i = from
      while (i < from + len) { total += tokens.getUTF8String(i).numBytes(); i += 1 }
      val out = new Array[Byte](total)
      var pos = 0
      i = from
      while (i < from + len) {
        if (i > from) { out(pos) = ' '.toByte; pos += 1 }
        val b = tokens.getUTF8String(i).getBytes
        System.arraycopy(b, 0, out, pos, b.length)
        pos += b.length
        i += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
    }
    if (cnt == 0) {
      // a zero-token document has NOTHING to shingle: emitting the ""
      // window made every empty/whitespace doc a near-dup candidate of
      // every other and diverged from the oracle's empty list (the
      // FuzzCorpus gate). Exact dedup still groups empty docs.
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    } else if (cnt < n) {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](windowOf(0, cnt)))
    } else {
      val slots = cnt - n + 1
      val arr = new Array[Any](slots)
      var i = 0
      while (i < slots) { arr(i) = windowOf(i, n); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }
  }
}

/**
 * graft_cdc_cuts(tokens, avgWidth) → array<int>: the content-defined
 * chunking cut positions as one native kernel call (r19) —
 * bit-identical to the interpreted `filter(sequence(...))` HOF form
 * (DedupSpec pins it); see [[MinHashSigUtil.cdcCuts]]. The CDC family
 * (batch, incremental, streaming probes) stages this as its own
 * projection attribute, exactly as before.
 */
case class CdcCuts(child: Expression, avgWidth: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigUtil.cdcCuts(input.asInstanceOf[ArrayData], avgWidth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigUtil.cdcCuts($c, $avgWidth);")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

/**
 * graft_simhash_sig(tokens, bits) → bigint: the whole `bits`-wide
 * SimHash of one document's token array as a single native expression
 * (r19): per token ONE md5 digest ([[MinHashSigUtil.fold]]'s h1 slice),
 * per-bit counters, majority vote. Bit-identical to the explode +
 * per-bit SUM-column aggregation it replaces in
 * [[graft.dedup.Dedup.simhashTable]] (DedupSpec pins it) — but ONE
 * corpus pass with no repartition, no explode, and no 61-aggregate
 * shuffle, the [[ShingleMinHashSig]] move applied to the SimHash
 * family. NULL on zero tokens (such docs had no exploded rows before —
 * the table form filters them, keeping the population identical).
 */
case class SimHashSig(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_sig"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigUtil.simhashOrNull(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("simhashRes")
      s"""Object $r = graft.functions.MinHashSigUtil.simhashOrNull($c, $bits);
         |${ev.isNull} = $r == null;
         |${ev.value} = ${ev.isNull} ? -1L
         |  : ((java.lang.Long) $r).longValue();""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/**
 * graft_minhash_sig(shingles, k) → array<bigint>: the whole k-member
 * MinHash signature of one document's shingle array as a single native
 * expression — the per-ROW formulation the stateless streaming
 * admission path needs (the batch path min-aggregates member columns
 * over exploded shingle rows, a shuffle; a streaming probe row must
 * carry its signature without one). Values are bit-identical to the
 * batch aggregation (StreamDedupSpec pins it).
 */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigUtil.sig(input.asInstanceOf[ArrayData], k)

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MinHashSigUtil.sig($c, $k);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/**
 * graft_shingle_minhash_sig(tokens, n, k) → array<bigint>:
 * [[MinHashSig]] with the n-gram SHINGLING fused into the kernel — the
 * child is the raw whitespace token array (a codegen'd `split`), so the
 * interpreted higher-order shingle construction (≈1 ms/document, 25×
 * the digest cost) never runs. Bit-identical to
 * `MinHashSig(Dedup.shingles(text), k)` (DedupSpec pins it, window
 * bytes == concat_ws(" ", ...) bytes by construction).
 */
case class ShingleMinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigUtil.sigTokens(input.asInstanceOf[ArrayData], n, k)

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MinHashSigUtil.sigTokens($c, $n, $k);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): ShingleMinHashSig =
    copy(child = newChild)
}

/**
 * graft_shingle_windows(tokens, n) → array<string>: the n-gram shingle
 * strings of a token array, slot-ordered, duplicates kept — the
 * GENERATOR half of the fused-shingling move ([[ShingleMinHashSig]] is
 * the signature half): the batch dedup family explodes these rows for
 * jaccard / spans / decontamination / bucket stats, and building the
 * whole window array in one kernel pass replaces a codegen'd
 * slice+concat_ws per exploded slot (which re-reads the token array
 * and re-allocates per row). Bit-identical to
 * `concat_ws(" ", slice(toks, i+1, n))` per slot and to
 * [[graft.dedup.Dedup.shingles]]' short arm (DedupSpec pins both).
 */
case class ShingleWindows(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_windows"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigUtil.windows(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigUtil.windows($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleWindows =
    copy(child = newChild)
}

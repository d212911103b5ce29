package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row kernel for [[WsTokens]]. */
object WsTokensUtil {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C ||
      b == 0x0D

  /** The non-whitespace RUNS of `s` — byte-scan over the UTF-8 buffer.
    * Exactly `regexp_extract_all(s, '[^ \t\n\f\r\x0B]+')`: the class is
    * pure ASCII and UTF-8 continuation/lead bytes of multi-byte
    * codepoints never collide with ASCII values, so a byte comparison
    * IS the codepoint comparison. Empty/whitespace-only input yields
    * an EMPTY array (the engine-wide zero-token contract). ~10× the
    * throughput of the regex engine on the tokenize-everything hot
    * paths (lexicon builds, chunking, quotas — the round-17 bench
    * regression this replaced). */
  def tokens(s: UTF8String): GenericArrayData = {
    val n = s.numBytes()
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.getByte(i))) i += 1
      val start = i
      while (i < n && !isWs(s.getByte(i))) i += 1
      if (i > start) out.add(sub(s, start, i))
    }
    new GenericArrayData(out.toArray)
  }

  private def sub(s: UTF8String, from: Int, until: Int): UTF8String = {
    val bytes = new Array[Byte](until - from)
    var j = 0
    while (j < bytes.length) { bytes(j) = s.getByte(from + j); j += 1 }
    UTF8String.fromBytes(bytes)
  }
}

/**
 * graft_ws_tokens(text) → array&lt;string&gt;: whitespace tokenization as
 * ONE native codegen'd kernel — the engine's hottest text primitive
 * (every shingle, chunk, posting, quota and quality pass starts here).
 * Byte-identical to `regexp_extract_all(text, '[^ \t\n\f\r\x0B]+')`
 * (TextSpec pins it), which remains the ORACLE-side rendering.
 */
case class WsTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ws_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WsTokensUtil.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WsTokensUtil.tokens($c);")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

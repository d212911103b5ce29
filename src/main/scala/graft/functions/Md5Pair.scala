package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-level helper shared by interpreted eval and generated code. */
object Md5PairUtil {
  /** [h1, h2]: top 60 bits of md5 bytes 0-7, and the 56 bits of bytes
    * 8-14 — numerically identical to parsing hex chars 1-15 / 17-30 of
    * the md5 hex string ([[XHash.h60]]/[[XHash.h56]]), without the hex
    * round-trip or a second digest. */
  def pair(bytes: Array[Byte]): ArrayData = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var hi = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
    var lo = 0L
    i = 8
    while (i < 16) { lo = (lo << 8) | (d(i) & 0xffL); i += 1 }
    new GenericArrayData(Array[Any](hi >>> 4, lo >>> 8))
  }
}

/**
 * md5_pair(s) → array<bigint> [h1, h2]: ONE md5 digest per row yielding
 * both [[XHash]] family seeds. The conv(substring(md5-hex)) formulation
 * costs two digests plus two hex→decimal string parses per row — in the
 * dedup hot path (one hash per shingle/token) that was the dominant
 * per-row cost. Deterministic, so whole-stage codegen's subexpression
 * elimination collapses h60(s)+h56(s) into a single evaluation.
 */
case class Md5Pair(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string or binary, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_pair"

  private def isString = child.dataType == StringType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes =
      if (isString) input.asInstanceOf[UTF8String].getBytes
      else input.asInstanceOf[Array[Byte]]
    Md5PairUtil.pair(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = if (isString) s"$c.getBytes()" else c
      s"${ev.value} = graft.functions.Md5PairUtil.pair($bytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Pair =
    copy(child = newChild)
}

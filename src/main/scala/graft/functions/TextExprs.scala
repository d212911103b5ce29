package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-level helpers shared by interpreted eval and generated code. */
object TextExprUtil {
  private final val Mod = 1000000007L

  /**
   * Polynomial rolling hash over the code points of `s`:
   * acc = (acc * 131 + codepoint) mod 1e9+7, left-to-right — numerically
   * identical to the aggregate()-over-split("") HOF formulation it
   * replaces (and to a SQL list_reduce over regexp_extract_all(s, '.')).
   * ASCII fast path walks the UTF-8 bytes directly; any multi-byte
   * sequence falls back to a codepoint walk of the decoded string.
   */
  def rollingHash(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { acc = (acc * 131L + b) % Mod; i += 1 }
      else return rollingHashUnicode(s.toString, acc0 = 0L) // restart: mixed doc
    }
    acc
  }

  private def rollingHashUnicode(str: String, acc0: Long): Long = {
    var acc = acc0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 131L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Count of non-null array elements contained in `set`. */
  def countInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

/**
 * graft_rolling_hash(s) → bigint. Native replacement for the
 * aggregate()/split("") HOF chain (SURVEY §6.5: HOF lambdas run in the
 * expression interpreter per element — per CHARACTER here, a ~10×
 * constant-factor tax on a 100 TB scan). One virtual call per row; the
 * per-character loop is tight JVM code.
 */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    TextExprUtil.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExprUtil.rollingHash($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/**
 * graft_count_in_set(arr) → int: how many elements of a string array are
 * members of a fixed vocabulary. Native replacement for
 * size(filter(arr, x => x.isInCollection(words))) — the filter() lambda
 * runs interpreted per TOKEN, and builds a filtered copy of the array
 * only to take its size. Here: one hash-set probe per token, no copy.
 * Null elements don't count (the filter-predicate-null semantics of the
 * HOF it replaces).
 */
case class ArrayCountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TextExprUtil.countInSet(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExprUtil.countInSet($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayCountInSet =
    copy(child = newChild)
}

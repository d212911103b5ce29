package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.bridge

import graft.functions.{ArrayDotProduct, ArrayL2Norm, Md5Pair}

/**
 * SparkSessionExtensions injector: exposes graft's native expressions and
 * bucketizers to SQL. Install with
 * `spark.sql.extensions=graft.GraftExtensions` (config) or
 * `builder.withExtensions(new GraftExtensions)`; for an existing session
 * use [[GraftExtensions.register]].
 *
 * SQL surface:
 *   graft_dot(a, b)         native codegen'd dot product (ArrayDotProduct)
 *   graft_l2norm(a)         native codegen'd L2 norm (ArrayL2Norm)
 *   graft_cosine(a, b)      dot / (|a|·|b|)
 *   graft_quantize(x)       power-of-two histogram bucket
 *   graft_lquantize(x, s)   linear bucket of width s (s a literal)
 *   graft_md5_pair(s)       [h1, h2] cross-engine hash-family seeds
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(e.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  // Catalyst trees for the bucketizers, mirroring graft.functions.quantize
  // / lquantize. Built directly from expression nodes: a Column round-trip
  // would produce a deferred ColumnNodeExpression that the registry can't
  // evaluate.
  private def quantizeExpr(c: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    val cd = Cast(c, org.apache.spark.sql.types.DoubleType)
    val top = 1L << 62
    val b = Cast(Pow(Literal(2.0), Floor(Log2(cd))),
      org.apache.spark.sql.types.LongType)
    // same overshoot correction + top-bucket clamp as
    // graft.functions.quantize — the two surfaces must agree
    CaseWhen(Seq(
      (IsNull(c), Cast(Literal(null), org.apache.spark.sql.types.LongType)),
      (LessThan(cd, Literal(1.0)), Literal(0L)),
      (GreaterThanOrEqual(cd, Literal(top.toDouble)), Literal(top)),
      (GreaterThan(Cast(b, org.apache.spark.sql.types.DoubleType), cd),
        ShiftRight(b, Literal(1)))),
      Some(b))
  }

  private def lquantizeExpr(c: Expression, step: Double): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    // label type follows the step, mirroring functions.lquantize: an
    // integral step yields BIGINT labels; a fractional step keeps the
    // exact floor multiple as DOUBLE (the long cast truncates in Spark
    // but rounds in SQL engines — QueryFuzzSpec's seed-19 find)
    val m = Multiply(Floor(Divide(
      Cast(c, org.apache.spark.sql.types.DoubleType),
      Literal(step))), Literal(step))
    if (step == step.longValue().toDouble)
      Cast(m, org.apache.spark.sql.types.LongType)
    else m
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays"),
      args => ArrayDotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_l2norm"),
      info("graft_l2norm", "graft_l2norm(a) - L2 norm of a numeric array"),
      args => ArrayL2Norm(args.head)),
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity"),
      args => org.apache.spark.sql.catalyst.expressions.Divide(
        ArrayDotProduct(args(0), args(1)),
        org.apache.spark.sql.catalyst.expressions.Multiply(
          ArrayL2Norm(args(0)), ArrayL2Norm(args(1))))),
    (FunctionIdentifier("graft_quantize"),
      info("graft_quantize", "graft_quantize(x) - power-of-two bucket"),
      args => quantizeExpr(args.head)),
    (FunctionIdentifier("graft_lquantize"),
      info("graft_lquantize", "graft_lquantize(x, step) - linear bucket"),
      args => lquantizeExpr(args(0), args(1).eval(null).toString.toDouble)),
    (FunctionIdentifier("graft_md5_pair"),
      info("graft_md5_pair",
        "graft_md5_pair(s) - [h1, h2] md5-derived 60/56-bit hash seeds"),
      args => Md5Pair(args.head))
  )

  /** Register the same functions into an already-built session. */
  def register(spark: SparkSession): Unit = all.foreach { case (id, fi, b) =>
    spark.sessionState.functionRegistry.registerFunction(id, fi, b)
  }
}

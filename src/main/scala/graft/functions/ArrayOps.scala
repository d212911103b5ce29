package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the vector-math hot path.
 *
 * Spark's higher-order functions (zip_with/aggregate) evaluate their
 * lambdas in the interpreter — fine for a per-row pass, ruinous for the
 * quadratic pairwise stages of ANN/dedup. These expressions generate a
 * tight primitive loop via doGenCode (and stay inside whole-stage
 * codegen), with an interpreted eval fallback that computes the identical
 * strict left-to-right double arithmetic, so results are bit-identical to
 * the HOF formulation.
 *
 * Accepts array<double>, array<float>, and integral element types
 * (tinyint…bigint — quantized embeddings); every element is widened per
 * element to double (exact for float and for integers below 2^53).
 * NULL array → NULL; NULL elements contribute 0.
 */
private[graft] object ArrayOps {
  def accepts(t: DataType): Boolean = t match {
    case ArrayType(DoubleType | FloatType, _) => true
    case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
    case _ => false
  }

  def check(name: String, children: Seq[Expression]): TypeCheckResult =
    children.find(c => !accepts(c.dataType)) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$name expects an array of numeric elements, got ${bad.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  def getter(et: DataType, arr: String, i: String): String = et match {
    case DoubleType  => s"$arr.getDouble($i)"
    case FloatType   => s"((double) $arr.getFloat($i))"
    case ByteType    => s"((double) $arr.getByte($i))"
    case ShortType   => s"((double) $arr.getShort($i))"
    case IntegerType => s"((double) $arr.getInt($i))"
    case LongType    => s"((double) $arr.getLong($i))"
    case other       => throw new IllegalStateException(s"bad element: $other")
  }

  def get(et: DataType, arr: ArrayData, i: Int): Double = et match {
    case DoubleType  => arr.getDouble(i)
    case FloatType   => arr.getFloat(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case other       => throw new IllegalStateException(s"bad element: $other")
  }

  def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
}

/** dot(a, b) = Σ a_i * b_i over the common prefix, in sequential double
  * precision. */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  import ArrayOps._

  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, children)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (et1, et2) = (elementType(left), elementType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += get(et1, x, i) * get(et2, y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (et1, et2) = (elementType(left), elementType(right))
      val (n, i, s) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("s"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ${getter(et1, a, i)} * ${getter(et2, b, i)};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** l2norm(a) = sqrt(Σ a_i²) in sequential double precision. */
case class ArrayL2Norm(child: Expression)
    extends UnaryExpression {
  import ArrayOps._

  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, children)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val et = elementType(child)
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i)) { val v = get(et, x, i); s += v * v }
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val et = elementType(child)
      val (i, s, v) = (ctx.freshName("i"), ctx.freshName("s"), ctx.freshName("v"))
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = ${getter(et, a, i)};
         |    $s += $v * $v;
         |  }
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayL2Norm =
    copy(child = newChild)
}

/**
 * Symmetric int8 quantization of a numeric array in ONE fused codegen'd
 * pass: mx = max |a_i|, scale = 127.0 / max(mx, 1e-30), q_i =
 * (byte) floor(a_i * scale + 0.5) — the exact arithmetic (and
 * association: scale is computed once, then multiplied) of the
 * array_max/transform HOF formulation it replaces, which ran the
 * expression interpreter per ELEMENT twice per vector (§6.5) and made
 * int8 brute-force search slower than full-precision. NULL array →
 * NULL; NULL elements stay NULL in the output (as with transform()),
 * and a NaN element poisons the whole vector to zeros exactly as the
 * HOF's NaN-propagating array_max does.
 */
case class ArrayQuantize8(child: Expression) extends UnaryExpression {
  import ArrayOps._

  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, children)
  override def dataType: DataType = ArrayType(ByteType, containsNull = true)
  override def prettyName: String = "graft_quantize8"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val et = elementType(child)
    val n = x.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        // NaN propagates as the max, matching array_max's ordering (NaN
        // sorts greatest) — sc and every output then follow the HOF path
        // (NaN arithmetic → cast to 0)
        val v = math.abs(get(et, x, i))
        if (v > mx || v.isNaN) mx = v
      }
      i += 1
    }
    val sc = 127.0 / math.max(mx, 1e-30)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!x.isNullAt(i))
        out(i) = math.floor(get(et, x, i) * sc + 0.5).toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val et = elementType(child)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val sc = ctx.freshName("sc")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = java.lang.Math.abs(${getter(et, a, i)});
         |    if ($v > $mx || java.lang.Double.isNaN($v)) $mx = $v;
         |  }
         |}
         |double $sc = 127.0 / java.lang.Math.max($mx, 1e-30);
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = java.lang.Byte.valueOf(
         |      (byte) java.lang.Math.floor(${getter(et, a, i)} * $sc + 0.5));
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ArrayQuantize8 = copy(child = newChild)
}

/**
 * The OPQ-lite structured rotation (1/√d)·H·D of graft.ann.Opq in ONE
 * fused codegen'd pass: sign flip by the deterministic ±1 diagonal,
 * log₂d in-register Walsh–Hadamard butterfly stages over two swap
 * buffers, final exact 2⁻ᵏ scale — replacing the six chained
 * `transform` lambdas that re-entered the expression interpreter per
 * stage per element (SURVEY §6.6's banned hot-path shape; the rotate
 * pass runs on EVERY corpus row at 100 TB). Arithmetic is the HOF
 * chain's, operand for operand — (i&bit)==0 ? a[i]+a[i^bit] :
 * a[i^bit]-a[i], fixed association — so results are bit-identical
 * (OpqSpec pins equality against the retained HOF twin).
 *
 * Contract (loud, not silent): the width must equal `signs.length`
 * (the rotation is generated for the corpus width) and elements must
 * be non-null — a mismatched corpus throws per row with the same
 * message the assert_true guard raised.
 */
case class OpqRotate(child: Expression, signs: Array[Double],
    scale: Double) extends UnaryExpression {
  import ArrayOps._

  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, children)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_opq_rotate"

  private def stages: Int = Integer.numberOfTrailingZeros(signs.length)

  override protected def nullSafeEval(av: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val et = elementType(child)
    val d = signs.length
    if (x.numElements() != d) throw new IllegalArgumentException(
      s"Opq.rotated: input must be exactly $d-dim, got ${x.numElements()}")
    var a = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (x.isNullAt(i)) throw new IllegalArgumentException(
        s"Opq.rotated: null element at $i")
      a(i) = get(et, x, i) * signs(i)
      i += 1
    }
    var k = 0
    while (k < stages) {
      val bit = 1 << k
      val b = new Array[Double](d)
      i = 0
      while (i < d) {
        b(i) = if ((i & bit) == 0) a(i) + a(i ^ bit) else a(i ^ bit) - a(i)
        i += 1
      }
      a = b
      k += 1
    }
    i = 0
    while (i < d) { a(i) *= scale; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val et = elementType(child)
      val d = signs.length
      val sg = ctx.addReferenceObj("opqSigns", signs, "double[]")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val bit = ctx.freshName("bit")
      s"""
         |if ($x.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "Opq.rotated: input must be exactly $d-dim, got "
         |      + $x.numElements());
         |}
         |double[] $a = new double[$d];
         |double[] $b = new double[$d];
         |for (int $i = 0; $i < $d; $i++) {
         |  if ($x.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "Opq.rotated: null element at " + $i);
         |  }
         |  $a[$i] = ${getter(et, x, i)} * $sg[$i];
         |}
         |for (int $k = 0; $k < $stages; $k++) {
         |  int $bit = 1 << $k;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $b[$i] = (($i & $bit) == 0)
         |      ? $a[$i] + $a[$i ^ $bit] : $a[$i ^ $bit] - $a[$i];
         |  }
         |  double[] $t = $a; $a = $b; $b = $t;
         |}
         |for (int $i = 0; $i < $d; $i++) { $a[$i] *= $scale; }
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($a);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): OpqRotate = copy(child = newChild)
}

/**
 * graft_dot_batch(v) → array<double>: the dot of one corpus vector
 * against EVERY row of a plan-carried query matrix, in one kernel —
 * the batch-serving shape for a ground-truth scoring pass over many
 * queries. The per-pair alternative (BroadcastNestedLoopJoin against
 * the query table, then ArrayDotProduct) materializes |corpus|×|queries|
 * joined rows each carrying TWO full vectors before the dot projects
 * them away — measured ~20 s for 200 queries × the sf0.1 corpus, vs
 * well under a second here. Per query row the accumulation order and
 * null handling are IDENTICAL to [[ArrayDotProduct]] (sequential i,
 * null elements contribute 0, common-prefix length), so scores are
 * bit-identical to the join formulation (RetrievalSpec pins it).
 * The matrix is eval-bounded by construction (collected query vectors
 * — the ANN-LUT bounded-collect argument); the corpus side never
 * collects.
 */
case class ArrayDotBatch(child: Expression, queries: Seq[Seq[Double]])
    extends UnaryExpression {
  import ArrayOps._

  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, children)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_dot_batch"

  @transient private lazy val mat: Array[Array[Double]] =
    queries.map(_.toArray).toArray

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val et = elementType(child)
    val res = new Array[Double](mat.length)
    var j = 0
    while (j < mat.length) {
      val q = mat(j)
      val n = math.min(x.numElements(), q.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i)) s += get(et, x, i) * q(i)
        i += 1
      }
      res(j) = s
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val et = elementType(child)
      val m = ctx.addReferenceObj("dotBatchMat", mat, "double[][]")
      val res = ctx.freshName("res")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val q = ctx.freshName("q")
      s"""
         |double[] $res = new double[$m.length];
         |for (int $j = 0; $j < $m.length; $j++) {
         |  double[] $q = $m[$j];
         |  int $n = java.lang.Math.min($x.numElements(), $q.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$x.isNullAt($i)) { $s += ${getter(et, x, i)} * $q[$i]; }
         |  }
         |  $res[$j] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($res);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ArrayDotBatch = copy(child = newChild)
}

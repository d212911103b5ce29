package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.filter.{And, Cmp, Or, Pred}

/** Property-based checks (bare scalacheck driven from funsuite). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ---- AttrParser: render → parse round trip ----

  private val nameGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val specGen: Gen[FieldSpec] = for {
    name <- nameGen
    field <- nameGen
    isDate <- Gen.oneOf(true, false)
    aggr <- Gen.oneOf(None, Some("quantize"), Some("lquantize"))
    step <- Gen.choose(1, 100000)
  } yield FieldSpec(name, field, isDate, aggr,
    if (aggr.contains("lquantize")) Some(step.toDouble) else None)

  private def render(fs: FieldSpec): String = {
    val attrs = Seq(
      if (fs.isDate) Some("date") else None,
      if (fs.field != fs.name) Some(s"field=${fs.field}") else None,
      fs.aggr.map(a => s"aggr=$a"),
      fs.step.map(s => s"step=${s.toLong}")).flatten
    if (attrs.isEmpty) fs.name else s"${fs.name}[${attrs.mkString(",")}]"
  }

  test("attr syntax round-trips through the parser") {
    check(Prop.forAll(Gen.nonEmptyListOf(specGen)) { specs =>
      AttrParser.parse(specs.map(render).mkString(",")) == specs
    })
  }

  // ---- bucketizer invariants over a real Spark evaluation ----

  test("quantize: v lands in [bucket, 2*bucket) for v >= 1; v < 1 in 0") {
    // per-test seed: reproduces under testOnly -z as well as full runs
    val rng = new scala.util.Random(20260812L)
    // uniform samples at several magnitudes PLUS every power-of-two
    // boundary up to 2^62 and the saturation window below 2^63 — the
    // 2^k-1 cases are where double log2 rounding overshoots without the
    // halving correction; near Long.MaxValue pow(2,63) saturates
    val vals = ((1 to 1000).map(_ => rng.nextLong(1L << 62)) ++
      (0 to 62).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1)) ++
      Seq(Long.MaxValue, Long.MaxValue - 511, (1L << 62) + 1))
      .filter(_ >= 0).toDF("v")
    val rows = vals.select(col("v"),
      graft.functions.quantize(col("v")).as("b")).collect()
    rows.foreach { r =>
      val (v, b) = (r.getLong(0), r.getLong(1))
      if (v < 1) assert(b == 0)
      else assert(b <= v && BigInt(v) < BigInt(b) * 2 &&
        java.lang.Long.bitCount(b) == 1, s"v=$v b=$b")
    }
  }

  test("lquantize: bucket <= v < bucket + step, bucket multiple of step") {
    val step = 250
    val rng = new scala.util.Random(20260813L)
    val vals = (1 to 2000).map(_ => rng.nextLong(1L << 40)).toDF("v")
    val rows = vals.select(col("v"),
      graft.functions.lquantize(col("v"), step).as("b")).collect()
    rows.foreach { r =>
      val (v, b) = (r.getLong(0), r.getLong(1))
      assert(b % step == 0 && b <= v && v < b + step, s"v=$v b=$b")
    }
  }

  // ---- krill: Spark evaluation ≡ a direct reference interpreter ----

  private val fieldPool = Seq("f0", "f1", "f2")
  private val cmpGen: Gen[Pred] = for {
    op <- Gen.oneOf("eq", "ne", "lt", "le", "gt", "ge")
    f <- Gen.oneOf(fieldPool)
    v <- Gen.choose(-5L, 5L)
  } yield Cmp(op, f, v)

  private def predGen(depth: Int): Gen[Pred] =
    if (depth == 0) cmpGen
    else Gen.frequency(
      3 -> cmpGen,
      1 -> Gen.nonEmptyListOf(Gen.lzy(predGen(depth - 1))).map(ps => And(ps.take(3))),
      1 -> Gen.nonEmptyListOf(Gen.lzy(predGen(depth - 1))).map(ps => Or(ps.take(3))))

  /** dragnet semantics: comparisons on a missing field are false. */
  private def evalRef(p: Pred, row: Map[String, Long]): Boolean = p match {
    case Cmp(op, f, v) => row.get(f) match {
      case None => false
      case Some(x) =>
        val y = v.asInstanceOf[Long]
        op match {
          case "eq" => x == y; case "ne" => x != y
          case "lt" => x < y; case "le" => x <= y
          case "gt" => x > y; case "ge" => x >= y
        }
    }
    case And(ps) => ps.forall(evalRef(_, row))
    case Or(ps)  => ps.exists(evalRef(_, row))
  }

  test("krill filters match a direct interpreter on rows with missing fields") {
    // rows: tuples of Option[Long] per field (None ≡ missing/null)
    val rows: Seq[(Option[Long], Option[Long], Option[Long])] =
      (for {
        a <- Seq[Option[Long]](None, Some(-3L), Some(0L), Some(4L))
        b <- Seq[Option[Long]](None, Some(1L), Some(5L))
        c <- Seq[Option[Long]](None, Some(-1L), Some(2L))
      } yield (a, b, c))
    val df = rows.toDF("f0", "f1", "f2").cache()
    try {
      check(Prop.forAll(predGen(2)) { p =>
        val sparkKept = df.where(p.toColumn(df.col))
          .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
        val refKept = rows.filter { case (a, b, c) =>
          evalRef(p, Seq("f0" -> a, "f1" -> b, "f2" -> c)
            .collect { case (k, Some(v)) => k -> v }.toMap)
        }.map { case (a, b, c) => (a.map(x => x: Any), b.map(x => x: Any), c.map(x => x: Any)) }.toSet
        sparkKept == refKept
      }, n = 60)
    } finally { df.unpersist(); () }
  }

  test("bloom filter: no false negatives, ever (pure driver arithmetic)") {
    val strGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    check(Prop.forAll(Gen.nonEmptyListOf(strGen)) { strs =>
      val pairs = strs.distinct.map { s =>
        val a = graft.functions.Md5PairUtil.pair(s.getBytes("UTF-8"))
        (a.getLong(0), a.getLong(1))
      }.toArray
      val m = graft.dedup.Dedup.bloomBitsFor(pairs.length.toLong)
      val words = graft.dedup.Dedup.bloomWords(pairs, m)
      pairs.forall { case (h1, h2) =>
        (0 until graft.dedup.Dedup.BloomK).forall { i =>
          val p = (graft.functions.XHash.memberLong(h1, h2, i) % m).toInt
          (words(p >>> 6) & (1L << (p & 63))) != 0L
        }
      }
    }, n = 80)
  }

  test("memberLong: non-negative, 60-bit, no overflow across the family") {
    val h1Gen = Gen.choose(0L, (1L << 60) - 1)
    val h2Gen = Gen.choose(0L, (1L << 56) - 1)
    val iGen = Gen.choose(0, graft.functions.XHash.MaxFamily - 1)
    check(Prop.forAll(h1Gen, h2Gen, iGen) { (h1, h2, i) =>
      val v = graft.functions.XHash.memberLong(h1, h2, i)
      v >= 0L && v < (1L << 60)
    }, n = 200)
  }

  test("bloomBitsFor: smallest clamped power of two >= 64 n") {
    check(Prop.forAll(Gen.choose(0L, 1L << 40)) { n =>
      val m = graft.dedup.Dedup.bloomBitsFor(n)
      val isPow2 = (m & (m - 1)) == 0
      val inRange = m >= (1 << 14) && m <= (1 << 24)
      val covers = m >= math.min(64L * math.max(n, 1L), 1L << 24)
      val tight = m == (1 << 14) || (m.toLong / 2) < 64L * math.max(n, 1L)
      isPow2 && inRange && covers && tight
    }, n = 200)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann

/** Native ArrayDotProduct/ArrayL2Norm expressions + the SQL surface
  * registered through GraftExtensions. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native dot/norm match hand math, float and double, codegen'd") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("f", "d")
    val r = df.select(
      Ann.dot($"f", $"d").as("fd"),
      Ann.dot($"d", $"d").as("dd"),
      Ann.norm($"f").as("nf")).collect().head
    assert(r.getDouble(0) == 4.0 + 10.0 + 18.0)
    assert(r.getDouble(1) == 16.0 + 25.0 + 36.0)
    assert(r.getDouble(2) == math.sqrt(1 + 4 + 9))
    // must NOT fall back: over a real (parquet) source the plan stays in
    // whole-stage codegen (a local relation would constant-fold instead)
    val e = graft.sources.Sources.table(spark, sf001, "embeddings")
    val plan = e.select(Ann.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan
    // the "*(n)" prefix marks a WholeStageCodegen span in toString
    assert(plan.toString.linesIterator.next().startsWith("*(1) Project [graft_dot"))
  }

  test("null array -> null; null elements contribute zero") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Seq(3.0, 4.0)),
      (None, Seq(3.0, 4.0))
    ).toDF("a", "b")
    val rows = df.select(Ann.dot($"a", $"b").as("d")).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("SQL functions via GraftExtensions.register") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_l2norm(array(3.0D, 4.0D)) AS n,
        |       graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_quantize(17) AS q,
        |       graft_lquantize(137, 10) AS lq""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 1.0)
    assert(r.getLong(3) == 16L)
    assert(r.getLong(4) == 130L)
  }

  test("graft_md5_pair SQL function matches the XHash reference forms") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_md5_pair('abc')[0] AS h1, graft_md5_pair('abc')[1] AS h2,
        |       CAST(conv(substring(md5('abc'), 1, 15), 16, 10) AS BIGINT) AS r1,
        |       CAST(conv(substring(md5('abc'), 17, 14), 16, 10) AS BIGINT) AS r2
        |""".stripMargin).collect().head
    assert(r.getLong(0) == r.getLong(2))
    assert(r.getLong(1) == r.getLong(3))
  }

  test("native dot is bit-identical to the HOF formulation on real embeddings") {
    val e = graft.sources.Sources.table(spark, sf001, "embeddings").limit(50)
    val hof = e.select(col("vec_id"),
      aggregate(zip_with(transform(col("embedding"), x => x.cast("double")),
        transform(col("embedding"), x => x.cast("double")), (x, y) => x * y),
        lit(0.0), (s, x) => s + x).as("d"))
    val nat = e.select(col("vec_id"), Ann.dot(col("embedding"), col("embedding")).as("d"))
    val h = hof.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = nat.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h == n) // exact ==, not tolerance: same order, same widening
  }
}

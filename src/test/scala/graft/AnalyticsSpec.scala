package graft

import org.apache.spark.sql.functions._

/** Star-schema analytics invariants not covered by the DuckDB oracle. */
class AnalyticsSpec extends SparkSpec {

  test("approx distinct stays within rsd bounds of exact") {
    // the query itself now carries the ±5% contract as `approx_ok`;
    // the spec asserts it holds for every group at the test scale
    val rows = Registry.queries("q_user_counts_approx")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}: approx outside 5% of exact=${r.getLong(1)}")
    }
  }

  test("top-k is a TakeOrdered plan, not a global sort") {
    val df = Registry.queries("q_topk_orders")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q5 dim chain broadcasts all dimension tables") {
    val df = Registry.queries("q5_local")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3, plan)
  }

  test("rate anomaly: exact integer decision == float z on clear cases") {
    // series with one clear spike: [0,0,0,0,0,0,0,0,0,10]
    // c=10, S=10, SS=100: var=(10·100-100)/90=10, mean=1
    // z(10)=9/sqrt(10)≈2.85 → anomalous; z(0)=-1/sqrt(10) → not
    val c = BigInt(10); val s = BigInt(10); val ss = BigInt(100)
    def exact(n: BigInt) =
      (c * n - s).pow(2) * (c - 1) > 4 * c * (c * ss - s * s)
    assert(exact(10) && !exact(0))
    // boundary: z == 2 exactly must NOT flag (strict >): series where
    // 4·c·(c·SS−S²) == (c·n−S)²·(c−1); constant series never flags
    val cc = BigInt(5); val sC = BigInt(15); val ssC = BigInt(45)
    def exactConst(n: BigInt) =
      (cc * n - sC).pow(2) * (cc - 1) > 4 * cc * (cc * ssC - sC * sC)
    assert(!exactConst(3)) // constant 3s: zero variance, zero deviation
  }

  test("retention: same-day repeats dedup, window clips at 6 days") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val day = 86400000000L
    val e = Seq(
      (1L, 0L), (1L, day), (1L, day + 1L), (1L, 3 * day), (1L, 9 * day),
      (2L, 2 * day), (2L, 2 * day + 5L), (2L, 5 * day)
    ).toDF("user_id", "tu")
      .select(col("user_id"), expr(s"tu div ${day}L").as("day"))
    val cohorts = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val got = e.distinct().join(cohorts, Seq("user_id"))
      .withColumn("off", col("day") - col("cohort"))
      .where(col("off").between(0, 6))
      .groupBy(col("cohort"), col("off"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,   // u1; day 9 clipped
      (2L, 0L) -> 1L, (2L, 3L) -> 1L))                   // u2; same-day dedup
  }

  test("funnel: stage order is strict and pre-stage events don't count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val day = 86400000000L
    val e = Seq(
      // u1: clean chain inside a day → completed
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // u2: click BEFORE first view must not chain; later click does,
      // purchase at exactly t2 is excluded (strict >), the later one
      // lands outside nothing — completes
      (2L, 50L, "click"), (2L, 100L, "view"), (2L, 150L, "click"),
      (2L, 150L, "purchase"), (2L, 400L, "purchase"),
      // u3: purchase before click → t3 null, not completed
      (3L, 10L, "purchase"), (3L, 20L, "view"), (3L, 30L, "click"),
      // u4: completes at EXACTLY the day boundary (<=)
      (4L, 0L, "view"), (4L, 10L, "click"), (4L, day, "purchase"),
      // u5: completes one microsecond too late
      (5L, 0L, "view"), (5L, 10L, "click"), (5L, day + 11L, "purchase")
    ).toDF("user_id", "tu", "event_type")
      .select(col("user_id"),
        org.apache.spark.sql.functions.timestamp_micros(col("tu")).as("ts"),
        col("event_type"))
    // run the same plan q_funnel builds, against an in-memory frame
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id"))
    val out = e.select(col("user_id"),
        graft.functions.epochMicros(col("ts")).as("tu"), col("event_type"))
      .withColumn("t1", min(when(col("event_type") === "view", col("tu"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("tu") > col("t1"), col("tu"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("tu") > col("t2"), col("tu"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"), min(col("t3")).as("t3"))
      .select(col("user_id"),
        coalesce(col("t3") - col("t1") <= lit(day), lit(false)).as("completed"),
        col("t2"), col("t3"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L)._1)
    assert(out(2L) == ((true, Some(150L), Some(400L))))
    assert(out(3L) == ((false, Some(30L), None)))
    assert(out(4L)._1)
    assert(!out(5L)._1)
  }
}

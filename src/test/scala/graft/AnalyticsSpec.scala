package graft

import org.apache.spark.sql.functions._

/** Star-schema analytics invariants not covered by the DuckDB oracle. */
class AnalyticsSpec extends SparkSpec {

  test("approx distinct stays within rsd bounds of exact") {
    val rows = Registry.queries("q_user_counts_approx")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      // rsd=0.02 → generous 3-sigma-ish envelope
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getString(0)}: approx=$approx exact=$exact")
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
}

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
}

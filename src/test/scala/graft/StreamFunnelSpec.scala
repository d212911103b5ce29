package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamFunnel

/** mapGroupsWithState funnel: the stage machine advances across
  * micro-batches and never regresses; final state == batch semantics. */
class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def finalStates(table: String) =
    spark.table(table)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("t1").as("t1"),
        org.apache.spark.sql.functions.max("t2").as("t2"),
        org.apache.spark.sql.functions.max("t3").as("t3"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("funnel stages advance across micro-batches, never regress") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val q = StreamFunnel.funnel(input.toDS())
      .writeStream.format("memory").queryName("t_funnel")
      .outputMode(StreamFunnel.outputMode).start()
    try {
      // batch 1: u1 view+click; a click BEFORE the view is skipped
      input.addData((1L, 50L, "click"), (1L, 100L, "view"), (1L, 200L, "click"))
      q.processAllAvailable()
      assert(finalStates("t_funnel")(1L) == ((100L, 200L, -1L)))
      // batch 2: purchase completes using STATE from batch 1; a second
      // view must not move t1
      input.addData((1L, 250L, "view"), (1L, 300L, "purchase"))
      q.processAllAvailable()
      assert(finalStates("t_funnel")(1L) == ((100L, 200L, 300L)))
      // batch 3: everything after completion is ignored
      input.addData((1L, 400L, "purchase"), (1L, 500L, "click"))
      q.processAllAvailable()
      assert(finalStates("t_funnel")(1L) == ((100L, 200L, 300L)))
    } finally q.stop()
  }

  test("equal-time click does not satisfy the strict after-view rule") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val q = StreamFunnel.funnel(input.toDS())
      .writeStream.format("memory").queryName("t_funnel2")
      .outputMode(StreamFunnel.outputMode).start()
    try {
      input.addData((2L, 100L, "view"), (2L, 100L, "click"), (2L, 150L, "click"))
      q.processAllAvailable()
      assert(finalStates("t_funnel2")(2L) == ((100L, 150L, -1L)))
    } finally q.stop()
  }
}

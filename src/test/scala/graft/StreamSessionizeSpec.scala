package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamSessionize

/** mapGroupsWithState sessionization: state carried across micro-batches,
  * final counts equal the batch lag-window logic. */
class StreamSessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("session counts accumulate across micro-batches with a gap rule") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val out = StreamSessionize.sessionize(input.toDS(), gapSecs = 1800)
    val q = out.writeStream.format("memory").queryName("t_sessions")
      .outputMode(StreamSessionize.outputMode).start()
    try {
      // user 1: two events 10min apart → 1 session; user 2: one event
      input.addData((1L, 1000L), (1L, 1600L), (2L, 5000L))
      q.processAllAvailable()
      // batch 2: user 1 returns after 2h → second session; 20min later →
      // still session 2 (state carried across batches)
      input.addData((1L, 9000L), (1L, 10200L))
      q.processAllAvailable()
      val last = spark.table("t_sessions")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("sessions"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(last == Map(1L -> 2L, 2L -> 1L))
    } finally q.stop()
  }

  test("matches the batch sessionize logic on the events table") {
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Sources.events(spark, sf001)
      .select($"user_id", graft.functions.epochSecs($"ts").as("sec"))
      .as[(Long, Long)].collect().toSeq
    val input = MemoryStream[(Long, Long)]
    val q = StreamSessionize.sessionize(input.toDS(), gapSecs = 1800)
      .writeStream.format("memory").queryName("t_sessions2")
      .outputMode(StreamSessionize.outputMode).start()
    try {
      // feed time-ordered (streaming arrival order assumption)
      input.addData(ev.sortBy(_._2))
      q.processAllAvailable()
      val streamed = spark.table("t_sessions2")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("sessions"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // batch truth: count gaps per user ordered by time
      val truth = ev.groupBy(_._1).map { case (u, xs) =>
        val secs = xs.map(_._2).sorted
        u -> secs.foldLeft((Long.MinValue, 0L)) { case ((last, n), s) =>
          (s, if (last == Long.MinValue || s - last > 1800) n + 1 else n)
        }._2
      }
      assert(streamed == truth)
    } finally q.stop()
  }
}

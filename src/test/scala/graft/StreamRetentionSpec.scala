package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamRetention

/** mapGroupsWithState retention: (cohort, mask) state converges to the
  * batch answer under ANY arrival order — late earlier days shift the
  * mask; days leaving the 7-day window stay out. */
class StreamRetentionSpec extends SparkSpec {
  import spark.implicits._

  /** Drain events through the operator in the given batches and return
    * the (cohort, off) → active_users matrix. */
  private def matrix(name: String, batches: Seq[Seq[(Long, Long)]]): Map[(Long, Long), Long] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = StreamRetention.retention(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(StreamRetention.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
      .groupBy(col("user_id"))
      .agg(max(struct(col("seq"), col("cohort"), col("mask"))).as("m"))
      .select(col("m.cohort").as("cohort"), col("m.mask").as("mask"))
      .select(col("cohort"), explode(sequence(lit(0), lit(6))).as("off"),
        col("mask"))
      .where(expr("shiftright(mask, off) % 2 = 1"))
      .groupBy(col("cohort"), col("off"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
  }

  /** The batch-semantics reference. */
  private def batchMatrix(ev: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val cohorts = ev.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min }
    ev.distinct.flatMap { case (u, d) =>
      val off = d - cohorts(u)
      if (off >= 0 && off <= 6) Some((cohorts(u), off)) else None
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  private val events = Seq(
    (1L, 100L), (1L, 101L), (1L, 103L), (1L, 109L), // 109 out of window
    (2L, 100L), (2L, 106L),
    (3L, 105L), (3L, 105L), (3L, 111L), (3L, 112L))

  test("in-order batches reproduce the batch retention matrix") {
    assert(matrix("t_ret1", Seq(events)) == batchMatrix(events))
  }

  test("shuffled and late arrivals converge to the same matrix") {
    // worst case: each user's EARLIEST day arrives last, so every
    // cohort shifts down mid-stream and the masks must re-base
    val late = events.sortBy { case (_, d) => -d }
    val batches = late.grouped(3).toSeq
    assert(matrix("t_ret2", batches) == batchMatrix(events),
      "cohort shift must re-base the activity mask")
  }

  test("a day that leaves the window on cohort shift stays out") {
    // 2nd batch moves u9's cohort from 100 to 90: day 100 lands at
    // offset 10 (> 6) and must vanish from the matrix
    val m = matrix("t_ret3", Seq(Seq((9L, 100L)), Seq((9L, 90L))))
    assert(m == Map((90L, 0L) -> 1L), s"got $m")
  }
}

package graft

import org.apache.spark.sql.functions._

/**
 * AQE skew-join demonstration (SURVEY.md §4/§8): statistical skew is
 * handled adaptively at runtime — OptimizeSkewedJoin splits an oversized
 * shuffle partition into parallel sub-reads — complementing the
 * *explicit* salting in [[graft.plans.ScaleJoins]] for pathological keys
 * you know in advance. The spec pins (a) AQE actually marks the join
 * skew-handled under skew-friendly thresholds, and (b) results are
 * identical with and without the optimization.
 */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition of a skewed sort-merge join") {
    // 95% of 40k rows share key 1; padding makes the hot partition's
    // bytes dwarf the skew thresholds below
    val big = spark.range(0, 40000)
      .select(when(col("id") % 20 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        concat(lit("x"), lpad(col("id").cast("string"), 200, "0")).as("pad"))
    val right = spark.range(0, 2000).select(col("id").as("k"),
      concat(lit("r"), lpad(col("id").cast("string"), 200, "0")).as("rpad"))

    val expected = withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      big.join(right, Seq("k")).count()
    }

    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = big.join(right, Seq("k"))
      // collect() (not count()) so THIS DataFrame's adaptive plan runs to
      // completion — count() would execute a separate query plan
      assert(joined.collect().length == expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the join skew-handled:\n${plan.take(2000)}")
    }
  }
}

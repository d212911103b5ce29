package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamDedup

/** Streaming dedup: first occurrence kept, duplicates within the
  * watermark horizon dropped, state bounded. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  test("exact dups within the horizon are dropped, first occurrence kept") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = StreamDedup.dedupExact(
      input.toDF().toDF("ts", "text"), "text", "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01T00:00:00Z"), "the quick brown fox"),
        (ts("2024-01-01T00:05:00Z"), "The  quick brown FOX"), // normalized dup
        (ts("2024-01-01T00:10:00Z"), "something else entirely"))
      q.processAllAvailable()
      // dup arriving in a LATER batch, still within the horizon
      input.addData((ts("2024-01-01T00:20:00Z"), "the quick brown fox"))
      q.processAllAvailable()
      val texts = spark.table("t_dedup").select("text")
        .collect().map(_.getString(0)).toSeq
      assert(texts.length == 2)
      assert(texts.contains("the quick brown fox"))
      assert(texts.contains("something else entirely"))
    } finally q.stop()
  }

  test("dedupByKey suppresses by an arbitrary key column") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamDedup.dedupByKey(
      input.toDF().toDF("ts", "k", "payload"),
      org.apache.spark.sql.functions.col("k"), "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("t_dedup_k")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01T00:00:00Z"), 7L, "first"),
        (ts("2024-01-01T00:01:00Z"), 7L, "second"),
        (ts("2024-01-01T00:02:00Z"), 8L, "third"))
      q.processAllAvailable()
      val kept = spark.table("t_dedup_k").select("payload")
        .collect().map(_.getString(0)).toSet
      assert(kept == Set("first", "third"))
    } finally q.stop()
  }
}

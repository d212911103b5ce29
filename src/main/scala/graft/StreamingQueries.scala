package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamScan

/**
 * SURVEY.md §2 row 18: the streaming scan run as a real Structured
 * Streaming job — the events parquet read through `readStream`, windowed
 * per-day × event_type counts, drained with an AvailableNow trigger into
 * a memory sink. Rows-only (the oracle story for streaming is the
 * StreamingSpec equivalence test: stream result == batch Scan result).
 */
object StreamingQueries {

  def all: Seq[Q] = Seq(
    Q("stream_window_counts",
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val path = s"$dir/events.parquet"
        val raw = s.read.parquet(path)
        def fix(df: org.apache.spark.sql.DataFrame) =
          df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
        // the file stream source wants a directory or glob, not a bare
        // file path — glob just the events file
        val stream = fix(s.readStream.schema(raw.schema)
          .parquet(s"$dir/{events}.parquet"))
        val agg = StreamScan.scanStream(stream,
          QueryConfig(breakdowns = Seq(FieldSpec.plain("event_type"))),
          timeCol = "ts", windowDur = "1 day", watermarkDelay = "0 seconds")
        val name = "graft_stream_counts"
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name)
      },
      // The streaming result IS oracle-checkable: 1-day event-time
      // windows align to UTC days, so the drained AvailableNow run must
      // equal a batch day-truncated count.
      Some("""
        SELECT date_trunc('day', ts) AS window_start,
               date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS value
        FROM events GROUP BY 1, 2, 3""")),

    // #24d stateful streaming sessionization (mapGroupsWithState) run to
    // completion over the events stream — the final per-user session
    // counts must equal the batch lag-window computation, which IS the
    // oracle (same SQL as q_sessionize, different engine path entirely).
    Q("stream_sessionize",
      (s, dir) => {
        import s.implicits._
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val path = s"$dir/events.parquet"
        val raw = s.read.parquet(path)
        val stream = s.readStream.schema(raw.schema)
          .parquet(s"$dir/{events}.parquet")
          // integral div: ts/1e9 through double would lose precision at
          // nanosecond magnitudes (> 2^53)
          .select(col("user_id"), expr("ts div 1000000000").as("sec"))
          .as[(Long, Long)]
        val out = graft.streaming.StreamSessionize.sessionize(stream, 1800L)
        val name = "graft_stream_sessions"
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode(graft.streaming.StreamSessionize.outputMode)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name).groupBy("user_id")
          .agg(max(col("sessions")).cast("long").as("sessions"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH d AS (
          SELECT user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                 lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                   (PARTITION BY user_id ORDER BY epoch(ts)) AS prev
          FROM events)
        SELECT user_id,
               CAST(SUM(CASE WHEN prev IS NULL OR sec - prev > 1800
                             THEN 1 ELSE 0 END) AS BIGINT) AS sessions
        FROM d GROUP BY 1 ORDER BY 1"""))
  )
}

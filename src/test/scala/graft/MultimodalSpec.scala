package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing with the stubbed decode
  * (SURVEY.md §2 row 36). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val payloads = Seq(
    (1L, "image-bytes-aaaa", "image"),
    (2L, "audio-bytes-bbbb", "audio"),
    (3L, "image-bytes-aaaa", "image")
  ).toDF("id", "raw", "kind")
    .select(col("id"), encode(col("raw"), "UTF-8").as("payload"), col("kind"))

  test("decodeStub: right dimension, deterministic in payload bytes") {
    val rows = payloads.select(col("id"),
      Multimodal.decodeStub(col("payload"), 16).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows(1L).length == 16)
    assert(rows(1L) == rows(3L)) // same bytes → same features
    assert(rows(1L) != rows(2L))
    rows.values.flatten.foreach(v => assert(v >= 0.0 && v < 1.0))
  }

  test("extractBatch: preserves rows/schema, adds features, deterministic") {
    val out = Multimodal.extractBatch(payloads, "payload", dim = 8, batchSize = 2)
    assert(out.count() == 3)
    assert(out.schema.fieldNames.toSeq ==
      Seq("id", "payload", "kind", "features"))
    val f = out.select(col("id"), col("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(f(1L) == f(3L) && f(1L).length == 8)
    // matches the stub applied directly
    assert(f(1L) == Multimodal.fakeFeatures("image-bytes-aaaa".getBytes("UTF-8"), 8))
  }

  test("frameSample explodes sampled frame indices distributively") {
    val vids = Seq((1L, 10), (2L, 1)).toDF("id", "n_frames")
    val out = Multimodal.frameSample(vids, "n_frames", every = 3)
      .groupBy("id").agg(collect_list("frame_idx").as("idx"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).sorted).toMap
    assert(out(1L) == Seq(0, 3, 6, 9))
    assert(out(2L) == Seq(0))
  }

  test("metadata struct round-trips through the schema") {
    val df = payloads.withColumn("meta", struct(
      col("kind"), lit(640).as("width"), lit(480).as("height"),
      lit(null).cast("int").as("sample_rate"), lit(null).cast("int").as("n_frames")))
    val r = df.select(col("meta.kind"), col("meta.width")).collect().head
    assert(r.getString(0) == "image" && r.getInt(1) == 640)
  }
}

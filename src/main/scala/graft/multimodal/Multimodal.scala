package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (SURVEY.md §2 row 36): image/audio/video
 * payloads as opaque `binary` columns with a typed metadata struct.
 *
 * The actual codecs (JPEG/PNG decode, audio resample, video frame
 * extraction) are NOT in this container, so the decode step is a
 * clearly-marked deterministic STUB — a pure function of the payload
 * bytes. Everything around it — schema, batch shape, partition-preserving
 * explode, output encoders — is the real distributed plumbing a decoder
 * plugs into.
 */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),         // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  /**
   * STUB decode → feature vector, as a pure Column expression:
   * feature_i = (member_i(md5(payload)) mod 1000) / 1000 over the
   * cross-engine [[graft.functions.XHash]] family — deterministic in the
   * payload bytes, codegen'd, shuffle-free, and replayable by a SQL
   * oracle. Swap this body for a real codec expression/UDF at
   * deployment; the plan shape is unchanged.
   */
  def decodeStub(payload: Column, dim: Int): Column = {
    import graft.functions.XHash
    val h1 = XHash.h60(payload)
    val h2 = XHash.h56(payload)
    array((0 until dim).map(i =>
      pmod(XHash.member(h1, h2, i), lit(1000L)).cast("double") / lit(1000.0)): _*)
  }

  /**
   * Frame sampling for video payloads: one output row per sampled frame
   * index (0, every, 2*every, … < n_frames), via explode(sequence) — a
   * distributed generator, no driver loop, partition-preserving.
   */
  def frameSample(df: DataFrame, nFramesCol: String, every: Int): DataFrame =
    df.select(col("*"),
      explode(sequence(lit(0), col(nFramesCol) - 1, lit(every))).as("frame_idx"))

  /**
   * Batched per-partition feature extraction — the Scala analog of
   * mapInPandas: rows stream through in fixed-size batches (the shape a
   * vectorized decoder wants: amortized model/codec setup per batch, not
   * per row), output schema = input schema + `features array<double>`.
   */
  def extractBatch(df: DataFrame, payloadCol: String, dim: Int,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(
      df.schema :+ StructField("features", ArrayType(DoubleType)))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // A real implementation would hand `batch` to the codec as one
        // vectorized call; the stub maps rows to deterministic features.
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](idx)
          Row.fromSeq(r.toSeq :+ fakeFeatures(bytes, dim))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** STUB: deterministic fake features from payload bytes (md5-derived). */
  private[graft] def fakeFeatures(bytes: Array[Byte], dim: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    (0 until dim).map(i =>
      ((md(i % md.length) & 0xff) ^ ((i * 31) & 0xff)).toDouble / 255.0)
  }
}

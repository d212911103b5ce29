package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (SURVEY.md §2 row 36): image/audio/video
 * payloads as opaque `binary` columns with a typed metadata struct.
 *
 * IMAGE decode is REAL: PNG/JPEG payloads go through JDK
 * `javax.imageio` ([[imageMeta]] / the image branch of
 * [[extractBatch]]) — true width/height from the bitstream, exact
 * per-channel pixel means. AUDIO decode is REAL for WAV/PCM
 * ([[audioMeta]]): RIFF is a trivial chunked container and 16-bit PCM
 * needs no codec, so the parser is ~40 lines of JDK-only byte walking —
 * true sample rate and exact sample statistics from the bitstream.
 * Compressed audio (mp3/aac) and video codecs are NOT in this
 * container, so those payloads still take a clearly-marked
 * deterministic STUB — a pure function of the payload bytes. Everything
 * around all paths — schema, batch shape, partition-preserving explode,
 * output encoders — is the same distributed plumbing either way.
 */
object Multimodal {

  // ImageIO defaults to a file-backed stream cache (one temp file per
  // read); executor tasks decoding millions of small in-memory payloads
  // must not touch disk per image.
  javax.imageio.ImageIO.setUseCache(false)

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
   *
   * Payloads that sniff as PNG/JPEG are REALLY decoded (JDK ImageIO):
   * features = [width, height, mean_r/255, mean_g/255, mean_b/255,
   * luma/255, 0-padded] truncated to `dim`. Anything else (audio/video —
   * no codecs in this container) takes the labeled md5 stub.
   */
  def extractBatch(df: DataFrame, payloadCol: String, dim: Int,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(
      df.schema :+ StructField("features", ArrayType(DoubleType)))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // A vectorized codec would take `batch` as one call; ImageIO is
        // per-image, so the batching here amortizes nothing but keeps
        // the call shape a vectorized decoder slots into.
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](idx)
          // magic bytes can lie (truncated/corrupt payload) — fall back
          // to the stub rather than fail the task
          val feats =
            if (looksLikeImage(bytes)) imageFeatures(bytes, dim)
              .getOrElse(fakeFeatures(bytes, dim))
            else fakeFeatures(bytes, dim)
          Row.fromSeq(r.toSeq :+ feats)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Output schema of [[imageMeta]]'s appended columns. */
  private val imageMetaFields = Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType))

  /**
   * REAL image decode over a binary column: appends `width`, `height`
   * and exact per-channel pixel means (0-255 scale), all NULL when the
   * payload is not a decodable image. JDK `javax.imageio` handles
   * PNG/JPEG/GIF/BMP with zero external dependencies; channel sums are
   * exact integer arithmetic, so the single closing division is
   * bit-reproducible by any engine that can state the expected means in
   * closed form.
   */
  def imageMeta(df: DataFrame, payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema ++ imageMetaFields)
    val idx = df.schema.fieldIndex(payloadCol)
    val nulls = Seq[Any](null, null, null, null, null)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          // Seq[Any], NOT Seq(w, …): Scala would widen the Int dims to
          // Double to unify with the means, breaking the INT fields
          val stats = decodeImageStats(r.getAs[Array[Byte]](idx))
            .map { case (w, h, mr, mg, mb) => Seq[Any](w, h, mr, mg, mb) }
            .getOrElse(nulls)
          Row.fromSeq(r.toSeq ++ stats)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Output schema of [[audioMeta]]'s appended columns. */
  private val audioMetaFields = Seq(
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("mean_amp", DoubleType),
    StructField("peak_amp", LongType))

  /**
   * REAL audio decode over a binary column (WAV, 16-bit mono PCM):
   * appends `sample_rate`, `n_samples`, `mean_amp` (exact integer
   * sample sum / n, rounded to the 1e-6 grid) and `peak_amp`
   * (max |sample|), all NULL when the payload is not such a WAV. RIFF
   * chunk walking + little-endian int16 reads — zero dependencies, same
   * move as [[imageMeta]]'s ImageIO: the statistics come from the real
   * bitstream, so a generator-replaying oracle proves the decode.
   */
  def audioMeta(df: DataFrame, payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema ++ audioMetaFields)
    val idx = df.schema.fieldIndex(payloadCol)
    val nulls = Seq[Any](null, null, null, null)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val stats = decodeWavStats(r.getAs[Array[Byte]](idx))
            .map { case (rate, n, mean, peak) =>
              Seq[Any](rate, n, math.rint(mean * 1e6) / 1e6, peak) }
            .getOrElse(nulls)
          Row.fromSeq(r.toSeq ++ stats)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Parse a WAV (RIFF) payload: walk the chunk list, require canonical
    * 16-bit mono PCM, and return (sample_rate, n_samples, mean, peak)
    * from the data chunk's samples. None for anything else. */
  private[graft] def decodeWavStats(
      bytes: Array[Byte]): Option[(Int, Long, Double, Long)] = {
    if (bytes == null || bytes.length < 44) return None
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
          bytes(10) == 'V' && bytes(11) == 'E')) return None
    var pos = 12
    var fmt = -1; var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = 0L
    while (pos + 8 <= bytes.length) {
      val sz = u32(pos + 4)
      val cid = new String(bytes, pos, 4, "US-ASCII")
      if (cid == "fmt " && pos + 24 <= bytes.length) {
        fmt = u16(pos + 8); channels = u16(pos + 10)
        rate = u32(pos + 12).toInt; bits = u16(pos + 22)
      } else if (cid == "data") {
        dataOff = pos + 8
        dataLen = math.min(sz, (bytes.length - dataOff).toLong)
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      pos += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (fmt != 1 || channels != 1 || bits != 16 || rate <= 0 ||
        dataOff < 0) return None
    val n = dataLen / 2
    if (n <= 0) return None
    var sum = 0L; var peak = 0L
    var i = 0
    while (i < n) {
      // int16 LE: sign comes from the high byte
      val s = (bytes(dataOff + 2 * i.toInt + 1) << 8) |
        (bytes(dataOff + 2 * i.toInt) & 0xff)
      sum += s
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      i += 1
    }
    Some((rate, n, sum.toDouble / n, peak))
  }

  /**
   * Deterministic synthetic WAV for tests/oracles (the audio analog of
   * [[bandedPng]]): canonical 44-byte header, 16-bit mono PCM,
   * sample_rate = 8000·(1 + id mod 3), n = id mod 50 + 10 samples,
   * sample_k = (31·id + 7·k) mod 2001 − 1000 — every statistic a pure
   * function of `id` that an external SQL engine replays with a
   * range() lambda, never seeing the bytes.
   */
  def tonePcmWav(id: Long): Array[Byte] = {
    require(id >= 0, "synthetic WAV ids are non-negative")
    val rate = 8000 * (1 + (id % 3).toInt)
    val n = (id % 50 + 10).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)                 // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2)           // byte rate
    bb.putShort(2); bb.putShort(16)                // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var k = 0
    while (k < n) {
      bb.putShort((((id * 31 + k * 7) % 2001) - 1000).toShort)
      k += 1
    }
    bb.array()
  }

  /** PNG / JPEG magic-byte sniff. */
  private[graft] def looksLikeImage(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      ((b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte &&
        b(3) == 'G'.toByte) ||
       (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte))

  /** Decode via JDK ImageIO → (width, height, mean_r, mean_g, mean_b);
    * None when the bytes aren't a decodable image. Sums are exact longs;
    * one double division per channel at the end. */
  private[graft] def decodeImageStats(
      bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double)] = {
    if (bytes == null) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < px.length) {
        val p = px(i)
        sr += (p >> 16) & 0xff
        sg += (p >> 8) & 0xff
        sb += p & 0xff
        i += 1
      }
      val n = w.toLong * h
      Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
    }
  }

  /** Real features for a decodable image: dimensions, channel means and
    * Rec.601 luma, 0-padded to `dim`; None when decode fails. */
  private[graft] def imageFeatures(bytes: Array[Byte], dim: Int): Option[Seq[Double]] =
    decodeImageStats(bytes).map { case (w, h, mr, mg, mb) =>
      val luma = (0.299 * mr + 0.587 * mg + 0.114 * mb) / 255.0
      val full = Seq(w.toDouble, h.toDouble, mr / 255.0, mg / 255.0, mb / 255.0, luma)
      (full ++ Seq.fill(math.max(0, dim - full.length))(0.0)).take(dim)
    }

  /** STUB (audio/video only — those codecs aren't in this container):
    * deterministic fake features from payload bytes (md5-derived). */
  private[graft] def fakeFeatures(bytes: Array[Byte], dim: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    (0 until dim).map(i =>
      ((md(i % md.length) & 0xff) ^ ((i * 31) & 0xff)).toDouble / 255.0)
  }

  /**
   * Deterministic synthetic PNG for tests/oracles: two vertical bands —
   * the left floor(w/2) columns in color A, the rest in color B — with
   * every parameter a pure function of `id`:
   * w = id%17+4, h = id%13+4, A = (id, 7id, 13id) mod 256,
   * B = (3id, 5id, 11id) mod 256. Channel means therefore have the
   * closed form (wA·cA + wB·cB)/w, statable in ANSI SQL — which is what
   * makes the REAL decode oracle-checkable end to end.
   */
  def bandedPng(id: Long): Array[Byte] = {
    val w = (id % 17).toInt + 4
    val h = (id % 13).toInt + 4
    val wA = w / 2
    val a = (((id % 256) << 16) | ((id * 7 % 256) << 8) | (id * 13 % 256)).toInt
    val b = (((id * 3 % 256) << 16) | ((id * 5 % 256) << 8) | (id * 11 % 256)).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, if (x < wA) a else b); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}

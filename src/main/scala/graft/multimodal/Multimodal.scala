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
 * VIDEO frame decode is REAL for MJPEG-in-MP4 ([[videoFrames]]): the
 * ISO-BMFF sample tables (stsc/stsz/stco) locate each coded frame's
 * bytes inside mdat, and each frame is a plain JPEG that the same JDK
 * ImageIO path decodes — true per-frame pixel means from the real
 * bitstream, no external codec. Compressed audio (mp3/aac) and
 * inter-frame video codecs (H.264 etc.) are NOT in this container, so
 * those payloads still take a clearly-marked deterministic STUB — a
 * pure function of the payload bytes. Everything around all paths —
 * schema, batch shape, partition-preserving explode, output encoders —
 * is the same distributed plumbing either way.
 */
object Multimodal {

  // ImageIO defaults to a file-backed stream cache (one temp file per
  // read); executor tasks decoding millions of small in-memory payloads
  // must not touch disk per image.
  javax.imageio.ImageIO.setUseCache(false)

  /**
   * Rebalance a few-split input across all cores before CPU-bound
   * per-row decode. Decode is the one genuinely compute-heavy stage in
   * this module: a narrow input (one small parquet file → one
   * partition; a pre-aggregated upstream → a handful) would otherwise
   * run it on a fraction of the cluster while the rest idles — the
   * costliest possible place to be partition-capped. Only shuffles
   * when the input has FEWER partitions than cores (an already
   * well-split 100 TB scan passes through untouched), and uses an
   * explicit partition count so AQE cannot coalesce the exchange back
   * down on small byte sizes.
   */
  private def rebalanced(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

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
   * luma/255, 0-padded] truncated to `dim`. WAV/PCM payloads are
   * REALLY decoded too (the RIFF walker): features = [rate/48000,
   * n_samples, mean/32768, peak/32768, 0-padded]. Anything else
   * (compressed audio, video sample data — no codecs in this
   * container) takes the labeled md5 stub.
   */
  def extractBatch(df: DataFrame, payloadCol: String, dim: Int,
      batchSize: Int = 64, rebalance: Boolean = true): DataFrame = {
    val outSchema = StructType(
      df.schema :+ StructField("features", ArrayType(DoubleType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val in = if (rebalance) rebalanced(df) else df
    in.mapPartitions { it =>
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
            else audioFeatures(bytes, dim)
              .getOrElse(fakeFeatures(bytes, dim))
          Row.fromSeq(r.toSeq :+ feats)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Real features for a decodable WAV/PCM payload: rate, sample count
    * and normalized amplitude stats, 0-padded to `dim`; None when the
    * payload isn't such a WAV. */
  private[graft] def audioFeatures(bytes: Array[Byte], dim: Int): Option[Seq[Double]] =
    // Try: extractBatch's contract is "malformed payload → stub, never a
    // failed task", and this parser sees every non-image payload
    scala.util.Try(decodeWavStats(bytes)).toOption.flatten
      .map { case (rate, n, mean, peak) =>
        val full = Seq(rate / 48000.0, n.toDouble, mean / 32768.0, peak / 32768.0)
        (full ++ Seq.fill(math.max(0, dim - full.length))(0.0)).take(dim)
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
      batchSize: Int = 64, rebalance: Boolean = true): DataFrame = {
    val outSchema = StructType(df.schema ++ imageMetaFields)
    val idx = df.schema.fieldIndex(payloadCol)
    val nulls = Seq[Any](null, null, null, null, null)
    val in = if (rebalance) rebalanced(df) else df
    in.mapPartitions { it =>
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
      batchSize: Int = 64, rebalance: Boolean = true): DataFrame = {
    val outSchema = StructType(df.schema ++ audioMetaFields)
    val idx = df.schema.fieldIndex(payloadCol)
    val nulls = Seq[Any](null, null, null, null)
    val in = if (rebalance) rebalanced(df) else df
    in.mapPartitions { it =>
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
  /** Output schema of [[audioFingerprint]]'s appended columns. */
  private val audioFpFields = Seq(
    StructField("sample_rate", IntegerType),
    StructField("n_windows", IntegerType),
    StructField("fp", LongType))

  /**
   * REAL audio fingerprint over a binary column (the audio analog of
   * [[imageDHash]]): decode the WAV's PCM samples, split into windows
   * of 16, quantize each window's integer sum of |amplitude| to a
   * 2-bit energy level (sumabs div 4001 — exact integer arithmetic),
   * and pack the levels into one long (2 bits per window, first 16
   * windows). Hash-equal fingerprints = same coarse energy envelope —
   * the dedup key audio pipelines bucket on. NULL for non-WAV
   * payloads. The oracle recomputes the fingerprint from the
   * generator's closed-form sample formula, never seeing a byte.
   */
  def audioFingerprint(df: DataFrame, payloadCol: String,
      batchSize: Int = 64, rebalance: Boolean = true): DataFrame = {
    val outSchema = StructType(df.schema ++ audioFpFields)
    val idx = df.schema.fieldIndex(payloadCol)
    val nulls = Seq[Any](null, null, null)
    val in = if (rebalance) rebalanced(df) else df
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val fp = decodeWavFingerprint(r.getAs[Array[Byte]](idx))
            .map { case (rate, nw, f) => Seq[Any](rate, nw, f) }
            .getOrElse(nulls)
          Row.fromSeq(r.toSeq ++ fp)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** The 2-bit-per-window energy fingerprint of one WAV payload. */
  private[graft] def decodeWavFingerprint(
      bytes: Array[Byte]): Option[(Int, Int, Long)] =
    scala.util.Try(decodeWavSamples(bytes)).toOption.flatten.map {
      case (rate, ss) =>
        val nw = math.min(ss.length / 16, 16)
        var fp = 0L
        var w = 0
        while (w < nw) {
          var sa = 0L
          var k = 0
          while (k < 16) { sa += math.abs(ss(w * 16 + k).toLong); k += 1 }
          fp |= (sa / 4001L) << (2 * w) // level < 4: bits never overlap
          w += 1
        }
        (rate, nw, fp)
    }

  /** The RIFF walk shared by [[decodeWavStats]] and
    * [[decodeWavFingerprint]]: canonical 16-bit mono PCM → the sample
    * rate and the raw int16 samples; None for anything else. */
  private[graft] def decodeWavSamples(
      bytes: Array[Byte]): Option[(Int, Array[Int])] = {
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
      // chunks are word-aligned: odd sizes carry one pad byte. sz is an
      // unvalidated u32 from the payload — advance in Long arithmetic
      // clamped to the buffer end so a corrupt size can neither stall
      // the walk (zero advance) nor drive pos negative.
      pos = math.min(bytes.length.toLong, pos + 8L + sz + (sz & 1L)).toInt
    }
    if (fmt != 1 || channels != 1 || bits != 16 || rate <= 0 ||
        dataOff < 0) return None
    val n = (dataLen / 2).toInt
    if (n <= 0) return None
    val ss = new Array[Int](n)
    var i = 0
    while (i < n) {
      // int16 LE: sign comes from the high byte
      ss(i) = (bytes(dataOff + 2 * i + 1) << 8) |
        (bytes(dataOff + 2 * i) & 0xff)
      i += 1
    }
    Some((rate, ss))
  }

  private[graft] def decodeWavStats(
      bytes: Array[Byte]): Option[(Int, Long, Double, Long)] =
    decodeWavSamples(bytes).map { case (rate, ss) =>
      var sum = 0L; var peak = 0L
      var i = 0
      while (i < ss.length) {
        sum += ss(i)
        val a = math.abs(ss(i).toLong)
        if (a > peak) peak = a
        i += 1
      }
      (rate, ss.length.toLong, sum.toDouble / ss.length, peak)
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

  /** Output schema of [[videoMeta]]'s appended columns. */
  private val videoMetaFields = Seq(
    StructField("duration_ticks", LongType),
    StructField("timescale", IntegerType),
    StructField("n_tracks", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType))

  /**
   * REAL video CONTAINER decode over a binary column (MP4 / ISO-BMFF):
   * appends movie duration (ticks) + timescale from `mvhd`, the track
   * count, and the first track's pixel dimensions from `tkhd` — all
   * NULL when the payload is not a version-0 ISO-BMFF file. The box
   * structure is a plain big-endian (size, fourcc) tree, walkable with
   * zero dependencies; what stays stubbed is the CODED STREAM (frame
   * pixels need codecs this environment doesn't have) — the honest
   * split is real container metadata, stubbed sample data.
   */
  def videoMeta(df: DataFrame, payloadCol: String,
      batchSize: Int = 64, rebalance: Boolean = true): DataFrame = {
    val outSchema = StructType(df.schema ++ videoMetaFields)
    val idx = df.schema.fieldIndex(payloadCol)
    val nulls = Seq[Any](null, null, null, null, null)
    val in = if (rebalance) rebalanced(df) else df
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val stats = decodeMp4Meta(r.getAs[Array[Byte]](idx))
            .map { case (d, ts, nt, w, h) => Seq[Any](d, ts, nt, w, h) }
            .getOrElse(nulls)
          Row.fromSeq(r.toSeq ++ stats)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Walk an ISO-BMFF box tree: (duration_ticks, timescale, n_tracks,
    * width, height) from mvhd + the first tkhd. Version-0 boxes only
    * (v1 carries 64-bit times); None for anything else. */
  /** Big-endian u32 read shared by the ISO-BMFF walkers. */
  private def beU32(bytes: Array[Byte], i: Int): Long =
    ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
      ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)

  /** (offset, limit) ISO-BMFF box walk yielding
    * (type, payloadStart, payloadEnd) — shared by [[decodeMp4Meta]] and
    * [[decodeMp4Frames]]. A corrupt size can neither stall the walk
    * (min advance 8) nor run past `until` (clamped in Long math). */
  private def boxWalk(bytes: Array[Byte], from: Int,
      until: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = from
      def hasNext: Boolean = pos + 8 <= until
      def next(): (String, Int, Int) = {
        val sz = beU32(bytes, pos)
        val end = math.min(until.toLong, pos + math.max(8L, sz)).toInt
        val out = (new String(bytes, pos + 4, 4, "US-ASCII"), pos + 8, end)
        pos = end
        out
      }
    }

  private[graft] def decodeMp4Meta(
      bytes: Array[Byte]): Option[(Long, Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 16) return None
    def u32(i: Int): Long = beU32(bytes, i)
    def fourcc(i: Int) = new String(bytes, i, 4, "US-ASCII")
    def boxes(from: Int, until: Int) = boxWalk(bytes, from, until)
    if (fourcc(4) != "ftyp") return None
    val moov = boxes(0, bytes.length).collectFirst {
      case ("moov", s, e) => (s, e)
    }.getOrElse(return None)
    var duration = -1L; var timescale = -1
    var nTracks = 0; var width = -1; var height = -1
    boxes(moov._1, moov._2).foreach {
      case ("mvhd", s, e) if e - s >= 100 && bytes(s) == 0 =>
        timescale = u32(s + 12).toInt
        duration = u32(s + 16)
      case ("trak", s, e) =>
        nTracks += 1
        if (width < 0) boxes(s, e).foreach {
          case ("tkhd", ts, te) if te - ts >= 84 && bytes(ts) == 0 =>
            // 16.16 fixed-point at payload offsets 76 / 80
            width = (u32(ts + 76) >> 16).toInt
            height = (u32(ts + 80) >> 16).toInt
          case _ => ()
        }
      case _ => ()
    }
    if (duration < 0 || timescale <= 0 || nTracks == 0 || width < 0) None
    else Some((duration, timescale, nTracks, width, height))
  }

  /**
   * Deterministic minimal ISO-BMFF file for tests/oracles (the video
   * analog of [[bandedPng]]): ftyp + moov{mvhd, n×trak{tkhd}}, every
   * field a pure function of `id` — timescale = 1000·(1 + id mod 5),
   * duration = id mod 3000 + 100 ticks, tracks = 1 + id mod 3, first
   * track width/height = (id mod 640 + 16, id mod 360 + 16). No coded
   * samples: this is the container-metadata story only.
   */
  def minimalMp4(id: Long): Array[Byte] = {
    require(id >= 0, "synthetic MP4 ids are non-negative")
    import java.nio.ByteBuffer
    def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val bb = ByteBuffer.allocate(len) // big-endian by default
      bb.putInt(len); bb.put(tpe.getBytes("US-ASCII"))
      payload.foreach(bb.put)
      bb.array()
    }
    val timescale = 1000 * (1 + (id % 5).toInt)
    val duration = (id % 3000).toInt + 100
    val nTracks = 1 + (id % 3).toInt
    val width = (id % 640).toInt + 16
    val height = (id % 360).toInt + 16
    val identity = Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val ftyp = {
      val bb = ByteBuffer.allocate(12)
      bb.put("isom".getBytes("US-ASCII")); bb.putInt(0)
      bb.put("isom".getBytes("US-ASCII")); bb.array()
    }
    val mvhd = {
      val bb = ByteBuffer.allocate(100)
      bb.putInt(0); bb.putInt(0); bb.putInt(0)       // v/f, ctime, mtime
      bb.putInt(timescale); bb.putInt(duration)
      bb.putInt(0x00010000); bb.putShort(0x0100.toShort) // rate, volume
      bb.putShort(0); bb.putInt(0); bb.putInt(0)     // reserved
      identity.foreach(bb.putInt)
      (0 until 6).foreach(_ => bb.putInt(0))          // pre_defined
      bb.putInt(nTracks + 1)                          // next_track_id
      bb.array()
    }
    def tkhd(trackId: Int) = {
      val bb = ByteBuffer.allocate(84)
      bb.putInt(7); bb.putInt(0); bb.putInt(0)       // v/f=enabled, times
      bb.putInt(trackId); bb.putInt(0); bb.putInt(duration)
      bb.putLong(0L)                                  // reserved
      bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
      identity.foreach(bb.putInt)
      bb.putInt(width << 16); bb.putInt(height << 16) // 16.16 fixed
      bb.array()
    }
    val traks = (1 to nTracks).map(t => box("trak", box("tkhd", tkhd(t))))
    box("ftyp", ftyp).++(box("moov", (box("mvhd", mvhd) +: traks): _*))
  }

  /** Encode one solid-gray JPEG frame at explicit quality 1.0. At q=1.0
    * ImageIO writes all-ones quantization tables, and a constant block's
    * DCT is DC-only — so a SOLID-COLOR gray frame round-trips
    * pixel-EXACTLY through the lossy codec (verified per-value in
    * MultimodalSpec). That exactness is what lets a SQL oracle state the
    * decoded means in closed form even though the frames are real JPEG. */
  private[graft] def jpegGray(v: Int, w: Int, h: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (v << 16) | (v << 8) | v
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val wr = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    wr.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
    wr.write(null, new IIOImage(img, null, null), p)
    wr.dispose()
    bos.toByteArray
  }

  /**
   * Deterministic MJPEG-in-MP4 for tests/oracles (the frame-pixel analog
   * of [[minimalMp4]]): ftyp + mdat(real JPEG frames, concatenated) +
   * moov{mvhd, trak{tkhd, mdia{mdhd, hdlr, minf{stbl{stsd('jpeg'),
   * stts, stsc, stsz, stco}}}}}. Every field is a pure function of `id`:
   * n_frames = id%5+2, frame dims = ((id%3)·8+16, (id%2)·8+16), frame k
   * is SOLID gray v_k = (37·id + 61·k) mod 256. Samples are packed TWO
   * per chunk (odd counts leave a 1-sample tail chunk), so stsc is a
   * genuinely multi-entry table on odd ids, stsz carries real varying
   * JPEG byte sizes, and stco carries real absolute file offsets — the
   * walker has to do the full ISO sample-table reconstruction, not read
   * a single run.
   */
  def mjpegMp4(id: Long): Array[Byte] = {
    require(id >= 0, "synthetic MP4 ids are non-negative")
    import java.nio.ByteBuffer
    def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val bb = ByteBuffer.allocate(len)
      bb.putInt(len); bb.put(tpe.getBytes("US-ASCII"))
      payload.foreach(bb.put)
      bb.array()
    }
    val n = (id % 5 + 2).toInt
    val w = (id % 3).toInt * 8 + 16
    val h = (id % 2).toInt * 8 + 16
    val frames = (0 until n).map(k => jpegGray(((37 * id + 61 * k) % 256).toInt, w, h))
    val ftyp = box("ftyp", {
      val bb = ByteBuffer.allocate(12)
      bb.put("isom".getBytes("US-ASCII")); bb.putInt(0)
      bb.put("isom".getBytes("US-ASCII")); bb.array()
    })
    val mdat = box("mdat", frames: _*)
    // chunking: 2 samples per chunk; chunk offsets are absolute file
    // positions, known because mdat precedes moov
    val mdatPayloadOff = ftyp.length + 8
    val sampleOffsets = frames.scanLeft(mdatPayloadOff)(_ + _.length)
    val nChunks = (n + 1) / 2
    val chunkOffsets = (0 until nChunks).map(c => sampleOffsets(2 * c))
    def full(version: Int, body: ByteBuffer => Unit, size: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(size + 4)
      bb.putInt(version << 24); body(bb); bb.array()
    }
    val mvhd = box("mvhd", full(0, bb => {
      bb.putInt(0); bb.putInt(0)                      // ctime, mtime
      bb.putInt(600); bb.putInt(n * 100)              // timescale, duration
      bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)
      bb.putInt(0); bb.putInt(0)
      Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      (0 until 6).foreach(_ => bb.putInt(0))
      bb.putInt(2)                                    // next_track_id
    }, 96))
    val tkhd = box("tkhd", full(0, bb => {
      bb.putInt(0); bb.putInt(0)                      // ctime, mtime
      bb.putInt(1); bb.putInt(0); bb.putInt(n * 100)  // track_id, rsvd, dur
      bb.putLong(0L)
      bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
      Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      bb.putInt(w << 16); bb.putInt(h << 16)
    }, 80))
    val mdhd = box("mdhd", full(0, bb => {
      bb.putInt(0); bb.putInt(0)                      // ctime, mtime
      bb.putInt(600); bb.putInt(n * 100)              // timescale, duration
      bb.putShort(0x55c4.toShort); bb.putShort(0)     // lang 'und', predef
    }, 20))
    val hdlr = box("hdlr", full(0, bb => {
      bb.putInt(0); bb.put("vide".getBytes("US-ASCII"))
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.put(0.toByte)
    }, 21))
    // VisualSampleEntry 'jpeg' (78-byte body after the 8-byte box header)
    val sampleEntry = box("jpeg", {
      val bb = ByteBuffer.allocate(78)
      bb.putInt(0); bb.putShort(0); bb.putShort(1)    // reserved, dref idx
      (0 until 4).foreach(_ => bb.putInt(0))          // pre_defined/reserved
      bb.putShort(w.toShort); bb.putShort(h.toShort)
      bb.putInt(0x00480000); bb.putInt(0x00480000)    // 72 dpi
      bb.putInt(0); bb.putShort(1)                    // reserved, frame_count
      bb.put(new Array[Byte](32))                     // compressorname
      bb.putShort(24); bb.putShort(0xffff.toShort)    // depth, pre_defined
      bb.array()
    })
    val stsd = box("stsd", full(0, bb => bb.putInt(1), 4), sampleEntry)
    val stts = box("stts", full(0, bb => {
      bb.putInt(1); bb.putInt(n); bb.putInt(100)
    }, 12))
    val stscEntries =
      if (n % 2 == 0) Seq((1, 2)) else Seq((1, 2), (nChunks, 1))
    val stsc = box("stsc", full(0, bb => {
      bb.putInt(stscEntries.length)
      stscEntries.foreach { case (fc, spc) =>
        bb.putInt(fc); bb.putInt(spc); bb.putInt(1)
      }
    }, 4 + 12 * stscEntries.length))
    val stsz = box("stsz", full(0, bb => {
      bb.putInt(0); bb.putInt(n)                      // variable sizes
      frames.foreach(f => bb.putInt(f.length))
    }, 8 + 4 * n))
    val stco = box("stco", full(0, bb => {
      bb.putInt(nChunks)
      chunkOffsets.foreach(bb.putInt)
    }, 4 + 4 * nChunks))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val trak = box("trak", tkhd, box("mdia", mdhd, hdlr, box("minf", stbl)))
    ftyp ++ mdat ++ box("moov", mvhd, trak)
  }

  /** Per-frame result of [[decodeMp4Frames]]: sample index, the stsd
    * codec fourcc, and the REAL decoded pixel stats (None when the
    * sample bytes don't decode as an image). */
  private[graft] final case class FrameStat(
      idx: Int, codec: String, stats: Option[(Int, Int, Double, Double, Double)])

  /**
   * REAL video frame-pixel decode: walk the first video track's sample
   * tables (stsc → chunk runs, stco → chunk file offsets, stsz →
   * per-sample byte sizes) to reconstruct each coded frame's absolute
   * byte range, slice it out of the payload, and decode it with the
   * same JDK ImageIO path [[imageMeta]] uses. Works for any MP4 whose
   * samples are self-contained JPEG/PNG images (MJPEG — the one video
   * family that needs no inter-frame codec); anything else yields
   * frames whose `stats` are None. None overall when the payload is
   * not ISO-BMFF or has no sample tables.
   */
  private[graft] def decodeMp4Frames(
      bytes: Array[Byte]): Option[Seq[FrameStat]] = {
    if (bytes == null || bytes.length < 16) return None
    def boxes(from: Int, until: Int) = boxWalk(bytes, from, until)
    if (new String(bytes, 4, 4, "US-ASCII") != "ftyp") return None
    val moov = boxes(0, bytes.length).collectFirst {
      case ("moov", s, e) => (s, e)
    }.getOrElse(return None)
    // first trak with a full mdia/minf/stbl chain
    val stbl = boxes(moov._1, moov._2).collect { case ("trak", s, e) =>
      boxes(s, e).collectFirst { case ("mdia", ms, me) =>
        boxes(ms, me).collectFirst { case ("minf", fs, fe) =>
          boxes(fs, fe).collectFirst { case ("stbl", bs, be) => (bs, be) }
        }.flatten
      }.flatten
    }.collectFirst { case Some(r) => r }.getOrElse(return None)
    var codec = ""
    var sizes: Array[Int] = null
    var chunkOffs: Array[Long] = null
    var stscRows: Array[(Int, Int)] = null
    boxes(stbl._1, stbl._2).foreach {
      case ("stsd", s, e) if e - s >= 16 =>
        // first sample entry's fourcc sits 4 bytes into the entry box
        codec = new String(bytes, s + 12, 4, "US-ASCII")
      case ("stsz", s, e) if e - s >= 12 =>
        val uniform = beU32(bytes, s + 4)
        val n = beU32(bytes, s + 8).toInt
        if (n >= 0 && n < (1 << 20))
          sizes =
            if (uniform != 0) Array.fill(n)(uniform.toInt)
            else if (e - s >= 12 + 4L * n)
              Array.tabulate(n)(i => beU32(bytes, s + 12 + 4 * i).toInt)
            else null
      case ("stco", s, e) if e - s >= 8 =>
        val n = beU32(bytes, s + 4).toInt
        if (n >= 0 && n < (1 << 20) && e - s >= 8 + 4L * n)
          chunkOffs = Array.tabulate(n)(i => beU32(bytes, s + 8 + 4 * i))
      case ("stsc", s, e) if e - s >= 8 =>
        val n = beU32(bytes, s + 4).toInt
        if (n >= 0 && n < (1 << 20) && e - s >= 8 + 12L * n)
          stscRows = Array.tabulate(n)(i =>
            (beU32(bytes, s + 8 + 12 * i).toInt,
             beU32(bytes, s + 12 + 12 * i).toInt))
      case _ => ()
    }
    if (sizes == null || chunkOffs == null || stscRows == null ||
        sizes.isEmpty || chunkOffs.isEmpty || stscRows.isEmpty) return None
    // ISO 14496-12 sample-to-chunk expansion: entry (first_chunk, spc)
    // applies from first_chunk until the next entry's first_chunk; the
    // last entry runs to the stco chunk count.
    val out = Seq.newBuilder[FrameStat]
    var sample = 0
    var chunk = 1
    var entry = 0
    while (chunk <= chunkOffs.length && sample < sizes.length) {
      while (entry + 1 < stscRows.length && stscRows(entry + 1)._1 <= chunk)
        entry += 1
      val spc = math.max(0, stscRows(entry)._2)
      var off = chunkOffs(chunk - 1)
      var i = 0
      while (i < spc && sample < sizes.length) {
        val sz = sizes(sample)
        val stats =
          if (off >= 0 && sz > 0 && off + sz <= bytes.length) {
            val frame = java.util.Arrays.copyOfRange(
              bytes, off.toInt, (off + sz).toInt)
            decodeImageStats(frame)
          } else None
        out += FrameStat(sample, codec, stats)
        off += sz
        sample += 1
        i += 1
      }
      chunk += 1
    }
    Some(out.result())
  }

  /** Sample COUNT from the tables alone — the stsz sample_count of the
    * first video track, with NO frame decode: the planning pass a frame
    * sampler runs BEFORE fetching any sample bytes (decide which frames
    * to decode from index metadata, then fetch only those). None for
    * non-MP4 / corrupt payloads — same contract as [[decodeMp4Meta]]. */
  private[graft] def mp4SampleCount(bytes: Array[Byte]): Option[Int] = {
    if (bytes == null || bytes.length < 16) return None
    def boxes(from: Int, until: Int) = boxWalk(bytes, from, until)
    if (new String(bytes, 4, 4, "US-ASCII") != "ftyp") return None
    val moov = boxes(0, bytes.length).collectFirst {
      case ("moov", s, e) => (s, e)
    }.getOrElse(return None)
    val stbl = boxes(moov._1, moov._2).collect { case ("trak", s, e) =>
      boxes(s, e).collectFirst { case ("mdia", ms, me) =>
        boxes(ms, me).collectFirst { case ("minf", fs, fe) =>
          boxes(fs, fe).collectFirst { case ("stbl", bs, be) => (bs, be) }
        }.flatten
      }.flatten
    }.collectFirst { case Some(r) => r }.getOrElse(return None)
    boxes(stbl._1, stbl._2).collectFirst {
      case ("stsz", s, e) if e - s >= 12 => beU32(bytes, s + 8).toInt
    }.filter(n => n >= 0 && n < (1 << 20))
  }

  /**
   * Per-payload REAL frame count from the ISO-BMFF sample tables
   * (appends `n_frames`, NULL for non-MP4/corrupt payloads) — the
   * metadata-only half of [[videoFrames]]: a sampler plans its frame
   * indices from this and fetches only the planned samples' byte
   * ranges, never the whole mdat.
   */
  def videoSampleCounts(df: DataFrame, payloadCol: String,
      batchSize: Int = 64, rebalance: Boolean = true): DataFrame = {
    val outSchema = StructType(
      df.schema :+ StructField("n_frames", IntegerType))
    val idx = df.schema.fieldIndex(payloadCol)
    val in = if (rebalance) rebalanced(df) else df
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          Row.fromSeq(r.toSeq :+
            mp4SampleCount(r.getAs[Array[Byte]](idx)).map(Int.box).orNull)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Output schema of [[videoFrames]]'s appended columns. */
  private val videoFrameFields = Seq(
    StructField("frame_idx", IntegerType),
    StructField("codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType))

  /**
   * REAL per-frame video pixel decode over a binary column: one output
   * row per coded sample in the payload's first video track, with the
   * frame's decoded dimensions and exact per-channel pixel means
   * (NULL when the sample bytes aren't a decodable image — i.e. a
   * codec this container can't carry). Non-MP4 payloads contribute
   * ZERO rows — the explode shape, like [[frameSample]], but driven by
   * the real sample tables instead of a synthesized count.
   */
  def videoFrames(df: DataFrame, payloadCol: String,
      batchSize: Int = 64, rebalance: Boolean = true): DataFrame = {
    val outSchema = StructType(df.schema ++ videoFrameFields)
    val idx = df.schema.fieldIndex(payloadCol)
    val in = if (rebalance) rebalanced(df) else df
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          decodeMp4Frames(r.getAs[Array[Byte]](idx)).toSeq.flatten.map { f =>
            val tail = f.stats
              .map { case (w, h, mr, mg, mb) =>
                Seq[Any](f.idx, f.codec, w, h, mr, mg, mb) }
              .getOrElse(Seq[Any](f.idx, f.codec, null, null, null, null, null))
            Row.fromSeq(r.toSeq ++ tail)
          }
        }
      }
    }(Encoders.row(outSchema))
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
  /**
   * REAL perceptual image hash (dHash, horizontal gradient) over a
   * binary column: decode via ImageIO, nearest-neighbor-sample 9
   * columns of the top row, Rec.601 integer luma per sample
   * (299r+587g+114b, per-mille — exact integers, no float), bit k set
   * iff luma rises from sample k to k+1. NULL when the payload is not
   * a decodable image. A full implementation samples 8 rows for 64
   * bits; the banded fixtures are vertically uniform, so the one-row
   * 8-bit signature carries every bit of signal the 64-bit form would.
   */
  def imageDHash(df: DataFrame, payloadCol: String,
      batchSize: Int = 64, rebalance: Boolean = true): DataFrame = {
    val outSchema = StructType(df.schema :+ StructField("dh", LongType))
    val idx = df.schema.fieldIndex(payloadCol)
    val in = if (rebalance) rebalanced(df) else df
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          Row.fromSeq(r.toSeq :+
            decodeDHash(r.getAs[Array[Byte]](idx)).map(Long.box).orNull)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** The dHash of one payload: 8 rising-luma bits over 9 nearest-
    * neighbor samples `x_k = k·w/9` of row 0 (integer division — the
    * same formula an oracle can state in SQL). */
  private[graft] def decodeDHash(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        def luma(x: Int): Long = {
          val rgb = img.getRGB(x, 0)
          299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)
        }
        val s = (0 to 8).map(k => luma(k * w / 9))
        Some((0 until 8).map(k =>
          if (s(k) < s(k + 1)) 1L << k else 0L).sum)
      }
    } catch { case _: Exception => None }

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

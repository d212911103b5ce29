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

  test("bandedPng → decodeImageStats: exact closed-form round trip") {
    val id = 123L
    val bytes = Multimodal.bandedPng(id)
    assert(Multimodal.looksLikeImage(bytes))
    val Some((w, h, mr, mg, mb)) = Multimodal.decodeImageStats(bytes)
    val ew = (id % 17 + 4).toInt; val eh = (id % 13 + 4).toInt
    val wa = ew / 2; val wb = ew - wa
    assert(w == ew && h == eh)
    assert(mr == (wa * (id % 256) + wb * (id * 3 % 256)).toDouble / ew)
    assert(mg == (wa * (id * 7 % 256) + wb * (id * 5 % 256)).toDouble / ew)
    assert(mb == (wa * (id * 13 % 256) + wb * (id * 11 % 256)).toDouble / ew)
  }

  test("decodeImageStats: non-image bytes and nulls → None, no throw") {
    assert(Multimodal.decodeImageStats("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImageStats(null).isEmpty)
    // PNG magic with garbage body: sniff says image, decode says no
    val liar = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)
    assert(Multimodal.looksLikeImage(liar))
    assert(Multimodal.decodeImageStats(liar).isEmpty)
    // and extractBatch's image branch falls back to the stub for it
    assert(Multimodal.imageFeatures(liar, 8).isEmpty)
  }

  test("imageMeta: decodes real PNGs distributively, NULLs for non-images") {
    val df = Seq(7L, 42L).toDF("id")
      .select(col("id"), udf((i: Long) => Multimodal.bandedPng(i)).apply(col("id")).as("payload"))
      .union(Seq((999L, "plain text".getBytes("UTF-8"))).toDF("id", "payload"))
    val out = Multimodal.imageMeta(df, "payload")
      .select("id", "width", "height", "mean_r").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(7L).getInt(1) == (7 % 17 + 4) && out(7L).getInt(2) == (7 % 13 + 4))
    assert(out(42L).getInt(1) == (42 % 17 + 4))
    assert(out(999L).isNullAt(1) && out(999L).isNullAt(3))
  }

  test("extractBatch routes WAV payloads through the real decoder") {
    val wav = Multimodal.tonePcmWav(3L)
    val df = Seq((1L, wav)).toDF("id", "payload")
    val f = Multimodal.extractBatch(df, "payload", dim = 6)
      .select("features").collect().head.getSeq[Double](0)
    assert(f == Multimodal.audioFeatures(wav, 6).get)
    assert(f(0) == 8000 * (1 + 3 % 3) / 48000.0 && f(1) == (3 % 50 + 10).toDouble)
  }

  test("extractBatch routes PNG payloads through the real decoder") {
    val png = Multimodal.bandedPng(5L)
    val df = Seq((1L, png)).toDF("id", "payload")
    val f = Multimodal.extractBatch(df, "payload", dim = 8)
      .select("features").collect().head.getSeq[Double](0)
    assert(f == Multimodal.imageFeatures(png, 8).get)
    assert(f(0) == (5 % 17 + 4).toDouble && f(1) == (5 % 13 + 4).toDouble)
  }

  test("wav decode: synthetic PCM round-trips, garbage and non-PCM are null") {
    val wav = Multimodal.tonePcmWav(7L)
    // closed-form expectations from the generator
    val n = (7L % 50 + 10).toInt
    val xs = (0 until n).map(k => (7L * 31 + k * 7) % 2001 - 1000)
    val stats = Multimodal.decodeWavStats(wav).get
    assert(stats._1 == 8000 * (1 + 7 % 3))
    assert(stats._2 == n.toLong)
    assert(math.abs(stats._3 - xs.sum.toDouble / n) < 1e-12)
    assert(stats._4 == xs.map(math.abs).max)
    // corrupt / non-WAV payloads must decode to None, not throw
    assert(Multimodal.decodeWavStats("not a wav".getBytes).isEmpty)
    assert(Multimodal.decodeWavStats(wav.take(20)).isEmpty)
    // a stereo (2-channel) header is rejected — parser demands mono PCM
    val stereo = wav.clone(); stereo(22) = 2
    assert(Multimodal.decodeWavStats(stereo).isEmpty)
    // audioMeta appends NULLs for the undecodable row
    val df = Seq((1L, wav), (2L, "junk".getBytes)).toDF("id", "payload")
    val rows = Multimodal.audioMeta(df, "payload")
      .orderBy(col("id")).collect()
    assert(rows(0).getInt(2) == stats._1 && rows(1).isNullAt(2))
  }

  test("wav decode: adversarial chunk sizes terminate and decode to None") {
    // chunk size u32 = 0xFFFFFFF8 (sz.toInt == -8): naive Int advance is
    // zero → infinite loop; the Long-clamped walk must terminate
    def corrupt(sz: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(56)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("junk".getBytes("US-ASCII")); bb.putInt(sz.toInt)
      bb.array()
    }
    for (sz <- Seq(0xFFFFFFF8L, 0xFFFFFFF7L, 0xFFFFFFF0L, 0L, 0xFFFFFFFFL)) {
      assert(Multimodal.decodeWavStats(corrupt(sz)).isEmpty)
      // and the extractBatch path falls through to the stub, no throw
      assert(Multimodal.audioFeatures(corrupt(sz), 4).isEmpty)
    }
    // a valid fmt chunk followed by a data chunk whose size lies huge:
    // dataLen clamps to the buffer, stats still come out
    val wav = Multimodal.tonePcmWav(5L)
    val lying = wav.clone()
    val bb = java.nio.ByteBuffer.wrap(lying)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue) // data chunk size field
    val st = Multimodal.decodeWavStats(lying)
    assert(st.nonEmpty && st.get._2 == (5L % 50 + 10))
  }

  test("mp4 container decode: minimal ISO-BMFF round-trips, garbage is null") {
    val mp4 = Multimodal.minimalMp4(11L)
    val (d, ts, nt, w, h) = Multimodal.decodeMp4Meta(mp4).get
    assert(d == 11 % 3000 + 100)
    assert(ts == 1000 * (1 + 11 % 5))
    assert(nt == 1 + 11 % 3)
    assert(w == 11 % 640 + 16 && h == 11 % 360 + 16)
    assert(Multimodal.decodeMp4Meta("RIFFnope".getBytes).isEmpty)
    assert(Multimodal.decodeMp4Meta(mp4.take(30)).isEmpty)
    // version-1 mvhd (64-bit times) is rejected, not mis-read
    val v1 = mp4.clone()
    val moovOff = 20 // ftyp is 20 bytes; mvhd payload starts at moov+16
    v1(moovOff + 16) = 1
    assert(Multimodal.decodeMp4Meta(v1).isEmpty)
  }

  test("jpeg q1.0: solid-gray frames round-trip pixel-EXACTLY") {
    // the exactness the multimodal_video_frames oracle rests on: at
    // explicit quality 1.0 the quant tables are all ones and a constant
    // block's DCT is DC-only, so the lossy codec is lossless HERE
    for (v <- 0 until 256 by 5; (w, h) <- Seq((16, 16), (24, 24), (32, 16), (13, 11))) {
      val st = Multimodal.decodeImageStats(Multimodal.jpegGray(v, w, h)).get
      assert(st == ((w, h, v.toDouble, v.toDouble, v.toDouble)),
        s"v=$v ${w}x$h: $st")
    }
  }

  test("mjpeg-in-mp4: sample-table walk decodes REAL frame pixels") {
    // ids cover even/odd frame counts (single vs multi-entry stsc),
    // every dim combination, and gray values that wrap mod 256
    (0L until 30L).foreach { id =>
      val frames = Multimodal.decodeMp4Frames(Multimodal.mjpegMp4(id)).get
      val n = (id % 5 + 2).toInt
      assert(frames.length == n, s"id=$id")
      frames.zipWithIndex.foreach { case (f, k) =>
        assert(f.idx == k && f.codec == "jpeg")
        val (w, h, mr, mg, mb) = f.stats.get
        assert(w == (id % 3) * 8 + 16 && h == (id % 2) * 8 + 16)
        val v = ((37 * id + 61 * k) % 256).toDouble
        assert(mr == v && mg == v && mb == v, s"id=$id k=$k: $mr vs $v")
      }
    }
    // container metadata walker still reads the same file
    val (_, ts, nt, w, _) = Multimodal.decodeMp4Meta(Multimodal.mjpegMp4(7L)).get
    assert(ts == 600 && nt == 1 && w == (7 % 3) * 8 + 16)
    // non-BMFF / truncated payloads → None, never a throw
    assert(Multimodal.decodeMp4Frames("not an mp4".getBytes).isEmpty)
    assert(Multimodal.decodeMp4Frames(Multimodal.mjpegMp4(3L).take(40)).isEmpty)
    // metadata-only MP4 (no sample tables) → None: videoFrames emits 0 rows
    assert(Multimodal.decodeMp4Frames(Multimodal.minimalMp4(3L)).isEmpty)
    // a lying stsz (sizes past EOF) → frames with null stats, no throw
    val mp4 = Multimodal.mjpegMp4(4L)
    val lying = mp4.clone()
    // find stsz and corrupt the first size field to a huge value
    val stszAt = lying.sliding(4).indexWhere(_.sameElements("stsz".getBytes))
    val bb = java.nio.ByteBuffer.wrap(lying)
    // fourcc(4) + v/f(4) + uniform(4) + count(4) → first per-sample size
    bb.putInt(stszAt + 16, Int.MaxValue)
    val lied = Multimodal.decodeMp4Frames(lying).get
    assert(lied.nonEmpty && lied.head.stats.isEmpty)
  }

  test("dhash: decode matches the generator's closed-form replay") {
    def replay(id: Long): Long = {
      val w = (id % 17) + 4
      val la = 299 * (id % 256) + 587 * (id * 7 % 256) + 114 * (id * 13 % 256)
      val lb = 299 * (id * 3 % 256) + 587 * (id * 5 % 256) + 114 * (id * 11 % 256)
      def lum(k: Long) = if (k * w / 9 < w / 2) la else lb
      (0 until 8).map(k => if (lum(k) < lum(k + 1)) 1L << k else 0L).sum
    }
    // ids spanning every width mod 17 — band edges land between
    // different sample pairs
    (0L until 40L).foreach { id =>
      val got = Multimodal.decodeDHash(Multimodal.bandedPng(id))
      assert(got.contains(replay(id)), s"id=$id: $got vs ${replay(id)}")
    }
    // non-image payloads hash to NULL, not garbage
    assert(Multimodal.decodeDHash("not a png".getBytes).isEmpty)
  }

  test("audio fingerprint: decode matches the generator's replay") {
    def replay(id: Long): (Int, Int, Long) = {
      val n = (id % 50 + 10).toInt
      val rate = 8000 * (1 + (id % 3).toInt)
      val nw = math.min(n / 16, 16)
      var fp = 0L
      for (w <- 0 until nw) {
        val sa = (0 until 16).map(k =>
          math.abs((id * 31 + (w * 16 + k) * 7) % 2001 - 1000)).sum
        fp |= (sa / 4001L) << (2 * w)
      }
      (rate, nw, fp)
    }
    (0L until 60L).foreach { id =>  // covers every n mod 50, incl nw=0
      val got = Multimodal.decodeWavFingerprint(Multimodal.tonePcmWav(id))
      assert(got.contains(replay(id)), s"id=$id: $got vs ${replay(id)}")
    }
    assert(Multimodal.decodeWavFingerprint("RIFFnope".getBytes).isEmpty)
  }

  test("metadata struct round-trips through the schema") {
    val df = payloads.withColumn("meta", struct(
      col("kind"), lit(640).as("width"), lit(480).as("height"),
      lit(null).cast("int").as("sample_rate"), lit(null).cast("int").as("n_frames")))
    val r = df.select(col("meta.kind"), col("meta.width")).collect().head
    assert(r.getString(0) == "image" && r.getInt(1) == 640)
  }
}

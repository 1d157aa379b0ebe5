package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{FakeCodec, MediaMeta}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def available = new java.io.File(s"$sf/documents.parquet").exists()

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables.documents(spark, sf))

  test("media table schema: opaque binary payload + typed metadata struct") {
    assume(available)
    val schema = media.schema
    schema("payload").dataType.typeName shouldBe "binary"
    schema("meta").dataType.typeName shouldBe "struct"
    media.count() should be > 0L
    col1(media.select("kind").distinct()) shouldBe Seq("audio", "image", "video")
  }

  test("feature extraction is deterministic and batch-shaped") {
    assume(available)
    val f1 = Multimodal.extractFeatures(Multimodal.spreadForDecode(media))
      .orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    f1.map(_.mean).toSeq shouldBe f2.map(_.mean).toSeq // partitioning-invariant
    f1.foreach { f =>
      f.n_bytes should be > 0
      f.mean should (be >= 0.0 and be <= 255.0)
    }
  }

  test("resize changes image payload + metadata, passes others through") {
    assume(available)
    val resized = Multimodal.resizeImages(media, 8, 8)
    val img = resized.filter($"kind" === "image").head()
    img.meta.width shouldBe 8
    img.meta.height shouldBe 8
    img.payload.length shouldBe (8 * 8 * 3)
    val audioBefore = media.filter($"kind" === "audio").head()
    val audioAfter = resized.filter($"kind" === "audio" &&
      $"media_id" === audioBefore.media_id).head()
    audioAfter.payload.toSeq shouldBe audioBefore.payload.toSeq
  }

  test("video frame sampling expands rows with the expected cardinality") {
    assume(available)
    val one = media.filter($"kind" === "video").orderBy("media_id").head()
    val fps = 25
    val expected = math.max(1, (one.meta.durationMs * fps / 1000).toInt)
    val frames = Multimodal.sampleVideoFrames(
      media.filter($"media_id" === one.media_id), everyNth = 10)
    frames.count() shouldBe ((expected + 9) / 10)
    frames.head().payload.length should be > 0
  }

  test("metadata-only scan prunes the payload column out of the plan") {
    assume(available)
    val summary = Multimodal.metadataSummary(media)
    summary.count() shouldBe 3
    // the optimized scan must not read the payload bytes
    val plan = summary.queryExecution.optimizedPlan.toString
    plan.toLowerCase should not include "payload"
  }

  test("FakeCodec stub: decode size follows metadata, resize strides down") {
    val meta = MediaMeta(16, 16, 3, 0, 0, "jpeg")
    val d = FakeCodec.decode("abc".getBytes, meta)
    d.length shouldBe (16 * 16 * 3)
    FakeCodec.decode("abc".getBytes, meta).toSeq shouldBe d.toSeq // deterministic
    FakeCodec.resize(d, meta, 4, 4).length shouldBe (4 * 4 * 3)
  }

  test("perceptualHash: deterministic, payload-sensitive, duplicate-stable") {
    assume(available)
    val m = Multimodal.spreadForDecode(media.limit(50))
    val h1 = Multimodal.perceptualHash(m).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("phash")).toMap
    val h2 = Multimodal.perceptualHash(m).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("phash")).toMap
    h1 shouldBe h2 // bit-stable across runs
    h1.values.toSet.size should be > 1 // payload-sensitive, not constant
  }

  test("perceptualHash: identical payload+meta hash identically") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", "same-bytes".getBytes,
        MediaMeta(16, 16, 3, 0, 0, "jpeg")),
      Multimodal.MediaRow(2L, "image", "same-bytes".getBytes,
        MediaMeta(16, 16, 3, 0, 0, "jpeg")),
      Multimodal.MediaRow(3L, "image", "other-bytes".getBytes,
        MediaMeta(16, 16, 3, 0, 0, "jpeg"))).toDS()
    val h = Multimodal.perceptualHash(rows).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("phash")).toMap
    h(1L) shouldBe h(2L)
    h(1L) should not be h(3L)
    // banding over the hashes finds exactly the duplicate pair at Hamming 0
    val pairs = graft.operators.Corpus.bandedHammingPairs(
      Multimodal.perceptualHash(rows), "media_id", "phash",
      maxHamming = 0, bits = 64, numBands = 4).collect()
    pairs.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
      r.getAs[Int]("hamming"))).toSeq shouldBe Seq((1L, 2L, 0))
  }

  test("the MediaCodec seam: an alternate codec drops in without " +
      "touching the plumbing; the default stays FakeCodec") {
    assume(available)
    // constant-byte codec: every decoded byte is 7 — distinguishable from
    // FakeCodec's hash avalanche in every downstream statistic
    object ConstCodec extends Multimodal.MediaCodec {
      override def decode(payload: Array[Byte],
                          meta: MediaMeta): Array[Byte] =
        Array.fill(FakeCodec.decode(payload, meta).length)(7.toByte)
      override def resize(decoded: Array[Byte], from: MediaMeta,
                          w: Int, h: Int): Array[Byte] =
        FakeCodec.resize(decoded, from, w, h)
      override def sampleFrames(row: Multimodal.MediaRow,
                                everyNth: Int): Iterator[Multimodal.Frame] =
        FakeCodec.sampleFrames(row, everyNth).map(f =>
          f.copy(payload = Array.fill(f.payload.length)(7.toByte)))
    }
    val sample = media.limit(30)
    // same byte counts (metadata-implied size), different content stats
    val const = Multimodal.extractFeatures(sample, ConstCodec)
      .orderBy("media_id").collect()
    val fake = Multimodal.extractFeatures(sample)
      .orderBy("media_id").collect()
    const.map(_.n_bytes).toSeq shouldBe fake.map(_.n_bytes).toSeq
    all(const.map(_.mean)) shouldBe 7.0
    all(const.map(_.std)) shouldBe 0.0
    fake.map(_.mean).toSet.size should be > 1
    // a constant stream sets no phash bit (no block exceeds the mean)
    Multimodal.perceptualHash(sample, codec = ConstCodec).collect()
      .foreach(_.getAs[Long]("phash") shouldBe 0L)
    // frame sampling routes through the seam too
    val frames = Multimodal.sampleVideoFrames(
      sample.filter(col("kind") === "video").limit(2), everyNth = 20,
      codec = ConstCodec).collect()
    frames should not be empty
    frames.foreach(_.payload.forall(_ == 7.toByte) shouldBe true)
  }

  /** A minimal valid 24-bit uncompressed BMP: `h` rows of `w` pixels,
    * left half black, right half white (BMP stores rows bottom-up with
    * 4-byte row padding; symmetric content keeps the expectation easy). */
  private def halfAndHalfBmp(w: Int, h: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)                        // pixel-data offset
    buf.putInt(40).putInt(w).putInt(h)             // BITMAPINFOHEADER
      .putShort(1).putShort(24)                    // planes, bpp
      .putInt(0).putInt(dataSize)                  // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until h).foreach { _ =>
      (0 until w).foreach { x =>
        val v: Byte = if (x < w / 2) 0 else -1     // 0x00 / 0xFF
        buf.put(v).put(v).put(v)                   // BGR
      }
      (w * 3 until rowBytes).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  test("REAL codec through the seam: ImageIoCodec decodes a 2-color BMP " +
    "and the phash matches the hand-computed fingerprint") {
    val (w, h) = (16, 8)
    val bmp = halfAndHalfBmp(w, h)
    // sanity outside Spark: 384 RGB bytes, half 0x00 half 0xFF
    val decoded = Multimodal.ImageIoCodec.decode(bmp,
      MediaMeta(w, h, 3, 0, 0L, "bmp"))
    decoded.length shouldBe w * h * 3
    decoded.count(_ == 0.toByte) shouldBe w * h * 3 / 2
    // through the SAME Spark operators the stub runs under — only the
    // codec parameter changes
    val media = Seq(Multimodal.MediaRow(1L, "image", bmp,
      MediaMeta(w, h, 3, 0, 0L, "bmp"))).toDS()
    val feats = Multimodal.extractFeatures(media,
      codec = Multimodal.ImageIoCodec).collect()(0)
    feats.n_bytes shouldBe w * h * 3
    feats.mean shouldBe 127.5
    feats.p_zero shouldBe 0.5
    // hand-computed average-hash: 64 blocks of 6 bytes over 384 bytes;
    // each 48-byte row = 8 blocks (4 black, 4 white) -> bit pattern
    // 11110000 repeating, i.e. 0xF0F0F0F0F0F0F0F0
    val ph = Multimodal.perceptualHash(media,
      codec = Multimodal.ImageIoCodec).collect()(0)
    ph.getAs[Long]("phash") shouldBe 0xF0F0F0F0F0F0F0F0L
    // nearest-neighbor resize through the seam keeps the halves
    val resized = Multimodal.resizeImages(media, 8, 4,
      codec = Multimodal.ImageIoCodec).collect()(0)
    resized.payload.length shouldBe 8 * 4 * 3
    resized.payload.count(_ == 0.toByte) shouldBe 8 * 4 * 3 / 2
    // the stub-backed oracle queries are untouched by the real codec's
    // existence: video sampling through a still-image codec fails loud
    an[Exception] should be thrownBy
      Multimodal.ImageIoCodec.sampleFrames(
        Multimodal.MediaRow(2L, "video", bmp,
          MediaMeta(w, h, 3, 0, 1000L, "mp4")), 5)
  }

  /** A minimal 8-bit unsigned PCM WAV hand-built byte by byte —
    * independent of [[Multimodal.encodeWavPcm16]], so the 8-bit decode
    * path is proven against raw RIFF bytes, not our own writer. */
  private def wav8(samples: Array[Int], rate: Int): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii)).putInt(36 + samples.length)
      .put("WAVE".getBytes(ascii))
      .put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate)
      .putShort(1).putShort(8)
      .put("data".getBytes(ascii)).putInt(samples.length)
    samples.foreach(s => bb.put(s.toByte))
    bb.array()
  }

  test("REAL audio codec through the seam: WavCodec decodes a hand-" +
      "synthesized square wave to the exact hand-computed bytes, " +
      "features, and fingerprint") {
    // 64-sample 16-bit mono square wave: 32 samples at (191-128)<<8,
    // 32 at (64-128)<<8 — decode maps them back to bytes 191 / 64
    val samples = (Array.fill(32)(16128) ++ Array.fill(32)(-16384))
      .map(_.toShort)
    val wav = Multimodal.encodeWavPcm16(samples, 16000)
    val meta = MediaMeta(8, 8, 1, 16000, 4L, "wav")
    val decoded = Multimodal.WavCodec.decode(wav, meta)
    decoded.length shouldBe 64
    decoded.take(32).foreach(_ shouldBe 191.toByte)
    decoded.drop(32).foreach(_ shouldBe 64.toByte)
    // through the SAME Spark operators the stub runs under
    val media = Seq(Multimodal.MediaRow(1L, "audio", wav, meta)).toDS()
    val feats = Multimodal.extractFeatures(media,
      codec = Multimodal.WavCodec).collect()(0)
    feats.n_bytes shouldBe 64
    feats.mean shouldBe 127.5   // (32*191 + 32*64) / 64
    feats.std shouldBe 63.5     // sqrt(1298464/64 - 127.5^2) exactly
    feats.p_zero shouldBe 0.0
    // average-hash: 64 blocks of 1 byte; the loud half sets bits 0..31
    Multimodal.perceptualHash(media, codec = Multimodal.WavCodec)
      .collect()(0).getAs[Long]("phash") shouldBe 0x00000000FFFFFFFFL
    // resample through the seam's dims-product contract: 64 -> 32
    val res = Multimodal.WavCodec.resize(decoded, meta, 8, 4)
    res.length shouldBe 32
    res.take(16).foreach(_ shouldBe 191.toByte)
    res.drop(16).foreach(_ shouldBe 64.toByte)
    // fixed windows: 4 windows of 16 samples, every 2nd emitted
    val wins = Multimodal.sampleAudioWindows(media, windowSamples = 16,
      everyNth = 2, codec = Multimodal.WavCodec)
      .collect().sortBy(_.frame_no)
    wins.map(_.frame_no).toSeq shouldBe Seq(0, 2)
    wins(0).payload.toSeq shouldBe Seq.fill(16)(191.toByte)
    wins(1).payload.toSeq shouldBe Seq.fill(16)(64.toByte)
    // a constant window sets no fingerprint bit
    Multimodal.windowFingerprints(
        Multimodal.sampleAudioWindows(media, 16,
          codec = Multimodal.WavCodec)).collect()
      .foreach(_.getAs[Long]("phash") shouldBe 0L)
    // video sampling through an audio codec fails loud
    an[Exception] should be thrownBy
      Multimodal.WavCodec.sampleFrames(
        Multimodal.MediaRow(2L, "video", wav, meta), 5)
    // non-WAV bytes fail loud, not as garbage features
    an[IllegalArgumentException] should be thrownBy
      Multimodal.WavCodec.decode("not audio".getBytes, meta)
  }

  test("REAL video codec through the seam: AviCodec walks the RIFF " +
      "container and decodes BMP frames to the exact hand-computed RGB") {
    val (w, h) = (16, 8)
    val bmp = halfAndHalfBmp(w, h)
    val avi = Multimodal.encodeAvi(Seq.fill(5)(bmp), w, h)
    val meta = MediaMeta(w, h, 3, 0, 200L, "avi")
    // thumbnail contract: decode == the first frame's RGB
    val thumb = Multimodal.AviCodec.decode(avi, meta)
    thumb.length shouldBe w * h * 3
    thumb.count(_ == 0.toByte) shouldBe w * h * 3 / 2
    // through the SAME Spark frame-sampling operator the stub runs under
    val media = Seq(Multimodal.MediaRow(1L, "video", avi, meta)).toDS()
    val frames = Multimodal.sampleVideoFrames(media, everyNth = 2,
      codec = Multimodal.AviCodec).collect().sortBy(_.frame_no)
    frames.map(_.frame_no).toSeq shouldBe Seq(0, 2, 4)
    frames.foreach { f =>
      f.payload.length shouldBe w * h * 3
      f.payload.count(_ == 0.toByte) shouldBe w * h * 3 / 2
    }
    // per-frame fingerprints over the real decode: the half/half frame
    // hashes exactly like the still-image test's hand computation
    Multimodal.windowFingerprints(
        Multimodal.sampleVideoFrames(media, everyNth = 2,
          codec = Multimodal.AviCodec)).collect()
      .foreach(_.getAs[Long]("phash") shouldBe 0xF0F0F0F0F0F0F0F0L)
    // resize shares the still codec's deterministic grid
    Multimodal.AviCodec.resize(thumb, meta, 8, 4).length shouldBe 8 * 4 * 3
    // non-AVI payloads fail loudly (a WAV is RIFF but not 'AVI ')
    an[Exception] should be thrownBy Multimodal.AviCodec.decode(
      Multimodal.encodeWavPcm16(Array[Short](0, 0), 16000), meta)
    an[Exception] should be thrownBy
      Multimodal.AviCodec.decode("garbage".getBytes, meta)
  }

  test("MJPEG through the seam: JPEG frames ride the same ImageIO call " +
      "— decode is stable and fingerprints match the lossless twin") {
    val (w, h) = (16, 8)
    // the halfAndHalfBmp image as a JPEG: left half black, right white
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    })
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb) shouldBe true
    val jpeg = jb.toByteArray
    val avi = Multimodal.encodeAvi(Seq.fill(4)(jpeg), w, h)
    val meta = MediaMeta(w, h, 3, 0, avi.length, "avi")
    // decode STABILITY: same bytes in, identical RGB out, every time
    val d1 = Multimodal.AviCodec.decode(avi, meta)
    val d2 = Multimodal.AviCodec.decode(avi, meta)
    d1.length shouldBe w * h * 3
    d1.toSeq shouldBe d2.toSeq
    // lossy but BOUNDED: each half's pixels stay near their lossless
    // value (ringing at the edge is the JPEG price — bounded, not wild)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val v = d1((y * w + x) * 3) & 0xff
        if (x < w / 2 - 1) v should be <= 80
        else if (x > w / 2) v should be >= 175
      }
    }
    // the Spark sampling operator + fingerprints: deterministic across
    // runs AND equal to the lossless (BMP-frame) twin's phash — the
    // block means sit far from the global mean, so JPEG noise cannot
    // flip a bit
    val media = Seq(Multimodal.MediaRow(7L, "video", avi, meta)).toDS()
    val ph1 = Multimodal.windowFingerprints(
        Multimodal.sampleVideoFrames(media, everyNth = 1,
          codec = Multimodal.AviCodec)).collect()
      .map(r => r.getAs[Int]("frame_no") -> r.getAs[Long]("phash"))
      .sortBy(_._1)
    val ph2 = Multimodal.windowFingerprints(
        Multimodal.sampleVideoFrames(media, everyNth = 1,
          codec = Multimodal.AviCodec)).collect()
      .map(r => r.getAs[Int]("frame_no") -> r.getAs[Long]("phash"))
      .sortBy(_._1)
    ph1.toSeq shouldBe ph2.toSeq
    ph1.map(_._1).toSeq shouldBe Seq(0, 1, 2, 3)
    ph1.foreach(_._2 shouldBe 0xF0F0F0F0F0F0F0F0L) // the BMP twin's hash
  }

  test("WavCodec: stereo channels integer-mix; raw 8-bit unsigned PCM " +
      "passes through as identity") {
    // stereo frames (L=1000, R=3000): mixed 2000 -> byte 135
    val stereo = Multimodal.encodeWavPcm16(
      Array.fill(8)(Array(1000, 3000)).flatten.map(_.toShort),
      16000, channels = 2)
    val meta = MediaMeta(8, 1, 2, 16000, 1L, "wav")
    val mixed = Multimodal.WavCodec.decode(stereo, meta)
    mixed.length shouldBe 8
    mixed.foreach(_ shouldBe 135.toByte)
    // 8-bit unsigned WAV: decode is the identity on the stored bytes
    val raw = wav8(Array(0, 1, 127, 128, 200, 255), 8000)
    Multimodal.WavCodec.decode(raw, meta.copy(channels = 1))
      .map(_ & 0xff).toSeq shouldBe Seq(0, 1, 127, 128, 200, 255)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (SURVEY §7.7 extension).
  *
  * Media are opaque `binary` payloads plus a typed metadata struct — the
  * lakehouse-standard shape (same as HuggingFace datasets' Image/Audio
  * columns or Spark's own `binaryFile` source). All the Spark-side plumbing
  * is real and tested: schemas, per-partition batched processing, kind
  * dispatch, frame-explosion, and partitioning. The codec itself is a
  * clearly-marked DETERMINISTIC STUB (`FakeCodec`) because no image/audio
  * libraries exist in this container: it synthesizes pixel/sample bytes
  * from a seeded hash of the payload, so every test is reproducible and the
  * operator shape (batch in → batch out, bounded memory per partition) is
  * exactly what a real libjpeg/ffmpeg binding would drop into.
  *
  * Scale shape: decode/feature-extract run as `mapPartitions` over the
  * payload column only after column pruning — a scan that needs metadata
  * never touches bytes. Partition count governs decode parallelism;
  * `spreadForDecode` rebalances skewed media sizes before the CPU-heavy
  * stage (same rationale as NearDup.spread).
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int,
                             sampleRate: Int, durationMs: Long, format: String)
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 mean: Double, std: Double, p_zero: Double)
  final case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])

  /** The native-codec SEAM: every byte-level media operation goes
    * through exactly these three functions, and every operator below
    * takes the codec as a parameter (default [[FakeCodec]]) — a real
    * libjpeg/ffmpeg binding drops in outside this sandbox without
    * touching the oracled Spark plumbing. Implementations must be
    * Serializable: the codec rides into `mapPartitions` closures. */
  trait MediaCodec extends Serializable {
    /** Decode a payload to raw bytes of the metadata-implied size. */
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Byte]
    /** Resize decoded bytes to the target dimensions. */
    def resize(decoded: Array[Byte], from: MediaMeta, w: Int,
               h: Int): Array[Byte]
    /** Frame-sample a video payload. */
    def sampleFrames(row: MediaRow, everyNth: Int): Iterator[Frame]
  }

  /** DETERMINISTIC STUB implementation of the [[MediaCodec]] seam (no
    * image/audio libraries exist in this container): synthesizes
    * pixel/sample bytes from a seeded hash of the payload, so every test
    * is reproducible and the operator shape (batch in -> batch out,
    * bounded memory per partition) is exactly what a real binding would
    * drop into. */
  object FakeCodec extends MediaCodec {
    override def decode(payload: Array[Byte], meta: MediaMeta): Array[Byte] = {
      val n = math.max(1, meta.width * meta.height * math.max(meta.channels, 1))
      val out = new Array[Byte](math.min(n, 1 << 16)) // cap for tests
      var h = payload.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
      var i = 0
      while (i < out.length) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = (h >>> 56).toByte
        i += 1
      }
      out
    }

    /** Deterministic stride subsample to the target dimensions. */
    override def resize(decoded: Array[Byte], from: MediaMeta, w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, w * h * math.max(from.channels, 1))
      val stride = math.max(1, decoded.length / target)
      decoded.indices.by(stride).take(target).map(decoded).toArray
    }

    /** One pseudo-frame per sampled index. */
    override def sampleFrames(row: MediaRow, everyNth: Int): Iterator[Frame] = {
      val fps = 25
      val nFrames = math.max(1, (row.meta.durationMs * fps / 1000).toInt)
      Iterator.range(0, nFrames, everyNth).map { f =>
        decodeFrameStub(row, f)
      }
    }
    private def decodeFrameStub(row: MediaRow, f: Int): Frame =
      Frame(row.media_id, f,
        decode(row.payload :+ (f & 0xff).toByte,
          row.meta.copy(width = row.meta.width / 8, height = row.meta.height / 8)))
  }

  /** REAL still-image codec over the JDK's pure-Java ImageIO readers
    * (BMP/PNG/GIF decoders ship with the JDK — no native dependencies):
    * the proof that the [[MediaCodec]] seam holds beyond the stub. A
    * user bringing real images swaps `codec = ImageIoCodec` into the
    * SAME operators ([[extractFeatures]], [[perceptualHash]],
    * [[resizeImages]]) and nothing else moves — the oracled Spark
    * plumbing (schemas, partition-batched decode, banding) is
    * codec-blind. Decode emits top-down row-major RGB (3 bytes/pixel)
    * from the image's OWN dimensions (a real codec trusts the payload,
    * not the metadata); resize is deterministic nearest-neighbor (no
    * AWT rendering pipeline, so results are bit-stable across JVMs);
    * frame sampling needs a video container parser and fails loudly. */
  object ImageIoCodec extends MediaCodec {
    override def decode(payload: Array[Byte], meta: MediaMeta): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null,
        s"ImageIO could not decode a '${meta.format}' payload " +
          s"(${payload.length} bytes)")
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Byte](w * h * 3)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(i) = ((rgb >> 16) & 0xff).toByte
          out(i + 1) = ((rgb >> 8) & 0xff).toByte
          out(i + 2) = (rgb & 0xff).toByte
          i += 3
          x += 1
        }
        y += 1
      }
      out
    }

    /** Nearest-neighbor over the decoded RGB grid. */
    override def resize(decoded: Array[Byte], from: MediaMeta, w: Int,
                        h: Int): Array[Byte] = {
      require(decoded.length == from.width * from.height * 3,
        s"decoded length ${decoded.length} is not ${from.width}x" +
          s"${from.height}x3 — resize needs the true source dimensions")
      val out = new Array[Byte](w * h * 3)
      var ty = 0
      while (ty < h) {
        val sy = ty * from.height / h
        var tx = 0
        while (tx < w) {
          val sx = tx * from.width / w
          val s = (sy * from.width + sx) * 3
          val t = (ty * w + tx) * 3
          out(t) = decoded(s)
          out(t + 1) = decoded(s + 1)
          out(t + 2) = decoded(s + 2)
          tx += 1
        }
        ty += 1
      }
      out
    }

    override def sampleFrames(row: MediaRow, everyNth: Int): Iterator[Frame] =
      throw new UnsupportedOperationException(
        "ImageIoCodec decodes still images; video frame sampling needs a " +
          "container-format codec behind the same seam")
  }

  /** REAL audio codec over the JDK's `javax.sound.sampled` WAV parser
    * (pure JVM, no native dependencies) — the audio-side proof of the
    * [[MediaCodec]] seam, the sibling of [[ImageIoCodec]]. Decode emits
    * 8-bit unsigned MONO PCM: each sample frame's channels are summed and
    * integer-averaged at 16-bit precision, then mapped to
    * `(mixed >> 8) + 128` — all exact integer math, so any engine that
    * knows the source waveform replays the bytes bit-for-bit (the q371
    * oracle). Accepts PCM_SIGNED 16-bit and PCM_UNSIGNED 8-bit WAVs,
    * either endianness; anything else fails loudly (a codec that guesses
    * emits garbage features silently). `resize` is deterministic
    * nearest-neighbor RESAMPLING to `w*h` samples (the dims product is
    * the seam's size contract); video frame sampling fails loudly. */
  object WavCodec extends MediaCodec {
    import javax.sound.sampled.AudioFormat

    override def decode(payload: Array[Byte], meta: MediaMeta): Array[Byte] = {
      val in = try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"not a parseable WAV payload (${payload.length} bytes, " +
                s"declared format '${meta.format}')", e)
        }
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        require((fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            bits == 16) ||
          (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8),
          s"WavCodec handles PCM_SIGNED/16-bit and PCM_UNSIGNED/8-bit " +
            s"WAVs; got ${fmt.getEncoding}/$bits-bit")
        val raw = in.readAllBytes()
        val frameBytes = (bits / 8) * ch
        val nFrames = raw.length / frameBytes
        val out = new Array[Byte](nFrames)
        var f = 0
        while (f < nFrames) {
          var sum = 0L
          var c = 0
          while (c < ch) {
            val o = f * frameBytes + c * (bits / 8)
            val s =
              if (bits == 8) ((raw(o) & 0xff) - 128) << 8
              else if (fmt.isBigEndian) (raw(o) << 8) | (raw(o + 1) & 0xff)
              else (raw(o + 1) << 8) | (raw(o) & 0xff)
            sum += s
            c += 1
          }
          out(f) = (((sum / ch) >> 8) + 128).toByte
          f += 1
        }
        out
      } finally in.close()
    }

    /** Nearest-neighbor resample of the 8-bit mono stream to `w*h`
      * samples — audio's reading of the seam's dims-product contract. */
    override def resize(decoded: Array[Byte], from: MediaMeta, w: Int,
                        h: Int): Array[Byte] = {
      require(decoded.nonEmpty, "cannot resample an empty PCM stream")
      val target = math.max(1, w * h)
      val out = new Array[Byte](target)
      var t = 0
      while (t < target) {
        out(t) = decoded((t.toLong * decoded.length / target).toInt)
        t += 1
      }
      out
    }

    override def sampleFrames(row: MediaRow, everyNth: Int): Iterator[Frame] =
      throw new UnsupportedOperationException(
        "WavCodec decodes audio; video frame sampling needs a " +
          "container-format codec behind the same seam")
  }

  /** REAL video-container codec over the RIFF/AVI format — the last
    * side of the [[MediaCodec]] seam proven with a real parser. AVI is
    * a pure RIFF container: the codec walks the chunk tree to the
    * `movi` LIST and yields each `##dc`/`##db` chunk as one video
    * frame, decoded through the JDK's ImageIO exactly like
    * [[ImageIoCodec]] stills (so an AVI carrying BMP/PNG frames —
    * lossless, bit-deterministic — decodes to hand-computable RGB; an
    * MJPEG file's JPEG frames decode through the same call). decode()
    * is the thumbnail contract: the FIRST frame's RGB. resize shares
    * [[ImageIoCodec]]'s nearest-neighbor grid. Truncated or non-AVI
    * payloads fail loudly — no silent garbage frames. */
  object AviCodec extends MediaCodec {
    override def decode(payload: Array[Byte], meta: MediaMeta): Array[Byte] = {
      val it = frameChunks(payload)
      require(it.hasNext, s"AVI payload (${payload.length} bytes, " +
        s"declared '${meta.format}') holds no video frame chunks")
      decodeFrame(it.next())
    }

    override def resize(decoded: Array[Byte], from: MediaMeta, w: Int,
                        h: Int): Array[Byte] =
      ImageIoCodec.resize(decoded, from, w, h)

    override def sampleFrames(row: MediaRow, everyNth: Int): Iterator[Frame] = {
      require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
      frameChunks(row.payload).zipWithIndex
        .filter(_._2 % everyNth == 0)
        .map { case (bytes, i) => Frame(row.media_id, i, decodeFrame(bytes)) }
    }

    private def decodeFrame(bytes: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null,
        s"ImageIO could not decode a video frame chunk (${bytes.length} " +
          "bytes) — unsupported frame encoding")
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Byte](w * h * 3)
      var i = 0; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(i) = ((rgb >> 16) & 0xff).toByte
          out(i + 1) = ((rgb >> 8) & 0xff).toByte
          out(i + 2) = (rgb & 0xff).toByte
          i += 3; x += 1
        }
        y += 1
      }
      out
    }

    /** Frame data chunks (`##dc`/`##db`) from the AVI's `movi` LIST, in
      * container order. Strict RIFF walk: malformed sizes fail loudly. */
    private def frameChunks(payload: Array[Byte]): Iterator[Array[Byte]] = {
      def fourcc(o: Int) = new String(payload, o, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      def u32(o: Int): Long =
        (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
          ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
      require(payload.length >= 12 && fourcc(0) == "RIFF" &&
        fourcc(8) == "AVI ",
        s"not an AVI payload (${payload.length} bytes)")
      // find the movi LIST at the top chunk level
      var o = 12
      var movi = -1
      var moviEnd = -1
      while (movi < 0 && o + 8 <= payload.length) {
        val id = fourcc(o)
        val sz = u32(o + 4).toInt
        require(sz >= 0 && o + 8 + sz <= payload.length,
          s"truncated AVI chunk '$id' at offset $o")
        if (id == "LIST" && sz >= 4 && fourcc(o + 8) == "movi") {
          movi = o + 12; moviEnd = o + 8 + sz
        }
        o += 8 + sz + (sz & 1) // chunks pad to even
      }
      require(movi >= 0, "AVI payload has no movi LIST")
      new Iterator[Array[Byte]] {
        private var p = movi
        private def isFrame(id: String) =
          id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.substring(2) == "dc" || id.substring(2) == "db")
        private def skipToFrame(): Unit =
          while (p + 8 <= moviEnd && !isFrame(fourcc(p))) {
            val sz = u32(p + 4).toInt
            require(sz >= 0 && p + 8 + sz <= moviEnd,
              s"truncated AVI movi chunk at offset $p")
            p += 8 + sz + (sz & 1)
          }
        override def hasNext: Boolean = { skipToFrame(); p + 8 <= moviEnd }
        override def next(): Array[Byte] = {
          skipToFrame()
          require(hasNext, "no more AVI frames")
          val sz = u32(p + 4).toInt
          require(sz >= 0 && p + 8 + sz <= moviEnd,
            s"truncated AVI frame chunk at offset $p")
          val out = java.util.Arrays.copyOfRange(payload, p + 8, p + 8 + sz)
          p += 8 + sz + (sz & 1)
          out
        }
      }
    }
  }

  /** Deterministic RIFF/AVI writer: one `00dc` chunk per frame payload
    * (any ImageIO-decodable image bytes — BMP/PNG for bit-determinism,
    * JPEG for real MJPEG), minimal-but-correct `hdrl` headers. The
    * encode half of [[AviCodec]], the [[encodeWavPcm16]] of video. */
  def encodeAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
                fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty && w >= 1 && h >= 1 && fps >= 1,
      s"bad AVI shape: ${frames.size} frames, ${w}x$h @ $fps")
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def even(n: Int) = n + (n & 1)
    val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40))
    val moviSize = 4 + frames.map(f => 8 + even(f.length)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String) = bb.put(s.getBytes(ascii))
    cc("RIFF"); bb.putInt(riffSize); cc("AVI ")
    cc("LIST"); bb.putInt(hdrlSize); cc("hdrl")
    cc("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
      .putInt(frames.size).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); cc("strl")
    cc("strh"); bb.putInt(56)
    cc("vids"); cc("MJPG")
    bb.putInt(0).putInt(0).putInt(0) // flags, prio+lang, initialFrames
      .putInt(1).putInt(fps)         // scale, rate
      .putInt(0).putInt(frames.size) // start, length
      .putInt(0).putInt(-1).putInt(0) // bufSize, quality, sampleSize
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    cc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    cc("MJPG")
    bb.putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); bb.putInt(moviSize); cc("movi")
    frames.foreach { f =>
      cc("00dc"); bb.putInt(f.length); bb.put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
    }
    bb.array()
  }

  /** Deterministic RIFF/WAVE writer for 16-bit signed little-endian PCM —
    * the encode half of [[WavCodec]] (fixture synthesis, and the sink
    * shape for writing audio back out). Interleaved samples, frame count
    * = samples.length / channels. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
                     channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && sampleRate >= 1 &&
      samples.length % channels == 0,
      s"bad WAV shape: ${samples.length} samples, $channels channels, " +
        s"rate $sampleRate")
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
      .put("WAVE".getBytes(ascii))
      .put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes(ascii)).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Build a media table from the documents test table (no binary test
    * fixture ships with the driver data): payload = utf8 text bytes, kind
    * and metadata derived deterministically from doc attributes. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(16)) + 8).cast("int").as("width"),
        (pmod(col("doc_id"), lit(12)) + 8).cast("int").as("height"),
        lit(3).as("channels"),
        lit(16000).as("sampleRate"),
        (pmod(col("doc_id"), lit(5000)) + 1000).cast("long").as("durationMs"),
        element_at(array(lit("jpeg"), lit("wav"), lit("mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("format")).as("meta"))
      .as[MediaRow]
  }

  /** Rebalance before CPU-heavy decode (media sizes are often skewed). */
  def spreadForDecode(media: Dataset[MediaRow]): Dataset[MediaRow] =
    media.repartition(media.sparkSession.sparkContext.defaultParallelism,
      col("media_id"))

  /** Decode + feature-extract, batched per partition (the Scala analogue
    * of a Pandas-UDF `mapInPandas`: one iterator in, one iterator out,
    * bounded memory, no per-row function-call overhead).
    *
    * Moments are accumulated as exact integers (sum, sum-of-squares ≤ 2^53)
    * and only converted to double at the end, so the result is independent
    * of summation order AND reproducible bit-for-bit by any engine that can
    * run the LCG — which is what makes the q55 DuckDB oracle possible. */
  def extractFeatures(media: Dataset[MediaRow],
                      codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = codec.decode(r.payload, r.meta)
        val n = bytes.length
        var s = 0L; var sq = 0L; var z = 0L
        var i = 0
        while (i < n) {
          val v = (bytes(i) & 0xff).toLong
          s += v; sq += v * v
          if (v == 0L) z += 1L
          i += 1
        }
        val mean = s.toDouble / n
        val std = math.sqrt(sq.toDouble / n - mean * mean)
        MediaFeatures(r.media_id, r.kind, n, mean, std, z.toDouble / n)
      }
    }
  }

  /** Average-hash perceptual fingerprint over the decoded byte stream:
    * the stream is cut into `blocks` equal-ish runs (block b = positions
    * with (i * blocks) div n = b) and bit b is set iff the block mean
    * exceeds the stream mean — compared in exact integer cross-products
    * (blockSum * n > totalSum * blockLen), so any engine that can replay
    * the codec reproduces the hash bit-for-bit. Identical payloads hash
    * identically; with a REAL codec, visually-near media land within a
    * small Hamming radius and [[Corpus.bandedHammingPairs]] over this
    * column is image/audio near-dup at corpus scale. The stub codec's
    * LCG avalanche means only exact payload duplicates collide here —
    * the plumbing, banding, and oracle are what this proves (the
    * q54/q55 stance).
    *
    * Emits `(media_id, kind, n_bytes, phash)`; runs at the codec
    * boundary (partition-batched, like [[extractFeatures]]). */
  def perceptualHash(media: Dataset[MediaRow], blocks: Int = 64,
                     codec: MediaCodec = FakeCodec): DataFrame = {
    require(blocks >= 1 && blocks <= 64, s"blocks must be in 1..64, got $blocks")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = codec.decode(r.payload, r.meta)
        (r.media_id, r.kind, bytes.length, avgHash(bytes, blocks))
      }
    }.toDF("media_id", "kind", "n_bytes", "phash")
  }

  /** The average-hash core shared by [[perceptualHash]] and
    * [[windowFingerprints]]: exact integer cross-products only. */
  private def avgHash(bytes: Array[Byte], blocks: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val bSum = new Array[Long](blocks)
    val bLen = new Array[Long](blocks)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = (bytes(i) & 0xff).toLong
      val b = (i.toLong * blocks / n).toInt
      bSum(b) += v; bLen(b) += 1L; total += v
      i += 1
    }
    var hash = 0L
    var b = 0
    while (b < blocks) {
      if (bLen(b) > 0 && bSum(b) * n > total * bLen(b)) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Resize images to a thumbnail; non-images pass through untouched. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int,
                   codec: MediaCodec = FakeCodec): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind != "image") r
      else {
        val decoded = codec.decode(r.payload, r.meta)
        r.copy(payload = codec.resize(decoded, r.meta, w, h),
          meta = r.meta.copy(width = w, height = h))
      }
    })
  }

  /** Explode videos into sampled frames (row-expanding, partition-local). */
  def sampleVideoFrames(media: Dataset[MediaRow], everyNth: Int,
                        codec: MediaCodec = FakeCodec): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video")
      .mapPartitions(_.flatMap(r => codec.sampleFrames(r, everyNth)))
  }

  /** Explode audio into fixed-size PCM windows — the audio analogue of
    * video frame sampling (one decode per row, row-expanding,
    * partition-local): window `w` holds decoded samples
    * `[w*windowSamples, (w+1)*windowSamples)`, and every `everyNth`
    * window is emitted. The window stream feeds [[windowFingerprints]];
    * banding those fingerprints with [[Corpus.bandedHammingPairs]] is
    * audio near-dup at corpus scale (a clip shifted by less than a
    * window still shares most window fingerprints). */
  def sampleAudioWindows(media: Dataset[MediaRow], windowSamples: Int,
                         everyNth: Int = 1,
                         codec: MediaCodec = FakeCodec): Dataset[Frame] = {
    require(windowSamples >= 1 && everyNth >= 1,
      s"windowSamples and everyNth must be >= 1 " +
        s"(got $windowSamples, $everyNth)")
    import media.sparkSession.implicits._
    media.filter(col("kind") === "audio")
      .mapPartitions(_.flatMap { r =>
        val pcm = codec.decode(r.payload, r.meta)
        val nWin = math.max(1, (pcm.length + windowSamples - 1) / windowSamples)
        Iterator.range(0, nWin, everyNth).map { w =>
          Frame(r.media_id, w, java.util.Arrays.copyOfRange(pcm,
            math.min(pcm.length, w * windowSamples),
            math.min(pcm.length, (w + 1) * windowSamples)))
        }
      })
  }

  /** Average-hash fingerprint per (already decoded) frame/window —
    * [[perceptualHash]]'s per-window form for frame streams from
    * [[sampleVideoFrames]] / [[sampleAudioWindows]]. Emits
    * `(media_id, frame_no, n_bytes, phash)`. */
  def windowFingerprints(frames: Dataset[Frame],
                         blocks: Int = 64): DataFrame = {
    require(blocks >= 1 && blocks <= 64,
      s"blocks must be in 1..64, got $blocks")
    import frames.sparkSession.implicits._
    frames.mapPartitions(_.map(f =>
        (f.media_id, f.frame_no, f.payload.length,
          avgHash(f.payload, blocks))))
      .toDF("media_id", "frame_no", "n_bytes", "phash")
  }

  /** Metadata-only scan: must never deserialize payload bytes (column
    * pruning does this for free once metadata lives in its own column). */
  def metadataSummary(media: Dataset[MediaRow]): DataFrame =
    media.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        avg(col("meta.width")).as("avg_width"),
        sum(col("meta.durationMs")).as("total_duration_ms"))
}

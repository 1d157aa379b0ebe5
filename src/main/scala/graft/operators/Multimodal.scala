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
        val n = bytes.length
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
        (r.media_id, r.kind, n, hash)
      }
    }.toDF("media_id", "kind", "n_bytes", "phash")
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

  /** Metadata-only scan: must never deserialize payload bytes (column
    * pruning does this for free once metadata lives in its own column). */
  def metadataSummary(media: Dataset[MediaRow]): DataFrame =
    media.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        avg(col("meta.width")).as("avg_width"),
        sum(col("meta.durationMs")).as("total_duration_ms"))
}

package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef

/** Round-18 wave A: the REAL audio codec under the oracle gate. The
  * pipeline synthesizes one WAV per document (a 16-bit PCM waveform
  * whose samples are a closed-form function of doc_id), runs it through
  * [[graft.operators.Multimodal.WavCodec]] — the JDK javax.sound parser,
  * no stub — and feature-extracts with the SAME partition-batched
  * operators every other codec uses. Because the decode maps sample
  * `(b-128)<<8` back to byte `b` exactly, DuckDB replays the features
  * from the waveform's closed form without ever parsing RIFF: the
  * oracle gates encoder, parser, channel mixing, and feature math
  * end to end. */
object R18Queries {

  /** byte k of doc `id`'s synthesized waveform: (id*31 + k*17) mod 256 —
    * positive operands, so Scala % and DuckDB % agree. */
  private def synthPcm(id: Long): Array[Byte] = {
    val n = (id % 50 + 10).toInt
    Array.tabulate(n)(k => ((id * 31 + k * 17) % 256).toByte)
  }

  private val q371 = QueryDef(
    "q371_wav_audio_features",
    (s, d) => {
      import s.implicits._
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("id")).as[Long]
      val media = ids.mapPartitions(_.map { id =>
        val bytes = synthPcm(id)
        // 16-bit sample (b-128)<<8 decodes back to exactly byte b
        val wav = graft.operators.Multimodal.encodeWavPcm16(
          bytes.map(b => (((b & 0xff) - 128) << 8).toShort), 16000)
        graft.operators.Multimodal.MediaRow(id, "audio", wav,
          graft.operators.Multimodal.MediaMeta(
            0, 0, 1, 16000, bytes.length * 1000L / 16000, "wav"))
      })
      graft.operators.Multimodal.extractFeatures(
          graft.operators.Multimodal.spreadForDecode(media),
          codec = graft.operators.Multimodal.WavCodec)
        .select(col("media_id"), col("n_bytes"), col("mean"), col("std"),
          col("p_zero"))
    },
    Some("""
      WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS media_id
                   FROM documents),
      ks AS (
        SELECT media_id, unnest(generate_series(
          0, CAST(media_id % 50 + 9 AS BIGINT))) AS k
        FROM ids),
      bytes AS (
        SELECT media_id, (media_id * 31 + k * 17) % 256 AS v
        FROM ks),
      agg AS (
        SELECT media_id, CAST(SUM(v) AS BIGINT) AS sv,
               CAST(SUM(v*v) AS BIGINT) AS sq,
               CAST(COUNT(*) FILTER (WHERE v = 0) AS BIGINT) AS z,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM bytes GROUP BY 1)
      SELECT media_id, CAST(n AS INT) AS n_bytes,
             CAST(sv AS DOUBLE) / n AS mean,
             sqrt(CAST(sq AS DOUBLE) / n
                  - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n))
               AS std,
             CAST(z AS DOUBLE) / n AS p_zero
      FROM agg"""))

  /** Audio near-dup plumbing end to end over the REAL codec: fixed PCM
    * windows ([[graft.operators.Multimodal.sampleAudioWindows]], every
    * 2nd window of 16 samples) fingerprinted per window
    * ([[graft.operators.Multimodal.windowFingerprints]], 16 blocks).
    * DuckDB replays windows and the average-hash from the closed-form
    * waveform: bit b of the fingerprint is set iff block b's byte sum
    * cross-multiplied against the window total clears the mean —
    * integer math only. */
  private val q372 = QueryDef(
    "q372_audio_window_fingerprints",
    (s, d) => {
      import s.implicits._
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("id")).as[Long]
      val media = ids.mapPartitions(_.map { id =>
        val bytes = synthPcm(id)
        val wav = graft.operators.Multimodal.encodeWavPcm16(
          bytes.map(b => (((b & 0xff) - 128) << 8).toShort), 16000)
        graft.operators.Multimodal.MediaRow(id, "audio", wav,
          graft.operators.Multimodal.MediaMeta(
            0, 0, 1, 16000, bytes.length * 1000L / 16000, "wav"))
      })
      graft.operators.Multimodal.windowFingerprints(
        graft.operators.Multimodal.sampleAudioWindows(
          graft.operators.Multimodal.spreadForDecode(media),
          windowSamples = 16, everyNth = 2,
          codec = graft.operators.Multimodal.WavCodec),
        blocks = 16)
    },
    Some("""
      WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS media_id
                   FROM documents),
      kseq AS (
        SELECT media_id, unnest(generate_series(
          0, CAST(media_id % 50 + 9 AS BIGINT))) AS k
        FROM ids),
      bytes AS (
        SELECT media_id, k,
               (media_id * 31 + k * 17) % 256 AS v,
               CAST(media_id % 50 + 10 AS BIGINT) AS n
        FROM kseq),
      wins AS (
        SELECT media_id, CAST(k // 16 AS INT) AS frame_no,
               k % 16 AS i, v,
               CASE WHEN k // 16 < n // 16 THEN 16 ELSE n % 16 END AS wn
        FROM bytes
        WHERE (k // 16) % 2 = 0),
      blk AS (
        SELECT media_id, frame_no, wn,
               CAST(i * 16 // wn AS INT) AS b, v
        FROM wins),
      bsums AS (
        SELECT media_id, frame_no, wn, b,
               CAST(SUM(v) AS BIGINT) AS bsum,
               CAST(COUNT(*) AS BIGINT) AS blen
        FROM blk GROUP BY 1, 2, 3, 4),
      totals AS (
        SELECT media_id, frame_no, wn,
               CAST(SUM(v) AS BIGINT) AS total
        FROM blk GROUP BY 1, 2, 3),
      hash AS (
        SELECT s.media_id, s.frame_no, t.wn,
               CAST(SUM(CASE WHEN s.bsum * t.wn > t.total * s.blen
                             THEN CAST(1 AS BIGINT) << s.b
                             ELSE 0 END) AS BIGINT) AS phash
        FROM bsums s JOIN totals t
          USING (media_id, frame_no)
        GROUP BY 1, 2, 3)
      SELECT media_id, frame_no, CAST(wn AS INT) AS n_bytes, phash
      FROM hash"""))

  private def ensureCatalog(s: org.apache.spark.sql.SparkSession): Unit =
    if (!s.conf.getOption("spark.sql.catalog.graft_r18").isDefined) {
      s.conf.set("spark.sql.catalog.graft_r18",
        classOf[graft.sources.QuirkCsvCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_r18.root",
        java.nio.file.Files.createTempDirectory("graft_r18_cat").toString)
    }

  /** Shuffles beneath each non-broadcast join of an EXECUTED plan —
    * the in-query co-location proof (AQE-aware). */
  private def joinShuffles(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    def below(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      self + unwrap(p).map(below).sum
    }
    def joins(p: SparkPlan): Seq[BaseJoinExec] = p match {
      case j: BaseJoinExec => Seq(j)
      case other => unwrap(other).flatMap(joins)
    }
    joins(df.queryExecution.executedPlan)
      .filterNot(_.isInstanceOf[BroadcastHashJoinExec])
      .map(j => j.children.map(below).sum)
  }

  private def withConfs[T](s: org.apache.spark.sql.SparkSession,
                           pairs: (String, String)*)(body: => T): T = {
    val prior = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
    pairs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** The CO-LOCATED near-dup index layout under the oracle gate
    * ([[graft.operators.NearDupIndex]] with `joinBuckets`): the band
    * table identity-partitions on a stored xxhash64 bucket of band_key,
    * and the daily candidate self-join plans storage-partitioned — the
    * REQUIRE walks the EXECUTED plan and rejects any shuffle beneath
    * the join (the 100-TB shape: the band table is never reshuffled,
    * NearDupIndex.scala's own scale note made real). The oracle replays
    * the full MinHash banding in DuckDB restricted to the new batch —
    * identical SQL to the batch-partitioned q357, because the layout
    * must never change answers. */
  private val q373 = QueryDef(
    "q373_neardup_index_colocated",
    (s, d) => {
      ensureCatalog(s)
      val docs = Tables.documents(s, d)
      val isNew = col("doc_id") % 10 >= 8
      FixtureOnce("q373", d) {
        graft.operators.NearDupIndex.build(s, "graft_r18", "q373", "nd",
          docs.filter(!isNew), "doc_id", "text",
          shingleN = 3, numHashes = 12, bandSize = 3, joinBuckets = 16)
        graft.operators.NearDupIndex.indexBatch(s, "graft_r18", "q373",
          "nd", docs.filter(isNew), "doc_id", "text", "b1")
      }
      // the SPJ plan-shape confs are NOT set here: candidatePairsFor
      // self-manages them from the index meta — this query gates that
      // (broadcast stays disabled so the plan shape is visible)
      withConfs(s,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val served = graft.operators.NearDupIndex.candidatePairsFor(
          s, "graft_r18", "q373", "nd", "b1")
        // checkpointing executes served's own query, finalizing its AQE
        // plan — which the shuffle walk then inspects
        val out = served.localCheckpoint()
        val js = joinShuffles(served)
        require(js.nonEmpty && js.forall(_ == 0),
          s"co-located candidate join must plan ZERO shuffles beneath " +
            s"it, got $js")
        out
      }
    },
    Some {
      val nh = 12; val bs = 3
      val sigCols = (0 until nh).map(i =>
        s"list_aggregate(list_transform(sh, x -> md5('$i|' || x)), " +
          s"'min') AS sig_$i")
        .mkString(",\n             ")
      val bandSelects = (0 until nh / bs).map { b =>
        val sigs = (0 until bs).map(k => s"sig_${b * bs + k}")
          .mkString(", ")
        s"SELECT doc_id, $b AS band_id, md5(concat_ws(',', $sigs)) AS " +
          s"band_key FROM sigs"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
                 FROM documents),
      ws AS (SELECT doc_id, list_distinct(${ExtQueries.oShingles("w", 3)})
                 AS sh
             FROM t WHERE len(w) >= 3),
      sigs AS MATERIALIZED (SELECT doc_id,
             $sigCols
      FROM ws),
      bands0 AS MATERIALIZED (
        $bandSelects),
      bands AS MATERIALIZED (
        -- the hot-band cap pinned at build() (session default
        -- ${graft.operators.NearDup.DefaultMaxBandBucket}), modeled as
        -- the serve applies it: counted over the whole band table
        SELECT doc_id, band_id, band_key FROM bands0
        QUALIFY count(*) OVER (PARTITION BY band_id, band_key)
          <= ${graft.operators.NearDup.DefaultMaxBandBucket})
      SELECT DISTINCT
        LEAST(CAST(x.doc_id AS VARCHAR), CAST(y.doc_id AS VARCHAR)) AS a_id,
        GREATEST(CAST(x.doc_id AS VARCHAR), CAST(y.doc_id AS VARCHAR))
          AS b_id
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.band_key = y.band_key
       AND x.doc_id <> y.doc_id
      WHERE x.doc_id % 10 >= 8"""
    })

  /** The CO-LOCATED IVF assignment layout under the oracle gate
    * ([[graft.operators.IvfIndex]] with `coLocate = true`): the SemDeDup
    * blocking key (centroid_id) IS the identity partition key, so the
    * within-bucket self-join plans storage-partitioned (join key ==
    * partition key exactly — no extra conf) — REQUIREd on the executed
    * plan. Oracle: the q369 replay verbatim; layouts never change
    * answers. */
  private val q374 = QueryDef(
    "q374_semantic_dedup_colocated",
    (s, d) => {
      ensureCatalog(s)
      val e = Tables.embeddings(s, d)
      FixtureOnce("q374", d) {
        graft.operators.IvfIndex.build(s, "graft_r18", "q374", "sem",
          e, "vec_id", "embedding", 16, coLocate = true)
      }
      withConfs(s,
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val asg = graft.operators.IvfIndex.assignment(
          s, "graft_r18", "q374", "sem")
        val selfJoin = asg.select(col("vec_id"), col("centroid_id")).as("x")
          .join(asg.select(col("vec_id"), col("centroid_id")).as("y"),
            col("x.centroid_id") === col("y.centroid_id") &&
              col("x.vec_id") < col("y.vec_id"))
        selfJoin.localCheckpoint()
        val js = joinShuffles(selfJoin)
        require(js.nonEmpty && js.forall(_ == 0),
          s"co-located within-bucket join must plan ZERO shuffles " +
            s"beneath it, got $js")
      }
      graft.operators.IvfIndex.semanticDupPairs(s, "graft_r18", "q374",
        "sem", e, "vec_id", "embedding", 0.0)
    },
    Some(s"""
      WITH cent AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS centroid_id,
                           embedding AS cemb
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
      asg AS MATERIALIZED (SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY ${ExtQueries.oCos("e.embedding", "c.cemb")} DESC,
                  c.centroid_id) AS rn
            FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
      pairs AS (SELECT CAST(x.vec_id AS VARCHAR) AS a_id,
                       CAST(y.vec_id AS VARCHAR) AS b_id,
                       x.centroid_id
                FROM asg x JOIN asg y
                  ON x.centroid_id = y.centroid_id
                 AND CAST(x.vec_id AS VARCHAR) < CAST(y.vec_id AS VARCHAR)),
      sc AS (SELECT p.a_id, p.b_id, p.centroid_id,
                    ${ExtQueries.oCos("ea.embedding", "eb.embedding")}
                      AS cosine
             FROM pairs p
             JOIN embeddings ea ON CAST(ea.vec_id AS VARCHAR) = p.a_id
             JOIN embeddings eb ON CAST(eb.vec_id AS VARCHAR) = p.b_id)
      SELECT a_id, b_id, centroid_id, cosine FROM sc WHERE cosine >= 0.0"""))

  /** A w×h 24-bit grayscale BMP whose TOP-DOWN row-major pixel p holds
    * value `f(p)` in all three channels (BMP stores rows bottom-up with
    * 4-byte padding — the builder flips so the DECODED order is the
    * closed form). */
  private def grayBmp(w: Int, h: Int, f: Int => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val bb = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
      .putInt(0).putInt(54)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowBytes * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    ((h - 1) to 0 by -1).foreach { y => // file rows bottom-up
      (0 until w).foreach { x =>
        val v = (f(y * w + x) & 0xff).toByte
        bb.put(v).put(v).put(v)
      }
      (w * 3 until rowBytes).foreach(_ => bb.put(0.toByte))
    }
    bb.array()
  }

  /** Video sampling through the REAL container codec under the oracle
    * gate: one AVI per document (2–4 grayscale BMP frames whose pixel
    * values are a closed form of (doc, frame, pixel)), every 2nd frame
    * sampled by [[graft.operators.Multimodal.AviCodec]] (RIFF walk +
    * ImageIO decode — no stub anywhere), fingerprinted per frame.
    * DuckDB replays the fingerprints from the pixel formula without
    * parsing a byte of RIFF — container writer, parser, BMP decode and
    * hash math all under the hash gate. */
  private val q375 = QueryDef(
    "q375_avi_frame_fingerprints",
    (s, d) => {
      import s.implicits._
      val (w, h) = (8, 4)
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("id")).as[Long]
      val media = ids.mapPartitions(_.map { id =>
        val nf = (id % 3 + 2).toInt
        val frames = (0 until nf).map(fr =>
          grayBmp(w, h, p => ((id * 7 + fr * 13 + p) % 256).toInt))
        graft.operators.Multimodal.MediaRow(id, "video",
          graft.operators.Multimodal.encodeAvi(frames, w, h),
          graft.operators.Multimodal.MediaMeta(
            w, h, 3, 0, nf * 40L, "avi"))
      })
      graft.operators.Multimodal.windowFingerprints(
        graft.operators.Multimodal.sampleVideoFrames(
          graft.operators.Multimodal.spreadForDecode(media),
          everyNth = 2, codec = graft.operators.Multimodal.AviCodec),
        blocks = 16)
    },
    Some("""
      WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS media_id
                   FROM documents),
      frames AS (
        SELECT media_id, unnest(generate_series(
          0, CAST(media_id % 3 + 1 AS BIGINT), 2)) AS frame_no
        FROM ids),
      -- 96 RGB bytes per 8x4 frame; byte i carries pixel (i // 3)'s value
      bytes AS (
        SELECT media_id, frame_no,
               unnest(generate_series(0, CAST(95 AS BIGINT))) AS i
        FROM frames),
      v AS (
        SELECT media_id, frame_no, i,
               (media_id * 7 + frame_no * 13 + (i // 3)) % 256 AS pv
        FROM bytes),
      blk AS (
        SELECT media_id, frame_no, CAST(i * 16 // 96 AS INT) AS b, pv
        FROM v),
      bsums AS (
        SELECT media_id, frame_no, b,
               CAST(SUM(pv) AS BIGINT) AS bsum,
               CAST(COUNT(*) AS BIGINT) AS blen
        FROM blk GROUP BY 1, 2, 3),
      totals AS (
        SELECT media_id, frame_no, CAST(SUM(pv) AS BIGINT) AS total
        FROM blk GROUP BY 1, 2),
      hash AS (
        SELECT s.media_id, s.frame_no,
               CAST(SUM(CASE WHEN s.bsum * 96 > t.total * s.blen
                             THEN CAST(1 AS BIGINT) << s.b
                             ELSE 0 END) AS BIGINT) AS phash
        FROM bsums s JOIN totals t USING (media_id, frame_no)
        GROUP BY 1, 2)
      SELECT media_id, CAST(frame_no AS INT) AS frame_no,
             96 AS n_bytes, phash
      FROM hash"""))

  val all: Seq[QueryDef] = Seq(q371, q372, q373, q374, q375)
}

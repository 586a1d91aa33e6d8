package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** Multimodal-column operators (SURVEY.md §2.11 / the north-star's
  * image/audio/video mandate): media rides as an opaque BINARY payload
  * column with typed metadata beside it; decode/feature-extraction is a
  * per-partition BATCH operation so a real codec drops in without changing
  * the dataflow.
  *
  * Two layers coexist here. The GENERIC media plumbing
  * (decodeStub / frameSampleStub and their gated Column twins
  * `q_multimodal_meta` / `q_multimodal_frames`) treats ALL modalities
  * through a clearly-marked DETERMINISTIC STUB — it exists to prove the
  * binary-column dataflow (schema, partition preservation, batch shape)
  * independent of any codec. SEPARATELY, each modality also has a REAL
  * codec path: the JDK ships PNG (javax.imageio), WAV/PCM
  * (javax.sound.sampled), and a multi-frame GIF container (javax.imageio's
  * sequence writer/reader) — `q_image_decode` / `q_image_resize` /
  * `q_audio_decode` / `q_gif_frames` gate actual executor-side
  * encode → decode round trips. The GIF leg stands in for video: it is a
  * real timed multi-image CONTAINER (open, count frames, seek, decode
  * pixels — the structure of frame sampling), though not a motion-
  * compressed codec (no H.264 in the JDK; documented honestly).
  * MultiModalSpec covers both layers.
  *
  * Scale: payloads never shuffle here (all ops are narrow maps); a join
  * would carry only (doc_id, metadata). At 100 TB the payload column's
  * parquet pages are column-pruned away whenever a query touches metadata
  * only — that is the point of keeping bytes and metadata side by side.
  */
object MultiModal {

  /** One media row: opaque bytes + typed metadata. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
      media_type: String)

  /** Output of the (stubbed) decoder. */
  final case class DecodedMeta(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, n_frames: Int)

  /** Batch size a real vectorized decoder would use (one codec call per
    * batch, amortizing setup — the mapInPandas/Arrow batch shape). */
  val DecodeBatchSize = 64

  /** Builds the media table from `documents`: payload = utf-8 bytes of the
    * text (stand-in for real media bytes), media_type round-robins the three
    * modalities. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"))
      .as[MediaRecord]
  }

  /** STUB decoder — stands in for the absent codec library. Deterministic:
    * "dimensions" come from the payload's md5, frame count from its length.
    * Processes the partition in DecodeBatchSize batches exactly like a
    * vectorized decode would. */
  def decodeStub(records: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // one digest instance per partition (reset between rows) — per-record
      // getInstance would pay the JCA lookup the batching exists to amortize
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // one "codec call" per batch
        batch.map { r =>
          md.reset()
          val h = java.lang.Integer.toUnsignedLong(
            java.nio.ByteBuffer.wrap(md.digest(r.payload), 0, 4).getInt)
          DecodedMeta(r.doc_id, r.payload.length,
            (h % 1920 + 1).toInt, (h % 1080 + 1).toInt,
            (r.payload.length % 7 + 1))
        }
      }
    }
  }

  /** `q_multimodal_meta`: the metadata extraction expressed as pure Columns
    * (the oracle-checkable twin of decodeStub — same md5-derived fake dims,
    * computed by both engines over the utf-8 payload). */
  def multimodalMetaQ(spark: SparkSession, sfDir: String): DataFrame = {
    val h32 = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        length(encode(col("text"), "utf-8")).as("n_bytes"),
        sha2(encode(col("text"), "utf-8"), 256).as("payload_sha"),
        (h32 % 1920 + 1).cast("int").as("width"),
        (h32 % 1080 + 1).cast("int").as("height"),
        // byte length, as the stub sees it — char length would silently
        // diverge on any non-ASCII document
        (length(encode(col("text"), "utf-8")) % 7 + 1).as("n_frames"))
      .orderBy(col("doc_id"))
  }

  /** Frame-sampling stride: keep every Nth frame. */
  val FrameStride = 2
  /** Fixed 25 fps stand-in: frame index → timestamp ms. */
  val FrameMs = 40

  final case class FrameMeta(doc_id: Long, frame_idx: Int, frame_ts_ms: Int,
      frame_hash: String)

  /** Frame sampling as REAL per-partition batch plumbing: video payloads
    * decode (stub) to n_frames frames, every FrameStride-th is kept, each
    * with a content address derived from (payload, frame index). A real
    * codec replaces the inner function without touching the dataflow —
    * payload bytes never shuffle, output is metadata rows only. */
  def frameSampleStub(records: Dataset[MediaRecord]): Dataset[FrameMeta] = {
    import records.sparkSession.implicits._
    records.filter(_.media_type == "video").mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5") // per partition
      it.grouped(DecodeBatchSize).flatMap { batch => // one "codec call"/batch
        batch.flatMap { r =>
          val nFrames = r.payload.length % 7 + 1
          (0 until nFrames).filter(_ % FrameStride == 0).map { i =>
            md.reset()
            val d = md.digest(r.payload ++ s":$i".getBytes("UTF-8"))
            FrameMeta(r.doc_id, i, i * FrameMs,
              d.take(8).map(b => f"$b%02x").mkString)
          }
        }
      }
    }
  }

  /** `q_multimodal_frames`: the oracle-checkable Column twin of
    * frameSampleStub — identical frame set, timestamps, and content
    * addresses, computed from the same utf-8 payload by both engines
    * (MultiModalSpec asserts stub ≡ twin row-for-row, which is what makes
    * the mapPartitions plumbing trustworthy). */
  def multimodalFramesQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter((col("doc_id") % 3 + 1) === 3) // media_type == 'video'
      .select(col("doc_id"), col("text"),
        // frame count from the payload's BYTE length (what decodeStub and
        // frameSampleStub use) — char length diverges on non-ASCII text
        explode(sequence(lit(0), (length(encode(col("text"), "utf-8")) % 7 + 1) - 1))
          .as("frame_idx"))
      .filter(col("frame_idx") % FrameStride === 0)
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * FrameMs).as("frame_ts_ms"),
        substring(md5(concat(col("text"), lit(":"), col("frame_idx"))), 1, 16)
          .as("frame_hash"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val multimodalFramesOracle: String =
    s"""SELECT doc_id, i AS frame_idx, i * ${FrameMs} AS frame_ts_ms,
       |  substr(md5(text || ':' || i), 1, 16) AS frame_hash
       |FROM documents, UNNEST(range(0, octet_length(encode(text)) % 7 + 1)) AS u(i)
       |WHERE doc_id % 3 + 1 = 3 AND i % ${FrameStride} = 0
       |ORDER BY doc_id, frame_idx""".stripMargin

  val multimodalMetaOracle: String =
    """SELECT doc_id,
      | ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      | octet_length(encode(text)) AS n_bytes,
      | sha256(text) AS payload_sha,
      | CAST(CAST(concat('0x', substr(md5(text),1,8)) AS BIGINT) % 1920 + 1 AS INT) AS width,
      | CAST(CAST(concat('0x', substr(md5(text),1,8)) AS BIGINT) % 1080 + 1 AS INT) AS height,
      | octet_length(encode(text)) % 7 + 1 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  // `q_image_decode`: a REAL codec round trip — unlike the stubbed
  // video/audio paths above, the JDK ships an actual PNG codec
  // (javax.imageio), so the image leg needs no stub at all. Executors
  // ENCODE a real PNG per document (dimensions and solid RGB fill derived
  // from doc_id by a stated rule), and a second per-partition batch pass
  // DECODES the bytes back — ImageIO.read, real pixel access. The DuckDB
  // oracle states the expected (width, height, rgb) from the generation
  // rule alone: any defect in the encode→decode path (dimension swap,
  // channel order, color-space mangling) breaks the hash gate. Byte size
  // is deliberately NOT gated — PNG encoder output is
  // implementation-defined; decoded CONTENT is the contract.
  //
  // Scale shape: identical to the stub ops — payload bytes are produced
  // and consumed inside narrow per-partition maps, never shuffled; only
  // (doc_id, metadata) rows leave the partition.
  // ------------------------------------------------------------------

  final case class PngRecord(doc_id: Long, png: Array[Byte])
  final case class PngDecoded(doc_id: Long, width: Int, height: Int,
      r: Int, g: Int, b: Int)

  /** 1-in-ImgMod of documents get an image payload: ImageIO costs real
    * time per PNG round trip, and gating EVERY document at bench scale
    * spends seconds re-proving the same codec path. The stride is COPRIME
    * to the dimension moduli (gcd(5, 16) = gcd(5, 8) = 1), so the sample
    * still walks EVERY width/height branch — including odd dimensions,
    * which is what exercises the resize's ceil-divide — a power-of-two
    * stride would alias to even dims only. */
  val ImgMod = 5

  /** Generation rule (shared with the oracle SQL via interpolation). */
  def pngWidth(id: Long): Int = (id % 16 + 8).toInt
  def pngHeight(id: Long): Int = (id % 8 + 8).toInt
  def pngRgb(id: Long): (Int, Int, Int) =
    (((id * 37) % 256).toInt, ((id * 59) % 256).toInt, ((id * 83) % 256).toInt)

  /** ImageIO defaults to a DISK-backed stream cache — one temp-file
    * create/write/delete per encode/decode call. Per-image file I/O is
    * exactly the wrong trade for in-memory byte arrays; this pins the
    * in-memory cache once per executor JVM (idempotent, thread-safe). */
  private def imageIoNoDiskCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Executor-side PNG encode: one BufferedImage per doc, solid fill. */
  def pngTable(spark: SparkSession, sfDir: String): Dataset[PngRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") % ImgMod === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        imageIoNoDiskCache()
        ids.map { id =>
          val (w, h) = (pngWidth(id), pngHeight(id))
          val (r, g, b) = pngRgb(id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (r << 16) | (g << 8) | b
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          PngRecord(id, bos.toByteArray)
        }
      }
  }

  /** Decode one PNG payload and unpack its center pixel — the single
    * decode path both image queries share (a fix here reaches both). */
  private def decodeCenterPixel(rec: PngRecord): (java.awt.image.BufferedImage, PngDecoded) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rec.png))
    (img, centerPixel(rec.doc_id, img))
  }

  private def centerPixel(id: Long, img: java.awt.image.BufferedImage): PngDecoded = {
    val px = img.getRGB(img.getWidth / 2, img.getHeight / 2)
    PngDecoded(id, img.getWidth, img.getHeight,
      (px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff)
  }

  /** Executor-side PNG decode in DecodeBatchSize batches. */
  def pngDecode(records: Dataset[PngRecord]): Dataset[PngDecoded] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      imageIoNoDiskCache()
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map(rec => decodeCenterPixel(rec)._2)
      }
    }
  }

  def imageDecodeQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    pngDecode(pngTable(spark, sfDir)).toDF()
      .orderBy(col("doc_id"))
  }

  val imageDecodeOracle: String =
    s"""SELECT doc_id,
       |  CAST(doc_id % 16 + 8 AS INT) AS width,
       |  CAST(doc_id % 8 + 8 AS INT) AS height,
       |  CAST((doc_id * 37) % 256 AS INT) AS r,
       |  CAST((doc_id * 59) % 256 AS INT) AS g,
       |  CAST((doc_id * 83) % 256 AS INT) AS b
       |FROM documents WHERE doc_id % ${ImgMod} = 0 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  // `q_audio_decode`: the audio twin of the PNG round trip — the JDK also
  // ships a real WAV/PCM codec (javax.sound.sampled), so the audio leg is
  // REAL as well: executors synthesize a deterministic 16-bit mono PCM
  // waveform per document (integer sawtooth from a stated doc_id rule —
  // no trig, so the samples are exact on any engine), container-encode it
  // to WAV bytes via AudioSystem, and a second batch pass decodes the
  // container back: format fields, frame count, and the exact integer sum
  // of the decoded samples. The oracle recomputes frame count and sample
  // sum from the rule — a byte-order or header defect in the codec path
  // breaks the gate. Only video remains a stub (the JDK has no video
  // codec; documented honestly above).
  // ------------------------------------------------------------------

  val AudioRate = 8000f
  final case class WavRecord(doc_id: Long, wav: Array[Byte])
  final case class WavDecoded(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Long, sample_sum: Long)

  /** Generation rule (shared verbatim with the oracle). */
  def wavFrames(id: Long): Int = (id % 50 + 10).toInt
  def wavSample(id: Long, i: Int): Short =
    (((id * 31 + i.toLong * 17) % 65536) - 32768).toShort

  /** Executor-side WAV encode of the rule waveform. */
  def wavTable(spark: SparkSession, sfDir: String): Dataset[WavRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        val fmt = new javax.sound.sampled.AudioFormat(AudioRate, 16, 1, true, false)
        ids.map { id =>
          val n = wavFrames(id)
          val pcm = java.nio.ByteBuffer.allocate(n * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          (0 until n).foreach(i => pcm.putShort(wavSample(id, i)))
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm.array()), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          WavRecord(id, bos.toByteArray)
        }
      }
  }

  /** Executor-side WAV decode in DecodeBatchSize batches. */
  def wavDecode(records: Dataset[WavRecord]): Dataset[WavDecoded] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { rec =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(rec.wav))
          val fmt = ais.getFormat
          val nFrames = ais.getFrameLength
          val bytes = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var sum = 0L
          while (bb.remaining() >= 2) sum += bb.getShort
          WavDecoded(rec.doc_id, fmt.getSampleRate.toInt, fmt.getChannels,
            fmt.getSampleSizeInBits, nFrames, sum)
        }
      }
    }
  }

  def audioDecodeQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    wavDecode(wavTable(spark, sfDir)).toDF()
      .orderBy(col("doc_id"))
  }

  /** `q_image_resize`: the resize stage of the image pipeline, REAL as
    * well — decode (ImageIO), scale to ceil(dims/2) with Graphics2D, and
    * re-measure the result. Solid-fill inputs make the expected output
    * statable in SQL regardless of the interpolation kernel (any weighted
    * average of one color is that color), so the gate checks the resize
    * geometry and that the pixel pipeline preserved the channels. The
    * resize runs inside the same per-partition batch map as the decode —
    * one pass, payloads never shuffle. */
  def imageResizeQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val resized = pngTable(spark, sfDir).mapPartitions { it =>
      imageIoNoDiskCache()
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { rec =>
          val img = decodeCenterPixel(rec)._1 // shared decode path
          val (w2, h2) = ((img.getWidth + 1) / 2, (img.getHeight + 1) / 2)
          val out = new java.awt.image.BufferedImage(
            w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          g2.drawImage(img, 0, 0, w2, h2, null)
          g2.dispose()
          centerPixel(rec.doc_id, out)
        }
      }
    }
    resized.toDF()
      .select(col("doc_id"), col("width").as("out_w"), col("height").as("out_h"),
        col("r"), col("g"), col("b"))
      .orderBy(col("doc_id"))
  }

  val imageResizeOracle: String =
    s"""SELECT doc_id,
       |  CAST((doc_id % 16 + 8 + 1) // 2 AS INT) AS out_w,
       |  CAST((doc_id % 8 + 8 + 1) // 2 AS INT) AS out_h,
       |  CAST((doc_id * 37) % 256 AS INT) AS r,
       |  CAST((doc_id * 59) % 256 AS INT) AS g,
       |  CAST((doc_id * 83) % 256 AS INT) AS b
       |FROM documents WHERE doc_id % ${ImgMod} = 0 ORDER BY doc_id""".stripMargin

  val audioDecodeOracle: String =
    s"""SELECT doc_id,
       |  ${AudioRate.toInt} AS sample_rate, 1 AS channels, 16 AS bits,
       |  doc_id % 50 + 10 AS n_frames,
       |  CAST((SELECT SUM((doc_id * 31 + i * 17) % 65536 - 32768)
       |        FROM UNNEST(range(0, doc_id % 50 + 10)) AS u(i)) AS BIGINT)
       |    AS sample_sum
       |FROM documents ORDER BY doc_id""".stripMargin

  final case class WavStats(doc_id: Long, n_frames: Long, peak: Long,
    energy: Long, sign_flips: Long)

  /** `q_audio_stats`: REAL audio feature extraction — the stage after
    * X100's decode roundtrip: per clip, peak amplitude, total energy
    * (Σ sample², the RMS numerator), and sign flips (the zero-crossing
    * count, the classic cheap pitch/noisiness signal) computed from the
    * PCM the JDK codec actually decodes out of the WAV container. The
    * synthesized waveform is closed-form in doc_id, so the oracle states
    * the same three features in pure SQL over generate-series — the gate
    * proves the codec round trip AND the feature math together, to the
    * exact integer.
    *
    * Scale shape: encode→decode→extract all inside one per-partition
    * batch map (payload bytes never shuffle — X99/X100's discipline);
    * the output frame is one row of exact integers per clip. */
  def audioStatsQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    wavTable(spark, sfDir).mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { rec =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(rec.wav))
          val bytes = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var n = 0L; var peak = 0L; var energy = 0L; var flips = 0L
          var prev = 0L; var first = true
          while (bb.remaining() >= 2) {
            val s = bb.getShort.toLong
            n += 1
            if (math.abs(s) > peak) peak = math.abs(s)
            energy += s * s
            if (!first && s * prev < 0) flips += 1
            prev = s; first = false
          }
          WavStats(rec.doc_id, n, peak, energy, flips)
        }
      }
    }.toDF().orderBy(col("doc_id"))
  }

  val audioStatsOracle: String =
    """WITH s AS (
      |  SELECT doc_id, i,
      |    (doc_id * 31 + i * 17) % 65536 - 32768 AS v
      |  FROM documents, UNNEST(range(0, doc_id % 50 + 10)) AS u(i)),
      |w AS (
      |  SELECT doc_id, i, v,
      |    LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      |  FROM s)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
      |  CAST(MAX(ABS(v)) AS BIGINT) AS peak,
      |  CAST(SUM(v * v) AS BIGINT) AS energy,
      |  CAST(SUM(CASE WHEN pv IS NOT NULL AND v * pv < 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS sign_flips
      |FROM w GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  // `q_gif_frames`: the video leg made REAL at the container level — the
  // JDK's ImageIO ships a multi-frame GIF writer/reader
  // (prepareWriteSequence / getNumImages / read(i)), which is the actual
  // structure of video frame sampling: open a container, count frames,
  // seek to a frame, decode its pixels. Executors ENCODE an animated GIF
  // per sampled video document (frame count, dimensions, and each frame's
  // solid palette color from stated doc_id rules), and a second batch
  // pass OPENS the container, reads the frame count from the stream, and
  // decodes every FrameStride-th frame's pixels. The oracle states the
  // expected (n_frames, frame_idx, dims, rgb) per sampled frame from the
  // rules alone — a palette-quantization, frame-ordering, or seek defect
  // breaks the hash gate. Frames are written TYPE_BYTE_INDEXED with an
  // exact palette so GIF's 8-bit color model loses nothing.
  //
  // What remains un-real is only motion COMPRESSION (H.264/VP9 — no such
  // codec in the JDK); the container plumbing, frame iteration, and
  // pixel decode are genuine. Scale shape: same as every media op here —
  // payloads live and die inside narrow per-partition maps, only
  // (doc_id, frame metadata) rows ever leave.
  // ------------------------------------------------------------------

  /** Video docs are doc_id % 3 == 2; a stride-5 sample of those keeps
    * ids ≡ 2 (mod 15). The rule moduli below (4, 13, 7, 256) are each
    * COPRIME to 15, so the sample still walks every frame-count, width,
    * height, and color branch (a shared factor would alias some branches
    * out of the gate entirely — the ImgMod lesson). */
  val GifMod = 15

  def gifFrameCount(id: Long): Int = (id % 4 + 2).toInt
  def gifW(id: Long): Int = (id % 13 + 4).toInt
  def gifH(id: Long): Int = (id % 7 + 4).toInt
  def gifRgb(id: Long, f: Int): (Int, Int, Int) =
    (((id * 37 + f * 11) % 256).toInt, ((id * 59 + f * 23) % 256).toInt,
      ((id * 83 + f * 31) % 256).toInt)

  final case class GifRecord(doc_id: Long, gif: Array[Byte])
  final case class GifFrame(doc_id: Long, n_frames: Int, frame_idx: Int,
      w: Int, h: Int, r: Int, g: Int, b: Int)

  /** Executor-side animated-GIF encode of the rule frames. */
  def gifTable(spark: SparkSession, sfDir: String): Dataset[GifRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") % GifMod === 2)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        imageIoNoDiskCache()
        // one writer per partition — the same hoist gifDecode applies to
        // its reader; a per-record getImageWritersByFormatName pays the
        // plugin-registry scan and writer allocation inside the hot
        // encode loop. Per-record reuse is sound because
        // prepareWriteSequence() clears the sequence state each time
        // (GIFImageWriter.resetLocal); setOutput only swaps the stream.
        val writer =
          javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val out = ids.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          val (w, h) = (gifW(id), gifH(id))
          (0 until gifFrameCount(id)).foreach { f =>
            val (r, g, b) = gifRgb(id, f)
            // 2-entry exact palette (frame color + black), every pixel at
            // index 0: GIF stores palettes verbatim, so the color survives
            // the trip bit-exactly — an RGB input image would instead be
            // quantized to whatever palette the writer invents.
            val icm = new java.awt.image.IndexColorModel(8, 2,
              Array((r << 16) | (g << 8) | b, 0), 0, false, -1,
              java.awt.image.DataBuffer.TYPE_BYTE)
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            // raster defaults to index 0 already; fill anyway so the frame
            // content is explicit, not an initialization artifact
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { raster.setSample(x, y, 0, 0); x += 1 }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
          }
          writer.endWriteSequence()
          ios.close()
          GifRecord(id, bos.toByteArray)
        }
        // ++'s right side is by-name: dispose fires once the partition's
        // records are exhausted, restoring the ImageWriter lifecycle
        out ++ { writer.dispose(); Iterator.empty }
      }
  }

  /** Executor-side container open + frame-sampled decode: one reader per
    * partition (setInput resets it per record), DecodeBatchSize batches. */
  def gifDecode(records: Dataset[GifRecord]): Dataset[GifFrame] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      imageIoNoDiskCache()
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.flatMap { rec =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(rec.gif))
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          val frames = (0 until n).filter(_ % FrameStride == 0).map { i =>
            val img = reader.read(i)
            val px = img.getRGB(img.getWidth / 2, img.getHeight / 2)
            GifFrame(rec.doc_id, n, i, img.getWidth, img.getHeight,
              (px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff)
          }
          iis.close()
          frames
        }
      }
    }
  }

  def gifFramesQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    gifDecode(gifTable(spark, sfDir)).toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val gifFramesOracle: String =
    s"""SELECT doc_id,
       |  CAST(doc_id % 4 + 2 AS INT) AS n_frames,
       |  CAST(i AS INT) AS frame_idx,
       |  CAST(doc_id % 13 + 4 AS INT) AS w,
       |  CAST(doc_id % 7 + 4 AS INT) AS h,
       |  CAST((doc_id * 37 + i * 11) % 256 AS INT) AS r,
       |  CAST((doc_id * 59 + i * 23) % 256 AS INT) AS g,
       |  CAST((doc_id * 83 + i * 31) % 256 AS INT) AS b
       |FROM documents, UNNEST(range(0, doc_id % 4 + 2)) AS u(i)
       |WHERE doc_id % ${GifMod} = 2 AND i % ${FrameStride} = 0
       |ORDER BY doc_id, frame_idx""".stripMargin
  // ------------------------------------------------------------------
  // `q_frame_dedup` (X225): consecutive-frame perceptual near-dup
  // ------------------------------------------------------------------

  /** Scene-cut cadence of the synthetic pHash stream and the hamming
    * threshold separating "same shot" from "cut". */
  val FrameCutEvery = 5
  val FrameHamThreshold = 8

  /** `q_frame_dedup`: CONSECUTIVE-FRAME near-dup detection — the video
    * curation pass that drops static frames before training (a fixed
    * camera shot is thousands of near-identical images; training on all
    * of them is paying for one frame many times): per video, hash each
    * frame perceptually, hamming-compare consecutive frames, and report
    * the static-transition share. The DECODE is the stubbed seam (the
    * X12/X36 contract — no codec in this container): the synthetic pHash
    * is LOCALITY-PRESERVING by construction, which is the property a
    * real pHash has and random content hashes lack — within a shot,
    * consecutive frames differ by ≤ 2 bits (base XOR a 1-bit wobble);
    * at every [[FrameCutEvery]]-th frame the "scene changes" (base XOR a
    * fresh md5 draw, ~30 bits away). Everything downstream of the stub —
    * per-frame rows, the lag window, XOR + bit_count hamming (codegen'd
    * integer ops both engines own), the per-video rollup — is the REAL
    * Spark-side pipeline a production frame deduper runs.
    *
    * Scale shape: frames explode per video and never leave their
    * doc-partitioned window; the rollup is video-bounded. */
  def frameDedupQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long")
    val cutDraw = conv(substring(
      md5(concat(col("text"), lit(":cut:"),
        col("frame_idx").cast("string"))), 1, 15), 16, 10).cast("long")
    val wobble = expr("shiftleft(CAST(1 AS BIGINT), CAST(frame_idx % 7 AS INT))")
    val frames = Tables.documents(spark, sfDir)
      .filter((col("doc_id") % 3 + 1) === 3) // media_type == 'video'
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          (length(encode(col("text"), "utf-8")) % 7 + 1) - 1))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        when(col("frame_idx") % FrameCutEvery === 0 && col("frame_idx") > 0,
          base.bitwiseXOR(cutDraw))
          .otherwise(base.bitwiseXOR(wobble)).as("phash"))
    val byVideo = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("prev", lag(col("phash"), 1).over(byVideo))
      .withColumn("ham",
        when(col("prev").isNull, lit(null))
          .otherwise(bit_count(col("phash").bitwiseXOR(col("prev")))))
      .groupBy(col("doc_id"))
      .agg(Num.countStar.as("n_frames"),
        sum(when(col("ham").isNotNull, 1L).otherwise(0L)).as("n_transitions"),
        sum(when(col("ham") <= FrameHamThreshold, 1L).otherwise(0L))
          .as("n_static"),
        sum(coalesce(col("ham").cast("long"), lit(0L))).as("ham_sum"))
      .withColumn("static_permille",
        when(col("n_transitions") === 0L, lit(0L)).otherwise(
          Num.divLong(col("n_static") * 1000L, col("n_transitions"))))
      .orderBy(col("doc_id"))
  }

  val frameDedupOracle: String =
    s"""WITH f AS (
       |  SELECT doc_id, i AS frame_idx,
       |    CASE WHEN i % ${FrameCutEvery} = 0 AND i > 0 THEN
       |      xor(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT),
       |          CAST(concat('0x', substr(md5(text || ':cut:' || i), 1, 15))
       |            AS BIGINT))
       |    ELSE
       |      xor(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT),
       |          CAST(1 AS BIGINT) << (i % 7))
       |    END AS phash
       |  FROM documents, UNNEST(range(0, octet_length(encode(text)) % 7 + 1))
       |    AS u(i)
       |  WHERE doc_id % 3 + 1 = 3),
       |l AS (
       |  SELECT doc_id, frame_idx, phash,
       |    LAG(phash, 1) OVER (PARTITION BY doc_id ORDER BY frame_idx)
       |      AS prev
       |  FROM f),
       |h AS (
       |  SELECT doc_id,
       |    CASE WHEN prev IS NULL THEN NULL
       |         ELSE bit_count(xor(phash, prev)) END AS ham
       |  FROM l)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
       |  CAST(SUM(CASE WHEN ham IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_transitions,
       |  CAST(SUM(CASE WHEN ham <= ${FrameHamThreshold} THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_static,
       |  CAST(SUM(COALESCE(ham, 0)) AS BIGINT) AS ham_sum,
       |  CAST(CASE WHEN SUM(CASE WHEN ham IS NOT NULL THEN 1 ELSE 0 END) = 0
       |    THEN 0
       |    ELSE SUM(CASE WHEN ham <= ${FrameHamThreshold} THEN 1 ELSE 0
       |      END) * 1000
       |      // SUM(CASE WHEN ham IS NOT NULL THEN 1 ELSE 0 END) END
       |    AS BIGINT) AS static_permille
       |FROM h GROUP BY 1 ORDER BY doc_id""".stripMargin
}

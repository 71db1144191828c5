package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing — north_star
  * extension surface. Media travel as opaque `binary` columns plus a
  * typed metadata struct; per-item compute (decode / resize /
  * frame-sample / feature-extract) runs as typed Dataset transforms
  * over case classes, the Scala analog of the reference ecosystem's
  * `mapInPandas` batch UDFs.
  *
  * The codecs are REAL and ship with the JDK — no external
  * dependencies: PNG encode/decode via `javax.imageio.ImageIO`, WAV
  * (RIFF/PCM-16) via `javax.sound.sampled.AudioSystem`, and video as
  * a minimal length-prefixed container of PNG frames ([[JdkCodec]];
  * "GVID" — a toy FORMAT, but every byte of frame decode is the real
  * ImageIO path). The fixture generator writes actual PNG/WAV bytes
  * with dimensions/durations derived arithmetically from `media_id`,
  * so decode results are oracle-checkable end-to-end: the m1 gate
  * hash-matches DuckDB reconstructing the dims the ENCODER used from
  * the dims the DECODER read back.
  *
  * Scale: rows carry multi-MB payloads in production, so operators
  * (a) never shuffle the bytes (feature/meta extraction projects
  * *before* any exchange), (b) size partitions by bytes not rows
  * (`maxPartitionBytes`), (c) run iterator-to-iterator so a real
  * codec context is per-partition, not per-row.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRateHz: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      meta: MediaMeta)
  final case class DecodedFrame(media_id: Long, frame_idx: Int, width: Int,
      height: Int, pixels_crc: Long)
  final case class MediaFeature(media_id: Long, kind: String,
    feature: Array[Float])

  /** In-JDK codec layer. Every payload is decoded by the standard
    * library — `ImageIO.read` for PNG, `AudioSystem` for WAV — so the
    * pipeline exercises real parse/decode work; generation is
    * deterministic (splitmix-style mixing of `media_id`), making
    * results exact for tests AND reproducible across executors.
    *
    * Pixel/sample values are drawn from a per-media amplitude window
    * (centre/spread mixed from the id), not uniform noise: histogram
    * features then carry real metric structure (windows overlap ⇔
    * cosine similarity), which is what the IVF gates cluster on. */
  object JdkCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** splitmix64 finalizer over (seed, i) — the one mixing primitive
      * every generator derives from. */
    private[ops] def mix(seed: Long, i: Long): Long = {
      var z = seed ^ (i * 0x9e3779b97f4a7c15L) ^ 0x2545f4914f6cdd1dL
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    private def pos(x: Long, m: Long): Long = math.floorMod(x, m)

    // ---- image (PNG via ImageIO) ----------------------------------------

    /** Deterministic grayscale raster → real PNG bytes. Pixels sit in
      * a per-seed window [μ−σ, μ+σ] clamped to [0,255]. */
    def encodePng(seed: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val mu = pos(mix(seed, -1L), 256L).toInt
      val sigma = 16 + pos(mix(seed, -2L), 64L).toInt
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g0 = mu - sigma + pos(mix(seed, y.toLong * w + x), 2L * sigma + 1).toInt
          val g = math.max(0, math.min(255, g0))
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "not a decodable image payload")
      img
    }

    def imageDims(bytes: Array[Byte]): (Int, Int) = {
      val img = decodeImage(bytes)
      (img.getWidth, img.getHeight)
    }

    /** Nearest-neighbour resample + PNG re-encode — deliberately NOT
      * Java2D rendering (hint-dependent), so resized bytes are
      * deterministic everywhere. */
    def resizePng(bytes: Array[Byte], nw: Int, nh: Int): Array[Byte] = {
      val src = decodeImage(bytes)
      val dst = new java.awt.image.BufferedImage(nw, nh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < nh) {
        val sy = (y.toLong * src.getHeight / nh).toInt
        var x = 0
        while (x < nw) {
          dst.setRGB(x, y, src.getRGB((x.toLong * src.getWidth / nw).toInt, sy))
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", out)
      out.toByteArray
    }

    /** CRC32 over the row-major ARGB raster of a decoded image —
      * content identity that survives any lossless re-encode. */
    def rasterCrc(img: java.awt.image.BufferedImage): Long = {
      val crc = new java.util.zip.CRC32()
      val buf = java.nio.ByteBuffer.allocate(4 * img.getWidth)
      var y = 0
      while (y < img.getHeight) {
        buf.clear()
        var x = 0
        while (x < img.getWidth) { buf.putInt(img.getRGB(x, y)); x += 1 }
        crc.update(buf.array(), 0, buf.position())
        y += 1
      }
      crc.getValue
    }

    /** `bins`-bin grayscale histogram of the raster, L2-normalised —
      * the image feature vector. */
    def imageHistogram(img: java.awt.image.BufferedImage, bins: Int): Array[Float] = {
      val counts = new Array[Long](bins)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val g = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          counts(g * bins / 256) += 1
          x += 1
        }
        y += 1
      }
      l2(counts)
    }

    // ---- audio (WAV/PCM-16 via javax.sound.sampled) ---------------------

    /** Deterministic mono PCM-16 samples in a per-seed amplitude
      * window, wrapped in a standard RIFF/WAVE header. */
    def encodeWav(seed: Long, sampleRateHz: Int, nSamples: Int): Array[Byte] = {
      val c = (pos(mix(seed, -3L), 16384L) - 8192L).toInt
      val s = 1024 + pos(mix(seed, -4L), 8192L).toInt
      val data = java.nio.ByteBuffer
        .allocate(44 + 2 * nSamples).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      data.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * nSamples)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRateHz).putInt(sampleRateHz * 2)
        .putShort(2).putShort(16) // block align, bits/sample
        .put("data".getBytes("US-ASCII")).putInt(2 * nSamples)
      var i = 0
      while (i < nSamples) {
        val v = c - s + pos(mix(seed, 7000L + i), 2L * s + 1).toInt
        data.putShort(math.max(Short.MinValue.toInt,
          math.min(Short.MaxValue.toInt, v)).toShort)
        i += 1
      }
      data.array()
    }

    /** Real WAV parse: sample rate + PCM-16 samples via AudioSystem. */
    def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val raw = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(raw).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val samples = new Array[Short](raw.length / 2)
        var i = 0
        while (i < samples.length) { samples(i) = bb.getShort(); i += 1 }
        (fmt.getSampleRate.toInt, samples)
      } finally in.close()
    }

    /** `bins`-bin amplitude histogram over PCM-16 samples,
      * L2-normalised — the audio feature vector. */
    def audioHistogram(samples: Array[Short], bins: Int): Array[Float] = {
      val counts = new Array[Long](bins)
      var i = 0
      while (i < samples.length) {
        counts(((samples(i).toInt + 32768) * bins) >>> 16) += 1
        i += 1
      }
      l2(counts)
    }

    // ---- video (length-prefixed PNG frames) -----------------------------

    private val GvidMagic = 0x47564944 // "GVID"

    /** Toy container: magic, frame count, then length-prefixed PNG
      * frames. The CONTAINER is minimal by design; the frames are
      * real PNGs and frame decode is the real ImageIO path. */
    def encodeGvid(seed: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
      val frames = Array.tabulate(nFrames)(f => encodePng(mix(seed, 5000L + f), w, h))
      val out = java.nio.ByteBuffer.allocate(
        8 + frames.map(_.length + 4).sum)
      out.putInt(GvidMagic).putInt(nFrames)
      frames.foreach { f => out.putInt(f.length).put(f) }
      out.array()
    }

    def gvidFrameCount(bytes: Array[Byte]): Int = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      require(bb.getInt() == GvidMagic, "not a GVID payload")
      bb.getInt()
    }

    /** The `idx`-th frame's PNG bytes (idx clamped to the last frame,
      * so samplers may over-ask near the duration boundary). */
    def gvidFrame(bytes: Array[Byte], idx: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      require(bb.getInt() == GvidMagic, "not a GVID payload")
      val n = bb.getInt()
      val want = math.max(0, math.min(idx, n - 1))
      var f = 0
      while (f < want) { val len = bb.getInt(); bb.position(bb.position() + len); f += 1 }
      val out = new Array[Byte](bb.getInt())
      bb.get(out)
      out
    }

    private def l2(counts: Array[Long]): Array[Float] = {
      var ss = 0.0
      var i = 0
      while (i < counts.length) { ss += counts(i).toDouble * counts(i); i += 1 }
      val n = if (ss == 0) 1.0 else math.sqrt(ss)
      counts.map(c => (c / n).toFloat)
    }
  }

  /** Fixture-generation arithmetic, shared with the m1 oracle: the
    * DuckDB twin reconstructs these dims/durations from `doc_id`, the
    * Spark side reads them back out of the DECODED bytes — the gate
    * hash-matches iff encode→decode roundtrips exactly. */
  private[graft] def imageW(id: Long): Int = 16 + (id % 48).toInt
  private[graft] def imageH(id: Long): Int = 16 + (id % 32).toInt
  private[graft] def audioSamples(id: Long): Int = 160 * (1 + (id % 10)).toInt
  private[graft] val AudioRateHz = 16000
  private[graft] val VideoFrames = 10
  private[graft] val VideoMs = 10000L

  /** Synthesize a deterministic media table from the documents
    * fixture (no binary fixtures ship): REAL PNG / WAV / GVID payloads
    * generated executor-side from `doc_id`-mixed rasters and samples.
    * Image dims are left 0 in the meta — [[decodeImages]] fills them
    * from the bytes, which is the work the m1 gate measures. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        (id % 3) match {
          case 0 => MediaRow(id, "image",
            JdkCodec.encodePng(id, imageW(id), imageH(id)),
            MediaMeta("image", 0, 0, 0, 0L))
          case 1 =>
            val n = audioSamples(id)
            MediaRow(id, "audio", JdkCodec.encodeWav(id, AudioRateHz, n),
              MediaMeta("audio", 0, 0, AudioRateHz,
                n.toLong * 1000 / AudioRateHz))
          case _ => MediaRow(id, "video",
            JdkCodec.encodeGvid(id, VideoFrames, 16, 12),
            MediaMeta("video", 0, 0, 0, VideoMs))
        }
      }
    }
  }

  /** Decode pass: fill width/height for images by actually decoding
    * the PNG (`ImageIO.read`). Iterator-to-iterator mapPartitions so
    * a codec context is per-partition, not per-row. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind == "image") {
          val (w, hgt) = JdkCodec.imageDims(m.bytes)
          m.copy(meta = m.meta.copy(width = w, height = hgt))
        } else m
      }
    }
  }

  /** Resize pass: images above maxDim are resampled
    * (nearest-neighbour) and re-encoded as PNG with proportionally
    * scaled dims. Non-images and small images pass through untouched —
    * the common early-exit a real pipeline needs so it doesn't
    * re-encode 90% of the corpus. */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int = 512): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val w = m.meta.width; val h = m.meta.height
        if (m.kind != "image" || math.max(w, h) <= maxDim || w <= 0) m
        else {
          val scale = maxDim.toDouble / math.max(w, h)
          // round, not floor: w·(maxDim/w) can land at maxDim−ε
          val (nw, nh) = (math.max(1, math.round(w * scale).toInt),
            math.max(1, math.round(h * scale).toInt))
          m.copy(bytes = JdkCodec.resizePng(m.bytes, nw, nh),
            meta = m.meta.copy(width = nw, height = nh))
        }
      }
    }
  }

  /** Frame sampling: explode each video into ≤ maxFrames decoded
    * frames (every `everyMs` of duration); each sampled frame is a
    * real PNG decode, its identity the raster CRC. Output rows are
    * small (no bytes) — the projection drops the payload *before* any
    * downstream shuffle. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L,
      maxFrames: Int = 16): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    // columnar `where`, not a typed filter: the typed predicate ran
    // BELOW nothing — every row (image/audio too) was deserialized,
    // payload bytes copied into a MediaRow, just to test `kind`. The
    // Column predicate evaluates on the serialized form and pushes to
    // the parquet scan (PushedFilters: kind = 'video'), so 2/3 of the
    // corpus' payload bytes never reach the deserializer (guide §6
    // pushdown; frame decode itself already samples-then-decodes —
    // gvidFrame slices frame i out of the container before ImageIO).
    media.where(col("kind") === "video").flatMap { m =>
      val n = math.min(maxFrames, math.max(1L, m.meta.durationMs / everyMs)).toInt
      (0 until n).iterator.map { i =>
        val img = JdkCodec.decodeImage(JdkCodec.gvidFrame(m.bytes, i))
        DecodedFrame(m.media_id, i, img.getWidth, img.getHeight,
          JdkCodec.rasterCrc(img))
      }
    }
  }

  /** Feature extraction: payload → dense float vector (L2-normalised
    * content histogram — pixel intensity for images/video frames,
    * sample amplitude for audio), ready for the [[Similarity]]
    * operators. The per-media amplitude windows give the vectors real
    * metric structure, so IVF clustering over them is meaningful. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val feat = m.kind match {
          case "image" =>
            JdkCodec.imageHistogram(JdkCodec.decodeImage(m.bytes), dim)
          case "audio" =>
            JdkCodec.audioHistogram(JdkCodec.decodeWav(m.bytes)._2, dim)
          case _ =>
            JdkCodec.imageHistogram(
              JdkCodec.decodeImage(JdkCodec.gvidFrame(m.bytes, 0)), dim)
        }
        MediaFeature(m.media_id, m.kind, feat)
      }
    }
  }
}

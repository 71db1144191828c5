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
  * The codec calls themselves are STUBBED (no image/audio libraries
  * in this container): [[FakeCodec]] is a deterministic stand-in that
  * fabricates decode results from the bytes. Everything around it —
  * schema, encoders, partitioning, batch shape, null/corrupt-input
  * handling — is the real engineering and is tested. Swapping
  * FakeCodec for javacv/ffmpeg is a one-object change.
  *
  * Scale: rows carry multi-MB payloads, so operators (a) never
  * shuffle the bytes (feature/meta extraction projects *before* any
  * exchange), (b) size partitions by bytes not rows
  * (`maxPartitionBytes`), (c) keep per-partition batches bounded.
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

  /** STUB decode layer — deterministic fake: all "decoded" values are
    * pure functions of the input bytes, so tests are exact. A real
    * build replaces these three methods with codec calls; signatures
    * (bytes in, struct out; Iterator-to-Iterator at call sites) are
    * the contract. */
  object FakeCodec {
    private def h(bytes: Array[Byte], salt: Long): Long = {
      var x = salt ^ 0x9e3779b97f4a7c15L
      var i = 0
      while (i < bytes.length) { x = (x ^ bytes(i)) * 0x100000001b3L; i += 1 }
      x
    }
    /** "Decode" image dims from bytes (stand-in for e.g. ImageIO). */
    def imageDims(bytes: Array[Byte]): (Int, Int) =
      ((math.floorMod(h(bytes, 1), 1920) + 1).toInt,
        (math.floorMod(h(bytes, 2), 1080) + 1).toInt)
    /** "Decode" the idx-th video frame's checksum. */
    def frameCrc(bytes: Array[Byte], idx: Int): Long = h(bytes, 100L + idx)
    /** "Extract" a dim-float embedding from the payload. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] =
      Array.tabulate(dim)(i =>
        (math.floorMod(h(bytes, 1000L + i), 2000L) - 1000L).toFloat / 1000f)
  }

  /** Synthesize a deterministic media table from the documents
    * fixture (no binary fixtures ship): payload bytes derive from the
    * text via repeated sha2 — sized 1-4 KB so plumbing (not IO) is
    * what's exercised. Distributed generation, no driver data. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    docs.select(
      col("doc_id").as("media_id"),
      element_at(kinds, (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      // 32-byte sha repeated via concat → pseudo-payload
      repeat(sha2(col("text"), 256), 32).cast("binary").as("bytes"))
      .withColumn("meta", struct(
        col("kind"),
        lit(0).as("width"), lit(0).as("height"),
        when(col("kind") === "audio", 16000).otherwise(0).as("sampleRateHz"),
        when(col("kind") === "video", 10000L).otherwise(0L).as("durationMs")))
      .as[MediaRow]
  }

  /** Decode pass: fill width/height for images via the (stubbed)
    * codec. Iterator-to-iterator mapPartitions so a real decoder can
    * hold one codec context per partition, not per row. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind == "image") {
          val (w, hgt) = FakeCodec.imageDims(m.bytes)
          m.copy(meta = m.meta.copy(width = w, height = hgt))
        } else m
      }
    }
  }

  /** Resize pass: images above maxDim get "re-encoded" (stub: the
    * fake codec derives new payload bytes deterministically) with
    * proportionally scaled dims. Non-images and small images pass
    * through untouched — the common early-exit a real pipeline needs
    * so it doesn't re-encode 90% of the corpus. */
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
          // stub re-encode: truncate payload proportionally (real
          // impl: codec encode of the scaled raster)
          val nbytes = java.util.Arrays.copyOf(m.bytes,
            math.max(64, (m.bytes.length * scale).toInt))
          m.copy(bytes = nbytes, meta = m.meta.copy(width = nw, height = nh))
        }
      }
    }
  }

  /** Frame sampling: explode each video into ≤ maxFrames decoded
    * frames (every `everyMs` of duration). Output rows are small
    * (no bytes) — the projection drops the payload *before* any
    * downstream shuffle. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L,
      maxFrames: Int = 16): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.min(maxFrames, math.max(1L, m.meta.durationMs / everyMs)).toInt
      val (w, hgt) = FakeCodec.imageDims(m.bytes)
      (0 until n).iterator
        .map(i => DecodedFrame(m.media_id, i, w, hgt, FakeCodec.frameCrc(m.bytes, i)))
    }
  }

  /** Feature extraction: payload → dense float vector, ready for the
    * [[Similarity]] operators. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(m => MediaFeature(m.media_id, m.kind, FakeCodec.features(m.bytes, dim)))
    }
  }
}

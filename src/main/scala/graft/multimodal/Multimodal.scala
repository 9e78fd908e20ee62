package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star, BASELINE.json): image/audio/video
  * as opaque BINARY payloads + typed metadata struct, with
  * decode / feature-extract / resize / frame-sample implemented as
  * partition-iterator transforms (`Dataset.mapPartitions` — the Scala
  * analogue of PySpark's `mapInPandas` batch shape: one iterator per
  * partition, no per-row closure dispatch).
  *
  * Decode dispatches on magic bytes: PPM (P6) images, PCM WAV audio,
  * PPM-stream video, and — via `javax.imageio`, which ships in the
  * standard JDK — compressed JPEG/PNG stills all
  * decode / feature-extract / resize / frame-sample FOR REAL through
  * the pure-JVM [[Codecs]]; MP4 containers parse FOR REAL at the
  * metadata level (the ftyp/moov atom walk — duration, track count,
  * codec fourccs, dims). Only video FRAME decode falls to `decodeStub`
  * (deterministic fake, clearly marked): the container ships no video
  * codecs, and swapping the stub body for an ffmpeg call changes
  * nothing structural.
  *
  * Scale notes: payloads never pass through a shuffle unless the
  * caller repartitions; every transform is narrow (mapPartitions).
  * Feature vectors are fixed-size; metadata is columnar-friendly.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],
      mime: String)

  case class DecodedRow(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  case class FeatureRow(media_id: Long, kind: String, feature: Array[Float])

  /** Fused decode+features output: metadata AND the feature vector
    * from ONE parse, payload column dropped (downstream of feature
    * extraction nothing needs the bytes, so they stop flowing —
    * the row narrows from payload-sized to a few dozen bytes).
    */
  case class DecodedFeatureRow(
      media_id: Long,
      kind: String,
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      feature: Array[Float])

  case class FrameRow(media_id: Long, frame_no: Int, frame: Array[Byte])

  /** Deterministic fake media corpus derived from `documents` (text
    * bytes as payload; kind round-robins by doc_id).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      concat(lit("application/x-graft-"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int"))).as("mime"))

  /** STUB — stands in for a real decoder of COMPRESSED formats
    * (libjpeg/ffmpeg/...): derives (width, height, duration)
    * deterministically from payload bytes. Replace the body with a
    * codec call in a real deployment. Raw formats never reach it —
    * see [[decodeMeta]].
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    val n = payload.length
    val head = payload.take(8).foldLeft(0L)((h, b) => h * 31 + (b & 0xff))
    (64 + (head % 577).toInt, 64 + (n % 359), n.toLong * 20L)
  }

  /** Per-payload metadata: REAL parse for PPM/JPEG/PNG/WAV and — via
    * the ISO-BMFF atom walk — MP4 containers (falling back to the stub
    * if the parse fails — a text payload starting with "P6" or a
    * truncated JPEG must degrade, never crash an executor). Only
    * non-MP4 compressed video still reaches the stub.
    */
  private def decodeMeta(payload: Array[Byte]): (Int, Int, Long) =
    if (Codecs.isPpm(payload) || Codecs.isJpeg(payload) || Codecs.isPng(payload))
      Codecs.parseImage(payload)
        .map(p => (p.width, p.height, 0L))
        .getOrElse(decodeStub(payload))
    else if (Codecs.isWav(payload))
      Codecs.decodeWav(payload)
        .map(w => (0, 0,
          w.samples.length.toLong / w.channels * 1000L / w.sampleRate))
        .getOrElse(decodeStub(payload))
    else if (Codecs.isMp4(payload))
      Codecs.parseMp4(payload)
        .map(m => (m.width, m.height, m.durationMs))
        .getOrElse(decodeStub(payload))
    else decodeStub(payload)

  /** Decode pass: one iterator per partition (mapInPandas-shaped). */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (w, h, d) = decodeMeta(m.payload)
        DecodedRow(m.media_id, m.kind, m.payload, m.mime, w, h, d)
      }
    }
  }

  /** Feature extraction: REAL features for raw formats (PPM → channel
    * means + luminance; WAV → rms/zero-crossings/peak/duration);
    * fixed-dim chunked byte hashing for compressed payloads (STUB for
    * a real vision/audio encoder; the per-partition batch shape is the
    * real part either way).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      dim: Int = 16): Dataset[FeatureRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val real: Option[Array[Float]] =
          if (Codecs.isPpm(m.payload) || Codecs.isJpeg(m.payload) ||
              Codecs.isPng(m.payload))
            Codecs.parseImage(m.payload).map(Codecs.ppmFeatures)
          else if (Codecs.isWav(m.payload)) Codecs.decodeWav(m.payload).map(Codecs.wavFeatures)
          else None
        val f = real.getOrElse(hashFeatures(m.payload, dim))
        FeatureRow(m.media_id, m.kind, f)
      }
    }
  }

  /** STUB feature fallback for payloads no real codec claims:
    * fixed-dim chunked byte hashing (stands in for a vision/audio
    * encoder).
    */
  private def hashFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      val slot = i % dim
      acc(slot) = acc(slot) * 31.0f + (payload(i) & 0xff)
      i += 1
    }
    var j = 0
    while (j < dim) { acc(j) = acc(j) % 1000.0f; j += 1 }
    acc
  }

  /** Fused decode + feature pass — the production shape for COMPRESSED
    * formats: one parse per payload feeds BOTH the metadata columns
    * and the feature vector. Composing the separate decode →
    * extractFeatures stages parses every payload twice (each stage
    * re-reads the bytes), and at compressed-image decode cost
    * (ImageIO inflate, ~ms per image — the dominant term at any
    * scale) the second parse doubles the pipeline; the fused stage
    * also evaluates the media source once instead of once per branch
    * and never re-widens rows with payload bytes after the parse.
    * Fallbacks match the unfused stages exactly: failed/unclaimed
    * parses degrade to the stub metadata + byte-hash features, never
    * crash an executor.
    */
  def decodeWithFeatures(spark: SparkSession, media: DataFrame,
      dim: Int = 16): Dataset[DecodedFeatureRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val p = m.payload
        val parsed: Option[DecodedFeatureRow] =
          if (Codecs.isPpm(p) || Codecs.isJpeg(p) || Codecs.isPng(p))
            Codecs.parseImage(p).map(img =>
              DecodedFeatureRow(m.media_id, m.kind, m.mime,
                img.width, img.height, 0L, Codecs.ppmFeatures(img)))
          else if (Codecs.isWav(p))
            Codecs.decodeWav(p).map(w =>
              DecodedFeatureRow(m.media_id, m.kind, m.mime, 0, 0,
                w.samples.length.toLong / w.channels * 1000L / w.sampleRate,
                Codecs.wavFeatures(w)))
          else None
        parsed.getOrElse {
          val (w, h, d) = decodeStub(p)
          DecodedFeatureRow(m.media_id, m.kind, m.mime, w, h, d,
            hashFeatures(p, dim))
        }
      }
    }
  }

  /** Resize: REAL nearest-neighbor resample for PPM/JPEG/PNG payloads
    * (output is a valid P6 at the target dims — the canonical raw
    * interchange frame downstream stages consume); other payloads
    * truncate / zero-pad to the target byte budget (STUB resampling;
    * structure real).
    */
  def resize(spark: SparkSession, decoded: Dataset[DecodedRow],
      targetW: Int, targetH: Int): Dataset[DecodedRow] = {
    import spark.implicits._
    val budget = targetW * targetH / 64
    decoded.mapPartitions { it =>
      it.map { m =>
        val out = Codecs.parseImage(m.payload) match {
          case Some(p) => Codecs.resizePpm(p, targetW, targetH)
          case None => java.util.Arrays.copyOf(m.payload, budget)
        }
        m.copy(payload = out, width = targetW, height = targetH)
      }
    }
  }

  /** Frame sampling for video payloads — one output row per frame, a
    * generator (flatMap) over the partition iterator. PPM-stream
    * payloads (concatenated P6 frames, the raw-y4m shape) split into
    * REAL frames, each a standalone valid P6 image; other payloads
    * fall to fixed-stride byte windows (STUB for keyframe extraction).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 32, stride: Int = 64): Dataset[FrameRow] = {
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow].mapPartitions { it =>
      it.flatMap { m =>
        if (Codecs.isPpm(m.payload)) {
          Codecs.decodePpmStream(m.payload).zipWithIndex.map { case (f, i) =>
            FrameRow(m.media_id, i, Codecs.encodePpm(f.width, f.height, f.pixels))
          }
        } else m.payload.grouped(stride).zipWithIndex.map { case (chunk, i) =>
          FrameRow(m.media_id, i, chunk.take(frameBytes))
        }.toSeq
      }
    }
  }
}

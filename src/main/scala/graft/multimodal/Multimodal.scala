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
  * DECODE IS A STUB: this container ships no imaging/audio libraries,
  * so `decodeStub` derives metadata deterministically from the payload
  * bytes (clearly marked). The Spark-side plumbing — schema, encoders,
  * partitioning, batch iteration — is real and tested; swapping the
  * stub body for a real codec call changes nothing structural.
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

  /** STUB — stands in for a real decoder (libjpeg/ffmpeg/...): derives
    * (width, height, duration) deterministically from payload bytes.
    * Replace the body with a codec call in a real deployment.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    val n = payload.length
    val head = payload.take(8).foldLeft(0L)((h, b) => h * 31 + (b & 0xff))
    (64 + (head % 577).toInt, 64 + (n % 359), n.toLong * 20L)
  }

  /** Decode pass: one iterator per partition (mapInPandas-shaped). */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (w, h, d) = decodeStub(m.payload)
        DecodedRow(m.media_id, m.kind, m.payload, m.mime, w, h, d)
      }
    }
  }

  /** Feature extraction: fixed-dim pseudo-embedding per payload —
    * chunked byte hashing (STUB for a real vision/audio encoder; the
    * per-partition batch shape is the real part).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      dim: Int = 16): Dataset[FeatureRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val f = new Array[Float](dim)
        var i = 0
        while (i < m.payload.length) {
          val slot = i % dim
          f(slot) = f(slot) * 31.0f + (m.payload(i) & 0xff)
          i += 1
        }
        var j = 0
        while (j < dim) { f(j) = f(j) % 1000.0f; j += 1 }
        FeatureRow(m.media_id, m.kind, f)
      }
    }
  }

  /** Resize: payload truncated/zero-padded to the target byte budget,
    * metadata updated (STUB resampling; structure real).
    */
  def resize(spark: SparkSession, decoded: Dataset[DecodedRow],
      targetW: Int, targetH: Int): Dataset[DecodedRow] = {
    import spark.implicits._
    val budget = targetW * targetH / 64
    decoded.mapPartitions { it =>
      it.map { m =>
        val out = java.util.Arrays.copyOf(m.payload, budget)
        m.copy(payload = out, width = targetW, height = targetH)
      }
    }
  }

  /** Frame sampling for video payloads: fixed-stride byte windows as
    * frames (STUB for keyframe extraction), one output row per frame —
    * a generator (flatMap) over the partition iterator.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 32, stride: Int = 64): Dataset[FrameRow] = {
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow].mapPartitions { it =>
      it.flatMap { m =>
        m.payload.grouped(stride).zipWithIndex.map { case (chunk, i) =>
          FrameRow(m.media_id, i, chunk.take(frameBytes))
        }
      }
    }
  }
}

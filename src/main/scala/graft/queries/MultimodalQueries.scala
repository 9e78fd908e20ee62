package graft.queries

import graft.{Q, QueryModule}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-visible slice of the multimodal pipeline: the deterministic
  * fake corpus + stub decode produce metadata that pure SQL can
  * replicate (payload = text bytes ⇒ sizes/kinds derivable from
  * `documents`), so the plumbing runs inside the correctness gate even
  * though payload bytes themselves aren't compared.
  */
object MultimodalQueries extends QueryModule {

  /** MM1: decode + metadata rollup per media kind. */
  def mm1MetaStats(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Q.t(spark, dir, "documents"))
    Multimodal.decode(spark, media).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        min(col("width")).as("min_w"),
        max(col("height")).as("max_h"),
        sum(col("duration_ms")).as("total_ms"))
      .orderBy(col("kind").asc)
  }

  // width/height/duration mirror decodeStub: head = fold of first 8
  // bytes (h*31 + byte), width = 64 + head % 577, height = 64 + len % 359,
  // duration = len * 20.
  val mm1Oracle: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |    text,
      |    len(text) AS n  -- documents text is ASCII: chars == bytes
      |  FROM documents),
      |decoded AS (
      |  SELECT media_id, kind, n,
      |    CAST(64 + (list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, least(n, 8)),
      |        i -> CAST(ord(text[i:i]) AS BIGINT))),
      |      (h, b) -> (h * 31 + b)) % 577) AS INT) AS width,
      |    CAST(64 + (n % 359) AS INT) AS height,
      |    n * 20 AS duration_ms
      |  FROM media)
      |SELECT kind, COUNT(*) AS n, CAST(SUM(n) AS BIGINT) AS total_bytes,
      |  MIN(width) AS min_w, MAX(height) AS max_h,
      |  CAST(SUM(duration_ms) AS BIGINT) AS total_ms
      |FROM decoded
      |GROUP BY kind
      |ORDER BY kind ASC NULLS FIRST""".stripMargin

  /** MM2: frame sampling fan-out — frames per video, oracle-able from
    * text length (stride 64: ceil(n/64) frames).
    */
  def mm2FrameCounts(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Q.t(spark, dir, "documents"))
    Multimodal.sampleFrames(spark, media).toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        max(length(col("frame"))).as("max_frame_bytes"))
      .orderBy(col("media_id").asc)
  }

  val mm2Oracle: String =
    """SELECT doc_id AS media_id,
      |  CAST(ceil(len(text) / 64.0) AS BIGINT) AS n_frames,
      |  CAST(least(len(text), 32) AS INT) AS max_frame_bytes
      |FROM documents
      |WHERE doc_id % 3 = 2
      |ORDER BY media_id ASC NULLS FIRST""".stripMargin

  /** MM3: the REAL codec path inside the oracle gate — synthesize a
    * valid P6 image per document (dims and a uniform pixel value
    * derived from doc_id), round it through the real parser
    * ([[graft.multimodal.Codecs.decodePpm]]) and the real feature
    * extractor, and emit parsed dims + the red-channel mean. The
    * oracle recomputes all three analytically — checkable only
    * because decode is a REAL parse of real image bytes (the stub
    * would produce unrelated numbers). A uniform image's channel mean
    * is its pixel value exactly (v·n/n in double is exact), so the
    * float→long cast is deterministic.
    */
  def mm3RealDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Codecs
    val media = Q.t(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 5).toInt
          val h = (4 + id % 3).toInt
          val v = (id % 251).toByte
          (id, "image", Codecs.encodePpm(w, h, Array.fill(3 * w * h)(v)),
            "image/x-portable-pixmap")
        }
      }.toDF("media_id", "kind", "payload", "mime")
    // fused stage: one parse yields dims AND features (see
    // decodeWithFeatures scaladoc — the two-stage composition would
    // synthesize and parse every image twice, then join the halves)
    Multimodal.decodeWithFeatures(spark, media).toDF()
      .select(col("media_id"), col("width"), col("height"),
        col("feature")(0).cast("long").as("mean_r"))
      .orderBy(col("media_id").asc)
  }

  val mm3Oracle: String =
    """SELECT doc_id AS media_id,
      |  CAST(8 + doc_id % 5 AS INT) AS width,
      |  CAST(4 + doc_id % 3 AS INT) AS height,
      |  doc_id % 251 AS mean_r
      |FROM documents
      |ORDER BY media_id ASC NULLS FIRST""".stripMargin

  /** MM4: COMPRESSED still-image decode inside the oracle gate — per
    * document, build a PNG (via ImageIO, pure JDK) whose red channel
    * is the uniform value `doc_id % 241` and whose green channel is
    * the column index (a real gradient: proves the decoder reads
    * actual pixels, not header metadata), round it through the
    * magic-dispatch decode + feature path, and emit parsed dims, the
    * exact red mean, and the green mean × 2 (= w−1, integral because
    * the gradient mean is (w−1)/2 over each row). PNG is lossless, so
    * all three are analytically exact — a stub or a lossy roundtrip
    * would fail the hash check.
    */
  def mm4PngDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Codecs
    // fan-out before the PNG encode/decode map (guide §2.5): pure CPU
    // per row over a one-task scan otherwise
    val media = Q.fanOut(Q.t(spark, dir, "documents").select("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (5 + id % 7).toInt
          val h = (3 + id % 4).toInt
          val r = (id % 241).toByte
          val px = new Array[Byte](3 * w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val i = 3 * (y * w + x)
              px(i) = r
              px(i + 1) = x.toByte // gradient: mean = (w-1)/2
              px(i + 2) = 0
              x += 1
            }
            y += 1
          }
          (id, "image", Codecs.encodePng(w, h, px), "image/png")
        }
      }.toDF("media_id", "kind", "payload", "mime")
    // fused stage: ImageIO inflate is the dominant per-row cost, so
    // decoding once (not once per stage) halves the pipeline and the
    // PNG corpus synthesizes once instead of once per branch
    Multimodal.decodeWithFeatures(spark, media).toDF()
      .select(col("media_id"), col("width"), col("height"),
        col("feature")(0).cast("long").as("mean_r"),
        (col("feature")(1) * 2.0).cast("long").as("mean_g_x2"))
      .orderBy(col("media_id").asc)
  }

  val mm4Oracle: String =
    """SELECT doc_id AS media_id,
      |  CAST(5 + doc_id % 7 AS INT) AS width,
      |  CAST(3 + doc_id % 4 AS INT) AS height,
      |  doc_id % 241 AS mean_r,
      |  (5 + doc_id % 7) - 1 AS mean_g_x2
      |FROM documents
      |ORDER BY media_id ASC NULLS FIRST""".stripMargin

  /** MM5: VIDEO container metadata inside the oracle gate — per
    * document, synthesize a structurally-valid MP4 (deterministic
    * duration / track count / codec fourccs / dims derived from
    * doc_id), roundtrip it through the REAL ISO-BMFF atom walk
    * ([[graft.multimodal.Codecs.parseMp4]] — ftyp/moov/mvhd/trak/
    * stsd), and emit the parsed fields. The oracle recomputes them
    * analytically — checkable only because the parse is a real box
    * walk over real container bytes (the stub would produce unrelated
    * numbers). Frame decode stays an explicit non-goal: the JVM ships
    * no video codecs, and the container-metadata layer is what a
    * 100 TB media-lake inventory pass actually reads.
    */
  def mm5Mp4Meta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Codecs
    // fan-out before the MP4 container build/walk (guide §2.5)
    Q.fanOut(Q.t(spark, dir, "documents").select("doc_id")).as[Long]
      .mapPartitions { it =>
        val fourccs = Array("avc1", "hvc1", "mp4a")
        it.map { id =>
          val nTracks = (1 + id % 3).toInt
          val tracks = (0 until nTracks).map { t =>
            val fc = fourccs(((id + t) % 3).toInt)
            if (t == 0)
              (fc, (160 + (id % 8) * 16).toInt, (90 + (id % 6) * 18).toInt)
            else (fc, 0, 0)
          }
          val bytes = Codecs.encodeMp4(id % 90000, 1000, tracks)
          val m = Codecs.parseMp4(bytes).getOrElse(
            throw new IllegalStateException(s"mp4 roundtrip failed for $id"))
          (id, m.durationMs, m.nTracks, m.codecs.mkString(","),
            m.width, m.height)
        }
      }
      .toDF("media_id", "duration_ms", "n_tracks", "codec_list",
        "width", "height")
      .orderBy(col("media_id").asc)
  }

  val mm5Oracle: String =
    """SELECT doc_id AS media_id,
      |  doc_id % 90000 AS duration_ms,
      |  CAST(1 + doc_id % 3 AS INT) AS n_tracks,
      |  array_to_string(list_transform(generate_series(0, CAST(doc_id % 3 AS INT)),
      |    t -> ['avc1','hvc1','mp4a'][CAST((doc_id + t) % 3 AS INT) + 1]), ',') AS codec_list,
      |  CAST(160 + (doc_id % 8) * 16 AS INT) AS width,
      |  CAST(90 + (doc_id % 6) * 18 AS INT) AS height
      |FROM documents
      |ORDER BY media_id ASC NULLS FIRST""".stripMargin

  /** MM6: REAL video FRAME decode inside the oracle gate — per
    * document, synthesize an MJPEG AVI (`1 + id % 3` uniform-gray JPEG
    * frames at 25 fps; dims multiples of 8, gray values on 16-wide
    * bucket centers `8 + 16·((id+f) % 14)`), roundtrip it through the
    * REAL RIFF walk + per-frame ImageIO JPEG decode
    * ([[graft.multimodal.Codecs.parseAviMjpeg]]), and emit frame
    * count, DECODED frame dims, container timing, and the summed
    * 16-bucket quantized luminance of the decoded pixels. Frame
    * count/dims/timing are lossless-exact; the luminance bucket is the
    * lossy-JPEG-safe pixel proof — a uniform gray block decodes within
    * ±3 of its value (DC-only DCT + constant chroma), far inside the
    * ±8 bucket radius, while a stub or header-only "decode" has no
    * access to the value at all. This closes the video-frame-decode
    * gap MM5 left open: MJPEG is the one video codec a stock JVM can
    * fully decode.
    */
  def mm6MjpegFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Codecs
    // fan the id scan out before the JPEG encode/decode map: the work
    // is pure CPU per row and a single-row-group scan is one task
    // (guide §2.5) — measured 3.7 s on one core vs ~0.4 s across 32
    Q.fanOut(Q.t(spark, dir, "documents").select("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (16 + (id % 4) * 8).toInt
          val h = (16 + (id % 3) * 8).toInt
          val n = (1 + id % 3).toInt
          val frames = (0 until n).map { f =>
            val v = (8 + 16 * ((id + f) % 14)).toByte
            Codecs.encodeJpeg(w, h, Array.fill(3 * w * h)(v))
          }
          val avi = Codecs.encodeAviMjpeg(w, h, usPerFrame = 40000L, frames)
          val m = Codecs.parseAviMjpeg(avi).getOrElse(
            throw new IllegalStateException(s"avi roundtrip failed for $id"))
          require(m.frames.size == n, s"frame loss for $id")
          val qvSum = m.frames.map { p =>
            val lum = Codecs.ppmFeatures(p)(3)
            math.round((lum - 8.0) / 16.0)
          }.sum
          (id, m.frames.size, m.frames.head.width, m.frames.head.height,
            m.usPerFrame * m.frames.size / 1000L, qvSum)
        }
      }
      .toDF("media_id", "n_frames", "frame_w", "frame_h",
        "duration_ms", "total_qlum")
      .orderBy(col("media_id").asc)
  }

  val mm6Oracle: String =
    """SELECT doc_id AS media_id,
      |  CAST(1 + doc_id % 3 AS INT) AS n_frames,
      |  CAST(16 + (doc_id % 4) * 8 AS INT) AS frame_w,
      |  CAST(16 + (doc_id % 3) * 8 AS INT) AS frame_h,
      |  40 * (1 + doc_id % 3) AS duration_ms,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(generate_series(0, CAST(doc_id % 3 AS INT)),
      |      f -> (doc_id + f) % 14)), (a, b) -> a + b) AS BIGINT)
      |    AS total_qlum
      |FROM documents
      |ORDER BY media_id ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm6_mjpeg_frames" -> mm6MjpegFrames,
    "mm1_meta_stats" -> mm1MetaStats,
    "mm2_frame_counts" -> mm2FrameCounts,
    "mm3_real_decode" -> mm3RealDecode,
    "mm4_png_decode" -> mm4PngDecode,
    "mm5_mp4_meta" -> mm5Mp4Meta)

  override def oracles: Map[String, String] = Map(
    "mm6_mjpeg_frames" -> mm6Oracle,
    "mm1_meta_stats" -> mm1Oracle,
    "mm2_frame_counts" -> mm2Oracle,
    "mm3_real_decode" -> mm3Oracle,
    "mm4_png_decode" -> mm4Oracle,
    "mm5_mp4_meta" -> mm5Oracle)
}

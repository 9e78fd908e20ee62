package graft

import graft.multimodal.{Codecs, Multimodal}
import org.apache.spark.sql.functions._

/** REAL codec paths (PPM / WAV / PPM-stream): exact dims and duration,
  * analytically-known features, true resampling, frame splitting — and
  * graceful fallback for almost-but-not-valid payloads.
  */
class MultimodalCodecSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  /** w×h gradient: R = x scaled to 0..255, G = y scaled, B = 128. */
  private def gradientPpm(w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = 3 * (y * w + x)
      px(i) = (x * 255 / math.max(1, w - 1)).toByte
      px(i + 1) = (y * 255 / math.max(1, h - 1)).toByte
      px(i + 2) = 128.toByte
    }
    Codecs.encodePpm(w, h, px)
  }

  /** 1 s of a full-scale-half square wave at 8 kHz, period 8 samples. */
  private def squareWav(): Array[Byte] = {
    val samples = Array.tabulate[Short](8000)(i =>
      if ((i / 4) % 2 == 0) 16384 else -16384)
    Codecs.encodeWavPcm16(8000, samples)
  }

  test("PPM roundtrip: encode → decode is exact; spark decode reads real dims") {
    val img = gradientPpm(31, 17)
    val p = Codecs.decodePpm(img).get
    assert((p.width, p.height) === (31, 17))
    assert(p.consumed === img.length)
    assert(Codecs.encodePpm(p.width, p.height, p.pixels).sameElements(img))
    // comments + extra whitespace in the header parse too
    val commented = "P6\n# a comment\n 31\t17 #x\n255\n".getBytes("US-ASCII") ++
      p.pixels
    val pc = Codecs.decodePpm(commented).get
    assert((pc.width, pc.height) === (31, 17))

    val media = Seq((1L, "image", img, "image/x-portable-pixmap"))
      .toDF("media_id", "kind", "payload", "mime")
    val d = Multimodal.decode(spark, media).collect().head
    assert((d.width, d.height) === (31, 17), "real parse, not the stub")
  }

  test("PPM features and resize are real: analytic means, uniform stays uniform") {
    val img = gradientPpm(64, 64)
    val f = Codecs.ppmFeatures(Codecs.decodePpm(img).get)
    // symmetric gradient: mean R = mean G = 127.5, B = 128 exactly
    assert(math.abs(f(0) - 127.5) < 0.51, s"mean R ${f(0)}")
    assert(math.abs(f(1) - 127.5) < 0.51, s"mean G ${f(1)}")
    assert(math.abs(f(2) - 128.0) < 0.01, s"mean B ${f(2)}")

    // uniform image resizes to a uniform image at exact target dims
    val uniform = Codecs.encodePpm(10, 10, Array.fill(300)(77.toByte))
    val resized = Codecs.decodePpm(
      Codecs.resizePpm(Codecs.decodePpm(uniform).get, 4, 6)).get
    assert((resized.width, resized.height) === (4, 6))
    assert(resized.pixels.forall(_ == 77.toByte))
    // gradient corners survive nearest-neighbor downsampling
    val g = Codecs.decodePpm(
      Codecs.resizePpm(Codecs.decodePpm(img).get, 8, 8)).get
    assert((g.pixels(0) & 0xff) === 0, "top-left R stays 0")
    // spark-side: resized payloads are REAL valid P6 at target dims
    val media = Seq((1L, "image", img, "x")).toDF("media_id", "kind", "payload", "mime")
    val out = Multimodal.resize(spark, Multimodal.decode(spark, media), 8, 8)
      .collect().head
    assert(Codecs.decodePpm(out.payload).exists(p => p.width == 8 && p.height == 8))
  }

  test("WAV roundtrip: exact duration, rms/peak/zcr of a known square wave") {
    val wav = squareWav()
    val w = Codecs.decodeWav(wav).get
    assert(w.sampleRate === 8000 && w.channels === 1 && w.samples.length === 8000)
    val f = Codecs.wavFeatures(w)
    assert(math.abs(f(0) - 0.5) < 1e-3, s"rms ${f(0)}") // |s| = 0.5 always
    assert(math.abs(f(1) - 0.25) < 0.01, s"zcr ${f(1)}") // flip every 4
    assert(math.abs(f(2) - 0.5) < 1e-3, s"peak ${f(2)}")
    assert(math.abs(f(3) - 1.0) < 1e-3, s"duration ${f(3)}")

    val media = Seq((1L, "audio", wav, "audio/wav"))
      .toDF("media_id", "kind", "payload", "mime")
    val d = Multimodal.decode(spark, media).collect().head
    assert(d.duration_ms === 1000L, "real duration from the RIFF header")
    val feat = Multimodal.extractFeatures(spark, media).collect().head
    assert(feat.feature.length === 4 && math.abs(feat.feature(0) - 0.5) < 1e-3)
  }

  test("PPM-stream video splits into real frames") {
    val frames = (1 to 5).map(i => gradientPpm(6 + i, 4))
    val stream = frames.reduce(_ ++ _)
    assert(Codecs.decodePpmStream(stream).size === 5)
    val media = Seq((9L, "video", stream, "video/x-ppm-stream"))
      .toDF("media_id", "kind", "payload", "mime")
    val got = Multimodal.sampleFrames(spark, media).collect().sortBy(_.frame_no)
    assert(got.length === 5)
    got.zipWithIndex.foreach { case (fr, i) =>
      val p = Codecs.decodePpm(fr.frame)
      assert(p.exists(_.width === 7 + i), s"frame $i is not a valid P6")
    }
  }

  test("PNG roundtrip is pixel-exact; JPEG is within lossy tolerance; dims exact") {
    // a non-trivial image: red uniform, green column gradient, blue rows
    val (w, h) = (12, 9)
    val px = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = 3 * (y * w + x)
      px(i) = 200.toByte; px(i + 1) = (x * 20).toByte; px(i + 2) = (y * 25).toByte
    }
    val png = Codecs.encodePng(w, h, px)
    assert(Codecs.isPng(png) && !Codecs.isPpm(png))
    val back = Codecs.decodeImage(png).get
    assert(back.width === w && back.height === h)
    assert(back.pixels.toSeq === px.toSeq, "PNG is lossless: bytes must roundtrip")
    val jpg = Codecs.encodeJpeg(w, h, px)
    assert(Codecs.isJpeg(jpg))
    val jback = Codecs.decodeImage(jpg).get
    assert(jback.width === w && jback.height === h)
    // lossy: channel MEANS within a few counts of the source means
    val want = Codecs.ppmFeatures(Codecs.Ppm(w, h, px, 0))
    val got = Codecs.ppmFeatures(jback)
    want.zip(got).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 4.0f, s"jpeg mean drifted: $a vs $b")
    }
    // the Spark decode path dispatches on magic and reads real dims
    val media = Seq((1L, "image", png, "image/png"),
      (2L, "image", jpg, "image/jpeg"))
      .toDF("media_id", "kind", "payload", "mime")
    val d = Multimodal.decode(spark, media).collect().sortBy(_.media_id)
    assert(d.forall(r => r.width === w && r.height === h))
    // resize of a compressed still emits a valid P6 at target dims
    val resized = Multimodal.resize(spark,
      Multimodal.decode(spark, media), 4, 3).collect()
    resized.foreach { r =>
      assert(Codecs.decodePpm(r.payload).exists(p => p.width === 4 && p.height === 3))
    }
  }

  test("almost-PPM and almost-WAV payloads degrade to the stub, never crash") {
    val fakes = Seq(
      "P6 not really an image".getBytes("US-ASCII"),
      "P6\n10 10\n255\nshort".getBytes("US-ASCII"), // truncated pixels
      "RIFFxxxxWAVEbroken".getBytes("US-ASCII"),
      // right magic, garbage body: ImageIO must fail cleanly -> stub
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
        "garbage jpeg body".getBytes("US-ASCII"),
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        "garbage png body".getBytes("US-ASCII"))
    fakes.zipWithIndex.foreach { case (payload, i) =>
      val media = Seq((i.toLong, "image", payload, "x"))
        .toDF("media_id", "kind", "payload", "mime")
      val d = Multimodal.decode(spark, media).collect().head
      val stub = Multimodal.decodeStub(payload)
      assert((d.width, d.height, d.duration_ms) === stub,
        "malformed payload must fall back to the deterministic stub")
    }
  }

  test("MP4 roundtrip: the atom walk reads real duration/tracks/codecs/dims") {
    val bytes = Codecs.encodeMp4(90000, 600,
      Seq(("avc1", 1920, 1080), ("mp4a", 0, 0), ("hvc1", 0, 0)))
    val m = Codecs.parseMp4(bytes).get
    assert(m.majorBrand === "isom")
    assert(m.durationMs === 150000L) // 90000 units / 600 units-per-s
    assert(m.nTracks === 3)
    assert(m.codecs === Seq("avc1", "mp4a", "hvc1"))
    assert((m.width, m.height) === (1920, 1080))
    // the magic dispatch routes MP4 metadata through the real parse
    val media = Seq((1L, "video", bytes, "video/mp4"))
      .toDF("media_id", "kind", "payload", "mime")
    val d = Multimodal.decode(spark, media).collect().head
    assert((d.width, d.height, d.duration_ms) === ((1920, 1080, 150000L)))
  }

  test("MJPEG-AVI roundtrip: container fields and every frame decode") {
    val w = 32; val h = 24
    val values = Seq(8, 72, 136, 216) // 16-wide bucket centers
    val frames = values.map(v =>
      Codecs.encodeJpeg(w, h, Array.fill(3 * w * h)(v.toByte)))
    val avi = Codecs.encodeAviMjpeg(w, h, usPerFrame = 40000L, frames)
    assert(Codecs.isAvi(avi))
    val m = Codecs.parseAviMjpeg(avi).get
    assert((m.width, m.height, m.usPerFrame, m.declaredFrames) ===
      ((w, h, 40000L, values.size.toLong)))
    assert(m.frames.size == values.size)
    // every decoded frame has the encoded dims and its uniform-gray
    // luminance lands within the JPEG-safe ±8 bucket radius (DC-only
    // DCT + constant chroma keep the error ~±3)
    m.frames.zip(values).foreach { case (p, v) =>
      assert((p.width, p.height) === ((w, h)))
      val lum = Codecs.ppmFeatures(p)(3)
      assert(math.abs(lum - v) < 8.0, s"lum=$lum v=$v")
      assert(math.round((lum - 8.0) / 16.0) === (v - 8) / 16)
    }
  }

  test("odd-sized JPEG frames pad to even RIFF chunks and still decode") {
    val w = 17; val h = 9 // odd dims → odd-length JPEGs are likely
    val frames = (0 until 3).map(i =>
      Codecs.encodeJpeg(w, h, Array.fill(3 * w * h)((40 + 16 * i).toByte)))
    val avi = Codecs.encodeAviMjpeg(w, h, 20000L, frames)
    val m = Codecs.parseAviMjpeg(avi).get
    assert(m.frames.size == 3)
    assert(m.frames.forall(p => p.width == w && p.height == h))
  }

  test("hostile/truncated AVI payloads degrade, never crash") {
    val good = Codecs.encodeAviMjpeg(16, 16, 40000L,
      Seq(Codecs.encodeJpeg(16, 16, Array.fill(3 * 16 * 16)(100.toByte))))
    val fakes = Seq(
      "RIFF1234AVI ".getBytes("US-ASCII"), // magic only
      good.take(30), // truncated mid-hdrl
      good.take(good.length - 50), // truncated mid-frame
      {
        val b = good.clone() // lie about the first LIST size
        b(16) = 0xff.toByte; b(17) = 0xff.toByte
        b(18) = 0xff.toByte; b(19) = 0xff.toByte
        b
      })
    fakes.foreach { payload =>
      val r = Codecs.parseAviMjpeg(payload) // must not throw
      assert(r.isEmpty || r.get.width >= 0)
    }
  }

  test("hostile/truncated MP4 payloads degrade, never crash") {
    val good = Codecs.encodeMp4(1000, 1000, Seq(("avc1", 64, 64)))
    val fakes = Seq(
      "1234ftypgarbage".getBytes("US-ASCII"), // magic, no moov
      good.take(20), // truncated mid-ftyp
      good.take(good.length - 30), // truncated mid-moov
      {
        val b = good.clone() // lie about a box size: 0xffffffff
        b(0) = 0xff.toByte; b(1) = 0xff.toByte
        b(2) = 0xff.toByte; b(3) = 0xff.toByte
        b
      })
    fakes.zipWithIndex.foreach { case (payload, i) =>
      val media = Seq((i.toLong, "video", payload, "video/mp4"))
        .toDF("media_id", "kind", "payload", "mime")
      // must not throw; parse failure falls back to the stub
      Multimodal.decode(spark, media).collect()
      assert(Codecs.parseMp4(payload).isEmpty ||
        Codecs.parseMp4(payload).get.durationMs >= 0)
    }
  }
}

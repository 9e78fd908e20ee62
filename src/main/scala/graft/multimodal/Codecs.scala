package graft.multimodal

/** REAL pure-JVM codecs for the self-describing header+raw media
  * formats — no native libraries needed, so these are not stubs:
  *
  *  - PPM (P6): `P6\n<w> <h>\n255\n` + 3·w·h RGB bytes — the classic
  *    uncompressed interchange image format;
  *  - WAV (RIFF, PCM 16-bit): 44-byte-style RIFF chunks (`fmt `+`data`);
  *  - "PPM stream" video: concatenated P6 frames (the same shape as
  *    raw y4m: header-delimited uncompressed frames back to back).
  *
  * [[Multimodal]] dispatches on magic bytes: payloads in these formats
  * decode/resize/feature-extract for real; compressed formats (JPEG,
  * MP4, ...) still fall to the declared stub — the container ships no
  * native codecs. Parsers are total: any malformed input returns None
  * and the caller falls back, so a text payload that happens to start
  * with "P6" can never crash an executor.
  */
object Codecs {

  /** A decoded P6 frame; `consumed` = bytes read from the offset, so
    * concatenated frames (PPM-stream video) parse by advancing it.
    */
  final case class Ppm(width: Int, height: Int, pixels: Array[Byte],
      consumed: Int)

  final case class Wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      samples: Array[Short])

  def isPpm(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'P' && b(1) == '6' && isWs(b(2))

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a &&
      b(7) == 0x0a

  /** REAL JPEG/PNG decode via `javax.imageio.ImageIO` — still-image
    * codecs ship in the standard JDK, no native libraries needed.
    * Output is the same [[Ppm]] RGB frame every downstream transform
    * (features, resize) already consumes. Total: any malformed or
    * truncated payload — including bytes that merely start with the
    * right magic — returns None and the caller falls back to the stub,
    * so a hostile payload can never crash an executor.
    */
  def decodeImage(b: Array[Byte]): Option[Ppm] =
    if (!isJpeg(b) && !isPng(b)) None
    else try {
      // a MEMORY-cached image stream, explicitly: ImageIO's default
      // wrapping is disk-cache-backed (a temp file minted and deleted
      // per read — a per-row filesystem round-trip at corpus scale,
      // plus java.io.tmpdir contention on shared executors). Scoped
      // per call rather than ImageIO.setUseCache(false), which would
      // mutate a JVM-global for every other ImageIO user in-process.
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b)))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0 || 3L * w * h > Int.MaxValue) None
        else {
          val px = new Array[Byte](3 * w * h)
          var y = 0
          var i = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              px(i) = ((rgb >> 16) & 0xff).toByte
              px(i + 1) = ((rgb >> 8) & 0xff).toByte
              px(i + 2) = (rgb & 0xff).toByte
              i += 3
              x += 1
            }
            y += 1
          }
          Some(Ppm(w, h, px, b.length))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Any supported still image → RGB frame: raw P6 or compressed
    * JPEG/PNG. The single dispatch point for image-shaped payloads.
    */
  def parseImage(b: Array[Byte]): Option[Ppm] =
    if (isPpm(b)) decodePpm(b) else decodeImage(b)

  /** Encode an RGB frame as PNG (lossless) or JPEG via ImageIO —
    * fixture/corpus synthesis for the compressed-codec path.
    */
  def encodeImage(format: String, w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"need ${3 * w * h} bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        i += 3
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    encodeImage("png", w, h, rgb)

  def encodeJpeg(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    encodeImage("jpg", w, h, rgb)

  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t'

  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"need ${3 * w * h} bytes, got ${rgb.length}")
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
  }

  /** Parse one P6 frame at `offset`. Grammar: "P6", then three
    * ASCII-decimal tokens (width, height, maxval=255) separated by
    * whitespace/comments, then exactly ONE whitespace byte, then the
    * raw pixel block. None on any deviation or truncation.
    */
  def decodePpm(b: Array[Byte], offset: Int = 0): Option[Ppm] = {
    var i = offset
    if (b.length - i < 3 || b(i) != 'P' || b(i + 1) != '6' || !isWs(b(i + 2)))
      return None
    i += 2
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && i < b.length) {
        if (isWs(b(i))) i += 1
        else if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else go = false
      }
    }
    def token(): Long = { // -1 on malformed
      skipWsAndComments()
      var v = 0L
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
      }
      if (any && v <= Int.MaxValue) v else -1L
    }
    val w = token(); val h = token(); val maxv = token()
    if (w <= 0 || h <= 0 || maxv != 255) return None
    if (i >= b.length || !isWs(b(i))) return None
    i += 1 // the single post-header whitespace byte
    val need = 3L * w * h
    if (need > Int.MaxValue || b.length - i < need) return None
    val px = java.util.Arrays.copyOfRange(b, i, i + need.toInt)
    Some(Ppm(w.toInt, h.toInt, px, i + need.toInt - offset))
  }

  /** All frames of a PPM-stream payload (a single image is a 1-frame
    * stream). Stops at the first byte that is not a valid frame.
    */
  def decodePpmStream(b: Array[Byte]): Seq[Ppm] = {
    val frames = Seq.newBuilder[Ppm]
    var off = 0
    var ok = true
    while (ok && off < b.length) {
      decodePpm(b, off) match {
        case Some(f) => frames += f; off += f.consumed
        case None => ok = false
      }
    }
    frames.result()
  }

  /** REAL nearest-neighbor resample to (tw, th) — a valid P6 out. */
  def resizePpm(p: Ppm, tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](3 * tw * th)
    var y = 0
    while (y < th) {
      val sy = y * p.height / th
      var x = 0
      while (x < tw) {
        val sx = x * p.width / tw
        val s = 3 * (sy * p.width + sx)
        val d = 3 * (y * tw + x)
        out(d) = p.pixels(s); out(d + 1) = p.pixels(s + 1); out(d + 2) = p.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    encodePpm(tw, th, out)
  }

  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** RIFF chunk walk: find `fmt ` (must be PCM 16-bit) and `data`.
    * Tolerates extra chunks (LIST, fact, ...) like real WAV files have.
    */
  def decodeWav(b: Array[Byte]): Option[Wav] = {
    if (!isWav(b)) return None
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (pos + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      if (len < 0 || pos + 8 + len > b.length) return None
      id match {
        case "fmt " if len >= 16 =>
          val audioFormat = bb.getShort(pos + 8).toInt
          val channels = bb.getShort(pos + 10).toInt
          val rate = bb.getInt(pos + 12)
          val bits = bb.getShort(pos + 22).toInt
          if (audioFormat != 1 || bits != 16 || channels < 1 || rate <= 0)
            return None // only uncompressed PCM 16-bit here
          fmt = Some((channels, rate, bits))
        case "data" => data = Some((pos + 8, len))
        case _ => // skip unknown chunk
      }
      pos += 8 + len + (len & 1) // RIFF chunks are 2-byte aligned
    }
    for ((ch, rate, bits) <- fmt; (off, len) <- data) yield {
      val n = len / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) { samples(i) = bb.getShort(off + 2 * i); i += 1 }
      Wav(ch, rate, bits, samples)
    }
  }

  /** Audio features over PCM samples, all in [-1, 1] domains:
    * [rms, zero-crossing rate, peak, duration-seconds].
    */
  def wavFeatures(w: Wav): Array[Float] = {
    val n = w.samples.length
    if (n == 0) return Array(0f, 0f, 0f, 0f)
    var sumSq = 0.0; var peak = 0.0; var zc = 0
    var i = 0
    while (i < n) {
      val s = w.samples(i) / 32768.0
      sumSq += s * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && (w.samples(i) >= 0) != (w.samples(i - 1) >= 0)) zc += 1
      i += 1
    }
    val frames = n / w.channels
    Array(math.sqrt(sumSq / n).toFloat, zc.toFloat / n, peak.toFloat,
      frames.toFloat / w.sampleRate)
  }

  /** Image features: [mean R, mean G, mean B, mean luminance], 0-255. */
  def ppmFeatures(p: Ppm): Array[Float] = {
    val n = p.width.toLong * p.height
    if (n == 0) return Array(0f, 0f, 0f, 0f)
    var r = 0.0; var g = 0.0; var bl = 0.0
    var i = 0
    while (i < p.pixels.length) {
      r += (p.pixels(i) & 0xff); g += (p.pixels(i + 1) & 0xff)
      bl += (p.pixels(i + 2) & 0xff)
      i += 3
    }
    val (mr, mg, mb) = ((r / n).toFloat, (g / n).toFloat, (bl / n).toFloat)
    Array(mr, mg, mb, 0.299f * mr + 0.587f * mg + 0.114f * mb)
  }
}

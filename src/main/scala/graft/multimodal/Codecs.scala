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
    // a MEMORY-cached image output stream, explicitly (the decodeImage
    // note, write side): ImageIO.write(_, _, OutputStream) wraps the
    // target in a DISK-cache-backed stream by default — a temp file
    // minted and deleted per encoded image, which measured 4× on the
    // per-row PNG synthesis pass (mm4: 0.5s → 2.5s when the JVM-global
    // setUseCache(false) was removed; this pins the choice per call)
    val baos = new java.io.ByteArrayOutputStream()
    val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName(format).next()
      try {
        writer.setOutput(mos)
        writer.write(img)
      } finally writer.dispose()
    } finally mos.close()
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
  /** Parsed MP4/ISO-BMFF container metadata (ISO/IEC 14496-12): the
    * movie-level duration, the per-track sample-entry fourccs, and the
    * presentation dims from the first video track's `tkhd`. Container
    * METADATA only — frame decode needs native codecs the JVM doesn't
    * ship, and stays an explicit non-goal (the honest boundary:
    * the atom walk is real, the pixels are not read).
    */
  final case class Mp4Meta(majorBrand: String, durationMs: Long,
      nTracks: Int, codecs: Seq[String], width: Int, height: Int)

  /** ISO-BMFF magic: a top-level `ftyp` box at offset 4. */
  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the box children of `[from, to)`, yielding (type, payloadFrom,
    * payloadTo). Total: malformed sizes end the walk rather than throw
    * (size==0 means to-end-of-parent; size==1 means 64-bit largesize).
    */
  private def boxes(b: Array[Byte], lo: Int, hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var o = lo
      def hasNext: Boolean = o + 8 <= hi
      def next(): (String, Int, Int) = {
        val sz = be32(b, o)
        val typ = fourcc(b, o + 4)
        val (payloadFrom, end) =
          if (sz == 0) (o + 8, hi)
          else if (sz == 1 && o + 16 <= hi) {
            val lsz = be64(b, o + 8)
            if (lsz < 16 || o + lsz > hi) (o + 16, hi) else (o + 16, o + lsz.toInt)
          }
          else if (sz < 8 || o + sz > hi) (o + 8, hi) // malformed: consume rest
          else (o + 8, o + sz.toInt)
        o = end
        (typ, payloadFrom, end)
      }
    }

  private def findBox(b: Array[Byte], lo: Int, hi: Int,
      typ: String): Option[(Int, Int)] =
    boxes(b, lo, hi).collectFirst { case (t, f, e) if t == typ => (f, e) }

  /** REAL MP4 metadata parse — the `ftyp`/`moov` atom walk: movie
    * timescale+duration from `mvhd` (v0 and v1), track count and
    * per-track codec fourccs from each `trak`'s
    * `mdia/minf/stbl/stsd` first sample entry, presentation dims from
    * the first `tkhd` with nonzero 16.16 width/height. Total: any
    * malformed, truncated, or hostile payload returns None.
    */
  def parseMp4(b: Array[Byte]): Option[Mp4Meta] =
    if (!isMp4(b)) None
    else try {
      val brand = fourcc(b, 8)
      findBox(b, 0, b.length, "moov").flatMap { case (mf, mt) =>
        val durMs = findBox(b, mf, mt, "mvhd").flatMap { case (f, t) =>
          if (f + 4 > t) None
          else (b(f) & 0xff) match {
            case 0 if f + 20 <= t =>
              val ts = be32(b, f + 12)
              if (ts == 0) None else Some(be32(b, f + 16) * 1000L / ts)
            case 1 if f + 32 <= t =>
              val ts = be32(b, f + 20)
              if (ts == 0) None else Some(be64(b, f + 24) * 1000L / ts)
            case _ => None
          }
        }
        val traks = boxes(b, mf, mt).filter(_._1 == "trak").toSeq
        val codecs = traks.flatMap { case (_, tf, tt) =>
          for {
            (df, dt) <- findBox(b, tf, tt, "mdia")
            (nf, nt) <- findBox(b, df, dt, "minf")
            (sf, st) <- findBox(b, nf, nt, "stbl")
            (ef, et) <- findBox(b, sf, st, "stsd")
            // version+flags(4) entry_count(4), then the first sample
            // entry box: its fourcc IS the codec id
            fc <- if (ef + 16 <= et && be32(b, ef + 4) >= 1)
              Some(fourcc(b, ef + 12)) else None
          } yield fc
        }
        val dims = traks.iterator.flatMap { case (_, tf, tt) =>
          findBox(b, tf, tt, "tkhd").flatMap { case (f, t) =>
            // v0 payload: ...84 bytes, width/height are the LAST 8
            // (16.16 fixed point); v1 adds 12 bytes of 64-bit times
            val end = t
            if (end - 8 < f) None
            else {
              val w = (be32(b, end - 8) >> 16).toInt
              val h = (be32(b, end - 4) >> 16).toInt
              if (w > 0 && h > 0) Some((w, h)) else None
            }
          }
        }.nextOption().getOrElse((0, 0))
        durMs.map(d =>
          Mp4Meta(brand, d, traks.size, codecs, dims._1, dims._2))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def beBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    beBytes(body.length + 8L, 4) ++
      typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
  }

  /** Synthesize a minimal structurally-valid MP4: `ftyp` + `moov`
    * (v0 `mvhd`, one `trak`/`tkhd`/`mdia`/`mdhd`/`hdlr`/`minf`/`stbl`/
    * `stsd` chain per track) + an empty `mdat`. Every box size is
    * consistent, so [[parseMp4]]'s walk is a REAL parse, not a happy
    * path — the mm5 oracle rides this roundtrip. Sample entries are
    * header-only (fourcc + reserved/data-ref fields): enough for a
    * container-metadata reader, deliberately not a playable stream.
    */
  def encodeMp4(durationUnits: Long, timescale: Int,
      tracks: Seq[(String, Int, Int)]): Array[Byte] = {
    val z = new Array[Byte](0)
    def u32(v: Long) = beBytes(v, 4)
    def u16(v: Int) = beBytes(v.toLong, 2)
    val matrix = u32(0x00010000L) ++ u32(0) ++ u32(0) ++
      u32(0) ++ u32(0x00010000L) ++ u32(0) ++
      u32(0) ++ u32(0) ++ u32(0x40000000L)
    val mvhd = box("mvhd",
      u32(0), // version 0 + flags
      u32(0), u32(0), // creation, modification
      u32(timescale.toLong), u32(durationUnits),
      u32(0x00010000L), u16(0x0100), u16(0), u32(0), u32(0), // rate, volume, reserved
      matrix, new Array[Byte](24), u32(tracks.size + 1L))
    val traks = tracks.zipWithIndex.map { case ((fc, w, h), i) =>
      val video = w > 0 && h > 0
      val tkhd = box("tkhd",
        u32(7), // version 0, flags: enabled|in-movie|in-preview
        u32(0), u32(0), u32(i + 1L), u32(0), u32(durationUnits),
        new Array[Byte](8), u16(0), u16(0),
        u16(if (video) 0 else 0x0100), u16(0), matrix,
        u32(w.toLong << 16), u32(h.toLong << 16))
      val mdhd = box("mdhd", u32(0), u32(0), u32(0),
        u32(timescale.toLong), u32(durationUnits), u16(0x55c4), u16(0))
      val hdlr = box("hdlr", u32(0), u32(0),
        (if (video) "vide" else "soun")
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII),
        new Array[Byte](12), Array[Byte](0))
      val sampleEntry = box(fc, new Array[Byte](6), u16(1))
      val stsd = box("stsd", u32(0), u32(1), sampleEntry)
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      box("trak", tkhd, mdia, z)
    }
    val ftyp = box("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      u32(0x200),
      "isommp42".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val moov = box("moov", (mvhd +: traks): _*)
    ftyp ++ moov ++ box("mdat", z)
  }

  // ---- MJPEG-in-AVI: real video FRAME decode, pure JDK ----------------
  // AVI is little-endian RIFF (ISO-BMFF above is big-endian); MJPEG
  // stores each frame as an ordinary JFIF JPEG in a '##dc' chunk, so
  // frame decode is the REAL ImageIO JPEG path — the one video format
  // a JVM can fully decode with no native codecs.

  /** Parsed MJPEG-AVI: container header fields + the DECODED frames. */
  final case class AviMeta(width: Int, height: Int, usPerFrame: Long,
      declaredFrames: Long, frames: Seq[Ppm])

  /** RIFF/AVI magic: "RIFF" at 0, form type "AVI " at 8. */
  def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI "

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def leBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  /** One RIFF chunk: fourcc + le32 size + data, padded to even. */
  private def riffChunk(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val pad = if (body.length % 2 == 1) Array[Byte](0) else new Array[Byte](0)
    typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      leBytes(body.length.toLong, 4) ++ body ++ pad
  }

  private def riffList(listType: String, children: Array[Byte]*): Array[Byte] =
    riffChunk("LIST",
      listType.getBytes(java.nio.charset.StandardCharsets.US_ASCII) +:
        children: _*)

  /** Synthesize a structurally-valid single-stream MJPEG AVI: RIFF →
    * `hdrl` (avih main header + one `strl` with a 'vids'/'MJPG' strh
    * and a BITMAPINFOHEADER strf) → `movi` with one `00dc` chunk per
    * JPEG frame. Sizes and even-padding are consistent, so
    * [[parseAviMjpeg]]'s walk is a real parse — the mm6 oracle rides
    * this roundtrip with REAL JPEG bytes in every frame.
    */
  def encodeAviMjpeg(w: Int, h: Int, usPerFrame: Long,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    def u32(v: Long) = leBytes(v, 4)
    def u16(v: Int) = leBytes(v.toLong, 2)
    val n = jpegFrames.size.toLong
    val maxBytes = if (jpegFrames.isEmpty) 0L else jpegFrames.map(_.length).max.toLong
    val avih = riffChunk("avih",
      u32(usPerFrame), u32(maxBytes * 1000000L / math.max(1L, usPerFrame)),
      u32(0), u32(0x10), // padding, flags: HASINDEX off, INTERLEAVED off... 0x10 = TRUSTCKTYPE
      u32(n), u32(0), u32(1), u32(maxBytes),
      u32(w.toLong), u32(h.toLong), new Array[Byte](16))
    val strh = riffChunk("strh",
      "vids".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      "MJPG".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      u32(0), u16(0), u16(0), u32(0),
      u32(usPerFrame), u32(1000000L), // scale/rate: fps = rate/scale
      u32(0), u32(n), u32(maxBytes), u32(0xFFFFFFFFL), u32(0),
      u16(0), u16(0), u16(w), u16(h))
    val strf = riffChunk("strf",
      u32(40), u32(w.toLong), u32(h.toLong), u16(1), u16(24),
      "MJPG".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      u32(w.toLong * h * 3), u32(0), u32(0), u32(0), u32(0))
    val hdrl = riffList("hdrl", avih, riffList("strl", strh, strf))
    val movi = riffList("movi",
      jpegFrames.map(f => riffChunk("00dc", f)): _*)
    val body = "AVI ".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      hdrl ++ movi
    "RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      leBytes(body.length.toLong, 4) ++ body
  }

  /** Walk RIFF children of `[lo, hi)`: yields (fourcc, payloadFrom,
    * payloadTo) honoring even-padding. Malformed sizes end the walk
    * (total parse, never a throw).
    */
  private def riffChunks(b: Array[Byte], lo: Int,
      hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var o = lo
      def hasNext: Boolean = o + 8 <= hi
      def next(): (String, Int, Int) = {
        val typ = fourcc(b, o)
        // le32 is unsigned (0..2^32-1) and hasNext guarantees
        // from <= hi, so the min-clamp alone totalizes malformed sizes
        val sz = le32(b, o + 4)
        val from = o + 8
        val to = math.min(hi.toLong, from + sz).toInt
        o = to + (sz % 2).toInt
        (typ, from, to)
      }
    }

  /** REAL MJPEG-AVI parse + frame decode: the RIFF walk reads `avih`
    * (dims, frame timing, declared count) and then DECODES every
    * `##dc` frame chunk in `movi` through the real ImageIO JPEG path
    * ([[decodeImage]]). Returns None on non-AVI or malformed bytes;
    * non-JPEG/corrupt frame chunks are skipped (total parse).
    */
  def parseAviMjpeg(b: Array[Byte]): Option[AviMeta] =
    try {
      if (!isAvi(b)) return None
      var width = 0; var height = 0
      var usPerFrame = 0L; var declared = 0L
      val frames = scala.collection.mutable.ArrayBuffer.empty[Ppm]
      for ((typ, from, to) <- riffChunks(b, 12, b.length)) typ match {
        case "LIST" if to - from >= 4 =>
          val listType = fourcc(b, from)
          if (listType == "hdrl") {
            for ((t2, f2, t2e) <- riffChunks(b, from + 4, to))
              if (t2 == "avih" && t2e - f2 >= 40) {
                usPerFrame = le32(b, f2)
                declared = le32(b, f2 + 16)
                width = le32(b, f2 + 32).toInt
                height = le32(b, f2 + 36).toInt
              }
          } else if (listType == "movi") {
            for ((t2, f2, t2e) <- riffChunks(b, from + 4, to))
              if (t2.endsWith("dc") && t2e > f2)
                decodeImage(java.util.Arrays.copyOfRange(b, f2, t2e))
                  .foreach(frames += _)
          }
        case _ => ()
      }
      if (width <= 0 || height <= 0) None
      else Some(AviMeta(width, height, usPerFrame, declared, frames.toSeq))
    } catch { case scala.util.control.NonFatal(_) => None }

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

package graft.ops

/** Real media codecs on the JVM — two layers, both dependency-free in the
  * "nothing beyond the JDK" sense:
  *
  *   - Pure byte parsing for the formats simple enough to decode with
  *     nothing but the bytes: PPM (P6) — ASCII header `P6 <w> <h>
  *     <maxval>` then raw RGB — and WAV (RIFF/PCM16 mono).
  *   - `javax.imageio.ImageIO` (JDK java.desktop, headless-capable) for
  *     the entropy-coded raster formats: PNG and JPEG (GIF/BMP/TIFF ride
  *     along for free on the same readers). PNG is lossless, so its
  *     decoded channel sums are integer-exact and formula-recomputable —
  *     the same cross-engine oracle gate as PPM (q96/q112). JPEG is
  *     lossy: dimensions decode exactly and are oracled; pixel sums are
  *     codec-dependent and gated by ScalaTest tolerance instead.
  *
  * Decode output is integer-exact (pixel-channel sums, |sample| sums), so
  * a SQL oracle that recomputes the same sums from the generating formula
  * hash-matches bit-for-bit. Only MP3/H.264 remain out of scope: they
  * genuinely need codec libraries this container does not have; the
  * dispatch point ([[sniffFormat]] + Multimodal.decodeMedia) is where a
  * real deployment plugs them in.
  */
object Codecs {

  // ImageIO must not try to attach a display; executors are headless.
  // Object init runs once per JVM before any decode.
  System.setProperty("java.awt.headless", "true")

  /** Parsed P6 image: dimensions + integer-exact per-channel sums. */
  final case class Ppm(width: Int, height: Int, sumR: Long, sumG: Long, sumB: Long)

  /** Fully decoded raster: packed 0xRRGGBB ints, row-major. The
    * pixel-level twin of [[Ppm]]/[[decodeImageIO]]'s sums — what the
    * perceptual-hash path needs (block means, not totals). */
  final case class Pixels(width: Int, height: Int, rgb: Array[Int])

  /** Parsed PCM16 mono WAV: rate + integer-exact sum of |sample|. */
  final case class Wav(sampleRate: Int, nSamples: Int, sumAbs: Long)

  /** Container format by magic bytes — the real prober's dispatch. */
  def sniffFormat(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') Some("ppm")
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G' && bytes(4) == 0x0d && bytes(5) == 0x0a &&
      bytes(6) == 0x1a && bytes(7) == 0x0a) Some("png")
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) Some("jpeg")
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') Some("wav")
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'A' &&
      bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ') Some("avi")
    else if (bytes.length >= 8 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p') Some("mp4")
    else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'V' &&
      bytes(2) == 'I' && bytes(3) == 'D') Some("gvid")
    else None

  /** Modality by magic bytes (back-compat wrapper over [[sniffFormat]]). */
  def sniff(bytes: Array[Byte]): Option[String] =
    sniffFormat(bytes).map {
      case "wav"                  => "audio"
      case "avi" | "mp4" | "gvid" => "video"
      case _                      => "image"
    }

  // ---------------------------------------------------------------- PPM

  def encodePpm(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var o = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte
        o += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Strict P6 header parse shared by the sum and pixel decoders: header
    * tokens (whitespace-separated, `#` comments allowed per the spec),
    * maxval must be 255, payload must hold exactly width*height*3 bytes.
    * Returns (width, height, payloadOffset), or None on anything
    * malformed — a media table always contains some garbage and the
    * decode stage must skip, not throw. */
  private def ppmHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    var i = 0
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else go = false
      }
    }
    def token(): Option[Int] = {
      skipWs()
      val start = i
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
      if (i == start || i - start > 9) None
      else Some(new String(bytes, start, i - start, "US-ASCII").toInt)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    i = 2
    for {
      w <- token()
      h <- token()
      maxval <- token()
      if maxval == 255 && w > 0 && h > 0
      // exactly ONE whitespace byte separates maxval from the raster
      if i < bytes.length && { i += 1; bytes.length - i == w.toLong * h * 3 }
    } yield (w, h, i)
  }

  def decodePpm(bytes: Array[Byte]): Option[Ppm] =
    ppmHeader(bytes).map { case (w, h, off) =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      var o = off
      while (o < bytes.length) {
        sr += bytes(o) & 0xff; sg += bytes(o + 1) & 0xff; sb += bytes(o + 2) & 0xff
        o += 3
      }
      Ppm(w, h, sr, sg, sb)
    }

  /** P6 to packed pixels (the perceptual-hash input). */
  def decodePpmPixels(bytes: Array[Byte]): Option[Pixels] =
    ppmHeader(bytes).map { case (w, h, off) =>
      val rgb = new Array[Int](w * h)
      var p = 0
      var o = off
      while (p < rgb.length) {
        rgb(p) = ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) & 0xff)
        p += 1; o += 3
      }
      Pixels(w, h, rgb)
    }

  // ---------------------------------------------------------------- WAV

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put(o: Int, s: String): Unit = { val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, out, o, b.length) }
    def p32(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte; out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte }
    def p16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    put(0, "RIFF"); p32(4, 36 + dataLen); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16); p16(20, 1 /* PCM */); p16(22, 1 /* mono */)
    p32(24, sampleRate); p32(28, sampleRate * 2); p16(32, 2); p16(34, 16)
    put(36, "data"); p32(40, dataLen)
    var i = 0
    while (i < samples.length) { p16(44 + i * 2, samples(i).toInt); i += 1 }
    out
  }

  /** Chunk-walking RIFF locate (fmt may come with extensions, data need
    * not be the first chunk; metadata chunks like LIST are skipped —
    * which is exactly why a metadata-injected WAV is byte-distinct but
    * decode-identical): accepts PCM(1) mono 16-bit only. Returns
    * (sampleRate, dataOffset, dataLen) — the shared locate step under
    * [[decodeWav]] and [[audioFrames]]. */
  private def wavPcm(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (sniff(bytes) != Some("audio") || bytes.length < 12) return None
    var rate = -1; var ok = false
    var dataOff = -1; var dataLen = -1
    var o = 12
    while (o + 8 <= bytes.length) {
      val id = new String(bytes, o, 4, "US-ASCII")
      val len = le32(bytes, o + 4)
      // bound in LONG: a crafted len near 2^31 wraps Int addition
      // negative and sails past the check (the gvid/avi parsers already
      // guard in Long; garbage media must skip, not throw)
      if (len < 0 || o.toLong + 8L + len > bytes.length) return None
      if (id == "fmt " && len >= 16) {
        ok = le16(bytes, o + 8) == 1 && le16(bytes, o + 10) == 1 &&
          le16(bytes, o + 22) == 16
        rate = le32(bytes, o + 12)
      } else if (id == "data") { dataOff = o + 8; dataLen = len }
      o += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    if (!ok || rate <= 0 || dataOff < 0 || dataLen % 2 != 0) None
    else Some((rate, dataOff, dataLen))
  }

  def decodeWav(bytes: Array[Byte]): Option[Wav] =
    wavPcm(bytes).map { case (rate, dataOff, dataLen) =>
      val n = dataLen / 2
      var s = 0L
      var i = dataOff
      val end = dataOff + dataLen
      while (i < end) { s += math.abs(le16(bytes, i).toShort.toLong); i += 2 }
      Wav(rate, n, s)
    }

  /** Insert a RIFF sub-chunk (`id4` + payload, word-aligned) immediately
    * after the WAVE form type, fixing the outer RIFF size. The result is
    * byte-distinct from the input but decode-identical (the chunk walk
    * skips unknown chunks) — the audio fixture's analog of q133's
    * lossless re-encode twin: exactly what defeats exact byte dedup while
    * leaving the perceptual hash untouched. Fixture/test path — fails
    * loud on non-WAV input. */
  def insertRiffChunk(wav: Array[Byte], id4: String, payload: Array[Byte]): Array[Byte] = {
    require(id4.length == 4, s"RIFF chunk id must be 4 chars, got '$id4'")
    require(sniff(wav) == Some("audio"), "insertRiffChunk expects a WAV")
    val pad = payload.length & 1
    val extra = 8 + payload.length + pad
    val out = new Array[Byte](wav.length + extra)
    System.arraycopy(wav, 0, out, 0, 12)
    val riffLen = le32(wav, 4) + extra
    out(4) = riffLen.toByte; out(5) = (riffLen >> 8).toByte
    out(6) = (riffLen >> 16).toByte; out(7) = (riffLen >> 24).toByte
    val idb = id4.getBytes("US-ASCII")
    System.arraycopy(idb, 0, out, 12, 4)
    out(16) = payload.length.toByte; out(17) = (payload.length >> 8).toByte
    out(18) = (payload.length >> 16).toByte; out(19) = (payload.length >> 24).toByte
    System.arraycopy(payload, 0, out, 20, payload.length)
    System.arraycopy(wav, 12, out, 12 + extra, wav.length - 12)
    out
  }

  // ------------------------------------------------ perceptual audio hashing

  /** Per-frame |sample| sums and counts over the PCM payload: sample i
    * belongs to frame `i*frames div n` — the same floor partition as
    * [[grayGrid]], covering every sample exactly once with frame sizes
    * within one of each other. None for non-WAV/undecodable bytes or
    * fewer samples than frames (no per-frame evidence — the sub-grid
    * thumbnail rule). */
  def audioFrames(bytes: Array[Byte], frames: Int): Option[(Array[Long], Array[Long])] =
    wavPcm(bytes).flatMap { case (_, dataOff, dataLen) =>
      val n = dataLen / 2
      if (n < frames) None
      else {
        val sums = new Array[Long](frames)
        val cnts = new Array[Long](frames)
        var i = 0
        while (i < n) {
          val f = (i.toLong * frames / n).toInt
          sums(f) += math.abs(le16(bytes, dataOff + i * 2).toShort.toLong)
          cnts(f) += 1
          i += 1
        }
        Some((sums, cnts))
      }
    }

  /** 64-bit perceptual audio hash — the dHash discipline applied to the
    * 1-D energy envelope: 65 frame-mean |amplitude| values, one bit per
    * temporal gradient — bit i set iff mean(frame i+1) > mean(frame i),
    * compared EXACTLY by integer cross-multiplication
    * (sum[i+1]*cnt[i] > sum[i]*cnt[i+1] — no division, so two engines
    * can replay it bit-for-bit and a uniform gain k scales both sides by
    * k, preserving every comparison including ties). Invariant under
    * volume scaling (no clipping) and under byte-level container changes
    * (metadata chunks, chunk reordering) — the duplicate classes exact
    * byte hashing cannot see. None for non-audio or sub-65-sample clips.
    * Exactness bound: cross-products stay below 2^63 for any clip under
    * ~10^9 samples (≈17 h at 16 kHz) — far beyond a training-corpus
    * asset. */
  def ahash64(bytes: Array[Byte]): Option[Long] =
    audioFrames(bytes, 65).map { case (sums, cnts) =>
      var h = 0L
      var i = 0
      while (i < 64) {
        if (sums(i + 1) * cnts(i) > sums(i) * cnts(i + 1)) h |= 1L << i
        i += 1
      }
      h
    }

  // ------------------------------------------------- PNG/JPEG via ImageIO

  /** Encode a formula-pixel image with the JDK's ImageIO writer.
    * `format` is an ImageIO informal name ("png", "jpg"). PNG round-trips
    * RGB losslessly; JPEG does not (encode for dimension/tolerance tests
    * only). Throws if no writer exists for the format — encode is a
    * fixture/test path, not a data path, so failing loud is right. */
  def encodeImageIO(width: Int, height: Int, format: String,
                    pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for $format")
    bos.toByteArray
  }

  /** Decode an entropy-coded raster (PNG/JPEG/GIF/BMP/TIFF) with the JDK's
    * ImageIO readers — headless, no external library — to the same
    * integer-exact channel sums as [[decodePpm]]. Returns None on
    * malformed bytes (media tables always contain garbage; decode skips,
    * never throws). */
  def decodeImageIO(bytes: Array[Byte]): Option[Ppm] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var (sr, sg, sb) = (0L, 0L, 0L)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        Some(Ppm(w, h, sr, sg, sb))
      }
    } catch {
      // ImageIO readers throw IOException/RuntimeException variants on
      // truncated or corrupt streams; all mean "not decodable", not fatal
      case _: java.io.IOException => None
      case _: RuntimeException    => None
    }

  /** Entropy-coded raster to packed pixels via headless ImageIO (the
    * pixel-level twin of [[decodeImageIO]]). */
  def decodeImagePixels(bytes: Array[Byte]): Option[Pixels] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val rgb = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, rgb, 0, w)
        var i = 0
        while (i < rgb.length) { rgb(i) &= 0xffffff; i += 1 } // drop alpha
        Some(Pixels(w, h, rgb))
      }
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException    => None
    }

  /** Any supported IMAGE format to packed pixels — the [[sniffFormat]]
    * dispatch the perceptual-hash path rides (WAV is audio: None). */
  def decodePixels(bytes: Array[Byte]): Option[Pixels] =
    sniffFormat(bytes) match {
      case Some("ppm")                => decodePpmPixels(bytes)
      case Some("png") | Some("jpeg") => decodeImagePixels(bytes)
      case _                          => None
    }

  // ------------------------------------------------- perceptual hashing

  /** Integer block-mean grayscale downsample to a gw x gh grid, row-major.
    * Every arithmetic step is exact-integer so a SQL engine can replay it
    * bit-for-bit from a pixel formula (the q133 oracle does):
    *
    *   - luma  = (299·r + 587·g + 114·b) div 1000 (integer ITU-601),
    *   - pixel (x,y) belongs to cell (x·gw div W, y·gh div H) — the
    *     floor-partition that covers every pixel exactly once and keeps
    *     cell sizes within one row/column of each other,
    *   - cell value = sum(luma) div count.
    *
    * None when the image is smaller than the grid (no block has a pixel
    * guarantee; a sub-grid thumbnail carries no gradient evidence — the
    * LangNbScore no-evidence drop rule). */
  def grayGrid(p: Pixels, gw: Int, gh: Int): Option[Array[Long]] = {
    if (p.width < gw || p.height < gh) return None
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    var y = 0
    while (y < p.height) {
      val cy = y * gh / p.height
      var x = 0
      while (x < p.width) {
        val cx = x * gw / p.width
        val px = p.rgb(y * p.width + x)
        val gray = (299 * ((px >> 16) & 0xff) + 587 * ((px >> 8) & 0xff) +
          114 * (px & 0xff)) / 1000
        val c = cy * gw + cx
        sums(c) += gray
        cnts(c) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Long](gw * gh)
    var i = 0
    while (i < out.length) { out(i) = sums(i) / cnts(i); i += 1 }
    Some(out)
  }

  /** 64-bit perceptual difference hash (dHash, Krawetz '13): 9x8
    * block-mean grayscale grid, one bit per horizontal gradient —
    * bit (y*8 + x) set iff grid(y, x+1) > grid(y, x). Gradient SIGNS are
    * invariant under global brightness shifts and any monotone per-pixel
    * tone change that preserves cell-mean order, and stable under
    * re-encode/resize — which is why Hamming distance over these 64 bits
    * finds re-encoded/rescaled duplicate images that exact byte hashing
    * cannot. None for non-images, undecodable bytes, or sub-9x8 rasters. */
  def dhash64(bytes: Array[Byte]): Option[Long] =
    decodePixels(bytes).flatMap(grayGrid(_, 9, 8)).map { grid =>
      var h = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (grid(y * 9 + x + 1) > grid(y * 9 + x)) h |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      h
    }

  // ------------------------------------------------------------- video

  /** Minimal frame-sequence container ("GVID"): magic + u32 frame count +
    * per-frame (u32 length, still-image payload). Each frame is any codec
    * [[decodePixels]] understands (PPM/PNG/JPEG/...), so a container-level
    * re-mux — the same pixels re-encoded frame-by-frame in a different
    * still codec — is representable, which is exactly the duplicate class
    * video byte-hashing cannot see. The real-codec boundary is unchanged:
    * MP4/H.264 stay honest stubs (external codec libs), the same waiver as
    * ops/Multimodal.scala:19. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(4 + _.length).sum
    val out = new Array[Byte](total)
    out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'
    def be32(o: Int, v: Int): Unit = {
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
    }
    be32(4, frames.length)
    var o = 8
    frames.foreach { f =>
      be32(o, f.length)
      System.arraycopy(f, 0, out, o + 4, f.length)
      o += 4 + f.length
    }
    out
  }

  /** Frame payload slices of a video container — GVID, AVI/MJPEG
    * ([[aviFrames]]), or ISO-BMFF/MP4 ([[mp4Frames]]), dispatched by
    * magic; None for anything else. */
  def videoFrames(bytes: Array[Byte]): Option[Array[Array[Byte]]] =
    gvidFrames(bytes).orElse(aviFrames(bytes)).orElse(mp4Frames(bytes))

  /** Frame payload slices of a GVID container; None on wrong magic, a
    * frame running past the buffer, or trailing bytes (strict: a media
    * table always contains garbage and the decode stage must skip). */
  def gvidFrames(bytes: Array[Byte]): Option[Array[Array[Byte]]] = {
    if (bytes.length < 8 || bytes(0) != 'G' || bytes(1) != 'V' ||
      bytes(2) != 'I' || bytes(3) != 'D') return None
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    val n = be32(4)
    if (n < 1 || n > 100000) return None
    val out = new Array[Array[Byte]](n.toInt)
    var o = 8L
    var i = 0
    while (i < n) {
      if (o + 4 > bytes.length) return None
      val len = be32(o.toInt)
      if (o + 4 + len > bytes.length) return None
      out(i) = java.util.Arrays.copyOfRange(bytes, (o + 4).toInt, (o + 4 + len).toInt)
      o += 4 + len
      i += 1
    }
    if (o != bytes.length) return None
    Some(out)
  }

  // ------------------------------------------------- AVI (RIFF/MJPEG)

  /** Minimal-but-valid AVI/MJPEG writer (RIFF 'AVI ' with an 'hdrl'
    * LIST — avih + one 'vids'/'MJPG' stream — and a 'movi' LIST of
    * '00dc' JPEG chunks). Motion-JPEG is the one real video codec
    * expressible with zero external libs: every frame is a plain JPEG
    * the existing ImageIO path decodes, and the container is the real
    * RIFF layout players accept — the video analog of [[encodeWav]].
    * Inter-frame codecs (H.264/MP4) remain honest stubs (external
    * codec libs), the standing waiver. */
  def encodeAvi(width: Int, height: Int, fps: Int,
                jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def s4(s: String): Unit = bo.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit = {
      bo.write((v & 0xff).toInt); bo.write(((v >> 8) & 0xff).toInt)
      bo.write(((v >> 16) & 0xff).toInt); bo.write(((v >> 24) & 0xff).toInt)
    }
    val moviBody = jpegFrames.map(f => 8L + f.length + (f.length & 1)).sum + 4
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    s4("RIFF"); u32(riffBody); s4("AVI ")
    s4("LIST"); u32(hdrlBody); s4("hdrl")
    s4("avih"); u32(56)
    u32(1000000L / math.max(fps, 1)); u32(0); u32(0); u32(0x10 /*HASINDEX off; none*/)
    u32(jpegFrames.length); u32(0); u32(1); u32(0)
    u32(width); u32(height); u32(0); u32(0); u32(0); u32(0)
    s4("LIST"); u32(4 + (8 + 56) + (8 + 40)); s4("strl")
    s4("strh"); u32(56)
    s4("vids"); s4("MJPG"); u32(0); u32(0) /*prio+lang*/; u32(0)
    u32(1); u32(fps); u32(0); u32(jpegFrames.length)
    u32(0); u32(-1 & 0xffffffffL); u32(0)
    u32(0); u32((height.toLong << 16) | width) /*rcFrame: 4 u16*/
    s4("strf"); u32(40)
    u32(40); u32(width); u32(height); u32(1 | (24 << 16))
    s4("MJPG"); u32(width.toLong * height * 3); u32(0); u32(0); u32(0); u32(0)
    s4("LIST"); u32(moviBody); s4("movi")
    jpegFrames.foreach { f =>
      s4("00dc"); u32(f.length); bo.write(f)
      if ((f.length & 1) == 1) bo.write(0) // RIFF chunks pad to even
    }
    bo.toByteArray
  }

  /** Frame payloads of an AVI container: walks the RIFF chunk tree to
    * the 'movi' LIST and collects '00dc'/'00db' video chunks. None on
    * wrong magic, truncated chunks, or no movi/frames — malformed media
    * must skip, not throw. */
  def aviFrames(bytes: Array[Byte]): Option[Array[Array[Byte]]] = {
    if (bytes.length < 12 || bytes(0) != 'R' || bytes(1) != 'I' ||
      bytes(2) != 'F' || bytes(3) != 'F' || bytes(8) != 'A' ||
      bytes(9) != 'V' || bytes(10) != 'I' || bytes(11) != ' ') return None
    def id4(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    def len(o: Int): Long = le32(bytes, o) & 0xffffffffL
    // find the movi LIST among the RIFF's top-level chunks
    var o = 12L
    var movi = -1L
    var moviEnd = -1L
    while (o + 8 <= bytes.length && movi < 0) {
      val cid = id4(o.toInt)
      val clen = len(o.toInt + 4)
      if (o + 8 + clen > bytes.length) return None
      if (cid == "LIST" && clen >= 4 && id4(o.toInt + 8) == "movi") {
        movi = o + 12
        moviEnd = o + 8 + clen
      }
      o += 8 + clen + (clen & 1)
    }
    if (movi < 0) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = movi
    while (p + 8 <= moviEnd) {
      val cid = id4(p.toInt)
      val clen = len(p.toInt + 4)
      if (p + 8 + clen > moviEnd) return None
      if (cid == "00dc" || cid == "00db")
        out += java.util.Arrays.copyOfRange(bytes, (p + 8).toInt, (p + 8 + clen).toInt)
      p += 8 + clen + (clen & 1)
    }
    if (out.isEmpty) None else Some(out.toArray)
  }

  // ------------------------------------------------ ISO-BMFF (MP4)

  /** Minimal-but-valid ISO-BMFF (MP4) writer: `ftyp` + `mdat` (sample
    * payloads concatenated in one chunk) + trailing `moov` carrying the
    * full sample-table chain — `stsd` visual sample entry ('jpeg', the
    * Motion-JPEG-in-MP4 registration), `stts`/`stsc`/`stsz`/`stco`.
    * moov-after-mdat is the standard non-faststart layout real muxers
    * emit (chunk offsets are knowable when the header is written last).
    * Sample payloads are opaque to the container — any codec
    * [[decodePixels]] understands rides inside, the same contract as
    * GVID/AVI — so a container-level re-mux of the SAME payload bytes
    * across all three containers is byte-different yet perceptually
    * identical, the duplicate class exact hashing cannot see. H.264
    * BITSTREAMS remain the honest stub (external codec libs,
    * ops/Multimodal.scala:19); this retires the container half of that
    * waiver: ISO-BMFF is the box format essentially all real crawl
    * video arrives in, and the ftyp/moov/trak/mdia/minf/stbl walk with
    * stsz/stsc/stco sample mapping is exactly what a 100 TB media scan
    * must do before any codec work. */
  def encodeMp4(width: Int, height: Int, fps: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    def cat(parts: Array[Byte]*): Array[Byte] = {
      val out = new Array[Byte](parts.map(_.length).sum)
      var o = 0
      parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
      out
    }
    def u32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def u16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
    def s4(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def box(tp: String, parts: Array[Byte]*): Array[Byte] = {
      val body = cat(parts: _*)
      cat(u32(8L + body.length), s4(tp), body)
    }
    val n = frames.length
    val ts = math.max(fps, 1)
    val identityMatrix = cat(u32(0x10000L), u32(0), u32(0),
      u32(0), u32(0x10000L), u32(0), u32(0), u32(0), u32(0x40000000L))
    val ftyp = box("ftyp", s4("isom"), u32(0x200L), s4("isom"), s4("mp41"))
    val mdat = box("mdat", frames: _*)
    val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(ts), u32(n),
      u32(0x10000L), u16(0x100), u16(0), u32(0), u32(0), identityMatrix,
      new Array[Byte](24), u32(2))
    val tkhd = box("tkhd", u32(3) /*v0, enabled|in-movie*/, u32(0), u32(0),
      u32(1) /*track_ID*/, u32(0), u32(n), u32(0), u32(0),
      u16(0), u16(0), u16(0), u16(0), identityMatrix,
      u32(width.toLong << 16), u32(height.toLong << 16))
    val mdhd = box("mdhd", u32(0), u32(0), u32(0), u32(ts), u32(n),
      u16(0x55c4) /*'und'*/, u16(0))
    val hdlr = box("hdlr", u32(0), u32(0), s4("vide"), u32(0), u32(0),
      u32(0), cat(s4("VideoHandler"), Array(0.toByte)))
    val dinf = box("dinf", box("dref", u32(0), u32(1),
      box("url ", u32(1) /*self-contained*/)))
    val vmhd = box("vmhd", u32(1), u16(0), u16(0), u16(0), u16(0))
    val sampleEntry = box("jpeg",
      new Array[Byte](6), u16(1) /*data_reference_index*/,
      u16(0), u16(0), u32(0), u32(0), u32(0),
      u16(width), u16(height),
      u32(0x480000L), u32(0x480000L) /*72 dpi 16.16*/, u32(0),
      u16(1) /*frame_count per sample*/,
      new Array[Byte](32) /*compressorname*/, u16(24), u16(0xffff))
    val stsd = box("stsd", u32(0), u32(1), sampleEntry)
    val stts = box("stts", u32(0), u32(1), u32(n), u32(1))
    val stsc = box("stsc", u32(0), u32(1), u32(1), u32(n), u32(1))
    val stsz = box("stsz", u32(0), u32(0) /*per-sample sizes*/, u32(n),
      cat(frames.map(f => u32(f.length)): _*))
    val stco = box("stco", u32(0), u32(1), u32(ftyp.length + 8L))
    val moov = box("moov", mvhd, box("trak", tkhd, box("mdia", mdhd, hdlr,
      box("minf", vmhd, dinf, box("stbl", stsd, stts, stsc, stsz, stco)))))
    cat(ftyp, mdat, moov)
  }

  /** Sample payload slices of an ISO-BMFF (MP4) container: box-walks
    * ftyp/moov → first 'vide'-handler trak → mdia/minf/stbl, then maps
    * samples to file ranges through the real sample tables — stsz
    * (sizes), stsc (samples-per-chunk runs), stco/co64 (chunk offsets)
    * — exactly the demuxer path, no codec work. None on wrong magic,
    * boxes that do not tile their parent exactly, truncated tables, a
    * sample range outside the file, inconsistent stsc/stco/stsz
    * accounting, or absurd counts (malformed media must skip, not
    * throw, and garbage must not drive huge allocations). */
  def mp4Frames(bytes: Array[Byte]): Option[Array[Array[Byte]]] = {
    if (bytes.length < 16) return None
    def u32(o: Long): Long =
      ((bytes(o.toInt) & 0xffL) << 24) | ((bytes(o.toInt + 1) & 0xffL) << 16) |
        ((bytes(o.toInt + 2) & 0xffL) << 8) | (bytes(o.toInt + 3) & 0xffL)
    def id4(o: Long): String = new String(bytes, o.toInt, 4, "US-ASCII")
    if (id4(4) != "ftyp") return None
    // children of [start, end): (type, bodyStart, bodyEnd) — strict: the
    // boxes must tile the span exactly (size 0 = to-end, size 1 = 64-bit
    // largesize; > Int.MaxValue rejected, the payload is in memory)
    def children(start: Long, end: Long): Option[Vector[(String, Long, Long)]] = {
      val out = Vector.newBuilder[(String, Long, Long)]
      var o = start
      while (o < end) {
        if (o + 8 > end) return None
        var sz = u32(o)
        var hdr = 8L
        if (sz == 1) {
          if (o + 16 > end) return None
          if (u32(o + 8) != 0) return None // > 4 GiB: not an in-memory payload
          sz = u32(o + 12); hdr = 16
        } else if (sz == 0) sz = end - o
        if (sz < hdr || o + sz > end) return None
        out += ((id4(o + 4), o + hdr, o + sz))
        o += sz
      }
      Some(out.result())
    }
    def find(cs: Vector[(String, Long, Long)], tp: String): Option[(Long, Long)] =
      cs.find(_._1 == tp).map(c => (c._2, c._3))
    val top = children(0, bytes.length).getOrElse(return None)
    val (moovS, moovE) = find(top, "moov").getOrElse(return None)
    val moovKids = children(moovS, moovE).getOrElse(return None)
    // first trak whose hdlr handler_type is 'vide' (audio/hint traks in
    // a real mux must not shadow the video sample tables)
    var stbl: Option[(Long, Long)] = None
    for (t <- moovKids if t._1 == "trak" && stbl.isEmpty) {
      for {
        tk <- children(t._2, t._3)
        (mdS, mdE) <- find(tk, "mdia")
        mk <- children(mdS, mdE)
        (hdS, hdE) <- find(mk, "hdlr")
        if hdE - hdS >= 12 && id4(hdS + 8) == "vide"
        (mnS, mnE) <- find(mk, "minf")
        nk <- children(mnS, mnE)
        sb <- find(nk, "stbl")
      } stbl = Some(sb)
    }
    val (sbS, sbE) = stbl.getOrElse(return None)
    val sk = children(sbS, sbE).getOrElse(return None)
    val maxN = 1000000L
    // stsz: uniform sample_size or per-sample table
    val (szS, szE) = find(sk, "stsz").getOrElse(return None)
    if (szE - szS < 12) return None
    val uniform = u32(szS + 4)
    val nSamples = u32(szS + 8)
    if (nSamples < 1 || nSamples > maxN) return None
    val sizes = new Array[Long](nSamples.toInt)
    if (uniform != 0) java.util.Arrays.fill(sizes, uniform)
    else {
      if (szE - szS != 12 + 4 * nSamples) return None
      var i = 0
      while (i < nSamples) { sizes(i) = u32(szS + 12 + 4L * i); i += 1 }
    }
    // stco (32-bit) or co64 (64-bit) chunk offsets, file-absolute
    val chunkOffs: Array[Long] = find(sk, "stco") match {
      case Some((cS, cE)) =>
        if (cE - cS < 8) return None
        val nc = u32(cS + 4)
        if (nc < 1 || nc > maxN || cE - cS != 8 + 4 * nc) return None
        Array.tabulate(nc.toInt)(i => u32(cS + 8 + 4L * i))
      case None =>
        val (cS, cE) = find(sk, "co64").getOrElse(return None)
        if (cE - cS < 8) return None
        val nc = u32(cS + 4)
        if (nc < 1 || nc > maxN || cE - cS != 8 + 8 * nc) return None
        Array.tabulate(nc.toInt) { i =>
          if (u32(cS + 8 + 8L * i) != 0) return None // > 4 GiB offset
          u32(cS + 12 + 8L * i)
        }
    }
    // stsc: (first_chunk, samples_per_chunk) runs; first_chunk strictly
    // increasing from 1
    val (scS, scE) = find(sk, "stsc").getOrElse(return None)
    if (scE - scS < 8) return None
    val nRuns = u32(scS + 4)
    if (nRuns < 1 || nRuns > maxN || scE - scS != 8 + 12 * nRuns) return None
    val runFirst = new Array[Long](nRuns.toInt)
    val runSpc = new Array[Long](nRuns.toInt)
    var ri = 0
    while (ri < nRuns) {
      runFirst(ri) = u32(scS + 8 + 12L * ri)
      runSpc(ri) = u32(scS + 8 + 12L * ri + 4)
      if (runFirst(ri) < 1 || runSpc(ri) < 1) return None
      if (ri > 0 && runFirst(ri) <= runFirst(ri - 1)) return None
      if (ri == 0 && runFirst(0) != 1) return None
      ri += 1
    }
    // walk chunks, slicing samples; accounting must come out exact
    val out = new Array[Array[Byte]](nSamples.toInt)
    var sample = 0
    var chunk = 0
    var run = 0
    while (sample < nSamples && chunk < chunkOffs.length) {
      while (run + 1 < nRuns && runFirst(run + 1) <= chunk + 1) run += 1
      var off = chunkOffs(chunk)
      var k = 0L
      while (k < runSpc(run)) {
        if (sample >= nSamples) return None // stsc promises more than stsz has
        val len = sizes(sample)
        if (off < 0 || len < 0 || off + len > bytes.length) return None
        out(sample) = java.util.Arrays.copyOfRange(
          bytes, off.toInt, (off + len).toInt)
        off += len
        sample += 1
        k += 1
      }
      chunk += 1
    }
    if (sample != nSamples) return None // stco ran out before stsz did
    Some(out)
  }

  /** Per-frame dHash sequence of a video, in frame order; None if the
    * container is malformed or ANY frame fails to decode/hash (a video
    * with undecodable frames carries no trustworthy temporal evidence —
    * the no-evidence drop rule, not a silent partial hash). */
  def videoFrameHashes(bytes: Array[Byte]): Option[Array[Long]] =
    videoFrames(bytes).flatMap { fs =>
      val out = new Array[Long](fs.length)
      var i = 0
      while (i < fs.length) {
        dhash64(fs(i)) match {
          case Some(h) => out(i) = h
          case None    => return None
        }
        i += 1
      }
      Some(out)
    }

  /** Bounded non-negative fingerprint of one frame's 64-bit dHash: fold
    * the four 16-bit bands (low band first — the banded-bucket split the
    * Hamming machinery already uses) through (acc*1315423911 + b) mod
    * 1000000007, seeding with band 0. All intermediates < 1.4e18, exact
    * in any engine's 64-bit integers — the q133 replayability discipline
    * (a raw dHash can set bit 63 and go negative, which SQL engines trap
    * or sign-extend differently; this fold never leaves [0, 1e9+7)). */
  def frameFingerprint(h: Long): Long = {
    var acc = h & 0xffffL
    var b = 1
    while (b < 4) {
      acc = (acc * 1315423911L + ((h >>> (16 * b)) & 0xffffL)) % 1000000007L
      b += 1
    }
    acc
  }

  /** Distinct temporal shingle fingerprints of a video: consecutive
    * `n`-gram windows over the per-frame fingerprints, folded with
    * (acc*31 + fp) mod 1000000007, sorted ascending. Videos with fewer
    * than `n` frames yield an empty array (no temporal evidence);
    * non-videos/malformed containers yield None. Order-SENSITIVE by
    * construction: a re-ordered cut shares frames but not shingles. */
  def videoShingles(bytes: Array[Byte], n: Int): Option[Array[Long]] =
    videoFrameHashes(bytes).map { hs =>
      if (hs.length < n) Array.empty[Long]
      else {
        val fps = hs.map(frameFingerprint)
        val seen = new java.util.TreeSet[java.lang.Long]()
        var i = 0
        while (i <= fps.length - n) {
          var acc = fps(i)
          var j = 1
          while (j < n) {
            acc = (acc * 31L + fps(i + j)) % 1000000007L
            j += 1
          }
          seen.add(acc)
          i += 1
        }
        val out = new Array[Long](seen.size)
        val it = seen.iterator()
        var k = 0
        while (it.hasNext) { out(k) = it.next(); k += 1 }
        out
      }
    }
}

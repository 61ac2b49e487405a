package graft

import graft.ops.Codecs

class CodecsSpec extends SparkTestBase {
  import spark.implicits._

  test("PPM round trip: hand-computed 2x2 image") {
    // pixels: (0,0)=(1,2,3) (1,0)=(4,5,6) (0,1)=(7,8,9) (1,1)=(250,0,255)
    val px = Map((0, 0) -> (1, 2, 3), (1, 0) -> (4, 5, 6),
      (0, 1) -> (7, 8, 9), (1, 1) -> (250, 0, 255))
    val bytes = Codecs.encodePpm(2, 2, (x, y) => px((x, y)))
    val p = Codecs.decodePpm(bytes).get
    assert(p == Codecs.Ppm(2, 2, 1 + 4 + 7 + 250, 2 + 5 + 8 + 0, 3 + 6 + 9 + 255))
    assert(Codecs.sniff(bytes) == Some("image"))
  }

  test("PPM parser: comments allowed, malformed inputs rejected not thrown") {
    // header comment per the netpbm spec
    val commented = ("P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60))
    assert(Codecs.decodePpm(commented) == Some(Codecs.Ppm(2, 1, 50, 70, 90)))
    val good = Codecs.encodePpm(3, 2, (_, _) => (1, 1, 1))
    assert(Codecs.decodePpm(good.dropRight(1)).isEmpty, "truncated raster")
    assert(Codecs.decodePpm(good ++ Array[Byte](0)).isEmpty, "trailing bytes")
    assert(Codecs.decodePpm("P6\n2 2\n65535\n".getBytes ++ new Array[Byte](24)).isEmpty,
      "16-bit maxval unsupported")
    assert(Codecs.decodePpm("P5\n1 1\n255\n0".getBytes).isEmpty, "P5 is not P6")
    assert(Codecs.decodePpm(Array[Byte]()).isEmpty)
  }

  test("WAV round trip: signed samples, |sum| exact") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 1000, -999)
    val bytes = Codecs.encodeWav(44100, samples)
    val w = Codecs.decodeWav(bytes).get
    assert(w == Codecs.Wav(44100, 7, 0L + 1 + 1 + 32767 + 32768 + 1000 + 999))
    assert(Codecs.sniff(bytes) == Some("audio"))
  }

  test("WAV parser: chunk walking, non-PCM/stereo/odd-length rejected") {
    val good = Codecs.encodeWav(16000, Array[Short](5, -5))
    // corrupt the format tag (PCM=1 -> 2): reject
    val nonPcm = good.clone(); nonPcm(20) = 2
    assert(Codecs.decodeWav(nonPcm).isEmpty)
    // stereo: reject
    val stereo = good.clone(); stereo(22) = 2
    assert(Codecs.decodeWav(stereo).isEmpty)
    // truncated data chunk: reject
    assert(Codecs.decodeWav(good.dropRight(1)).isEmpty)
    assert(Codecs.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty, "no chunks")
    assert(Codecs.sniff("GARBAGE".getBytes).isEmpty)
  }

  test("sniffFormat: video containers dispatch by magic; modality mapping") {
    val ppm = Codecs.encodePpm(9, 8, (x, y) => (x, y, x + y))
    val gvid = Codecs.encodeVideo(Seq(ppm))
    val avi = Codecs.encodeAvi(9, 8, 25, Seq(ppm))
    val mp4 = Codecs.encodeMp4(9, 8, 25, Seq(ppm))
    assert(Codecs.sniffFormat(gvid) == Some("gvid"))
    assert(Codecs.sniffFormat(avi) == Some("avi"))
    assert(Codecs.sniffFormat(mp4) == Some("mp4"))
    assert(Codecs.sniff(gvid) == Some("video"))
    assert(Codecs.sniff(avi) == Some("video"))
    assert(Codecs.sniff(mp4) == Some("video"))
    // RIFF/WAVE keeps sniffing as wav, not avi
    val wav = Codecs.encodeWav(16000, Array[Short](1, 2))
    assert(Codecs.sniffFormat(wav) == Some("wav"))
  }

  test("PNG via ImageIO: lossless round trip, sums integer-exact, sniffFormat") {
    val px = Map((0, 0) -> (1, 2, 3), (1, 0) -> (4, 5, 6),
      (0, 1) -> (7, 8, 9), (1, 1) -> (250, 0, 255))
    val bytes = Codecs.encodeImageIO(2, 2, "png", (x, y) => px((x, y)))
    assert(Codecs.sniffFormat(bytes) == Some("png"))
    assert(Codecs.sniff(bytes) == Some("image"))
    val p = Codecs.decodeImageIO(bytes).get
    assert(p == Codecs.Ppm(2, 2, 1 + 4 + 7 + 250, 2 + 5 + 8 + 0, 3 + 6 + 9 + 255))
  }

  test("JPEG via ImageIO: dimensions exact, sums within lossy tolerance") {
    // smooth gradient — JPEG's DCT reproduces it closely but not exactly
    val w = 32; val h = 24
    val bytes = Codecs.encodeImageIO(w, h, "jpg",
      (x, y) => (x * 8 % 256, y * 10 % 256, (x + y) * 4 % 256))
    assert(Codecs.sniffFormat(bytes) == Some("jpeg"))
    val p = Codecs.decodeImageIO(bytes).get
    assert(p.width == w && p.height == h)
    val expR = (for (x <- 0 until w; y <- 0 until h) yield x * 8 % 256).sum.toLong
    val expG = (for (x <- 0 until w; y <- 0 until h) yield y * 10 % 256).sum.toLong
    val expB = (for (x <- 0 until w; y <- 0 until h) yield (x + y) * 4 % 256).sum.toLong
    // per-pixel-channel mean error under 16/255 — generous for default quality
    val tol = 16L * w * h
    assert(math.abs(p.sumR - expR) < tol, s"sumR ${p.sumR} vs $expR")
    assert(math.abs(p.sumG - expG) < tol, s"sumG ${p.sumG} vs $expG")
    assert(math.abs(p.sumB - expB) < tol, s"sumB ${p.sumB} vs $expB")
  }

  test("decodeImageIO: garbage and truncated streams return None, never throw") {
    assert(Codecs.decodeImageIO("not an image at all".getBytes).isEmpty)
    val png = Codecs.encodeImageIO(4, 4, "png", (_, _) => (1, 2, 3))
    assert(Codecs.decodeImageIO(png.take(12)).isEmpty, "truncated header")
    // cut inside IDAT — note a PNG missing only its IEND trailer still
    // decodes (ImageIO stops once the pixel data is complete), so the
    // truncation must bite into the compressed stream itself
    assert(Codecs.decodeImageIO(png.take(png.length / 2)).isEmpty, "truncated IDAT")
    assert(Codecs.decodeImageIO(Array[Byte]()).isEmpty)
  }

  test("decodeMedia over synthetic PNG assets: ImageIO path end to end") {
    import graft.ops.Multimodal
    val ids = spark.range(0, 200).select($"id".as("doc_id"))
    val got = Multimodal.decodeMedia(spark, Multimodal.syntheticPngAssets(ids))
    val rows = got.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 200)
    // id 4: 12x20 PNG; decoded sums must equal the closed-form formula
    val exp = (for (x <- 0 until 12; y <- 0 until 20) yield (7 * x + 13 * y + 4) % 256).sum
    assert(rows(4L).getString(1) == "image" && rows(4L).getInt(2) == 12 &&
      rows(4L).getInt(3) == 20 && rows(4L).getLong(4) == exp)
    // odd ids are PNGs here too (unlike q96's WAV split)
    assert(rows(5L).getString(1) == "image" && rows(5L).getInt(2) == 13)
    for (g <- Seq(0L, 97L, 194L)) assert(rows(g).isNullAt(1), s"id $g must be undecoded")
  }

  test("decodeMedia over synthetic assets: formula sums match, garbage undecoded") {
    import graft.ops.Multimodal
    val ids = spark.range(0, 300).select($"id".as("doc_id"))
    val got = Multimodal.decodeMedia(spark, Multimodal.syntheticRealAssets(ids))
    val rows = got.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 300)
    // id 4: image 12x20, sum_r = sum over x<12,y<20 of (7x+13y+4)%256
    val exp = (for (x <- 0 until 12; y <- 0 until 20) yield (7 * x + 13 * y + 4) % 256).sum
    assert(rows(4L).getString(1) == "image" && rows(4L).getInt(2) == 12 &&
      rows(4L).getInt(3) == 20 && rows(4L).getLong(4) == exp)
    // id 5: audio, n = 105, sum_abs matches the formula
    val expA = (0 until 105).map(i => math.abs((i * 37 + 55) % 65536 - 32768).toLong).sum
    assert(rows(5L).getString(1) == "audio" && rows(5L).getInt(8) == 105 &&
      rows(5L).getLong(9) == expA)
    // ids 0 and 97, 194: garbage -> undecoded row
    for (g <- Seq(0L, 97L, 194L)) assert(rows(g).isNullAt(1), s"id $g must be undecoded")
  }

  test("wavPcm: a crafted chunk length near 2^31 must skip, not overflow and throw") {
    // valid RIFF/WAVE + fmt header, then a 'data' chunk claiming ~2^31
    // bytes in a tiny buffer: Int addition would wrap negative and pass
    // the bounds check; the decode must return None (skip) and not AIOOBE
    val base = Codecs.encodeWav(16000, Array.tabulate(80)(i => (i * 3).toShort))
    val evil = base.clone()
    // find the 'data' chunk and stamp a huge little-endian length
    var o = 12
    var dataAt = -1
    while (o + 8 <= evil.length && dataAt < 0) {
      if (new String(evil, o, 4, "US-ASCII") == "data") dataAt = o
      else {
        val len = (evil(o + 4) & 0xff) | ((evil(o + 5) & 0xff) << 8) |
          ((evil(o + 6) & 0xff) << 16) | ((evil(o + 7) & 0xff) << 24)
        o += 8 + len + (len & 1)
      }
    }
    assert(dataAt > 0)
    evil(dataAt + 4) = 0x00; evil(dataAt + 5) = 0xF0.toByte
    evil(dataAt + 6) = 0xFF.toByte; evil(dataAt + 7) = 0x7F // 0x7FFFF000
    assert(Codecs.decodeWav(evil).isEmpty)
    assert(Codecs.ahash64(evil).isEmpty)
  }
}

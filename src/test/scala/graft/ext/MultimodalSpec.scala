package graft.ext

import graft.SparkTestBase
import graft.io.Tables

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._
  import Multimodal._

  private lazy val media =
    asMedia(Tables.load(spark, sf, "documents").limit(50), "doc_id", "text")

  test("asMedia: binary payload round-trips the source bytes") {
    val r = media.filter(_.media_id == 0L).head()
    val txt = Tables.load(spark, sf, "documents")
      .filter($"doc_id" === 0L).select("text").as[String].head()
    assert(new String(r.content, "UTF-8") == txt)
  }

  test("decodeImages: deterministic metadata, plausible dimensions") {
    val metas = decodeImages(media).collect()
    assert(metas.length == 50)
    assert(metas.forall(m => m.width >= 1 && m.width <= 640 &&
      m.height >= 1 && m.height <= 480 && m.channels == 3 && m.n_bytes > 0))
    // determinism across runs
    val again = decodeImages(media).collect()
    assert(metas.map(m => (m.media_id, m.width, m.height)).toSet ==
      again.map(m => (m.media_id, m.width, m.height)).toSet)
  }

  test("featurize: fixed-dim Array[Float] usable by Similarity ops") {
    val feats = featurize(media, dim = 8).toDF()
    assert(feats.schema("feature").dataType.typeName == "array")
    val nn = Similarity.bruteForceTopK(
      feats.withColumnRenamed("media_id", "vec_id")
        .withColumnRenamed("feature", "embedding"),
      "vec_id", "embedding", queryIds = Seq(0L), k = 3)
    assert(nn.count() == 3)
  }

  test("resize: shrinks payloads deterministically, keeps ids") {
    val small = resize(media, targetW = 8, targetH = 8)
    val byId = small.collect().map(r => r.media_id -> r.content.length).toMap
    val orig = media.collect().map(r => r.media_id -> r.content.length).toMap
    assert(byId.keySet == orig.keySet)
    assert(byId.forall { case (id, n) => n <= orig(id) && n > 0 })
    val again = resize(media, 8, 8).collect().map(r => r.media_id -> r.content.length).toMap
    assert(byId == again)
  }

  test("PpmCodec: encode/decode round-trips real header and raster bytes") {
    import Multimodal.PpmCodec
    val img = MediaRow(7L, PpmCodec.Mime,
      PpmCodec.encode(5, 3, i => (i * 11) % 256))
    val meta = PpmCodec.decodeImage(img)
    assert(meta.width == 5 && meta.height == 3 && meta.channels == 3)
    assert(PpmCodec.pixelSum(img) == (0 until 45).map(i => (i * 11) % 256).sum)
    // header with comments and extra whitespace still parses (netpbm spec)
    val noisy = ("P6\n# a comment\n  5\t3\n# more\n255\n").getBytes("US-ASCII") ++
      img.content.drop(img.content.length - 45)
    val (w, h, mv, _) = PpmCodec.parseHeader(noisy, 0)
    assert((w, h, mv) == (5, 3, 255))
    intercept[IllegalArgumentException] {
      PpmCodec.decodeImage(MediaRow(0L, PpmCodec.Mime, "P5\n1 1\n255\n".getBytes))
    }
  }

  test("PpmCodec: nearest-neighbor resize resamples actual pixels") {
    import Multimodal.PpmCodec
    // 2x2 image with distinct per-pixel colors; upscale to 4x4 must
    // replicate each source pixel into a 2x2 block (floor mapping).
    val img = MediaRow(1L, PpmCodec.Mime,
      PpmCodec.encode(2, 2, i => i * 10))
    val big = PpmCodec.resize(img, 4, 4)
    val meta = PpmCodec.decodeImage(big)
    assert(meta.width == 4 && meta.height == 4)
    val (_, _, _, s0) = PpmCodec.parseHeader(img.content, 0)
    val (_, _, _, s1) = PpmCodec.parseHeader(big.content, 0)
    def px(b: Array[Byte], start: Int, w: Int, x: Int, y: Int): Seq[Int] =
      (0 until 3).map(c => b(start + 3 * (y * w + x) + c) & 0xff)
    for (x <- 0 until 4; y <- 0 until 4)
      assert(px(big.content, s1, 4, x, y) ==
        px(img.content, s0, 2, x * 2 / 4, y * 2 / 4))
  }

  test("PpmCodec: concatenated frames walked by real header parsing") {
    import Multimodal.PpmCodec
    val frame = PpmCodec.encode(3, 2, i => i)
    val video = MediaRow(9L, PpmCodec.Mime,
      frame ++ frame ++ frame)
    val fs = PpmCodec.frames(video).toSeq
    assert(fs.map(_.frame_idx) == Seq(0, 1, 2))
    assert(fs.map(_.offset_bytes) ==
      Seq(0L, frame.length.toLong, 2L * frame.length))
  }

  test("mime dispatch: PPM media flows through the generic API for real") {
    import Multimodal.PpmCodec
    val ppm = spark.createDataset(Seq(
      MediaRow(0L, PpmCodec.Mime, PpmCodec.encode(8, 4, i => i % 256)),
      MediaRow(1L, PpmCodec.Mime, PpmCodec.encode(6, 6, i => (i * 3) % 256))))
    val metas = decodeImages(ppm).collect().sortBy(_.media_id)
    assert(metas.map(m => (m.width, m.height)).toSeq == Seq((8, 4), (6, 6)))
    val feats = featurize(ppm).collect()
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(_.feature.forall(v => v >= 0f && v <= 1f)))
    val small = resize(ppm, 2, 2).collect()
    assert(small.forall(r => PpmCodec.decodeImage(r).width == 2))
  }

  test("WavCodec: encode/decode round-trips real RIFF chunks and PCM") {
    import Multimodal.WavCodec
    val vals = Array(0, 100, -100, 32767, -32768, 5, -5, 0)
    val wav = MediaRow(3L, WavCodec.Mime,
      WavCodec.encode(16000, 1, vals.length, vals(_)))
    val m = WavCodec.decodeAudio(wav)
    assert(m.sample_rate == 16000 && m.channels == 1 &&
      m.bits_per_sample == 16 && m.n_samples == vals.length)
    val (absSum, maxAbs, zc) = WavCodec.signalStats(wav)
    assert(absSum == vals.map(v => math.abs(v.toLong)).sum)
    assert(maxAbs == 32768)
    // sign flips (>=0 vs <0): 0,100 | 100,-100 X | -100,32767 X |
    // 32767,-32768 X | -32768,5 X | 5,-5 X | -5,0 X -> 6
    assert(zc == 6)
    // stereo: data chunk carries interleaved frames, n_samples is per
    // channel
    val st = MediaRow(4L, WavCodec.Mime, WavCodec.encode(8000, 2, 10, _ => 7))
    assert(WavCodec.decodeAudio(st).n_samples == 10)
    intercept[IllegalArgumentException] {
      WavCodec.decodeAudio(MediaRow(0L, WavCodec.Mime, "nope".getBytes))
    }
  }

  test("WavCodec: chunk walk skips unknown chunks (reads real files)") {
    import Multimodal.WavCodec
    val base = WavCodec.encode(8000, 1, 4, i => i * 10)
    // splice a LIST chunk between fmt and data, fixing the RIFF size
    val fmtEnd = 12 + 8 + 16
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = base.take(fmtEnd) ++ listChunk ++ base.drop(fmtEnd)
    val m = WavCodec.decodeAudio(MediaRow(5L, WavCodec.Mime, spliced))
    assert(m.sample_rate == 8000 && m.n_samples == 4)
    val (absSum, _, _) = WavCodec.signalStats(MediaRow(5L, WavCodec.Mime, spliced))
    assert(absSum == 0 + 10 + 20 + 30)
  }

  test("decodeAudios: distributed WAV metadata decode") {
    import Multimodal.WavCodec
    val ds = spark.createDataset(Seq(
      MediaRow(0L, WavCodec.Mime, WavCodec.encode(8000, 1, 16, i => i)),
      MediaRow(1L, WavCodec.Mime, WavCodec.encode(44100, 2, 32, i => -i))))
    val metas = decodeAudios(ds).collect().sortBy(_.media_id)
    assert(metas.map(m => (m.sample_rate, m.channels, m.n_samples)).toSeq ==
      Seq((8000, 1, 16L), (44100, 2, 32L)))
  }

  test("aHash64: identical rasters collide whatever the encoding noise; " +
    "flat image hashes to 0") {
    import Multimodal.{MediaRow, PpmCodec}
    val px = (i: Int) => (i * 37 + 11) % 256
    val a = MediaRow(1L, PpmCodec.Mime, PpmCodec.encode(20, 12, px))
    // same raster, different header spelling (comment injected)
    val enc = PpmCodec.encode(20, 12, px)
    val withComment = ("P6\n# a comment\n20 12\n255\n".getBytes("ISO-8859-1") ++
      enc.drop(enc.indexOfSlice("255\n".getBytes("ISO-8859-1")) + 4))
    val b = MediaRow(2L, PpmCodec.Mime, withComment)
    assert(PpmCodec.aHash64(a) == PpmCodec.aHash64(b))
    // constant image: no cell exceeds the mean, hash is exactly 0
    val flat = MediaRow(3L, PpmCodec.Mime, PpmCodec.encode(8, 8, _ => 128))
    assert(PpmCodec.aHash64(flat) == 0L)
  }

  test("aHash64: a small edit flips few bits; unrelated images flip many") {
    import Multimodal.{MediaRow, PpmCodec}
    val base = (i: Int) => (i * 37 + 11) % 256
    val a = PpmCodec.aHash64(
      MediaRow(1L, PpmCodec.Mime, PpmCodec.encode(24, 24, base)))
    val edited = PpmCodec.aHash64(MediaRow(2L, PpmCodec.Mime,
      PpmCodec.encode(24, 24, i => if (i < 3) 255 else base(i))))
    val other = PpmCodec.aHash64(MediaRow(3L, PpmCodec.Mime,
      PpmCodec.encode(24, 24, i => (i * 151 + 77) % 256)))
    val dEdit = java.lang.Long.bitCount(a ^ edited)
    val dOther = java.lang.Long.bitCount(a ^ other)
    assert(dEdit <= 3, s"one-pixel edit flipped $dEdit bits")
    assert(dOther > dEdit, s"unrelated image only $dOther bits away")
  }

  test("hashNearDupPairs == brute-force Hamming pairs (band recall)") {
    import spark.implicits._
    import Multimodal.{MediaRow, PpmCodec}
    // 30 images: 10 patterns x (original, one-pixel edit, heavy edit)
    val media = (0 until 30).map { k =>
      val seed = k % 10
      val variant = k / 10
      val px = (i: Int) => variant match {
        case 0 => (seed * 31 + i * 7) % 256
        case 1 => if (i < 3) 255 else (seed * 31 + i * 7) % 256
        case _ => (seed * 57 + i * 13) % 256
      }
      MediaRow(k.toLong, PpmCodec.Mime, PpmCodec.encode(16, 10, px))
    }
    val hashes = Multimodal.imageHashes(
      spark.createDataset(media))
    val got = Multimodal.hashNearDupPairs(hashes, maxHamming = 3)
      .select("ahash_a", "ahash_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    // brute force over the distinct hash domain
    def bandKey(h: Long) = ((h >> 48) & 0xffffL, (h >> 32) & 0xffffL,
      (h >> 16) & 0xffffL, h & 0xffffL)
    val ord = implicitly[Ordering[(Long, Long, Long, Long)]]
    val dh = media.map(PpmCodec.aHash64).distinct
    val want = (for {
      x <- dh; y <- dh
      if ord.lt(bandKey(x), bandKey(y))
      d = java.lang.Long.bitCount(x ^ y)
      if d <= 3
    } yield (x, y, d)).toSet
    assert(got == want)
    assert(got.nonEmpty, "expected at least one planted near-dup pair")
  }

  test("sampleFrames: stride covers the payload") {
    val frames = sampleFrames(media, stride = 100).collect()
    val byDoc = frames.groupBy(_.media_id)
    assert(byDoc.values.forall(fs =>
      fs.map(_.frame_idx).sorted.sameElements(fs.indices)))
    assert(frames.forall(_.offset_bytes % 100 == 0))
  }

  // ---- PNG codec -----------------------------------------------------

  /** Hand-rolled PNG chunk assembly for adversarial payloads the public
    * encoder refuses to produce (grayscale/RGBA color types, corrupt
    * CRCs, interlace flags). Raw scanlines in, deflate + chunk framing
    * here — so the DECODER under test meets bytes it did not write.
    */
  private def buildPng(w: Int, h: Int, colorType: Int,
                       scanlines: Array[Byte],
                       interlace: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      val c = crc.getValue.toInt
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte; ihdr(12) = interlace.toByte
    chunk("IHDR", ihdr)
    val defl = new java.util.zip.Deflater()
    defl.setInput(scanlines); defl.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("PngCodec: every filter type round-trips a hand-built raster") {
    import Multimodal.PngCodec
    val px = (i: Int) => (i * 53 + 17) % 256
    val want = (0 until 3 * 7 * 6).map(i => px(i).toByte).toArray
    // each filter alone, then the default cycling encoder
    for (f <- 0 to 4) {
      val img = MediaRow(f.toLong, PngCodec.Mime,
        PngCodec.encode(7, 6, px, filterOf = _ => f))
      val d = PngCodec.decode(img.content)
      assert(d.width == 7 && d.height == 6 && d.channels == 3)
      assert(d.rgb.sameElements(want), s"filter $f broke the round-trip")
    }
    val cyc = PngCodec.decode(PngCodec.encode(7, 6, px))
    assert(cyc.rgb.sameElements(want))
    assert(PngCodec.pixelSum(MediaRow(9L, PngCodec.Mime,
      PngCodec.encode(7, 6, px))) == (0 until 3 * 7 * 6).map(px).sum)
  }

  test("PngCodec: grayscale replicates to RGB, RGBA drops alpha") {
    import Multimodal.PngCodec
    // grayscale 3x2, filter 0 rows: scanline = 0x00 + w gray bytes
    val gray = Array[Byte](0, 10, 20, 30, 0, 40, 50, 60)
    val g = PngCodec.decode(buildPng(3, 2, 0, gray))
    assert(g.channels == 1)
    assert(g.rgb.toSeq == Seq(10, 10, 10, 20, 20, 20, 30, 30, 30,
      40, 40, 40, 50, 50, 50, 60, 60, 60).map(_.toByte))
    // RGBA 2x1: alpha bytes (99) must not reach the rgb raster
    val rgba = Array[Byte](0, 1, 2, 3, 99, 4, 5, 6, 99)
    val a = PngCodec.decode(buildPng(2, 1, 6, rgba))
    assert(a.channels == 4)
    assert(a.rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("PngCodec: corrupt CRC, truncated IDAT, interlace all fail fast") {
    import Multimodal.PngCodec
    val good = PngCodec.encode(4, 4, i => i % 256)
    val badCrc = good.clone()
    badCrc(badCrc.length - 1) = (badCrc(badCrc.length - 1) ^ 0x5a).toByte
    intercept[IllegalArgumentException] {
      PngCodec.decode(badCrc)
    }
    intercept[IllegalArgumentException] { // IDAT shorter than the raster
      PngCodec.decode(buildPng(4, 4, 2, Array[Byte](0, 1, 2, 3)))
    }
    intercept[IllegalArgumentException] { // Adam7 flagged: refuse, never garble
      PngCodec.decode(buildPng(2, 2, 2,
        new Array[Byte](2 * (1 + 6)), interlace = 1))
    }
    intercept[IllegalArgumentException] { // not a PNG at all
      PngCodec.decode("P6\n1 1\n255\nabc".getBytes("US-ASCII"))
    }
  }

  test("PngCodec: same raster as PPM gives identical hash and features") {
    import Multimodal.{PngCodec, PpmCodec}
    val px = (i: Int) => (i * 37 + 11) % 256
    val png = MediaRow(1L, PngCodec.Mime, PngCodec.encode(20, 12, px))
    val ppm = MediaRow(2L, PpmCodec.Mime, PpmCodec.encode(20, 12, px))
    assert(PngCodec.aHash64(png) == PpmCodec.aHash64(ppm))
    assert(PngCodec.featurize(png).feature.toSeq ==
      PpmCodec.featurize(ppm).feature.toSeq)
    assert(PngCodec.pixelSum(png) == PpmCodec.pixelSum(ppm))
  }

  test("PngCodec: mime dispatch + resize resample through the generic API") {
    import Multimodal.PngCodec
    val png = spark.createDataset(Seq(
      MediaRow(0L, PngCodec.Mime, PngCodec.encode(8, 4, i => i % 256)),
      MediaRow(1L, PngCodec.Mime, PngCodec.encode(6, 6, i => (i * 3) % 256))))
    val metas = decodeImages(png).collect().sortBy(_.media_id)
    assert(metas.map(m => (m.width, m.height)).toSeq == Seq((8, 4), (6, 6)))
    val small = resize(png, 2, 2).collect()
    assert(small.forall(r => PngCodec.decodeImage(r).width == 2))
    // resample correctness: 2x2 -> 4x4 replicates each pixel 2x2
    val img = MediaRow(1L, PngCodec.Mime, PngCodec.encode(2, 2, _ * 10))
    val big = PngCodec.decode(PngCodec.resize(img, 4, 4).content)
    val src = PngCodec.decode(img.content)
    def px(d: Array[Byte], w: Int, x: Int, y: Int): Seq[Int] =
      (0 until 3).map(c => d(3 * (y * w + x) + c) & 0xff)
    for (x <- 0 until 4; y <- 0 until 4)
      assert(px(big.rgb, 4, x, y) == px(src.rgb, 2, x / 2, y / 2))
    val hashes = Multimodal.imageHashes(png).collect()
    assert(hashes.length == 2)
  }

  test("ImageIoCodec: BMP round-trips any RGB raster losslessly") {
    import Multimodal.ImageIoCodec
    val px = (i: Int) => (i * 31 + 7) % 256
    val bmp = MediaRow(1L, ImageIoCodec.BmpMime,
      ImageIoCodec.encode(17, 9, px, ImageIoCodec.BmpMime))
    val (w, h, _, rgb) = ImageIoCodec.decodeRgb(bmp.content)
    assert((w, h) == (17, 9))
    assert(rgb.indices.forall(i => (rgb(i) & 0xff) == px(i)))
  }

  test("ImageIoCodec: GIF round-trips a <=256-color (grayscale) raster; " +
    "the JDK writer's h=4 quantization quirk stays quarantined") {
    import Multimodal.ImageIoCodec
    val gray = (i: Int) => ((i / 3) * 13 + 5) % 256 // r=g=b per pixel
    val gif = MediaRow(1L, ImageIoCodec.GifMime,
      ImageIoCodec.encode(11, 5, gray, ImageIoCodec.GifMime))
    val (w, h, _, rgb) = ImageIoCodec.decodeRgb(gif.content)
    assert((w, h) == (11, 5))
    assert(rgb.indices.forall(i => (rgb(i) & 0xff) == gray(i)))
    // the quirk the x_mm_imageio generator must keep dodging: height-4
    // GIFs come back quantized. If a JDK update fixes it, this alerts
    // us that the h>=5 constraint can be dropped.
    val g4 = ImageIoCodec.decodeRgb(ImageIoCodec.encode(11, 4, gray,
      ImageIoCodec.GifMime))._4
    assert(g4.indices.exists(i => (g4(i) & 0xff) != gray(i)),
      "JDK GIF writer now lossless at h=4 — x_mm_imageio can relax h>=5")
  }

  test("ImageIoCodec: JPEG is lossy but dims exact, smooth gradient " +
    "stays within tight tolerance") {
    import Multimodal.ImageIoCodec
    val wD = 16; val hD = 12
    val grad = (i: Int) => (i / 3 % wD) * 255 / wD
    val jpg = MediaRow(1L, ImageIoCodec.JpegMime,
      ImageIoCodec.encode(wD, hD, grad, ImageIoCodec.JpegMime))
    val (w, h, _, rgb) = ImageIoCodec.decodeRgb(jpg.content)
    assert((w, h) == (wD, hD))
    val devs = rgb.indices.map(i => math.abs((rgb(i) & 0xff) - grad(i)))
    assert(devs.max <= 8, s"max JPEG deviation ${devs.max} > 8")
    assert(devs.sum <= 2L * rgb.length)
  }

  test("ImageIoCodec: same raster as PPM gives identical hash/features/" +
    "sums (RgbOps delegation), and resize re-encodes in-container") {
    import Multimodal.{ImageIoCodec, PpmCodec}
    val px = (i: Int) => (i * 37 + 11) % 256
    val bmp = MediaRow(1L, ImageIoCodec.BmpMime,
      ImageIoCodec.encode(20, 12, px, ImageIoCodec.BmpMime))
    val ppm = MediaRow(2L, PpmCodec.Mime, PpmCodec.encode(20, 12, px))
    assert(ImageIoCodec.aHash64(bmp) == PpmCodec.aHash64(ppm))
    assert(ImageIoCodec.featurize(bmp).feature.toSeq ==
      PpmCodec.featurize(ppm).feature.toSeq)
    assert(ImageIoCodec.pixelSum(bmp) == PpmCodec.pixelSum(ppm))
    val small = ImageIoCodec.resize(bmp, 5, 6)
    assert(small.mime == ImageIoCodec.BmpMime)
    val smallPpm = PpmCodec.resize(ppm, 5, 6)
    assert(ImageIoCodec.pixelSum(small) == PpmCodec.pixelSum(smallPpm))
  }

  test("ImageIoCodec: mime dispatch routes JPEG/GIF/BMP through the " +
    "generic decode/featurize/resize API") {
    import Multimodal.ImageIoCodec
    val gray = (i: Int) => ((i / 3) * 7 + 3) % 256
    val media = spark.createDataset(Seq(
      MediaRow(0L, ImageIoCodec.BmpMime,
        ImageIoCodec.encode(9, 7, i => (i * 5) % 256, ImageIoCodec.BmpMime)),
      MediaRow(1L, ImageIoCodec.GifMime,
        ImageIoCodec.encode(8, 6, gray, ImageIoCodec.GifMime)),
      MediaRow(2L, ImageIoCodec.JpegMime,
        ImageIoCodec.encode(10, 8, i => (i / 3 % 10) * 255 / 10,
          ImageIoCodec.JpegMime))))
    val metas = decodeImages(media).collect().sortBy(_.media_id)
    assert(metas.map(m => (m.width, m.height)).toSeq ==
      Seq((9, 7), (8, 6), (10, 8)))
    val feats = featurize(media).collect()
    assert(feats.forall(_.feature.length == 8))
    val small = resize(media, 5, 5).collect().sortBy(_.media_id)
    assert(small.forall(r =>
      ImageIoCodec.decodeRgb(r.content)._1 == 5))
    assert(small.map(_.mime).toSeq == media.collect().map(_.mime).toSeq)
    val hashes = Multimodal.imageHashes(media).collect()
    assert(hashes.length == 3)
  }

  test("ImageIoCodec: corrupt payload and unsupported mime fail fast") {
    import Multimodal.ImageIoCodec
    val junk = Array.fill[Byte](32)(0x5a)
    val e = intercept[IllegalArgumentException](ImageIoCodec.decodeRgb(junk))
    assert(e.getMessage.contains("could not decode"))
    intercept[IllegalArgumentException](ImageIoCodec.formatOf("image/tiff"))
  }

  test("GIF animation: every stored frame round-trips losslessly; the " +
    "container block walk and the reader agree on count and offsets") {
    import Multimodal.ImageIoCodec
    val (w, h, n) = (7, 6, 4)
    def px(k: Int): Int => Int = i => (k * 17 + (i / 3) * 13) % 256
    val gif = ImageIoCodec.encodeGifAnimation(w, h, n, px)
    // real multi-frame decode: n frames, each bit-exact (grayscale
    // <=256 colors -> lossless palette)
    val frames = ImageIoCodec.gifFrames(gif)
    assert(frames.length == n)
    frames.zipWithIndex.foreach { case ((fw, fh, rgb), k) =>
      assert(fw == w && fh == h, s"frame $k dims")
      rgb.indices.foreach { i =>
        assert((rgb(i) & 0xff) == px(k)(i), s"frame $k byte $i")
      }
    }
    // independent structure walk: same count, ascending real offsets,
    // each pointing at an actual image-descriptor byte (0x2C)
    val offs = ImageIoCodec.gifFrameOffsets(gif)
    assert(offs.length == n)
    assert(offs == offs.sorted && offs.distinct.length == n)
    offs.foreach(o => assert((gif(o.toInt) & 0xff) == 0x2c))
    // a single-frame GIF through the same paths
    val one = ImageIoCodec.encode(5, 5, i => (i * 7) % 256,
      ImageIoCodec.GifMime)
    assert(ImageIoCodec.gifFrames(one).length == 1)
    assert(ImageIoCodec.gifFrameOffsets(one).length == 1)
  }

  test("gifFrameOffsets: truncated and trailer-less payloads fail with " +
    "the codec's named contract, never a raw index error") {
    import Multimodal.ImageIoCodec
    val gif = ImageIoCodec.encodeGifAnimation(7, 6, 3,
      k => i => (k * 17 + i * 13) % 256)
    // sanity: the intact payload walks clean
    assert(ImageIoCodec.gifFrameOffsets(gif).length == 3)
    // cut mid-structure at many points: every failure must be the
    // codec's IllegalArgumentException (truncated / unknown block),
    // never ArrayIndexOutOfBoundsException from unchecked indexing
    for (cut <- Seq(14, 20, 40, gif.length / 2, gif.length - 1)) {
      val e = intercept[IllegalArgumentException] {
        ImageIoCodec.gifFrameOffsets(gif.take(cut))
      }
      assert(e.getMessage.contains("truncated GIF payload") ||
        e.getMessage.contains("unknown GIF block"),
        s"cut=$cut: ${e.getMessage}")
    }
    // flipping the trailer off the end is also truncation, not silence
    val noTrailer = gif.dropRight(1)
    val e = intercept[IllegalArgumentException] {
      ImageIoCodec.gifFrameOffsets(noTrailer)
    }
    assert(e.getMessage.contains("truncated GIF payload"), e.getMessage)
  }

  test("sampleFrames routes GIF through the real block walk; " +
    "frameStats sums every decoded frame and cross-checks the count") {
    import Multimodal.ImageIoCodec
    val (w, h, n) = (6, 5, 3)
    def pxOf(id: Long)(k: Int): Int => Int =
      i => ((id * 29 + k * 17 + (i / 3) * 13) % 256).toInt
    val rows = Seq(1L, 2L).map(id => MediaRow(id, ImageIoCodec.GifMime,
      ImageIoCodec.encodeGifAnimation(w, h, n, pxOf(id))))
    val ds = spark.createDataset(rows)
    // sampleFrames: n real frames per media, indices 0..n-1, offsets
    // strictly ascending (stride argument ignored for GIF)
    val fr = sampleFrames(ds, stride = 7).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(fr.keySet == Set(1L, 2L))
    fr.values.foreach { fs =>
      assert(fs.map(_.frame_idx).toSeq == (0 until n))
      val offs = fs.map(_.offset_bytes)
      assert(offs.toSeq == offs.sorted.toSeq && offs.distinct.length == n)
    }
    // frameStats: per-frame exact sums == the generator closed form
    val stats = frameStats(ds).collect()
      .map(s => (s.media_id, s.frame_idx) -> s).toMap
    assert(stats.size == 2 * n)
    for (id <- Seq(1L, 2L); k <- 0 until n) {
      val s = stats((id, k))
      assert(s.width == w && s.height == h)
      val expect = (0 until w * h).map(p =>
        3L * ((id * 29 + k * 17 + p * 13) % 256)).sum
      assert(s.pixel_sum == expect, s"media $id frame $k")
    }
    // PPM concatenated frames and single-frame codecs share the surface
    val frame = PpmCodec.encode(3, 2, i => (i * 5) % 256)
    val ppm = MediaRow(9L, PpmCodec.Mime, frame ++ frame)
    val ppmStats = frameStats(spark.createDataset(Seq(ppm))).collect()
      .sortBy(_.frame_idx)
    assert(ppmStats.length == 2)
    val oneSum = (0 until 18).map(i => (i * 5) % 256).sum.toLong
    assert(ppmStats.forall(s =>
      s.width == 3 && s.height == 2 && s.pixel_sum == oneSum))
    // exotic mimes fail fast rather than faking pixel sums
    val stub = MediaRow(8L, "video/mp4", Array.fill[Byte](16)(1))
    val e = intercept[Exception] {
      frameStats(spark.createDataset(Seq(stub))).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("no real decoder")))
  }
}

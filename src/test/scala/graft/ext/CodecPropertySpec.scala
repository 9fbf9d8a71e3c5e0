package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import Multimodal.{MediaRow, PpmCodec, WavCodec}

/** Property-style invariants for the REAL codecs over generated media
  * (fixed seeds, driver-only — no Spark session needed): whatever dims /
  * samples / pixel functions we encode, parsing the bytes must read the
  * exact same information back. This is what separates a codec from a
  * stub — the payload is the single source of truth.
  */
class CodecPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val dimGen = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 40)
    k <- Gen.chooseNum(1, 9973)
  } yield (w, h, k)

  test("property: PPM encode->decode round-trips dims and every pixel") {
    for (s <- 1L to 40L) {
      val (w, h, k) = sample(dimGen, s)
      def f(i: Int): Int = (i * k + 17) % 256
      val img = MediaRow(s, PpmCodec.Mime, PpmCodec.encode(w, h, f))
      val meta = PpmCodec.decodeImage(img)
      assert(meta.width == w && meta.height == h)
      assert(PpmCodec.pixelSum(img) ==
        (0 until 3 * w * h).map(i => f(i).toLong).sum)
    }
  }

  test("property: PPM resize to own dims is the identity on the raster") {
    for (s <- 41L to 60L) {
      val (w, h, k) = sample(dimGen, s)
      val img = MediaRow(s, PpmCodec.Mime,
        PpmCodec.encode(w, h, i => (i * k) % 256))
      val same = PpmCodec.resize(img, w, h)
      assert(java.util.Arrays.equals(same.content, img.content))
      // and any resize reports the target dims and only source values
      val rz = PpmCodec.resize(img, 3, 5)
      val m = PpmCodec.decodeImage(rz)
      assert(m.width == 3 && m.height == 5)
      assert(PpmCodec.pixelSum(rz) <= 255L * 3 * 3 * 5)
    }
  }

  test("property: concatenated PPM frames partition the payload exactly") {
    for (s <- 61L to 75L) {
      val (w, h, k) = sample(dimGen, s)
      val n = (s % 4 + 1).toInt
      val frame = PpmCodec.encode(w, h, i => (i + k) % 256)
      val video = MediaRow(s, PpmCodec.Mime,
        Array.fill(n)(frame).reduce(_ ++ _))
      val fs = PpmCodec.frames(video).toSeq
      assert(fs.length == n)
      assert(fs.map(_.offset_bytes) ==
        (0 until n).map(i => i.toLong * frame.length))
    }
  }

  private val wavGen = for {
    sr <- Gen.oneOf(8000, 16000, 22050, 44100)
    ch <- Gen.oneOf(1, 2)
    n <- Gen.chooseNum(1, 500)
    k <- Gen.chooseNum(1, 99991)
  } yield (sr, ch, n, k)

  test("property: WAV encode->decode round-trips format and exact stats") {
    for (s <- 1L to 40L) {
      val (sr, ch, n, k) = sample(wavGen, s)
      def f(i: Int): Int = ((i.toLong * k) % 65536 - 32768).toInt
      val wav = MediaRow(s, WavCodec.Mime, WavCodec.encode(sr, ch, n, f))
      val m = WavCodec.decodeAudio(wav)
      assert(m.sample_rate == sr && m.channels == ch &&
        m.bits_per_sample == 16 && m.n_samples == n)
      val vals = (0 until n * ch).map(i => math.max(-32768, math.min(32767, f(i))))
      val (absSum, maxAbs, zc) = WavCodec.signalStats(wav)
      assert(absSum == vals.map(v => math.abs(v.toLong)).sum)
      assert(maxAbs == (if (vals.isEmpty) 0 else vals.map(v => math.abs(v)).max))
      val refZc = vals.zip(vals.drop(1)).count { case (a, b) =>
        (a < 0 && b >= 0) || (a >= 0 && b < 0)
      }
      assert(zc == refZc.toLong)
    }
  }
}

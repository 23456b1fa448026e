package graft

import graft.multimodal.G711Codec

/** G.711 µ-law/A-law: the code↔linear bijection the driver oracles lean
  * on, WAV container roundtrips, quantization sanity on arbitrary PCM,
  * and the loud perimeter. */
class G711CodecSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("µ-law: encode∘decode is the identity on all codes except +0/-0") {
    for (c <- 0 until 256) {
      val lin = G711Codec.ulawToLinear(c.toByte)
      val back = G711Codec.linearToUlaw(lin) & 0xff
      if (c == 0x7f) {
        // the one standard exception: 0x7f ('minus zero') decodes to 0,
        // which re-encodes to 0xff ('plus zero')
        assert(lin == 0 && back == 0xff)
      } else assert(back == c, s"code $c -> $lin -> $back")
    }
  }

  test("A-law: encode∘decode is the identity on ALL 256 codes") {
    for (c <- 0 until 256) {
      val lin = G711Codec.alawToLinear(c.toByte)
      val back = G711Codec.linearToAlaw(lin) & 0xff
      assert(back == c, s"code $c -> $lin -> $back")
    }
  }

  test("known anchor values from the published tables") {
    // µ-law: 0xff is +0; full-scale positive code 0x80 decodes to 32124
    assert(G711Codec.ulawToLinear(0xff.toByte) == 0)
    assert(G711Codec.ulawToLinear(0x80.toByte) == 32124)
    assert(G711Codec.ulawToLinear(0x00.toByte) == -32124)
    // A-law: max magnitude is 32256 (seg 7, mantissa 15)
    assert(G711Codec.alawToLinear(0xaa.toByte) == 32256 ||
      G711Codec.alawToLinear(0x2a.toByte).abs == 32256)
    assert((0 until 256).map(c =>
      G711Codec.alawToLinear(c.toByte).toInt).max == 32256)
    assert((0 until 256).map(c =>
      G711Codec.ulawToLinear(c.toByte).toInt).max == 32124)
  }

  test("encoding is monotone and quantization error is companded") {
    // coarse sanity on arbitrary PCM: decode(encode(x)) stays within the
    // segment width of x (µ-law max cell width is 256 at the top segment)
    for (x <- Seq[Short](-32768, -12345, -100, -1, 0, 1, 99, 1234, 32767)) {
      val mu = G711Codec.ulawToLinear(G711Codec.linearToUlaw(x))
      val al = G711Codec.alawToLinear(G711Codec.linearToAlaw(x))
      assert(math.abs(mu - x) <= 1024, s"mu err for $x: $mu")
      assert(math.abs(al - x) <= 1024, s"alaw err for $x: $al")
    }
  }

  test("WAV roundtrip carries codes losslessly (both laws)") {
    // source samples drawn FROM the decode table = the exact subspace
    for (mu <- Seq(true, false)) {
      val samples = Array.tabulate[Short](256) { c =>
        if (mu) G711Codec.ulawToLinear(c.toByte)
        else G711Codec.alawToLinear(c.toByte)
      }
      val wav = G711Codec.encodeWav(8000, 1, samples, mu)
      val (rate, ch, isMu, dec) = G711Codec.decodeWav(wav)
      assert(rate == 8000 && ch == 1 && isMu == mu)
      // +0/-0 aliasing collapses 0x7f to 0xff in µ-law; values are equal
      assert(dec.toSeq == samples.toSeq)
    }
  }

  test("perimeter: PCM16 WAVs, junk, and truncation refuse loudly") {
    val pcm = graft.multimodal.WavCodec.encodePcm16(8000, 1,
      Array[Short](1, 2, 3))
    intercept[IllegalArgumentException](G711Codec.decodeWav(pcm))
    intercept[IllegalArgumentException](
      G711Codec.decodeWav("junk".getBytes))
    val good = G711Codec.encodeWav(8000, 1, Array[Short](0, 100), mu = true)
    // WavCodec likewise refuses the G.711 format tag — disjoint perimeters
    intercept[IllegalArgumentException](
      graft.multimodal.WavCodec.decodePcm16(good))
  }
}

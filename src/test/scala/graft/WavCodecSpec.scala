package graft

import graft.multimodal.WavCodec
import org.scalatest.funsuite.AnyFunSuite

/** WAV PCM16 codec perimeter: lossless roundtrip (mono + stereo, full
  * 16-bit range), spec-required skipping of unknown RIFF chunks, and
  * loud rejection of every shape outside the declared perimeter. */
class WavCodecSpec extends AnyFunSuite {

  private def det(n: Int): Array[Short] =
    Array.tabulate(n)(k => (((k * 2654435761L) % 65536) - 32768).toShort)

  test("mono roundtrip preserves every sample, rate, channel count") {
    val s = det(300)
    val (rate, ch, back) = WavCodec.decodePcm16(
      WavCodec.encodePcm16(8000, 1, s))
    assert(rate == 8000 && ch == 1)
    assert(back.toSeq == s.toSeq)
  }

  test("stereo roundtrip keeps interleaving and boundary values") {
    val s = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1, 257)
    val (rate, ch, back) = WavCodec.decodePcm16(
      WavCodec.encodePcm16(44100, 2, s))
    assert(rate == 44100 && ch == 2)
    assert(back.toSeq == s.toSeq)
  }

  test("unknown chunks before data are skipped by declared size") {
    val wav = WavCodec.encodePcm16(8000, 1, det(10))
    // splice a LIST chunk (odd size -> pad byte) between fmt and data
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++
      Array[Byte](0)
    val spliced = wav.take(36) ++ list ++ wav.drop(36)
    // patch RIFF size (bytes 4-7, little-endian)
    val total = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((total >> (8 * i)) & 0xff).toByte
    val (_, _, back) = WavCodec.decodePcm16(spliced)
    assert(back.toSeq == det(10).toSeq)
  }

  test("loud throws outside the perimeter") {
    val ok = WavCodec.encodePcm16(8000, 1, det(4))
    // not RIFF
    assertThrows[IllegalArgumentException](
      WavCodec.decodePcm16("JUNKJUNKJUNK".getBytes("US-ASCII")))
    // IEEE-float format tag (3)
    val floatFmt = ok.clone(); floatFmt(20) = 3
    assertThrows[IllegalArgumentException](WavCodec.decodePcm16(floatFmt))
    // 8-bit width
    val eightBit = ok.clone(); eightBit(34) = 8
    assertThrows[IllegalArgumentException](WavCodec.decodePcm16(eightBit))
    // truncated data chunk: declared size beyond the buffer
    val trunc = ok.dropRight(2)
    assertThrows[IllegalArgumentException](WavCodec.decodePcm16(trunc))
    // zero channels in the fmt chunk: per-channel math downstream would
    // divide by it — refused, not silently decoded
    val zeroCh = ok.clone(); zeroCh(22) = 0
    assertThrows[IllegalArgumentException](WavCodec.decodePcm16(zeroCh))
    // channel count that doesn't divide the sample count
    val threeCh = ok.clone(); threeCh(22) = 3
    assertThrows[IllegalArgumentException](WavCodec.decodePcm16(threeCh))
  }
}

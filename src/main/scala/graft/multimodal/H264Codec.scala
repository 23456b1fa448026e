package graft.multimodal

import java.io.ByteArrayOutputStream

/** H.264 / AVC Annex B NAL-unit census — the stream-structure walk a
  * corpus pipeline runs on raw video elementary streams: how many
  * NAL units, which are parameter sets (SPS/PPS), which are IDR
  * keyframes, where the random-access points sit. CENSUS, not
  * decode: the walk finds start codes (ITU-T H.264 Annex B:
  * 00 00 01, optionally preceded by one more zero) and reads each
  * one-byte NAL header (§7.3.1: forbidden_zero_bit |
  * nal_ref_idc(2) | nal_unit_type(5)); slice/macroblock decoding
  * (CABAC, the actual codec) stays outside the perimeter — the
  * reference never decodes video at all. Loud on a malformed header
  * or a stream that does not begin with a start code; a census that
  * silently mis-counts is worse than one that refuses. Per-row
  * executor work, scan-fused. */
object H264Codec {

  /** §7.4.1 table anchors the census reports on. */
  val TypeNonIdr = 1
  val TypeIdr = 5
  val TypeSei = 6
  val TypeSps = 7
  val TypePps = 8

  final case class Nal(offset: Int, refIdc: Int, nalType: Int,
      nalBytes: Int)

  /** Synthesize a real Annex B stream: a 4-byte-start-code SPS, a
    * PPS (both omitted when `paramSets` is false — the per-chunk AVI
    * access-unit shape, where parameter sets ride only the first
    * chunk), then one slice NAL per (nalType, payloadLen) spec with
    * 3-byte start codes (the common framing mix). Payload bytes are
    * deterministic and never zero, so no accidental start-code
    * emulation occurs (and no 00 00 03 escaping is needed). */
  def synth(slices: Seq[(Int, Int)],
      paramSets: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def hdr(refIdc: Int, t: Int): Int = (refIdc << 5) | t
    def payload(n: Int, salt: Int): Unit = {
      var i = 0
      while (i < n) { out.write((i * 73 + salt) % 250 + 1); i += 1 }
    }
    if (paramSets) {
      out.write(0); out.write(0); out.write(0); out.write(1)
      out.write(hdr(3, TypeSps)); payload(6, TypeSps)
      out.write(0); out.write(0); out.write(1)
      out.write(hdr(3, TypePps)); payload(3, TypePps)
    }
    slices.foreach { case (t, len) =>
      require(t >= 1 && t <= 23, s"bad NAL type $t")
      require(len >= 1, s"bad payload length $len")
      out.write(0); out.write(0); out.write(1)
      out.write(hdr(if (t == TypeIdr || t == TypeSps || t == TypePps) 3
        else 2, t))
      payload(len, t + len)
    }
    out.toByteArray
  }

  /** Walk the start codes; each NAL spans to the next start code (or
    * EOF). nalBytes counts the header byte plus payload, never the
    * start code itself. */
  def scan(bytes: Array[Byte]): Seq[Nal] = {
    // next start code at or after i, or length; returns (pos, len)
    // where len is 3 or 4 (a 4-byte code is a zero + a 3-byte code)
    def nextStart(i: Int): (Int, Int) = {
      var p = i
      while (p + 2 < bytes.length) {
        if (bytes(p) == 0 && bytes(p + 1) == 0 && bytes(p + 2) == 1) {
          val four = p > i && bytes(p - 1) == 0
          return if (four) (p - 1, 4) else (p, 3)
        }
        p += 1
      }
      (bytes.length, 0)
    }
    val (first, firstLen) = nextStart(0)
    require(first == 0 && firstLen > 0,
      "not an Annex B stream: no leading start code")
    val nals = Seq.newBuilder[Nal]
    var pos = first + firstLen
    while (pos < bytes.length) {
      require(pos < bytes.length, s"empty NAL at offset $pos")
      val h = bytes(pos) & 0xff
      require((h & 0x80) == 0,
        s"forbidden_zero_bit set at offset $pos")
      val refIdc = (h >> 5) & 3
      val t = h & 0x1f
      require(t >= 1, s"reserved NAL type 0 at offset $pos")
      val (nxt, nxtLen) = nextStart(pos + 1)
      require(nxt > pos, s"empty NAL at offset $pos")
      nals += Nal(pos, refIdc, t, nxt - pos)
      pos = nxt + nxtLen
      require(nxtLen == 0 || pos < bytes.length,
        s"trailing start code with no NAL at offset $nxt")
    }
    nals.result()
  }
}

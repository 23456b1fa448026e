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

  /** Walk ONE AVCC-framed sample — the shape AVC actually takes
    * inside MP4 (ISO 14496-15 §5.3.4.2): each NAL is prefixed by a
    * big-endian `lengthSize`-byte length instead of an Annex B start
    * code (lengthSize = avcC's lengthSizeMinusOne + 1, 4 in
    * practice). Same one-byte header census as scan(); loud on a
    * length that overruns the sample or leaves trailing garbage —
    * sample bounds come from the container's sample table, so a
    * mis-expanded stsc/stco shows up here as a refusal, not a
    * miscount. */
  def scanAvcc(bytes: Array[Byte], lengthSize: Int = 4): Seq[Nal] = {
    require(lengthSize >= 1 && lengthSize <= 4,
      s"bad AVCC length size $lengthSize")
    val nals = Seq.newBuilder[Nal]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + lengthSize <= bytes.length,
        s"truncated NAL length field at offset $pos")
      var len = 0L
      var i = 0
      while (i < lengthSize) {
        len = (len << 8) | (bytes(pos + i) & 0xffL); i += 1
      }
      require(len >= 1 && pos + lengthSize + len <= bytes.length,
        s"NAL length $len at offset $pos overruns the " +
          s"${bytes.length}-byte sample")
      val at = pos + lengthSize
      val h = bytes(at) & 0xff
      require((h & 0x80) == 0, s"forbidden_zero_bit set at offset $at")
      val t = h & 0x1f
      require(t >= 1, s"reserved NAL type 0 at offset $at")
      nals += Nal(at, (h >> 5) & 3, t, len.toInt)
      pos = at + len.toInt
    }
    nals.result()
  }

  /** AVCC-frame the given NALs: each `(refIdc, nalType, payloadLen)`
    * becomes length-prefix + header + deterministic payload — the
    * per-sample synth for MP4 sample-table fixtures. */
  def synthAvccSample(nals: Seq[(Int, Int, Int)],
      lengthSize: Int = 4): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    nals.foreach { case (refIdc, t, payloadLen) =>
      require(t >= 1 && t <= 23, s"bad NAL type $t")
      require(payloadLen >= 0, s"bad payload length $payloadLen")
      val len = 1 + payloadLen
      var i = lengthSize - 1
      while (i >= 0) { out.write((len >> (8 * i)) & 0xff); i -= 1 }
      out.write(((refIdc & 3) << 5) | t)
      var k = 0
      while (k < payloadLen) { out.write((k * 73 + t + payloadLen) % 250 + 1); k += 1 }
    }
    out.toByteArray
  }

  /** Walk the start codes; each NAL spans to the next start code (or
    * EOF). nalBytes counts the header byte plus payload — never the
    * start code, and never zero padding: ALL consecutive zeros
    * preceding a `00 00 01` (one is the 4-byte start-code form, any
    * more are `trailing_zero_8bits`, legal in Annex B §B.1.2) and any
    * zero run at EOF count as framing, not NAL bytes. A NAL's own
    * last byte can never be 0x00 — `rbsp_trailing_bits` ends with the
    * stop bit and `cabac_zero_words` are emulation-escaped — so the
    * trim can't eat payload (r13 ADVICE: padding zeros silently
    * inflated the census). */
  def scan(bytes: Array[Byte]): Seq[Nal] = {
    // next start code at or after i: (nalEnd, nextNalPos, found) where
    // nalEnd backs over the zero run preceding the code (or EOF) and
    // nextNalPos is the first header byte after the code
    def nextStart(i: Int): (Int, Int, Boolean) = {
      var p = i
      while (p + 2 < bytes.length) {
        if (bytes(p) == 0 && bytes(p + 1) == 0 && bytes(p + 2) == 1) {
          var q = p
          while (q > i && bytes(q - 1) == 0) q -= 1
          return (q, p + 3, true)
        }
        p += 1
      }
      var q = bytes.length
      while (q > i && bytes(q - 1) == 0) q -= 1
      (q, bytes.length, false)
    }
    val (first, firstEnd, firstFound) = nextStart(0)
    require(firstFound && first == 0,
      "not an Annex B stream: no leading start code")
    val nals = Seq.newBuilder[Nal]
    var pos = firstEnd
    var more = pos < bytes.length
    require(more, s"trailing start code with no NAL at offset $first")
    while (more) {
      val h = bytes(pos) & 0xff
      require((h & 0x80) == 0,
        s"forbidden_zero_bit set at offset $pos")
      val refIdc = (h >> 5) & 3
      val t = h & 0x1f
      require(t >= 1, s"reserved NAL type 0 at offset $pos")
      val (nalEnd, nxtPos, found) = nextStart(pos + 1)
      require(nalEnd > pos, s"empty NAL at offset $pos")
      nals += Nal(pos, refIdc, t, nalEnd - pos)
      if (found) {
        require(nxtPos < bytes.length,
          s"trailing start code with no NAL at offset $nalEnd")
        pos = nxtPos
      } else more = false
    }
    nals.result()
  }
}

package graft.multimodal

import java.io.ByteArrayOutputStream

/** AAC ADTS frame census — the ffprobe-level walk a corpus pipeline
  * runs on AAC audio blobs before deciding to keep, transcode, or
  * route them (the q284 MP3 pattern applied to the other dominant
  * audio container). CENSUS, not decode: the walk parses the fixed
  * ADTS header (ISO/IEC 13818-7 §6.2 / 14496-3), hops frame to frame
  * by the 13-bit aac_frame_length, and refuses loudly on desync or
  * truncation — raw-data-block decoding (the actual AAC filterbank)
  * stays outside the perimeter, exactly as the reference never
  * decodes audio at all (its ingest is text-only; see
  * pdf_spider.py:42-50). Per-row executor work, scan-fused.
  *
  * Header layout (7 bytes, protection_absent=1):
  *   syncword FFF(12) | ID(1) | layer(2)=00 | protection_absent(1)
  *   profile(2) | sampling_frequency_index(4) | private(1) |
  *   channel_configuration(3) | original(1) | home(1) |
  *   copyright_id(1) | copyright_start(1) | aac_frame_length(13) |
  *   adts_buffer_fullness(11) | number_of_raw_data_blocks(2)
  */
object AacCodec {

  /** ISO/IEC 14496-3 sampling_frequency_index table. */
  val SampleRates: Array[Int] = Array(96000, 88200, 64000, 48000,
    44100, 32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** Samples per AAC raw data block (one 1024-sample filterbank). */
  val SamplesPerFrame = 1024

  final case class AdtsFrame(offset: Int, profile: Int, sfi: Int,
      channels: Int, frameBytes: Int, rawDataBlocks: Int)

  /** Synthesize a real ADTS stream: one frame per (profile 0-3,
    * channels 1-7, payloadLen ≥ 1) spec at the given sample-rate
    * index, deterministic filler payload. An optional ID3v2 prefix
    * (the dirty-but-common stream shape) of exactly `id3Bytes` total
    * bytes exercises the skip. */
  def synth(specs: Seq[(Int, Int, Int)], sampleRateIdx: Int = 4,
      id3Bytes: Int = 0): Array[Byte] = {
    require(sampleRateIdx >= 0 && sampleRateIdx < SampleRates.length,
      s"bad sample rate index $sampleRateIdx")
    require(id3Bytes == 0 || id3Bytes >= 10,
      s"an ID3v2 prefix needs >= 10 bytes, got $id3Bytes")
    val out = new ByteArrayOutputStream()
    if (id3Bytes > 0) {
      val body = id3Bytes - 10
      require(body < (1 << 28), s"bad ID3 size $id3Bytes")
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0)
      out.write((body >> 21) & 0x7f); out.write((body >> 14) & 0x7f)
      out.write((body >> 7) & 0x7f); out.write(body & 0x7f)
      var i = 0
      while (i < body) { out.write(i * 37 % 251); i += 1 }
    }
    specs.foreach { case (profile, channels, payloadLen) =>
      require(profile >= 0 && profile <= 3, s"bad profile $profile")
      require(channels >= 1 && channels <= 7, s"bad channels $channels")
      require(payloadLen >= 1, s"bad payload length $payloadLen")
      val frameLen = 7 + payloadLen
      require(frameLen < (1 << 13), s"frame length $frameLen overflows")
      out.write(0xff)
      out.write(0xf1) // MPEG-4 (ID=0), layer 00, protection_absent=1
      out.write((profile << 6) | (sampleRateIdx << 2) |
        ((channels >> 2) & 1))
      out.write(((channels & 3) << 6) | ((frameLen >> 11) & 3))
      out.write((frameLen >> 3) & 0xff)
      out.write(((frameLen & 7) << 5) | 0x1f) // fullness high bits
      out.write(0xfc) // fullness low | 0 raw data blocks (= 1 block)
      var i = 0
      while (i < payloadLen) {
        out.write((i * 73 + payloadLen) % 251)
        i += 1
      }
    }
    out.toByteArray
  }

  /** Walk an ADTS stream frame by frame (optionally ID3v2-prefixed).
    * Loud on a broken syncword, a truncated frame, or an impossible
    * header — a census that silently mis-counts is worse than one
    * that refuses (the caller decides tolerance; see
    * DocParse.parseAnySafe for the quarantine wrapper pattern). */
  def scan(bytes: Array[Byte]): Seq[AdtsFrame] = {
    var pos = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      require((bytes(6) | bytes(7) | bytes(8) | bytes(9)) >= 0,
        "corrupt ID3v2 size (non-syncsafe byte)")
      pos = 10 + sz
      require(pos <= bytes.length, s"ID3v2 tag declares $sz bytes past EOF")
    }
    val frames = Seq.newBuilder[AdtsFrame]
    while (pos < bytes.length) {
      require(pos + 7 <= bytes.length,
        s"truncated ADTS header at offset $pos")
      require((bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xf0) == 0xf0,
        s"ADTS desync at offset $pos")
      require((bytes(pos + 1) & 0x06) == 0,
        s"ADTS layer must be 00 at offset $pos")
      val profile = (bytes(pos + 2) & 0xc0) >>> 6
      val sfi = (bytes(pos + 2) & 0x3c) >>> 2
      require(sfi < SampleRates.length,
        s"reserved sampling_frequency_index $sfi at offset $pos")
      val channels = ((bytes(pos + 2) & 1) << 2) |
        ((bytes(pos + 3) & 0xc0) >>> 6)
      val frameLen = ((bytes(pos + 3) & 3) << 11) |
        ((bytes(pos + 4) & 0xff) << 3) | ((bytes(pos + 5) & 0xe0) >>> 5)
      val rdb = (bytes(pos + 6) & 3) + 1
      val hdr = if ((bytes(pos + 1) & 1) == 1) 7 else 9 // CRC adds 2
      require(frameLen >= hdr, s"ADTS frame length $frameLen < header")
      require(pos.toLong + frameLen <= bytes.length,
        s"ADTS frame at $pos declares $frameLen bytes past EOF")
      frames += AdtsFrame(pos, profile, sfi, channels, frameLen, rdb)
      pos += frameLen
    }
    frames.result()
  }
}

package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real audio decode for the BinaryOps seam — WAV/RIFF PCM16, parsed
  * byte-by-byte with zero dependencies and no egress (the audio
  * counterpart of ImageCodec's ImageIO path; WAV is the one mainstream
  * audio container whose spec is simple enough to own outright, the
  * same stance as PdfCodec's declared filter perimeter). Supported:
  * canonical RIFF/WAVE with an `fmt ` chunk declaring PCM (format 1),
  * 16-bit samples, any channel count/rate, and a `data` chunk; unknown
  * chunks (LIST/INFO/fact/cue) are skipped by their declared size, as
  * the spec requires. Anything else — float/ADPCM/µ-law formats,
  * 8/24/32-bit widths, truncated chunks — throws loudly with the
  * offending detail, never a silent wrong decode (the corpus-scale
  * rule: a quiet misparse poisons training data invisibly; a loud
  * perimeter gets fixed).
  *
  * Decode cost is one pass over the blob per row, executor-side — the
  * same 100 TB envelope as DocxCodec/PdfCodec/ImageCodec. */
object WavCodec {

  /** Encode PCM16 samples as a canonical 44-byte-header WAV. */
  def encodePcm16(sampleRate: Int, channels: Int, samples: Array[Short])
      : Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "bad rate/channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a PCM16 WAV → (sampleRate, channels, interleaved samples).
    * Chunk-walks the RIFF body; throws on any non-PCM16 shape. */
  def decodePcm16(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 12, s"not a WAV: ${bytes.length} bytes")
    val riff = tag()
    require(riff == "RIFF", s"not a WAV: leading tag '$riff'")
    buf.getInt() // declared RIFF size; trust the real buffer bound instead
    val wave = tag()
    require(wave == "WAVE", s"not a WAV: form type '$wave'")
    var rate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (samples == null || rate < 0)) {
      val id = tag()
      val size = buf.getInt()
      require(size >= 0 && size <= buf.remaining(),
        s"truncated chunk '$id': declared $size, ${buf.remaining()} left")
      id match {
        case "fmt " =>
          require(size >= 16,
            s"fmt chunk too small ($size bytes, PCM needs 16)")
          val fmtEnd = buf.position() + size
          val audioFormat = buf.getShort()
          require(audioFormat == 1,
            s"unsupported WAV format $audioFormat (only PCM=1)")
          channels = buf.getShort()
          rate = buf.getInt()
          buf.getInt() // byte rate
          buf.getShort() // block align
          val bits = buf.getShort()
          require(bits == 16, s"unsupported bit width $bits (only 16)")
          buf.position(fmtEnd) // skip any fmt extension
        case "data" =>
          require(size % 2 == 0, s"odd PCM16 data size $size")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(); i += 1 }
        case _ => // LIST/fact/cue/...: skip by declared size (+pad byte)
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(rate > 0, "no fmt chunk")
    // a hostile fmt chunk can declare 0 (or negative, as a short) channels
    // — downstream per-channel math would divide by it or silently emit
    // empty frames; refuse loudly like every other shape violation
    require(channels > 0, s"bad channel count $channels")
    require(samples != null, "no data chunk")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    (rate, channels, samples)
  }
}

package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** ITU-T G.711 companded audio (µ-law and A-law) — the compressed half of
  * the audio perimeter, next to WavCodec's PCM16. G.711 is the telephony
  * codec every speech corpus eventually surfaces; both laws are published
  * 8-bit logarithmic PCM maps (ITU-T Rec. G.711, tables 1a/1b/2a/2b).
  *
  * What makes this LOSSY codec oracle-checkable: each 8-bit code decodes
  * to exactly one 16-bit value, and encode∘decode is the identity on all
  * 256 codes per law (the standard's quantization-cell property — decode
  * lands mid-cell, re-encode recovers the cell). Driver fixtures put the
  * source bytes in CODE space, so the decode→stats pipeline is exact
  * integer arithmetic the DuckDB oracle reproduces from the published
  * bit-field formulas, while arbitrary PCM16 takes the ordinary lossy
  * encode path (quantization to the nearest cell).
  *
  * The WAV wrapping uses the registered format tags (6 = A-law,
  * 7 = µ-law, 8 bits/sample); anything else refuses loudly, WavCodec's
  * stance. Per-row executor work, the usual 100 TB codec envelope. */
object G711Codec {

  private val Bias = 0x84
  private val Clip = 32635

  /** 16-bit linear → µ-law code (Sun/CCITT reference algorithm). */
  def linearToUlaw(pcmIn: Short): Byte = {
    var pcm = pcmIn.toInt
    val sign = if (pcm < 0) { pcm = -pcm; 0x80 } else 0
    if (pcm > Clip) pcm = Clip
    pcm += Bias
    // exponent = msb position - 7 (pcm >= 0x84 so msb >= 7)
    val exponent = 24 - Integer.numberOfLeadingZeros(pcm) // 31-nlz-7
    val mantissa = (pcm >> (exponent + 3)) & 0x0f
    (~(sign | (exponent << 4) | mantissa) & 0xff).toByte
  }

  /** µ-law code → 16-bit linear (exact table value). */
  def ulawToLinear(code: Byte): Short = {
    val u = ~code & 0xff
    var t = (((u & 0x0f) << 3) + Bias) << ((u & 0x70) >> 4)
    t -= Bias
    (if ((u & 0x80) != 0) -t else t).toShort
  }

  private val SegAend =
    Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)

  /** 16-bit linear → A-law code (Sun/CCITT reference algorithm). */
  def linearToAlaw(pcmIn: Short): Byte = {
    var pcm = pcmIn.toInt >> 3 // 16 → 13 bit
    val mask = if (pcm >= 0) 0xd5 else { pcm = -pcm - 1; 0x55 }
    var seg = 0
    while (seg < 8 && pcm > SegAend(seg)) seg += 1
    val aval =
      if (seg >= 8) 0x7f
      else {
        val shift = if (seg < 2) 1 else seg
        (seg << 4) | ((pcm >> shift) & 0x0f)
      }
    ((aval ^ mask) & 0xff).toByte
  }

  /** A-law code → 16-bit linear (exact table value). */
  def alawToLinear(code: Byte): Short = {
    val a = (code & 0xff) ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  /** Encode PCM16 → G.711 WAV (format tag 7 = µ-law, 6 = A-law). */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short],
      mu: Boolean): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "bad rate/channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    val dataLen = samples.length // one byte per sample
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(if (mu) 7 else 6) // WAVE_FORMAT_MULAW / _ALAW
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels) // byte rate: 1 byte/sample
    buf.putShort(channels.toShort) // block align
    buf.putShort(8) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s =>
      buf.put(if (mu) linearToUlaw(s) else linearToAlaw(s)))
    buf.array()
  }

  /** Decode a G.711 WAV → (sampleRate, channels, mu?, linear samples).
    * Chunk-walks the RIFF body; refuses any non-G.711 shape loudly. */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Boolean, Array[Short]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 12, s"not a WAV: ${bytes.length} bytes")
    val riff = tag()
    require(riff == "RIFF", s"not a WAV: leading tag '$riff'")
    buf.getInt()
    val wave = tag()
    require(wave == "WAVE", s"not a WAV: form type '$wave'")
    var rate = -1
    var channels = -1
    var mu = false
    var sawFmt = false
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (samples == null || !sawFmt)) {
      val id = tag()
      val size = buf.getInt()
      require(size >= 0 && size <= buf.remaining(),
        s"truncated chunk '$id': declared $size, ${buf.remaining()} left")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small ($size bytes)")
          val fmtEnd = buf.position() + size
          val audioFormat = buf.getShort()
          require(audioFormat == 6 || audioFormat == 7,
            s"unsupported WAV format $audioFormat (G.711 is 6=A-law/7=µ-law)")
          mu = audioFormat == 7
          channels = buf.getShort()
          rate = buf.getInt()
          buf.getInt() // byte rate
          buf.getShort() // block align
          val bits = buf.getShort()
          require(bits == 8, s"G.711 is 8-bit, found $bits")
          sawFmt = true
          buf.position(fmtEnd)
        case "data" =>
          // decode needs the law — require fmt first (canonical order)
          require(sawFmt, "data chunk before fmt chunk")
          samples = new Array[Short](size)
          var i = 0
          while (i < size) {
            val c = buf.get()
            samples(i) = if (mu) ulawToLinear(c) else alawToLinear(c)
            i += 1
          }
          if ((size & 1) == 1 && buf.remaining() > 0) buf.get() // pad
        case _ =>
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(sawFmt, "no fmt chunk")
    require(channels > 0, s"bad channel count $channels")
    require(samples != null, "no data chunk")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    (rate, channels, mu, samples)
  }
}

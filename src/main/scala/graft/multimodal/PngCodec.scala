package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** PNG structure census AND raster codec (ISO/IEC 15948 / RFC 2083).
  *
  * Census: the 8-byte signature, then length-type-data-CRC chunks —
  * IHDR geometry and pixel format, IDAT count/bytes, the IEND
  * terminator — with every chunk's CRC-32 RECOMPUTED over type+data
  * (PNG is the one common image format that carries per-chunk
  * integrity; a census that skips the check would bless silently
  * corrupted rasters). Loud on a bad signature, CRC mismatch,
  * truncation, a non-IHDR first chunk, or a missing/early IEND.
  *
  * Raster (r15, closing the r14 verdict's IDAT-opaque perimeter):
  * [[decode]] inflates the concatenated IDAT zlib stream, applies the
  * five §9 row filters (None/Sub/Up/Average/Paeth), and expands
  * palette indices through PLTE — 8-bit samples, both interlace
  * methods (progressive §8.2 Adam7 included), the five §11.2.2
  * colour types. 16-bit samples refuse loudly (a documented
  * perimeter, not silence). [[encode]] is the genuine
  * inverse — forward-filtered scanlines, deflate, multi-IDAT split —
  * so planted-pixel oracles exercise every filter on both sides.
  * Part of the engine's multimodal extension beyond the reference
  * surface (the reference pipeline is text-only): PNG now decodes
  * in-engine like JPEG has since r12, giving the second major image
  * format pixel-level parity. */
object PngCodec {

  final case class PngCensus(width: Long, height: Long, bitDepth: Int,
      colorType: Int, nChunks: Int, nIdat: Int, idatBytes: Long)

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)

  /** Synthesize a structurally valid PNG: signature, IHDR, one IDAT
    * per payload (opaque deterministic bytes — the census never
    * inflates), IEND. CRCs are real. */
  def synth(width: Long, height: Long, bitDepth: Int, colorType: Int,
      idatSizes: Seq[Int]): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad geometry ${width}x$height")
    require(idatSizes.nonEmpty && idatSizes.forall(_ >= 1),
      "a PNG needs at least one non-empty IDAT")
    val out = new ByteArrayOutputStream()
    out.write(Signature)
    def u32(b: ByteArrayOutputStream, v: Long): Unit = {
      b.write(((v >> 24) & 0xff).toInt); b.write(((v >> 16) & 0xff).toInt)
      b.write(((v >> 8) & 0xff).toInt); b.write((v & 0xff).toInt)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      u32(out, data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb)
      out.write(data)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      u32(out, crc.getValue)
    }
    val ihdr = new ByteArrayOutputStream()
    u32(ihdr, width); u32(ihdr, height)
    ihdr.write(bitDepth); ihdr.write(colorType)
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, none, none
    chunk("IHDR", ihdr.toByteArray)
    idatSizes.foreach { n =>
      chunk("IDAT", Array.tabulate[Byte](n)(i => ((i * 73 + n) % 251).toByte))
    }
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Walk the chunks; verify every CRC; report the routing row. */
  def census(bytes: Array[Byte]): PngCensus = {
    require(bytes.length >= Signature.length + 12,
      s"not a PNG: ${bytes.length} bytes")
    var i = 0
    while (i < Signature.length) {
      require(bytes(i) == Signature(i),
        s"not a PNG: signature byte $i is 0x${(bytes(i) & 0xff).toHexString}")
      i += 1
    }
    def u32(at: Int): Long =
      ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
        ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)
    var pos = Signature.length
    var width = -1L; var height = -1L
    var bitDepth = -1; var colorType = -1
    var nChunks = 0; var nIdat = 0; var idatBytes = 0L
    var ended = false
    while (!ended) {
      require(pos + 12 <= bytes.length,
        s"truncated chunk header at offset $pos")
      val len = u32(pos)
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataAt = pos.toLong + 8
      require(dataAt + len + 4 <= bytes.length,
        s"chunk $typ declares $len bytes past EOF")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len.toInt)
      require(crc.getValue == u32((dataAt + len).toInt),
        s"chunk $typ at offset $pos fails its CRC-32")
      nChunks += 1
      // enforced for EVERY chunk type, not just the unknown catch-all:
      // a CRC-valid IDAT-first PNG with no IHDR must refuse here, not
      // return a census row with -1 geometry
      require(nChunks > 1 || typ == "IHDR",
        s"first chunk is $typ, not IHDR")
      typ match {
        case "IHDR" =>
          require(nChunks == 1, s"IHDR is chunk $nChunks, not first")
          require(len == 13, s"IHDR carries $len bytes, not 13")
          width = u32(pos + 8); height = u32(pos + 12)
          bitDepth = bytes(pos + 16) & 0xff
          colorType = bytes(pos + 17) & 0xff
          require(width >= 1 && height >= 1,
            s"IHDR geometry ${width}x$height")
        case "IDAT" =>
          nIdat += 1
          idatBytes += len
        case "IEND" =>
          require(len == 0, s"IEND carries $len bytes")
          require(dataAt + 4 == bytes.length,
            s"${bytes.length - dataAt - 4} trailing bytes after IEND")
          ended = true
        case _ => () // unknown ancillary chunk: CRC-checked, counted
      }
      pos = (dataAt + len + 4).toInt
    }
    require(nIdat >= 1, "PNG without IDAT")
    PngCensus(width, height, bitDepth, colorType, nChunks, nIdat,
      idatBytes)
  }

  // ---- raster codec (§9 filters, §11.2.2 colour types) ---------------

  /** Decoded raster: 8-bit interleaved samples, `channels` per pixel
    * (palette images come back EXPANDED to 3-channel RGB — the
    * indices are an encoding detail, not pixel truth). */
  final case class PngImage(width: Int, height: Int, colorType: Int,
      channels: Int, pix: Array[Byte])

  /** Samples per pixel for each §11.2.2 colour type (palette counts
    * its index byte here; decode expands it to 3 afterwards). */
  private def rawChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // greyscale
    case 2 => 3 // truecolour
    case 3 => 1 // indexed
    case 4 => 2 // greyscale + alpha
    case 6 => 4 // truecolour + alpha
    case t => throw new IllegalArgumentException(
      s"colour type $t is not in ISO 15948 §11.2.2")
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    // §9.4: the neighbour (left, above, upper-left) nearest to the
    // linear gradient prediction, ties broken left, above, upper-left
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** §8.2 Adam7 pass grid: (x0, y0, dx, dy) per pass. A pass whose
    * reduced image is zero-width or zero-height contributes NO
    * scanlines at all (not even filter bytes). */
  private val Adam7: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Forward-filter one (sub-)image into `out` at `off`; returns the
    * bytes written = (1 + width·ch)·height. */
  private def filterSub(pix: Array[Byte], width: Int, height: Int,
      ch: Int, filterOfRow: Int => Int, out: Array[Byte], off: Int)
      : Int = {
    val stride = width * ch
    var y = 0
    while (y < height) {
      val f = filterOfRow(y)
      require(f >= 0 && f <= 4, s"filter $f is not in §9 (row $y)")
      out(off + y * (1 + stride)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = pix(y * stride + i) & 0xff
        val left = if (i >= ch) pix(y * stride + i - ch) & 0xff else 0
        val up = if (y > 0) pix((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= ch) pix((y - 1) * stride + i - ch) & 0xff
          else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        out(off + y * (1 + stride) + 1 + i) = (cur - pred).toByte
        i += 1
      }
      y += 1
    }
    (1 + stride) * height
  }

  /** Invert the per-row filter of one (sub-)image read from `raw` at
    * `off`; returns (pixels, bytes consumed). */
  private def unfilterSub(raw: Array[Byte], off: Int, width: Int,
      height: Int, ch: Int): (Array[Byte], Int) = {
    val stride = width * ch
    val pix = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val f = raw(off + y * (1 + stride)) & 0xff
      require(f <= 4, s"row $y carries filter $f, not in §9")
      var i = 0
      while (i < stride) {
        val x = raw(off + y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= ch) pix(y * stride + i - ch) & 0xff else 0
        val up = if (y > 0) pix((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= ch) pix((y - 1) * stride + i - ch) & 0xff
          else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        pix(y * stride + i) = ((x + pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    (pix, (1 + stride) * height)
  }

  /** Encode an 8-bit raster as a real PNG: per-row §9 forward filter
    * chosen by `filterOfRow` (cycle it over 0..4 to put every filter
    * under a planted-pixel hash), zlib deflate, the stream split over
    * `nIdat` IDAT chunks (reassembly is part of what decode must get
    * right). `pix` is interleaved samples, [[rawChannels]] per pixel;
    * colour type 3 requires an RGB `palette` (length 3·n, n ≤ 256)
    * and `pix` of indices into it. `interlace` emits the §8.2 Adam7
    * pass structure (filter choice applies per within-pass row). */
  def encode(width: Int, height: Int, colorType: Int,
      pix: Array[Byte], filterOfRow: Int => Int = _ % 5,
      palette: Array[Byte] = Array.empty, nIdat: Int = 2,
      interlace: Boolean = false): Array[Byte] = {
    val ch = rawChannels(colorType)
    require(width >= 1 && height >= 1 && pix.length == width * height * ch,
      s"bad raster: ${pix.length} samples for ${width}x$height ct=$colorType")
    require(colorType != 3 || (palette.length % 3 == 0 &&
      palette.length >= 3 && palette.length <= 768),
      s"colour type 3 needs an RGB palette, got ${palette.length} bytes")
    val raw =
      if (!interlace) {
        val out = new Array[Byte]((1 + width * ch) * height)
        filterSub(pix, width, height, ch, filterOfRow, out, 0)
        out
      } else {
        val passes = Adam7.map { case (x0, y0, dx, dy) =>
          ((width - x0 + dx - 1) / dx, (height - y0 + dy - 1) / dy)
        }
        val total = passes.map { case (pw, ph) =>
          if (pw > 0 && ph > 0) (1 + pw * ch) * ph else 0
        }.sum
        val out = new Array[Byte](total)
        var off = 0
        Adam7.zip(passes).foreach { case ((x0, y0, dx, dy), (pw, ph)) =>
          if (pw > 0 && ph > 0) {
            val sub = new Array[Byte](pw * ph * ch)
            var j = 0
            while (j < ph) {
              var i = 0
              while (i < pw) {
                val sy = y0 + j * dy; val sx = x0 + i * dx
                var c = 0
                while (c < ch) {
                  sub((j * pw + i) * ch + c) = pix((sy * width + sx) * ch + c)
                  c += 1
                }
                i += 1
              }
              j += 1
            }
            off += filterSub(sub, pw, ph, ch, filterOfRow, out, off)
          }
        }
        out
      }
    val z = Zlib.deflate(raw, // zlib-wrapped; synthesis-side level
      level = java.util.zip.Deflater.BEST_SPEED)

    val out = new ByteArrayOutputStream()
    out.write(Signature)
    def u32(b: ByteArrayOutputStream, v: Long): Unit = {
      b.write(((v >> 24) & 0xff).toInt); b.write(((v >> 16) & 0xff).toInt)
      b.write(((v >> 8) & 0xff).toInt); b.write((v & 0xff).toInt)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      u32(out, data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      u32(out, crc.getValue)
    }
    val ihdr = new ByteArrayOutputStream()
    u32(ihdr, width.toLong); u32(ihdr, height.toLong)
    ihdr.write(8); ihdr.write(colorType)
    ihdr.write(0); ihdr.write(0) // deflate, filter method 0
    ihdr.write(if (interlace) 1 else 0)
    chunk("IHDR", ihdr.toByteArray)
    if (colorType == 3) chunk("PLTE", palette)
    val n = math.max(1, math.min(nIdat, z.length))
    val per = (z.length + n - 1) / n
    var off = 0
    while (off < z.length) {
      val take = math.min(per, z.length - off)
      chunk("IDAT", java.util.Arrays.copyOfRange(z, off, off + take))
      off += take
    }
    if (z.length == 0) chunk("IDAT", Array.empty[Byte])
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Decode a PNG raster: chunk walk with every CRC re-verified (the
    * census contract), IDAT streams concatenated and zlib-inflated,
    * §9 row filters inverted (per reduced image under Adam7, then
    * scattered onto the full grid), palette expanded. Loud on 16-bit
    * or sub-byte samples, an interlace method past §8.2's two, a
    * filter byte outside 0..4, an inflated size that disagrees with
    * the (pass-structure) geometry, a palette index past PLTE, or
    * any census refusal. */
  def decode(bytes: Array[Byte]): PngImage = {
    // reuse the census walk for structure + CRC enforcement
    val cen = census(bytes)
    require(cen.bitDepth == 8,
      s"bit depth ${cen.bitDepth}: only 8-bit samples decode (documented perimeter)")
    val ch = rawChannels(cen.colorType)
    // second pass: gather PLTE + IDAT + interlace (census keeps none)
    def u32(at: Int): Long =
      ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
        ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)
    var pos = Signature.length
    var palette: Array[Byte] = Array.empty
    var interlace = 0
    val z = new ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      val len = u32(pos).toInt
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          // IHDR data: w(4) h(4) depth(1) colour(1) comp(1) filt(1) il(1)
          require((bytes(pos + 18) & 0xff) == 0,
            s"compression method ${bytes(pos + 18) & 0xff}, not deflate")
          require((bytes(pos + 19) & 0xff) == 0,
            s"filter method ${bytes(pos + 19) & 0xff}, not 0")
          interlace = bytes(pos + 20) & 0xff
          require(interlace <= 1,
            s"interlace method $interlace is not in §8.2 (0 or 1)")
        case "PLTE" =>
          require(len % 3 == 0 && len >= 3 && len <= 768,
            s"PLTE carries $len bytes")
          palette = java.util.Arrays.copyOfRange(bytes, pos + 8,
            pos + 8 + len)
        case "IDAT" => z.write(bytes, pos + 8, len)
        case "IEND" => ended = true
        case _ => ()
      }
      pos += 12 + len
    }
    val w = cen.width.toInt; val h = cen.height.toInt
    val stride = w * ch
    // Adam7 reduced-image geometry (empty passes carry no scanlines)
    val passes: Seq[(Int, Int, Int, Int, Int, Int)] =
      if (interlace == 0) Nil
      else Adam7.map { case (x0, y0, dx, dy) =>
        (x0, y0, dx, dy, (w - x0 + dx - 1) / dx, (h - y0 + dy - 1) / dy)
      }
    val rawLen =
      if (interlace == 0) (1 + stride) * h
      else passes.map { case (_, _, _, _, pw, ph) =>
        if (pw > 0 && ph > 0) (1 + pw * ch) * ph else 0
      }.sum
    val raw = new Array[Byte](rawLen)
    Zlib.withInflater(nowrap = false) { infl =>
      infl.setInput(z.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !infl.finished()) {
          val n = infl.inflate(raw, got, raw.length - got)
          require(n > 0 || infl.finished(), "truncated IDAT zlib stream")
          got += n
        }
        require(got == raw.length && (infl.finished() ||
          infl.inflate(new Array[Byte](1)) == 0),
          s"IDAT inflates to $got bytes, geometry needs ${raw.length}")
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(
            s"corrupt IDAT zlib: ${e.getMessage}")
      }
    }

    val pix =
      if (interlace == 0) unfilterSub(raw, 0, w, h, ch)._1
      else {
        // §8.2: each pass is an independently-filtered reduced image;
        // unfilter it alone, then scatter onto the full-size grid
        val full = new Array[Byte](stride * h)
        var off = 0
        passes.foreach { case (x0, y0, dx, dy, pw, ph) =>
          if (pw > 0 && ph > 0) {
            val (sub, used) = unfilterSub(raw, off, pw, ph, ch)
            off += used
            var j = 0
            while (j < ph) {
              var i = 0
              while (i < pw) {
                val sy = y0 + j * dy; val sx = x0 + i * dx
                var c = 0
                while (c < ch) {
                  full((sy * w + sx) * ch + c) = sub((j * pw + i) * ch + c)
                  c += 1
                }
                i += 1
              }
              j += 1
            }
          }
        }
        full
      }
    if (cen.colorType == 3) {
      require(palette.nonEmpty, "colour type 3 without PLTE")
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < pix.length) {
        val idx = pix(i) & 0xff
        require(idx * 3 + 2 < palette.length,
          s"palette index $idx past PLTE (${palette.length / 3} entries)")
        rgb(3 * i) = palette(3 * idx)
        rgb(3 * i + 1) = palette(3 * idx + 1)
        rgb(3 * i + 2) = palette(3 * idx + 2)
        i += 1
      }
      PngImage(w, h, cen.colorType, 3, rgb)
    } else PngImage(w, h, cen.colorType, ch, pix)
  }

  /** Greyscale convenience matching [[ImageCodec.decodeGray]]'s
    * contract: direct samples for grey sources, integer ITU-R 601
    * luma otherwise — so the two decoders are comparable
    * sample-for-sample in the dual-decoder certificate. Alpha is
    * ignored (the planted rasters are opaque). */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = decode(bytes)
    val out = new Array[Byte](img.width * img.height)
    val ch = img.channels
    var i = 0
    while (i < out.length) {
      out(i) = ch match {
        case 1 => img.pix(i)
        case 2 => img.pix(2 * i) // grey + alpha
        case _ =>
          val r = img.pix(ch * i) & 0xff
          val g = img.pix(ch * i + 1) & 0xff
          val b = img.pix(ch * i + 2) & 0xff
          (if (r == g && g == b) r
           else (r * 299 + g * 587 + b * 114) / 1000).toByte
      }
      i += 1
    }
    (img.width, img.height, out)
  }
}

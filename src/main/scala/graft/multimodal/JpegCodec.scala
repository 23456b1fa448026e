package graft.multimodal

import java.io.ByteArrayOutputStream

/** Hand-rolled baseline JPEG (ITU-T T.81 / ISO 10918-1) — the compressed
  * half of the image perimeter, in-engine with zero dependencies and no
  * egress. The reference ingests JPEG payloads via PyMuPDF
  * (`pdf_spider.py:42-50`); here the codec itself is part of the engine so
  * the decode path is certifiable under the driver hash like the lossless
  * trio (PNG/BMP via ImageCodec, WAV PCM16, DIB AVI).
  *
  * What makes a LOSSY codec oracle-checkable: baseline JPEG is exact on
  * its block-constant subspace. A block whose 64 samples share one value v
  * forward-DCTs to a single DC coefficient 8·(v−128) (the 63 AC cosine
  * sums cancel identically; in double arithmetic they land within 1e-12 of
  * zero and round to 0), survives an all-ones quantization table verbatim,
  * and inverse-DCTs back to exactly v. Driver fixtures are built in that
  * subspace (one 8×8 block per source byte), so every integer checksum
  * oracle holds bit-for-bit through real Huffman entropy coding, real
  * marker structure, and a real DCT — while arbitrary images take the
  * ordinary lossy path, cross-validated against the JDK's independent
  * libjpeg-derived decoder in JpegCodecSpec.
  *
  * Encoder: baseline sequential, single 8-bit grayscale component,
  * all-ones luminance qtable (quality-100 form), Annex-K-style Huffman
  * tables written into the stream (DHT), optional restart markers.
  * Decoder: baseline + extended-sequential Huffman (SOF0/SOF1, 8-bit),
  * 1- or 3-component, arbitrary sampling factors (4:4:4/4:2:2/4:2:0/…),
  * tables taken from the stream (Annex-K defaults when a broken-but-real
  * MJPG-style stream omits DHT), DRI/RSTn, multi-scan non-interleaved
  * component order. Outside the perimeter — progressive (SOF2),
  * arithmetic coding (SOF9-11), hierarchical, lossless, 12-bit precision,
  * 4-component CMYK — the decoder refuses LOUDLY with the marker name,
  * the same stance as PdfCodec's filter set. */
object JpegCodec {

  // natural-order index of each zigzag position (T.81 Figure A.6)
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Canonical Huffman spec = (code counts per length 1..16, symbol list).
  // These are the published Annex K luminance tables; correctness does not
  // depend on matching K.3/K.5 byte-for-byte because the encoder WRITES
  // the same spec into DHT that it codes with — any canonical table is
  // self-consistent — but using the standard ones keeps the streams
  // ordinary for foreign decoders (ImageIO reads them in the spec).
  private val DcLumBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals: Array[Int] = (0 to 11).toArray
  private val AcLumBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  // Annex K chrominance tables — only needed for the table-less MJPG
  // fallback; the encoder is grayscale and never writes them.
  private val DcChrBits: Array[Int] =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals: Array[Int] = (0 to 11).toArray
  private val AcChrBits: Array[Int] =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // cos((2x+1)·u·π/16) — shared by FDCT and IDCT (separable double form;
  // exact-to-rounding on the DC-only subspace, standard float precision
  // elsewhere — the cross-decoder tolerance in JpegCodecSpec bounds it)
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val C0 = 1.0 / math.sqrt(2.0)

  // ---------------------------------------------------------------- encode

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** pad with 1-bits to a byte boundary (T.81 F.1.2.3). */
    def flush(): Unit = if (nbits > 0) {
      put(0xff, 8 - nbits)
    }
  }

  private def buildEncTable(bits: Array[Int], vals: Array[Int])
      : (Array[Int], Array[Int]) = {
    val codes = new Array[Int](256)
    val sizes = new Array[Int](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        codes(vals(k)) = code
        sizes(vals(k)) = len
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    (codes, sizes)
  }

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(
    if (v < 0) -v else v) // 0 for v == 0

  /** Encode an 8-bit grayscale image as baseline JPEG with an all-ones
    * quantization table (the quality-100 form whose block-constant
    * subspace round-trips exactly). `restartInterval` > 0 writes DRI and
    * emits RSTn every that-many MCUs — the structure MJPG streams lean
    * on. Edge blocks replicate the last row/column (the standard pad). */
  def encodeGray(w: Int, h: Int, pix: Array[Byte],
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535 &&
      pix.length == w * h,
      s"bad dimensions ${w}x$h for ${pix.length} pixels")
    val out = new ByteArrayOutputStream(pix.length / 2 + 1024)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    // APP0 JFIF 1.1, no thumbnail
    marker(0xe0); u16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0, 8-bit, all ones
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00)
    var i = 0
    while (i < 64) { out.write(1); i += 1 }
    // SOF0: 8-bit, 1 component, sampling 1x1, qtable 0
    marker(0xc0); u16(8 + 3); out.write(8); u16(h); u16(w)
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    // DHT: DC table 0 + AC table 0
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write((cls << 4) | id)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, 0, DcLumBits, DcLumVals)
    dht(1, 0, AcLumBits, AcLumVals)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    // SOS: 1 component, DC/AC table 0, full spectral band
    marker(0xda); u16(6 + 2); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)

    val (dcCodes, dcSizes) = buildEncTable(DcLumBits, DcLumVals)
    val (acCodes, acSizes) = buildEncTable(AcLumBits, AcLumVals)
    val bw = new BitWriter(out)
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    val coef = new Array[Int](64)
    val samples = new Array[Double](64)
    var pred = 0
    var mcu = 0
    var rstIdx = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) & 7
          pred = 0
        }
        // gather block with edge replication, level-shifted
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, h - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, w - 1)
            samples(y * 8 + x) = (pix(sy * w + sx) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        // forward DCT (separable would be faster; the direct form keeps
        // the block-constant cancellation argument transparent and the
        // encode sits on fixture-sized inputs, not the 100 TB hot path)
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                s += samples(yy * 8 + xx) * Cos(xx)(v) * Cos(yy)(u)
                xx += 1
              }
              yy += 1
            }
            val cu = if (u == 0) C0 else 1.0
            val cv = if (v == 0) C0 else 1.0
            var q = math.round(0.25 * cu * cv * s).toInt
            // the standard AC Huffman alphabet tops out at category 10;
            // |AC| can graze 1024 only on sign-matched checkerboards at
            // full amplitude — clamp that corner rather than emit an
            // uncodeable symbol (DC category 11 is in-alphabet, untouched)
            if ((u | v) != 0) {
              if (q > 1023) q = 1023 else if (q < -1023) q = -1023
            }
            coef(u * 8 + v) = q // natural order; the emit loop zigzags
            v += 1
          }
          u += 1
        }
        // entropy-code: DC diff then AC run-lengths, reading in zigzag
        val dc = coef(0)
        val diff = dc - pred
        pred = dc
        val s0 = category(diff)
        bw.put(dcCodes(s0), dcSizes(s0))
        if (s0 > 0)
          bw.put(if (diff >= 0) diff else diff + (1 << s0) - 1, s0)
        var run = 0
        var k = 1
        while (k < 64) {
          val ac = coef(Zigzag(k))
          if (ac == 0) run += 1
          else {
            while (run > 15) { bw.put(acCodes(0xf0), acSizes(0xf0)); run -= 16 }
            val sz = category(ac)
            val sym = (run << 4) | sz
            bw.put(acCodes(sym), acSizes(sym))
            bw.put(if (ac >= 0) ac else ac + (1 << sz) - 1, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(acCodes(0x00), acSizes(0x00)) // EOB
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical decode via per-length (mincode, maxcode, valptr) — T.81 F.16
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1)
          k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
      require(k == vals.length, s"DHT counts $k != ${vals.length} symbols")
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var len = 1
      while (maxCode(len) < code || bits(len - 1) == 0) {
        len += 1
        require(len <= 16, "corrupt entropy stream: no Huffman code matched")
        code = (code << 1) | br.bit()
      }
      vals(valPtr(len) + code - minCode(len))
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0

    def bit(): Int = {
      if (nbits == 0) {
        require(pos < data.length, "truncated JPEG: entropy data ends early")
        val b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < data.length, "truncated JPEG: dangling 0xFF")
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte: literal 0xFF
          else throw new IllegalArgumentException(
            f"corrupt entropy stream: read into marker 0xFF$m%02X")
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** byte-align (dropping the 1-padding) and consume an expected RSTn;
      * loud otherwise. */
    def restart(): Unit = {
      nbits = 0
      require(pos + 1 < data.length && (data(pos) & 0xff) == 0xff,
        "corrupt scan: expected restart marker")
      val m = data(pos + 1) & 0xff
      require(m >= 0xd0 && m <= 0xd7,
        f"corrupt scan: expected RSTn, found 0xFF$m%02X")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: HuffTable = _
    var acTab: HuffTable = _
    var pred: Int = 0
    var plane: Array[Int] = _ // blocksPerLine*8 x blocksPerCol*8 samples
    var blocksPerLine: Int = 0
    var blocksPerCol: Int = 0
  }

  private final class Decoded(val w: Int, val h: Int,
      val comps: Array[Component], val hMax: Int, val vMax: Int)

  /** Full marker walk + entropy decode; shared by the public surfaces.
    * An index past the buffer (truncated segment/scan) surfaces as the
    * same loud IllegalArgumentException as every other perimeter hit. */
  private def decodeInternal(bytes: Array[Byte]): Decoded =
    try decodeInternal0(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          "truncated JPEG: segment or scan runs past the buffer")
    }

  private def decodeInternal0(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG: missing SOI")
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var sawDht = false
    var restartInterval = 0
    var frame: Decoded = null
    var compsDone = 0

    def u16(): Int = {
      val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
      pos += 2
      v
    }

    def refuse(sof: Int): Nothing = {
      val kind = sof match {
        case 0xc2 | 0xc6 | 0xca | 0xce => "progressive"
        case 0xc3 | 0xc7 | 0xcb | 0xcf => "lossless"
        case 0xc5 | 0xc9 | 0xcd => "differential sequential"
        case _ => f"SOF 0x$sof%02X"
      }
      val arith = if (sof >= 0xc9) " (arithmetic-coded)" else ""
      throw new IllegalArgumentException(
        s"$kind$arith JPEG is outside the decode perimeter " +
          "(baseline/extended-sequential Huffman only)")
    }

    def readSof(sof: Int): Unit = {
      require(frame == null, "multiple SOF markers")
      val segLen = u16()
      val end = pos + segLen - 2
      val prec = bytes(pos) & 0xff; pos += 1
      require(prec == 8,
        s"$prec-bit sample precision is outside the decode perimeter")
      val h = u16(); val w = u16()
      require(w > 0 && h > 0, s"bad frame geometry ${w}x$h")
      // decompression-bomb guard: a 16-byte hostile header can declare
      // 65535x65535 (17 GB of planes); cap total pixels rather than
      // letting the allocator be the error message
      require(w.toLong * h <= (1L << 26),
        s"frame ${w}x$h exceeds the 64-megapixel decode guard")
      val n = bytes(pos) & 0xff; pos += 1
      require(n == 1 || n == 3,
        s"$n-component JPEG (CMYK/unknown) is outside the decode perimeter")
      if (sof != 0xc0 && sof != 0xc1) refuse(sof)
      val comps = Array.tabulate(n) { _ =>
        val id = bytes(pos) & 0xff
        val hv = bytes(pos + 1) & 0xff
        val tq = bytes(pos + 2) & 0xff
        pos += 3
        val c = Component(id, (hv >> 4) & 0xf, hv & 0xf, tq)
        require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
          s"bad sampling factors ${c.h}x${c.v}")
        c
      }
      require(pos == end, "malformed SOF segment length")
      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
      comps.foreach { c =>
        c.blocksPerLine = mcusX * c.h
        c.blocksPerCol = mcusY * c.v
        c.plane = new Array[Int](c.blocksPerLine * 8 * c.blocksPerCol * 8)
      }
      frame = new Decoded(w, h, comps, hMax, vMax)
    }

    val coef = new Array[Int](64)
    val blk = new Array[Int](64)

    def decodeBlock(br: BitReader, c: Component, bx: Int, by: Int): Unit = {
      java.util.Arrays.fill(coef, 0)
      val q = qt(c.tq)
      require(q != null, s"scan references undefined qtable ${c.tq}")
      val s = c.dcTab.decode(br)
      require(s <= 11, s"corrupt DC category $s")
      c.pred += extend(br.receive(s), s)
      coef(0) = c.pred * q(0)
      var anyAc = false
      var k = 1
      while (k < 64) {
        val rs = c.acTab.decode(br)
        val run = rs >> 4
        val sz = rs & 0xf
        if (sz == 0) {
          if (run == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += run
          require(k < 64, "corrupt entropy stream: AC index past 63")
          coef(Zigzag(k)) = extend(br.receive(sz), sz) * q(k)
          anyAc = true
          k += 1
        }
      }
      // IDCT — DC-only blocks (every block of the oracle fixtures, most
      // blocks of smooth images) reconstruct to the constant ≈DC/8.
      // The expression mirrors the full pass's operation order
      // (0.25·(C0·(C0·DC))) so half-integer rounding lands on the SAME
      // side — C0² is not exactly 0.5 in doubles, and a plain DC/8 would
      // diverge by 1 on DC ≡ 4 (mod 8)
      if (anyAc) idct(coef, blk)
      else java.util.Arrays.fill(blk,
        math.round(0.25 * (C0 * (C0 * coef(0).toDouble))).toInt)
      val stride = c.blocksPerLine * 8
      val ox = bx * 8
      val oy = by * 8
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var v = blk(y * 8 + x) + 128
          if (v < 0) v = 0 else if (v > 255) v = 255
          c.plane((oy + y) * stride + ox + x) = v
          x += 1
        }
        y += 1
      }
    }

    def decodeScan(): Unit = {
      val segLen = u16()
      val end = pos + segLen - 2
      val ns = bytes(pos) & 0xff; pos += 1
      require(frame != null, "SOS before SOF")
      val scanComps = Array.tabulate(ns) { _ =>
        val cs = bytes(pos) & 0xff
        val tt = bytes(pos + 1) & 0xff
        pos += 2
        val c = frame.comps.find(_.id == cs).getOrElse(
          throw new IllegalArgumentException(
            s"scan selects unknown component $cs"))
        if (!sawDht && dcTabs((tt >> 4) & 0xf) == null) {
          // real-world MJPG streams omit DHT and lean on the Annex K
          // defaults (the motion-JPEG convention) — install them
          dcTabs(0) = new HuffTable(DcLumBits, DcLumVals)
          acTabs(0) = new HuffTable(AcLumBits, AcLumVals)
          dcTabs(1) = new HuffTable(DcChrBits, DcChrVals)
          acTabs(1) = new HuffTable(AcChrBits, AcChrVals)
        }
        c.dcTab = dcTabs((tt >> 4) & 0xf)
        c.acTab = acTabs(tt & 0xf)
        require(c.dcTab != null && c.acTab != null,
          s"scan references undefined Huffman table $tt")
        c
      }
      val ss = bytes(pos) & 0xff
      val se = bytes(pos + 1) & 0xff
      val ahal = bytes(pos + 2) & 0xff
      pos += 3
      require(ss == 0 && se == 63 && ahal == 0,
        s"spectral selection $ss..$se/$ahal: progressive scan parameters " +
          "are outside the decode perimeter")
      require(pos == end, "malformed SOS header length")
      scanComps.foreach(_.pred = 0)
      val br = new BitReader(bytes, pos)
      var mcu = 0
      if (ns == 1) {
        // non-interleaved: MCU = one block of the selected component
        val c = scanComps(0)
        // ceil over the REAL component size, not the MCU-padded plane
        val bw = (frame.w * c.h + 8 * frame.hMax - 1) / (8 * frame.hMax)
        val bh = (frame.h * c.v + 8 * frame.vMax - 1) / (8 * frame.vMax)
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            if (restartInterval > 0 && mcu > 0 &&
              mcu % restartInterval == 0) {
              br.restart(); c.pred = 0
            }
            decodeBlock(br, c, bx, by)
            mcu += 1
            bx += 1
          }
          by += 1
        }
      } else {
        val mcusX = frame.comps(0).blocksPerLine / frame.comps(0).h
        val mcusY = frame.comps(0).blocksPerCol / frame.comps(0).v
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            if (restartInterval > 0 && mcu > 0 &&
              mcu % restartInterval == 0) {
              br.restart(); scanComps.foreach(_.pred = 0)
            }
            scanComps.foreach { c =>
              var v = 0
              while (v < c.v) {
                var hh = 0
                while (hh < c.h) {
                  decodeBlock(br, c, mx * c.h + hh, my * c.v + v)
                  hh += 1
                }
                v += 1
              }
            }
            mcu += 1
            mx += 1
          }
          my += 1
        }
      }
      compsDone += ns
      // resync: br.pos sits just past the last entropy byte it touched
      // (any residual padding bits were inside that byte); the next bytes
      // are markers, which the main loop resumes parsing
      pos = br.pos
    }

    var done = false
    while (!done) {
      require(pos + 1 < bytes.length, "truncated JPEG: no EOI")
      require((bytes(pos) & 0xff) == 0xff,
        f"marker sync lost at offset $pos (byte 0x${bytes(pos) & 0xff}%02X)")
      var m = bytes(pos + 1) & 0xff
      pos += 2
      while (m == 0xff) { // fill bytes before a marker are legal
        require(pos < bytes.length, "truncated JPEG: trailing fill bytes")
        m = bytes(pos) & 0xff
        pos += 1
      }
      m match {
        case 0xd8 => // stray SOI — tolerate
        case 0xd9 => done = true // EOI
        case 0x01 => // TEM, standalone
        case r if r >= 0xd0 && r <= 0xd7 => // stray RSTn between scans
        case 0xdb =>
          val segLen = u16()
      val end = pos + segLen - 2
          while (pos < end) {
            val pqTq = bytes(pos) & 0xff; pos += 1
            val prec = (pqTq >> 4) & 0xf
            val id = pqTq & 0xf
            require(prec <= 1, s"bad DQT precision $prec")
            val tbl = new Array[Int](64)
            var i = 0
            while (i < 64) {
              tbl(i) = if (prec == 0) { val v = bytes(pos) & 0xff; pos += 1; v }
              else { val v = u16(); v }
              i += 1
            }
            qt(id) = tbl // zigzag order, matching coefficient read order
          }
        case 0xc4 =>
          sawDht = true
          val segLen = u16()
      val end = pos + segLen - 2
          while (pos < end) {
            val tcTh = bytes(pos) & 0xff; pos += 1
            val cls = (tcTh >> 4) & 0xf
            val id = tcTh & 0xf
            require(cls <= 1 && id <= 3, s"bad DHT class/id $tcTh")
            val bits = Array.tabulate(16) { i => bytes(pos + i) & 0xff }
            pos += 16
            val nv = bits.sum
            val vals = Array.tabulate(nv) { i => bytes(pos + i) & 0xff }
            pos += nv
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTabs(id) = t else acTabs(id) = t
          }
        case 0xdd =>
          val len = u16()
          require(len == 4, s"bad DRI length $len")
          restartInterval = u16()
        case 0xc0 | 0xc1 => readSof(m)
        case sof if (sof >= 0xc2 && sof <= 0xcf) && sof != 0xc4 &&
          sof != 0xc8 && sof != 0xcc => refuse(sof)
        case 0xcc =>
          throw new IllegalArgumentException(
            "arithmetic-coded JPEG (DAC) is outside the decode perimeter")
        case 0xda => decodeScan()
        case app if app >= 0xe0 && app <= 0xef =>
          val segLen = u16()
          pos += segLen - 2
        case 0xfe => // COM
          val segLen = u16()
          pos += segLen - 2
        case other =>
          throw new IllegalArgumentException(
            f"unsupported JPEG marker 0xFF$other%02X")
      }
    }
    require(frame != null, "no SOF frame header before EOI")
    require(compsDone >= frame.comps.length,
      s"only $compsDone of ${frame.comps.length} components scanned")
    frame
  }

  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    // separable: columns first (tmp = Cᵀ·F), then rows (out = tmp·C)
    val tmp = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) C0 else 1.0
          s += cu * coef(u * 8 + x) * Cos(y)(u)
          u += 1
        }
        tmp(y * 8 + x) = s
        y += 1
      }
      x += 1
    }
    var y2 = 0
    while (y2 < 8) {
      var x2 = 0
      while (x2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) C0 else 1.0
          s += cv * tmp(y2 * 8 + v) * Cos(x2)(v)
          v += 1
        }
        out(y2 * 8 + x2) = math.round(0.25 * s).toInt
        x2 += 1
      }
      y2 += 1
    }
  }

  /** Decode to (width, height, row-major 8-bit gray). 1-component frames
    * return Y directly; 3-component frames color-convert and take exact
    * gray where R==G==B, integer ITU-R 601 luma otherwise — the same
    * contract as ImageCodec.decodeGray so the two decoders are
    * cross-checkable sample-for-sample. */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val d = decodeInternal(bytes)
    val out = new Array[Byte](d.w * d.h)
    if (d.comps.length == 1) {
      val c = d.comps(0)
      val stride = c.blocksPerLine * 8
      var y = 0
      while (y < d.h) {
        var x = 0
        while (x < d.w) {
          out(y * d.w + x) = c.plane(y * stride + x).toByte
          x += 1
        }
        y += 1
      }
    } else {
      val rgb = toRgb(d)
      var i = 0
      var p = 0
      while (i < out.length) {
        val r = rgb(p) & 0xff
        val g = rgb(p + 1) & 0xff
        val b = rgb(p + 2) & 0xff
        out(i) = (if (r == g && g == b) r
                  else (r * 299 + g * 587 + b * 114) / 1000).toByte
        i += 1
        p += 3
      }
    }
    (d.w, d.h, out)
  }

  /** Decode to (width, height, row-major interleaved RGB bytes). */
  def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val d = decodeInternal(bytes)
    if (d.comps.length == 1) {
      val c = d.comps(0)
      val stride = c.blocksPerLine * 8
      val out = new Array[Byte](3 * d.w * d.h)
      var y = 0
      while (y < d.h) {
        var x = 0
        while (x < d.w) {
          val v = c.plane(y * stride + x).toByte
          val p = 3 * (y * d.w + x)
          out(p) = v; out(p + 1) = v; out(p + 2) = v
          x += 1
        }
        y += 1
      }
      (d.w, d.h, out)
    } else (d.w, d.h, toRgb(d))
  }

  /** JFIF full-range YCbCr → RGB with nearest-neighbour chroma upsample
    * (replication — the cross-decoder tolerance in the spec absorbs the
    * difference vs libjpeg's triangular filter). */
  private def toRgb(d: Decoded): Array[Byte] = {
    val out = new Array[Byte](3 * d.w * d.h)
    val cy = d.comps(0); val cb = d.comps(1); val cr = d.comps(2)
    val sy = cy.blocksPerLine * 8
    val sb = cb.blocksPerLine * 8
    val sr = cr.blocksPerLine * 8
    var y = 0
    while (y < d.h) {
      var x = 0
      while (x < d.w) {
        val yy = cy.plane((y * cy.v / d.vMax) * sy + (x * cy.h / d.hMax))
        val b0 = cb.plane((y * cb.v / d.vMax) * sb + (x * cb.h / d.hMax)) - 128
        val r0 = cr.plane((y * cr.v / d.vMax) * sr + (x * cr.h / d.hMax)) - 128
        var r = yy + ((91881 * r0) >> 16)
        var g = yy - ((22554 * b0 + 46802 * r0) >> 16)
        var b = yy + ((116130 * b0) >> 16)
        if (r < 0) r = 0 else if (r > 255) r = 255
        if (g < 0) g = 0 else if (g > 255) g = 255
        if (b < 0) b = 0 else if (b > 255) b = 255
        val p = 3 * (y * d.w + x)
        out(p) = r.toByte; out(p + 1) = g.toByte; out(p + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    out
  }
}

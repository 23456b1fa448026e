package graft.multimodal

import java.io.ByteArrayOutputStream

/** EXIF metadata (APP1 "Exif" segment, TIFF-structured IFDs — the
  * published EXIF 2.x / TIFF 6.0 layout) plus orientation
  * normalization — the image-metadata half of what a photo corpus
  * pipeline extracts before anything else touches pixels. Orientation
  * handling in particular is the classic silent-corruption gotcha: a
  * pipeline that ignores tag 0x0112 trains on sideways images.
  *
  * parse() walks the JPEG marker stream to the first APP1 whose payload
  * starts "Exif\0\0", then reads IFD0 in EITHER byte order (II/MM),
  * extracting the four tags a curation pass consumes: Make (0x010F),
  * Model (0x0110), Orientation (0x0112), DateTime (0x0132).
  * Bounds-violating offsets, a bad order mark, or a wrong TIFF magic
  * refuse loudly; a JPEG without EXIF returns None (absence is not an
  * error). applyOrientation() is the exact pixel remap for all eight
  * published orientation values. Per-row executor work, the usual
  * codec envelope. */
object ExifCodec {

  final case class Exif(bigEndian: Boolean, make: Option[String],
      model: Option[String], orientation: Option[Int],
      dateTime: Option[String])

  private val TagMake = 0x010f
  private val TagModel = 0x0110
  private val TagOrientation = 0x0112
  private val TagDateTime = 0x0132

  /** Build an APP1 Exif payload (marker body, without the FFE1/length
    * prefix): Exif header + TIFF (chosen byte order) + IFD0 with the
    * four tags, ASCII values in a data area after the IFD. */
  def encodeApp1(make: String, model: String, orientation: Int,
      dateTime: String, bigEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8,
      s"orientation $orientation outside 1..8")
    val out = new ByteArrayOutputStream()
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    val tiffStart = out.size()
    def u16(v: Int): Unit =
      if (bigEndian) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit =
      if (bigEndian) { u16((v >> 16) & 0xffff); u16(v & 0xffff) }
      else { u16(v & 0xffff); u16((v >> 16) & 0xffff) }
    out.write(if (bigEndian) 'M' else 'I')
    out.write(if (bigEndian) 'M' else 'I')
    u16(42)
    u32(8) // IFD0 right after the header
    // IFD0: 4 entries sorted by tag, then next-IFD = 0, then data area.
    // TIFF ASCII values are NUL-terminated; count includes the NUL.
    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val modelB = (model + "\u0000").getBytes("US-ASCII")
    val dtB = (dateTime + "\u0000").getBytes("US-ASCII")
    val ifdBytes = 2 + 4 * 12 + 4
    var dataOff = 8 + ifdBytes // relative to TIFF start
    u16(4)
    def asciiEntry(tag: Int, v: Array[Byte]): Unit = {
      u16(tag); u16(2); u32(v.length)
      if (v.length <= 4) {
        var i = 0
        while (i < 4) { out.write(if (i < v.length) v(i) else 0); i += 1 }
      } else { u32(dataOff); dataOff += v.length }
    }
    asciiEntry(TagMake, makeB)
    asciiEntry(TagModel, modelB)
    u16(TagOrientation); u16(3); u32(1)
    // a SHORT value occupies the first two bytes of the value field in
    // the file's byte order; the remaining two bytes are zero
    u16(orientation); u16(0)
    asciiEntry(TagDateTime, dtB)
    u32(0) // no IFD1
    if (makeB.length > 4) out.write(makeB)
    if (modelB.length > 4) out.write(modelB)
    if (dtB.length > 4) out.write(dtB)
    // inline (≤4-byte) values never advance dataOff, so the final size
    // must land exactly on the declared layout either way
    require(out.size() - tiffStart == dataOff,
      "EXIF data-area layout drifted from the declared offsets")
    out.toByteArray
  }

  /** Splice an APP1 payload into a JPEG right after SOI (the position
    * EXIF requires). */
  def insertApp1(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    require(app1.length + 2 <= 0xffff, "APP1 payload too large")
    val out = new ByteArrayOutputStream(jpeg.length + app1.length + 4)
    out.write(0xff); out.write(0xd8)
    out.write(0xff); out.write(0xe1)
    val len = app1.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(app1)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /** Extract EXIF from a JPEG: None when no Exif APP1 exists; loud on a
    * structurally broken one (truncated IFD, bad magic, out-of-bounds
    * value offset — a quiet misparse mislabels a corpus invisibly). */
  def parse(jpeg: Array[Byte]): Option[Exif] =
    try parse0(jpeg)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          "truncated EXIF segment: IFD or value runs past the buffer")
    }

  private def parse0(jpeg: Array[Byte]): Option[Exif] = {
    require(jpeg.length >= 4 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG: missing SOI")
    var pos = 2
    var payload: Array[Byte] = null
    var done = false
    while (!done && payload == null && pos + 4 <= jpeg.length) {
      require((jpeg(pos) & 0xff) == 0xff,
        f"marker sync lost at offset $pos")
      var m = jpeg(pos + 1) & 0xff
      pos += 2
      while (m == 0xff) { // fill bytes before a marker are legal
        require(pos < jpeg.length, "truncated JPEG: trailing fill bytes")
        m = jpeg(pos) & 0xff
        pos += 1
      }
      if (m == 0xd9 || m == 0xda) done = true // EOI or scan: no EXIF
      else if ((m >= 0xd0 && m <= 0xd8) || m == 0x01) () // standalone
      else {
        val len = ((jpeg(pos) & 0xff) << 8) | (jpeg(pos + 1) & 0xff)
        require(len >= 2 && pos + len <= jpeg.length,
          s"truncated segment at offset $pos")
        if (m == 0xe1 && len >= 8 &&
          jpeg(pos + 2) == 'E' && jpeg(pos + 3) == 'x' &&
          jpeg(pos + 4) == 'i' && jpeg(pos + 5) == 'f' &&
          jpeg(pos + 6) == 0 && jpeg(pos + 7) == 0) {
          payload = java.util.Arrays.copyOfRange(jpeg, pos + 8, pos + len)
        }
        pos += len
      }
    }
    if (payload == null) return None
    val t = payload
    require(t.length >= 8, "EXIF TIFF header truncated")
    val big = (t(0), t(1)) match {
      case ('M', 'M') => true
      case ('I', 'I') => false
      case _ => throw new IllegalArgumentException(
        f"bad TIFF byte-order mark 0x${t(0) & 0xff}%02x${t(1) & 0xff}%02x")
    }
    def u16(at: Int): Int =
      if (big) ((t(at) & 0xff) << 8) | (t(at + 1) & 0xff)
      else ((t(at + 1) & 0xff) << 8) | (t(at) & 0xff)
    def u32(at: Int): Int =
      if (big) (u16(at) << 16) | u16(at + 2)
      else (u16(at + 2) << 16) | u16(at)
    require(u16(2) == 42, s"bad TIFF magic ${u16(2)}")
    val ifd = u32(4)
    require(ifd >= 8 && ifd + 2 <= t.length, s"IFD0 offset $ifd out of range")
    val n = u16(ifd)
    require(ifd + 2 + 12 * n + 4 <= t.length,
      s"IFD0 declares $n entries past the buffer")
    var make: Option[String] = None
    var model: Option[String] = None
    var orient: Option[Int] = None
    var dt: Option[String] = None
    def ascii(count: Int, valAt: Int): String = {
      val start = if (count <= 4) valAt else u32(valAt)
      require(start >= 0 && start + count <= t.length,
        s"ASCII value at $start+$count out of range")
      // trailing NUL terminator per TIFF; tolerate its absence
      val end = if (count > 0 && t(start + count - 1) == 0) count - 1
      else count
      new String(t, start, end, "US-ASCII")
    }
    var i = 0
    while (i < n) {
      val e = ifd + 2 + 12 * i
      val tag = u16(e)
      val typ = u16(e + 2)
      val count = u32(e + 4)
      tag match {
        case TagOrientation =>
          require(typ == 3 && count == 1,
            s"orientation entry has type $typ count $count")
          val v = u16(e + 8)
          require(v >= 1 && v <= 8, s"orientation value $v outside 1..8")
          orient = Some(v)
        case TagMake if typ == 2 => make = Some(ascii(count, e + 8))
        case TagModel if typ == 2 => model = Some(ascii(count, e + 8))
        case TagDateTime if typ == 2 => dt = Some(ascii(count, e + 8))
        case _ => () // unknown tags are legal; skip
      }
      i += 1
    }
    Some(Exif(big, make, model, orient, dt))
  }

  /** Apply an EXIF orientation (the transform that makes the stored
    * pixels display upright) to a row-major gray image. Exact integer
    * remap; returns (newW, newH, pixels). */
  def applyOrientation(w: Int, h: Int, pix: Array[Byte], o: Int)
      : (Int, Int, Array[Byte]) = {
    require(o >= 1 && o <= 8, s"orientation $o outside 1..8")
    require(pix.length == w * h, s"${pix.length} pixels for ${w}x$h")
    if (o == 1) return (w, h, pix)
    val swap = o >= 5
    val w2 = if (swap) h else w
    val h2 = if (swap) w else h
    val out = new Array[Byte](pix.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (x2, y2) = o match {
          case 2 => (w - 1 - x, y) // mirror horizontal
          case 3 => (w - 1 - x, h - 1 - y) // rotate 180
          case 4 => (x, h - 1 - y) // mirror vertical
          case 5 => (y, x) // transpose
          case 6 => (h - 1 - y, x) // rotate 90 CW
          case 7 => (h - 1 - y, w - 1 - x) // transverse
          case _ => (y, w - 1 - x) // 8: rotate 90 CCW
        }
        out(y2 * w2 + x2) = pix(y * w + x)
        x += 1
      }
      y += 1
    }
    (w2, h2, out)
  }
}

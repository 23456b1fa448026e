package graft

import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import java.awt.image.BufferedImage

import graft.multimodal.{ImageCodec, JpegCodec}

/** The hand-rolled baseline JPEG codec, certified three independent ways:
  * (1) exactness on the block-constant subspace (the mathematical property
  * the driver oracles lean on), (2) the JDK's libjpeg-derived decoder
  * reading OUR streams bit-exactly on that subspace (foreign decoder
  * accepts our entropy coding, markers, tables), (3) our decoder reading
  * ImageIO-encoded streams within the standard cross-IDCT tolerance
  * (gray and 4:2:0 color, the two mainstream shapes). Plus the loud
  * perimeter: progressive refuses by name, truncation refuses. */
class JpegCodecSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** image whose 8×8 blocks are constant: block j == bytes(j) — the
    * exact-roundtrip subspace, laid out blocksX wide. */
  private def blockConstant(bytes: Array[Byte], blocksX: Int)
      : (Int, Int, Array[Byte]) = {
    val blocksY = (bytes.length + blocksX - 1) / blocksX
    val w = blocksX * 8
    val h = blocksY * 8
    val pix = new Array[Byte](w * h)
    for (j <- bytes.indices; y <- 0 until 8; x <- 0 until 8) {
      val bx = j % blocksX
      val by = j / blocksX
      pix((by * 8 + y) * w + bx * 8 + x) = bytes(j)
    }
    (w, h, pix)
  }

  private val all256 = Array.tabulate[Byte](256)(i => i.toByte)

  test("block-constant images roundtrip EXACTLY (all 256 values)") {
    val (w, h, pix) = blockConstant(all256, 16)
    val enc = JpegCodec.encodeGray(w, h, pix)
    assert((enc(0) & 0xff) == 0xff && (enc(1) & 0xff) == 0xd8, "SOI")
    assert((enc(enc.length - 2) & 0xff) == 0xff &&
      (enc(enc.length - 1) & 0xff) == 0xd9, "EOI")
    val (dw, dh, out) = JpegCodec.decodeGray(enc)
    assert((dw, dh) == (w, h))
    assert(out.toSeq == pix.toSeq)
  }

  test("ImageIO (independent libjpeg lineage) decodes our stream exactly") {
    val (w, h, pix) = blockConstant(all256, 8)
    val enc = JpegCodec.encodeGray(w, h, pix)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img != null, "ImageIO rejected our stream")
    assert((img.getWidth, img.getHeight) == (w, h))
    val samples = img.getRaster.getSamples(0, 0, w, h, 0,
      new Array[Int](w * h))
    assert(samples.map(_.toByte).toSeq == pix.toSeq)
  }

  test("restart markers: interval 3 roundtrips exactly, ImageIO agrees") {
    val bytes = Array.tabulate[Byte](64)(i => (i * 4 + 1).toByte)
    val (w, h, pix) = blockConstant(bytes, 8)
    val enc = JpegCodec.encodeGray(w, h, pix, restartInterval = 3)
    val (dw, dh, out) = JpegCodec.decodeGray(enc)
    assert((dw, dh) == (w, h))
    assert(out.toSeq == pix.toSeq)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(enc))
    val samples = img.getRaster.getSamples(0, 0, w, h, 0,
      new Array[Int](w * h))
    assert(samples.map(_.toByte).toSeq == pix.toSeq)
  }

  test("non-multiple-of-8 geometry: edge replication keeps interior exact") {
    // 13x5 constant image: every 8x8 source block is constant after the
    // edge pad, so even the partial-block interior decodes exactly
    val pix = Array.fill[Byte](13 * 5)(77)
    val enc = JpegCodec.encodeGray(13, 5, pix)
    val (w, h, out) = JpegCodec.decodeGray(enc)
    assert((w, h) == (13, 5))
    assert(out.forall(_ == 77))
  }

  test("arbitrary gray image: our roundtrip stays inside the lossy band") {
    val w = 32; val h = 16
    val pix = Array.tabulate[Byte](w * h)(i => ((i % w) * 8).toByte)
    val (dw, dh, out) = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, pix))
    assert((dw, dh) == (w, h))
    val errs = out.zip(pix).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }
    // all-ones qtable: the only loss is coefficient rounding — ±2 bounds
    // it on any input (the ramp actually reconstructs exactly)
    assert(errs.max <= 2, s"max pixel error ${errs.max}")
    assert(errs.sum.toDouble / errs.length <= 0.5,
      f"mean pixel error ${errs.sum.toDouble / errs.length}%.2f")
  }

  test("hash-noise image: worst-case content stays near-lossless") {
    val w = 64; val h = 32
    // deterministic position-keyed noise — the hardest content for a
    // DCT codec (full-band energy, AC clamp corner exercised)
    val pix = Array.tabulate[Byte](w * h) { i =>
      (((i * 2654435761L) >>> 24) & 0xff).toByte }
    val (dw, dh, out) = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, pix))
    assert((dw, dh) == (w, h))
    val errs = out.zip(pix).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }
    assert(errs.max <= 6, s"max pixel error ${errs.max}")
    assert(errs.sum.toDouble / errs.length <= 1.0,
      f"mean pixel error ${errs.sum.toDouble / errs.length}%.2f")
  }

  test("our decoder reads ImageIO-encoded GRAY jpeg within tolerance") {
    val w = 40; val h = 24
    val src = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val pix = Array.tabulate[Byte](w * h) { i =>
      (128 + 100 * math.sin(i * 0.05)).toInt.toByte }
    src.getRaster.setDataElements(0, 0, w, h, pix)
    val out = new ByteArrayOutputStream()
    ImageIO.write(src, "jpg", out)
    val (dw, dh, ours) = JpegCodec.decodeGray(out.toByteArray)
    assert((dw, dh) == (w, h))
    // reference: ImageIO decoding its own bytes
    val (rw, rh, ref) = ImageCodec.decodeGray(out.toByteArray)
    assert((rw, rh) == (w, h))
    val errs = ours.zip(ref).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }
    assert(errs.max <= 2,
      s"cross-IDCT drift ${errs.max} (want <=2 on a smooth field)")
  }

  test("our decoder reads ImageIO-encoded 4:2:0 COLOR jpeg within tolerance") {
    val w = 48; val h = 32
    val src = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 128 + (100 * math.sin(x * 0.15)).toInt
      val g = 128 + (100 * math.cos(y * 0.15)).toInt
      val b = 128 + (80 * math.sin((x + y) * 0.1)).toInt
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(src, "jpg", out) // default writer: YCbCr 4:2:0
    val (dw, dh, rgb) = JpegCodec.decodeRgb(out.toByteArray)
    assert((dw, dh) == (w, h))
    // reference decode via ImageIO; tolerance covers its triangular
    // chroma upsample vs our replication plus IDCT lineage differences —
    // bounded on the smooth field, catastrophic only if subsampling
    // placement or color transform is wrong
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
    var maxErr = 0
    var sumErr = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rp = ref.getRGB(x, y)
      val p = 3 * (y * w + x)
      val dr = math.abs(((rp >> 16) & 0xff) - (rgb(p) & 0xff))
      val dg = math.abs(((rp >> 8) & 0xff) - (rgb(p + 1) & 0xff))
      val db = math.abs((rp & 0xff) - (rgb(p + 2) & 0xff))
      maxErr = math.max(maxErr, math.max(dr, math.max(dg, db)))
      sumErr += dr + dg + db
    }
    val meanErr = sumErr.toDouble / (3 * w * h)
    assert(maxErr <= 16, s"max channel error $maxErr")
    assert(meanErr <= 4.5, f"mean channel error $meanErr%.2f")
  }

  test("table-less stream (MJPG convention) decodes via Annex-K defaults") {
    // strip the two DHT segments from a real stream: motion-JPEG
    // frames commonly omit them and lean on the standard tables —
    // which are exactly what our encoder codes with, so the decode
    // must still be exact
    val (w, h, pix) = blockConstant(all256.take(24), 6)
    val enc = JpegCodec.encodeGray(w, h, pix)
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < enc.length) {
      if (i + 1 < enc.length && (enc(i) & 0xff) == 0xff &&
        (enc(i + 1) & 0xff) == 0xc4) {
        val len = ((enc(i + 2) & 0xff) << 8) | (enc(i + 3) & 0xff)
        i += 2 + len // skip the whole DHT segment
      } else { out.write(enc(i)); i += 1 }
    }
    val stripped = out.toByteArray
    assert(stripped.length < enc.length, "DHT was not stripped")
    val (dw, dh, dec) = JpegCodec.decodeGray(stripped)
    assert((dw, dh) == (w, h))
    assert(dec.toSeq == pix.toSeq)
  }

  test("16-bit (Pq=1) quantization tables dequantize correctly") {
    // rewrite the 8-bit all-ones DQT as a 16-bit table of the same
    // values: the decode must be unchanged (same dequantization)
    val (w, h, pix) = blockConstant(all256.take(16), 4)
    val enc = JpegCodec.encodeGray(w, h, pix)
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < enc.length) {
      if (i + 1 < enc.length && (enc(i) & 0xff) == 0xff &&
        (enc(i + 1) & 0xff) == 0xdb) {
        out.write(0xff); out.write(0xdb)
        out.write(0); out.write(2 + 1 + 128) // new length
        out.write(0x10) // Pq=1, Tq=0
        val tblAt = i + 5 // first of the 64 byte entries
        for (k <- 0 until 64) {
          out.write(0); out.write(enc(tblAt + k) & 0xff) // widen to u16
        }
        i = tblAt + 64
      } else { out.write(enc(i)); i += 1 }
    }
    val wide = out.toByteArray
    assert(wide.length == enc.length + 64)
    val (dw, dh, dec) = JpegCodec.decodeGray(wide)
    assert((dw, dh) == (w, h))
    assert(dec.toSeq == pix.toSeq)
  }

  test("progressive JPEG refuses loudly by name") {
    val w = 16; val h = 16
    val src = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    src.getRaster.setDataElements(0, 0, w, h,
      Array.tabulate[Byte](w * h)(i => (i % 251).toByte))
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(src, null, null), param)
    ios.close(); writer.dispose()
    val e = intercept[IllegalArgumentException](
      JpegCodec.decodeGray(out.toByteArray))
    assert(e.getMessage.contains("progressive"), e.getMessage)
  }

  test("truncated and junk streams refuse loudly") {
    val (w, h, pix) = blockConstant(all256.take(16), 4)
    val enc = JpegCodec.encodeGray(w, h, pix)
    intercept[IllegalArgumentException](
      JpegCodec.decodeGray(enc.take(enc.length / 2)))
    intercept[IllegalArgumentException](
      JpegCodec.decodeGray("not a jpeg at all".getBytes))
    intercept[IllegalArgumentException](
      JpegCodec.encodeGray(4, 4, new Array[Byte](9)))
  }

  test("hostile geometry refuses before allocating (bomb guard)") {
    // patch the SOF height/width of a real stream to 65535x65535 — a
    // 16-byte header must not buy a 17 GB plane allocation
    val (w, h, pix) = blockConstant(all256.take(8), 8)
    val enc = JpegCodec.encodeGray(w, h, pix)
    // SOF0 payload: FF C0 len(2) prec(1) h(2) w(2) — find the marker
    var at = -1
    var i = 2
    while (at < 0 && i < enc.length - 1) {
      if ((enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc0) at = i
      i += 1
    }
    assert(at > 0)
    val bomb = enc.clone()
    bomb(at + 5) = 0xff.toByte; bomb(at + 6) = 0xff.toByte // height
    bomb(at + 7) = 0xff.toByte; bomb(at + 8) = 0xff.toByte // width
    val e = intercept[IllegalArgumentException](JpegCodec.decodeGray(bomb))
    assert(e.getMessage.contains("guard"), e.getMessage)
  }

  test("fuzz: bit-flipped streams refuse with IAE, never crash or hang") {
    val (w, h, pix) = blockConstant(all256.take(32), 8)
    val enc = JpegCodec.encodeGray(w, h, pix)
    // deterministic single-byte corruptions across the whole stream —
    // every outcome must be either a clean decode (geometry intact) or
    // an IllegalArgumentException; anything else is an unhandled path
    var decoded = 0
    var refused = 0
    for (pos <- enc.indices by 7; delta <- Seq(1, 0x80)) {
      val mut = enc.clone()
      mut(pos) = (mut(pos) + delta).toByte
      try {
        val (dw, dh, _) = JpegCodec.decodeGray(mut)
        require(dw > 0 && dh > 0)
        decoded += 1
      } catch {
        case _: IllegalArgumentException => refused += 1
      }
    }
    assert(refused > 0 && decoded > 0,
      s"fuzz outcomes degenerate: $decoded decoded, $refused refused")
  }

  test("1xN strip (the query geometry) roundtrips via 8x8 upsample blocks") {
    // the driver fixture: byte k -> block k of an 8-tall strip
    val bytes = "JPEG fixture bytes 0123".getBytes("ISO-8859-1")
    val (w, h, pix) = blockConstant(bytes, bytes.length)
    assert(h == 8 && w == 8 * bytes.length)
    val (dw, dh, out) = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, pix))
    assert((dw, dh) == (w, h))
    // recover byte k as the (0,0) sample of block k
    val recovered = bytes.indices.map(j => out(j * 8)).toArray
    assert(recovered.toSeq == bytes.toSeq)
    assert(out.toSeq == pix.toSeq)
  }
}

package graft

import graft.multimodal.ImageCodec

/** Real JDK-ImageIO decode behind the BinaryOps seam: exact gray
  * roundtrips for both shipped codecs over the FULL byte range (the
  * driver-gated queries only see ASCII ≤126 — the spec covers 0..255,
  * including the palette-BMP path), geometry fidelity, the RGB
  * equal-channel fallback, and loud failure on junk. */
class ImageCodecSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val all256 = Array.tabulate[Byte](256)(i => i.toByte)

  test("png gray roundtrip is exact over all 256 values, 2D geometry") {
    val enc = ImageCodec.encodeGray(16, 16, all256, "png")
    val (w, h, pix) = ImageCodec.decodeGray(enc)
    assert((w, h) == (16, 16))
    assert(pix.toSeq == all256.toSeq)
  }

  test("bmp gray roundtrip is exact over all 256 values (palette path)") {
    val enc = ImageCodec.encodeGray(64, 4, all256, "bmp")
    val (w, h, pix) = ImageCodec.decodeGray(enc)
    assert((w, h) == (64, 4))
    assert(pix.toSeq == all256.toSeq)
  }

  test("1xN strip (the query geometry) roundtrips through both codecs") {
    val bytes = "Hello multimodal world 123".getBytes("ISO-8859-1")
    for (fmt <- Seq("png", "bmp")) {
      val (w, h, pix) = ImageCodec.decodeGray(
        ImageCodec.encodeGray(bytes.length, 1, bytes, fmt))
      assert((w, h) == (bytes.length, 1), fmt)
      assert(pix.toSeq == bytes.toSeq, fmt)
    }
  }

  test("RGB fallback: equal channels decode exactly") {
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) {
      val v = y * 4 + x + 40
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val (w, h, pix) = ImageCodec.decodeGray(out.toByteArray)
    assert((w, h) == (4, 2))
    assert(pix.map(_ & 0xff).toSeq == (40 until 48))
  }

  test("jpeg decodes: exact geometry, tolerance-banded pixels (lossy)") {
    // JPEG is the one common compressed format ImageIO ships a codec
    // for; its IDCT output is JDK-version-stable but not spec-
    // guaranteed, so it is driven HERE (geometry exact, pixels within
    // a band) and never placed under a driver hash — q203/q231 keep
    // their lossless formats. A smooth horizontal ramp keeps the DCT
    // error small and the assertion meaningful.
    val w = 32; val h = 16
    val pix = Array.tabulate[Byte](w * h)(i => ((i % w) * 8).toByte)
    val enc = ImageCodec.encodeGray(w, h, pix, "jpg")
    assert((enc(0) & 0xff) == 0xFF && (enc(1) & 0xff) == 0xD8, "SOI magic")
    val (dw, dh, out) = ImageCodec.decodeGray(enc)
    assert((dw, dh) == (w, h))
    val errs = out.zip(pix).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }
    assert(errs.max <= 12, s"max pixel error ${errs.max}")
    assert(errs.sum.toDouble / errs.length <= 3.0,
      f"mean pixel error ${errs.sum.toDouble / errs.length}%.2f")
  }

  test("undecodable bytes and bad dimensions fail loudly") {
    intercept[IllegalArgumentException](
      ImageCodec.decodeGray("not an image".getBytes))
    intercept[IllegalArgumentException](
      ImageCodec.encodeGray(3, 3, new Array[Byte](8), "png"))
    intercept[IllegalArgumentException](
      ImageCodec.encodeGray(2, 2, new Array[Byte](4), "tiff-nope"))
  }

  test("ImageIoDecoder featurizes decoded pixels, not codec bytes") {
    val bytes = Array.tabulate[Byte](32)(i => (i * 3).toByte)
    val enc = ImageCodec.encodeGray(32, 1, bytes, "png")
    val viaDecoder = ImageCodec.ImageIoDecoder.features("image", enc)
    val direct = graft.multimodal.BinaryOps.StubDecoder
      .features("image", bytes)
    assert(viaDecoder.toSeq == direct.toSeq)
    // non-image kinds keep byte-moment features over the raw stream
    assert(ImageCodec.ImageIoDecoder.features("audio", enc).toSeq ==
      graft.multimodal.BinaryOps.StubDecoder.features("audio", enc).toSeq)
  }
}

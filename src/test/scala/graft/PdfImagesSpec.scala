package graft

import graft.ingest.PdfCodec

/** PDF image extraction (the PyMuPDF-parity half of document mining):
  * real embedded JPEGs decode to exact pixels, text extraction still
  * skips them, fake/unsupported payloads count as skipped instead of
  * refusing the document, Flate gray images extract raw, encrypted
  * documents extract through the per-object decryption, and geometry
  * contradictions stay loud. */
class PdfImagesSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** block-constant 8-tall strip: block j == bytes(j). */
  private def strip(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val w = 8 * bytes.length
    val pix = new Array[Byte](w * 8)
    for (j <- bytes.indices; y <- 0 until 8; x <- 0 until 8)
      pix(y * w + 8 * j + x) = bytes(j)
    (w, 8, pix)
  }

  test("embedded real JPEG: text decodes around it, pixels extract exactly") {
    val (w, h, pix) = strip("PDF image payload".getBytes("ISO-8859-1"))
    val pdf = PdfCodec.encodeWithRealJpeg(
      Seq("Name: Doc", "the text body"), w, h, pix)
    assert(PdfCodec.decode(pdf) == Seq("Name: Doc", "the text body"))
    val (images, skipped) = PdfCodec.extractImages(pdf)
    assert(skipped.isEmpty && images.size == 1)
    assert(images.head.width == w && images.head.height == h)
    assert(images.head.gray.toSeq == pix.toSeq)
  }

  test("fake JPEG payload (encodeWithDctImage) counts as skipped") {
    val pdf = PdfCodec.encodeWithDctImage(Seq("text only"))
    assert(PdfCodec.decode(pdf) == Seq("text only"))
    val (images, skipped) = PdfCodec.extractImages(pdf)
    assert(images.isEmpty && skipped.size == 1)
    // the retired skip counter is now a typed census row
    assert(skipped.head.codec == "dct" && skipped.head.width == 8 &&
      skipped.head.height == 8)
  }

  test("plain documents extract zero images") {
    val (images, skipped) =
      PdfCodec.extractImages(PdfCodec.encode(Seq("no pictures here")))
    assert(images.isEmpty && skipped.isEmpty)
  }

  test("encrypted documents extract through per-object decryption") {
    val (w, h, pix) = strip("secret picture".getBytes("ISO-8859-1"))
    for (mode <- Seq("rc4-128", "aes-128", "aes-256")) {
      val pdf = PdfCodec.encodeEncrypted(Seq("the text"), mode,
        Some((w, h, pix)))
      assert(PdfCodec.decode(pdf) == Seq("the text"), mode)
      val (images, skipped) = PdfCodec.extractImages(pdf)
      assert(skipped.isEmpty && images.size == 1, mode)
      assert(images.head.gray.toSeq == pix.toSeq, mode)
    }
  }

  test("geometry contradiction between dict and JPEG stays loud") {
    val (w, h, pix) = strip("abcd".getBytes("ISO-8859-1"))
    val pdf = PdfCodec.encodeWithRealJpeg(Seq("t"), w, h, pix)
    val raw = new String(pdf, "ISO-8859-1")
    val lied = raw.replace(s"/Width $w", "/Width 9999")
    val e = intercept[IllegalArgumentException](
      PdfCodec.extractImages(lied.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("contradicts"), e.getMessage)
  }

  test("Flate /DeviceGray image extracts raw samples") {
    // hand-built: a tiny PDF whose image stream is Flate-compressed
    // raw gray samples (the scanned-page shape)
    val w = 6; val h = 4
    val pix = Array.tabulate[Byte](w * h)(i => (i * 9 + 1).toByte)
    val d = new java.util.zip.Deflater()
    d.setInput(pix); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](256)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    val z = out.toByteArray
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
    sb ++= s"5 0 obj << /Type /XObject /Subtype /Image /Width $w " +
      s"/Height $h /ColorSpace /DeviceGray /BitsPerComponent 8 " +
      s"/Length ${z.length} /Filter /FlateDecode >> stream\n"
    val head = sb.toString.getBytes("ISO-8859-1")
    val tail = ("\nendstream endobj\n" +
      "4 0 obj << /Length 11 >> stream\n(x) Tj BT ET\nendstream endobj\n" +
      "trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    val pdf = head ++ z ++ tail
    val (images, skipped) = PdfCodec.extractImages(pdf)
    assert(skipped.isEmpty && images.size == 1)
    assert(images.head.width == w && images.head.height == h)
    assert(images.head.gray.toSeq == pix.toSeq)
  }

  test("unsupported codec with missing geometry stays an UNDECODED row") {
    import graft.ingest.PdfCodec
    // a JPX XObject whose dict omits /Width and /Height: the undecoded
    // census path must report geometry -1, not refuse the document
    // (the strict require belongs to the census API, where the dict IS
    // the result)
    val pdf = ("%PDF-1.5\n" +
      "5 0 obj << /Type /XObject /Subtype /Image /Filter /JPXDecode " +
      "/Length 4 >> stream\nabcd\nendstream endobj\n" +
      "4 0 obj << /Length 11 >> stream\n(x) Tj BT ET\nendstream endobj\n" +
      "%%EOF\n").getBytes("ISO-8859-1")
    val (images, skipped) = PdfCodec.extractImages(pdf)
    assert(images.isEmpty && skipped.size == 1)
    assert(skipped.head.codec == "jpx")
    assert(skipped.head.width == -1 && skipped.head.height == -1)
    // the census API stays strict: same document refuses there
    val e = intercept[IllegalArgumentException](PdfCodec.imageCensus(pdf))
    assert(e.getMessage.contains("/Width"), e.getMessage)
  }
}

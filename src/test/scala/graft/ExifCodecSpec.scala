package graft

import graft.multimodal.{ExifCodec, JpegCodec}

/** EXIF APP1/TIFF parsing and orientation normalization: roundtrips in
  * both byte orders, ImageIO still decodes the spliced JPEG, all eight
  * orientations verified against hand-written grids and the
  * inverse-composition property, and the loud perimeter. */
class ExifCodecSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def jpegFixture(): Array[Byte] = {
    val pix = Array.fill[Byte](16 * 8)(42)
    JpegCodec.encodeGray(16, 8, pix)
  }

  test("APP1 roundtrip in both byte orders") {
    for (big <- Seq(false, true)) {
      val app1 = ExifCodec.encodeApp1("GraftCam", "Model X-1", 6,
        "2026:08:16 02:00:00", big)
      val withExif = ExifCodec.insertApp1(jpegFixture(), app1)
      val exif = ExifCodec.parse(withExif).get
      assert(exif.bigEndian == big)
      assert(exif.make.contains("GraftCam"))
      assert(exif.model.contains("Model X-1"))
      assert(exif.orientation.contains(6))
      assert(exif.dateTime.contains("2026:08:16 02:00:00"))
    }
  }

  test("short (inline, <=4 byte) ASCII values parse too") {
    val app1 = ExifCodec.encodeApp1("ab", "c", 3, "2026:01:01 00:00:00",
      bigEndian = false)
    val exif = ExifCodec.parse(
      ExifCodec.insertApp1(jpegFixture(), app1)).get
    assert(exif.make.contains("ab") && exif.model.contains("c"))
    assert(exif.orientation.contains(3))
  }

  test("a JPEG with spliced EXIF still decodes (ours and ImageIO)") {
    val jpeg = jpegFixture()
    val withExif = ExifCodec.insertApp1(jpeg,
      ExifCodec.encodeApp1("M", "N", 8, "2026:02:02 10:00:00",
        bigEndian = true))
    val (w, h, pix) = JpegCodec.decodeGray(withExif)
    assert((w, h) == (16, 8) && pix.forall(_ == 42))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(withExif))
    assert(img != null && img.getWidth == 16 && img.getHeight == 8)
  }

  test("no EXIF -> None; junk -> loud") {
    assert(ExifCodec.parse(jpegFixture()).isEmpty)
    intercept[IllegalArgumentException](
      ExifCodec.parse("not a jpeg".getBytes))
    // structurally broken EXIF: bad byte-order mark
    val app1 = ExifCodec.encodeApp1("M", "N", 1, "2026:01:01 00:00:00",
      bigEndian = false)
    val broken = app1.clone()
    broken(6) = 'X'; broken(7) = 'X' // the II/MM mark
    intercept[IllegalArgumentException](
      ExifCodec.parse(ExifCodec.insertApp1(jpegFixture(), broken)))
  }

  test("all eight orientations on a hand-checked 3x2 grid") {
    // grid: 1 2 3 / 4 5 6 (w=3, h=2)
    val src = Array[Byte](1, 2, 3, 4, 5, 6)
    def run(o: Int): (Int, Int, Seq[Byte]) = {
      val (w, h, p) = ExifCodec.applyOrientation(3, 2, src, o)
      (w, h, p.toSeq)
    }
    assert(run(1) == ((3, 2, Seq[Byte](1, 2, 3, 4, 5, 6))))
    assert(run(2) == ((3, 2, Seq[Byte](3, 2, 1, 6, 5, 4))))
    assert(run(3) == ((3, 2, Seq[Byte](6, 5, 4, 3, 2, 1))))
    assert(run(4) == ((3, 2, Seq[Byte](4, 5, 6, 1, 2, 3))))
    assert(run(5) == ((2, 3, Seq[Byte](1, 4, 2, 5, 3, 6))))
    // rotate 90 CW: first output row = first column bottom-up
    assert(run(6) == ((2, 3, Seq[Byte](4, 1, 5, 2, 6, 3))))
    assert(run(7) == ((2, 3, Seq[Byte](6, 3, 5, 2, 4, 1))))
    // rotate 90 CCW: first output row = last column top-down
    assert(run(8) == ((2, 3, Seq[Byte](3, 6, 2, 5, 1, 4))))
  }

  test("orientation composition: applying the inverse restores identity") {
    val inverse = Map(1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4, 5 -> 5,
      6 -> 8, 7 -> 7, 8 -> 6)
    val src = Array.tabulate[Byte](7 * 5)(i => (i + 1).toByte)
    for (o <- 1 to 8) {
      val (w1, h1, p1) = ExifCodec.applyOrientation(7, 5, src, o)
      val (w2, h2, p2) = ExifCodec.applyOrientation(w1, h1, p1, inverse(o))
      assert((w2, h2) == (7, 5), s"o=$o")
      assert(p2.toSeq == src.toSeq, s"o=$o")
    }
  }

  test("closed-form strip checksums match brute force (the q286 oracle)") {
    // the driver fixture geometry: h=8, w=8L strip, block j constant b_j
    val bytes = "oracle formula check".getBytes("ISO-8859-1")
    val L = bytes.length
    val w = 8 * L
    val pix = new Array[Byte](w * 8)
    for (j <- 0 until L; y <- 0 until 8; x <- 0 until 8)
      pix(y * w + 8 * j + x) = bytes(j)
    def brute(o: Int): (Int, Int, Long, Long) = {
      val (w2, h2, p) = ExifCodec.applyOrientation(w, 8, pix, o)
      var sum = 0L
      var chk = 0L
      for (i <- p.indices) {
        sum += p(i) & 0xff
        chk += (i + 1).toLong * (p(i) & 0xff)
      }
      (w2, h2, sum, chk)
    }
    def closed(o: Int): (Int, Int, Long, Long) = {
      val sum = 64L * bytes.map(_ & 0xff).map(_.toLong).sum
      val chk = bytes.zipWithIndex.map { case (b, j) =>
        val v = (b & 0xff).toLong
        o match {
          case 1 => v * (1792L * L + 512L * j + 288L)
          case 3 => v * (1792L * L + 512L * (L - 1 - j) + 288L)
          case 6 => v * (4096L * j + 2080L)
          case _ => v * (4096L * (L - 1 - j) + 2080L) // 8
        }
      }.sum
      val (w2, h2) = if (o == 6 || o == 8) (8, 8 * L) else (8 * L, 8)
      (w2, h2, sum, chk)
    }
    for (o <- Seq(1, 3, 6, 8))
      assert(brute(o) == closed(o), s"orientation $o")
  }
}

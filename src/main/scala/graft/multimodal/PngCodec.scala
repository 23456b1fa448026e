package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** PNG structure census (ISO/IEC 15948 / RFC 2083): the 8-byte
  * signature, then length-type-data-CRC chunks — IHDR geometry and
  * pixel format, IDAT count/bytes, the IEND terminator — with every
  * chunk's CRC-32 RECOMPUTED over type+data (PNG is the one common
  * image format that carries per-chunk integrity; a census that
  * skips the check would bless silently corrupted rasters). Pixel
  * data is never inflated or unfiltered — the decode perimeter stays
  * where r12 drew it (JPEG decodes in-engine; PNG rasters are
  * IDAT-opaque). Loud on a bad signature, CRC mismatch, truncation,
  * a non-IHDR first chunk, or a missing/early IEND. */
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
}

package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** ZIP archive census from the CENTRAL DIRECTORY — the authoritative
  * view (APPNOTE.TXT / ISO 21320-1: readers shall locate members via
  * the end-of-central-directory record, not by scanning local
  * headers). The distinction is a real attack surface: streaming
  * extractors that trust LOCAL file headers can be shown different
  * names/sizes than directory-driven readers see — the classic zip
  * parser-differential used to smuggle content past corpus filters.
  * The census walks the EOCD → central directory → each entry's
  * local header and REPORTS the disagreements instead of silently
  * picking a side. STORE and DEFLATE methods are recognized; member
  * data is never decompressed. Loud on a missing EOCD, signature or
  * bound violations. Per-row executor work, scan-fused. */
object ZipCodec {

  final case class ZipEntry(name: String, method: Int, csize: Long,
      usize: Long, crc: Long, localMismatch: Boolean)

  private val LocalSig = 0x04034b50L
  private val CentralSig = 0x02014b50L
  private val EocdSig = 0x06054b50L

  /** Synthesize a STORE-only zip: local headers + data, central
    * directory, EOCD (optionally with a trailing comment — the shape
    * that forces a real backward EOCD search). `tamperLocal` rewrites
    * that member's LOCAL-header name in place (same length, central
    * directory untouched) — the parser-differential fixture. */
  def synth(members: Seq[(String, Array[Byte])],
      comment: String = "", tamperLocal: Option[Int] = None)
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 24) & 0xff).toInt)
    }
    val locals = members.map { case (name, data) =>
      val nameBytes = name.getBytes("US-ASCII")
      val crc = new CRC32()
      crc.update(data)
      val at = out.size()
      u32(LocalSig); u16(20); u16(0); u16(0) // version, flags, method
      u16(0); u16(0x21) // dos time, date
      u32(crc.getValue)
      u32(data.length.toLong); u32(data.length.toLong)
      u16(nameBytes.length); u16(0)
      out.write(nameBytes)
      out.write(data)
      (at, crc.getValue)
    }
    val cdAt = out.size()
    members.zip(locals).foreach { case ((name, data), (at, crc)) =>
      val nameBytes = name.getBytes("US-ASCII")
      u32(CentralSig); u16(20); u16(20); u16(0); u16(0)
      u16(0); u16(0x21)
      u32(crc)
      u32(data.length.toLong); u32(data.length.toLong)
      u16(nameBytes.length); u16(0); u16(0)
      u16(0); u16(0); u32(0L) // disk, internal, external attrs
      u32(at.toLong)
      out.write(nameBytes)
    }
    val cdSize = out.size() - cdAt
    val commentBytes = comment.getBytes("US-ASCII")
    u32(EocdSig); u16(0); u16(0)
    u16(members.length); u16(members.length)
    u32(cdSize.toLong); u32(cdAt.toLong)
    u16(commentBytes.length)
    out.write(commentBytes)
    val bytes = out.toByteArray
    tamperLocal.foreach { k =>
      val (at, _) = locals(k)
      val nameAt = at + 30
      val nameBytes = members(k)._1.getBytes("US-ASCII")
      // same-length rewrite: reverse the name in the LOCAL header only
      var i = 0
      while (i < nameBytes.length) {
        bytes(nameAt + i) = nameBytes(nameBytes.length - 1 - i)
        i += 1
      }
    }
    bytes
  }

  /** Walk EOCD → central directory; verify each entry's local header
    * and flag name/method/size disagreements. */
  def census(bytes: Array[Byte]): Seq[ZipEntry] = {
    def u16(at: Int): Int =
      (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    def u32(at: Int): Long =
      (bytes(at) & 0xffL) | ((bytes(at + 1) & 0xffL) << 8) |
        ((bytes(at + 2) & 0xffL) << 16) | ((bytes(at + 3) & 0xffL) << 24)
    // EOCD: backward search bounded by the max 65535-byte comment;
    // the candidate must CLAIM exactly the comment bytes that remain
    // (a stray signature inside member data can't satisfy that)
    require(bytes.length >= 22, s"not a zip: ${bytes.length} bytes")
    var eocd = -1
    var i = bytes.length - 22
    val lo = math.max(0, bytes.length - 22 - 65535)
    while (eocd < 0 && i >= lo) {
      if (u32(i) == EocdSig && i + 22 + u16(i + 20) == bytes.length)
        eocd = i
      else i -= 1
    }
    require(eocd >= 0, "no end-of-central-directory record")
    val n = u16(eocd + 10)
    require(n == u16(eocd + 8), "multi-disk zip — outside the perimeter")
    val cdSize = u32(eocd + 12)
    val cdAt = u32(eocd + 16)
    require(cdAt + cdSize <= eocd,
      s"central directory [$cdAt, ${cdAt + cdSize}) overlaps the EOCD")
    val entries = Seq.newBuilder[ZipEntry]
    var pos = cdAt.toInt
    var k = 0
    while (k < n) {
      require(pos + 46 <= eocd, s"truncated central entry at offset $pos")
      require(u32(pos) == CentralSig,
        s"bad central-directory signature at offset $pos")
      val method = u16(pos + 10)
      val crc = u32(pos + 16)
      val csize = u32(pos + 20)
      val usize = u32(pos + 24)
      val nameLen = u16(pos + 28)
      val extraLen = u16(pos + 30)
      val cmtLen = u16(pos + 32)
      val localAt = u32(pos + 42)
      require(pos + 46 + nameLen <= eocd,
        s"central entry name overruns at offset $pos")
      val name = new String(bytes, pos + 46, nameLen, "US-ASCII")
      // the local header this entry points at: verify and diff
      require(localAt + 30 <= bytes.length && u32(localAt.toInt) == LocalSig,
        s"entry '$name' points at offset $localAt with no local header")
      val la = localAt.toInt
      val lMethod = u16(la + 8)
      val lCsize = u32(la + 18)
      val lUsize = u32(la + 22)
      val lNameLen = u16(la + 26)
      require(la + 30 + lNameLen <= bytes.length,
        s"local header name overruns at offset $la")
      val lName = new String(bytes, la + 30, lNameLen, "US-ASCII")
      val mismatch = lName != name || lMethod != method ||
        lCsize != csize || lUsize != usize
      require(la + 30 + lNameLen + u16(la + 28) + csize <= bytes.length,
        s"entry '$name' data runs past EOF")
      entries += ZipEntry(name, method, csize, usize, crc, mismatch)
      pos += 46 + nameLen + extraLen + cmtLen
      k += 1
    }
    require(pos == (cdAt + cdSize).toInt,
      s"central directory walk overran: $pos vs ${cdAt + cdSize}")
    entries.result()
  }
}

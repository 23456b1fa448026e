package graft.multimodal

import java.io.ByteArrayOutputStream

/** POSIX ustar archive census — the shard container training corpora
  * actually ship (WebDataset-style .tar of samples; the IEEE 1003.1
  * ustar layout). CENSUS, not extraction: 512-byte header blocks with
  * octal size fields, the ustar magic, and the header checksum
  * RECOMPUTED (all header bytes summed with the chksum field read as
  * spaces — the one integrity bit the format carries); member data is
  * skipped, never interpreted. Loud on a bad magic, a checksum
  * mismatch, a non-octal size, or a member whose data runs past EOF;
  * the archive ends at the mandated two zero blocks. Transparent
  * whole-archive gzip (the .tar.gz shape) by magic sniff, like
  * WarcCodec.
  *
  * Extension headers (r15 — modern GNU/bsdtar emits these routinely,
  * so a WebDataset shard census without them is a perimeter, not a
  * parser): PAX `x` (per-member) and `g` (global) headers carry
  * "%d key=value\n" override records (IEEE 1003.1 pax Interchange
  * Format) — `path` replaces the 100-byte name field, `size` replaces
  * the 12-digit octal size field (the >8 GiB member shape, where GNU
  * tar zeroes the header field); GNU `L` headers carry a
  * NUL-terminated long name for the next member. Extension headers
  * are checksum-verified like any other, APPLIED, and not reported as
  * members — the census reports the LOGICAL member list a reader
  * extracts. Loud on a malformed PAX record (self-referential length
  * mismatch, missing '='), a dangling override at end-of-archive, or
  * a non-decimal PAX size. Per-row executor work, scan-fused. */
object TarCodec {

  final case class TarMember(name: String, typeflag: Char, size: Long)

  private val Block = 512

  /** One 512-byte ustar header with a valid recomputed checksum. */
  private def header(out: ByteArrayOutputStream, name: String,
      typeflag: Char, size: Long): Unit = {
    require(name.nonEmpty && name.length <= 100,
      s"ustar name field must be 1..100 bytes: '$name'")
    val hdr = new Array[Byte](Block)
    def put(at: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, hdr, at, b.length)
    }
    def octal(at: Int, width: Int, v: Long): Unit = {
      // width-1 zero-padded octal digits + a SPACE terminator (POSIX
      // allows space or NUL; space keeps this source NUL-free so git
      // diff/blame treat it as text — r14 ADVICE). Digits written
      // directly: synth runs per member on the census hot path, and
      // java.util.Formatter there was a measurable task-time slice.
      var i = at + width - 2
      var x = v
      while (i >= at) { hdr(i) = ('0' + (x & 7)).toByte; x >>= 3; i -= 1 }
      require(x == 0, s"octal field overflow: $v in width $width")
      hdr(at + width - 1) = ' '
    }
    put(0, name)
    octal(100, 8, 420) // mode 0644
    octal(108, 8, 0) // uid
    octal(116, 8, 0) // gid
    octal(124, 12, size)
    octal(136, 12, 0L) // mtime
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum blanks
    hdr(156) = typeflag.toByte
    // magic+version: space stands in for the POSIX NUL terminator
    // (readers — incl. the census — match on the "ustar" prefix)
    put(257, "ustar 00")
    var sum = 0L
    var i = 0
    while (i < Block) { sum += hdr(i) & 0xff; i += 1 }
    // 6 zero-padded octal digits + ' ' + ' ' — same bytes "%06o" wrote
    var j = 153
    var x = sum
    while (j >= 148) { hdr(j) = ('0' + (x & 7)).toByte; x >>= 3; j -= 1 }
    hdr(154) = ' '; hdr(155) = ' '
    out.write(hdr)
  }

  private def writeData(out: ByteArrayOutputStream,
      payload: Array[Byte]): Unit = {
    out.write(payload)
    val pad = (Block - payload.length % Block) % Block
    out.write(new Array[Byte](pad))
  }

  private def gzipMaybe(raw: Array[Byte], gzipped: Boolean)
      : Array[Byte] =
    if (!gzipped) raw
    // synthesis-side: the census reads the decoded bytes, which are
    // identical at any deflate level — compress at BEST_SPEED
    else Zlib.gzip(raw, java.util.zip.Deflater.BEST_SPEED)

  /** A pax Interchange Format extended-header payload: one
    * "%d key=value\n" record per pair, where %d is the decimal length
    * of the WHOLE record including its own digits (the standard
    * self-referential fixpoint). */
  def paxRecords(pairs: Seq[(String, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    pairs.foreach { case (k, v) =>
      val body = s" $k=$v\n".getBytes("UTF-8") // lengths count BYTES
      var len = body.length + 1 // at least one length digit
      while (len.toString.length + body.length != len) len += 1
      out.write(len.toString.getBytes("US-ASCII"))
      out.write(body)
    }
    out.toByteArray
  }

  /** Synthesize a conformant ustar archive: one header block per
    * (name, typeflag, payload), data padded to block size, two zero
    * blocks at the end. Deterministic byte-for-byte. */
  def synth(members: Seq[(String, Char, Array[Byte])],
      gzipped: Boolean = false): Array[Byte] =
    synthExt(members.map { case (n, t, p) => (n, t, p, ' ') }, gzipped)

  /** Synth with per-member extension modes:
    *  - ' '  classic ustar header (name must fit 100 bytes);
    *  - 'x'  PAX per-member header carrying a `path` override (and a
    *         `size` override when the payload tops 100 bytes — both
    *         shapes GNU tar emits); the member's own name field holds
    *         the 100-byte truncation;
    *  - 's'  PAX per-member header carrying `path` AND `size`, with
    *         the member header's size field written as ZERO (the
    *         >8 GiB shape — only the PAX record knows the size);
    *  - 'L'  GNU long-name header (`././@LongLink`, NUL-terminated
    *         payload) before the member. */
  def synthExt(members: Seq[(String, Char, Array[Byte], Char)],
      gzipped: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    members.foreach { case (name, typeflag, payload, mode) =>
      val shortName =
        if (name.length <= 100) name else name.substring(0, 100)
      mode match {
        case ' ' =>
          header(out, name, typeflag, payload.length.toLong)
          writeData(out, payload)
        case 'x' =>
          val recs = paxRecords(Seq("path" -> name))
          header(out, paxName(shortName), 'x', recs.length.toLong)
          writeData(out, recs)
          header(out, shortName, typeflag, payload.length.toLong)
          writeData(out, payload)
        case 's' =>
          val recs = paxRecords(Seq("path" -> name,
            "size" -> payload.length.toString))
          header(out, paxName(shortName), 'x', recs.length.toLong)
          writeData(out, recs)
          // size field zero: the PAX record is the only size
          header(out, shortName, typeflag, 0L)
          writeData(out, payload)
        case 'L' =>
          val nameNul = name.getBytes("US-ASCII") :+ 0.toByte
          header(out, "././@LongLink", 'L', nameNul.length.toLong)
          writeData(out, nameNul)
          header(out, shortName, typeflag, payload.length.toLong)
          writeData(out, payload)
        case m => throw new IllegalArgumentException(
          s"unknown synth extension mode '$m'")
      }
    }
    out.write(new Array[Byte](2 * Block)) // end-of-archive marker
    gzipMaybe(out.toByteArray, gzipped)
  }

  /** The conventional PaxHeaders/ name for an `x` header, kept inside
    * the 100-byte field. */
  private def paxName(shortName: String): String =
    ("PaxHeaders.0/" + shortName).take(100)

  /** Parse a pax extended-header payload into its key→value map.
    * Loud on a record whose self-referential length doesn't land on
    * its own '\n', or one without '='. */
  def parsePax(payload: Array[Byte]): Map[String, String] = {
    // record lengths are BYTE counts (values are UTF-8) — walk bytes,
    // decode each record's key=value region as UTF-8
    val out = Map.newBuilder[String, String]
    var pos = 0
    while (pos < payload.length) {
      var sp = pos
      while (sp < payload.length && payload(sp) != ' ') sp += 1
      require(sp > pos && sp < payload.length,
        s"pax record without length at offset $pos")
      val lenStr = new String(payload, pos, sp - pos, "US-ASCII")
      require(lenStr.forall(_.isDigit),
        s"non-decimal pax record length '$lenStr' at offset $pos")
      val len = lenStr.toInt
      require(len > sp - pos + 2 && pos.toLong + len <= payload.length &&
        payload(pos + len - 1) == '\n',
        s"pax record length $len at offset $pos does not end on its " +
          "own newline")
      val rec = new String(payload, sp + 1, pos + len - 1 - (sp + 1),
        "UTF-8")
      val eq = rec.indexOf('=')
      require(eq > 0, s"pax record without '=' at offset $pos: '$rec'")
      out += (rec.substring(0, eq) -> rec.substring(eq + 1))
      pos += len
    }
    out.result()
  }

  /** Walk the member headers; apply PAX `x`/`g` and GNU `L`
    * extensions; report the LOGICAL members. Gzip magic inflates the
    * whole archive first. */
  def census(bytesIn: Array[Byte]): Seq[TarMember] = {
    val bytes =
      if (bytesIn.length >= 2 && (bytesIn(0) & 0xff) == 0x1f &&
        (bytesIn(1) & 0xff) == 0x8b) Zlib.gunzip(bytesIn)
      else bytesIn
    val members = Seq.newBuilder[TarMember]
    var pos = 0
    def zeroBlock(at: Int): Boolean = {
      var i = at
      val end = at + Block
      while (i < end) { if (bytes(i) != 0) return false; i += 1 }
      true
    }
    // pending per-member overrides (PAX x / GNU L) and PAX g globals
    var pendPath: Option[String] = None
    var pendSize: Option[Long] = None
    var globPath: Option[String] = None
    var globSize: Option[Long] = None
    var done = false
    while (!done) {
      require(pos + Block <= bytes.length,
        s"truncated tar header at offset $pos")
      if (zeroBlock(pos)) {
        require(pos + 2 * Block <= bytes.length && zeroBlock(pos + Block),
          s"single zero block at offset $pos — ustar mandates two")
        require(pendPath.isEmpty && pendSize.isEmpty,
          "dangling PAX/GNU override with no following member")
        done = true
      } else {
        def str(at: Int, width: Int): String = {
          var end = at
          while (end < at + width && bytes(end) != 0) end += 1
          new String(bytes, at, end - at, "US-ASCII")
        }
        require(str(pos + 257, 6).startsWith("ustar"),
          s"bad ustar magic at offset ${pos + 257}")
        // checksum: header bytes summed with chksum read as spaces
        var sum = 0L
        var i = 0
        while (i < Block) {
          sum += (if (i >= 148 && i < 156) ' '.toInt
                  else bytes(pos + i) & 0xff)
          i += 1
        }
        val stored = str(pos + 148, 8).trim
        require(stored.nonEmpty && stored.forall(c => c >= '0' && c <= '7'),
          s"non-octal chksum field '$stored' at offset $pos")
        require(java.lang.Long.parseLong(stored, 8) == sum,
          s"tar checksum mismatch at offset $pos: " +
            s"header says $stored, bytes sum to ${"%06o".format(sum)}")
        val sizeStr = str(pos + 124, 12).trim
        require(sizeStr.nonEmpty &&
          sizeStr.forall(c => c >= '0' && c <= '7'),
          s"non-octal size field '$sizeStr' at offset $pos")
        val hdrSize = java.lang.Long.parseLong(sizeStr, 8)
        val hdrName = str(pos, 100)
        val typeflag = (bytes(pos + 156) & 0xff).toChar
        // the data region is ALWAYS framed by the header size field —
        // for 'x'/'g'/'L' headers that IS the payload; for a member
        // under a PAX size override the header field is what the
        // writer framed the data with (zero in the >8 GiB shape, where
        // the logical size lives only in the PAX record but the
        // writer must still block-frame what it wrote — GNU tar pads
        // the data region to the PAX size, so honor the override)
        def payload(size: Long): Array[Byte] = {
          require(pos.toLong + Block + size <= bytes.length,
            s"extension header declares $size bytes past EOF")
          java.util.Arrays.copyOfRange(bytes, pos + Block,
            pos + Block + size.toInt)
        }
        def paxSizeOf(m: Map[String, String]): Option[Long] =
          m.get("size").map { v =>
            require(v.nonEmpty && v.forall(_.isDigit),
              s"non-decimal pax size '$v' at offset $pos")
            java.lang.Long.parseLong(v)
          }
        var dataSize = hdrSize
        typeflag match {
          case 'x' =>
            require(pendPath.isEmpty && pendSize.isEmpty,
              s"consecutive PAX/GNU extension headers at offset $pos")
            val m = parsePax(payload(hdrSize))
            pendPath = m.get("path")
            pendSize = paxSizeOf(m)
          case 'g' =>
            val m = parsePax(payload(hdrSize))
            globPath = m.get("path").orElse(globPath)
            globSize = paxSizeOf(m).orElse(globSize)
          case 'L' =>
            require(pendPath.isEmpty,
              s"consecutive long-name headers at offset $pos")
            val p = payload(hdrSize)
            require(p.nonEmpty && p.last == 0,
              s"GNU long name at offset $pos is not NUL-terminated")
            pendPath = Some(new String(p, 0, p.length - 1, "UTF-8"))
          case _ =>
            val name = pendPath.orElse(globPath).getOrElse(hdrName)
            val size = pendSize.orElse(globSize).getOrElse(hdrSize)
            dataSize = size
            pendPath = None; pendSize = None
            members += TarMember(name, typeflag, size)
        }
        // Long arithmetic: a hostile 11-digit octal size (~8.5e9)
        // would wrap Int math into a negative cursor
        val next = pos.toLong + Block +
          (dataSize + Block - 1) / Block * Block
        require(next <= bytes.length,
          s"member '$hdrName' declares $dataSize data bytes past EOF")
        pos = next.toInt
      }
    }
    members.result()
  }
}

package graft.ingest

import java.security.MessageDigest

/** PDF standard security handler (ISO 32000-1 §7.6.2-7.6.4) — the
  * encrypted-PDF half of the r11 "What's missing #2" perimeter. The
  * reference opens encrypted PDFs silently via PyMuPDF (tasks.py:102-115);
  * here the handler is in-engine: RC4 (V1/V2, R2/R3) and AES-128-CBC
  * (V4/R4 AESV2, via the JDK's javax.crypto — standard library, no
  * egress), for the overwhelmingly common real-world case of a document
  * encrypted with an EMPTY USER PASSWORD (owner-locked "permissions"
  * PDFs open everywhere without a prompt; that is this perimeter).
  * A non-empty user password fails the /U verification and refuses
  * LOUDLY — password recovery is out of scope by design, not silently
  * skipped.
  *
  * Everything below is the published algorithm set: Algorithm 2 (file
  * key), 3 (/O), 4/5 (/U for R2/R3+), 1 (per-object key, with the AESV2
  * sAlT suffix). RC4 is the textbook KSA/PRGA. */
object PdfCrypt {

  /** the 32-byte padding string of §7.6.3.3 */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  // getInstance walks the provider list; the R2/R3 key derivation runs
  // 50 MD5 rounds and hash2B 64+ SHA rounds per document — cache one
  // instance per thread and reset before use (the HashExprs hoist).
  private val Digests = new java.util.concurrent.ConcurrentHashMap[
    String, ThreadLocal[MessageDigest]]()
  private def digest(alg: String): MessageDigest = {
    var tl = Digests.get(alg)
    if (tl == null) {
      tl = ThreadLocal.withInitial[MessageDigest](() =>
        MessageDigest.getInstance(alg))
      Digests.putIfAbsent(alg, tl)
      tl = Digests.get(alg)
    }
    val d = tl.get()
    d.reset()
    d
  }

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = digest("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 (KSA + PRGA) — symmetric, so this is also the encryptor. */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var a = 0
    var b = 0
    var k = 0
    while (k < data.length) {
      a = (a + 1) & 0xff
      b = (b + s(a)) & 0xff
      val t = s(a); s(a) = s(b); s(b) = t
      out(k) = (data(k) ^ s((s(a) + s(b)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def intLE4(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Algorithm 2, empty user password: the file encryption key.
    * Step f (ISO 32000-1 §7.6.3.3): R4+ documents with
    * /EncryptMetadata false append 0xFFFFFFFF to the MD5 input —
    * omitting it mis-derives the key and a valid empty-password PDF
    * gets refused as password-protected. */
  def fileKey(o: Array[Byte], p: Int, id0: Array[Byte], r: Int,
      lenBits: Int, encryptMetadata: Boolean = true): Array[Byte] = {
    val n = if (r == 2) 5 else lenBits / 8
    val noMeta: Array[Byte] =
      if (r >= 4 && !encryptMetadata)
        Array(0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
      else Array.empty[Byte]
    var key = md5(Pad, o, intLE4(p), id0, noMeta).take(n)
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key).take(n); i += 1 }
    }
    key
  }

  /** Algorithm 3, empty owner AND user password: the /O entry. */
  def ownerEntry(r: Int, lenBits: Int): Array[Byte] = {
    val n = if (r == 2) 5 else lenBits / 8
    var tmp = md5(Pad) // padded empty owner password
    if (r >= 3) {
      var i = 0
      while (i < 50) { tmp = md5(tmp); i += 1 }
    }
    val rc4key = tmp.take(n)
    var o = rc4(rc4key, Pad) // padded empty user password
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        o = rc4(rc4key.map(b => (b ^ i).toByte), o)
        i += 1
      }
    }
    o
  }

  /** Algorithms 4 (R2) / 5 (R3+): the /U entry from the file key. */
  def userEntry(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var u = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      u ++ new Array[Byte](16) // 16 bytes of arbitrary padding
    }

  /** Algorithm 1: the per-object key (AESV2 appends the sAlT word). */
  def objKey(key: Array[Byte], num: Int, gen: Int, aes: Boolean)
      : Array[Byte] = {
    val ext = Array(
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else
      Array.emptyByteArray
    md5(key, ext, salt).take(math.min(key.length + 5, 16))
  }

  // Cipher.getInstance walks the JCE provider list every call — a real
  // cost when hash2B spins 64+ AES rounds per password check (the same
  // hoist HashExprs applies to MessageDigest). init() re-keys a cached
  // instance; Cipher is not thread-safe, hence ThreadLocal.
  private val PadCipher =
    ThreadLocal.withInitial[javax.crypto.Cipher](() =>
      javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding"))
  private val RawCipher =
    ThreadLocal.withInitial[javax.crypto.Cipher](() =>
      javax.crypto.Cipher.getInstance("AES/CBC/NoPadding"))

  private def aesCipher(mode: Int, key: Array[Byte], iv: Array[Byte]) = {
    val c = PadCipher.get()
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c
  }

  /** Decrypt one stream/string payload with an object key. Corrupt AES
    * payloads (bad CBC padding) surface as the same loud
    * IllegalArgumentException as every other perimeter hit — crypto
    * exceptions never escape to the caller. */
  def decrypt(ok: Array[Byte], data: Array[Byte], aes: Boolean)
      : Array[Byte] =
    if (!aes) rc4(ok, data)
    else {
      require(data.length >= 32 && data.length % 16 == 0,
        s"AES payload of ${data.length} bytes is not IV + CBC blocks")
      val iv = java.util.Arrays.copyOf(data, 16)
      try aesCipher(javax.crypto.Cipher.DECRYPT_MODE, ok, iv)
        .doFinal(data, 16, data.length - 16)
      catch {
        case e: java.security.GeneralSecurityException =>
          throw new IllegalArgumentException(
            s"corrupt AES stream: ${e.getMessage}")
      }
    }

  /** Encrypt one payload (fixture side). AES uses a deterministic IV
    * derived from the object key — fixtures must be byte-reproducible
    * across runs for the driver hash, and IV secrecy is not a goal of
    * a test fixture. */
  def encrypt(ok: Array[Byte], data: Array[Byte], aes: Boolean)
      : Array[Byte] =
    if (!aes) rc4(ok, data)
    else {
      val iv = md5(ok).take(16)
      iv ++ aesCipher(javax.crypto.Cipher.ENCRYPT_MODE, ok, iv)
        .doFinal(data)
    }

  // --- AES-256 / R6 (ISO 32000-2 §7.6.4.3.3-4, the Acrobat X+ handler) —

  private def sha(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = digest(s"SHA-$bits")
    parts.foreach(d.update)
    d.digest()
  }

  private def aesNoPad(encrypt: Boolean, key: Array[Byte],
      iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = RawCipher.get()
    c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
           else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Algorithm 2.B — the hardened hash: SHA-256 seed, then rounds of
    * (pw∥K∥udata)×64 through AES-128-CBC keyed by K, hash choice by
    * the first 16 bytes' sum mod 3, until round ≥ 64 and the last
    * cipher byte ≤ round − 32. */
  def hash2B(pw: Array[Byte], salt: Array[Byte], udata: Array[Byte])
      : Array[Byte] = {
    var k = sha(256, pw, salt, udata)
    var round = 0
    var done = false
    var lastByte = 0
    while (!done) {
      val block = pw ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      val e = aesNoPad(encrypt = true, java.util.Arrays.copyOf(k, 16),
        java.util.Arrays.copyOfRange(k, 16, 32), k1)
      var sum = 0
      var j = 0
      while (j < 16) { sum += e(j) & 0xff; j += 1 }
      k = sha(256 + (sum % 3) * 128, e)
      lastByte = e(e.length - 1) & 0xff
      round += 1
      done = round >= 64 && lastByte <= round - 32
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** Wrap a 32-byte file key for /UE or /OE: AES-256-CBC, zero IV, no
    * padding, keyed by the intermediate hash (§7.6.4.4.7). */
  def aes256WrapKey(intermediate: Array[Byte], fileKey: Array[Byte])
      : Array[Byte] =
    aesNoPad(encrypt = true, intermediate, new Array[Byte](16), fileKey)

  /** The /Perms block: P ∥ 0xFFFFFFFF ∥ 'T' (EncryptMetadata) ∥ 'adb'
    * ∥ 4 fixed bytes, AES-256-ECB under the file key (§7.6.4.4.9). */
  def permsEntry(fileKey: Array[Byte], p: Int): Array[Byte] = {
    val block = intLE4(p) ++ Array[Byte](-1, -1, -1, -1) ++
      "Tadbgrft".getBytes("US-ASCII")
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
    c.doFinal(block)
  }

  /** Verify the empty user password against a 48-byte R6 /U and unwrap
    * the 256-bit file key from /UE. Loud on a real password. */
  def r6FileKey(u: Array[Byte], ue: Array[Byte]): Array[Byte] = {
    require(u.length == 48 && ue.length == 32,
      s"malformed R6 /U (${u.length}) or /UE (${ue.length})")
    val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
    val kSalt = java.util.Arrays.copyOfRange(u, 40, 48)
    val empty = Array.emptyByteArray
    require(java.util.Arrays.equals(
      hash2B(empty, vSalt, empty), java.util.Arrays.copyOf(u, 32)),
      "user password verification failed — this PDF requires a non-empty " +
        "password, which is outside the decode perimeter")
    aesNoPad(encrypt = false, hash2B(empty, kSalt, empty),
      new Array[Byte](16), ue)
  }

  /** A parsed, verified encryption context. R6 (AES-256) encrypts every
    * object under the FILE key directly; earlier revisions derive a
    * per-object key. */
  final case class Ctx(r: Int, v: Int, lenBits: Int, aes: Boolean,
      key: Array[Byte]) {
    def decryptStream(num: Int, gen: Int, data: Array[Byte])
        : Array[Byte] =
      if (r == 6) decrypt(key, data, aes = true)
      else decrypt(objKey(key, num, gen, aes), data, aes)
  }

  // --- dict-string parsing -------------------------------------------

  /** PDF string object at `raw(at)`: literal (...) with escapes or hex
    * <...>; returns (bytes, endIndex). §7.3.4. */
  private[graft] def pdfString(raw: String, at: Int)
      : (Array[Byte], Int) = raw.charAt(at) match {
    case '(' =>
      val out = new java.io.ByteArrayOutputStream()
      var i = at + 1
      var depth = 1
      while (depth > 0) {
        require(i < raw.length, "unterminated literal string")
        raw.charAt(i) match {
          case '\\' =>
            require(i + 1 < raw.length, "dangling escape")
            raw.charAt(i + 1) match {
              case 'n' => out.write('\n'); i += 2
              case 'r' => out.write('\r'); i += 2
              case 't' => out.write('\t'); i += 2
              case 'b' => out.write('\b'); i += 2
              case 'f' => out.write('\f'); i += 2
              case '(' => out.write('('); i += 2
              case ')' => out.write(')'); i += 2
              case '\\' => out.write('\\'); i += 2
              case '\n' => i += 2 // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = 0
                var k = i + 1
                while (k < raw.length && k < i + 4 &&
                  raw.charAt(k) >= '0' && raw.charAt(k) <= '7') {
                  v = v * 8 + (raw.charAt(k) - '0')
                  k += 1
                }
                out.write(v & 0xff)
                i = k
              case other => out.write(other); i += 2 // spec: drop the \
            }
          case '(' => depth += 1; out.write('('); i += 1
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(')')
            i += 1
          case c => out.write(c); i += 1
        }
      }
      (out.toByteArray, i)
    case '<' =>
      val end = raw.indexOf('>', at)
      require(end > at, "unterminated hex string")
      val hex = raw.substring(at + 1, end).filterNot(_.isWhitespace)
      val padded = if (hex.length % 2 == 1) hex + "0" else hex
      (padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
        end + 1)
    case c =>
      throw new IllegalArgumentException(s"expected PDF string, got '$c'")
  }

  private val EncryptRef =
    """/Encrypt\s+(\d+)\s+(\d+)\s+R""".r
  private val IdEntry = """/ID\s*\[\s*""".r
  private def intEntry(dict: String, name: String): Option[Int] =
    (name + """\s+(-?\d+)""").r.findFirstMatchIn(dict).map(_.group(1).toInt)

  /** The dictionary with every nested `<< … >>` sub-dictionary (and
    * the contents of literal/hex strings, where `<<`/`>>` byte pairs
    * can occur freely) blanked out — so intEntry probes match only
    * TOP-LEVEL keys. Offsets are NOT preserved; use only for scalar
    * probes, never for strEntryAt/pdfString positions. */
  private def topLevel(dict: String): String = {
    val sb = new StringBuilder(dict.length)
    var i = 0
    var depth = 0
    while (i < dict.length) {
      val c = dict.charAt(i)
      if (c == '<' && i + 1 < dict.length && dict.charAt(i + 1) == '<') {
        depth += 1; i += 2
      } else if (c == '>' && i + 1 < dict.length &&
          dict.charAt(i + 1) == '>' && depth > 0) {
        depth -= 1; i += 2
      } else if (c == '<') { // hex string: skip to its closing '>'
        val close = dict.indexOf('>', i + 1)
        i = if (close < 0) dict.length else close + 1
      } else if (c == '(') { // literal string: skip, honoring \-escapes
        i += 1
        while (i < dict.length && dict.charAt(i) != ')') {
          if (dict.charAt(i) == '\\') i += 1
          i += 1
        }
        i += 1
      } else {
        if (depth == 1) sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
  private def strEntryAt(dict: String, name: String): Option[Int] = {
    // the name must END at the key (so "/U" cannot match inside "/UE")
    val m = (name + """(?![A-Za-z0-9])\s*""").r.findFirstMatchIn(dict)
    m.map(mm => mm.end)
  }

  /** Detect and verify encryption on a raw (ISO-8859-1-decoded) PDF.
    * Returns None for unencrypted documents. Refuses loudly on: a
    * non-Standard filter, V/R outside {1,2}/{2,3}, {4 with AESV2} and
    * {5/6 with AESV3}, a missing /ID (≤R4), or a /U that does not
    * verify against the EMPTY user password. A truncated dictionary
    * surfaces as the same loud IllegalArgumentException. */
  def parse(raw: String): Option[Ctx] =
    try parse0(raw)
    catch {
      case _: StringIndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          "truncated encryption dictionary or trailer")
    }

  private def parse0(raw: String): Option[Ctx] = {
    // only the trailer dictionary can carry /Encrypt — scanning the whole
    // byte stream would false-positive on a raw content stream whose TEXT
    // mentions the pattern. (Encrypted xref-STREAM documents have no
    // `trailer` keyword; they go undetected here and surface downstream
    // as a loud filter failure on ciphertext — outside the perimeter.)
    val trailerAt = raw.lastIndexOf("trailer")
    if (trailerAt < 0) return None
    val encRef = EncryptRef.findFirstMatchIn(raw.substring(trailerAt))
    if (encRef.isEmpty) return None
    val (num, gen) = (encRef.get.group(1), encRef.get.group(2))
    // the encryption dict: `num gen obj << ... >>` — the lookbehind
    // stops "5 0 obj" from matching inside "15 0 obj"
    val objPat = (s"""(?s)(?<![0-9])$num\\s+$gen\\s+obj\\s*<<""").r
    val m = objPat.findFirstMatchIn(raw).getOrElse(
      throw new IllegalArgumentException(
        s"/Encrypt $num $gen R names a missing object"))
    val dictStart = m.end - 2
    val dictEnd = raw.indexOf("endobj", dictStart)
    require(dictEnd > dictStart, "unterminated encryption dictionary")
    val dict = raw.substring(dictStart, dictEnd)
    require(dict.contains("/Filter") && dict.contains("/Standard"),
      "non-Standard security handler is outside the decode perimeter")
    // integer probes scan only the TOP-LEVEL entries: a V4 dict's /CF
    // crypt-filter sub-dictionary carries its own /Length (in BYTES,
    // e.g. 16) and if it precedes the top-level entry a first-match
    // scan mis-derives the key length (r12 advice)
    val top = topLevel(dict)
    val v = intEntry(top, "/V").getOrElse(0)
    val r = intEntry(top, "/R").getOrElse(0)
    val lenBits = intEntry(top, "/Length").getOrElse(40)
    val encMeta =
      """/EncryptMetadata\s+false""".r.findFirstIn(top).isEmpty
    val aes = v == 4 && dict.contains("/AESV2")
    val aes256 = v == 5 && r == 6 && dict.contains("/AESV3")
    if (aes256) {
      // R6: the key unwraps from /U //UE; /ID plays no role
      val u = strEntryAt(dict, "/U").map(at => pdfString(dict, at)._1)
        .getOrElse(throw new IllegalArgumentException("no /U entry"))
      val ue = strEntryAt(dict, "/UE").map(at => pdfString(dict, at)._1)
        .getOrElse(throw new IllegalArgumentException("no /UE entry"))
      return Some(Ctx(6, 5, 256, aes = true, r6FileKey(u, ue)))
    }
    require((v == 1 || v == 2) && (r == 2 || r == 3) || aes && r == 4,
      s"encryption V=$v R=$r is outside the decode perimeter " +
        "(RC4 V1/V2 R2/R3, AESV2 V4/R4, AESV3 V5/R6 supported)")
    val o = strEntryAt(dict, "/O").map(at => pdfString(dict, at)._1)
      .getOrElse(throw new IllegalArgumentException("no /O entry"))
    val u = strEntryAt(dict, "/U").map(at => pdfString(dict, at)._1)
      .getOrElse(throw new IllegalArgumentException("no /U entry"))
    val p = intEntry(top, "/P").getOrElse(
      throw new IllegalArgumentException("no /P entry"))
    require(o.length == 32 && u.length == 32,
      s"malformed /O (${o.length}) or /U (${u.length}) entry")
    // first file identifier from the trailer (same region as /Encrypt)
    val idAt = IdEntry.findFirstMatchIn(raw.substring(trailerAt))
      .map(_.end + trailerAt).getOrElse(
        throw new IllegalArgumentException(
          "encrypted PDF without a /ID file identifier"))
    val id0 = pdfString(raw, idAt)._1
    val kr = if (r == 4) 3 else r // R4 /U verification matches R3
    // fileKey takes the TRUE revision: its r==2/r>=3 branches already
    // treat R4 like R3, and the /EncryptMetadata step is R4-gated
    val key = fileKey(o, p, id0, r, lenBits, encMeta)
    val expectU = userEntry(key, id0, kr)
    val ok = if (r == 2) java.util.Arrays.equals(expectU, u)
    else java.util.Arrays.equals(expectU.take(16), u.take(16))
    require(ok,
      "user password verification failed — this PDF requires a non-empty " +
        "password, which is outside the decode perimeter")
    Some(Ctx(r, v, lenBits, aes, key))
  }
}

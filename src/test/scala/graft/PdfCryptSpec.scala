package graft

import graft.ingest.{PdfCodec, PdfCrypt}

/** The PDF standard security handler: published-vector RC4, all three
  * supported modes roundtripping real encrypted documents end-to-end
  * through PdfCodec.decode, string-object parsing, and the loud
  * perimeter (real passwords, tampered /U, unknown V/R, missing /ID). */
class PdfCryptSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("RC4 matches the classic published test vectors") {
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    // the three canonical RC4 vectors (key, plaintext, ciphertext)
    assert(hex(PdfCrypt.rc4("Key".getBytes, "Plaintext".getBytes)) ==
      "bbf316e8d940af0ad3")
    assert(hex(PdfCrypt.rc4("Wiki".getBytes, "pedia".getBytes)) ==
      "1021bf0420")
    assert(hex(PdfCrypt.rc4("Secret".getBytes,
      "Attack at dawn".getBytes)) == "45a01f645fc35b383552544b9bf5")
    // symmetry: decrypt == encrypt
    val ct = PdfCrypt.rc4("k".getBytes, "round trip".getBytes)
    assert(new String(PdfCrypt.rc4("k".getBytes, ct)) == "round trip")
  }

  test("O/U/file-key derivation matches independently-computed vectors") {
    // pinned from a from-the-spec Python model (hashlib + textbook RC4)
    // run against ISO 32000-1 Algorithms 2/3/4/5 with empty passwords,
    // P = -44, ID = MD5("fixture-id")
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    val id0 = PdfCrypt.md5("fixture-id".getBytes)
    val o2 = PdfCrypt.ownerEntry(2, 40)
    val k2 = PdfCrypt.fileKey(o2, -44, id0, 2, 40)
    assert(hex(o2).startsWith("2055c756c72e1ad7"))
    assert(hex(k2) == "72533cd400")
    assert(hex(PdfCrypt.userEntry(k2, id0, 2)).startsWith("e4e6bda2a04f6a7e"))
    val o3 = PdfCrypt.ownerEntry(3, 128)
    val k3 = PdfCrypt.fileKey(o3, -44, id0, 3, 128)
    assert(hex(o3).startsWith("36451bd39d753b7c"))
    assert(hex(k3) == "c47702ddce1930e17debe2952f5cc148")
    assert(hex(PdfCrypt.userEntry(k3, id0, 3)).startsWith("42d92bb24d9ac87f"))
  }

  test("hash2B (R6 hardened hash) matches independently-computed vectors") {
    // pinned from a from-the-spec Python model (hashlib + the
    // `cryptography` package's AES) of ISO 32000-2 Algorithm 2.B
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    val empty = Array.emptyByteArray
    assert(hex(PdfCrypt.hash2B(empty, new Array[Byte](8), empty)) ==
      "439feba099a63d0d035a1e5fb67ff307329189584956425aff2d3bd3d15edc60")
    assert(hex(PdfCrypt.hash2B(empty,
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), empty)) ==
      "8d1efb4f1bdbb651341704c2139de4f6be05d6d4609af56916b21646ed74825c")
    assert(hex(PdfCrypt.hash2B(empty, new Array[Byte](8),
      "user-data-48-bytes".padTo(48, 'x').getBytes("US-ASCII"))) ==
      "a511d6652275245282fe91718acb03160e27996efe44ba857fc8eb44a4f9251c")
  }

  test("all four modes roundtrip through PdfCodec.decode") {
    val lines = Seq("Name: Crypt Test", "Venue: (Secure) \\ Hall",
      "body text with specials <>&")
    for (mode <- Seq("rc4-40", "rc4-128", "aes-128", "aes-256")) {
      val bytes = PdfCodec.encodeEncrypted(lines, mode)
      // the ciphertext must NOT contain the plaintext marker
      assert(!new String(bytes, "ISO-8859-1").contains("Crypt Test"),
        s"$mode left plaintext in the document")
      val got = PdfCodec.decode(bytes)
      assert(got == lines, s"$mode: $got")
    }
  }

  test("R4 /EncryptMetadata false derives the 0xFFFFFFFF-salted key") {
    // Algorithm 2 step f (r12 advice): such documents are common in
    // the wild; without the 4×0xFF MD5 salt they mis-verify as
    // password-protected
    val lines = Seq("Name: NoMeta Test", "body")
    val bytes = PdfCodec.encodeEncrypted(lines, "aes-128",
      encryptMetadata = false)
    assert(new String(bytes, "ISO-8859-1")
      .contains("/EncryptMetadata false"))
    assert(PdfCodec.decode(bytes) == lines)
    // the salted key differs from the unsalted one: a reader ignoring
    // the flag must NOT open the document
    val unsalted = PdfCodec.encodeEncrypted(lines, "aes-128")
    assert(!java.util.Arrays.equals(bytes, unsalted))
  }

  test("/CF sub-dictionary /Length before the top-level entry") {
    // V4 dicts carry /Length 16 (BYTES) inside /CF — a first-match
    // scan that hits it derives an 8×-short key (r12 advice); the
    // top-level probe must skip nested << >> regions
    val lines = Seq("Name: CF Order", "body")
    val bytes = PdfCodec.encodeEncrypted(lines, "aes-128")
    val raw = new String(bytes, "ISO-8859-1")
    val cf = "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen " +
      "/Length 16 >> >> /StmF /StdCF /StrF /StdCF"
    val before = s"/Length 128 $cf"
    assert(raw.contains(before), "fixture dict layout drifted")
    // same-length reorder: xref offsets stay valid
    val swapped = raw.replace(before, s"$cf /Length 128")
    assert(swapped.length == raw.length)
    assert(PdfCodec.decode(swapped.getBytes("ISO-8859-1")) == lines)
  }

  test("fixtures are deterministic byte-for-byte (driver-hash premise)") {
    for (mode <- Seq("rc4-40", "rc4-128", "aes-128", "aes-256")) {
      val a = PdfCodec.encodeEncrypted(Seq("same input"), mode)
      val b = PdfCodec.encodeEncrypted(Seq("same input"), mode)
      assert(java.util.Arrays.equals(a, b), mode)
    }
  }

  test("R6: a real (non-empty) user password refuses loudly") {
    val bytes = PdfCodec.encodeEncrypted(Seq("secret"), "aes-256")
    val raw = new String(bytes, "ISO-8859-1")
    val uAt = raw.indexOf("/U <")
    assert(uAt > 0)
    val tampered = bytes.clone()
    tampered(uAt + 4) =
      (if (bytes(uAt + 4) == '0') '1' else '0').toByte
    val e = intercept[IllegalArgumentException](PdfCodec.decode(tampered))
    assert(e.getMessage.contains("password"), e.getMessage)
  }

  test("a real (non-empty) user password refuses loudly") {
    // tamper /U so the empty-password verification fails — equivalent to
    // a document encrypted under a real password
    val bytes = PdfCodec.encodeEncrypted(Seq("secret"), "rc4-128")
    val raw = new String(bytes, "ISO-8859-1")
    val uAt = raw.indexOf("/U <")
    assert(uAt > 0)
    val tampered = bytes.clone()
    // flip one hex digit of /U
    tampered(uAt + 4) =
      (if (bytes(uAt + 4) == '0') '1' else '0').toByte
    val e = intercept[IllegalArgumentException](PdfCodec.decode(tampered))
    assert(e.getMessage.contains("password"), e.getMessage)
  }

  test("unknown V/R and missing /ID refuse loudly") {
    val bytes = PdfCodec.encodeEncrypted(Seq("x"), "rc4-128")
    val raw = new String(bytes, "ISO-8859-1")
    val v5 = raw.replace("/V 2 /R 3", "/V 5 /R 6")
    val e1 = intercept[IllegalArgumentException](
      PdfCodec.decode(v5.getBytes("ISO-8859-1")))
    assert(e1.getMessage.contains("perimeter"), e1.getMessage)
    val noId = raw.replace("/ID", "/XD")
    val e2 = intercept[IllegalArgumentException](
      PdfCodec.decode(noId.getBytes("ISO-8859-1")))
    assert(e2.getMessage.contains("/ID"), e2.getMessage)
  }

  test("unencrypted documents are untouched (parse returns None)") {
    assert(PdfCrypt.parse(new String(
      PdfCodec.encode(Seq("plain")), "ISO-8859-1")).isEmpty)
    // an unencrypted doc whose TEXT mentions the pattern stays unencrypted
    val sly = PdfCodec.encode(Seq("see /Encrypt 5 0 R for details"),
      compress = false)
    assert(PdfCrypt.parse(new String(sly, "ISO-8859-1")).isEmpty)
    assert(PdfCodec.decode(sly).head.contains("/Encrypt 5 0 R"))
  }

  test("decoy object numbers and 'obj' words inside strings don't misbind") {
    val enc = PdfCodec.encodeEncrypted(Seq("bind to the right object"),
      "rc4-128")
    val raw = new String(enc, "ISO-8859-1")
    // a decoy object whose number ENDS in the /Encrypt ref's number:
    // "15 0 obj" must not satisfy a lookup for "5 0 obj"
    val decoyed = raw.replace("1 0 obj",
      "15 0 obj << /Filter /Standard /V 9 /R 9 >> endobj\n1 0 obj")
    assert(PdfCodec.decode(decoyed.getBytes("ISO-8859-1"))
      .contains("bind to the right object"))
    // the word "object" inside a dict STRING right before the stream:
    // the owning-object backward scan must skip it
    val worded = raw.replace(" /Filter /FlateDecode",
      " /T (my object) /Filter /FlateDecode")
    assert(worded != raw)
    assert(PdfCodec.decode(worded.getBytes("ISO-8859-1"))
      .contains("bind to the right object"))
  }

  test("pdf string parsing: escapes, octal, nesting, hex") {
    def p(s: String): Array[Byte] = PdfCrypt.pdfString(s, 0)._1
    assert(new String(p("(abc)")) == "abc")
    assert(new String(p("(a\\(b\\)c)")) == "a(b)c")
    assert(new String(p("(a(nested)c)")) == "a(nested)c")
    assert(p("(\\101\\102)").toSeq == "AB".getBytes.toSeq)
    assert(new String(p("(tab\\there)")) == "tab\there")
    assert(p("<41 42 4>").toSeq ==
      Seq[Byte](0x41, 0x42, 0x40)) // odd hex pads with 0
    intercept[IllegalArgumentException](p("(unterminated"))
  }

  test("AES payload shape violations refuse loudly") {
    val ok = PdfCrypt.objKey(new Array[Byte](16), 4, 0, aes = true)
    intercept[IllegalArgumentException](
      PdfCrypt.decrypt(ok, new Array[Byte](17), aes = true))
    // corrupt padding: crypto exceptions must not escape the perimeter
    intercept[IllegalArgumentException](
      PdfCrypt.decrypt(ok, new Array[Byte](48), aes = true))
  }

  test("fuzz: bit-flipped encrypted PDFs refuse with IAE, never crash") {
    for (mode <- Seq("rc4-128", "aes-128", "aes-256")) {
      val enc = PdfCodec.encodeEncrypted(Seq("fuzz target body"), mode)
      var decoded = 0
      var refused = 0
      for (pos <- enc.indices by 11) {
        val mut = enc.clone()
        mut(pos) = (mut(pos) ^ 0x40).toByte
        try {
          PdfCodec.decode(mut)
          decoded += 1
        } catch {
          case _: IllegalArgumentException => refused += 1
          // RC4 garbage reaching the inflater surfaces as its checked
          // stream exception via decodeFiltered's loud perimeter — any
          // OTHER exception type fails the suite
        }
      }
      assert(refused > 0, s"$mode: no corruption was caught")
    }
  }
}

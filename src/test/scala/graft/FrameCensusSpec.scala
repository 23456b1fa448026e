package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{AacCodec, H264Codec}

/** The r13 census codecs: synth→scan roundtrips, header-field
  * recovery, and the loud perimeter (desync, truncation, reserved
  * values). Censuses never decode payloads — the spec pins the walk
  * geometry, which is all the registered queries rely on. */
class FrameCensusSpec extends AnyFunSuite {

  test("AAC: synth→scan recovers every frame across the field grid") {
    val specs = for {
      profile <- 0 to 3
      channels <- Seq(1, 2, 6, 7)
      len <- Seq(1, 31, 200)
    } yield (profile, channels, len)
    val frames = AacCodec.scan(AacCodec.synth(specs, sampleRateIdx = 4))
    assert(frames.length == specs.length)
    frames.zip(specs).foreach { case (f, (p, c, l)) =>
      assert(f.profile == p && f.channels == c && f.frameBytes == 7 + l)
      assert(f.sfi == 4 && f.rawDataBlocks == 1)
    }
    // offsets chain exactly
    assert(frames.sliding(2).forall {
      case Seq(a, b) => b.offset == a.offset + a.frameBytes
      case _ => true
    })
  }

  test("AAC: ID3v2 prefix is skipped; first frame lands at its end") {
    val bytes = AacCodec.synth(Seq((1, 2, 10)), 4, id3Bytes = 43)
    val frames = AacCodec.scan(bytes)
    assert(frames.length == 1 && frames.head.offset == 43)
  }

  test("AAC perimeter: desync, truncation, reserved index are loud") {
    val good = AacCodec.synth(Seq((1, 2, 10), (2, 1, 5)))
    // flip the second frame's syncword
    val desync = good.clone(); desync(17) = 0
    val e1 = intercept[IllegalArgumentException](AacCodec.scan(desync))
    assert(e1.getMessage.contains("desync"), e1.getMessage)
    // truncate inside the last frame
    val e2 = intercept[IllegalArgumentException](
      AacCodec.scan(good.take(good.length - 2)))
    assert(e2.getMessage.contains("EOF"), e2.getMessage)
    // reserved sampling_frequency_index 15
    val resv = AacCodec.synth(Seq((1, 2, 10))).clone()
    resv(2) = ((resv(2) & 0xc3) | (15 << 2)).toByte
    val e3 = intercept[IllegalArgumentException](AacCodec.scan(resv))
    assert(e3.getMessage.contains("sampling_frequency_index"),
      e3.getMessage)
  }

  test("H264: synth→scan recovers SPS/PPS + slices with types/sizes") {
    val slices = Seq((1, 5), (5, 24), (1, 1), (6, 12))
    val nals = H264Codec.scan(H264Codec.synth(slices))
    assert(nals.length == slices.length + 2)
    assert(nals(0).nalType == H264Codec.TypeSps && nals(0).nalBytes == 7)
    assert(nals(1).nalType == H264Codec.TypePps && nals(1).nalBytes == 4)
    nals.drop(2).zip(slices).foreach { case (n, (t, l)) =>
      assert(n.nalType == t && n.nalBytes == 1 + l)
      assert(n.refIdc == (if (t == 5) 3 else 2))
    }
  }

  test("H264: 4-byte and 3-byte start codes both delimit") {
    val bytes = H264Codec.synth(Seq((1, 3)))
    // leading code is 4 bytes: first NAL header at offset 4
    assert(H264Codec.scan(bytes).head.offset == 4)
  }

  test("AVI census: fourcc + geometry + raw chunks, no decode") {
    import graft.multimodal.AviCodec
    val payloads = Seq(
      H264Codec.synth(Seq((5, 9)), paramSets = true),
      H264Codec.synth(Seq((1, 4)), paramSets = false))
    val avi = AviCodec.encodeStream(16, 16, 25, "H264", payloads)
    val (fourcc, w, h, fps, chunks) = AviCodec.census(avi)
    assert(fourcc == "H264" && w == 16 && h == 16 && fps == 25)
    assert(chunks.length == 2)
    assert(chunks.zip(payloads).forall { case (c, p) =>
      java.util.Arrays.equals(c, p) })
    // the chunk payloads route straight into the NAL census
    val nals = chunks.map(H264Codec.scan)
    assert(nals.head.map(_.nalType) == Seq(7, 8, 5))
    assert(nals(1).map(_.nalType) == Seq(1))
    // an MJPG AVI censuses with its own fourcc (routing key)
    val mj = AviCodec.encodeMjpg(16, 8,
      Seq(Array.fill[Byte](16 * 8)(42)), 10)
    assert(AviCodec.census(mj)._1 == "MJPG")
    // truncation is loud, like the decoders
    intercept[IllegalArgumentException](
      AviCodec.census(avi.take(avi.length / 2)))
  }

  test("SafeDecode.attempt: loud codecs become typed rows") {
    import graft.multimodal.{SafeDecode, JpegCodec, G711Codec, AviCodec}
    val jpeg = JpegCodec.encodeGray(8, 8, Array.fill[Byte](64)(7))
    assert(SafeDecode.attempt("jpeg")(
      JpegCodec.decodeGray(jpeg)).isRight)
    val broken = SafeDecode.attempt("jpeg")(
      JpegCodec.decodeGray(jpeg.take(jpeg.length * 3 / 5)))
    assert(broken.isLeft)
    assert(broken.swap.toOption.get.format == "jpeg")
    assert(broken.swap.toOption.get.error.nonEmpty)
    // WAV and AVI truncations quarantine the same way
    val wav = G711Codec.encodeWav(8000, 1, Array[Short](100, -200, 3), mu = true)
    assert(SafeDecode.attempt("wav")(
      G711Codec.decodeWav(wav.take(wav.length * 3 / 5))).isLeft)
    val avi = AviCodec.encodeMjpg(16, 8,
      Seq(Array.fill[Byte](16 * 8)(9)), 10)
    assert(SafeDecode.attempt("avi")(
      AviCodec.decodeMjpg(avi.take(avi.length * 3 / 5))).isLeft)
  }

  test("MP4: synth→census recovers brand/handler/codec/samples") {
    import graft.multimodal.Mp4Codec
    val v = Mp4Codec.census(Mp4Codec.synth(Seq(5, 64, 1), 40, video = true))
    assert(v.brand == "isom" && v.handler == "vide" && v.codec == "avc1")
    assert(v.nBoxes == 17 && v.nSamples == 3) // 17: stsc is mandatory
      // (§8.7.3.2.2) and the r14 synth writes it
    assert(v.timescale == 1000 && v.duration == 120)
    assert(v.mdatBytes == 8 + 5 + 64 + 1)
    val a = Mp4Codec.census(Mp4Codec.synth(Seq(2), 23, video = false))
    assert(a.handler == "soun" && a.codec == "mp4a" && a.duration == 23)
  }

  test("MP4: 64-bit largesize and size-0 (to-EOF) boxes walk") {
    import graft.multimodal.Mp4Codec
    val base = Mp4Codec.synth(Seq(4, 4), 40, video = true)
    // rewrite the trailing mdat's 32-bit size as a largesize box:
    // size=1 marker + 8-byte largesize (body grows by 8)
    val mdatAt = base.length - (8 + 8) // 8 hdr + 8 payload
    assert(new String(base, mdatAt + 4, 4, "US-ASCII") == "mdat")
    val pre = java.util.Arrays.copyOfRange(base, 0, mdatAt)
    val payload = java.util.Arrays.copyOfRange(base, mdatAt + 8, base.length)
    val b = java.nio.ByteBuffer.allocate(16 + payload.length)
    b.putInt(1); b.put("mdat".getBytes("US-ASCII"))
    b.putLong(16L + payload.length); b.put(payload)
    val large = pre ++ b.array()
    assert(Mp4Codec.census(large).mdatBytes == 16 + payload.length)
    // size-0: mdat extends to EOF
    val z = java.nio.ByteBuffer.allocate(8 + payload.length)
    z.putInt(0); z.put("mdat".getBytes("US-ASCII")); z.put(payload)
    val zero = pre ++ z.array()
    assert(Mp4Codec.census(zero).mdatBytes == 8 + payload.length)
  }

  test("MP4 perimeter: truncation and non-BMFF leaders are loud") {
    import graft.multimodal.Mp4Codec
    val bytes = Mp4Codec.synth(Seq(10, 10), 40, video = true)
    intercept[IllegalArgumentException](
      Mp4Codec.census(bytes.take(bytes.length / 2)))
    intercept[IllegalArgumentException](
      Mp4Codec.census("RIFFxxxxAVI LIST".getBytes("US-ASCII")))
    // and SafeDecode turns the truncation into a typed row
    import graft.multimodal.SafeDecode
    assert(SafeDecode.attempt("mp4")(
      Mp4Codec.census(bytes.take(bytes.length / 2))).isLeft)
  }

  test("WARC: synth→census roundtrips, gzip sniffs, statuses parse") {
    import graft.multimodal.WarcCodec
    val recs = Seq(
      ("warcinfo", "", "software: graft\r\n".getBytes("ISO-8859-1")),
      ("response", "https://x/1", WarcCodec.httpPayload(200, 10)),
      ("response", "https://x/2", WarcCodec.httpPayload(404, 3)),
      ("request", "https://x/2", "GET / HTTP/1.1\r\n".getBytes("ISO-8859-1")))
    for (gz <- Seq(false, true)) {
      val out = WarcCodec.census(WarcCodec.synth(recs, gzipped = gz))
      assert(out.length == 4, s"gz=$gz")
      assert(out.map(_.warcType) ==
        Seq("warcinfo", "response", "response", "request"))
      assert(out.map(_.httpStatus) == Seq(0, 200, 404, 0))
      assert(out(1).targetUri == "https://x/1")
      assert(out(1).contentLength ==
        WarcCodec.httpPayload(200, 10).length)
    }
  }

  test("WARC records + httpParts: payloads route onward intact") {
    import graft.multimodal.WarcCodec
    val body = "<html><head><title>T</title></head></html>"
      .getBytes("ISO-8859-1")
    val payload = WarcCodec.httpResponse(200,
      Seq("Content-Type" -> "text/html; charset=utf-8"), body)
    val recs = WarcCodec.records(WarcCodec.synth(Seq(
      ("warcinfo", "", "software: graft\r\n".getBytes("ISO-8859-1")),
      ("response", "https://x/p", payload)), gzipped = true))
    assert(recs.length == 2)
    val (meta, pl) = recs(1)
    assert(meta.httpStatus == 200 && meta.targetUri == "https://x/p")
    val (status, headers, got) = WarcCodec.httpParts(pl)
    assert(status == 200)
    assert(headers("content-type") == "text/html; charset=utf-8")
    assert(headers("content-length") == body.length.toString)
    assert(got.sameElements(body))
    // census stays the metadata view of the same walk
    assert(WarcCodec.census(WarcCodec.synth(Seq(
      ("response", "https://x/p", payload)))) == Seq(meta))
    // loud on a non-HTTP payload
    intercept[IllegalArgumentException](
      WarcCodec.httpParts("not http at all, way too long".getBytes))
  }

  test("httpParts: Transfer-Encoding chunked de-chunks exactly") {
    import graft.multimodal.WarcCodec
    val body = ("<html><head><title>Chunky</title></head>" +
      "<body><p>hello chunked world</p></body></html>")
      .getBytes("ISO-8859-1")
    for (cs <- Seq(1, 3, 7, 1000)) {
      val payload = WarcCodec.httpResponseChunked(200,
        Seq("Content-Type" -> "text/html"), body, cs)
      val (status, headers, got) = WarcCodec.httpParts(payload)
      assert(status == 200 && got.sameElements(body), s"chunkSize=$cs")
      assert(headers("transfer-encoding") == "chunked")
      assert(!headers.contains("content-length"))
    }
    val base = WarcCodec.httpResponseChunked(200, Nil, body, 5)
    // a chunk extension after ';' is legal and ignored
    val raw = new String(base, "ISO-8859-1")
    val withExt = raw.replaceFirst("\r\n5\r\n", "\r\n5;ext=1\r\n")
      .getBytes("ISO-8859-1")
    assert(WarcCodec.httpParts(withExt)._3.sameElements(body))
    // loud: truncated chunk, non-hex size, bytes after the 0-chunk
    intercept[IllegalArgumentException](
      WarcCodec.httpParts(base.take(base.length - 9)))
    val badHex = raw.replaceFirst("\r\n5\r\n", "\r\nzz\r\n")
      .getBytes("ISO-8859-1")
    intercept[IllegalArgumentException](WarcCodec.httpParts(badHex))
    intercept[IllegalArgumentException](WarcCodec.httpParts(
      base ++ "junk".getBytes("ISO-8859-1")))
  }

  test("httpParts: Content-Encoding gzip/deflate decode; stacking; perimeter") {
    import graft.multimodal.WarcCodec
    val body = ("<html><head><title>Coded</title></head>" +
      "<body><p>content coding round trip</p></body></html>")
      .getBytes("ISO-8859-1")
    // gzip, deflate, and gzip-then-chunked all hand back the page
    for ((coding, cs) <- Seq(("gzip", 0), ("deflate", 0), ("gzip", 4))) {
      val payload = WarcCodec.httpResponseCoded(200,
        Seq("Content-Type" -> "text/html"), body, coding, cs)
      val (status, headers, got) = WarcCodec.httpParts(payload)
      assert(status == 200 && got.sameElements(body),
        s"coding=$coding chunk=$cs")
      assert(headers("content-encoding") == coding)
    }
    // RAW-deflate tolerance (the server tail that skips the zlib
    // wrapper): build by hand with nowrap=true
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(body); d.finish()
    val bo = new java.io.ByteArrayOutputStream()
    val t = new Array[Byte](4096)
    while (!d.finished()) bo.write(t, 0, d.deflate(t))
    d.end()
    val rawDeflate = ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n" +
      s"Content-Length: ${bo.size()}\r\n\r\n").getBytes("ISO-8859-1") ++
      bo.toByteArray
    assert(WarcCodec.httpParts(rawDeflate)._3.sameElements(body))
    // loud: truncated gzip, a coding outside the carried set, and a
    // gzip header on a body without the magic
    val okGzip = WarcCodec.httpResponseCoded(200, Nil, body, "gzip")
    intercept[IllegalArgumentException](
      WarcCodec.httpParts(okGzip.take(okGzip.length - 6)))
    val br = ("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n" +
      "Content-Length: 4\r\n\r\nXXXX").getBytes("ISO-8859-1")
    assert(intercept[IllegalArgumentException](WarcCodec.httpParts(br))
      .getMessage.contains("br"))
    val lying = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Content-Length: 5\r\n\r\nplain").getBytes("ISO-8859-1")
    assert(intercept[IllegalArgumentException](WarcCodec.httpParts(lying))
      .getMessage.contains("1952"))
  }

  test("WARC revisit vocabulary: digest vector, header roundtrip") {
    import graft.multimodal.WarcCodec
    // the canonical empty-payload digest every WARC tool agrees on
    // (SHA-1 of zero bytes, RFC 4648 base32 unpadded)
    assert(WarcCodec.payloadDigest(Array.empty) ==
      "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    // 20 SHA-1 bytes = 160 bits = exactly 32 base32 chars, no pad
    val d = WarcCodec.payloadDigest("hello".getBytes("US-ASCII"))
    assert(d.startsWith("sha1:") && d.length == 5 + 32 &&
      d.drop(5).forall(c => (c >= 'A' && c <= 'Z') || (c >= '2' && c <= '7')))
    // revisit headers survive synth -> records
    val body = "payload bytes".getBytes("US-ASCII")
    val dig = WarcCodec.payloadDigest(body)
    val archive = WarcCodec.synthWithHeaders(Seq(
      ("response", "https://x/a",
        WarcCodec.httpResponse(200, Nil, body),
        Seq("WARC-Payload-Digest" -> dig)),
      ("revisit", "https://x/a2", Array.empty[Byte],
        Seq("WARC-Payload-Digest" -> dig,
          "WARC-Refers-To-Target-URI" -> "https://x/a"))))
    val recs = WarcCodec.records(archive)
    assert(recs.map(_._1.warcType) == Seq("response", "revisit"))
    assert(recs(0)._1.payloadDigest == dig &&
      recs(0)._1.refersToUri.isEmpty)
    assert(recs(1)._1.payloadDigest == dig &&
      recs(1)._1.refersToUri == "https://x/a" &&
      recs(1)._1.contentLength == 0)
  }

  test("WARC perimeter: truncation and bad version line are loud") {
    import graft.multimodal.WarcCodec
    val bytes = WarcCodec.synth(Seq(
      ("response", "https://x/1", WarcCodec.httpPayload(200, 50))))
    val e1 = intercept[IllegalArgumentException](
      WarcCodec.census(bytes.take(bytes.length - 10)))
    assert(e1.getMessage.contains("past EOF") ||
      e1.getMessage.contains("separator"), e1.getMessage)
    intercept[IllegalArgumentException](
      WarcCodec.census("HTTP/1.1 200 OK\r\n\r\n".getBytes("ISO-8859-1")))
    // a record with no Content-Length refuses
    val noCl = ("WARC/1.0\r\nWARC-Type: metadata\r\n\r\n" +
      "x\r\n\r\n").getBytes("ISO-8859-1")
    val e2 = intercept[IllegalArgumentException](WarcCodec.census(noCl))
    assert(e2.getMessage.contains("Content-Length"), e2.getMessage)
  }

  test("H264: trailing_zero_8bits padding never inflates nalBytes") {
    // extra zeros before a start code (and a zero run at EOF) are
    // framing, not NAL payload (Annex B §B.1.2) — the pre-r14 scan
    // charged them to the preceding NAL's nalBytes
    val clean = H264Codec.synth(Seq((1, 5), (5, 8)))
    val ref = H264Codec.scan(clean)
    // splice 3 padding zeros before the LAST slice's 3-byte start code
    // and 4 padding zeros at EOF
    val lastNal = ref.last
    val lastCodeAt = lastNal.offset - 3
    val padded = clean.take(lastCodeAt) ++ Array[Byte](0, 0, 0) ++
      clean.drop(lastCodeAt) ++ Array[Byte](0, 0, 0, 0)
    val out = H264Codec.scan(padded)
    assert(out.map(n => (n.refIdc, n.nalType, n.nalBytes)) ==
      ref.map(n => (n.refIdc, n.nalType, n.nalBytes)))
    // the padded stream's last header sits 3 bytes later; sizes equal
    assert(out.last.offset == lastNal.offset + 3)
  }

  test("MP4: truncated mvhd refuses loudly, never AIOOBE") {
    import graft.multimodal.Mp4Codec
    import java.nio.ByteBuffer
    // a file whose LAST box is an mvhd declaring fewer bytes than the
    // version-0 fixed fields need (r13 ADVICE: this threw a raw
    // ArrayIndexOutOfBoundsException instead of the codec family's
    // loud IllegalArgumentException)
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length)
      b.put(typ.getBytes("US-ASCII")); b.put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "isomxxxxisom".getBytes("US-ASCII"))
    for (short <- Seq(0, 2, 10, 19)) {
      val bad = ftyp ++ box("moov", box("mvhd", new Array[Byte](short)))
      val e = intercept[IllegalArgumentException](Mp4Codec.census(bad))
      assert(e.getMessage.contains("mvhd too small"), e.getMessage)
    }
    // and a version-1 mvhd with only version-0-sized fields refuses too
    val v1body = new Array[Byte](20); v1body(0) = 1
    val badV1 = ftyp ++ box("moov", box("mvhd", v1body))
    val e = intercept[IllegalArgumentException](Mp4Codec.census(badV1))
    assert(e.getMessage.contains("mvhd too small"), e.getMessage)
  }

  test("MP4 sample routing: stsc/stco/stsz expansion feeds NAL census") {
    import graft.multimodal.Mp4Codec
    def slice(bytes: Array[Byte], s: Mp4Codec.SampleSlice) =
      java.util.Arrays.copyOfRange(bytes, s.offset.toInt,
        (s.offset + s.size).toInt)
    // video: AVCC length-prefixed samples (the real in-MP4 framing),
    // a multi-chunk layout so stsc expansion is genuinely exercised
    val samples = Seq(
      H264Codec.synthAvccSample(Seq((3, 7, 6), (3, 8, 3), (3, 5, 20))),
      H264Codec.synthAvccSample(Seq((2, 1, 9))),
      H264Codec.synthAvccSample(Seq((2, 1, 5), (0, 6, 4))),
      H264Codec.synthAvccSample(Seq((3, 5, 11))),
      H264Codec.synthAvccSample(Seq((2, 1, 2))))
    val mp4 = Mp4Codec.synthSamples(samples, 40, video = true,
      chunking = Seq(2, 1, 2))
    val (codec, slices) = Mp4Codec.sampleTable(mp4)
    assert(codec == "avc1" && slices.length == 5)
    slices.zip(samples).foreach { case (s, orig) =>
      assert(slice(mp4, s).sameElements(orig), s"sample ${s.sample}")
    }
    val nals = slices.map(s => H264Codec.scanAvcc(slice(mp4, s)))
    assert(nals.map(_.map(_.nalType)) ==
      Seq(Seq(7, 8, 5), Seq(1), Seq(1, 6), Seq(5), Seq(1)))
    // nalBytes = header + payload; the 4-byte length prefixes are
    // framing, never counted (8 NALs total)
    assert(nals.flatten.map(_.nalBytes).sum ==
      samples.map(_.length).sum - 4 * 8)
    // audio: ADTS-in-MP4 (the dirty-but-common shape some muxers
    // emit): each sample is one ADTS frame, routed to AacCodec.scan
    val aus = Seq((0, 1, 5), (1, 2, 9), (2, 1, 3))
      .map(s => AacCodec.synth(Seq(s)))
    val m4a = Mp4Codec.synthSamples(aus, 23, video = false,
      chunking = Seq(1, 2))
    val (c2, sl2) = Mp4Codec.sampleTable(m4a)
    assert(c2 == "mp4a" && sl2.length == 3)
    val frames = sl2.map(s => AacCodec.scan(slice(m4a, s)))
    assert(frames.map(_.length) == Seq(1, 1, 1))
    assert(frames.flatten.map(_.frameBytes) == Seq(12, 16, 10))
    assert(frames.flatten.map(_.profile) == Seq(0, 1, 2))
  }

  test("MP4 sample routing perimeter: disagreeing tables refuse") {
    import graft.multimodal.Mp4Codec
    val samples = Seq(
      H264Codec.synthAvccSample(Seq((3, 7, 6))),
      H264Codec.synthAvccSample(Seq((2, 1, 9))),
      H264Codec.synthAvccSample(Seq((2, 1, 4))))
    val mp4 = Mp4Codec.synthSamples(samples, 40, video = true,
      chunking = Seq(2, 1))
    // find the stsc box and bump the LAST run's samples_per_chunk so
    // the expansion overruns stsz
    val raw = new String(mp4, "ISO-8859-1")
    val stscAt = raw.indexOf("stsc")
    assert(stscAt > 0)
    val bad = mp4.clone()
    // entries start at stsc+4 (type) +8 (version+count); entry 1 is
    // (first=2, spc=1) at +12 bytes; its spc's low byte sits 7 bytes in
    val spcAt = stscAt + 4 + 8 + 12 + 7
    assert(bad(spcAt) == 1, s"fixture drift: spc byte is ${bad(spcAt)}")
    bad(spcAt) = 3
    val e = intercept[IllegalArgumentException](Mp4Codec.sampleTable(bad))
    assert(e.getMessage.contains("stsc"), e.getMessage)
    // AVCC perimeter: a NAL length that overruns its sample is loud
    val s0 = H264Codec.synthAvccSample(Seq((2, 1, 9)))
    intercept[IllegalArgumentException](
      H264Codec.scanAvcc(s0.take(s0.length - 2)))
    // a zero length field is loud
    intercept[IllegalArgumentException](
      H264Codec.scanAvcc(Array[Byte](0, 0, 0, 0, 0x41)))
    // chunking that does not cover the samples refuses at synth time
    intercept[IllegalArgumentException](
      Mp4Codec.synthSamples(samples, 40, video = true,
        chunking = Seq(2, 2)))
  }

  test("H264 SPS: synth→parse geometry roundtrip incl. cropping") {
    for ((p, l, mw, mh, cr, cb) <- Seq((66, 30, 8, 6, 0, 0),
        (77, 41, 4, 3, 1, 0), (88, 51, 1, 1, 1, 1))) {
      val sps = H264Codec.synthSps(p, l, mw, mh, cr, cb)
      val info = H264Codec.parseSps(sps.drop(1))
      assert(info == H264Codec.SpsInfo(p, l, mw * 16 - 2 * cr,
        mh * 16 - 2 * cb), s"$p/$l ${mw}x$mh")
    }
    // the classic real-world shape: 1920x1080 is 120×68 macroblocks
    // with frame_crop_bottom_offset 4 (1088 − 2·4 = 1080)
    val hd = H264Codec.parseSps(
      H264Codec.synthSps(77, 40, 120, 68, 0, 4).drop(1))
    assert(hd.width == 1920 && hd.height == 1080)
    // SPS NALs frame safely inside Annex B (emulation prevention):
    // small field values produce long zero runs in the payload
    val sps0 = H264Codec.synthSps(66, 10, 1, 1)
    val slice = H264Codec.synth(Seq((1, 5)), paramSets = false)
    val stream = Array[Byte](0, 0, 0, 1) ++ sps0 ++ slice
    val nals = H264Codec.scan(stream)
    assert(nals.length == 2 && nals.head.nalType == 7)
    assert(nals.head.nalBytes == sps0.length)
    val back = H264Codec.parseSps(stream.slice(nals.head.offset + 1,
      nals.head.offset + nals.head.nalBytes))
    assert(back == H264Codec.SpsInfo(66, 10, 16, 16))
    // perimeter: High-family profiles (chroma branch) refuse loudly
    val high = H264Codec.synthSps(100, 40, 8, 6)
    val e = intercept[IllegalArgumentException](
      H264Codec.parseSps(high.drop(1)))
    assert(e.getMessage.contains("profile"), e.getMessage)
    // truncation mid-field is loud
    intercept[IllegalArgumentException](
      H264Codec.parseSps(sps0.slice(1, 4)))
  }

  test("MP4 avcC: decoder config routes geometry and NAL framing") {
    import graft.multimodal.Mp4Codec
    val sps = H264Codec.synthSps(77, 40, 120, 68, 0, 4) // 1920x1080
    val samples = Seq(
      H264Codec.synthAvccSample(Seq((3, 5, 9))),
      H264Codec.synthAvccSample(Seq((2, 1, 4))))
    val mp4 = Mp4Codec.synthSamples(samples, 40, video = true,
      chunking = Seq(2), avcSps = Some(sps))
    val cfg = Mp4Codec.avcConfig(mp4).get
    assert(cfg.profile == 77 && cfg.level == 40 && cfg.lengthSize == 4)
    assert(cfg.sps.length == 1 && cfg.pps.length == 1)
    val info = H264Codec.parseSps(cfg.sps.head.drop(1))
    assert(info.width == 1920 && info.height == 1080)
    // the census and the sample walk still read the extended entry
    assert(Mp4Codec.census(mp4).codec == "avc1")
    val (codec, slices) = Mp4Codec.sampleTable(mp4)
    assert(codec == "avc1" && slices.length == 2)
    val nals = slices.map(s => H264Codec.scanAvcc(
      java.util.Arrays.copyOfRange(mp4, s.offset.toInt,
        (s.offset + s.size).toInt), cfg.lengthSize))
    assert(nals.map(_.map(_.nalType)) == Seq(Seq(5), Seq(1)))
    // audio / minimal entries carry no avcC
    assert(Mp4Codec.avcConfig(Mp4Codec.synth(Seq(3), 23,
      video = false)).isEmpty)
    assert(Mp4Codec.avcConfig(Mp4Codec.synth(Seq(3), 40,
      video = true)).isEmpty)
  }

  test("codec fuzz: mutated MP4/SPS bytes are loud or parse, never hang") {
    // the r14 parsers (xref-stream style discipline): any mutation
    // must either parse to SOMETHING or refuse with the family's
    // IllegalArgumentException — no raw AIOOBE, no negative-size
    // crash, no infinite walk
    import graft.multimodal.Mp4Codec
    val rnd = new scala.util.Random(1404)
    val sps = H264Codec.synthSps(77, 40, 120, 68, 0, 4)
    val mp4 = Mp4Codec.synthSamples(Seq(
      H264Codec.synthAvccSample(Seq((2, 1, 9))),
      H264Codec.synthAvccSample(Seq((3, 5, 4)))),
      40, video = true, chunking = Seq(1, 1), avcSps = Some(sps))
    (1 to 600).foreach { trial =>
      val video = trial % 2 == 0
      val base = if (video) mp4 else sps
      val m = base.clone()
      (0 to rnd.nextInt(4)).foreach(_ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      try {
        if (video) {
          Mp4Codec.avcConfig(m)
          Mp4Codec.sampleTable(m)
          Mp4Codec.census(m)
        } else H264Codec.parseSps(m.drop(1))
      } catch {
        case _: IllegalArgumentException => () // the loud contract
        case e: Throwable =>
          fail(s"trial $trial video=$video: ${e.getClass.getName} " +
            s"${e.getMessage}")
      }
    }
    // same contract for the tar and EBML walks (uncompressed shapes,
    // so mutations hit the parsers, not the gzip CRC)
    import graft.multimodal.{EbmlCodec, TarCodec}
    val tar = TarCodec.synth(Seq(
      ("a/", '5', Array.empty[Byte]),
      ("a/x.bin", '0', Array.tabulate[Byte](600)(i => (i % 251).toByte))))
    // the r15 extension surfaces fuzz too: PAX path+size records and
    // a GNU long name (the parsePax walk), laced size tables, zip64
    // locator/EOCD/extra indirection
    val tarPax = TarCodec.synthExt(Seq(
      ("deep/" + ("p" * 110) + "/a.bin", '0',
        Array.tabulate[Byte](300)(i => (i % 251).toByte), 'x'),
      ("deep/" + ("q" * 105) + "/b.bin", '0',
        Array.tabulate[Byte](80)(i => (i % 97).toByte), 'L'),
      ("sized.bin", '0',
        Array.tabulate[Byte](200)(i => (i % 89).toByte), 's')))
    val webm = EbmlCodec.synth("webm", 1000000L,
      Seq((1, "V_VP9"), (2, "A_OPUS")),
      Seq((0, 1, 10), (0, 2, 3), (1, 1, 7)))
    val webmLaced = EbmlCodec.synthLaced("webm", 1000000L,
      Seq((1, "V_VP9"), (2, "A_OPUS")),
      Seq((0, 1, Seq(10), 0), (0, 2, Seq(300, 255, 4), 1),
        (1, 2, Seq(6, 6, 6, 6), 2), (1, 1, Seq(100, 900, 3), 3)))
    import graft.multimodal.ZipCodec
    val zip = ZipCodec.synth(Seq(
      ("a.txt", "hello".getBytes("US-ASCII")),
      ("b.bin", Array.tabulate[Byte](90)(i => (i % 251).toByte))),
      comment = "c")
    val zip64 = ZipCodec.synth(Seq(
      ("a.txt", "hello".getBytes("US-ASCII")),
      ("b.bin", Array.tabulate[Byte](90)(i => (i % 251).toByte))),
      comment = "c", zip64 = true, zip64SizeEvery = 1)
    (1 to 1200).foreach { trial =>
      val which = trial % 6
      val m = (which match {
        case 0 => tar
        case 1 => webm
        case 2 => zip
        case 3 => tarPax
        case 4 => webmLaced
        case _ => zip64
      }).clone()
      (0 to rnd.nextInt(4)).foreach(_ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      try {
        which match {
          case 0 | 3 => TarCodec.census(m)
          case 1 | 4 => EbmlCodec.census(m)
          case _ => ZipCodec.census(m)
        }
      } catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"trial $trial which=$which: ${e.getClass.getName} " +
            s"${e.getMessage}")
      }
    }
  }

  test("tar census: ustar roundtrip, checksum verified, gzip sniffs") {
    import graft.multimodal.TarCodec
    val members = Seq(
      ("data/", '5', Array.empty[Byte]),
      ("data/a.bin", '0', Array.tabulate[Byte](700)(i => (i % 251).toByte)),
      ("data/b.txt", '0', "hello tar".getBytes("US-ASCII")),
      ("data/empty", '0', Array.empty[Byte]))
    for (gz <- Seq(false, true)) {
      val got = TarCodec.census(TarCodec.synth(members, gzipped = gz))
      assert(got == members.map { case (n, t, p) =>
        TarCodec.TarMember(n, t, p.length.toLong)
      }, s"gz=$gz")
    }
    val raw = TarCodec.synth(members)
    // 700 bytes pad to 1024: blocks = 4 headers + 2 + 0 + 1 + 2 end
    assert(raw.length == 512 * (4 + 2 + 0 + 1 + 2))
    // a flipped payload byte keeps the census green (data is opaque)…
    val dataFlip = raw.clone(); dataFlip(512 * 2 + 7) = 99
    assert(TarCodec.census(dataFlip).length == 4)
    // …but a flipped HEADER byte breaks the checksum loudly
    val hdrFlip = raw.clone(); hdrFlip(0) = 'X'
    val e = intercept[IllegalArgumentException](TarCodec.census(hdrFlip))
    assert(e.getMessage.contains("checksum"), e.getMessage)
    // truncation mid-member and missing end marker are loud
    intercept[IllegalArgumentException](
      TarCodec.census(raw.take(512 * 3 - 8)))
    intercept[IllegalArgumentException](
      TarCodec.census(raw.dropRight(512)))
  }

  test("tar census: PAX x/size, GNU L, and g-global extensions apply") {
    import graft.multimodal.TarCodec
    val longA = "deep/" + ("a" * 120) + "/file-a.bin"
    val longB = "deep/" + ("b" * 110) + "/file-b.bin"
    val data = Array.tabulate[Byte](700)(i => (i % 251).toByte)
    val members = Seq(
      ("plain.bin", '0', "hi".getBytes("US-ASCII"), ' '),
      (longA, '0', data, 'x'), // PAX path override
      (longB, '0', data.take(90), 'L'), // GNU long name
      ("sized.bin", '0', data.take(333), 's')) // PAX size, hdr size 0
    for (gz <- Seq(false, true)) {
      val got = TarCodec.census(TarCodec.synthExt(members, gz))
      assert(got == members.map { case (n, t, p, _) =>
        TarCodec.TarMember(n, t, p.length.toLong) }, s"gz=$gz")
    }
    // a PAX 'g' global applies to every later member lacking its own
    val g = {
      val out = new java.io.ByteArrayOutputStream()
      val recs = TarCodec.paxRecords(Seq("path" -> "global/name"))
      // build by hand: g header + 2 classic members
      out.write(TarCodec.synthExt(Seq(
        ("ignored", 'g', recs, ' '),
        ("m1", '0', "x".getBytes, ' '),
        ("m2", '0', "y".getBytes, ' '))))
      out.toByteArray
    }
    val gGot = TarCodec.census(g)
    assert(gGot.map(_.name) == Seq("global/name", "global/name"))
    // loud perimeter: malformed PAX record length / missing '=' /
    // dangling override / truncated long name
    intercept[IllegalArgumentException](
      TarCodec.parsePax("7 x=y\n".getBytes("US-ASCII"))) // len drift
    intercept[IllegalArgumentException](
      TarCodec.parsePax("6 xy~z\n".getBytes("US-ASCII"))) // no '='
    intercept[IllegalArgumentException](TarCodec.census(
      TarCodec.synthExt(Seq((longA, '0', data, 'x'))) match {
        case b => // drop the member that follows the x header:
          // keep x header block + its one data block + end marker
          b.take(512 * 2) ++ Array.fill[Byte](1024)(0)
      }))
    // non-decimal PAX size is loud
    val badSize = TarCodec.synthExt(Seq(("n", '0', Array[Byte](1), ' ')))
    val hand = {
      val recs = TarCodec.paxRecords(Seq("size" -> "12x4"))
      TarCodec.synthExt(Seq(("hdr", 'x', recs, ' '),
        ("m", '0', Array[Byte](1, 2), ' ')))
    }
    val e = intercept[IllegalArgumentException](TarCodec.census(hand))
    assert(e.getMessage.contains("non-decimal pax size"), e.getMessage)
    assert(TarCodec.census(badSize).length == 1)
  }

  test("EBML lacing: Xiph, fixed, EBML size tables counted exactly") {
    import graft.multimodal.EbmlCodec
    val tracks = Seq((1, "V_VP9"), (2, "A_OPUS"))
    // one block per mode, frame sizes chosen to exercise the 255-run
    // (Xiph needs a >=255 frame) and negative EBML deltas
    val blocks = Seq(
      (0, 1, Seq(10), 0), // none
      (0, 2, Seq(300, 255, 4), 1), // Xiph: 300 = 255+45, 255 = 255+0
      (1, 2, Seq(6, 6, 6, 6), 2), // fixed
      (1, 1, Seq(100, 900, 3), 3)) // EBML: +800 then -897
    val c = EbmlCodec.census(
      EbmlCodec.synthLaced("webm", 1000000L, tracks, blocks))
    assert(c.nBlocks == 4 && c.nFrames == 1 + 3 + 4 + 3)
    assert(c.frameBytes == 10L + (300 + 255 + 4) + 24 + (100 + 900 + 3))
    // fixed lacing with a non-divisible remainder is loud: in a
    // single-fixed-block file the nf byte sits exactly 25 bytes from
    // the end (1 nf + 24 frame bytes); bump 4 frames -> 5
    val fixedOnly = EbmlCodec.synthLaced("webm", 1000000L, tracks,
      Seq((0, 2, Seq(6, 6, 6, 6), 2)))
    val bad = fixedOnly.clone()
    bad(bad.length - 25) = 4 // nf-1: 3 -> 4
    val e = intercept[IllegalArgumentException](EbmlCodec.census(bad))
    assert(e.getMessage.contains("divisible"), e.getMessage)
    // a Xiph size table that overruns its block is loud: nf byte sits
    // before the 4-byte size table (255,45 then 255,0) + 559 frame
    // bytes; claiming 61 frames reads frame data as sizes and overruns
    val xiphOnly = EbmlCodec.synthLaced("webm", 1000000L, tracks,
      Seq((0, 2, Seq(300, 255, 4), 1)))
    val bad2 = xiphOnly.clone()
    bad2(bad2.length - 559 - 4 - 1) = 60
    intercept[IllegalArgumentException](EbmlCodec.census(bad2))
  }

  test("zip64: locator + EOCD record + 0x0001 extra resolve exactly") {
    import graft.multimodal.ZipCodec
    val members = Seq(
      ("a.txt", "hello zip64".getBytes("US-ASCII")),
      ("dir/b.bin", Array.tabulate[Byte](300)(i => (i % 251).toByte)),
      ("c", Array[Byte](7)),
      ("d.bin", Array.tabulate[Byte](64)(i => (i % 97).toByte)))
    for (every <- Seq(0, 1, 2)) {
      val got = ZipCodec.census(ZipCodec.synth(members,
        comment = "trailing", zip64 = true, zip64SizeEvery = every))
      assert(got.map(e => (e.name, e.usize, e.localMismatch)) ==
        members.map { case (n, d) => (n, d.length.toLong, false) },
        s"every=$every")
    }
    // the differential still flags under zip64 framing
    val evil = ZipCodec.synth(members, tamperLocal = Some(1),
      zip64 = true, zip64SizeEvery = 2)
    assert(ZipCodec.census(evil).map(_.localMismatch) ==
      Seq(false, true, false, false))
    // loud perimeter: sentinel EOCD with the locator clobbered
    val raw = ZipCodec.synth(members, zip64 = true)
    val locAt = raw.length - 22 - 20
    val noLoc = raw.clone(); noLoc(locAt) = 'X'
    val e = intercept[IllegalArgumentException](ZipCodec.census(noLoc))
    assert(e.getMessage.contains("locator"), e.getMessage)
    // sentinel central sizes with the 0x0001 extra id clobbered
    val viaExtra = ZipCodec.synth(members, zip64 = true,
      zip64SizeEvery = 1)
    val s = viaExtra.clone()
    // find the first central-dir extra header id 0x0001 after the sig
    val cdSig = Array[Byte](0x50, 0x4b, 1, 2)
    val cd = (0 until s.length - 4).find(i =>
      s(i) == cdSig(0) && s(i + 1) == cdSig(1) && s(i + 2) == cdSig(2)
        && s(i + 3) == cdSig(3)).get
    val nameLen = (s(cd + 28) & 0xff) | ((s(cd + 29) & 0xff) << 8)
    s(cd + 46 + nameLen) = 0x77 // extra id 0x0001 -> 0x0077
    val e2 = intercept[IllegalArgumentException](ZipCodec.census(s))
    assert(e2.getMessage.contains("0x0001"), e2.getMessage)
  }

  test("WebM/EBML census: roundtrip, streamed segment, loud perimeter") {
    import graft.multimodal.EbmlCodec
    val tracks = Seq((1, "V_VP9"), (2, "A_OPUS"))
    val blocks = Seq((0, 1, 10), (0, 2, 3), (1, 1, 7))
    for (unk <- Seq(false, true)) {
      val c = EbmlCodec.census(EbmlCodec.synth("webm", 1000000L,
        tracks, blocks, unknownSegmentSize = unk))
      assert(c == EbmlCodec.WebmCensus("webm", 1000000L, tracks,
        2, 3, 3, 20), s"unknownSegmentSize=$unk")
    }
    val good = EbmlCodec.synth("webm", 1000000L, tracks, blocks)
    // an unknown-size element that is NOT the Segment refuses: make
    // the Info element stream (its 1-byte size becomes the reserved
    // all-ones VINT)
    val infoAt = {
      val raw = good.map(_ & 0xff)
      (0 until good.length - 4).find(i => raw(i) == 0x15 &&
        raw(i + 1) == 0x49 && raw(i + 2) == 0xA9 && raw(i + 3) == 0x66)
        .get
    }
    val badInfo = good.clone(); badInfo(infoAt + 4) = 0xff.toByte
    val e = intercept[IllegalArgumentException](
      EbmlCodec.census(badInfo))
    assert(e.getMessage.contains("unknown-size"), e.getMessage)
    // truncation and a non-EBML leader are loud
    intercept[IllegalArgumentException](
      EbmlCodec.census(good.take(good.length - 3)))
    intercept[IllegalArgumentException](
      EbmlCodec.census("RIFF1234AVI LIST".getBytes("US-ASCII")))
    // a TrackEntry without a codec is loud
    val noCodec = EbmlCodec.synth("webm", 1L, Seq((1, "V_VP9")), Nil)
    val cAt = new String(noCodec, "ISO-8859-1").indexOf("V_VP9")
    val mangled = noCodec.clone()
    mangled(cAt - 2) = 0xEC.toByte // CodecID id byte -> Void id
    val e2 = intercept[IllegalArgumentException](
      EbmlCodec.census(mangled))
    assert(e2.getMessage.contains("TrackEntry"), e2.getMessage)
  }

  test("ZIP census: central directory authoritative, differential flagged") {
    import graft.multimodal.ZipCodec
    val members = Seq(
      ("a.txt", "hello zip".getBytes("US-ASCII")),
      ("dir/b.bin", Array.tabulate[Byte](300)(i => (i % 251).toByte)),
      ("c", Array[Byte](7)))
    for (comment <- Seq("", "trailing archive comment")) {
      val got = ZipCodec.census(ZipCodec.synth(members, comment))
      assert(got.map(e => (e.name, e.method, e.usize, e.localMismatch)) ==
        members.map { case (n, d) => (n, 0, d.length.toLong, false) },
        s"comment='$comment'")
      // crc matches the real CRC32 of the data
      got.zip(members).foreach { case (e, (_, d)) =>
        val c = new java.util.zip.CRC32(); c.update(d)
        assert(e.crc == c.getValue, e.name)
      }
    }
    // the parser differential: a tampered LOCAL name flags exactly
    // that member, and the central (authoritative) name is reported
    val evil = ZipCodec.synth(members, tamperLocal = Some(1))
    val got = ZipCodec.census(evil)
    assert(got.map(_.localMismatch) == Seq(false, true, false))
    assert(got(1).name == "dir/b.bin") // central view, not the decoy
    // perimeter: no EOCD / truncated directory / bad local pointer
    intercept[IllegalArgumentException](
      ZipCodec.census("PKgarbagegarbagegarbage"
        .getBytes("US-ASCII")))
    val raw = ZipCodec.synth(members)
    intercept[IllegalArgumentException](
      ZipCodec.census(raw.drop(10))) // local offsets now point wrong
  }

  test("PNG census: chunk walk with real CRCs, loud perimeter") {
    import graft.multimodal.PngCodec
    val png = PngCodec.synth(640L, 480L, 8, 6, Seq(100, 7, 300))
    val c = PngCodec.census(png)
    assert(c == PngCodec.PngCensus(640L, 480L, 8, 6, 5, 3, 407L))
    // a flipped DATA byte fails that chunk's CRC loudly
    val bad = png.clone()
    bad(8 + 25 + 8 + 3) = (bad(8 + 25 + 8 + 3) ^ 1).toByte // in IDAT 1
    val e = intercept[IllegalArgumentException](PngCodec.census(bad))
    assert(e.getMessage.contains("CRC"), e.getMessage)
    // signature, truncation, trailing garbage, missing IHDR
    intercept[IllegalArgumentException](
      PngCodec.census("JFIFJFIFJFIFJFIFJFIF".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      PngCodec.census(png.take(png.length - 6)))
    intercept[IllegalArgumentException](
      PngCodec.census(png ++ Array[Byte](0)))
    // fuzz: parse-or-IAE, never a raw crash
    val rnd = new scala.util.Random(1406)
    (1 to 300).foreach { trial =>
      val m = png.clone()
      (0 to rnd.nextInt(4)).foreach(_ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      try PngCodec.census(m)
      catch {
        case _: IllegalArgumentException => ()
        case ex: Throwable =>
          fail(s"trial $trial: ${ex.getClass.getName} ${ex.getMessage}")
      }
    }
    // a CRC-VALID PNG whose first chunk is IDAT (no IHDR anywhere)
    // must refuse — not return a census row with -1 geometry
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def u32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      u32(data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      u32(crc.getValue)
    }
    chunk("IDAT", Array[Byte](1, 2, 3))
    chunk("IEND", Array.empty[Byte])
    val eFirst = intercept[IllegalArgumentException](
      PngCodec.census(out.toByteArray))
    assert(eFirst.getMessage.contains("first chunk is IDAT"),
      eFirst.getMessage)
  }

  test("PNG raster: all five filters roundtrip; dual-decoder certificate") {
    import graft.multimodal.{ImageCodec, PngCodec}
    val w = 23; val h = 11 // odd sizes so strides exercise edges
    val pix = Array.tabulate[Byte](w * h)(i => ((i * 37 + 11) % 256).toByte)
    // every §9 filter appears (rows cycle 0..4); three IDAT chunks
    val enc = PngCodec.encode(w, h, 0, pix, _ % 5, nIdat = 3)
    assert(PngCodec.census(enc).nIdat == 3)
    val dec = PngCodec.decode(enc)
    assert(dec.width == w && dec.height == h && dec.channels == 1)
    assert(java.util.Arrays.equals(dec.pix, pix))
    // certificate 1: the JDK decoder agrees with ours on OUR stream
    val (iw, ih, ref) = ImageCodec.decodeGray(enc)
    assert(iw == w && ih == h && java.util.Arrays.equals(ref, pix))
    // certificate 2: OUR decoder agrees on the JDK ENCODER's stream
    // (ImageIO picks its own filters — real-world PNG, not ours)
    val theirs = ImageCodec.encodeGray(w, h, pix, "png")
    val (ow, oh, ours) = PngCodec.decodeGray(theirs)
    assert(ow == w && oh == h && java.util.Arrays.equals(ours, pix))
    // single-filter streams each roundtrip alone too
    (0 to 4).foreach { f =>
      val one = PngCodec.decode(PngCodec.encode(w, h, 0, pix, _ => f))
      assert(java.util.Arrays.equals(one.pix, pix), s"filter $f drifted")
    }
  }

  test("PNG raster: colour types 2/3/4/6 decode; palette expands PLTE") {
    import graft.multimodal.PngCodec
    val w = 9; val h = 7
    // truecolour: per-channel gradients so Sub/Paeth see bpp=3 offsets
    val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 53 + 5) % 256).toByte)
    val d2 = PngCodec.decode(PngCodec.encode(w, h, 2, rgb, _ % 5))
    assert(d2.channels == 3 && java.util.Arrays.equals(d2.pix, rgb))
    // the JDK agrees pixel-for-pixel on the truecolour stream
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(PngCodec.encode(w, h, 2, rgb, _ % 5)))
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(((p >> 16) & 0xff) == (rgb(o) & 0xff) &&
        ((p >> 8) & 0xff) == (rgb(o + 1) & 0xff) &&
        (p & 0xff) == (rgb(o + 2) & 0xff), s"($x,$y)")
    }
    // indexed: 5-entry palette, indices cycle; decode expands to RGB
    val plte = Array.tabulate[Byte](15)(i => ((i * 91 + 3) % 256).toByte)
    val idx = Array.tabulate[Byte](w * h)(i => (i % 5).toByte)
    val d3 = PngCodec.decode(PngCodec.encode(w, h, 3, idx, _ % 5,
      palette = plte))
    assert(d3.channels == 3)
    for (i <- 0 until w * h; c <- 0 to 2)
      assert(d3.pix(3 * i + c) == plte(3 * (i % 5) + c))
    // an index past PLTE refuses loudly
    val over = idx.clone(); over(13) = 5
    val eIdx = intercept[IllegalArgumentException](PngCodec.decode(
      PngCodec.encode(w, h, 3, over, _ % 5, palette = plte)))
    assert(eIdx.getMessage.contains("palette index"), eIdx.getMessage)
    // grey+alpha and RGBA roundtrip; decodeGray reads the grey/luma
    val ga = Array.tabulate[Byte](w * h * 2)(i => ((i * 29) % 256).toByte)
    val d4 = PngCodec.decode(PngCodec.encode(w, h, 4, ga, _ % 5))
    assert(d4.channels == 2 && java.util.Arrays.equals(d4.pix, ga))
    val rgba = Array.tabulate[Byte](w * h * 4)(i => ((i * 17 + 9) % 256).toByte)
    val d6 = PngCodec.decode(PngCodec.encode(w, h, 6, rgba, _ % 5))
    assert(d6.channels == 4 && java.util.Arrays.equals(d6.pix, rgba))
  }

  test("PNG raster: Adam7 interlace roundtrips and matches the JDK") {
    import graft.multimodal.{ImageCodec, PngCodec}
    // sizes straddling the 8x8 pass grid, including sub-5 dimensions
    // where whole passes are EMPTY (the spec's edge), and sizes that
    // exercise every pass's ceil-division geometry
    for ((w, h) <- Seq((1, 1), (3, 2), (4, 9), (7, 5), (8, 8), (9, 7),
        (16, 3), (23, 11), (31, 17))) {
      val pix = Array.tabulate[Byte](w * h)(i => ((i * 41 + 13) % 256).toByte)
      val enc = PngCodec.encode(w, h, 0, pix, _ % 5, interlace = true)
      val dec = PngCodec.decode(enc)
      assert(dec.width == w && dec.height == h, s"${w}x$h geometry")
      assert(java.util.Arrays.equals(dec.pix, pix), s"${w}x$h pixels drifted")
      // the JDK reads progressive PNG — certificate on OUR writer
      val (iw, ih, ref) = ImageCodec.decodeGray(enc)
      assert(iw == w && ih == h && java.util.Arrays.equals(ref, pix),
        s"${w}x$h: ImageIO disagrees with the planted raster")
    }
    // interlaced truecolour: bpp=3 sub-images per pass
    val w = 13; val h = 6
    val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 59 + 7) % 256).toByte)
    val d2 = PngCodec.decode(PngCodec.encode(w, h, 2, rgb, _ % 5,
      interlace = true))
    assert(java.util.Arrays.equals(d2.pix, rgb))
    // interlaced fuzz: decode-or-IAE, never a raw crash
    val rnd = new scala.util.Random(1510)
    val base = PngCodec.encode(23, 11, 0,
      Array.tabulate[Byte](253)(i => (i * 3).toByte), _ % 5,
      interlace = true)
    (1 to 200).foreach { trial =>
      val m = base.clone()
      (0 to rnd.nextInt(4)).foreach(_ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      try PngCodec.decode(m)
      catch {
        case _: IllegalArgumentException => ()
        case ex: Throwable =>
          fail(s"trial $trial: ${ex.getClass.getName} ${ex.getMessage}")
      }
    }
  }

  test("PNG raster: loud perimeter (depth, Adam7, filter byte, zlib) + fuzz") {
    import graft.multimodal.PngCodec
    // 16-bit samples refuse (synth writes the declared depth)
    val deep = PngCodec.synth(4L, 4L, 16, 0, Seq(20))
    assert(intercept[IllegalArgumentException](PngCodec.decode(deep))
      .getMessage.contains("bit depth"))
    // rebuild helpers: patch one IHDR byte, re-CRC, keep the rest
    def u32be(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def patchIhdr(png: Array[Byte], off: Int, value: Byte): Array[Byte] = {
      val m = png.clone()
      m(8 + 8 + off) = value // IHDR data starts at sig(8)+len/type(8)
      val crc = new java.util.zip.CRC32()
      crc.update(m, 8 + 4, 4 + 13)
      System.arraycopy(u32be(crc.getValue), 0, m, 8 + 8 + 13, 4)
      m
    }
    val pix = Array.tabulate[Byte](16)(i => (i * 7).toByte)
    val ok = PngCodec.encode(4, 4, 0, pix)
    // lying about interlace (byte = 1 on a sequential stream) changes
    // the expected pass geometry — the inflate-size check is loud
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(patchIhdr(ok, 12, 1)))
      .getMessage.contains("inflates"))
    // an interlace method past Adam7 refuses by name
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(patchIhdr(ok, 12, 2)))
      .getMessage.contains("interlace"))
    // a filter byte outside 0..4: hand-build the raw stream
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val t = new Array[Byte](256)
      while (!d.finished()) o.write(t, 0, d.deflate(t))
      d.end(); o.toByteArray
    }
    def wrap(z: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      def chunk(typ: String, data: Array[Byte]): Unit = {
        out.write(u32be(data.length.toLong))
        val tb = typ.getBytes("US-ASCII")
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        out.write(u32be(crc.getValue))
      }
      val ihdr = new java.io.ByteArrayOutputStream()
      ihdr.write(u32be(2L)); ihdr.write(u32be(2L))
      ihdr.write(8); ihdr.write(0); ihdr.write(0); ihdr.write(0); ihdr.write(0)
      chunk("IHDR", ihdr.toByteArray)
      chunk("IDAT", z)
      chunk("IEND", Array.empty[Byte])
      out.toByteArray
    }
    val badFilter = wrap(deflate(Array[Byte](9, 1, 2, 0, 3, 4)))
    assert(intercept[IllegalArgumentException](PngCodec.decode(badFilter))
      .getMessage.contains("filter 9"))
    // a zlib stream shorter than the geometry demands is loud
    val short = wrap(deflate(Array[Byte](0, 1, 2))) // 3 of 6 raw bytes
    assert(intercept[IllegalArgumentException](PngCodec.decode(short))
      .getMessage.toLowerCase.contains("idat"))
    // corrupt deflate bytes are IAE, not DataFormatException
    val corrupt = wrap("notzlibatall".getBytes("US-ASCII"))
    intercept[IllegalArgumentException](PngCodec.decode(corrupt))
    // fuzz: mutate the valid stream — decode-or-IAE, never a raw crash
    val rnd = new scala.util.Random(1509)
    val base = PngCodec.encode(23, 11,
      0, Array.tabulate[Byte](253)(i => (i * 3).toByte), _ % 5)
    (1 to 300).foreach { trial =>
      val m = base.clone()
      (0 to rnd.nextInt(4)).foreach(_ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      try PngCodec.decode(m)
      catch {
        case _: IllegalArgumentException => ()
        case ex: Throwable =>
          fail(s"trial $trial: ${ex.getClass.getName} ${ex.getMessage}")
      }
    }
  }

  test("MP4 avcConfig: truncated largesize header is loud, not AIOOBE") {
    import graft.multimodal.Mp4Codec
    // size0 == 1 declares a 64-bit largesize, but the buffer ends at
    // the 8-byte header — the guard must refuse before reading it
    val b = Array[Byte](0, 0, 0, 1, 'm', 'o', 'o', 'v')
    val e = intercept[IllegalArgumentException](Mp4Codec.avcConfig(b))
    assert(e.getMessage.contains("truncated largesize"), e.getMessage)
  }

  test("H264 perimeter: no start code / forbidden bit are loud") {
    val e1 = intercept[IllegalArgumentException](
      H264Codec.scan(Array[Byte](1, 2, 3, 4)))
    assert(e1.getMessage.contains("start code"), e1.getMessage)
    val bad = H264Codec.synth(Seq((1, 3))).clone()
    bad(4) = (bad(4) | 0x80).toByte // forbidden_zero_bit on the SPS
    val e2 = intercept[IllegalArgumentException](H264Codec.scan(bad))
    assert(e2.getMessage.contains("forbidden"), e2.getMessage)
  }
}

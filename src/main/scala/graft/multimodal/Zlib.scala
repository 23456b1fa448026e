package graft.multimodal

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/** Pooled zlib primitives for the per-row codec paths.
  *
  * Every `new Deflater` / `new Inflater` (and every `GZIPOutputStream`
  * / `GZIPInputStream`, which allocate one internally) mallocs a native
  * zlib context (~tens of KB) that is freed either by an explicit
  * `end()` or — for the unclosed-stream pattern — by a Cleaner after
  * GC. The census/crawl queries construct these PER PAGE or PER MEMBER
  * (q306 alone: ~1.5M per bench run after the content-coding change),
  * and the malloc/free + cleaner churn dominated their task time
  * (measured: q306 at 619 task-seconds, 31 s of it GC, in
  * bench/r15opt_base1.json). These helpers keep ONE reusable context
  * per (thread, wrap-mode), `reset()` between uses — the guide §4.5
  * "initialise heavyweight state once per task" rule applied to native
  * resources. Nested use on one thread (an inflate inside an inflate)
  * falls back to a bounded per-thread stack, never to shared state.
  *
  * Byte-compatibility: [[gzip]] emits exactly the bytes
  * `java.util.zip.GZIPOutputStream` emits (same 10-byte header with
  * zeroed MTIME/XFL/OS, default-level raw deflate, CRC32 + ISIZE
  * trailer), so outputs hashed over synthesized archives are unchanged.
  * [[gunzip]] enforces the RFC 1952 frame (magic, method 8, optional
  * FEXTRA/FNAME/FCOMMENT/FHCRC fields, CRC32 and ISIZE trailer) and
  * throws IllegalArgumentException on any corruption — the codec
  * family's loud-refusal convention.
  */
object Zlib {

  private final class Pool[T](make: () => T, clear: T => Unit) {
    private val tl = new ThreadLocal[java.util.ArrayDeque[T]] {
      override def initialValue() = new java.util.ArrayDeque[T](4)
    }
    def withOne[R](f: T => R): R = {
      val stack = tl.get()
      val t = { val p = stack.pollFirst(); if (p != null) p else make() }
      try f(t)
      finally {
        clear(t)
        if (stack.size < 4) stack.addFirst(t)
        // else drop the reference; native memory is freed by the cleaner
      }
    }
  }

  // nowrap = raw RFC 1951 stream (what the gzip frame carries);
  // wrapped = RFC 1950 zlib (what PDF FlateDecode / PNG IDAT carry)
  private val deflRaw = new Pool[Deflater](
    () => new Deflater(Deflater.DEFAULT_COMPRESSION, true), _.reset())
  private val deflZlib = new Pool[Deflater](
    () => new Deflater(Deflater.DEFAULT_COMPRESSION, false), _.reset())
  private val inflRaw = new Pool[Inflater](() => new Inflater(true), _.reset())
  private val inflZlib = new Pool[Inflater](() => new Inflater(false),
    _.reset())

  /** Run `f` with a pooled Deflater (reset before reuse). The deflater
    * must be fully drained inside `f`; do not call `end()` on it. */
  def withDeflater[R](nowrap: Boolean)(f: Deflater => R): R =
    (if (nowrap) deflRaw else deflZlib).withOne(f)

  /** Run `f` with a pooled Inflater (reset before reuse). Do not call
    * `end()` on it. */
  def withInflater[R](nowrap: Boolean)(f: Inflater => R): R =
    (if (nowrap) inflRaw else inflZlib).withOne(f)

  /** One-shot deflate. `nowrap=false` = zlib-wrapped (RFC 1950) —
    * byte-identical to `new Deflater()` drained the same way at the
    * default level. `level` may be lowered by SYNTHESIS-side callers
    * (fixture archives whose downstream census never observes the
    * compressed bytes — the decoded content is identical at any
    * level); PARSE-side behaviour never depends on it. The pooled
    * deflater keeps its last level across reset(), so it is set
    * explicitly on every use. */
  def deflate(data: Array[Byte], nowrap: Boolean = false,
      level: Int = Deflater.DEFAULT_COMPRESSION): Array[Byte] =
    withDeflater(nowrap) { d =>
      d.setLevel(level)
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(
        math.max(64, data.length / 2))
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }

  /** One-shot inflate. Throws IllegalArgumentException on a corrupt or
    * truncated stream. */
  def inflate(data: Array[Byte], nowrap: Boolean = false,
      sizeHint: Int = 0): Array[Byte] =
    withInflater(nowrap) { i =>
      i.setInput(data)
      try {
        val out = new java.io.ByteArrayOutputStream(
          math.max(64, if (sizeHint > 0) sizeHint else data.length * 4))
        val buf = new Array[Byte](8192)
        var n = i.inflate(buf)
        while (n > 0 || (!i.finished() && !i.needsInput())) {
          out.write(buf, 0, n); n = i.inflate(buf)
        }
        require(i.finished(), "truncated deflate stream")
        out.toByteArray
      } catch { case e: DataFormatException =>
        throw new IllegalArgumentException(
          s"corrupt deflate stream: ${e.getMessage}")
      }
    }

  /** RFC 1952 gzip — byte-identical to GZIPOutputStream at the default
    * level (header 1f 8b 08 00 00000000 00 00, raw deflate, CRC32 +
    * ISIZE little-endian). */
  def gzip(data: Array[Byte],
      level: Int = Deflater.DEFAULT_COMPRESSION): Array[Byte] = {
    val body = deflate(data, nowrap = true, level = level)
    val out = new Array[Byte](10 + body.length + 8)
    out(0) = 0x1f.toByte; out(1) = 0x8b.toByte; out(2) = 8
    // FLG, MTIME(4), XFL, OS all zero — what the JDK writes
    System.arraycopy(body, 0, out, 10, body.length)
    val crc = new CRC32(); crc.update(data)
    val c = crc.getValue; val isize = data.length.toLong
    var p = 10 + body.length
    var k = 0
    while (k < 4) { out(p) = ((c >> (8 * k)) & 0xff).toByte; p += 1; k += 1 }
    k = 0
    while (k < 4) {
      out(p) = ((isize >> (8 * k)) & 0xff).toByte; p += 1; k += 1
    }
    out
  }

  /** RFC 1952 gunzip with full frame validation; refuses loudly
    * (IllegalArgumentException) on bad magic, truncation, a CRC or
    * ISIZE mismatch, or trailing garbage after the frame. */
  def gunzip(data: Array[Byte]): Array[Byte] = {
    require(data.length >= 18, s"gzip frame of ${data.length} bytes")
    require((data(0) & 0xff) == 0x1f && (data(1) & 0xff) == 0x8b,
      "not a gzip stream (bad magic)")
    require((data(2) & 0xff) == 8, s"gzip method ${data(2) & 0xff} != 8")
    val flg = data(3) & 0xff
    var pos = 10
    if ((flg & 4) != 0) { // FEXTRA
      require(pos + 2 <= data.length, "truncated gzip FEXTRA")
      val xlen = (data(pos) & 0xff) | ((data(pos + 1) & 0xff) << 8)
      pos += 2 + xlen
    }
    if ((flg & 8) != 0) { // FNAME, NUL-terminated
      while (pos < data.length && data(pos) != 0) pos += 1
      pos += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT
      while (pos < data.length && data(pos) != 0) pos += 1
      pos += 1
    }
    if ((flg & 2) != 0) pos += 2 // FHCRC
    require(pos + 8 <= data.length, "truncated gzip stream")
    withInflater(nowrap = true) { i =>
      i.setInput(data, pos, data.length - pos)
      try {
        val out = new java.io.ByteArrayOutputStream(
          math.max(64, data.length * 4))
        val buf = new Array[Byte](8192)
        var n = i.inflate(buf)
        while (n > 0 || (!i.finished() && !i.needsInput())) {
          out.write(buf, 0, n); n = i.inflate(buf)
        }
        require(i.finished(), "truncated gzip deflate body")
        val res = out.toByteArray
        val tp = data.length - i.getRemaining // after the deflate body
        require(tp + 8 <= data.length, "truncated gzip trailer")
        def le32(o: Int): Long =
          ((data(o) & 0xffL)) | ((data(o + 1) & 0xffL) << 8) |
            ((data(o + 2) & 0xffL) << 16) | ((data(o + 3) & 0xffL) << 24)
        val crc = new CRC32(); crc.update(res)
        require(le32(tp) == crc.getValue, "gzip CRC mismatch")
        require(le32(tp + 4) == (res.length.toLong & 0xffffffffL),
          "gzip ISIZE mismatch")
        require(tp + 8 == data.length,
          s"${data.length - tp - 8} bytes after the gzip frame")
        res
      } catch { case e: DataFormatException =>
        throw new IllegalArgumentException(
          s"corrupt gzip stream: ${e.getMessage}")
      }
    }
  }
}

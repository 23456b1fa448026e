package graft.multimodal

import java.io.ByteArrayOutputStream

/** EBML / Matroska / WebM structure census — the dominant open web
  * video container (every <video> webm, YouTube VP9/AV1 rips). The
  * walk implements RFC 8794 element framing exactly: variable-length
  * element IDs (the VINT marker bit kept) and element sizes (marker
  * stripped), with the all-ones UNKNOWN size honored where the spec
  * allows it in practice — a streamed webm's Segment runs to EOF —
  * and refused loudly anywhere else. Known master elements recurse;
  * the census reports the routing metadata a corpus pipeline reads
  * before deciding whether to decode: DocType, timestamp scale,
  * per-track type + codec ID, cluster/block counts, and total frame
  * bytes (SimpleBlock payloads after the per-block track VINT +
  * 16-bit relative timestamp + flags byte — never decoded). Per-row
  * executor work, scan-fused. */
object EbmlCodec {

  /** `nFrames` counts laced frames (a no-lacing block is one frame);
    * `frameBytes` sums FRAME payload bytes only — the lacing header
    * (frame count + Xiph/EBML size table) is framing, not frames. */
  final case class WebmCensus(docType: String, timescale: Long,
      tracks: Seq[(Int, String)], nClusters: Int, nBlocks: Int,
      nFrames: Int, frameBytes: Long)

  // the element vocabulary the census routes on (Matroska IDs, as
  // registered at the IANA "Matroska Element IDs" registry)
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdCluster = 0x1F43B675L
  private val IdTimestamp = 0xE7L
  private val IdSimpleBlock = 0xA3L

  private val Masters: Set[Long] =
    Set(IdEbml, IdSegment, IdInfo, IdTracks, IdTrackEntry, IdCluster)

  // ---- VINT writers (synth) ----

  private def vintIdBytes(id: Long): Array[Byte] = {
    // IDs are stored marker-and-all: emit the minimal big-endian bytes
    var n = 8
    while (n > 1 && (id >> ((n - 1) * 8)) == 0) n -= 1
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = ((id >> ((n - 1 - i) * 8)) & 0xff).toByte
      i += 1
    }
    out
  }

  private def vintSizeBytes(v: Long): Array[Byte] = {
    // minimal length whose 7·n−1 value bits hold v (all-ones reserved)
    var n = 1
    while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1
    val out = new Array[Byte](n)
    val marked = v | (1L << (7 * n))
    var i = 0
    while (i < n) {
      out(i) = ((marked >> ((n - 1 - i) * 8)) & 0xff).toByte
      i += 1
    }
    out
  }

  private def element(id: Long, payload: Array[Byte]): Array[Byte] =
    vintIdBytes(id) ++ vintSizeBytes(payload.length.toLong) ++ payload

  private def uintPayload(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >> (n * 8)) != 0) n += 1
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = ((v >> ((n - 1 - i) * 8)) & 0xff).toByte
      i += 1
    }
    out
  }

  /** An n-byte VINT (marker kept) holding `v` — the fixed-width form
    * EBML lacing's signed deltas need. */
  private def vintBytesFixed(v: Long, n: Int): Array[Byte] = {
    require(n >= 1 && n <= 8 && v >= 0 && v < (1L << (7 * n)) - 1,
      s"value $v does not fit a $n-byte VINT")
    val out = new Array[Byte](n)
    val marked = v | (1L << (7 * n))
    var i = 0
    while (i < n) {
      out(i) = ((marked >> ((n - 1 - i) * 8)) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Synthesize a minimal valid WebM: EBML header (DocType), Segment
    * { Info (TimestampScale), Tracks (one entry per (type, codecId)),
    * Clusters (Timestamp + SimpleBlocks) }. Each block spec is
    * (clusterIdx, trackNumber, frameLen); frames are deterministic
    * nonzero bytes. `unknownSegmentSize` emits the streamed-webm shape
    * (Segment size all-ones, runs to EOF). */
  def synth(docType: String, timescale: Long,
      tracks: Seq[(Int, String)], blocks: Seq[(Int, Int, Int)],
      unknownSegmentSize: Boolean = false): Array[Byte] =
    synthLaced(docType, timescale, tracks,
      blocks.map { case (c, tn, len) => (c, tn, Seq(len), 0) },
      unknownSegmentSize)

  /** Synth with per-block lacing (Matroska §SimpleBlock): each block
    * spec is (clusterIdx, trackNumber, frameLens, laceMode) with
    * laceMode 0 = none (one frame), 1 = Xiph (255-run size table),
    * 2 = fixed (equal frames), 3 = EBML (VINT first size + signed
    * VINT deltas). Frame bytes are deterministic from each frame's
    * length, as in the unlaced form. */
  def synthLaced(docType: String, timescale: Long,
      tracks: Seq[(Int, String)],
      blocks: Seq[(Int, Int, Seq[Int], Int)],
      unknownSegmentSize: Boolean = false): Array[Byte] = {
    require(tracks.nonEmpty, "a webm needs at least one track")
    val header = element(IdEbml,
      element(IdDocType, docType.getBytes("US-ASCII")))
    val info = element(IdInfo,
      element(IdTimestampScale, uintPayload(timescale)))
    val trackEntries = tracks.zipWithIndex.map { case ((tt, codec), k) =>
      element(IdTrackEntry,
        element(IdTrackNumber, uintPayload(k + 1L)) ++
          element(IdTrackType, uintPayload(tt.toLong)) ++
          element(IdCodecId, codec.getBytes("US-ASCII")))
    }
    val trackBox = element(IdTracks,
      trackEntries.foldLeft(Array.empty[Byte])(_ ++ _))
    val nClusters = if (blocks.isEmpty) 0 else blocks.map(_._1).max + 1
    val clusters = (0 until nClusters).map { c =>
      val blks = blocks.filter(_._1 == c).map {
        case (_, tn, frames, mode) =>
          require(tn >= 1 && tn <= tracks.length, s"bad track $tn")
          require(frames.nonEmpty && frames.forall(_ >= 1),
            s"bad frame lengths $frames")
          require(mode >= 0 && mode <= 3, s"bad lace mode $mode")
          require(mode != 0 || frames.length == 1,
            "no-lacing blocks carry exactly one frame")
          require(mode != 2 || frames.distinct.length == 1,
            "fixed lacing requires equal frame sizes")
          require(frames.length <= 256, "at most 256 laced frames")
          val b = new ByteArrayOutputStream()
          b.write(0x80 | tn) // 1-byte VINT track number
          b.write(0); b.write(c % 120) // s16 relative timestamp
          val laceFlag = mode match {
            case 0 => 0x00
            case 1 => 0x02 // Xiph
            case 2 => 0x04 // fixed-size
            case _ => 0x06 // EBML
          }
          b.write(0x80 | laceFlag) // flags: keyframe + lacing
          if (mode != 0) {
            b.write(frames.length - 1)
            mode match {
              case 1 => // Xiph: sizes for all but the last frame
                frames.dropRight(1).foreach { len =>
                  var rest = len
                  while (rest >= 255) { b.write(255); rest -= 255 }
                  b.write(rest)
                }
              case 3 => // EBML: first size VINT, then signed deltas
                if (frames.length >= 2) {
                  b.write(vintSizeBytes(frames.head.toLong))
                  var prev = frames.head
                  frames.slice(1, frames.length - 1).foreach { len =>
                    val delta = (len - prev).toLong
                    var n = 1
                    while (n < 8 &&
                      (delta < -((1L << (7 * n - 1)) - 1) ||
                        delta > (1L << (7 * n - 1)) - 1)) n += 1
                    b.write(vintBytesFixed(
                      delta + ((1L << (7 * n - 1)) - 1), n))
                    prev = len
                  }
                }
              case _ => () // fixed: no size table
            }
          }
          frames.foreach { len =>
            var i = 0
            while (i < len) { b.write((i * 73 + len) % 250 + 1); i += 1 }
          }
          element(IdSimpleBlock, b.toByteArray)
      }
      element(IdCluster,
        element(IdTimestamp, uintPayload(c * 1000L)) ++
          blks.foldLeft(Array.empty[Byte])(_ ++ _))
    }
    val segPayload = info ++ trackBox ++
      clusters.foldLeft(Array.empty[Byte])(_ ++ _)
    val segment =
      if (!unknownSegmentSize) element(IdSegment, segPayload)
      else vintIdBytes(IdSegment) ++ Array(0xff.toByte) ++ segPayload
    header ++ segment
  }

  /** Walk the element tree and report the routing metadata. */
  def census(bytes: Array[Byte]): WebmCensus = {
    var docType = ""
    var timescale = 1000000L // the Matroska default
    val tracks = Seq.newBuilder[(Int, String)]
    var curTrackType = -1
    var curCodec = ""
    var nClusters = 0
    var nBlocks = 0
    var nFrames = 0
    var frameBytes = 0L
    def vint(at: Int, end: Int, keepMarker: Boolean): (Long, Int) = {
      require(at < end, s"EBML VINT past element end at offset $at")
      val first = bytes(at) & 0xff
      require(first != 0, s"invalid 0x00 VINT lead byte at offset $at")
      val n = Integer.numberOfLeadingZeros(first) - 23 // 1..8
      require(at + n <= end, s"truncated $n-byte VINT at offset $at")
      var v = if (keepMarker) first.toLong
        else first.toLong & ((1L << (7 - (n - 1))) - 1)
      var i = 1
      while (i < n) { v = (v << 8) | (bytes(at + i) & 0xffL); i += 1 }
      if (!keepMarker) {
        // all value bits set = the reserved UNKNOWN size
        if (v == (1L << (7 * n)) - 1) v = -1L
      }
      (v, n)
    }
    def uint(at: Int, end: Int): Long = {
      require(end - at >= 1 && end - at <= 8,
        s"implausible ${end - at}-byte uint at offset $at")
      var v = 0L
      var i = at
      while (i < end) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
      v
    }
    def walk(start: Int, end: Int, parent: Long): Unit = {
      var pos = start
      while (pos < end) {
        val (id, idLen) = vint(pos, end, keepMarker = true)
        val (sz, szLen) = vint(pos + idLen, end, keepMarker = false)
        val bodyAt = pos + idLen + szLen
        val bodyEnd =
          if (sz >= 0) {
            require(bodyAt + sz <= end,
              s"element 0x${id.toHexString} at $pos declares $sz " +
                s"bytes past offset $end")
            (bodyAt + sz).toInt
          } else {
            // unknown size: legal for a streamed Segment (runs to
            // EOF); anywhere else the walk cannot rebound — refuse
            require(id == IdSegment,
              s"unknown-size element 0x${id.toHexString} at $pos — " +
                "only a Segment may stream to EOF")
            end
          }
        if (id == IdTrackEntry) { curTrackType = -1; curCodec = "" }
        if (Masters(id)) walk(bodyAt, bodyEnd, id)
        else id match {
          case IdDocType =>
            docType = new String(bytes, bodyAt, bodyEnd - bodyAt,
              "US-ASCII")
          case IdTimestampScale => timescale = uint(bodyAt, bodyEnd)
          case IdTrackType => curTrackType = uint(bodyAt, bodyEnd).toInt
          case IdCodecId =>
            curCodec = new String(bytes, bodyAt, bodyEnd - bodyAt,
              "US-ASCII")
          case IdSimpleBlock =>
            require(parent == IdCluster,
              s"SimpleBlock outside a Cluster at offset $pos")
            val (_, tnLen) = vint(bodyAt, bodyEnd, keepMarker = false)
            require(bodyAt + tnLen + 3 <= bodyEnd,
              s"SimpleBlock header truncated at offset $bodyAt")
            nBlocks += 1
            // flags bits 0x06 select the lacing (Matroska §SimpleBlock):
            // 00 none, 01 Xiph, 10 fixed-size, 11 EBML. The size table
            // is framing — frameBytes counts only the frames.
            val flags = bytes(bodyAt + tnLen + 2) & 0xff
            val lace = (flags >> 1) & 0x3
            var dataAt = bodyAt + tnLen + 3
            if (lace == 0) {
              nFrames += 1
              frameBytes += bodyEnd - dataAt
            } else {
              require(dataAt < bodyEnd,
                s"laced SimpleBlock at $pos lacks its frame count")
              val nf = (bytes(dataAt) & 0xff) + 1
              dataAt += 1
              var listed = 0L // sizes declared for frames 0..nf-2
              lace match {
                case 1 => // Xiph: 255-run coded sizes
                  var j = 0
                  while (j < nf - 1) {
                    var b = 255
                    while (b == 255) {
                      require(dataAt < bodyEnd,
                        s"truncated Xiph lace size at offset $dataAt")
                      b = bytes(dataAt) & 0xff
                      listed += b
                      dataAt += 1
                    }
                    j += 1
                  }
                case 2 => // fixed-size: equal division, no table
                  val rem = bodyEnd - dataAt
                  require(rem % nf == 0,
                    s"fixed lacing: $rem frame bytes not divisible " +
                      s"by $nf frames at offset $pos")
                case _ => // 3 = EBML: VINT first size + signed deltas
                  if (nf >= 2) {
                    val (first, fl) = vint(dataAt, bodyEnd,
                      keepMarker = false)
                    require(first >= 0,
                      s"reserved all-ones EBML lace size at $dataAt")
                    dataAt += fl
                    var prev = first
                    listed = first
                    var j = 1
                    while (j < nf - 1) {
                      val (dv, dl) = vint(dataAt, bodyEnd,
                        keepMarker = false)
                      require(dv >= 0,
                        s"reserved all-ones EBML lace delta at $dataAt")
                      dataAt += dl
                      prev += dv - ((1L << (7 * dl - 1)) - 1)
                      require(prev >= 0,
                        s"negative EBML-laced frame size at offset $pos")
                      listed += prev
                      j += 1
                    }
                  }
              }
              require(listed <= bodyEnd - dataAt,
                s"lace size table declares $listed frame bytes but " +
                  s"only ${bodyEnd - dataAt} remain at offset $pos")
              nFrames += nf
              frameBytes += bodyEnd - dataAt
            }
          case _ => ()
        }
        if (id == IdCluster) nClusters += 1
        if (id == IdTrackEntry) {
          require(curTrackType >= 0 && curCodec.nonEmpty,
            s"TrackEntry at $pos without TrackType/CodecID")
          tracks += ((curTrackType, curCodec))
        }
        pos = bodyEnd
      }
      require(pos == end, s"EBML walk overran: $pos vs $end")
    }
    require(bytes.length >= 4, s"not EBML: ${bytes.length} bytes")
    val (lead, _) = vint(0, bytes.length, keepMarker = true)
    require(lead == IdEbml,
      s"not EBML: leading element 0x${lead.toHexString}")
    walk(0, bytes.length, -1L)
    require(docType.nonEmpty, "EBML header without DocType")
    WebmCensus(docType, timescale, tracks.result(), nClusters,
      nBlocks, nFrames, frameBytes)
  }
}

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

  final case class WebmCensus(docType: String, timescale: Long,
      tracks: Seq[(Int, String)], nClusters: Int, nBlocks: Int,
      frameBytes: Long)

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

  /** Synthesize a minimal valid WebM: EBML header (DocType), Segment
    * { Info (TimestampScale), Tracks (one entry per (type, codecId)),
    * Clusters (Timestamp + SimpleBlocks) }. Each block spec is
    * (clusterIdx, trackNumber, frameLen); frames are deterministic
    * nonzero bytes. `unknownSegmentSize` emits the streamed-webm shape
    * (Segment size all-ones, runs to EOF). */
  def synth(docType: String, timescale: Long,
      tracks: Seq[(Int, String)], blocks: Seq[(Int, Int, Int)],
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
      val blks = blocks.filter(_._1 == c).map { case (_, tn, len) =>
        require(tn >= 1 && tn <= tracks.length, s"bad track $tn")
        require(len >= 1, s"bad frame length $len")
        val b = new ByteArrayOutputStream()
        b.write(0x80 | tn) // 1-byte VINT track number
        b.write(0); b.write(c % 120) // s16 relative timestamp
        b.write(0x80) // flags: keyframe
        var i = 0
        while (i < len) { b.write((i * 73 + len) % 250 + 1); i += 1 }
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
            frameBytes += bodyEnd - (bodyAt + tnLen + 3)
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
      nBlocks, frameBytes)
  }
}

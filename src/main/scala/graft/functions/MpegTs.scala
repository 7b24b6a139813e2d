package graft.functions

/** MPEG transport stream (ISO/IEC 13818-1) — the container HLS ships
  * video in, and with it a large share of crawl-origin video segments.
  * Reference behavior anchor: the reference pipeline ingests opaque
  * binary columns and this module makes `.ts` segments first-class in
  * the video tier (reference has no media decode at all — this is the
  * beyond-reference modality surface, same tier as the MP4/MKV faces).
  *
  * Scope: 188-byte packets, PAT → PMT → the first video elementary
  * stream (stream_type 0x1B = H.264 feeds the native [[H264]] decoder;
  * other video types surface through the codec column for
  * diagnosability), PES payload extraction across packets (adaptation
  * fields honored), PTS span for duration. IDR access units decode;
  * non-IDR pictures skip (the keyframes-only tier contract).
  *
  * Totality: every entry point returns null/empty on hostile bytes —
  * bounds-checked reads, capped collections, no allocation from
  * untrusted length fields beyond the input's own size.
  */
object MpegTs {

  @inline private def pidOf(b: Array[Byte], p: Int): Int =
    ((b(p + 1) & 0x1F) << 8) | (b(p + 2) & 0xFF)

  /** Payload offset inside the packet at p, honoring the adaptation
    * field; -1 when the packet carries no payload or is malformed. */
  private def payloadOff(b: Array[Byte], p: Int): Int = {
    val afc = (b(p + 3) >> 4) & 3
    if ((afc & 1) == 0) return -1
    var off = p + 4
    if ((afc & 2) != 0) off = p + 5 + (b(p + 4) & 0xFF)
    if (off > p + 188) -1 else off
  }

  private[functions] def isTs(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 * 188 &&
      (b(0) & 0xFF) == 0x47 && (b(188) & 0xFF) == 0x47

  /** First complete PSI section with table_id `tid` on `pid`,
    * reassembled across packets: the PUSI packet's pointer_field locates
    * the section start, then continuation packets (same PID, PUSI=0)
    * append payload in stream order until section_length (clause
    * 2.4.4) is satisfied — a PMT with many streams/descriptors spans
    * packets and must NOT be clamped to the first 188 bytes. Returns
    * the full section bytes (3-byte header + body incl. CRC) or null. */
  private def psiSection(b: Array[Byte], pid: Int, tid: Int): Array[Byte] = {
    var p = 0
    while (p + 188 <= b.length) {
      if ((b(p) & 0xFF) == 0x47 && pidOf(b, p) == pid &&
        ((b(p + 1) >> 6) & 1) == 1) {
        val off = payloadOff(b, p)
        if (off > 0 && off < p + 188) {
          val s = off + 1 + (b(off) & 0xFF) // pointer_field
          if (s + 3 <= p + 188 && (b(s) & 0xFF) == tid) {
            val slen = ((b(s + 1) & 0x0F) << 8) | (b(s + 2) & 0xFF)
            val total = 3 + slen
            val sec = new java.io.ByteArrayOutputStream()
            sec.write(b, s, math.min(total, p + 188 - s))
            var q = p + 188
            var open = true
            while (open && sec.size < total && q + 188 <= b.length) {
              if ((b(q) & 0xFF) == 0x47 && pidOf(b, q) == pid) {
                val o2 = payloadOff(b, q)
                if (o2 > 0 && o2 < q + 188) {
                  if (((b(q + 1) >> 6) & 1) == 0)
                    sec.write(b, o2, math.min(total - sec.size, q + 188 - o2))
                  else {
                    // legal back-to-back packing (clause 2.4.4.2): a PUSI=1
                    // packet whose pointer_field > 0 carries THIS section's
                    // tail in the bytes before the next section's start —
                    // consume them, then stop (the packet opens a new one)
                    val tail = math.min(b(o2) & 0xFF, q + 188 - (o2 + 1))
                    if (tail > 0)
                      sec.write(b, o2 + 1, math.min(total - sec.size, tail))
                    open = false
                  }
                }
              }
              q += 188
            }
            return if (sec.size >= total) sec.toByteArray else null
          }
        }
      }
      p += 188
    }
    null
  }

  /** (pid, streamType) of the first PMT elementary stream whose
    * stream_type `want` accepts, via PAT → PMT over reassembled PSI
    * sections; (-1, -1) when absent. */
  private def findPid(b: Array[Byte], want: Int => Boolean): (Int, Int) = {
    val pat = psiSection(b, 0, 0x00)
    if (pat == null || pat.length < 12) return (-1, -1)
    var pmtPid = -1
    var q = 8
    val qe = pat.length - 4 // section bytes minus CRC
    while (q + 4 <= qe && pmtPid < 0) {
      val prog = ((pat(q) & 0xFF) << 8) | (pat(q + 1) & 0xFF)
      if (prog != 0)
        pmtPid = ((pat(q + 2) & 0x1F) << 8) | (pat(q + 3) & 0xFF)
      q += 4
    }
    if (pmtPid <= 0) return (-1, -1)
    val pmt = psiSection(b, pmtPid, 0x02)
    if (pmt == null || pmt.length < 16) return (-1, -1)
    val pil = ((pmt(10) & 0x0F) << 8) | (pmt(11) & 0xFF)
    q = 12 + pil
    val pe = pmt.length - 4
    while (q + 5 <= pe) {
      val st = pmt(q) & 0xFF
      val epid = ((pmt(q + 1) & 0x1F) << 8) | (pmt(q + 2) & 0xFF)
      val eil = ((pmt(q + 3) & 0x0F) << 8) | (pmt(q + 4) & 0xFF)
      if (want(st)) return (epid, st)
      q += 5 + eil
    }
    (-1, -1)
  }

  /** (videoPid, streamType) via PAT → PMT; (-1, -1) when absent. */
  private def findVideoPid(b: Array[Byte]): (Int, Int) =
    findPid(b, st => st == 0x1B || st == 0x01 || st == 0x02 ||
      st == 0x10 || st == 0x24)

  /** Concatenated elementary-stream bytes of `vidPid` with PES headers
    * stripped, plus the (min, max) PTS seen (-1 when none). */
  private def esBytes(b: Array[Byte], vidPid: Int): (Array[Byte], Long, Long) = {
    val bos = new java.io.ByteArrayOutputStream()
    var minPts = -1L
    var maxPts = -1L
    var p = 0
    while (p + 188 <= b.length) {
      if ((b(p) & 0xFF) == 0x47 && pidOf(b, p) == vidPid) {
        var off = payloadOff(b, p)
        if (off > 0) {
          if (((b(p + 1) >> 6) & 1) == 1) { // PES start
            if (off + 9 <= p + 188 && b(off) == 0 && b(off + 1) == 0 &&
              b(off + 2) == 1) {
              val flags2 = b(off + 7) & 0xFF
              val hdrLen = b(off + 8) & 0xFF
              if ((flags2 & 0x80) != 0 && off + 14 <= p + 188) {
                // 33-bit PTS over 5 marker-interleaved bytes
                val q = off + 9
                val pts = (((b(q) >> 1) & 0x7).toLong << 30) |
                  ((b(q + 1) & 0xFF).toLong << 22) |
                  (((b(q + 2) >> 1) & 0x7F).toLong << 15) |
                  ((b(q + 3) & 0xFF).toLong << 7) |
                  ((b(q + 4) >> 1) & 0x7F).toLong
                if (minPts < 0 || pts < minPts) minPts = pts
                if (pts > maxPts) maxPts = pts
              }
              off = off + 9 + hdrLen
            } else off = -1
          }
          if (off > 0 && off <= p + 188) bos.write(b, off, p + 188 - off)
        }
      }
      p += 188
    }
    (bos.toByteArray, minPts, maxPts)
  }

  /** NAL units of an Annex-B buffer as (offset, length, type) triples,
    * capped. */
  private def scanNals(es: Array[Byte]): Array[(Int, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i + 3 < es.length && out.length < (1 << 20)) {
      if (es(i) == 0 && es(i + 1) == 0 &&
        (es(i + 2) == 1 || (es(i + 2) == 0 && i + 4 < es.length && es(i + 3) == 1))) {
        val at = i + (if (es(i + 2) == 1) 3 else 4)
        var j = at
        while (j + 2 < es.length && !(es(j) == 0 && es(j + 1) == 0 &&
          (es(j + 2) == 0 || es(j + 2) == 1))) j += 1
        val end = if (j + 2 < es.length) j else es.length
        if (end > at) out += ((at, end - at, es(at) & 0x1F))
        i = end
      } else i += 1
    }
    out.toArray
  }

  /** Decoded IDR keyframes (grayscale PNG snapshots) of an H.264
    * transport stream, at most `max`, evenly selected BEFORE the
    * expensive decodes (consecutive IDR NALs form one picture's
    * slices). Null when the buffer is not a transport stream or
    * carries no decodable H.264 video. */
  private[functions] def tsFrames(b: Array[Byte], max: Int): Array[Array[Byte]] = {
    if (!isTs(b)) return null
    val (vidPid, streamType) = findVideoPid(b)
    if (vidPid < 0 || streamType != 0x1B) return null
    val (es, _, _) = esBytes(b, vidPid)
    esFrames(es, max)
  }

  /** A raw Annex-B H.264 elementary-stream FILE (.h264/.264 crawl
    * dumps): must open with a start code followed by a parameter-set or
    * IDR NAL, and its first SPS must parse — stricter than the
    * start-code shape alone so arbitrary zero-prefixed binaries don't
    * detour through the decoder. */
  private[functions] def isAnnexB(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 8) return false
    val at =
      if (b(0) == 0 && b(1) == 0 && b(2) == 1) 3
      else if (b(0) == 0 && b(1) == 0 && b(2) == 0 && b(3) == 1) 4
      else return false
    val typ = b(at) & 0x1F
    if (typ != 7 && typ != 8 && typ != 5 && typ != 9) return false
    val nals = scanNals(b)
    nals.exists(_._3 == 7) && {
      val (o, l, _) = nals.find(_._3 == 7).get
      H264.spsDisplayDims(H264.unescape(b, o, o + l)) != null
    }
  }

  /** Frames of a raw Annex-B elementary stream (same selection and
    * grouping as the TS path). Null when not Annex-B H.264. */
  private[functions] def annexBFrames(b: Array[Byte], max: Int): Array[Array[Byte]] =
    if (!isAnnexB(b)) null else esFrames(b, max)

  /** (width, height, 0) + "h264" for a raw Annex-B file: dims from the
    * first SPS; an elementary stream carries no timing. */
  private[functions] def annexBMeta(b: Array[Byte]): Array[Long] = {
    if (!isAnnexB(b)) return null
    val nals = scanNals(b)
    val (o, l, _) = nals.find(_._3 == 7).get
    val dims = H264.spsDisplayDims(H264.unescape(b, o, o + l))
    if (dims == null) null else Array(dims._1.toLong, dims._2.toLong, 0L)
  }

  private def esFrames(es: Array[Byte], max: Int): Array[Array[Byte]] = {
    val nals = scanNals(es)
    var spsAt = -1; var spsLen = 0
    var ppsAt = -1; var ppsLen = 0
    // group consecutive IDR NALs (one picture's slices), each with the
    // parameter sets ACTIVE at that point in the stream — a segment
    // whose SPS/PPS change mid-stream decodes every picture with the
    // sets in effect for it, not whichever happened to come last
    final case class Group(from: Int, to: Int, spsAt: Int, spsLen: Int,
                           ppsAt: Int, ppsLen: Int)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var i = 0
    while (i < nals.length) {
      val (at, len, typ) = nals(i)
      typ match {
        case 7 => spsAt = at; spsLen = len
        case 8 => ppsAt = at; ppsLen = len
        case 5 =>
          var j = i
          while (j + 1 < nals.length && nals(j + 1)._3 == 5) j += 1
          groups += Group(i, j, spsAt, spsLen, ppsAt, ppsLen)
          i = j
        case _ => ()
      }
      i += 1
    }
    // a group preceding any parameter set (join-in-progress capture)
    // can't decode; drop it rather than borrowing later sets
    val decodable = groups.filter(g => g.spsAt >= 0 && g.ppsAt >= 0)
    if (decodable.isEmpty) return Array.empty
    val n = decodable.length
    val sel = if (n <= max) 0 until n
    else (0 until max).map(k => (k.toLong * n / max).toInt)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    sel.foreach { gi =>
      val g = decodable(gi)
      val sps = java.util.Arrays.copyOfRange(es, g.spsAt, g.spsAt + g.spsLen)
      val pps = java.util.Arrays.copyOfRange(es, g.ppsAt, g.ppsAt + g.ppsLen)
      val idrs = (g.from to g.to).map { k =>
        val (at, len, _) = nals(k)
        java.util.Arrays.copyOfRange(es, at, at + len)
      }
      val f = H264.decodeAvcc(sps, pps, idrs)
      if (f != null) out += ImageKernels.encodePng(f.w, f.h, f.y)
    }
    out.toArray
  }

  /** (width, height, durationMs) + codec for video_meta: dimensions
    * from the first SPS in the elementary stream (the container itself
    * declares none), duration from the PES PTS span at 90 kHz. Null
    * when not a transport stream with a video program. */
  private[functions] def tsMeta(b: Array[Byte]): (Array[Long], String) = {
    if (!isTs(b)) return null
    val (vidPid, streamType) = findVideoPid(b)
    if (vidPid < 0) return null
    val codec = streamType match {
      case 0x1B => "h264"
      case 0x24 => "hevc"
      case 0x02 => "mpeg2"
      case 0x01 => "mpeg1"
      case 0x10 => "mpeg4"
      case other => f"0x$other%02x"
    }
    val (es, minPts, maxPts) = esBytes(b, vidPid)
    var w = 0L
    var h = 0L
    if (streamType == 0x1B) {
      val nals = scanNals(es)
      val sps = nals.find(_._3 == 7)
      if (sps.isDefined) {
        val (at, len, _) = sps.get
        val dims = H264.spsDisplayDims(
          H264.unescape(es, at, at + len))
        if (dims != null) { w = dims._1; h = dims._2 }
      }
    }
    val durMs = if (minPts >= 0 && maxPts > minPts) (maxPts - minPts) / 90 else 0L
    (Array(w, h, durMs), codec)
  }

  /** The first AUDIO elementary stream declared in the PMT:
    * (pid, streamType); (-1, -1) when none. */
  private def findAudioPid(b: Array[Byte]): (Int, Int) =
    findPid(b, st => st == 0x03 || st == 0x04 || st == 0x0F ||
      st == 0x11 || st == 0x81)

  /** ADTS sampling_frequency_index (ISO 14496-3). */
  private val AdtsRates = Array(96000L, 88200L, 64000L, 48000L, 44100L,
    32000L, 24000L, 22050L, 16000L, 12000L, 11025L, 8000L, 7350L)

  /** ADTS AAC elementary-stream walk: (channels, rate, totalSamples) —
    * 1024 samples per raw data block; null when the ES is not ADTS.
    * Also serves RAW .aac files (ADTS is its own file format). */
  private[functions] def adtsInfo(es: Array[Byte]): Array[Long] = {
    var p = 0
    var frames = 0L
    var blocks = 0L
    var ch = 0L
    var rate = 0L
    while (p + 7 <= es.length) {
      if ((es(p) & 0xFF) != 0xFF || (es(p + 1) & 0xF0) != 0xF0)
        return if (frames > 0) Array(ch, rate, blocks * 1024L) else null
      val sfIdx = (es(p + 2) >> 2) & 0xF
      if (sfIdx >= AdtsRates.length) return null
      rate = AdtsRates(sfIdx)
      ch = (((es(p + 2) & 1) << 2) | ((es(p + 3) >> 6) & 3)).toLong
      val frameLen = ((es(p + 3) & 0x3) << 11) |
        ((es(p + 4) & 0xFF) << 3) | ((es(p + 5) >> 5) & 0x7)
      if (frameLen < 7) return null
      blocks += 1 + (es(p + 6) & 0x3)
      frames += 1
      p += frameLen
    }
    if (frames > 0) Array(ch, rate, blocks * 1024L) else null
  }

  /** Audio metadata of a transport stream: (channels, rate,
    * totalSamples, codec) — MP3 streams reuse the Layer-III frame walk,
    * ADTS AAC walks its headers; other declared audio types surface
    * codec-only. Null when the buffer is not a TS with an audio
    * program. */
  private[functions] def tsAudioInfo(
      b: Array[Byte],
      mp3Walk: Array[Byte] => Array[Long]): (Array[Long], String) = {
    if (!isTs(b)) return null
    val (pid, streamType) = findAudioPid(b)
    if (pid < 0) return null
    val (es, _, _) = esBytes(b, pid)
    streamType match {
      case 0x03 | 0x04 =>
        val m = mp3Walk(es)
        (if (m != null) m else Array(0L, 0L, 0L), "mp3")
      case 0x0F =>
        val m = adtsInfo(es)
        (if (m != null) m else Array(0L, 0L, 0L), "aac")
      case 0x11 => (Array(0L, 0L, 0L), "latm-aac")
      case 0x81 => (Array(0L, 0L, 0L), "ac3")
      case other => (Array(0L, 0L, 0L), f"0x$other%02x")
    }
  }

  // ------------------------------------------------------------ writer

  /** MPEG CRC-32 (poly 0x04C11DB7, init all-ones, no reflection) over
    * PSI sections. */
  private def mpegCrc32(d: Array[Byte], from: Int, to: Int): Long = {
    var crc = 0xFFFFFFFFL
    var i = from
    while (i < to) {
      crc ^= (d(i) & 0xFFL) << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000L) != 0) ((crc << 1) ^ 0x04C11DB7L) & 0xFFFFFFFFL
        else (crc << 1) & 0xFFFFFFFFL
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Single-program H.264 transport stream for fixtures/tests: PAT +
    * PMT (stream_type 0x1B, PID 0x100) + one PES per input Annex-B
    * stream (PTS at 30 fps / 90 kHz), 188-byte packets with adaptation-
    * field stuffing — the HLS segment shape. `pmtPad` > 0 inserts that
    * many program-descriptor bytes so the PMT section spans multiple
    * packets (exercises PSI reassembly). */
  def encodeH264Ts(annexB: Seq[Array[Byte]], pmtPad: Int = 0,
                   backToBack: Boolean = false): Array[Byte] =
    encodeTs(0x1B, 0xE0, annexB, pmtPad, backToBack)

  /** Single-program AUDIO transport stream: same PSI shape with the
    * given stream_type (0x03/0x04 MP3, 0x0F ADTS AAC) and audio PES
    * stream_id, one PES per payload. */
  def encodeAudioTs(streamType: Int, payloads: Seq[Array[Byte]]): Array[Byte] =
    encodeTs(streamType, 0xC0, payloads, 0, backToBack = false)

  private def encodeTs(streamType: Int, pesStreamId: Int,
                       payloads: Seq[Array[Byte]], pmtPad: Int,
                       backToBack: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val counters = scala.collection.mutable.HashMap.empty[Int, Int]
    def packet(pid: Int, pusi: Boolean, payload: Array[Byte], from: Int,
               len: Int): Unit = {
      val cc = counters.getOrElse(pid, 0)
      counters(pid) = (cc + 1) & 0xF
      val pkt = new Array[Byte](188)
      pkt(0) = 0x47
      pkt(1) = (((if (pusi) 1 else 0) << 6) | (pid >> 8)).toByte
      pkt(2) = (pid & 0xFF).toByte
      if (len >= 184) {
        pkt(3) = (0x10 | cc).toByte // payload only
        System.arraycopy(payload, from, pkt, 4, 184)
      } else {
        // adaptation field pads the remainder ahead of the payload
        pkt(3) = (0x30 | cc).toByte
        val afLen = 183 - len
        pkt(4) = afLen.toByte
        if (afLen > 0) {
          pkt(5) = 0 // no flags
          java.util.Arrays.fill(pkt, 6, 6 + afLen - 1, 0xFF.toByte)
        }
        System.arraycopy(payload, from, pkt, 188 - len, len)
      }
      bos.write(pkt)
    }
    def psi(pid: Int, section: Array[Byte], backToBack: Boolean = false): Unit = {
      val crc = mpegCrc32(section, 0, section.length)
      val sec = section ++ Array(
        (crc >> 24).toByte, (crc >> 16).toByte, (crc >> 8).toByte, crc.toByte)
      if (!backToBack || sec.length <= 183) {
        // sections longer than one packet continue in PUSI=0 packets on
        // the same PID (clause 2.4.4 segmentation)
        val body = Array[Byte](0) ++ sec // pointer_field 0
        var p = 0
        var first = true
        while (p < body.length) {
          val len = math.min(184, body.length - p)
          packet(pid, first, body, p, len)
          first = false
          p += len
        }
      } else {
        // back-to-back packing (clause 2.4.4.2): the section's tail and the
        // START of the next section share one PUSI=1 packet whose
        // pointer_field counts the tail bytes — the mux shape the reader's
        // mid-reassembly PUSI handling exists for. Emits the section, then
        // a second copy opening inside the tail packet.
        val tail = sec.length - 183
        require(tail <= 183, "backToBack: section tail must fit one packet")
        packet(pid, pusi = true, Array[Byte](0) ++ sec, 0, 184)
        val p2 = Array[Byte](tail.toByte) ++ sec.slice(183, sec.length) ++ sec
        var p = 0
        var first = true
        while (p < p2.length) {
          val len = math.min(184, p2.length - p)
          packet(pid, first, p2, p, len)
          first = false
          p += len
        }
      }
    }
    val pmtPid = 0x1000
    val vidPid = 0x100
    // PAT: one program (1) -> pmtPid
    val patLen = 5 + 4 + 4 // post-length header + program + CRC
    psi(0, Array[Byte](0x00, (0xB0 | (patLen >> 8)).toByte, (patLen & 0xFF).toByte,
      0, 1, 0xC1.toByte, 0, 0,
      0, 1, (0xE0 | (pmtPid >> 8)).toByte, (pmtPid & 0xFF).toByte))
    // PMT: program 1, PCR = video PID, one stream; pmtPad > 0 rides as
    // a registration descriptor in the program-info loop
    val pad: Array[Byte] =
      if (pmtPad <= 0) Array.empty
      else Array[Byte](0x05, (pmtPad - 2).toByte) ++
        Array.tabulate[Byte](pmtPad - 2)(i => ('A' + i % 26).toByte)
    require(pad.length < (1 << 10), "pmtPad too large for a PSI section")
    val pmtLen = 5 + 4 + pad.length + 5 + 4
    psi(pmtPid, Array[Byte](0x02, (0xB0 | (pmtLen >> 8)).toByte, (pmtLen & 0xFF).toByte,
      0, 1, 0xC1.toByte, 0, 0,
      (0xE0 | (vidPid >> 8)).toByte, (vidPid & 0xFF).toByte,
      (0xF0 | (pad.length >> 8)).toByte, (pad.length & 0xFF).toByte) ++ pad ++
      Array[Byte](streamType.toByte,
        (0xE0 | (vidPid >> 8)).toByte, (vidPid & 0xFF).toByte,
        0xF0.toByte, 0), backToBack)
    payloads.zipWithIndex.foreach { case (es, i) =>
      val pts = 90000L / 30 * 3 * i // 30 fps at 90 kHz, x3 so values stay distinct
      def mk(v: Long, marker: Int): Array[Byte] = Array(
        ((marker << 4) | (((v >> 30) & 0x7) << 1).toInt | 1).toByte,
        ((v >> 22) & 0xFF).toByte,
        ((((v >> 15) & 0x7F) << 1) | 1).toByte,
        ((v >> 7) & 0xFF).toByte,
        (((v & 0x7F) << 1) | 1).toByte)
      val pes = Array[Byte](0, 0, 1, pesStreamId.toByte, 0, 0, // unbounded
        0x80.toByte, 0x80.toByte, 5) ++ mk(pts, 2) ++ es
      var p = 0
      var first = true
      while (p < pes.length) {
        val len = math.min(184, pes.length - p)
        packet(vidPid, first, pes, p, len)
        first = false
        p += len
      }
    }
    bos.toByteArray
  }
}

package graft.functions

/** Matroska/WebM (EBML) and IVF container walks for VP8 *video* — the
  * [[MediaKernels.videoFrames]] faces that make real crawl video (WebM is
  * how VP8 ships; IVF is the trivial test container from the codec SDKs)
  * compose with the image pHash/dedup tier. Keyframes only, by design:
  * the native [[Vp8]] decoder is a keyframe decoder (RFC 6386 §9.1 frame
  * tag bit 0), and evenly-sampled keyframes are what the video near-dup
  * vote consumes. Each decoded keyframe's Y plane snapshots as a
  * grayscale PNG payload — the same contract as the animated-GIF and
  * animated-WebP faces, and exactly the luma [[Webp.decodeGray]] yields
  * for the same bitstream in a WebP still, so container-extracted frames
  * hash IDENTICALLY to direct still decodes.
  *
  * Scale shape: both walks are narrow per-row kernels (no shuffle, no
  * allocation from untrusted length fields beyond the input's own size);
  * hostile bytes yield fewer frames, never a throw.
  */
object Webm {

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], p: Int): Long =
    (le16(b, p) | (le16(b, p + 2).toLong << 16)) & 0xFFFFFFFFL

  /** True when `b(off until off+len)` opens like a VP8 KEYFRAME: frame-tag
    * bit 0 clear plus the §9.1 start code 9d 01 2a — a strong 3-byte magic
    * that makes keyframe detection container-independent (no reliance on
    * SimpleBlock flags or ReferenceBlock absence). */
  private def isVp8Keyframe(b: Array[Byte], off: Int, len: Int): Boolean =
    len >= 10 && (b(off) & 1) == 0 &&
      (b(off + 3) & 0xFF) == 0x9d && (b(off + 4) & 0xFF) == 0x01 &&
      (b(off + 5) & 0xFF) == 0x2a

  /** Decode one VP8 keyframe and snapshot its Y plane as a gray PNG;
    * malformed frames are skipped (the walk continues). */
  private def snapshot(b: Array[Byte], off: Int, len: Int,
                       out: scala.collection.mutable.ArrayBuffer[Array[Byte]]): Unit =
    if (isVp8Keyframe(b, off, len)) {
      try {
        val pl = Vp8.decode(b, off, len)
        val px = new Array[Int](pl.w * pl.h)
        var y = 0
        while (y < pl.h) {
          var x = 0
          while (x < pl.w) { px(y * pl.w + x) = pl.yAt(x, y); x += 1 }
          y += 1
        }
        out += ImageKernels.encodePng(pl.w, pl.h, px)
      } catch { case _: Exception => () }
    }

  // ------------------------------------------------------------------ IVF

  /** IVF walk: 32-byte `DKIF` file header (fourcc at 8, header length at
    * 6), then 12-byte frame headers (LE32 size + 64-bit pts) before each
    * payload. Null when not IVF; empty for a non-VP8 fourcc. */
  private[functions] def ivfFrames(b: Array[Byte]): Array[Array[Byte]] = {
    if (b == null || b.length < 32 ||
      !(b(0) == 'D' && b(1) == 'K' && b(2) == 'I' && b(3) == 'F')) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    if (!(b(8) == 'V' && b(9) == 'P' && b(10) == '8' && b(11) == '0')) return Array.empty
    val hdr = le16(b, 6)
    var p = if (hdr >= 32 && hdr <= b.length) hdr else 32
    while (p + 12 <= b.length && out.length < 512) {
      val sz = le32(b, p)
      if (sz > b.length - (p + 12)) return out.toArray // truncated tail
      snapshot(b, p + 12, sz.toInt, out)
      p += 12 + sz.toInt
    }
    out.toArray
  }

  // ------------------------------------------------------- Matroska/WebM

  /** Matroska/WebM walk: EBML header → Segment → (Tracks → the `V_VP8`
    * or `V_MPEG4/ISO/AVC` track number) + Clusters → SimpleBlock /
    * BlockGroup>Block payloads of that track. VP8 blocks snapshot when
    * the bitstream opens as a keyframe; AVC blocks carry length-prefixed
    * NALs (length size and SPS/PPS from the TrackEntry's CodecPrivate
    * avcC record) whose IDR NALs feed the native [[H264]] decoder —
    * Matroska is the other container real crawl H.264 ships in.
    * Unknown-size elements (streamed Segments/Clusters set every size
    * bit) extend to their parent's end. Null when the EBML magic is
    * absent. */
  private[functions] def webmFrames(b: Array[Byte]): Array[Array[Byte]] = {
    if (b == null || b.length < 8 ||
      !((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
        (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3)) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // -1 = no Tracks element seen (accept blocks by bitstream shape);
    // 0 = Tracks seen but no decodable video track (reject all);
    // else the VP8 track number
    var vp8Track = -1L
    // the V_MPEG4/ISO/AVC track, with its CodecPrivate avcC fields
    var avcTrack = -1L
    var avcSps: Array[Byte] = null
    var avcPps: Array[Byte] = null
    var avcLenSize = 4

    def vintLen(first: Int): Int = {
      var m = 0x80; var n = 1
      while (n <= 8 && (first & m) == 0) { m >>= 1; n += 1 }
      if (n > 8) -1 else n
    }
    /** EBML ID at p: value keeps its marker bits. (-1, 0) when malformed. */
    def readId(p: Int): (Long, Int) = {
      if (p >= b.length) return (-1L, 0)
      val n = vintLen(b(p) & 0xFF)
      if (n < 0 || n > 4 || p + n > b.length) return (-1L, 0)
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (b(p + i) & 0xFF); i += 1 }
      (v, n)
    }
    /** EBML size at p: marker bit stripped; -2 for the all-ones unknown
      * size; (-1, 0) when malformed. */
    def readSize(p: Int): (Long, Int) = {
      if (p >= b.length) return (-1L, 0)
      val first = b(p) & 0xFF
      val n = vintLen(first)
      if (n < 0 || p + n > b.length) return (-1L, 0)
      var v = (first & (0xFF >>> n)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (b(p + i) & 0xFF); i += 1 }
      val unknown = (1L << (7 * n)) - 1
      (if (v == unknown) -2L else v, n)
    }
    /** Plain unsigned vint — NO unknown-size sentinel. Block track
      * numbers and the first EBML lace size use the all-ones pattern as
      * an ordinary value (track 127 encodes as 0xFF; a first lace size
      * of 127 or 16383 sets every value bit), unlike EBML element sizes
      * where all-ones means "unknown". (-1, 0) when malformed. */
    def readVint(p: Int): (Long, Int) = {
      if (p >= b.length) return (-1L, 0)
      val first = b(p) & 0xFF
      val n = vintLen(first)
      if (n < 0 || p + n > b.length) return (-1L, 0)
      var v = (first & (0xFF >>> n)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (b(p + i) & 0xFF); i += 1 }
      (v, n)
    }
    /** Unsigned big-endian integer element payload. */
    def uint(d: Int, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len && len <= 8) { v = (v << 8) | (b(d + i) & 0xFF); i += 1 }
      v
    }

    /** avcC record (the MP4 box payload, verbatim in CodecPrivate):
      * version, profile/compat/level, lengthSizeMinusOne, then SPS/PPS
      * entry lists. True when an SPS and a PPS were extracted. */
    def parseAvcPrivate(d: Int, e: Int): Boolean = {
      if (d + 7 > e || (b(d) & 0xFF) != 1) return false
      avcLenSize = (b(d + 4) & 3) + 1
      var q = d + 5
      val nSps = b(q) & 0x1F
      q += 1
      var i = 0
      while (i < nSps && q + 2 <= e) {
        val len = ((b(q) & 0xFF) << 8) | (b(q + 1) & 0xFF)
        q += 2
        if (q + len > e) return false
        if (avcSps == null) avcSps = java.util.Arrays.copyOfRange(b, q, q + len)
        q += len
        i += 1
      }
      if (q >= e) return false
      val nPps = b(q) & 0xFF
      q += 1
      i = 0
      while (i < nPps && q + 2 <= e) {
        val len = ((b(q) & 0xFF) << 8) | (b(q + 1) & 0xFF)
        q += 2
        if (q + len > e) return false
        if (avcPps == null) avcPps = java.util.Arrays.copyOfRange(b, q, q + len)
        q += len
        i += 1
      }
      avcSps != null && avcPps != null
    }

    /** One TrackEntry: remember the track number when CodecID is V_VP8
      * or V_MPEG4/ISO/AVC (the latter with a parseable CodecPrivate). */
    def trackEntry(start: Int, end: Int): Unit = {
      var num = -1L
      var isVp8 = false
      var isAvc = false
      var privAt = -1
      var privEnd = -1
      var p = start
      while (p < end) {
        val (id, idn) = readId(p)
        if (id < 0) return
        val (sz, szn) = readSize(p + idn)
        if (sz < 0) return // unknown size illegal below Segment level here
        val d = p + idn + szn
        if (d + sz > end) return
        id match {
          case 0xD7 => num = uint(d, sz.toInt) // TrackNumber
          case 0x86 => // CodecID
            val s = new String(b, d, sz.toInt, "US-ASCII")
            isVp8 = s == "V_VP8"
            isAvc = s == "V_MPEG4/ISO/AVC"
          case 0x63A2 => privAt = d; privEnd = d + sz.toInt // CodecPrivate
          case _ => ()
        }
        p = d + sz.toInt
      }
      if (isVp8 && num > 0) vp8Track = num
      else if (isAvc && num > 0 && privAt >= 0) {
        avcSps = null; avcPps = null
        if (parseAvcPrivate(privAt, privEnd)) avcTrack = num
      }
    }

    /** One AVC block frame: length-prefixed NALs; IDR NALs (type 5)
      * feed the native decoder, non-IDR frames skip (keyframes-only). */
    def avcSnapshot(off: Int, len: Int): Unit = {
      val idrs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var p = off
      val end = off + len
      while (p + avcLenSize <= end) {
        var l = 0L
        var i = 0
        while (i < avcLenSize) { l = (l << 8) | (b(p + i) & 0xFF); i += 1 }
        p += avcLenSize
        if (l <= 0 || p + l > end) return
        if ((b(p) & 0x1F) == 5)
          idrs += java.util.Arrays.copyOfRange(b, p, p + l.toInt)
        p += l.toInt
      }
      if (idrs.nonEmpty) {
        val f = H264.decodeAvcc(avcSps, avcPps, idrs.toSeq)
        if (f != null) out += ImageKernels.encodePng(f.w, f.h, f.y)
      }
    }

    /** A (Simple)Block payload: track vint, 2-byte timecode, flags, then
      * one frame — or several under lacing (flags & 0x06: 02 Xiph, 04
      * fixed, 06 EBML; the last laced frame is always the remainder). */
    def block(start: Int, end: Int): Unit = {
      val (track, tn) = readVint(start) // track number is a plain vint
      if (track < 0 || start + tn + 3 > end) return
      val isAvcBlk = avcTrack > 0 && track == avcTrack
      val isVp8Blk =
        if (vp8Track == -1L) !isAvcBlk // no Tracks element: shape-based
        else vp8Track > 0 && track == vp8Track
      if (!isAvcBlk && !isVp8Blk) return
      def emit(off: Int, len: Int): Unit =
        if (isAvcBlk) avcSnapshot(off, len) else snapshot(b, off, len, out)
      val flags = b(start + tn + 2) & 0xFF
      var p = start + tn + 3
      val lacing = flags & 0x06
      if (lacing == 0) { emit(p, end - p); return }
      if (p >= end) return
      val n = (b(p) & 0xFF) + 1
      p += 1
      val sizes = new Array[Int](n)
      lacing match {
        case 0x02 => // Xiph: 255-run coded sizes for frames 0..n-2
          var i = 0
          while (i < n - 1) {
            var sz = 0
            var cont = true
            while (cont && p < end) { val v = b(p) & 0xFF; p += 1; sz += v; cont = v == 255 }
            if (cont) return // truncated inside a size run
            sizes(i) = sz; i += 1
          }
        case 0x04 => // fixed: the remainder divides evenly
          val rem = end - p
          if (n == 0 || rem < 0 || rem % n != 0) return
          java.util.Arrays.fill(sizes, rem / n)
        case _ if n == 1 => // EBML with one frame lists no sizes
        case _ => // EBML: unsigned first size, signed-vint deltas after
          val (first, fn) = readVint(p)
          if (first < 0 || first > Int.MaxValue) return
          p += fn
          sizes(0) = first.toInt
          var prev = first
          var i = 1
          while (i < n - 1) {
            if (p >= end) return
            val len = vintLen(b(p) & 0xFF)
            if (len < 0 || len > 8 || p + len > end) return
            var v = ((b(p) & 0xFF) & (0xFF >>> len)).toLong
            var j = 1
            while (j < len) { v = (v << 8) | (b(p + j) & 0xFF); j += 1 }
            p += len
            prev += v - ((1L << (7 * len - 1)) - 1) // signed-vint bias
            if (prev < 0 || prev > Int.MaxValue) return
            sizes(i) = prev.toInt
            i += 1
          }
      }
      if (lacing != 0x04) {
        val listed = sizes.view.take(n - 1).map(_.toLong).sum
        val rem = (end - p) - listed
        if (rem < 0) return
        sizes(n - 1) = rem.toInt
      }
      var i = 0
      while (i < n) {
        val sz = sizes(i)
        if (sz < 0 || p + sz > end) return
        emit(p, sz)
        p += sz
        i += 1
      }
    }

    def walk(start: Int, end: Int, depth: Int): Unit = {
      var p = start
      while (p < end && out.length < 512 && depth < 16) {
        val (id, idn) = readId(p)
        if (id < 0) return
        val (sz0, szn) = readSize(p + idn)
        if (sz0 == -1L) return
        val d = p + idn + szn
        val e = if (sz0 == -2L) end
        else if (d + sz0 > end || sz0 > Int.MaxValue) return
        else (d + sz0).toInt
        id match {
          case 0x18538067 | 0x1F43B675 | 0xA0 => // Segment / Cluster / BlockGroup
            walk(d, e, depth + 1)
          case 0x1654AE6B => // Tracks: from here on only a V_VP8 track's
            // blocks count (0 = none found yet)
            if (vp8Track == -1L) vp8Track = 0L
            walk(d, e, depth + 1)
          case 0xAE => trackEntry(d, e) // TrackEntry
          case 0xA3 | 0xA1 => block(d, e) // SimpleBlock / Block
          case _ => ()
        }
        p = e
      }
    }
    walk(0, b.length, 0)
    out.toArray
  }

  // ------------------------------------------------------------- metadata

  /** IVF metadata: (width, height, durationMs) from the file header —
    * dims at 12/14, timebase den/num at 16/20, frame count at 24.
    * Null when not IVF. */
  private[functions] def ivfMeta(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 32 ||
      !(b(0) == 'D' && b(1) == 'K' && b(2) == 'I' && b(3) == 'F')) return null
    val w = le16(b, 12); val h = le16(b, 14)
    val den = le32(b, 16); val num = le32(b, 20)
    val frames = le32(b, 24)
    // frames and num are hostile 32-bit fields: frames*1000*num can
    // overflow Long (garbage/negative duration) — checked multiply, 0 on
    // overflow (a wrong header yields "unknown duration", never garbage).
    val durMs =
      if (den <= 0) 0L
      else try Math.multiplyExact(Math.multiplyExact(frames, 1000L), num) / den
      catch { case _: ArithmeticException => 0L }
    Array(w.toLong, h.toLong, durMs)
  }

  /** Matroska/WebM metadata: (width, height, durationMs) from Segment →
    * Tracks → Video (PixelWidth/PixelHeight) and Segment → Info
    * (Duration float x TimecodeScale ns). Null when not EBML. */
  private[functions] def webmMeta(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 8 ||
      !((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
        (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3)) return null
    var w = 0L; var h = 0L
    var timecodeScale = 1000000L // ns, spec default
    var duration = -1.0 // in timecode units
    def vintLen(first: Int): Int = {
      var m = 0x80; var n = 1
      while (n <= 8 && (first & m) == 0) { m >>= 1; n += 1 }
      if (n > 8) -1 else n
    }
    def walk(start: Int, end: Int, depth: Int): Unit = {
      var p = start
      while (p < end && depth < 16) {
        if (p >= b.length) return
        val idn = vintLen(b(p) & 0xFF)
        if (idn < 0 || idn > 4 || p + idn > b.length) return
        var id = 0L
        for (i <- 0 until idn) id = (id << 8) | (b(p + i) & 0xFF)
        val sp = p + idn
        if (sp >= b.length) return
        val szn = vintLen(b(sp) & 0xFF)
        if (szn < 0 || sp + szn > b.length) return
        var sz = ((b(sp) & 0xFF) & (0xFF >>> szn)).toLong
        for (i <- 1 until szn) sz = (sz << 8) | (b(sp + i) & 0xFF)
        val unknown = sz == (1L << (7 * szn)) - 1
        val d = sp + szn
        val e = if (unknown) end
        else if (d + sz > end || sz > Int.MaxValue) return
        else (d + sz).toInt
        id match {
          case 0x18538067 | 0x1549A966 | 0x1654AE6B | 0xAE | 0xE0 =>
            walk(d, e, depth + 1) // Segment/Info/Tracks/TrackEntry/Video
          case 0x2AD7B1 if !unknown => // TimecodeScale (uint)
            var v = 0L; for (i <- 0 until sz.toInt) v = (v << 8) | (b(d + i) & 0xFF)
            if (v > 0) timecodeScale = v
          case 0x4489 if !unknown => // Duration (float 4 or 8)
            var bits = 0L
            for (i <- 0 until sz.toInt) bits = (bits << 8) | (b(d + i) & 0xFF)
            if (sz == 4) duration = java.lang.Float.intBitsToFloat(bits.toInt).toDouble
            else if (sz == 8) duration = java.lang.Double.longBitsToDouble(bits)
          case 0xB0 if !unknown => // PixelWidth
            var v = 0L; for (i <- 0 until sz.toInt) v = (v << 8) | (b(d + i) & 0xFF)
            if (w == 0) w = v
          case 0xBA if !unknown => // PixelHeight
            var v = 0L; for (i <- 0 until sz.toInt) v = (v << 8) | (b(d + i) & 0xFF)
            if (h == 0) h = v
          case _ => ()
        }
        p = e
      }
    }
    try walk(0, b.length, 0) catch { case _: Exception => () }
    val durMs =
      if (duration > 0) math.round(duration * timecodeScale / 1e6) else 0L
    Array(w, h, durMs)
  }

  /** One Matroska TrackEntry's metadata: type 1 = video, 2 = audio
    * (the Matroska TrackType enum); codecId is the raw CodecID string
    * ("V_VP8", "A_OPUS", ...) — surfaced verbatim so unsupported-codec
    * drops are VISIBLE in data instead of silently yielding zero
    * frames/samples. */
  final case class MkvTrack(trackType: Int, codecId: String,
                            width: Int, height: Int,
                            channels: Int, sampleRate: Double, bitDepth: Int)

  /** All TrackEntry rows from Segment → Tracks: the diagnosability walk
    * behind video_meta's codec column and the container-audio metadata
    * face. Total over hostile bytes; empty when not EBML or no Tracks. */
  private[functions] def tracks(b: Array[Byte]): Seq[MkvTrack] = {
    if (b == null || b.length < 8 ||
      !((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
        (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3)) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[MkvTrack]
    def vintLen(first: Int): Int = {
      var m = 0x80; var n = 1
      while (n <= 8 && (first & m) == 0) { m >>= 1; n += 1 }
      if (n > 8) -1 else n
    }
    /** (id, size, dataOff, endOff) or null; unknown size extends to end. */
    def header(p: Int, end: Int): Array[Long] = {
      if (p >= b.length) return null
      val idn = vintLen(b(p) & 0xFF)
      if (idn < 0 || idn > 4 || p + idn > b.length) return null
      var id = 0L
      var i = 0
      while (i < idn) { id = (id << 8) | (b(p + i) & 0xFF); i += 1 }
      val sp = p + idn
      if (sp >= b.length) return null
      val szn = vintLen(b(sp) & 0xFF)
      if (szn < 0 || sp + szn > b.length) return null
      var sz = ((b(sp) & 0xFF) & (0xFF >>> szn)).toLong
      i = 1
      while (i < szn) { sz = (sz << 8) | (b(sp + i) & 0xFF); i += 1 }
      val unknown = sz == (1L << (7 * szn)) - 1
      val d = sp + szn
      val e = if (unknown) end
      else if (d + sz > end || sz > Int.MaxValue) return null
      else (d + sz).toInt
      Array(id, if (unknown) -1L else sz, d, e)
    }
    def uintAt(d: Int, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len && len <= 8) { v = (v << 8) | (b(d + i) & 0xFF); i += 1 }
      v
    }
    def floatAt(d: Int, len: Int): Double =
      if (len == 4) java.lang.Float.intBitsToFloat(uintAt(d, 4).toInt).toDouble
      else if (len == 8) java.lang.Double.longBitsToDouble(uintAt(d, 8))
      else 0.0
    def entry(start: Int, end: Int): Unit = {
      var tt = 0; var codec: String = null
      var w = 0; var h = 0; var ch = 0; var rate = 0.0; var bits = 0
      def sub(s0: Int, e0: Int, inAv: Int): Unit = {
        var p = s0
        while (p < e0) {
          val hd = header(p, e0)
          if (hd == null) return
          val d = hd(2).toInt; val e = hd(3).toInt; val sz = hd(1)
          if (sz >= 0) hd(0) match {
            case 0x83 => tt = uintAt(d, sz.toInt).toInt // TrackType
            case 0x86 if sz <= 64 => codec = new String(b, d, sz.toInt, "US-ASCII")
            case 0xE0 => sub(d, e, 1) // Video
            case 0xE1 => sub(d, e, 2) // Audio
            case 0xB0 if inAv == 1 => w = uintAt(d, sz.toInt).toInt
            case 0xBA if inAv == 1 => h = uintAt(d, sz.toInt).toInt
            case 0xB5 if inAv == 2 => rate = floatAt(d, sz.toInt) // SamplingFrequency
            case 0x9F if inAv == 2 => ch = uintAt(d, sz.toInt).toInt // Channels
            case 0x6264 if inAv == 2 => bits = uintAt(d, sz.toInt).toInt // BitDepth
            case _ => ()
          }
          p = e
        }
      }
      sub(start, end, 0)
      // spec defaults the audio face relies on: 1 channel, 8 kHz
      if (tt == 2 && ch == 0) ch = 1
      if (tt == 2 && rate == 0.0) rate = 8000.0
      out += MkvTrack(tt, codec, w, h, ch, rate, bits)
    }
    def walk(start: Int, end: Int, depth: Int): Unit = {
      var p = start
      while (p < end && depth < 8 && out.length < 64) {
        val hd = header(p, end)
        if (hd == null) return
        hd(0) match {
          case 0x18538067L | 0x1654AE6BL => walk(hd(2).toInt, hd(3).toInt, depth + 1)
          case 0xAE => entry(hd(2).toInt, hd(3).toInt)
          case _ => ()
        }
        p = hd(3).toInt
      }
    }
    try walk(0, b.length, 0) catch { case _: Exception => () }
    out.toSeq
  }

  /** The raw IVF fourcc ("VP80", "VP90", "AV01", ...) — the codec
    * identifier video_meta surfaces so a zero-frame IVF is diagnosable. */
  private[functions] def ivfCodec(b: Array[Byte]): String =
    if (b == null || b.length < 12 ||
      !(b(0) == 'D' && b(1) == 'K' && b(2) == 'I' && b(3) == 'F')) null
    else new String(b, 8, 4, "US-ASCII").trim

  // -------------------------------------------- fixture/test writers

  /** Audio-only WebM fixture: EBML header + Segment(Info(TimecodeScale,
    * Duration), Tracks(audio TrackEntry: CodecID + Audio(SamplingFrequency,
    * Channels [, BitDepth when > 0]))) — the metadata shape a real
    * WebM-Opus/Vorbis file declares; no clusters (audio_meta reads no
    * sample data). */
  /** Cue text of the first S_TEXT/UTF8 or S_TEXT/ASS subtitle track
    * (TrackType 0x11) in stream order, newline-joined — text FROM video
    * containers for the document tier. ASS blocks carry the cue in the
    * 9th comma-separated dialogue field. Null when the buffer is not
    * Matroska or declares no text subtitle track. */
  private[functions] def subtitleText(b: Array[Byte]): String = {
    if (b == null || b.length < 8 ||
      !((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
        (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3)) return null
    def vintLen(first: Int): Int = {
      var m = 0x80; var n = 1
      while (n <= 8 && (first & m) == 0) { m >>= 1; n += 1 }
      if (n > 8) -1 else n
    }
    def readId(p: Int): (Long, Int) = {
      if (p >= b.length) return (-1L, 0)
      val n = vintLen(b(p) & 0xFF)
      if (n < 0 || n > 4 || p + n > b.length) return (-1L, 0)
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (b(p + i) & 0xFF); i += 1 }
      (v, n)
    }
    def readSize(p: Int): (Long, Int) = {
      if (p >= b.length) return (-1L, 0)
      val first = b(p) & 0xFF
      val n = vintLen(first)
      if (n < 0 || p + n > b.length) return (-1L, 0)
      var v = (first & (0xFF >>> n)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (b(p + i) & 0xFF); i += 1 }
      (if (v == (1L << (7 * n)) - 1) -2L else v, n)
    }
    var subTrack = -1L
    var isAss = false
    val cues = scala.collection.mutable.ArrayBuffer.empty[String]
    def trackEntry(start: Int, end: Int): Unit = {
      var num = -1L
      var typ = -1L
      var codec: String = null
      var p = start
      while (p < end) {
        val (id, idn) = readId(p)
        if (id < 0) return
        val (sz, szn) = readSize(p + idn)
        if (sz < 0) return
        val d = p + idn + szn
        if (d + sz > end) return
        id match {
          case 0xD7 =>
            var v = 0L; var i = 0
            while (i < sz.toInt) { v = (v << 8) | (b(d + i) & 0xFF); i += 1 }
            num = v
          case 0x83 => typ = if (sz >= 1) b(d) & 0xFF else -1
          case 0x86 => codec = new String(b, d, sz.toInt, "US-ASCII")
          case _ => ()
        }
        p = d + sz.toInt
      }
      if (typ == 0x11 && num > 0 && subTrack < 0 && codec != null &&
        (codec == "S_TEXT/UTF8" || codec == "S_TEXT/ASS")) {
        subTrack = num
        isAss = codec == "S_TEXT/ASS"
      }
    }
    def block(start: Int, end: Int): Unit = {
      if (subTrack <= 0 || start >= end) return
      val first = b(start) & 0xFF
      val tn = vintLen(first)
      if (tn < 0 || start + tn + 3 > end) return
      var track = (first & (0xFF >>> tn)).toLong
      var i = 1
      while (i < tn) { track = (track << 8) | (b(start + i) & 0xFF); i += 1 }
      if (track != subTrack) return
      val d = start + tn + 3 // timecode(2) + flags(1); no lacing for text
      if (d >= end) return
      val raw = new String(b, d, end - d, "UTF-8")
      val text = if (!isAss) raw else {
        val parts = raw.split(",", 9)
        if (parts.length == 9) parts(8) else raw
      }
      if (text.nonEmpty && cues.length < (1 << 16)) cues += text
    }
    def walk(start: Int, end: Int, depth: Int): Unit = {
      var p = start
      while (p < end && depth < 16) {
        val (id, idn) = readId(p)
        if (id < 0) return
        val (sz0, szn) = readSize(p + idn)
        if (sz0 == -1L) return
        val d = p + idn + szn
        val e = if (sz0 == -2L) end
        else if (d + sz0 > end || sz0 > Int.MaxValue) return
        else (d + sz0).toInt
        id match {
          case 0x18538067 | 0x1654AE6B | 0x1F43B675 | 0xA0 =>
            walk(d, e, depth + 1)
          case 0xAE => trackEntry(d, e)
          case 0xA3 | 0xA1 => block(d, e)
          case _ => ()
        }
        p = e
      }
    }
    walk(0, b.length, 0)
    if (subTrack <= 0) null else cues.mkString("\n")
  }

  /** Vorbis packet sequence from a Matroska A_VORBIS track: the three
    * header packets ride the TrackEntry's CodecPrivate in Xiph lacing
    * (count byte 2, then 255-sum lengths for the first two, remainder =
    * setup), audio packets ride Block/SimpleBlock payloads — all four
    * lacing modes (none / Xiph / fixed / EBML). Matroska carries no
    * Vorbis granule; the decoder keeps every produced sample. Null when
    * the buffer is not Matroska or has no A_VORBIS track. */
  private[functions] def vorbisPackets(b: Array[Byte]): Array[Array[Byte]] = {
    if (b == null || b.length < 8 ||
      !((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
        (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3)) return null
    def vintLen(first: Int): Int = {
      var m = 0x80; var n = 1
      while (n <= 8 && (first & m) == 0) { m >>= 1; n += 1 }
      if (n > 8) -1 else n
    }
    def readId(p: Int): (Long, Int) = {
      if (p >= b.length) return (-1L, 0)
      val n = vintLen(b(p) & 0xFF)
      if (n < 0 || n > 4 || p + n > b.length) return (-1L, 0)
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (b(p + i) & 0xFF); i += 1 }
      (v, n)
    }
    def readSize(p: Int): (Long, Int) = {
      if (p >= b.length) return (-1L, 0)
      val first = b(p) & 0xFF
      val n = vintLen(first)
      if (n < 0 || p + n > b.length) return (-1L, 0)
      var v = (first & (0xFF >>> n)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (b(p + i) & 0xFF); i += 1 }
      (if (v == (1L << (7 * n)) - 1) -2L else v, n)
    }
    var vorbisTrack = -1L
    var headers: Array[Array[Byte]] = null
    val audio = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    /** CodecPrivate Xiph lacing: count byte (must be 2), 255-sum sizes
      * for the first two packets, remainder is the third. */
    def parsePrivate(d: Int, e: Int): Array[Array[Byte]] = {
      if (d >= e || (b(d) & 0xFF) != 2) return null
      var p = d + 1
      val sizes = new Array[Int](2)
      var i = 0
      while (i < 2) {
        var sz = 0
        var v = 255
        while (v == 255 && p < e) { v = b(p) & 0xFF; sz += v; p += 1 }
        if (v == 255) return null
        sizes(i) = sz
        i += 1
      }
      val rest = e - p - sizes(0) - sizes(1)
      if (rest <= 0) return null
      val out = new Array[Array[Byte]](3)
      out(0) = java.util.Arrays.copyOfRange(b, p, p + sizes(0))
      out(1) = java.util.Arrays.copyOfRange(b, p + sizes(0), p + sizes(0) + sizes(1))
      out(2) = java.util.Arrays.copyOfRange(b, p + sizes(0) + sizes(1), e)
      out
    }

    def trackEntry(start: Int, end: Int): Unit = {
      var num = -1L
      var typ = -1L
      var codec: String = null
      var privAt = -1
      var privEnd = -1
      var p = start
      while (p < end) {
        val (id, idn) = readId(p)
        if (id < 0) return
        val (sz, szn) = readSize(p + idn)
        if (sz < 0) return
        val d = p + idn + szn
        if (d + sz > end) return
        id match {
          case 0xD7 =>
            var v = 0L; var i = 0
            while (i < sz.toInt) { v = (v << 8) | (b(d + i) & 0xFF); i += 1 }
            num = v
          case 0x83 => typ = if (sz >= 1) b(d) & 0xFF else -1
          case 0x86 => codec = new String(b, d, sz.toInt, "US-ASCII")
          case 0x63A2 => privAt = d; privEnd = d + sz.toInt
          case _ => ()
        }
        p = d + sz.toInt
      }
      if (typ == 2 && num > 0 && vorbisTrack < 0 && codec == "A_VORBIS" &&
        privAt >= 0) {
        val h = parsePrivate(privAt, privEnd)
        if (h != null) { vorbisTrack = num; headers = h }
      }
    }

    def block(start: Int, end: Int): Unit = {
      if (vorbisTrack <= 0 || start >= end || audio.length >= (1 << 18)) return
      val first = b(start) & 0xFF
      val tn = vintLen(first)
      if (tn < 0 || start + tn + 3 > end) return
      var track = (first & (0xFF >>> tn)).toLong
      var i = 1
      while (i < tn) { track = (track << 8) | (b(start + i) & 0xFF); i += 1 }
      if (track != vorbisTrack) return
      val flags = b(start + tn + 2) & 0xFF
      var p = start + tn + 3
      (flags & 0x06) match {
        case 0x00 => // no lacing: one packet
          if (p < end) audio += java.util.Arrays.copyOfRange(b, p, end)
        case 0x02 => // Xiph: count byte, 255-sum sizes, remainder last
          if (p >= end) return
          val n = (b(p) & 0xFF) + 1
          p += 1
          val sizes = new Array[Int](n)
          var k = 0
          while (k < n - 1) {
            var sz = 0
            var v = 255
            while (v == 255 && p < end) { v = b(p) & 0xFF; sz += v; p += 1 }
            if (v == 255) return
            sizes(k) = sz
            k += 1
          }
          var used = 0
          k = 0
          while (k < n - 1) { used += sizes(k); k += 1 }
          sizes(n - 1) = end - p - used
          if (sizes(n - 1) < 0) return
          k = 0
          while (k < n) {
            audio += java.util.Arrays.copyOfRange(b, p, p + sizes(k))
            p += sizes(k)
            k += 1
          }
        case 0x04 => // fixed-size lacing: count byte, equal splits
          if (p >= end) return
          val n = (b(p) & 0xFF) + 1
          p += 1
          val each = (end - p) / n
          if (each <= 0 || (end - p) % n != 0) return
          var k = 0
          while (k < n) {
            audio += java.util.Arrays.copyOfRange(b, p, p + each)
            p += each
            k += 1
          }
        case _ => // EBML lacing: count, first size vint, signed deltas
          if (p >= end) return
          val n = (b(p) & 0xFF) + 1
          p += 1
          val sizes = new Array[Int](n)
          // first size: plain unsigned vint
          var fl = vintLen(b(p) & 0xFF)
          if (fl < 0 || p + fl > end) return
          var v = ((b(p) & 0xFF) & (0xFF >>> fl)).toLong
          var i2 = 1
          while (i2 < fl) { v = (v << 8) | (b(p + i2) & 0xFF); i2 += 1 }
          p += fl
          sizes(0) = v.toInt
          var k = 1
          while (k < n - 1) {
            fl = vintLen(b(p) & 0xFF)
            if (fl < 0 || p + fl > end) return
            var dv = ((b(p) & 0xFF) & (0xFF >>> fl)).toLong
            i2 = 1
            while (i2 < fl) { dv = (dv << 8) | (b(p + i2) & 0xFF); i2 += 1 }
            p += fl
            val signed = dv - ((1L << (7 * fl - 1)) - 1) // signed vint bias
            sizes(k) = sizes(k - 1) + signed.toInt
            if (sizes(k) < 0) return
            k += 1
          }
          var used = 0
          k = 0
          while (k < n - 1) { used += sizes(k); k += 1 }
          sizes(n - 1) = end - p - used
          if (sizes(n - 1) < 0) return
          k = 0
          while (k < n) {
            if (p + sizes(k) > end) return
            audio += java.util.Arrays.copyOfRange(b, p, p + sizes(k))
            p += sizes(k)
            k += 1
          }
      }
    }

    def walk(start: Int, end: Int, depth: Int): Unit = {
      var p = start
      while (p < end && depth < 16) {
        val (id, idn) = readId(p)
        if (id < 0) return
        val (sz0, szn) = readSize(p + idn)
        if (sz0 == -1L) return
        val d = p + idn + szn
        val e = if (sz0 == -2L) end
        else if (d + sz0 > end || sz0 > Int.MaxValue) return
        else (d + sz0).toInt
        id match {
          case 0x18538067 | 0x1654AE6B | 0x1F43B675 | 0xA0 =>
            walk(d, e, depth + 1)
          case 0xAE => trackEntry(d, e)
          case 0xA3 | 0xA1 => block(d, e)
          case _ => ()
        }
        p = e
      }
    }
    walk(0, b.length, 0)
    if (headers == null) return null
    (headers ++ audio).toArray
  }

  /** Matroska A_VORBIS fixture: TrackEntry (type 2, CodecPrivate =
    * Xiph-laced 3 header packets) + Clusters whose SimpleBlocks carry
    * the audio packets — the first blocks Xiph-laced in pairs, the rest
    * unlaced, so both block shapes are exercised. Input is the
    * [[Vorbis.encodePacketSeq]] sequence. */
  def encodeMkvVorbis(pkts: Array[Array[Byte]],
                      sampleRate: Double = 16000.0): Array[Byte] = {
    require(pkts.length >= 4, "need headers + audio packets")
    def sizeVint(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1
      val out = new Array[Byte](n)
      var x = v | (1L << (7 * n))
      var i = n - 1
      while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
      out
    }
    def idBytes(id: Long): Array[Byte] = {
      var n = 1
      while (n < 4 && (id >> (8 * n)) != 0) n += 1
      Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    def el(id: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id) ++ sizeVint(payload.length) ++ payload
    def uintEl(id: Long, v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >>> (8 * n)) != 0) n += 1
      el(id, Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte))
    }
    def xiphSizes(len: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var rem = len
      while (rem >= 255) { out.write(255); rem -= 255 }
      out.write(rem)
      out.toByteArray
    }
    val ebml = el(0x1A45DFA3L,
      uintEl(0x4286, 1) ++ uintEl(0x42F7, 1) ++ uintEl(0x42F2, 4) ++
        uintEl(0x42F3, 8) ++ el(0x4282, "matroska".getBytes("US-ASCII")) ++
        uintEl(0x4287, 2) ++ uintEl(0x4285, 2))
    val info = el(0x1549A966L, uintEl(0x2AD7B1, 1000000L))
    val priv = Array[Byte](2) ++ xiphSizes(pkts(0).length) ++
      xiphSizes(pkts(1).length) ++ pkts(0) ++ pkts(1) ++ pkts(2)
    val rateBits = java.lang.Double.doubleToLongBits(sampleRate)
    val rateEl = el(0xB5, Array.tabulate(8)(i =>
      ((rateBits >>> (8 * (7 - i))) & 0xFF).toByte))
    val entry = el(0xAE, uintEl(0xD7, 1) ++ uintEl(0x73C5, 1) ++
      uintEl(0x83, 2) ++ el(0x86, "A_VORBIS".getBytes("US-ASCII")) ++
      el(0x63A2, priv) ++ el(0xE1, rateEl ++ uintEl(0x9F, 1)))
    val audio = pkts.drop(3)
    val blocks = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < audio.length) {
      if (i + 1 < audio.length && i < 4) {
        // Xiph-laced pair (flags bit 0x02)
        val body = Array[Byte](0x81.toByte, 0, 0, 0x02.toByte, 1) ++
          xiphSizes(audio(i).length) ++ audio(i) ++ audio(i + 1)
        blocks.write(el(0xA3, body))
        i += 2
      } else {
        blocks.write(el(0xA3,
          Array[Byte](0x81.toByte, 0, 0, 0) ++ audio(i)))
        i += 1
      }
    }
    val cluster = el(0x1F43B675L, uintEl(0xE7, 0) ++ blocks.toByteArray)
    ebml ++ el(0x18538067L, info ++ el(0x1654AE6BL, entry) ++ cluster)
  }

  /** Matroska subtitle fixture: Tracks(TrackEntry type 0x11 with the
    * given S_TEXT codec) + one SimpleBlock per cue. */
  def encodeMkvSubtitles(cues: Seq[String],
                         codecId: String = "S_TEXT/UTF8"): Array[Byte] = {
    def sizeVint(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1
      val out = new Array[Byte](n)
      var x = v | (1L << (7 * n))
      var i = n - 1
      while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
      out
    }
    def idBytes(id: Long): Array[Byte] = {
      var n = 1
      while (n < 4 && (id >> (8 * n)) != 0) n += 1
      Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    def el(id: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id) ++ sizeVint(payload.length) ++ payload
    def uintEl(id: Long, v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >>> (8 * n)) != 0) n += 1
      el(id, Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte))
    }
    val ebml = el(0x1A45DFA3L,
      uintEl(0x4286, 1) ++ uintEl(0x42F7, 1) ++ uintEl(0x42F2, 4) ++
        uintEl(0x42F3, 8) ++ el(0x4282, "matroska".getBytes("US-ASCII")) ++
        uintEl(0x4287, 2) ++ uintEl(0x4285, 2))
    val info = el(0x1549A966L, uintEl(0x2AD7B1, 1000000L))
    val entry = el(0xAE, uintEl(0xD7, 1) ++ uintEl(0x73C5, 1) ++
      uintEl(0x83, 0x11) ++ el(0x86, codecId.getBytes("US-ASCII")))
    val blocks = cues.zipWithIndex.map { case (c, i) =>
      el(0xA3, Array[Byte](0x81.toByte, ((i * 500) >> 8).toByte,
        (i * 500).toByte, 0x80.toByte) ++ c.getBytes("UTF-8"))
    }.reduceOption(_ ++ _).getOrElse(Array.emptyByteArray)
    val cluster = el(0x1F43B675L, uintEl(0xE7, 0) ++ blocks)
    ebml ++ el(0x18538067L, info ++ el(0x1654AE6BL, entry) ++ cluster)
  }

  def encodeWebmAudio(codecId: String, channels: Int, sampleRate: Double,
                      bitDepth: Int, durationMs: Long): Array[Byte] = {
    def sizeVint(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1
      val out = new Array[Byte](n)
      var x = v | (1L << (7 * n))
      var i = n - 1
      while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
      out
    }
    def idBytes(id: Long): Array[Byte] = {
      var n = 1
      while (n < 4 && (id >> (8 * n)) != 0) n += 1
      Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    def el(id: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id) ++ sizeVint(payload.length) ++ payload
    def uintEl(id: Long, v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >>> (8 * n)) != 0) n += 1
      el(id, Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte))
    }
    def f64El(id: Long, v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      el(id, Array.tabulate(8)(i => ((bits >>> (8 * (7 - i))) & 0xFF).toByte))
    }
    val ebml = el(0x1A45DFA3L,
      uintEl(0x4286, 1) ++ uintEl(0x42F7, 1) ++ uintEl(0x42F2, 4) ++
        uintEl(0x42F3, 8) ++ el(0x4282, "webm".getBytes("US-ASCII")) ++
        uintEl(0x4287, 2) ++ uintEl(0x4285, 2))
    val info = el(0x1549A966L, uintEl(0x2AD7B1, 1000000L) ++
      f64El(0x4489, durationMs.toDouble))
    val audio = el(0xE1, f64El(0xB5, sampleRate) ++ uintEl(0x9F, channels) ++
      (if (bitDepth > 0) uintEl(0x6264, bitDepth) else Array.emptyByteArray))
    val entry = el(0xAE, uintEl(0xD7, 1) ++ uintEl(0x73C5, 1) ++
      uintEl(0x83, 2) ++ el(0x86, codecId.getBytes("US-ASCII")) ++ audio)
    ebml ++ el(0x18538067L, info ++ el(0x1654AE6BL, entry))
  }

  /** Raw VP8 keyframe bitstreams into an IVF container (the codec-SDK
    * test format: trivial by construction, which is exactly why it is the
    * right hostile-fixture substrate). */
  def encodeIvf(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    bos.write("DKIF".getBytes("US-ASCII")); le16(0); le16(32)
    bos.write("VP80".getBytes("US-ASCII")); le16(w); le16(h)
    le32(30); le32(1) // timebase 30/1
    le32(frames.length); le32(0)
    frames.zipWithIndex.foreach { case (f, i) =>
      le32(f.length); le32(i); le32(0) // size + 64-bit pts
      bos.write(f)
    }
    bos.toByteArray
  }

  /** Raw VP8 keyframe bitstreams into a minimal one-cluster WebM: EBML
    * header (DocType webm), Segment(Info(TimecodeScale + Duration),
    * Tracks(video TrackEntry V_VP8), Cluster(Timecode, one SimpleBlock
    * per frame — or ONE laced SimpleBlock when `lacing` is 2 (Xiph),
    * 4 (fixed, equal-size frames only) or 6 (EBML))). */
  def encodeWebm(w: Int, h: Int, frames: Seq[Array[Byte]],
                 lacing: Int = 0, blockGroups: Boolean = false,
                 trackNum: Int = 1, codecId: String = "V_VP8",
                 codecPrivate: Array[Byte] = null): Array[Byte] = {
    def sizeVint(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1
      val out = new Array[Byte](n)
      var x = v | (1L << (7 * n))
      var i = n - 1
      while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
      out
    }
    /** Plain vint (track numbers, first lace size): all-ones is an
      * ordinary VALUE here (track 127 = 0xFF), so minimal length uses
      * `>` where sizeVint needs `>=` to dodge the unknown-size pattern. */
    def plainVint(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && v > (1L << (7 * n)) - 1) n += 1
      val out = new Array[Byte](n)
      var x = v | (1L << (7 * n))
      var i = n - 1
      while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
      out
    }
    def idBytes(id: Long): Array[Byte] = {
      var n = 1
      while (n < 4 && (id >> (8 * n)) != 0) n += 1
      Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    def el(id: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id) ++ sizeVint(payload.length) ++ payload
    def uintEl(id: Long, v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >>> (8 * n)) != 0) n += 1
      el(id, Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte))
    }
    val ebml = el(0x1A45DFA3L,
      uintEl(0x4286, 1) ++ uintEl(0x42F7, 1) ++ uintEl(0x42F2, 4) ++
        uintEl(0x42F3, 8) ++ el(0x4282, "webm".getBytes("US-ASCII")) ++
        uintEl(0x4287, 2) ++ uintEl(0x4285, 2))
    // Duration in timecode units (scale 1 ms): 33 ms per frame, float64
    val durBits = java.lang.Double.doubleToLongBits(frames.length * 33.0)
    val info = el(0x1549A966L, uintEl(0x2AD7B1, 1000000L) ++
      el(0x4489, Array.tabulate(8)(i => ((durBits >>> (8 * (7 - i))) & 0xFF).toByte)))
    val video = el(0xE0, uintEl(0xB0, w) ++ uintEl(0xBA, h))
    val entry = el(0xAE, uintEl(0xD7, trackNum) ++ uintEl(0x73C5, 1) ++
      uintEl(0x83, 1) ++ el(0x86, codecId.getBytes("US-ASCII")) ++
      (if (codecPrivate != null) el(0x63A2, codecPrivate)
       else Array.emptyByteArray) ++ video)
    val tracks = el(0x1654AE6BL, entry)
    val blocks =
      if (lacing == 0)
        frames.zipWithIndex.map { case (f, i) =>
          // SimpleBlock: track vint, BE16 timecode, keyframe flag, frame
          // (or the muxer's other shape: BlockGroup wrapping a Block, whose
          // flags byte has no keyframe bit — detection is bitstream-shape)
          val payload = plainVint(trackNum) ++ Array(((i * 33) >> 8).toByte,
            (i * 33).toByte, (if (blockGroups) 0x00 else 0x80).toByte) ++ f
          if (blockGroups) el(0xA0, el(0xA1, payload)) else el(0xA3, payload)
        }.reduceOption(_ ++ _).getOrElse(Array.emptyByteArray)
      else {
        require(Seq(2, 4, 6).contains(lacing) && frames.nonEmpty,
          s"lacing must be 2|4|6 with frames, got $lacing")
        val head = scala.collection.mutable.ArrayBuffer.empty[Byte] ++=
          plainVint(trackNum) ++=
          Array[Byte](0, 0, (0x80 | lacing).toByte, (frames.length - 1).toByte)
        lacing match {
          case 2 => // Xiph: 255-run sizes for all but the last frame
            frames.init.foreach { f =>
              var sz = f.length
              while (sz >= 255) { head += 255.toByte; sz -= 255 }
              head += sz.toByte
            }
          case 4 =>
            require(frames.map(_.length).distinct.size == 1,
              "fixed lacing needs equal-size frames")
          case _ => // EBML: unsigned first size, signed-vint deltas
            def signedVint(d: Long): Array[Byte] = {
              var len = 1
              while (d + ((1L << (7 * len - 1)) - 1) < 0 ||
                d + ((1L << (7 * len - 1)) - 1) >= (1L << (7 * len)) - 1) len += 1
              val v = (d + ((1L << (7 * len - 1)) - 1)) | (1L << (7 * len))
              Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xFF).toByte)
            }
            if (frames.length > 1) {
              head ++= plainVint(frames.head.length)
              // deltas for frames 1..n-2 (the last is the remainder)
              frames.sliding(2).toSeq.init.foreach { case Seq(a, c) =>
                head ++= signedVint(c.length.toLong - a.length)
              }
            }
        }
        el(0xA3, head.toArray ++ frames.flatten.toArray)
      }
    val cluster = el(0x1F43B675L, uintEl(0xE7, 0) ++ blocks)
    ebml ++ el(0x18538067L, info ++ tracks ++ cluster)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/**
 * Audio/video kernels completing the multimodal tier: WAV (RIFF/WAVE,
 * PCM) gets real native DECODE — metadata, samples, and integer feature
 * extraction — and MP4 gets native container metadata (ISO BMFF box walk:
 * moov/mvhd duration, trak/tkhd dimensions). Together with
 * [[ImageKernels]] this makes image+audio+video metadata sweeps and
 * audio feature extraction run as fused codegen scans with no external
 * codec.
 *
 * All-integer feature arithmetic (sum of squares, zero crossings, peak)
 * — bit-identical on any cluster, SQL-replicable by the oracle. Byte
 * layouts follow the public specs: RIFF/WAVE (Microsoft/IBM WAVE spec),
 * ISO/IEC 14496-12 (ISO BMFF boxes).
 *
 * Compressed audio (MP3/AAC/Opus) and video FRAME decode are out of
 * scope by design — no codec ships in this container and platform
 * decoders are not bit-stable; [[Multimodal.decodeStub]] documents that
 * boundary. Container/PCM layers, which ARE deterministic, are real.
 */
object MediaKernels {

  // ============================================================== WAV

  /** (channels, sampleRate, bits, nSamplesPerChannel, dataOff, dataLen)
    * or null when not a parseable RIFF/WAVE. */
  private def wavInfo(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 44) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return null
    var p = 12
    var channels = 0L; var rate = 0L; var bits = 0L
    var dataOff = -1L; var dataLen = 0L
    while (p + 8 <= b.length) {
      val id = new String(b, p, 4, "US-ASCII")
      val len = le32(b, p + 4)
      if (id == "fmt " && len >= 16 && p + 8 + 16 <= b.length) {
        channels = le16(b, p + 10)
        rate = le32(b, p + 12)
        bits = le16(b, p + 22)
      } else if (id == "data") {
        dataOff = p + 8
        dataLen = math.min(len, b.length - dataOff)
      }
      p += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataOff < 0) return null
    val bytesPerFrame = channels * (bits / 8)
    if (bytesPerFrame <= 0) return null
    Array(channels, rate, bits, dataLen / bytesPerFrame, dataOff, dataLen)
  }

  /** struct(format, channels, sample_rate, bits, n_samples, duration_ms)
    * — header parse only; null format for unrecognized payloads. */
  def audioMetaRow(b: Array[Byte]): GenericInternalRow = {
    val i = wavInfo(b)
    if (i == null)
      new GenericInternalRow(Array[Any](null, 0, 0L, 0, 0L, 0L))
    else
      new GenericInternalRow(Array[Any](UTF8String.fromString("wav"),
        i(0).toInt, i(1), i(2).toInt, i(3), i(3) * 1000L / i(1)))
  }

  /** Interleaved PCM16 samples (all channels), or null. */
  private[functions] def wavSamples(b: Array[Byte]): Array[Int] = {
    val i = wavInfo(b)
    if (i == null || i(2) != 16) return null
    val off = i(4).toInt
    val n = (i(5) / 2).toInt
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      out(k) = ((b(off + 2 * k) & 0xFF) | (b(off + 2 * k + 1) << 8)).toShort.toInt
      k += 1
    }
    out
  }

  /** struct(n_samples, sq_sum, zero_crossings, peak) over the PCM16
    * stream — the standard signal-level screening features (energy,
    * spectral-flatness proxy, clipping check), all-integer. Nulls for
    * undecodable payloads. A zero crossing is a sign-bit change between
    * consecutive samples (negative ↔ non-negative). */
  def audioFeaturesRow(b: Array[Byte]): GenericInternalRow = {
    val s = wavSamples(b)
    if (s == null) return null
    var sq = 0L; var zc = 0L; var peak = 0L
    var i = 0
    while (i < s.length) {
      val v = s(i).toLong
      sq += v * v
      if (v.abs > peak) peak = v.abs
      if (i > 0 && ((s(i - 1) < 0) != (s(i) < 0))) zc += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](s.length.toLong, sq, zc, peak))
  }

  /** 63-bit audio fingerprint: the PCM stream is cut into 64 equal windows
    * (sample i → window i·64/n, exact integer division), bit k (0..62) is
    * set iff window k+1's energy (Σ s²) exceeds window k's. Sign-of-delta
    * over energies is invariant under global amplitude scaling — the same
    * recording at a different volume collapses — while distinct signals
    * differ in ~half the bits; the audio analogue of dHash. All-integer,
    * SQL-replicable. NULL when undecodable or shorter than 64 samples. */
  def audioFingerprint(b: Array[Byte]): java.lang.Long = {
    val s = wavSamples(b)
    if (s == null || s.length < 64) return null
    val e = new Array[Long](64)
    var i = 0
    while (i < s.length) {
      val w = (i.toLong * 64L / s.length).toInt
      e(w) += s(i).toLong * s(i)
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 63) { if (e(k + 1) > e(k)) fp |= (1L << k); k += 1 }
    fp
  }

  /** Minimal PCM16 mono WAV encoder (fixtures + sink). */
  def encodeWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def w16(p: Int, v: Int): Unit = { out(p) = v.toByte; out(p + 1) = (v >> 8).toByte }
    def w32(p: Int, v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >> 8).toByte
      out(p + 2) = (v >> 16).toByte; out(p + 3) = (v >> 24).toByte
    }
    def tag(p: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, p)
    tag(0, "RIFF"); w32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16); w16(20, 1) // PCM
    w16(22, 1); w32(24, sampleRate); w32(28, sampleRate * 2); w16(32, 2); w16(34, 16)
    tag(36, "data"); w32(40, dataLen)
    var i = 0
    while (i < samples.length) { w16(44 + 2 * i, samples(i) & 0xFFFF); i += 1 }
    out
  }

  // ============================================================== MP4

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) | ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)
  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) | ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)

  /** struct(format, width, height, duration_ms) from the ISO BMFF box
    * tree: mvhd timescale+duration, first non-zero tkhd width/height
    * (16.16 fixed point, integer part). Requires an `ftyp` leading box
    * (the MP4 brand signature); null format otherwise. */
  def videoMetaRow(b: Array[Byte]): GenericInternalRow = {
    val m = mp4Meta(b)
    if (m == null) new GenericInternalRow(Array[Any](null, 0, 0, 0L))
    else new GenericInternalRow(Array[Any](UTF8String.fromString("mp4"),
      m(0).toInt, m(1).toInt, m(2)))
  }

  private[functions] def mp4Meta(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 16) return null
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return null
    var width = 0L; var height = 0L; var durMs = 0L
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        var size = be32(b, p)
        val typ = new String(b, p + 4, 4, "US-ASCII")
        var hdr = 8
        if (size == 1 && p + 16 <= end) { // 64-bit largesize
          size = (be32(b, p + 8) << 32) | be32(b, p + 12)
          hdr = 16
        } else if (size == 0) size = end - p // box extends to end
        if (size < hdr || p + size > end) return // corrupt — stop cleanly
        typ match {
          case "moov" | "trak" => walk(p + hdr, p + size.toInt)
          case "mvhd" if size >= hdr + 20 =>
            val v = b(p + hdr) & 0xFF
            if (v == 1 && size >= hdr + 28) {
              val ts = be32(b, p + hdr + 20)
              val dur = (be32(b, p + hdr + 24) << 32) | be32(b, p + hdr + 28)
              if (ts > 0) durMs = dur * 1000L / ts
            } else {
              val ts = be32(b, p + hdr + 12)
              val dur = be32(b, p + hdr + 16)
              if (ts > 0) durMs = dur * 1000L / ts
            }
          case "tkhd" =>
            // width/height are the LAST 8 bytes of the box, 16.16 fixed
            val wOff = p + size.toInt - 8
            if (wOff >= p + hdr) {
              val w = be32(b, wOff) >> 16
              val h = be32(b, wOff + 4) >> 16
              if (width == 0 && w > 0) { width = w; height = h }
            }
          case _ => ()
        }
        p += size.toInt
      }
    }
    walk(0, b.length)
    if (durMs == 0 && width == 0) null else Array(width, height, durMs)
  }

  /** Minimal MP4 metadata fixture: ftyp + moov(mvhd + trak(tkhd)). */
  def encodeMp4Header(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + payload.length)
      val size = out.length
      out(0) = (size >> 24).toByte; out(1) = (size >> 16).toByte
      out(2) = (size >> 8).toByte; out(3) = size.toByte
      typ.getBytes("US-ASCII").copyToArray(out, 4)
      payload.copyToArray(out, 8)
      out
    }
    def u32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512) ++
      "isomiso2".getBytes("US-ASCII"))
    // mvhd v0: flags, ctime, mtime, timescale=1000, duration=durationMs
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++
      u32(durationMs) ++ new Array[Byte](80))
    // tkhd v0: standard 84-byte payload, width/height 16.16 at the end
    val tkhd = box("tkhd", new Array[Byte](76) ++
      u32(width.toLong << 16) ++ u32(height.toLong << 16))
    val trak = box("trak", tkhd)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }
}

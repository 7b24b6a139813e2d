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
 * FLAC sample decode is native ([[Flac]] — lossless, integer-exact, so
 * fingerprints match across WAV/FLAC containers). LOSSY audio
 * (MP3/AAC/Opus) and video FRAME decode are out of scope by design —
 * lossy decode is not bit-stable across decoders;
 * [[Multimodal.decodeStub]] documents that boundary. Container/PCM
 * layers, which ARE deterministic, are real.
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
      // corrupt length (negative via 32-bit wrap, or past 2 GiB) would
      // stall or reverse the walk — stop at what's parsed so far
      if (len < 0 || len > Int.MaxValue - 16) return mkWav(channels, rate, bits, dataOff, dataLen, b)
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
    mkWav(channels, rate, bits, dataOff, dataLen, b)
  }

  private def mkWav(channels: Long, rate: Long, bits: Long,
                    dataOff: Long, dataLen: Long, b: Array[Byte]): Array[Long] = {
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataOff < 0) return null
    val bytesPerFrame = channels * (bits / 8)
    if (bytesPerFrame <= 0) return null
    Array(channels, rate, bits, dataLen / bytesPerFrame, dataOff, dataLen)
  }

  /** struct(format, channels, sample_rate, bits, n_samples, duration_ms)
    * — header parse only (WAV, FLAC STREAMINFO, MP3 frame walk); null
    * format for unrecognized payloads. */
  def audioMetaRow(b: Array[Byte]): GenericInternalRow = {
    val wav = wavInfo(b)
    if (wav != null)
      return new GenericInternalRow(Array[Any](UTF8String.fromString("wav"),
        wav(0).toInt, wav(1), wav(2).toInt, wav(3), wav(3) * 1000L / wav(1)))
    val flac = flacInfo(b)
    if (flac != null)
      return new GenericInternalRow(Array[Any](UTF8String.fromString("flac"),
        flac(0).toInt, flac(1), flac(2).toInt, flac(3),
        if (flac(1) > 0) flac(3) * 1000L / flac(1) else 0L))
    val mp3 = mp3Info(b)
    if (mp3 != null)
      return new GenericInternalRow(Array[Any](UTF8String.fromString("mp3"),
        mp3(0).toInt, mp3(1), 0, mp3(2), if (mp3(1) > 0) mp3(2) * 1000L / mp3(1) else 0L))
    new GenericInternalRow(Array[Any](null, 0, 0L, 0, 0L, 0L))
  }

  /** FLAC STREAMINFO (metadata block 0): (channels, sampleRate, bits,
    * totalSamples) or null. Packed layout per the FLAC format spec:
    * after min/max blocksize (4) + min/max framesize (6), 8 bytes hold
    * sampleRate:20 | channels-1:3 | bits-1:5 | totalSamples:36. */
  private def flacInfo(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 8 + 34) return null
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return null
    if ((b(4) & 0x7F) != 0) return null // first block must be STREAMINFO
    val p = 8 + 10 // skip block header(4) + blocksizes(4) + framesizes(6)
    var bits = 0L
    var i = 0
    while (i < 8) { bits = (bits << 8) | (b(p + i) & 0xFFL); i += 1 }
    val rate = bits >>> 44
    val channels = ((bits >>> 41) & 0x7L) + 1
    val sampleBits = ((bits >>> 36) & 0x1FL) + 1
    val total = bits & 0xFFFFFFFFFL
    Array(channels, rate, sampleBits, total)
  }

  /** MP3 (MPEG-1 Layer III): skip a leading ID3v2 tag, then walk frame
    * headers — (channels, sampleRate, totalSamples) or null. CBR-exact;
    * VBR without a Xing header reports the true frame-walk totals too
    * (every frame is visited). */
  private def mp3Info(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 4) return null
    var p = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      p = 10 + size
    }
    val rates = Array(44100L, 48000L, 32000L, 0L)
    val bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    var frames = 0L
    var channels = 0L
    var rate = 0L
    while (p + 4 <= b.length) {
      if ((b(p) & 0xFF) != 0xFF || (b(p + 1) & 0xE0) != 0xE0) {
        return if (frames > 0) Array(channels, rate, frames * 1152L) else null
      }
      val versionBits = (b(p + 1) >> 3) & 0x3
      val layerBits = (b(p + 1) >> 1) & 0x3
      if (versionBits != 3 || layerBits != 1) return null // MPEG-1 Layer III only
      val br = bitrates((b(p + 2) >> 4) & 0xF)
      val sr = rates((b(p + 2) >> 2) & 0x3)
      if (br == 0 || sr == 0) return null
      val padding = (b(p + 2) >> 1) & 0x1
      val mode = (b(p + 3) >> 6) & 0x3
      channels = if (mode == 3) 1L else 2L
      rate = sr
      frames += 1
      p += (144L * br * 1000L / sr).toInt + padding
    }
    if (frames > 0) Array(channels, rate, frames * 1152L) else null
  }

  /** Minimal FLAC STREAMINFO metadata fixture. */
  def encodeFlacHeader(channels: Int, sampleRate: Long, bits: Int,
                       totalSamples: Long): Array[Byte] = {
    val out = new Array[Byte](8 + 34)
    "fLaC".getBytes("US-ASCII").copyToArray(out, 0)
    out(4) = 0x80.toByte // last-block flag + type 0
    out(7) = 34 // block length
    var packed = (sampleRate << 44) | ((channels - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | (totalSamples & 0xFFFFFFFFFL)
    var i = 7
    while (i >= 0) { out(8 + 10 + i) = (packed & 0xFF).toByte; packed >>>= 8; i -= 1 }
    out
  }

  /** Minimal MPEG-1 Layer III fixture: `frames` zero-payload frames at
    * 128 kbps / the given sample rate (44100/48000/32000), stereo. */
  def encodeMp3Header(sampleRate: Long, frames: Int): Array[Byte] = {
    val srIdx = sampleRate match {
      case 44100L => 0; case 48000L => 1; case 32000L => 2
      case other => throw new IllegalArgumentException(s"unsupported mp3 rate $other")
    }
    val frameLen = (144L * 128 * 1000L / sampleRate).toInt
    val out = new Array[Byte](frameLen * frames)
    var f = 0
    while (f < frames) {
      val p = f * frameLen
      out(p) = 0xFF.toByte
      out(p + 1) = 0xFB.toByte // MPEG-1 Layer III, no CRC
      out(p + 2) = ((9 << 4) | (srIdx << 2)).toByte // 128 kbps, no padding
      out(p + 3) = 0x00 // stereo
      f += 1
    }
    out
  }

  /** Interleaved integer samples from any losslessly-decodable container,
    * normalized to the 16-bit range: WAV PCM 8/16/24/32 (see
    * [[wavSamples]]) or FLAC (native [[Flac.decode16]], which applies the
    * same STREAMINFO-driven normalization) — lossless, integer-exact, and
    * identically normalized, so WAV and FLAC encodings of the same
    * recording at ANY supported bit depth yield IDENTICAL samples and
    * therefore identical fingerprints. Null when neither decodes. */
  private[functions] def pcmSamples(b: Array[Byte]): Array[Int] = {
    val w = wavSamples(b)
    if (w != null) w
    else if (b != null && b.length > 4 &&
      b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') Flac.decode16(b)
    else null
  }

  /** Interleaved integer samples normalized to the 16-bit range, or null.
    * PCM at 8 (unsigned, rescaled ×257 so 0→-32768 and 255→32767), 16,
    * 24, and 32 bits (high 16 bits) — float WAV stays out of scope (not
    * integer-exact). */
  private[functions] def wavSamples(b: Array[Byte]): Array[Int] = {
    val i = wavInfo(b)
    if (i == null) return null
    val bits = i(2).toInt
    val off = i(4).toInt
    val bytesPer = bits / 8
    if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return null
    val n = (i(5) / bytesPer).toInt
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      val p = off + bytesPer * k
      out(k) = bits match {
        case 8 => ((b(p) & 0xFF) - 128) * 257 // unsigned byte → full 16-bit span
        case 16 => ((b(p) & 0xFF) | (b(p + 1) << 8)).toShort.toInt
        case 24 => // little-endian signed 24 → high 16 bits
          (((b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) | (b(p + 2) << 16)) << 8) >> 16
        case _ => // little-endian signed 32 → high 16 bits
          ((b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
            ((b(p + 2) & 0xFF) << 16) | (b(p + 3) << 24)) >> 16
      }
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
    val s = pcmSamples(b)
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
    val s = pcmSamples(b)
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

  /** struct(format, width, height, duration_ms): ISO BMFF box tree (mvhd
    * timescale+duration, first non-zero tkhd width/height, 16.16 fixed
    * point) or RIFF AVI `avih` (µs/frame × total frames, dwWidth/
    * dwHeight); null format otherwise. */
  def videoMetaRow(b: Array[Byte]): GenericInternalRow = {
    val m = mp4Meta(b)
    if (m != null)
      return new GenericInternalRow(Array[Any](UTF8String.fromString("mp4"),
        m(0).toInt, m(1).toInt, m(2)))
    val a = aviMeta(b)
    if (a != null)
      return new GenericInternalRow(Array[Any](UTF8String.fromString("avi"),
        a(0).toInt, a(1).toInt, a(2)))
    new GenericInternalRow(Array[Any](null, 0, 0, 0L))
  }

  /** RIFF AVI main header (`avih` inside LIST hdrl): dwMicroSecPerFrame
    * at payload+0, dwTotalFrames at +16, dwWidth/dwHeight at +32/+36. */
  private[functions] def aviMeta(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 24) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return null
    def walk(start: Int, end: Int): Array[Long] = {
      var p = start
      while (p + 8 <= end) {
        val tag = new String(b, p, 4, "US-ASCII")
        val len = le32(b, p + 4).toInt
        val d = p + 8
        if (d + len > end || len < 0) return null
        if (tag == "LIST" && len >= 4) {
          val r = walk(d + 4, d + len)
          if (r != null) return r
        } else if (tag == "avih" && len >= 40) {
          val usPerFrame = le32(b, d)
          val totalFrames = le32(b, d + 16)
          val w = le32(b, d + 32)
          val h = le32(b, d + 36)
          return Array(w, h, usPerFrame * totalFrames / 1000L)
        }
        p = d + len + (len & 1)
      }
      null
    }
    walk(12, b.length)
  }

  /** Minimal AVI metadata fixture: RIFF(AVI ) → LIST(hdrl) → avih. */
  def encodeAviHeader(width: Int, height: Int, usPerFrame: Long,
                      totalFrames: Long): Array[Byte] = {
    val avih = new Array[Byte](8 + 56)
    def w32(a: Array[Byte], p: Int, v: Long): Unit = {
      a(p) = v.toByte; a(p + 1) = (v >> 8).toByte
      a(p + 2) = (v >> 16).toByte; a(p + 3) = (v >> 24).toByte
    }
    "avih".getBytes("US-ASCII").copyToArray(avih, 0)
    w32(avih, 4, 56)
    w32(avih, 8, usPerFrame)
    w32(avih, 8 + 16, totalFrames)
    w32(avih, 8 + 32, width)
    w32(avih, 8 + 36, height)
    val list = new Array[Byte](12 + avih.length)
    "LIST".getBytes("US-ASCII").copyToArray(list, 0)
    w32(list, 4, 4 + avih.length)
    "hdrl".getBytes("US-ASCII").copyToArray(list, 8)
    avih.copyToArray(list, 12)
    val out = new Array[Byte](12 + list.length)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    w32(out, 4, 4 + list.length)
    "AVI ".getBytes("US-ASCII").copyToArray(out, 8)
    list.copyToArray(out, 12)
    out
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
            if (v == 1 && size >= hdr + 32) {
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

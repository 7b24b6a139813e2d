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

  /** AIFF / AIFF-C (the big-endian RIFF cousin old Mac-era crawls
    * carry): FORM/AIFF or FORM/AIFC, COMM (channels, frames, bits,
    * 80-bit extended-float rate; AIFC adds a compression fourcc — NONE
    * and sowt byte-order PCM supported), SSND (offset field, PCM).
    * Returns (channels, rate, bits, nFrames, dataOff, littleEndian) or
    * null. */
  private[functions] def aiffInfo(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 38) return null
    if (!(b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
      (b(11) == 'F' || b(11) == 'C'))) return null
    val aifc = b(11) == 'C'
    var channels = 0L; var frames = 0L; var bits = 0L; var rate = 0L
    var little = 0L
    var dataOff = -1L
    var compOk = !aifc
    var p = 12
    while (p + 8 <= b.length) {
      val id = new String(b, p, 4, "US-ASCII")
      val len = be32(b, p + 4)
      if (len < 0 || len > Int.MaxValue - 16) return null
      val d = p + 8
      if (id == "COMM" && len >= 18 && d + 18 <= b.length) {
        channels = ((b(d) & 0xFF) << 8) | (b(d + 1) & 0xFF)
        frames = be32(b, d + 2)
        bits = ((b(d + 6) & 0xFF) << 8) | (b(d + 7) & 0xFF)
        // 80-bit IEEE extended: 15-bit exponent (bias 16383), 64-bit
        // mantissa with explicit leading 1 — sample rates are small
        // integers, so the integer part is exact
        val exp = (((b(d + 8) & 0x7F) << 8) | (b(d + 9) & 0xFF)) - 16383
        var mant = 0L
        var i = 0
        while (i < 8) { mant = (mant << 8) | (b(d + 10 + i) & 0xFFL); i += 1 }
        if (exp >= 0 && exp <= 62) rate = mant >>> (63 - exp)
        if (aifc && len >= 22 && d + 22 <= b.length) {
          val fourcc = new String(b, d + 18, 4, "US-ASCII")
          compOk = fourcc == "NONE" || fourcc == "sowt"
          if (fourcc == "sowt") little = 1L
        }
      } else if (id == "SSND" && len >= 8 && d + 8 <= b.length) {
        dataOff = d + 8 + be32(b, d) // offset field skips alignment pad
      }
      p = d + len.toInt + (len.toInt & 1)
    }
    if (channels <= 0 || channels > 64 || rate <= 0 || bits <= 0 ||
      dataOff < 0 || dataOff > b.length || frames < 0 || !compOk ||
      (bits != 8 && bits != 16)) return null
    Array(channels, rate, bits, frames, dataOff, little)
  }

  /** Interleaved PCM16 from an AIFF/AIFC payload (8-bit signed scaled
    * x257, 16-bit BE or sowt LE), or null. */
  private[functions] def aiffSamples(b: Array[Byte]): Array[Int] = {
    val i = aiffInfo(b)
    if (i == null) return null
    val bits = i(2).toInt
    val off = i(4).toInt
    val little = i(5) == 1L
    val bytesPer = bits / 8
    val n0 = i(0) * i(3) // channels x frames (Long: hostile counts)
    val n = math.min(n0, (b.length - off).toLong / bytesPer).toInt
    if (n <= 0) return null
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      val p = off + bytesPer * k
      out(k) =
        if (bits == 8) b(p) * 257 // AIFF 8-bit is SIGNED (unlike WAV)
        else if (little) ((b(p) & 0xFF) | (b(p + 1) << 8)).toShort.toInt
        else (((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)).toShort.toInt
      k += 1
    }
    out
  }

  /** Sun/NeXT .au: magic ".snd", u32 dataOffset / dataSize / encoding /
    * rate / channels (all BE). Encodings: 1 G.711 mu-law, 2 int8,
    * 3 int16 BE, 27 G.711 A-law — the G.711 expansions are closed-form
    * (no tables). Returns (channels, rate, bits, nSamples, dataOff,
    * encoding) or null. */
  private[functions] def auInfo(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 24) return null
    if (!(b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd')) return null
    val dataOff = be32(b, 4)
    val dataSize0 = be32(b, 8)
    val enc = be32(b, 12)
    val rate = be32(b, 16)
    val ch = be32(b, 20)
    if (dataOff < 24 || dataOff >= b.length || rate <= 0 || ch <= 0 || ch > 16)
      return null
    val bytesPer = enc match {
      case 1 | 2 | 27 => 1L
      case 3 => 2L
      case _ => return null
    }
    val avail = b.length - dataOff
    val dataSize = if (dataSize0 > 0 && dataSize0 <= avail) dataSize0 else avail
    val bits = if (enc == 3) 16L else 8L
    Array(ch, rate, bits, dataSize / bytesPer, dataOff, enc)
  }

  /** G.711 mu-law expansion (closed form, ITU-T G.711): magnitude =
    * ((mantissa << 3) + 0x84 << exponent) - 0x84. */
  @inline private def ulaw(code0: Int): Int = {
    val u = ~code0 & 0xFF
    val exp = (u >> 4) & 7
    val mant = u & 0xF
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** G.711 A-law expansion (closed form). */
  @inline private def alaw(code0: Int): Int = {
    val a = (code0 ^ 0x55) & 0xFF
    val exp = (a >> 4) & 7
    val mant = a & 0xF
    val mag =
      if (exp == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (exp - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Interleaved PCM16 from a .au payload, or null. */
  private[functions] def auSamples(b: Array[Byte]): Array[Int] = {
    val i = auInfo(b)
    if (i == null) return null
    val off = i(4).toInt
    val enc = i(5).toInt
    val n = i(3).toInt
    if (n <= 0) return null
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      out(k) = enc match {
        case 1 => ulaw(b(off + k) & 0xFF)
        case 2 => b(off + k) * 257 // signed int8
        case 27 => alaw(b(off + k) & 0xFF)
        case _ => (((b(off + 2 * k) & 0xFF) << 8) | (b(off + 2 * k + 1) & 0xFF))
          .toShort.toInt
      }
      k += 1
    }
    out
  }

  private def mkWav(channels: Long, rate: Long, bits: Long,
                    dataOff: Long, dataLen: Long, b: Array[Byte]): Array[Long] = {
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataOff < 0) return null
    val bytesPerFrame = channels * (bits / 8)
    if (bytesPerFrame <= 0) return null
    Array(channels, rate, bits, dataLen / bytesPerFrame, dataOff, dataLen)
  }

  /** struct(format, channels, sample_rate, bits, n_samples, duration_ms,
    * codec) — header parse only (WAV, FLAC STREAMINFO, MP3 frame walk),
    * plus CONTAINER-held audio tracks: an MP4 `soun` trak (stsd entry
    * fourcc + AudioSampleEntry channel/rate fields + mdhd duration) and a
    * Matroska audio TrackEntry (CodecID + Audio element + Segment
    * duration). Compressed container audio (Opus/Vorbis/AAC) surfaces its
    * declared metadata with n_samples 0 — sample DECODE stays a non-goal,
    * but the track is no longer invisible to the audio tier. Null format
    * for unrecognized payloads. */
  def audioMetaRow(b: Array[Byte]): GenericInternalRow = {
    def row(fmt: String, ch: Int, rate: Long, bits: Int, n: Long, dur: Long,
            codec: String) =
      new GenericInternalRow(Array[Any](UTF8String.fromString(fmt),
        ch, rate, bits, n, dur,
        if (codec == null) null else UTF8String.fromString(codec)))
    val wav = wavInfo(b)
    if (wav != null)
      return row("wav", wav(0).toInt, wav(1), wav(2).toInt, wav(3),
        wav(3) * 1000L / wav(1), "pcm")
    val flac = flacInfo(b)
    if (flac != null)
      return row("flac", flac(0).toInt, flac(1), flac(2).toInt, flac(3),
        if (flac(1) > 0) flac(3) * 1000L / flac(1) else 0L, "flac")
    val aif = aiffInfo(b)
    if (aif != null)
      return row("aiff", aif(0).toInt, aif(1), aif(2).toInt, aif(3),
        if (aif(1) > 0) aif(3) * 1000L / aif(1) else 0L,
        if (aif(5) == 1L) "sowt" else "pcm")
    val au = auInfo(b)
    if (au != null)
      return row("au", au(0).toInt, au(1), au(2).toInt, au(3) / au(0),
        if (au(1) > 0) au(3) / au(0) * 1000L / au(1) else 0L,
        au(5) match {
          case 1L => "ulaw"
          case 27L => "alaw"
          case _ => "pcm"
        })
    val mp3 = mp3Info(b)
    if (mp3 != null)
      return row("mp3", mp3(0).toInt, mp3(1), 0, mp3(2),
        if (mp3(1) > 0) mp3(2) * 1000L / mp3(1) else 0L, "mp3")
    // raw ADTS .aac files (0xFFF sync, layer bits 00 — disjoint from the
    // MP3 sync whose layer bits are non-zero, so the walks cannot both
    // claim one payload)
    if (b != null && b.length >= 7 && (b(0) & 0xFF) == 0xFF &&
      (b(1) & 0xF6) == 0xF0) {
      val aac = MpegTs.adtsInfo(b)
      if (aac != null)
        return row("aac", aac(0).toInt, aac(1), 0, aac(2),
          if (aac(1) > 0) aac(2) * 1000L / aac(1) else 0L, "aac")
    }
    if (MpegTs.isTs(b)) {
      val ta = MpegTs.tsAudioInfo(b, mp3Info)
      if (ta != null) {
        val (m, codec) = ta
        return row("mpegts", m(0).toInt, m(1), 0, m(2),
          if (m(1) > 0) m(2) * 1000L / m(1) else 0L, codec)
      }
    }
    if (Ogg.isOgg(b)) {
      val oa = Ogg.audioInfo(b)
      if (oa != null) {
        val (m, codec) = oa
        if (codec == "flac") {
          // Ogg is pure carriage for FLAC: exact fields come from the
          // reconstructed native stream's STREAMINFO
          val native = Ogg.flacNative(b)
          val fi = if (native != null) flacInfo(native) else null
          if (fi != null)
            return row("ogg", fi(0).toInt, fi(1), fi(2).toInt, fi(3),
              if (fi(1) > 0) fi(3) * 1000L / fi(1) else 0L, "flac")
        }
        return row("ogg", m(0).toInt, m(1), 0, m(2), m(3), codec)
      }
    }
    val mt = mp4Tracks(b).find(t => t.handler == "soun" && t.codec != null)
    if (mt.isDefined) {
      val t = mt.get
      return row("mp4", t.channels, t.sampleRate.toLong, t.bits, 0L,
        t.durationMs, t.codec)
    }
    if (b != null && b.length >= 8 && (b(0) & 0xFF) == 0x1A &&
      (b(1) & 0xFF) == 0x45 && (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3) {
      val at = Webm.tracks(b).find(t => t.trackType == 2 && t.codecId != null)
      if (at.isDefined) {
        val t = at.get
        val wm = Webm.webmMeta(b)
        return row("webm", t.channels, math.round(t.sampleRate), t.bitDepth,
          0L, if (wm != null) wm(2) else 0L, t.codecId)
      }
    }
    val avi = aviAudioTrack(b)
    if (avi != null) {
      // wFormatTag -> a readable codec identifier (raw hex otherwise)
      val codec = avi(0) match {
        case 0x0001 => "pcm"
        case 0x0055 => "mp3"
        case 0x00FF => "aac"
        case 0x2000 => "ac3"
        case tag => f"0x$tag%04x"
      }
      val am = aviMeta(b)
      return row("avi", avi(1), avi(2).toLong, avi(3), 0L,
        if (am != null) am(2) else 0L, codec)
    }
    new GenericInternalRow(Array[Any](null, 0, 0L, 0, 0L, 0L, null))
  }

  /** Audio-only MP4 fixture: ftyp + moov(mvhd + trak(tkhd + mdia(mdhd +
    * hdlr soun + minf(stbl(stsd(AudioSampleEntry)))))) — the metadata
    * shape a real MP4-AAC file declares; no mdat. */
  def encodeMp4Audio(codec: String, channels: Int, sampleRate: Int,
                     bits: Int, durationMs: Long): Array[Byte] = {
    def u32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def u16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512) ++
      "isomiso2".getBytes("US-ASCII"))
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++
      u32(durationMs) ++ new Array[Byte](80))
    val tkhd = box("tkhd", new Array[Byte](84))
    val mdhd = box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++
      u32(durationMs) ++ u32(0x55C40000L))
    val hdlr = box("hdlr", u32(0) ++ u32(0) ++ "soun".getBytes("US-ASCII") ++
      new Array[Byte](13))
    // AudioSampleEntry (ISO 14496-12 §12.2.3): 6 reserved + 2 data-ref,
    // 8 reserved, channelcount, samplesize, 4 reserved, samplerate 16.16
    val entry = box(codec.padTo(4, ' ').take(4), new Array[Byte](16) ++
      u16(channels) ++ u16(bits) ++ u32(0) ++ u32(sampleRate.toLong << 16))
    val stsd = box("stsd", u32(0) ++ u32(1) ++ entry)
    val mdia = box("mdia", mdhd ++ hdlr ++ box("minf", box("stbl", stsd)))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd ++ mdia))
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
    // MPEG-1 and the LSF variants (MPEG-2 at half rates, MPEG-2.5 at
    // quarter rates — the low-bitrate shapes common in crawl audio);
    // Layer III only. LSF frames carry 576 samples over 72*br/sr bytes
    // vs MPEG-1's 1152 over 144*br/sr. Per-frame bitrate reads make the
    // walk VBR-correct without needing a Xing header.
    val ratesV1 = Array(44100L, 48000L, 32000L, 0L)
    val brV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    val brLsf = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
    var frames = 0L
    var channels = 0L
    var rate = 0L
    var spf = 1152L
    while (p + 4 <= b.length) {
      if ((b(p) & 0xFF) != 0xFF || (b(p + 1) & 0xE0) != 0xE0) {
        return if (frames > 0) Array(channels, rate, frames * spf) else null
      }
      val versionBits = (b(p + 1) >> 3) & 0x3 // 3 MPEG-1, 2 MPEG-2, 0 MPEG-2.5
      val layerBits = (b(p + 1) >> 1) & 0x3
      if (versionBits == 1 || layerBits != 1) return null // Layer III only
      val v1 = versionBits == 3
      val div = if (v1) 1 else if (versionBits == 2) 2 else 4
      val sr = ratesV1((b(p + 2) >> 2) & 0x3) / div
      val br = (if (v1) brV1 else brLsf)((b(p + 2) >> 4) & 0xF)
      if (br == 0 || sr == 0) return null
      val padding = (b(p + 2) >> 1) & 0x1
      val mode = (b(p + 3) >> 6) & 0x3
      channels = if (mode == 3) 1L else 2L
      rate = sr
      spf = if (v1) 1152L else 576L
      frames += 1
      p += ((if (v1) 144L else 72L) * br * 1000L / sr).toInt + padding
    }
    if (frames > 0) Array(channels, rate, frames * spf) else null
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

  /** Minimal Layer III fixture: `frames` zero-payload frames, stereo.
    * MPEG-1 at 44100/48000/32000 (128 kbps), or the LSF variants when
    * `sampleRate` is a half (MPEG-2) or quarter (MPEG-2.5) rate
    * (64 kbps). */
  def encodeMp3Header(sampleRate: Long, frames: Int): Array[Byte] = {
    val (srIdx, verBits, div) = sampleRate match {
      case 44100L => (0, 3, 1); case 48000L => (1, 3, 1); case 32000L => (2, 3, 1)
      case 22050L => (0, 2, 2); case 24000L => (1, 2, 2); case 16000L => (2, 2, 2)
      case 11025L => (0, 0, 4); case 12000L => (1, 0, 4); case 8000L => (2, 0, 4)
      case other => throw new IllegalArgumentException(s"unsupported mp3 rate $other")
    }
    val v1 = div == 1
    val br = if (v1) 128 else 64
    val brIdx = if (v1) 9 else 8 // 128 kbps MPEG-1 / 64 kbps LSF
    val frameLen = ((if (v1) 144L else 72L) * br * 1000L / sampleRate).toInt
    val out = new Array[Byte](frameLen * frames)
    var f = 0
    while (f < frames) {
      val p = f * frameLen
      out(p) = 0xFF.toByte
      out(p + 1) = (0xE0 | (verBits << 3) | (1 << 1) | 1).toByte // L3, no CRC
      out(p + 2) = ((brIdx << 4) | (srIdx << 2)).toByte // no padding
      out(p + 3) = 0x00 // stereo
      f += 1
    }
    out
  }

  /** Minimal ADTS AAC fixture: `frames` header-only frames (7-byte
    * frame length, AAC-LC profile) at the given rate/channels — the
    * metadata shape an ADTS elementary stream declares. */
  def encodeAdtsHeader(sampleRate: Long, channels: Int, frames: Int): Array[Byte] = {
    val rates = Array(96000L, 88200L, 64000L, 48000L, 44100L, 32000L,
      24000L, 22050L, 16000L, 12000L, 11025L, 8000L, 7350L)
    val sfIdx = rates.indexOf(sampleRate)
    require(sfIdx >= 0, s"unsupported adts rate $sampleRate")
    val out = new Array[Byte](7 * frames)
    var f = 0
    while (f < frames) {
      val p = f * 7
      out(p) = 0xFF.toByte
      out(p + 1) = 0xF1.toByte // MPEG-4, layer 00, no CRC
      out(p + 2) = ((1 << 6) | (sfIdx << 2) | (channels >> 2)).toByte // AAC-LC
      out(p + 3) = (((channels & 3) << 6) | (7 >> 11)).toByte
      out(p + 4) = ((7 >> 3) & 0xFF).toByte
      out(p + 5) = (((7 & 7) << 5) | 0x1F).toByte // fullness hi
      out(p + 6) = 0xFC.toByte // fullness lo, 1 raw data block
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
    else if (Ogg.isOgg(b)) {
      // Ogg-FLAC is pure carriage: reconstruct the native stream and
      // decode losslessly — fingerprints match .flac/.wav of the same
      // recording exactly
      val native = Ogg.flacNative(b)
      if (native != null) Flac.decode16(native) else null
    } else {
      // the legacy lossless pair: AIFF/AIFC (big-endian / sowt PCM,
      // identical normalization, so fingerprints match WAV/FLAC of the
      // same recording) and Sun .au (PCM16/int8 exact; G.711 mu-law /
      // A-law expand via the closed-form formulas — the FILE decodes
      // deterministically, its fingerprint is its own)
      val aiff = aiffSamples(b)
      if (aiff != null) aiff else auSamples(b)
    }
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

  /** Interleaved PCM16 from ANY decodable audio container, including
    * the LOSSY tier: the exact paths first ([[pcmSamples]]: WAV, FLAC,
    * Ogg-FLAC — integer-exact, so lossless pairs keep bit-identical
    * fingerprints), then native Ogg-Vorbis decode ([[Vorbis.decode]]).
    * Null when nothing decodes. */
  private[functions] def pcmSamplesAny(b: Array[Byte]): Array[Int] = {
    val exact = pcmSamples(b)
    if (exact != null) return exact
    if (Ogg.isOgg(b)) {
      val d = Vorbis.decode(b)
      if (d != null) return d.pcm
    } else if (b != null && b.length >= 8 && (b(0) & 0xFF) == 0x1A &&
      (b(1) & 0xFF) == 0x45 && (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3) {
      // Matroska A_VORBIS (the .webm audio crawl shape): the same
      // decoder from the container's packet stream — no granule in
      // Matroska, so every produced sample is kept
      val pkts = Webm.vorbisPackets(b)
      if (pkts != null) {
        val d = Vorbis.decodePacketStream(pkts, -1L)
        if (d != null) return d.pcm
      }
    }
    null
  }

  /** (interleaved PCM16, channels, rate) from any decodable audio
    * container (exact tier + native Vorbis in Ogg or Matroska), or
    * null — the channel-aware face [[pcmSamplesAny]] callers use when
    * they must downmix or resample rather than fingerprint. */
  private[functions] def decodeAny(b: Array[Byte]): (Array[Int], Int, Int) = {
    val w = wavInfo(b)
    if (w != null) {
      val s = wavSamples(b)
      if (s != null) return (s, w(0).toInt, w(1).toInt)
    }
    if (b != null && b.length > 4 &&
      b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') {
      val i = flacInfo(b)
      val s = Flac.decode16(b)
      if (i != null && s != null) return (s, i(0).toInt, i(1).toInt)
    }
    if (Ogg.isOgg(b)) {
      val native = Ogg.flacNative(b)
      if (native != null) {
        val i = flacInfo(native)
        val s = Flac.decode16(native)
        if (i != null && s != null) return (s, i(0).toInt, i(1).toInt)
      }
      val d = Vorbis.decode(b)
      if (d != null) return (d.pcm, d.channels, d.rate)
    }
    val aif = aiffInfo(b)
    if (aif != null) {
      val s = aiffSamples(b)
      if (s != null) return (s, aif(0).toInt, aif(1).toInt)
    }
    val au = auInfo(b)
    if (au != null) {
      val s = auSamples(b)
      if (s != null) return (s, au(0).toInt, au(1).toInt)
    }
    if (b != null && b.length >= 8 && (b(0) & 0xFF) == 0x1A &&
      (b(1) & 0xFF) == 0x45 && (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3) {
      val pkts = Webm.vorbisPackets(b)
      if (pkts != null) {
        val d = Vorbis.decodePacketStream(pkts, -1L)
        if (d != null) return (d.pcm, d.channels, d.rate)
      }
    }
    null
  }

  /** Transcode any decodable audio payload to mono Ogg-Vorbis at the
    * source rate via the NATIVE encoder — the storage-normalization op
    * a crawl pipeline runs before archiving audio (multi-channel inputs
    * downmix by per-frame average). `transparent = true` uses the
    * near-lossless two-pass mode; false the ~45 dB single-pass grid.
    * Null when undecodable. */
  def audioTranscodeVorbis(b: Array[Byte], transparent: Boolean): Array[Byte] = {
    val d = decodeAny(b)
    if (d == null) return null
    val (pcm, ch, rate) = d
    if (rate <= 0 || pcm.length == 0) return null
    val mono =
      if (ch <= 1) pcm
      else {
        val n = pcm.length / ch
        Array.tabulate(n) { i =>
          var acc = 0L
          var j = 0
          while (j < ch) { acc += pcm(i * ch + j); j += 1 }
          (acc / ch).toInt
        }
      }
    Vorbis.encode(rate, mono, twoPass = transparent)
  }

  /** 60-bit LOSSY-TOLERANT spectral fingerprint: the PCM stream cuts
    * into 16 equal time segments; within each, 8-sample block-wise Haar
    * analysis accumulates energy in 4 octave bands (pairwise diffs at
    * three scales + the residual low band — integer sums/diffs only);
    * bit (t,b) is set iff segment t's band-b energy exceeds segment
    * t-1's. Sign-of-delta over band energies is invariant under global
    * amplitude scaling AND robust to quantization noise (band energies
    * are large sums; a lossy codec perturbs them fractionally), so the
    * same recording groups across WAV/FLAC (bit-identical fingerprints)
    * and Ogg-Vorbis (hamming-near) — the audio analogue of pHash, where
    * [[audioFingerprint]] is the analogue of an exact hash. NULL when
    * undecodable or shorter than 16x8 samples. */
  def audioFingerprintSpectral(b: Array[Byte]): java.lang.Long = {
    val s = pcmSamplesAny(b)
    if (s == null || s.length < 128) return null
    val e = Array.ofDim[Long](16, 4)
    val segLen = s.length / 16
    val a = new Array[Long](4)
    var t = 0
    while (t < 16) {
      val from = t * segLen
      var p = from
      while (p + 8 <= from + segLen) {
        var i = 0
        while (i < 4) {
          val x0 = s(p + 2 * i).toLong
          val x1 = s(p + 2 * i + 1).toLong
          e(t)(0) += (x0 - x1) * (x0 - x1)
          a(i) = x0 + x1
          i += 1
        }
        val d2a = a(0) - a(1)
        val d2b = a(2) - a(3)
        e(t)(1) += d2a * d2a + d2b * d2b
        val d3 = a(0) + a(1) - a(2) - a(3)
        e(t)(2) += d3 * d3
        val a3 = a(0) + a(1) + a(2) + a(3)
        e(t)(3) += a3 * a3
        p += 8
      }
      t += 1
    }
    var fp = 0L
    var bit = 0
    t = 1
    while (t < 16) {
      var bnd = 0
      while (bnd < 4) {
        if (e(t)(bnd) > e(t - 1)(bnd)) fp |= 1L << bit
        bit += 1
        bnd += 1
      }
      t += 1
    }
    fp
  }

  /** Minimal PCM16 mono AIFF (or AIFC/sowt) encoder — fixtures. */
  def encodeAiff(sampleRate: Int, samples: Array[Int],
                 sowt: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def be32(v: Int): Unit = { be16((v >> 16) & 0xFFFF); be16(v & 0xFFFF) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val commLen = if (sowt) 24 else 18 // AIFC: fourcc + empty pstring
    val dataLen = samples.length * 2
    tag("FORM")
    be32(4 + (8 + commLen) + (8 + 8 + dataLen) + (if (sowt) 12 else 0))
    tag(if (sowt) "AIFC" else "AIFF")
    if (sowt) { tag("FVER"); be32(4); be32(0xA2805140) } // AIFC version 1
    tag("COMM"); be32(commLen)
    be16(1) // channels
    be32(samples.length)
    be16(16)
    // 80-bit extended float: exponent chosen so mantissa's top bit is 1
    var exp = 0
    var m = sampleRate
    while (m > 1) { m >>= 1; exp += 1 }
    be16(16383 + exp)
    var mant = sampleRate.toLong << (63 - exp)
    var i = 0
    while (i < 8) { out.write(((mant >>> (56 - 8 * i)) & 0xFF).toInt); i += 1 }
    if (sowt) { tag("sowt"); be16(0) } // 0-length pstring, padded
    tag("SSND"); be32(8 + dataLen); be32(0); be32(0)
    i = 0
    while (i < samples.length) {
      val v = samples(i) & 0xFFFF
      if (sowt) { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      else { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
      i += 1
    }
    out.toByteArray
  }

  /** G.711 mu-law compression (closed-form inverse of [[ulaw]]) —
    * fixture encoder for the .au lossy arm. */
  private[functions] def ulawEncode(pcm0: Int): Int = {
    val Bias = 0x84
    var pcm = pcm0
    val sign = if (pcm < 0) { pcm = -pcm; 0x80 } else 0
    if (pcm > 32635) pcm = 32635
    pcm += Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (pcm & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (pcm >> (exp + 3)) & 0xF
    (~(sign | (exp << 4) | mant)) & 0xFF
  }

  /** Minimal mono .au encoder: encoding 1 (mu-law), 2 (int8), 3
    * (PCM16 BE). */
  def encodeAu(encoding: Int, sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val bytesPer = if (encoding == 3) 2 else 1
    val out = new Array[Byte](24 + samples.length * bytesPer)
    def be32(p: Int, v: Int): Unit = {
      out(p) = (v >> 24).toByte; out(p + 1) = (v >> 16).toByte
      out(p + 2) = (v >> 8).toByte; out(p + 3) = v.toByte
    }
    out(0) = '.'; out(1) = 's'; out(2) = 'n'; out(3) = 'd'
    be32(4, 24)
    be32(8, samples.length * bytesPer)
    be32(12, encoding)
    be32(16, sampleRate)
    be32(20, 1)
    var i = 0
    while (i < samples.length) {
      encoding match {
        case 1 => out(24 + i) = ulawEncode(samples(i)).toByte
        case 2 => out(24 + i) = (samples(i) / 257).toByte
        case 27 => out(24 + i) = (samples(i) & 0xFF).toByte // raw A-law codes
        case _ =>
          out(24 + 2 * i) = (samples(i) >> 8).toByte
          out(24 + 2 * i + 1) = samples(i).toByte
      }
      i += 1
    }
    out
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

  /** struct(format, width, height, duration_ms, codec): ISO BMFF box tree
    * (mvhd timescale+duration, first non-zero tkhd width/height, 16.16
    * fixed point), RIFF AVI `avih` (µs/frame × total frames, dwWidth/
    * dwHeight), IVF/WebM, animated GIF/WebP; null format otherwise.
    *
    * `codec` is the container's RAW codec identifier — MP4 stsd entry
    * fourcc ("jpeg", "avc1"), AVI strh vids handler ("MJPG"), Matroska
    * CodecID ("V_VP8", "V_VP9"), IVF fourcc ("VP80"), GIF "lzw", WebP
    * "VP8"/"VP8L" — surfaced verbatim and null when the container does
    * not declare one. The point is diagnosability: a corpus whose videos
    * yield ZERO frames through video_frames (unsupported codec) shows WHY
    * in this column instead of silently dropping out of video_dedup. */
  def videoMetaRow(b: Array[Byte]): GenericInternalRow = {
    def row(fmt: String, m: Array[Long], codec: String) =
      new GenericInternalRow(Array[Any](UTF8String.fromString(fmt),
        m(0).toInt, m(1).toInt, m(2),
        if (codec == null) null else UTF8String.fromString(codec)))
    val m = mp4Meta(b)
    if (m != null) return row("mp4", m, mp4VideoCodec(b))
    val ts = MpegTs.tsMeta(b)
    if (ts != null) return row("mpegts", ts._1, ts._2)
    val es = MpegTs.annexBMeta(b)
    if (es != null) return row("h264-es", es, "h264")
    val a = aviMeta(b)
    if (a != null) return row("avi", a, aviVideoCodec(b))
    val iv = Webm.ivfMeta(b)
    if (iv != null) return row("ivf", iv, Webm.ivfCodec(b))
    val wm = Webm.webmMeta(b)
    if (wm != null)
      return row("webm", wm,
        Webm.tracks(b).collectFirst { case t if t.trackType == 1 && t.codecId != null => t.codecId }.orNull)
    val g = gifMeta(b)
    if (g != null) return row("gif", g, "lzw")
    val wp = Webp.animMeta(b)
    if (wp != null) return row("webp", wp, Webp.animCodec(b))
    val ap = ImageKernels.apngMeta(b)
    if (ap != null) return row("apng", ap, "png")
    val th = Ogg.theoraInfo(b)
    if (th != null) return row("ogg", th, "theora")
    new GenericInternalRow(Array[Any](null, 0, 0, 0L, null))
  }

  /** First `vide`-handler track's stsd entry fourcc (falling back to the
    * first stsd entry when no hdlr boxes exist — minimal fixtures). */
  private[functions] def mp4VideoCodec(b: Array[Byte]): String = {
    val ts = mp4Tracks(b)
    ts.collectFirst { case t if t.handler == "vide" && t.codec != null => t.codec }
      .orElse(ts.collectFirst { case t if t.handler == null && t.codec != null => t.codec })
      .orNull
  }

  /** One ISO BMFF trak's declared coding: hdlr handler type ("vide" /
    * "soun", null when absent), first stsd entry fourcc, and — for audio
    * sample entries — channelcount/samplerate/samplesize at their fixed
    * AudioSampleEntry offsets (ISO 14496-12 §12.2.3), plus the track's
    * mdhd duration. The walk is metadata-only: no sample data is read. */
  final case class Mp4Track(handler: String, codec: String, channels: Int,
                            sampleRate: Int, bits: Int, durationMs: Long)

  /** avc1/avc3 profile+entropy detail from the avcC record inside the
    * stsd entry: "avc1/baseline-cavlc", "avc1/high-cabac", ... . The bare
    * fourcc made an undecodable file (CABAC, High-profile tools) look
    * identical to a decodable baseline one, recreating the silent
    * zero-frame drop the codec column exists to diagnose. Profile comes
    * from the declared AVCProfileIndication; entropy from the first
    * PPS's entropy_coding_mode_flag. Falls back to the bare fourcc when
    * no avcC is present (header-only declarations). */
  private[functions] def avcDetail(b: Array[Byte], entry: Int, entryEnd: Int,
                                   fourcc: String): String = {
    var p = entry + 8 + 78 // boxes after the VisualSampleEntry header
    while (p + 8 <= entryEnd) {
      val sz = be32(b, p).toInt
      if (sz < 8 || p + sz > entryEnd) return fourcc
      if (b(p + 4) == 'a' && b(p + 5) == 'v' && b(p + 6) == 'c' &&
        b(p + 7) == 'C' && sz >= 8 + 7) {
        val profile = b(p + 9) & 0xFF
        val profName = profile match {
          case 66 => "baseline"
          case 77 => "main"
          case 88 => "extended"
          case 100 => "high"
          case 110 => "high10"
          case 122 => "high422"
          case 244 => "high444"
          case other => s"p$other"
        }
        // walk to the first PPS: skip the SPS entries
        var q = p + 8 + 5
        val nSps = b(q) & 0x1F
        q += 1
        var i = 0
        while (i < nSps && q + 2 <= entryEnd) {
          q += 2 + (((b(q) & 0xFF) << 8) | (b(q + 1) & 0xFF))
          i += 1
        }
        if (q + 3 > entryEnd || (b(q) & 0xFF) == 0) return s"$fourcc/$profName"
        val ppsLen = ((b(q + 1) & 0xFF) << 8) | (b(q + 2) & 0xFF)
        if (ppsLen < 2 || q + 3 + ppsLen > entryEnd) return s"$fourcc/$profName"
        // PPS RBSP after the NAL header: ue(pps_id) ue(sps_id) then the
        // entropy_coding_mode_flag — a bounded 3-symbol exp-Golomb read
        // (emulation prevention can't fire this early: it needs 2 zero
        // BYTES, impossible within the first two ue() of a legal PPS)
        var pos = 0
        val base = q + 4 // skip the 1-byte NAL header
        val limit = (ppsLen - 1) * 8
        def bit(): Int = {
          if (pos >= limit) return -1
          val v = (b(base + (pos >> 3)) >> (7 - (pos & 7))) & 1
          pos += 1
          v
        }
        def skipUe(): Boolean = { // false on truncation/overrun
          var zeros = 0
          var bv = bit()
          while (bv == 0) { zeros += 1; if (zeros > 16) return false; bv = bit() }
          if (bv < 0) return false
          var k = 0
          while (k < zeros) { if (bit() < 0) return false; k += 1 }
          true
        }
        if (!skipUe() || !skipUe()) return s"$fourcc/$profName"
        return bit() match {
          case 1 => s"$fourcc/$profName-cabac"
          case 0 => s"$fourcc/$profName-cavlc"
          case _ => s"$fourcc/$profName"
        }
      }
      p += sz
    }
    fourcc
  }

  private[functions] def mp4Tracks(b: Array[Byte]): Seq[Mp4Track] = {
    if (b == null || b.length < 16 ||
      !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    var handler: String = null
    var codec: String = null
    var ch = 0; var rate = 0; var bits = 0; var durMs = 0L
    var inTrak = false
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end && out.length < 64) {
        var size = be32(b, p)
        val typ = new String(b, p + 4, 4, "US-ASCII")
        var hdr = 8
        if (size == 1 && p + 16 <= end) {
          size = (be32(b, p + 8) << 32) | be32(b, p + 12); hdr = 16
        } else if (size == 0) size = end - p
        if (size < hdr || p + size > end) return
        val d = p + hdr
        val e = p + size.toInt
        typ match {
          case "moov" => walk(d, e)
          case "trak" =>
            handler = null; codec = null; ch = 0; rate = 0; bits = 0; durMs = 0L
            inTrak = true
            walk(d, e)
            inTrak = false
            out += Mp4Track(handler, codec, ch, rate, bits, durMs)
          case "mdia" | "minf" | "stbl" if inTrak => walk(d, e)
          case "mdhd" if inTrak && size >= hdr + 20 =>
            val v = b(d) & 0xFF
            if (v == 1 && size >= hdr + 32) {
              val ts = be32(b, d + 20)
              val dur = (be32(b, d + 24) << 32) | be32(b, d + 28)
              if (ts > 0) durMs = dur * 1000L / ts
            } else {
              val ts = be32(b, d + 12)
              val dur = be32(b, d + 16)
              if (ts > 0) durMs = dur * 1000L / ts
            }
          case "hdlr" if inTrak && size >= hdr + 12 =>
            handler = new String(b, d + 8, 4, "US-ASCII")
          case "stsd" if inTrak && size >= hdr + 16 =>
            val fourcc = new String(b, d + 8 + 4, 4, "US-ASCII").trim
            val entryE = math.min(e.toLong, d + 8L + be32(b, d + 8)).toInt
            codec =
              if (fourcc == "avc1" || fourcc == "avc3")
                avcDetail(b, d + 8, entryE, fourcc)
              else fourcc
            // AudioSampleEntry fixed layout (only meaningful for soun
            // handlers; harmless zeros otherwise): channelcount at
            // entry+24, samplesize at entry+26, samplerate 16.16 at +32
            val entry = d + 8
            if (entry + 36 <= e) {
              ch = ((b(entry + 24) & 0xFF) << 8) | (b(entry + 25) & 0xFF)
              bits = ((b(entry + 26) & 0xFF) << 8) | (b(entry + 27) & 0xFF)
              rate = ((be32(b, entry + 32)) >> 16).toInt
            }
          case _ => ()
        }
        p = e
      }
    }
    try walk(0, b.length) catch { case _: Exception => () }
    out.toSeq
  }

  /** AVI `auds` stream walk: the first audio stream's WAVEFORMATEX from
    * the strf chunk FOLLOWING its `auds` strh — (formatTag, channels,
    * sampleRate, bits) or null. The third container-audio face next to
    * Matroska Tracks and the MP4 soun trak. */
  private[functions] def aviAudioTrack(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 24 ||
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return null
    var found: Array[Int] = null
    var inAuds = false
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end && found == null) {
        val tag = new String(b, p, 4, "US-ASCII")
        val len = le32(b, p + 4).toInt
        val d = p + 8
        if (d + len > end || len < 0) return
        if (tag == "LIST" && len >= 4) { inAuds = false; walk(d + 4, d + len) }
        else if (tag == "strh" && len >= 8)
          inAuds = b(d) == 'a' && b(d + 1) == 'u' && b(d + 2) == 'd' && b(d + 3) == 's'
        else if (tag == "strf" && inAuds && len >= 16)
          found = Array(le16(b, d), le16(b, d + 2), le32(b, d + 4).toInt,
            le16(b, d + 14))
        p = d + len + (len & 1)
      }
    }
    try walk(12, b.length) catch { case _: Exception => () }
    found
  }

  /** Minimal audio-AVI fixture: RIFF(AVI ) → LIST(hdrl) → avih +
    * LIST(strl: strh auds + strf WAVEFORMATEX). */
  def encodeAviAudio(formatTag: Int, channels: Int, sampleRate: Int,
                     bits: Int, usPerFrame: Long, totalFrames: Long): Array[Byte] = {
    def w32(a: Array[Byte], p: Int, v: Long): Unit = {
      a(p) = v.toByte; a(p + 1) = (v >> 8).toByte
      a(p + 2) = (v >> 16).toByte; a(p + 3) = (v >> 24).toByte
    }
    def w16(a: Array[Byte], p: Int, v: Int): Unit = {
      a(p) = v.toByte; a(p + 1) = (v >> 8).toByte
    }
    val avih = new Array[Byte](8 + 56)
    "avih".getBytes("US-ASCII").copyToArray(avih, 0)
    w32(avih, 4, 56)
    w32(avih, 8, usPerFrame)
    w32(avih, 8 + 16, totalFrames)
    val strh = new Array[Byte](8 + 56)
    "strh".getBytes("US-ASCII").copyToArray(strh, 0)
    w32(strh, 4, 56)
    "auds".getBytes("US-ASCII").copyToArray(strh, 8)
    val strf = new Array[Byte](8 + 16)
    "strf".getBytes("US-ASCII").copyToArray(strf, 0)
    w32(strf, 4, 16)
    w16(strf, 8, formatTag)
    w16(strf, 10, channels)
    w32(strf, 12, sampleRate)
    w32(strf, 16, sampleRate.toLong * channels * (bits / 8)) // avg bytes/s
    w16(strf, 20, channels * (bits / 8)) // block align
    w16(strf, 22, bits)
    val strl = new Array[Byte](12 + strh.length + strf.length)
    "LIST".getBytes("US-ASCII").copyToArray(strl, 0)
    w32(strl, 4, 4 + strh.length + strf.length)
    "strl".getBytes("US-ASCII").copyToArray(strl, 8)
    strh.copyToArray(strl, 12)
    strf.copyToArray(strl, 12 + strh.length)
    val hdrl = new Array[Byte](12 + avih.length + strl.length)
    "LIST".getBytes("US-ASCII").copyToArray(hdrl, 0)
    w32(hdrl, 4, 4 + avih.length + strl.length)
    "hdrl".getBytes("US-ASCII").copyToArray(hdrl, 8)
    avih.copyToArray(hdrl, 12)
    strl.copyToArray(hdrl, 12 + avih.length)
    val out = new Array[Byte](12 + hdrl.length)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    w32(out, 4, 4 + hdrl.length)
    "AVI ".getBytes("US-ASCII").copyToArray(out, 8)
    hdrl.copyToArray(out, 12)
    out
  }

  /** AVI `strh` walk: the fccHandler fourcc of the first `vids` stream
    * header — "MJPG" for the motion-JPEG face, surfaced raw otherwise. */
  private[functions] def aviVideoCodec(b: Array[Byte]): String = {
    if (b == null || b.length < 24 ||
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return null
    var found: String = null
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end && found == null) {
        val tag = new String(b, p, 4, "US-ASCII")
        val len = le32(b, p + 4).toInt
        val d = p + 8
        if (d + len > end || len < 0) return
        if (tag == "LIST" && len >= 4) walk(d + 4, d + len)
        else if (tag == "strh" && len >= 8 &&
          b(d) == 'v' && b(d + 1) == 'i' && b(d + 2) == 'd' && b(d + 3) == 's')
          found = new String(b, d + 4, 4, "US-ASCII").trim
        p = d + len + (len & 1)
      }
    }
    try walk(12, b.length) catch { case _: Exception => () }
    found
  }

  /** Animated-GIF video metadata: logical-screen dims + total duration
    * (sum of GCE delays, centiseconds -> ms). Only ANIMATED GIFs count as
    * video — stills (fewer than 2 frames) return null so image_meta stays
    * their face. */
  private[functions] def gifMeta(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 14 ||
      !(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')) return null
    val sw = le16(b, 6); val sh = le16(b, 8)
    var p = 13
    if ((b(10) & 0x80) != 0) p += (2 << (b(10) & 7)) * 3 // global palette
    var frames = 0L
    var delayCs = 0L
    while (p < b.length) {
      (b(p) & 0xFF) match {
        case 0x21 =>
          if (p + 5 < b.length && (b(p + 1) & 0xFF) == 0xF9 && (b(p + 2) & 0xFF) >= 4)
            delayCs += le16(b, p + 4)
          p += 2
          while (p < b.length && (b(p) & 0xFF) != 0) p += (b(p) & 0xFF) + 1
          p += 1
        case 0x2C =>
          if (p + 10 > b.length) return null
          frames += 1
          val iflags = b(p + 9) & 0xFF
          p += 10
          if ((iflags & 0x80) != 0) p += (2 << (iflags & 7)) * 3
          p += 1 // min code size
          while (p < b.length && (b(p) & 0xFF) != 0) p += (b(p) & 0xFF) + 1
          p += 1
        case _ => p = b.length
      }
    }
    if (frames < 2) null else Array(sw, sh, delayCs * 10)
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

  /** Minimal AVI metadata fixture: RIFF(AVI ) → LIST(hdrl) → avih
    * (+ LIST(strl) → strh declaring the vids handler when `codec` set). */
  def encodeAviHeader(width: Int, height: Int, usPerFrame: Long,
                      totalFrames: Long, codec: String = null): Array[Byte] = {
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
    val strl =
      if (codec == null) Array.emptyByteArray
      else {
        // LIST(strl) > strh: fccType vids + the handler fourcc — the
        // codec declaration the diagnosability column surfaces
        val strh = new Array[Byte](8 + 56)
        "strh".getBytes("US-ASCII").copyToArray(strh, 0)
        w32(strh, 4, 56)
        "vids".getBytes("US-ASCII").copyToArray(strh, 8)
        codec.padTo(4, ' ').take(4).getBytes("US-ASCII").copyToArray(strh, 12)
        val l = new Array[Byte](12 + strh.length)
        "LIST".getBytes("US-ASCII").copyToArray(l, 0)
        w32(l, 4, 4 + strh.length)
        "strl".getBytes("US-ASCII").copyToArray(l, 8)
        strh.copyToArray(l, 12)
        l
      }
    val list = new Array[Byte](12 + avih.length + strl.length)
    "LIST".getBytes("US-ASCII").copyToArray(list, 0)
    w32(list, 4, 4 + avih.length + strl.length)
    "hdrl".getBytes("US-ASCII").copyToArray(list, 8)
    avih.copyToArray(list, 12)
    strl.copyToArray(list, 12 + avih.length)
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
    var width = 0L; var height = 0L; var durMs = 0L; var tscale = 0L
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
          case "moov" | "trak" | "mvex" => walk(p + hdr, p + size.toInt)
          case "mvhd" if size >= hdr + 20 =>
            val v = b(p + hdr) & 0xFF
            if (v == 1 && size >= hdr + 32) {
              val ts = be32(b, p + hdr + 20)
              val dur = (be32(b, p + hdr + 24) << 32) | be32(b, p + hdr + 28)
              tscale = ts
              if (ts > 0) durMs = dur * 1000L / ts
            } else {
              val ts = be32(b, p + hdr + 12)
              val dur = be32(b, p + hdr + 16)
              tscale = ts
              if (ts > 0) durMs = dur * 1000L / ts
            }
          case "mehd" if size >= hdr + 8 =>
            // fragmented files commonly declare mvhd duration 0 and put
            // the whole-movie duration in mvex/mehd (fragment_duration)
            val v = b(p + hdr) & 0xFF
            val dur =
              if (v == 1 && size >= hdr + 12)
                (be32(b, p + hdr + 4) << 32) | be32(b, p + hdr + 8)
              else be32(b, p + hdr + 4)
            if (durMs == 0 && tscale > 0) durMs = dur * 1000L / tscale
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

  /** Minimal MP4 metadata fixture: ftyp + moov(mvhd + trak(tkhd))
    * (+ mdia(hdlr vide + minf(stbl(stsd(codec entry)))) when `codec`
    * set — declares the coding without any sample data). */
  def encodeMp4Header(width: Int, height: Int, durationMs: Long,
                      codec: String = null): Array[Byte] = {
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
    val trak =
      if (codec == null) box("trak", tkhd)
      else {
        // declare the coding: hdlr vide + an stsd whose single entry
        // carries the codec fourcc (86-byte VisualSampleEntry of zeros —
        // the meta walk reads only the fourcc; there is no sample data)
        val hdlr = box("hdlr", u32(0) ++ u32(0) ++
          "vide".getBytes("US-ASCII") ++ new Array[Byte](13))
        val entry = box(codec.padTo(4, ' ').take(4), new Array[Byte](78))
        val stsd = box("stsd", u32(0) ++ u32(1) ++ entry)
        box("trak", tkhd ++ box("mdia", hdlr ++ box("minf", box("stbl", stsd))))
      }
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }

  // ------------------------------------------------- frame extraction

  /** Sampled frame extraction: up to `max` evenly-spaced JPEG frames as
    * raw byte payloads — MJPEG-in-AVI (`00dc`/`00db` chunks inside the
    * `movi` list) and JPEG-sample MP4s (`stsd` entry `jpeg`/`mjpa` walked
    * through stsz/stsc/stco) are plain T.81 streams the native [[Jpeg]]
    * decoder already handles, which is what lets video compose with the
    * image pHash/dedup tier. Non-video or frameless input -> empty array;
    * never throws on hostile bytes (bounds-checked walks, no allocation
    * from untrusted length fields beyond the input's own size). */
  def videoFrames(b: Array[Byte], max: Int): Array[Array[Byte]] = {
    if (b == null || max <= 0) return Array.empty
    val all =
      try {
        val avi = aviFrames(b, math.min(max, 256))
        if (avi != null) avi
        else {
          val ts = MpegTs.tsFrames(b, math.min(max, 256))
          if (ts != null) ts
          else {
          // raw Annex-B .h264/.264 elementary-stream dumps
          val es = MpegTs.annexBFrames(b, math.min(max, 256))
          if (es != null) es
          else {
          val mp4 = mp4Frames(b, math.min(max, 256))
          if (mp4 != null) mp4
          else {
            // real VP8 video: WebM (Matroska) and IVF keyframes through
            // the native RFC 6386 decoder, snapshotted as grayscale PNGs
            val ivf = Webm.ivfFrames(b)
            if (ivf != null) ivf
            else {
              val mkv = Webm.webmFrames(b)
              if (mkv != null) mkv
              else {
                // animated GIFs, animated WebPs and APNGs are crawl
                // video too: composited canvas snapshots re-encoded as
                // grayscale PNGs
                val gif = ImageKernels.gifFrames(b)
                if (gif != null) gif
                else {
                  val webp = Webp.animFrames(b)
                  if (webp != null) webp
                  else {
                    val apng = ImageKernels.apngFrames(b)
                    if (apng != null) apng else Array.empty[Array[Byte]]
                  }
                }
              }
            }
          }
          }
          }
        }
      } catch { case _: Exception => Array.empty[Array[Byte]] }
    sampleEven(all, math.min(max, 256))
  }

  /** Evenly-spaced deterministic sampling: all frames when they fit,
    * indices floor(i*n/max) otherwise. */
  private def sampleEven(frames: Array[Array[Byte]], max: Int): Array[Array[Byte]] =
    if (frames.length <= max) frames
    else Array.tabulate(max)(i => frames((i.toLong * frames.length / max).toInt))

  /** AVI `movi` chunk walk: stream-data chunks `NNdc`/`NNdb` whose payload
    * opens with a JPEG SOI are frames (MJPEG stores one complete JPEG per
    * chunk). `rec ` LISTs nest one level of grouping. */
  private def aviFrames(b: Array[Byte], max: Int): Array[Array[Byte]] = {
    if (b.length < 24 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // H.264-in-AVI: stream chunks carry Annex-B byte streams (SPS/PPS
    // in-band ahead of each IDR, or carried once and remembered here).
    // Chunk LOCATIONS of IDR-bearing payloads collect first; the
    // expensive decodes run only on the <= max selected chunks.
    // each location remembers the SPS/PPS ACTIVE when its chunk was
    // scanned (in-band sets in the same chunk land before the IDR, so
    // they are current by then) — a stream whose parameter sets change
    // mid-file decodes each picture with the sets in effect for it
    val avcLocs = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Int, Int, Int, Int)]
    var avcSpsAt = -1; var avcSpsLen = 0
    var avcPpsAt = -1; var avcPpsLen = 0
    def isFrameTag(p: Int): Boolean =
      b(p) >= '0' && b(p) <= '9' && b(p + 1) >= '0' && b(p + 1) <= '9' &&
        b(p + 2) == 'd' && (b(p + 3) == 'c' || b(p + 3) == 'b')
    def isStartCode(p: Int, end: Int): Boolean =
      p + 4 <= end && b(p) == 0 && b(p + 1) == 0 &&
        (b(p + 2) == 1 || (b(p + 2) == 0 && b(p + 3) == 1))
    /** Scan an Annex-B chunk: remember SPS/PPS positions, true iff an
      * IDR NAL is present (cheap byte scan, no decode). */
    def scanAnnexB(d: Int, end: Int): Boolean = {
      var idr = false
      var p = d
      while (p + 4 <= end) {
        if (b(p) == 0 && b(p + 1) == 0 &&
          (b(p + 2) == 1 || (b(p + 2) == 0 && p + 4 < end && b(p + 3) == 1))) {
          val at = p + (if (b(p + 2) == 1) 3 else 4)
          if (at < end) {
            var q = at
            while (q + 2 < end && !(b(q) == 0 && b(q + 1) == 0 &&
              (b(q + 2) == 0 || b(q + 2) == 1))) q += 1
            val nend = if (q + 2 < end) q else end
            (b(at) & 0x1F) match {
              case 7 => avcSpsAt = at; avcSpsLen = nend - at
              case 8 => avcPpsAt = at; avcPpsLen = nend - at
              case 5 => idr = true
              case _ => ()
            }
            p = nend
          } else p = end
        } else p += 1
      }
      idr
    }
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var p = start
      while (p + 8 <= end) {
        val len = le32(b, p + 4).toInt
        val d = p + 8
        if (len < 0 || d + len > end) return
        if (b(p) == 'L' && b(p + 1) == 'I' && b(p + 2) == 'S' && b(p + 3) == 'T' && len >= 4) {
          val kind = new String(b, d, 4, "US-ASCII")
          walk(d + 4, d + len, inMovi || kind == "movi")
        } else if (inMovi && isFrameTag(p) && len >= 3 &&
          (b(d) & 0xFF) == 0xFF && (b(d + 1) & 0xFF) == 0xD8) {
          out += java.util.Arrays.copyOfRange(b, d, d + len)
        } else if (inMovi && isFrameTag(p) && isStartCode(d, d + len)) {
          if (scanAnnexB(d, d + len) && avcSpsAt >= 0 && avcPpsAt >= 0)
            avcLocs += ((d, len, avcSpsAt, avcSpsLen, avcPpsAt, avcPpsLen))
        }
        p = d + len + (len & 1)
      }
    }
    walk(12, b.length, inMovi = false)
    if (out.isEmpty && avcLocs.nonEmpty) {
      val n = avcLocs.length
      val sel = if (n <= max) 0 until n
      else (0 until max).map(i => (i.toLong * n / max).toInt)
      sel.foreach { si =>
        val (d, len, sAt, sLen, pAt, pLen) = avcLocs(si)
        // prepend the chunk's active SPS/PPS: redundant when in-band (a
        // re-parse of identical parameter sets), essential when not
        val prefix = Array[Byte](0, 0, 0, 1) ++
          java.util.Arrays.copyOfRange(b, sAt, sAt + sLen) ++
          Array[Byte](0, 0, 0, 1) ++
          java.util.Arrays.copyOfRange(b, pAt, pAt + pLen)
        val f = H264.decodeAnnexB(prefix ++ java.util.Arrays.copyOfRange(b, d, d + len))
        if (f != null) out += ImageKernels.encodePng(f.w, f.h, f.y)
      }
    }
    out.toArray
  }

  /** ISO BMFF sample walk for decodable video tracks: locate the first
    * trak whose stsd entry format is `jpeg`/`mjpa`/`mjpb` (T.81 samples
    * for the native Jpeg decoder) or `avc1`/`avc3` (length-prefixed
    * H.264 NALs for the native [[H264]] baseline decoder, SPS/PPS from
    * the avcC record), then resolve every sample's file offset through
    * stsc (sample-to-chunk runs), stco/co64 (chunk offsets) and stsz
    * (sample sizes) — PLUS, for fragmented MP4 (the DASH/streaming-
    * origin shape where the moov's stbl is empty and samples live in
    * movie fragments), through moof/traf/tfhd/trun with
    * default-sample-size inheritance from tfhd and the moov's
    * mvex/trex (ISO 14496-12 clause 8.8). avc1 keyframe detection is
    * NAL-type 5 (IDR) — non-IDR samples are skipped by design
    * (keyframes-only tier). */
  private def mp4Frames(b: Array[Byte], max: Int): Array[Array[Byte]] = {
    if (b.length < 16 || !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return null
    var sizes: Array[Int] = null
    var chunkOffsets: Array[Long] = null
    var stsc: Array[(Int, Int)] = null // (first_chunk, samples_per_chunk)
    var isJpeg = false
    var isAvc = false
    var avcSps: Array[Byte] = null
    var avcPps: Array[Byte] = null
    var avcLenSize = 4
    var trackId = -1 // from tkhd; matches tfhd track_IDs in fragments
    var done = false
    // mvex/trex defaults per track_ID -> default_sample_size (bounded:
    // real files carry a handful of tracks)
    val trexSize = scala.collection.mutable.HashMap.empty[Int, Int]
    def parseAvcc(d: Int, e: Int): Unit = {
      // boxes after the 78-byte VisualSampleEntry header: find avcC
      var p = d + 8 + 78
      while (p + 8 <= e && avcSps == null) {
        val sz = be32(b, p).toInt
        if (sz < 8 || p + sz > e) return
        if (b(p + 4) == 'a' && b(p + 5) == 'v' && b(p + 6) == 'c' && b(p + 7) == 'C'
          && sz >= 8 + 7) {
          var q = p + 8 + 4 // skip version/profile/compat/level
          avcLenSize = (b(q) & 3) + 1
          q += 1
          val nSps = b(q) & 0x1F
          q += 1
          var i = 0
          while (i < nSps && q + 2 <= e) {
            val len = ((b(q) & 0xFF) << 8) | (b(q + 1) & 0xFF)
            q += 2
            if (q + len > e) return
            if (avcSps == null) avcSps = java.util.Arrays.copyOfRange(b, q, q + len)
            q += len
            i += 1
          }
          if (q >= e) return
          val nPps = b(q) & 0xFF
          q += 1
          i = 0
          while (i < nPps && q + 2 <= e) {
            val len = ((b(q) & 0xFF) << 8) | (b(q + 1) & 0xFF)
            q += 2
            if (q + len > e) return
            if (avcPps == null) avcPps = java.util.Arrays.copyOfRange(b, q, q + len)
            q += len
            i += 1
          }
        }
        p += sz
      }
    }
    def walk(start: Int, end: Int, inTrak: Boolean): Unit = {
      var p = start
      while (p + 8 <= end && !done) {
        var size = be32(b, p)
        val typ = new String(b, p + 4, 4, "US-ASCII")
        var hdr = 8
        if (size == 1 && p + 16 <= end) {
          size = (be32(b, p + 8) << 32) | be32(b, p + 12); hdr = 16
        } else if (size == 0) size = end - p
        if (size < hdr || p + size > end) return
        val d = p + hdr
        val e = p + size.toInt
        typ match {
          case "moov" => walk(d, e, inTrak)
          case "trak" =>
            // reset per-track state; keep only the first decodable track
            val (s0, c0, sc0, j0, a0, asps0, apps0, al0, t0) =
              (sizes, chunkOffsets, stsc, isJpeg, isAvc, avcSps, avcPps,
                avcLenSize, trackId)
            sizes = null; chunkOffsets = null; stsc = null
            isJpeg = false; isAvc = false; avcSps = null; avcPps = null
            avcLenSize = 4; trackId = -1
            walk(d, e, inTrak = true)
            if ((isJpeg || (isAvc && avcSps != null && avcPps != null)) &&
              sizes != null && chunkOffsets != null && stsc != null) done = true
            else {
              sizes = s0; chunkOffsets = c0; stsc = sc0; isJpeg = j0
              isAvc = a0; avcSps = asps0; avcPps = apps0; avcLenSize = al0
              trackId = t0
            }
          case "mdia" | "minf" | "stbl" if inTrak => walk(d, e, inTrak)
          case "tkhd" if inTrak && size >= hdr + 16 =>
            val v = b(d) & 0xFF // FullBox version; track_ID after the times
            val idOff = d + 4 + (if (v == 1) 16 else 8)
            if (idOff + 4 <= e) trackId = be32(b, idOff).toInt
          case "mvex" if !inTrak => walk(d, e, inTrak)
          case "trex" if !inTrak && size >= hdr + 24 =>
            if (trexSize.size < 64)
              trexSize(be32(b, d + 4).toInt) = be32(b, d + 16).toInt
          case "stsd" if inTrak && size >= hdr + 16 =>
            val fmt = new String(b, d + 8 + 4, 4, "US-ASCII")
            isJpeg = fmt == "jpeg" || fmt == "mjpa" || fmt == "mjpb"
            isAvc = fmt == "avc1" || fmt == "avc3"
            if (isAvc) parseAvcc(d + 8, math.min(e, d + 8 + be32(b, d + 8).toInt))
          case "stsz" if inTrak && size >= hdr + 12 =>
            val fixed = be32(b, d + 4).toInt
            val n = be32(b, d + 8).toInt
            if (n >= 0 && n <= (1 << 20)) {
              if (fixed != 0) sizes = Array.fill(n)(fixed)
              else if (d + 12 + 4L * n <= e)
                sizes = Array.tabulate(n)(i => be32(b, d + 12 + 4 * i).toInt)
            }
          case "stco" if inTrak && size >= hdr + 8 =>
            val n = be32(b, d + 4).toInt
            if (n >= 0 && n <= (1 << 20) && d + 8 + 4L * n <= e)
              chunkOffsets = Array.tabulate(n)(i => be32(b, d + 8 + 4 * i))
          case "co64" if inTrak && size >= hdr + 8 =>
            val n = be32(b, d + 4).toInt
            if (n >= 0 && n <= (1 << 20) && d + 8 + 8L * n <= e)
              chunkOffsets = Array.tabulate(n)(i =>
                (be32(b, d + 8 + 8 * i) << 32) | be32(b, d + 12 + 8 * i))
          case "stsc" if inTrak && size >= hdr + 8 =>
            val n = be32(b, d + 4).toInt
            if (n >= 0 && n <= (1 << 16) && d + 8 + 12L * n <= e)
              stsc = Array.tabulate(n)(i =>
                (be32(b, d + 8 + 12 * i).toInt, be32(b, d + 12 + 12 * i).toInt))
          case _ => ()
        }
        p = e
      }
    }
    walk(0, b.length, inTrak = false)
    if (!done) return Array.empty
    // resolve every sample's (offset, size) through the stsc runs FIRST
    // (cheap pointer arithmetic), then evenly select at most `max`
    // samples BEFORE the expensive per-sample decode — an avc1 video
    // with hundreds of keyframes costs `max` H.264 decodes, not all of
    // them (the decode-then-discard shape this replaces)
    val locs = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var sample = 0
    var ci = 0
    while (ci < chunkOffsets.length && sample < sizes.length) {
      var run = 0
      while (run + 1 < stsc.length && stsc(run + 1)._1 <= ci + 1) run += 1
      val perChunk = stsc(run)._2
      var off = chunkOffsets(ci)
      var k = 0
      while (k < perChunk && sample < sizes.length) {
        val sz = sizes(sample)
        // jpeg tracks: drop non-SOI samples HERE so they don't occupy
        // even-spaced selection slots (a track with some invalid samples
        // must still yield `max` decodable frames when enough exist)
        if (sz >= 3 && off >= 0 && off + sz <= b.length &&
          (!isJpeg || ((b(off.toInt) & 0xFF) == 0xFF && (b(off.toInt + 1) & 0xFF) == 0xD8)))
          locs += ((off, sz))
        off += sz
        sample += 1
        k += 1
      }
      ci += 1
    }
    // fragmented samples: scan top-level moof boxes and resolve each
    // traf's trun entries for the chosen track. Sizes inherit
    // per-sample -> tfhd default -> that track's trex default; offsets
    // anchor at tfhd base_data_offset when present, at the moof start
    // when the 0x020000 default-base-is-moof flag is set, else at the
    // END of the previous traf's data (the 14496-12 clause 8.8.7
    // default — a multi-track moof whose video traf is not first still
    // anchors correctly). Every traf's truns advance the running
    // cursor, even for non-selected tracks, so the next traf's default
    // base is right; only the selected track records sample locations.
    def parseTraf(d: Int, e: Int, moofStart: Long, prevEnd: Long): Long = {
      var tfTrack = -1
      var base = prevEnd
      var defSize = -1
      var cursor = -1L
      var p = d
      while (p + 8 <= e && locs.length <= (1 << 20)) {
        val size = be32(b, p)
        if (size < 8 || p + size > e) return math.max(cursor, prevEnd)
        val typ = new String(b, p + 4, 4, "US-ASCII")
        val q0 = p + 8
        if (typ == "tfhd" && size >= 16) {
          val flags = be32(b, q0).toInt & 0xFFFFFF
          tfTrack = be32(b, q0 + 4).toInt
          defSize = trexSize.getOrElse(tfTrack, -1)
          var q = q0 + 8
          if ((flags & 0x1) != 0 && q + 8 <= e) { // base_data_offset
            base = (be32(b, q) << 32) | be32(b, q + 4); q += 8
          } else if ((flags & 0x20000) != 0) base = moofStart
          if ((flags & 0x2) != 0) q += 4 // sample_description_index
          if ((flags & 0x8) != 0) q += 4 // default_sample_duration
          if ((flags & 0x10) != 0 && q + 4 <= e) { // default_sample_size
            defSize = be32(b, q).toInt; q += 4
          }
        } else if (typ == "trun" && size >= 16) {
          val record = tfTrack == trackId || trackId <= 0
          val flags = be32(b, q0).toInt & 0xFFFFFF
          val n = be32(b, q0 + 4).toInt
          var q = q0 + 8
          if (n >= 0 && n <= (1 << 20)) {
            if ((flags & 0x1) != 0 && q + 4 <= e) { // data_offset (signed)
              cursor = base + be32(b, q).toInt; q += 4
            } else if (cursor < 0) cursor = base
            if ((flags & 0x4) != 0) q += 4 // first_sample_flags
            var i = 0
            var ok = true
            while (i < n && ok && locs.length <= (1 << 20)) {
              if ((flags & 0x100) != 0) q += 4 // sample_duration
              var sz = defSize
              if ((flags & 0x200) != 0) {
                if (q + 4 <= e) { sz = be32(b, q).toInt; q += 4 } else ok = false
              }
              if ((flags & 0x400) != 0) q += 4 // sample_flags
              if ((flags & 0x800) != 0) q += 4 // composition offset
              if (ok && q <= e && sz > 0) {
                if (record && sz >= 3 && cursor >= 0 && cursor + sz <= b.length &&
                  (!isJpeg || ((b(cursor.toInt) & 0xFF) == 0xFF &&
                    (b(cursor.toInt + 1) & 0xFF) == 0xD8)))
                  locs += ((cursor, sz))
                cursor += sz
              } else ok = false
              i += 1
            }
          }
        }
        p += size.toInt
      }
      math.max(cursor, prevEnd)
    }
    var fp = 0
    while (fp + 8 <= b.length && locs.length <= (1 << 20)) {
      var size = be32(b, fp)
      var hdr = 8
      if (size == 1 && fp + 16 <= b.length) {
        size = (be32(b, fp + 8) << 32) | be32(b, fp + 12); hdr = 16
      } else if (size == 0) size = b.length - fp
      if (size < hdr || fp + size > b.length) fp = b.length
      else {
        if (b(fp + 4) == 'm' && b(fp + 5) == 'o' && b(fp + 6) == 'o' &&
          b(fp + 7) == 'f') {
          var tp = fp + hdr
          val te = fp + size.toInt
          var prevEnd = fp.toLong // first traf's default base = moof start
          while (tp + 8 <= te) {
            val tsz = be32(b, tp)
            if (tsz < 8 || tp + tsz > te) { tp = te } else {
              if (b(tp + 4) == 't' && b(tp + 5) == 'r' && b(tp + 6) == 'a' &&
                b(tp + 7) == 'f')
                prevEnd = parseTraf(tp + 8, tp + tsz.toInt, fp.toLong, prevEnd)
              tp += tsz.toInt
            }
          }
        }
        fp += size.toInt
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def avcSample(off: Int, sz: Int): Unit = {
      // length-prefixed NALs; decode IDR (type 5) keyframes natively
      val idrs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var p = off
      val end = off + sz
      while (p + avcLenSize <= end) {
        var len = 0L
        var i = 0
        while (i < avcLenSize) { len = (len << 8) | (b(p + i) & 0xFF); i += 1 }
        p += avcLenSize
        if (len <= 0 || p + len > end) return
        if ((b(p) & 0x1F) == 5)
          idrs += java.util.Arrays.copyOfRange(b, p, p + len.toInt)
        p += len.toInt
      }
      if (idrs.nonEmpty) {
        val f = H264.decodeAvcc(avcSps, avcPps, idrs.toSeq)
        if (f != null) out += ImageKernels.encodePng(f.w, f.h, f.y)
      }
    }
    val n = locs.length
    val sel =
      if (n <= max) 0 until n
      else (0 until max).map(i => (i.toLong * n / max).toInt)
    sel.foreach { si =>
      val (off, sz) = locs(si)
      if (isJpeg && (b(off.toInt) & 0xFF) == 0xFF && (b(off.toInt + 1) & 0xFF) == 0xD8)
        out += java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + sz)
      else if (isAvc) avcSample(off.toInt, sz)
    }
    out.toArray
  }

  /** MJPEG AVI writer for fixtures/tests: full RIFF with hdrl (avih +
    * strl/strh/strf) and a movi list carrying one `00dc` JPEG per frame. */
  def encodeMjpegAvi(width: Int, height: Int, usPerFrame: Long,
                     frames: Seq[Array[Byte]],
                     fourcc: String = "MJPG"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      bos.write(v.toInt & 0xFF); bos.write((v >> 8).toInt & 0xFF)
      bos.write((v >> 16).toInt & 0xFF); bos.write((v >> 24).toInt & 0xFF)
    }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def chunk(t: String, body: Array[Byte]): Unit = {
      tag(t); w32(body.length); bos.write(body)
      if ((body.length & 1) == 1) bos.write(0)
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("LIST".getBytes("US-ASCII"))
      val n = 4 + body.length
      o.write(n & 0xFF); o.write((n >> 8) & 0xFF); o.write((n >> 16) & 0xFF); o.write((n >> 24) & 0xFF)
      o.write(kind.getBytes("US-ASCII")); o.write(body)
      o.toByteArray
    }
    def le(buf: Array[Byte], p: Int, v: Long): Unit = {
      buf(p) = v.toByte; buf(p + 1) = (v >> 8).toByte
      buf(p + 2) = (v >> 16).toByte; buf(p + 3) = (v >> 24).toByte
    }
    val avih = new Array[Byte](56)
    le(avih, 0, usPerFrame); le(avih, 16, frames.length.toLong)
    le(avih, 24, 1) // one stream
    le(avih, 32, width.toLong); le(avih, 36, height.toLong)
    val strh = new Array[Byte](56)
    "vids".getBytes("US-ASCII").copyToArray(strh, 0)
    fourcc.getBytes("US-ASCII").copyToArray(strh, 4)
    le(strh, 20, usPerFrame); le(strh, 24, 1000000L) // rate scale/rate
    le(strh, 32, frames.length.toLong)
    val strf = new Array[Byte](40) // BITMAPINFOHEADER
    le(strf, 0, 40); le(strf, 4, width.toLong); le(strf, 8, height.toLong)
    strf(12) = 1; le(strf, 14, 24L << 16) // planes=1, bits=24 (packed odd, fine for fixture)
    fourcc.getBytes("US-ASCII").copyToArray(strf, 16)
    def bare(t: String, body: Array[Byte]): Array[Byte] = {
      val o = new Array[Byte](8 + body.length + (body.length & 1))
      t.getBytes("US-ASCII").copyToArray(o, 0)
      le(o, 4, body.length.toLong)
      body.copyToArray(o, 8)
      o
    }
    val hdrl = list("hdrl", bare("avih", avih) ++ list("strl",
      bare("strh", strh) ++ bare("strf", strf)))
    val movi = list("movi", frames.toArray.flatMap(f => bare("00dc", f)))
    tag("RIFF"); w32(4 + hdrl.length + movi.length); tag("AVI ")
    bos.write(hdrl); bos.write(movi)
    bos.toByteArray
  }

  /** avc1 MP4 writer for fixtures/tests: ftyp + mdat (one sample per
    * input Annex-B stream — its IDR NALs length-prefixed) + moov with a
    * full stbl whose stsd entry is avc1 + avcC (SPS/PPS lifted from the
    * first stream). The container shape real crawl MP4 video carries. */
  def encodeAvc1Mp4(width: Int, height: Int,
                    annexB: Seq[Array[Byte]]): Array[Byte] = {
    def u32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def u16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    // raw NAL units (header + escaped payload) from an Annex-B stream
    def rawNals(s: Array[Byte]): Seq[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var i = 0
      while (i + 3 < s.length) {
        if (s(i) == 0 && s(i + 1) == 0 &&
          (s(i + 2) == 1 || (s(i + 2) == 0 && i + 4 <= s.length && s(i + 3) == 1))) {
          val start = i + (if (s(i + 2) == 1) 3 else 4)
          var j = start
          while (j + 2 < s.length && !(s(j) == 0 && s(j + 1) == 0 &&
            (s(j + 2) == 0 || s(j + 2) == 1))) j += 1
          val end = if (j + 2 < s.length) j else s.length
          if (end > start) out += java.util.Arrays.copyOfRange(s, start, end)
          i = end
        } else i += 1
      }
      out.toSeq
    }
    val firstNals = rawNals(annexB.head)
    val sps = firstNals.find(n => (n(0) & 0x1F) == 7).get
    val pps = firstNals.find(n => (n(0) & 0x1F) == 8).get
    val samples = annexB.map { s =>
      rawNals(s).filter(n => (n(0) & 0x1F) == 5)
        .flatMap(n => u32(n.length.toLong) ++ n).toArray
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512) ++
      "isomavc1".getBytes("US-ASCII"))
    val mdatPayload = samples.toArray.flatten
    val mdatOff = ftyp.length.toLong + 8
    val mdat = box("mdat", mdatPayload)
    val perChunk = 2
    val nChunks = (samples.length + perChunk - 1) / perChunk
    val chunkOffs = new Array[Long](nChunks)
    var off = mdatOff
    var i = 0
    while (i < samples.length) {
      if (i % perChunk == 0) chunkOffs(i / perChunk) = off
      off += samples(i).length
      i += 1
    }
    val avcc = box("avcC", Array[Byte](1, sps(1), sps(2), sps(3), 0xFF.toByte,
      0xE1.toByte) ++ u16(sps.length) ++ sps ++ Array[Byte](1) ++
      u16(pps.length) ++ pps)
    // VisualSampleEntry: 78 fixed bytes, dims at +24, then the avcC box
    val entryBody = new Array[Byte](78)
    entryBody(7) = 1 // data_reference_index
    u16(width).copyToArray(entryBody, 24)
    u16(height).copyToArray(entryBody, 26)
    entryBody(28) = 0; entryBody(29) = 0x48 // 72 dpi 16.16
    entryBody(32) = 0; entryBody(33) = 0x48
    entryBody(40) = 0; entryBody(41) = 1 // frame_count
    entryBody(74) = 0; entryBody(75) = 24 // depth
    entryBody(76) = 0xFF.toByte; entryBody(77) = 0xFF.toByte
    val stsd = box("stsd", u32(0) ++ u32(1) ++ box("avc1", entryBody ++ avcc))
    val stts = box("stts", u32(0) ++ u32(1) ++ u32(samples.length.toLong) ++ u32(1000))
    val stsc = box("stsc", u32(0) ++ u32(1) ++ u32(1) ++ u32(perChunk.toLong) ++ u32(1))
    val stsz = box("stsz", u32(0) ++ u32(0) ++ u32(samples.length.toLong) ++
      samples.toArray.flatMap(f => u32(f.length.toLong)))
    val stco = box("stco", u32(0) ++ u32(nChunks.toLong) ++ chunkOffs.flatMap(u32))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val hdlr = box("hdlr", u32(0) ++ u32(0) ++ "vide".getBytes("US-ASCII") ++
      new Array[Byte](13))
    val mdhd = box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++
      u32(samples.length * 1000L) ++ u32(0x55C40000L))
    val mdia = box("mdia", mdhd ++ hdlr ++ box("minf", stbl))
    val tkhd = box("tkhd", new Array[Byte](76) ++
      u32(width.toLong << 16) ++ u32(height.toLong << 16))
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++
      u32(samples.length * 1000L) ++ new Array[Byte](80))
    ftyp ++ mdat ++ box("moov", mvhd ++ box("trak", tkhd ++ mdia))
  }

  /** Matroska H.264 writer for fixtures/tests: EBML + Tracks(TrackEntry
    * V_MPEG4/ISO/AVC with the avcC record in CodecPrivate) + Cluster
    * (one SimpleBlock of length-prefixed IDR NALs per input Annex-B
    * stream) — the MKV shape real crawl H.264 ships in alongside MP4. */
  def encodeMkvAvc(width: Int, height: Int,
                   annexB: Seq[Array[Byte]]): Array[Byte] = {
    def u32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def u16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
    def rawNals(s: Array[Byte]): Seq[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var i = 0
      while (i + 3 < s.length) {
        if (s(i) == 0 && s(i + 1) == 0 &&
          (s(i + 2) == 1 || (s(i + 2) == 0 && i + 4 <= s.length && s(i + 3) == 1))) {
          val start = i + (if (s(i + 2) == 1) 3 else 4)
          var j = start
          while (j + 2 < s.length && !(s(j) == 0 && s(j + 1) == 0 &&
            (s(j + 2) == 0 || s(j + 2) == 1))) j += 1
          val end = if (j + 2 < s.length) j else s.length
          if (end > start) out += java.util.Arrays.copyOfRange(s, start, end)
          i = end
        } else i += 1
      }
      out.toSeq
    }
    val firstNals = rawNals(annexB.head)
    val sps = firstNals.find(n => (n(0) & 0x1F) == 7).get
    val pps = firstNals.find(n => (n(0) & 0x1F) == 8).get
    val avcc = Array[Byte](1, sps(1), sps(2), sps(3), 0xFF.toByte,
      0xE1.toByte) ++ u16(sps.length) ++ sps ++ Array[Byte](1) ++
      u16(pps.length) ++ pps
    val frames = annexB.map { s =>
      rawNals(s).filter(n => (n(0) & 0x1F) == 5)
        .flatMap(n => u32(n.length.toLong) ++ n).toArray
    }
    Webm.encodeWebm(width, height, frames,
      codecId = "V_MPEG4/ISO/AVC", codecPrivate = avcc)
  }

  /** FRAGMENTED avc1 MP4 writer for fixtures/tests: ftyp + moov whose
    * stbl is EMPTY (zero-entry stts/stsc/stsz/stco) with mvex/trex
    * defaults, then one moof+mdat pair per sample — the DASH/streaming-
    * origin shape. Even samples carry their size per-sample in the
    * trun; odd samples inherit it from tfhd's default_sample_size, so
    * both inheritance paths of the reader are exercised. */
  def encodeAvc1FragMp4(width: Int, height: Int,
                        annexB: Seq[Array[Byte]],
                        leadJunk: Int = 0): Array[Byte] = {
    def u32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def u16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    def rawNals(s: Array[Byte]): Seq[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var i = 0
      while (i + 3 < s.length) {
        if (s(i) == 0 && s(i + 1) == 0 &&
          (s(i + 2) == 1 || (s(i + 2) == 0 && i + 4 <= s.length && s(i + 3) == 1))) {
          val start = i + (if (s(i + 2) == 1) 3 else 4)
          var j = start
          while (j + 2 < s.length && !(s(j) == 0 && s(j + 1) == 0 &&
            (s(j + 2) == 0 || s(j + 2) == 1))) j += 1
          val end = if (j + 2 < s.length) j else s.length
          if (end > start) out += java.util.Arrays.copyOfRange(s, start, end)
          i = end
        } else i += 1
      }
      out.toSeq
    }
    val firstNals = rawNals(annexB.head)
    val sps = firstNals.find(n => (n(0) & 0x1F) == 7).get
    val pps = firstNals.find(n => (n(0) & 0x1F) == 8).get
    val samples = annexB.map { s =>
      rawNals(s).filter(n => (n(0) & 0x1F) == 5)
        .flatMap(n => u32(n.length.toLong) ++ n).toArray
    }
    val avcc = box("avcC", Array[Byte](1, sps(1), sps(2), sps(3), 0xFF.toByte,
      0xE1.toByte) ++ u16(sps.length) ++ sps ++ Array[Byte](1) ++
      u16(pps.length) ++ pps)
    val entryBody = new Array[Byte](78)
    entryBody(7) = 1
    u16(width).copyToArray(entryBody, 24)
    u16(height).copyToArray(entryBody, 26)
    entryBody(29) = 0x48; entryBody(33) = 0x48
    entryBody(41) = 1
    entryBody(75) = 24
    entryBody(76) = 0xFF.toByte; entryBody(77) = 0xFF.toByte
    val stsd = box("stsd", u32(0) ++ u32(1) ++ box("avc1", entryBody ++ avcc))
    // fragmented: every sample table is declared but EMPTY
    val stbl = box("stbl", stsd ++ box("stts", u32(0) ++ u32(0)) ++
      box("stsc", u32(0) ++ u32(0)) ++
      box("stsz", u32(0) ++ u32(0) ++ u32(0)) ++
      box("stco", u32(0) ++ u32(0)))
    val hdlr = box("hdlr", u32(0) ++ u32(0) ++ "vide".getBytes("US-ASCII") ++
      new Array[Byte](13))
    val mdhd = box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++
      u32(samples.length * 1000L) ++ u32(0x55C40000L))
    val mdia = box("mdia", mdhd ++ hdlr ++ box("minf", stbl))
    val tkhdBody = new Array[Byte](76) ++
      u32(width.toLong << 16) ++ u32(height.toLong << 16)
    u32(1L).copyToArray(tkhdBody, 12) // track_ID = 1
    val tkhd = box("tkhd", tkhdBody)
    // the authentic fragmented shape: mvhd declares duration 0, the
    // whole-movie duration rides in mvex/mehd (fragment_duration)
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++
      u32(0) ++ new Array[Byte](80))
    // trex: track 1, description 1, zero default duration/size/flags
    // (+ a track-2 trex when the multi-track shape is requested)
    val mvex = box("mvex", box("mehd", u32(0) ++ u32(samples.length * 1000L)) ++
      box("trex", u32(0) ++ u32(1) ++ u32(1) ++ u32(0) ++ u32(0) ++ u32(0)) ++
      (if (leadJunk > 0)
        box("trex", u32(0) ++ u32(2) ++ u32(1) ++ u32(0) ++ u32(0) ++ u32(0))
      else Array.empty[Byte]))
    val moov = box("moov", mvhd ++ box("trak", tkhd ++ mdia) ++ mvex)
    val ftyp = box("ftyp", "iso5".getBytes("US-ASCII") ++ u32(512) ++
      "iso5avc1".getBytes("US-ASCII"))
    val frags = samples.zipWithIndex.flatMap { case (sample, i) =>
      val mfhd = box("mfhd", u32(0) ++ u32(i + 1L))
      if (leadJunk > 0) {
        // multi-track moof: a leading track-2 traf (no base_data_offset
        // — the FIRST traf anchors at the moof start, trun carries
        // data_offset + per-sample size) followed by the VIDEO traf
        // with no base/offset fields anywhere, whose clause-8.8.7
        // default base is the END of traf A's data
        val junk = Array.fill[Byte](leadJunk)(0x5A)
        val tfhdA = box("tfhd", u32(0) ++ u32(2))
        val trunA = box("trun", u32(0x201) ++ u32(1) ++ u32(0 /*patched*/) ++
          u32(leadJunk.toLong))
        val trafA = box("traf", tfhdA ++ trunA)
        val trafB = box("traf",
          box("tfhd", u32(0x10) ++ u32(1) ++ u32(sample.length.toLong)) ++
            box("trun", u32(0) ++ u32(1)))
        val moof = box("moof", mfhd ++ trafA ++ trafB)
        val patchAt = 8 + mfhd.length + 8 + tfhdA.length + 16
        u32(moof.length + 8L).copyToArray(moof, patchAt)
        moof ++ box("mdat", junk ++ sample)
      } else {
        val (tfhd, trun) =
          if (i % 2 == 0) {
            // size rides per-sample in the trun; default-base-is-moof
            (box("tfhd", u32(0x20000) ++ u32(1)),
              box("trun", u32(0x201) ++ u32(1) ++ u32(0 /*patched*/) ++
                u32(sample.length.toLong)))
          } else {
            // size inherits from tfhd's default_sample_size
            (box("tfhd", u32(0x20010) ++ u32(1) ++ u32(sample.length.toLong)),
              box("trun", u32(0x1) ++ u32(1) ++ u32(0 /*patched*/)))
          }
        val moof = box("moof", mfhd ++ box("traf", tfhd ++ trun))
        // trun data_offset (moof-relative) = past this moof + mdat header;
        // it is the LAST 4 or 8 bytes of the moof depending on the shape
        val dataOff = moof.length + 8
        val patchAt = moof.length - (if (i % 2 == 0) 8 else 4)
        u32(dataOff.toLong).copyToArray(moof, patchAt)
        moof ++ box("mdat", sample)
      }
    }
    ftyp ++ moov ++ frags
  }

  /** JPEG-sample MP4 writer for fixtures/tests: ftyp + mdat(frames) +
    * moov with a full stbl (stsd `jpeg`, stts, stsc in 2-sample chunks to
    * exercise run mapping, stsz, stco). */
  def encodeJpegMp4(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    def u32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512) ++
      "isomiso2".getBytes("US-ASCII"))
    val mdatPayload = frames.toArray.flatten
    val mdatOff = ftyp.length.toLong + 8 // file offset of the first sample
    val mdat = box("mdat", mdatPayload)
    // chunks of 2 samples so stsc has a real mapping to resolve
    val perChunk = 2
    val nChunks = (frames.length + perChunk - 1) / perChunk
    val chunkOffs = new Array[Long](nChunks)
    var off = mdatOff
    var i = 0
    while (i < frames.length) {
      if (i % perChunk == 0) chunkOffs(i / perChunk) = off
      off += frames(i).length
      i += 1
    }
    val stsd = box("stsd", u32(0) ++ u32(1) ++
      box("jpeg", new Array[Byte](6) ++ Array[Byte](0, 1) ++ new Array[Byte](16) ++
        Array[Byte]((width >> 8).toByte, width.toByte, (height >> 8).toByte, height.toByte) ++
        new Array[Byte](50)))
    val stts = box("stts", u32(0) ++ u32(1) ++ u32(frames.length.toLong) ++ u32(1000))
    val stsc = box("stsc", u32(0) ++ u32(1) ++ u32(1) ++ u32(perChunk.toLong) ++ u32(1))
    val stsz = box("stsz", u32(0) ++ u32(0) ++ u32(frames.length.toLong) ++
      frames.toArray.flatMap(f => u32(f.length.toLong)))
    val stco = box("stco", u32(0) ++ u32(nChunks.toLong) ++ chunkOffs.flatMap(u32))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", stbl)
    val hdlr = box("hdlr", u32(0) ++ u32(0) ++ "vide".getBytes("US-ASCII") ++
      new Array[Byte](13))
    val mdhd = box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++
      u32(frames.length * 1000L) ++ u32(0x55C40000L))
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val tkhd = box("tkhd", new Array[Byte](76) ++
      u32(width.toLong << 16) ++ u32(height.toLong << 16))
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++
      u32(frames.length * 1000L) ++ new Array[Byte](80))
    val moov = box("moov", mvhd ++ box("trak", tkhd ++ mdia))
    ftyp ++ mdat ++ moov
  }
}

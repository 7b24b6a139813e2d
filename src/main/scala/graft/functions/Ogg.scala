package graft.functions

/** Ogg container metadata (RFC 3533) for the audio tier: the page walk
  * plus the Vorbis / Opus / FLAC identification headers — the crawl
  * shapes `.ogg`/`.opus`/`.oga` files carry. Metadata only (sample
  * decode of these codecs is a stated non-goal; this face makes the
  * files VISIBLE to audio_meta with channels/rate/duration instead of
  * null rows — the codec column's diagnosability contract).
  *
  * Duration comes from the LAST page's granule position: Vorbis
  * granules are PCM sample counts at the declared rate; Opus granules
  * are always in the 48 kHz domain regardless of input rate.
  *
  * Totality: bounds-checked page walk, capped page count, null on
  * anything that is not an Ogg stream.
  */
object Ogg {

  @inline private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
      ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)

  @inline private def le64(b: Array[Byte], p: Int): Long =
    le32(b, p) | (le32(b, p + 4) << 32)

  private[functions] def isOgg(b: Array[Byte]): Boolean =
    b != null && b.length >= 28 &&
      b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S'

  private def starts(b: Array[Byte], d: Int, s: String): Boolean = {
    val m = s.getBytes("ISO-8859-1")
    if (d + m.length > b.length) return false
    var i = 0
    while (i < m.length) { if (b(d + i) != m(i)) return false; i += 1 }
    true
  }

  /** (channels, rate, nSamples, durationMs, codec); null when not Ogg
    * or no recognized identification header. nSamples is the final
    * granule for Vorbis (PCM frames at `rate`); 0 for Opus/FLAC whose
    * granule domain differs from the declared rate. */
  private[functions] def audioInfo(b: Array[Byte]): (Array[Long], String) = {
    if (!isOgg(b)) return null
    var codec: String = null
    var ch = 0L
    var rate = 0L
    var granRate = 0L
    var lastGranule = -1L
    var serial = -1L // granules only count for the identified stream
    var p = 0
    var pages = 0
    while (p + 27 <= b.length && pages < (1 << 20) &&
      b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' && b(p + 3) == 'S') {
      val nseg = b(p + 26) & 0xFF
      if (p + 27 + nseg > b.length) return finish(codec, ch, rate, granRate, lastGranule)
      var plen = 0
      var i = 0
      while (i < nseg) { plen += b(p + 27 + i) & 0xFF; i += 1 }
      val d = p + 27 + nseg
      if (d + plen > b.length) return finish(codec, ch, rate, granRate, lastGranule)
      val granule = le64(b, p + 6)
      if (codec != null && granule >= 0 && le32(b, p + 14) == serial)
        lastGranule = granule // -1 = no packet boundary
      // scan EVERY BOS page (header_type 0x02) until a recognized audio
      // identification header locks the serial — multiplexed files
      // (e.g. Theora+Vorbis, skeleton-bearing) put the audio BOS on a
      // later page, not the first
      if (codec == null && (b(p + 5) & 0x02) != 0) {
        serial = le32(b, p + 14)
        if (starts(b, d, "vorbis") && plen >= 30) {
          codec = "vorbis"
          ch = b(d + 11) & 0xFF
          rate = le32(b, d + 12)
          granRate = rate
        } else if (starts(b, d, "OpusHead") && plen >= 19) {
          codec = "opus"
          ch = b(d + 9) & 0xFF
          rate = le32(b, d + 12) // declared input rate; playback is 48 kHz
          granRate = 48000L
        } else if (starts(b, d, "Speex   ") && plen >= 52) {
          // rate/channels are raw le32 fields (unlike the single-byte
          // Vorbis/Opus reads) — range-check before trusting, or a hostile
          // BOS page surfaces negative / multi-billion values into
          // audio_meta; out-of-range leaves the stream unidentified
          val r0 = le32(b, d + 36)
          val c0 = le32(b, d + 48)
          if (c0 >= 1 && c0 <= 255 && r0 >= 1 && r0 <= 768000) {
            codec = "speex"
            rate = r0
            ch = c0
            granRate = r0
          }
        } else if (starts(b, d, "FLAC") && plen >= 13) {
          codec = "flac"
        }
      }
      p = d + plen
      pages += 1
    }
    finish(codec, ch, rate, granRate, lastGranule)
  }

  private def finish(codec: String, ch: Long, rate: Long, granRate: Long,
                     lastGranule: Long): (Array[Long], String) = {
    if (codec == null) return null
    val dur = if (lastGranule > 0 && granRate > 0) lastGranule * 1000L / granRate else 0L
    val n = if (codec == "vorbis" && lastGranule > 0) lastGranule else 0L
    (Array(ch, rate, n, dur), codec)
  }

  /** Theora video metadata from an Ogg stream (the .ogv crawl shape):
    * (picture width, picture height, durationMs). The identification
    * header's fields are byte-aligned big-endian (Theora I spec 6.2):
    * PICW/PICH 24-bit at offsets 14/17, frame rate FRN/FRD 32-bit at
    * 22/26, and KFGSHIFT (5 bits of the 16-bit field at offset 40)
    * splits granules into keyframe<<shift | delta — frames = the two
    * summed. Decode is a documented non-goal (VP3-family coefficient
    * tables, same no-validation-path class as High-8x8); this walk
    * makes .ogv files VISIBLE to video_meta. Null when no Theora BOS. */
  private[functions] def theoraInfo(b: Array[Byte]): Array[Long] = {
    if (!isOgg(b)) return null
    var serial = -1L
    var lastGranule = -1L
    var picw = 0L
    var pich = 0L
    var frn = 0L
    var frd = 0L
    var kfg = 0
    def be24(p: Int): Long =
      ((b(p) & 0xFFL) << 16) | ((b(p + 1) & 0xFFL) << 8) | (b(p + 2) & 0xFFL)
    def be32s(p: Int): Long = (be24(p) << 8) | (b(p + 3) & 0xFFL)
    var p = 0
    var pages = 0
    while (p + 27 <= b.length && pages < (1 << 20) &&
      b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' && b(p + 3) == 'S') {
      val nseg = b(p + 26) & 0xFF
      if (p + 27 + nseg > b.length) return mkTheora(picw, pich, frn, frd, kfg, lastGranule)
      var plen = 0
      var i = 0
      while (i < nseg) { plen += b(p + 27 + i) & 0xFF; i += 1 }
      val d = p + 27 + nseg
      if (d + plen > b.length) return mkTheora(picw, pich, frn, frd, kfg, lastGranule)
      val granule = le64(b, p + 6)
      if (serial >= 0 && granule >= 0 && le32(b, p + 14) == serial)
        lastGranule = granule
      if (serial < 0 && (b(p + 5) & 0x02) != 0 && plen >= 42 &&
        (b(d) & 0xFF) == 0x80 && starts(b, d + 1, "theora")) {
        serial = le32(b, p + 14)
        picw = be24(d + 14)
        pich = be24(d + 17)
        frn = be32s(d + 22)
        frd = be32s(d + 26)
        val tail = ((b(d + 40) & 0xFF) << 8) | (b(d + 41) & 0xFF)
        kfg = (tail >> 5) & 0x1F
      }
      p = d + plen
      pages += 1
    }
    mkTheora(picw, pich, frn, frd, kfg, lastGranule)
  }

  private def mkTheora(picw: Long, pich: Long, frn: Long, frd: Long,
                       kfg: Int, lastGranule: Long): Array[Long] = {
    if (picw <= 0 || pich <= 0) return null
    val frames =
      if (lastGranule <= 0) 0L
      else (lastGranule >> kfg) + (lastGranule & ((1L << kfg) - 1))
    val dur = if (frn > 0 && frames > 0) frames * 1000L * frd / frn else 0L
    Array(picw, pich, dur)
  }

  /** Ogg-Theora metadata fixture: BOS page with the identification
    * header + an EOS page whose granule encodes `frames` as
    * keyframe<<kfgShift (all frames since one keyframe split evenly
    * for nonzero delta coverage). */
  def encodeOggTheora(picw: Int, pich: Int, frn: Long, frd: Long,
                      kfgShift: Int, frames: Long): Array[Byte] = {
    val ident = new Array[Byte](42)
    ident(0) = 0x80.toByte
    "theora".getBytes("US-ASCII").copyToArray(ident, 1)
    ident(7) = 3; ident(8) = 2; ident(9) = 1 // version 3.2.1
    def be16(p: Int, v: Int): Unit = {
      ident(p) = (v >> 8).toByte; ident(p + 1) = v.toByte
    }
    def be24(p: Int, v: Long): Unit = {
      ident(p) = (v >> 16).toByte; ident(p + 1) = (v >> 8).toByte
      ident(p + 2) = v.toByte
    }
    def be32(p: Int, v: Long): Unit = {
      ident(p) = (v >> 24).toByte; be24(p + 1, v & 0xFFFFFF)
    }
    be16(10, (picw + 15) / 16)
    be16(12, (pich + 15) / 16)
    be24(14, picw)
    be24(17, pich)
    be32(22, frn)
    be32(26, frd)
    be24(30, 0); be24(33, 0) // PAR
    ident(36) = 0 // colorspace
    be24(37, 0) // nominal bitrate
    val tail = (48 << 10) | ((kfgShift & 0x1F) << 5) // QUAL 48, PF/Res 0
    ident(40) = (tail >> 8).toByte
    ident(41) = tail.toByte
    val half = frames / 2
    val granule = (half << kfgShift) | (frames - half)
    page(0x74686F72L, 0, -1L, 2, ident) ++
      page(0x74686F72L, 1, granule, 4, Array[Byte](0))
  }

  /** Reconstruct the NATIVE FLAC stream from an Ogg-FLAC file: page
    * payloads concatenate to the packet byte stream, whose first packet
    * is the 9-byte mapping prefix (0x7F "FLAC" major minor nheaders)
    * followed by the native "fLaC" signature — everything after the
    * prefix IS the native stream (metadata blocks + frames), whatever
    * the page/packet split. Null when not Ogg-FLAC. The native bytes
    * feed [[Flac]] directly, so Ogg is pure carriage: the same
    * recording fingerprints identically from .flac and .oga. */
  private[functions] def flacNative(b: Array[Byte]): Array[Byte] = {
    if (!isOgg(b)) return null
    val bos = new java.io.ByteArrayOutputStream()
    var p = 0
    var pages = 0
    // multiplexed Ogg interleaves logical streams by serial number —
    // only the FLAC stream's pages (the one whose BOS packet opens with
    // the 0x7F "FLAC" mapping prefix) may concatenate
    var flacSerial = -1L
    while (p + 27 <= b.length && pages < (1 << 20) &&
      b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' && b(p + 3) == 'S') {
      val nseg = b(p + 26) & 0xFF
      if (p + 27 + nseg > b.length) return null
      var plen = 0
      var i = 0
      while (i < nseg) { plen += b(p + 27 + i) & 0xFF; i += 1 }
      val d = p + 27 + nseg
      if (d + plen > b.length) return null
      val serial = le32(b, p + 14)
      if (flacSerial < 0 && (b(p + 5) & 0x02) != 0 && plen >= 5 &&
        (b(d) & 0xFF) == 0x7F && b(d + 1) == 'F' && b(d + 2) == 'L' &&
        b(d + 3) == 'A' && b(d + 4) == 'C') flacSerial = serial
      if (serial == flacSerial) bos.write(b, d, plen)
      p = d + plen
      pages += 1
    }
    val all = bos.toByteArray
    if (all.length < 13 || (all(0) & 0xFF) != 0x7F ||
      all(1) != 'F' || all(2) != 'L' || all(3) != 'A' || all(4) != 'C' ||
      !(all(9) == 'f' && all(10) == 'L' && all(11) == 'a' && all(12) == 'C'))
      return null
    java.util.Arrays.copyOfRange(all, 9, all.length)
  }

  // ------------------------------------------------------------ writer

  /** Ogg page CRC (poly 0x04C11DB7, init 0, no reflection, no xor-out)
    * over the page with its CRC field zeroed. */
  private def oggCrc(page: Array[Byte]): Long = {
    var crc = 0L
    var i = 0
    while (i < page.length) {
      crc ^= (page(i) & 0xFFL) << 24
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

  private[functions] def page(serial: Long, seq: Long, granule: Long,
                              headerType: Int,
                              payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 255 * 255, "fixture page too large")
    val nseg = payload.length / 255 + 1
    val out = new Array[Byte](27 + nseg + payload.length)
    "OggS".getBytes("US-ASCII").copyToArray(out, 0)
    out(5) = headerType.toByte
    var g = granule
    var i = 0
    while (i < 8) { out(6 + i) = (g & 0xFF).toByte; g >>= 8; i += 1 }
    var v = serial
    i = 0
    while (i < 4) { out(14 + i) = (v & 0xFF).toByte; v >>= 8; i += 1 }
    v = seq
    i = 0
    while (i < 4) { out(18 + i) = (v & 0xFF).toByte; v >>= 8; i += 1 }
    out(26) = nseg.toByte
    var rem = payload.length
    i = 0
    while (i < nseg) {
      out(27 + i) = math.min(rem, 255).toByte
      rem -= 255
      i += 1
    }
    payload.copyToArray(out, 27 + nseg)
    val crc = oggCrc(out)
    out(22) = crc.toByte
    out(23) = (crc >> 8).toByte
    out(24) = (crc >> 16).toByte
    out(25) = (crc >> 24).toByte
    out
  }

  /** Ogg-FLAC file from a native FLAC stream (RFC-style mapping): BOS
    * page carries the 9-byte mapping prefix + "fLaC" + STREAMINFO; the
    * rest of the native stream rides an EOS page with the total-sample
    * granule. */
  def encodeOggFlac(native: Array[Byte], totalSamples: Long): Array[Byte] = {
    require(native.length > 42 && native(0) == 'f' && native(1) == 'L' &&
      native(2) == 'a' && native(3) == 'C', "not a native FLAC stream")
    val head = Array[Byte](0x7F, 'F', 'L', 'A', 'C', 1, 0, 0, 1) ++
      java.util.Arrays.copyOfRange(native, 0, 42) // fLaC + STREAMINFO
    val rest = java.util.Arrays.copyOfRange(native, 42, native.length)
    page(0x666C6163L, 0, -1L, 2, head) ++
      page(0x666C6163L, 1, totalSamples, 4, rest)
  }

  /** Ogg audio metadata fixture: a BOS page with the codec's
    * identification header and an EOS page whose granule encodes the
    * stream length (Vorbis: `samples` at `rate`; Opus: `samples` in
    * the 48 kHz domain). */
  def encodeOggAudio(codec: String, channels: Int, rate: Long,
                     samples: Long): Array[Byte] = {
    def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xFF).toByte)
    val ident = codec match {
      case "vorbis" =>
        "vorbis".getBytes("ISO-8859-1") ++ le(0, 4) ++
          Array(channels.toByte) ++ le(rate, 4) ++ le(0, 12) ++
          Array(0xB8.toByte, 0x01.toByte) // blocksizes + framing bit
      case "opus" =>
        "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1, channels.toByte) ++
          le(312, 2) ++ le(rate, 4) ++ le(0, 2) ++ Array[Byte](0)
      case other => throw new IllegalArgumentException(s"ogg fixture: $other")
    }
    page(0x6772616CL, 0, -1L, 2, ident) ++ // BOS, no packet ends here
      page(0x6772616CL, 1, samples, 4, Array[Byte](0)) // EOS
  }
}

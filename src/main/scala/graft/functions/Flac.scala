package graft.functions

/**
 * Native FLAC decode (and a fixture encoder) — the lossless, all-integer
 * audio codec (public spec: RFC 9639 / the xiph FLAC format document), so
 * audio fingerprint near-dedup covers mixed WAV+FLAC corpora with
 * BIT-IDENTICAL samples on every JVM: FLAC's spec defines exact integer
 * prediction and Rice residual coding, which fits this engine's
 * determinism discipline the same way baseline JPEG does for images
 * ([[Jpeg]]). MP3 stays metadata-only by design — lossy decode is not
 * bit-portable.
 *
 * Decoder scope: every subframe type (CONSTANT, VERBATIM, FIXED 0-4,
 * LPC 1-32), Rice residual methods 0/1 including escape partitions, all
 * four channel assignments (independent, left/side, right/side,
 * mid/side), variable and fixed blocking, 8/12/16/20/24-bit samples.
 * CRCs are consumed (stream-position-exact) but not verified — a corrupt
 * payload surfaces as null through the bounds checks, never a throw.
 *
 * The encoder (fixtures/specs) writes FIXED-predictor subframes with
 * single-partition Rice residuals (verbatim fallback), correct CRC-8 /
 * CRC-16 so external decoders accept its files.
 */
private[graft] object Flac {

  // ------------------------------------------------------------- bit io

  private final class BitReader(b: Array[Byte], var pos: Int) {
    var bit = 0
    def read(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) {
        if (pos >= b.length) throw new ArrayIndexOutOfBoundsException(pos)
        v = (v << 1) | ((b(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        k += 1
      }
      v
    }
    def readSigned(n: Int): Long = {
      val v = read(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def unary(): Int = {
      var q = 0
      while (read(1) == 0) {
        q += 1
        if (q > (1 << 24)) throw new IllegalArgumentException("runaway unary")
      }
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(v: Long, bits: Int): Unit = {
      var k = bits - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >>> k) & 1L).toInt
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        k -= 1
      }
    }
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def align(): Unit = if (n > 0) put(0, 8 - n)
  }

  // ------------------------------------------------------------ decoding

  private val BlockSizes = Array(0, 192, 576, 1152, 2304, 4608, -8, -16,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768) // -8/-16: n-bit follows

  /** Decode all frames to interleaved samples, or null when not FLAC /
    * outside scope / corrupt. `b` starts at the fLaC marker. */
  def decode(b: Array[Byte]): Array[Int] = {
    try decodeInner(b) catch { case _: Exception => null }
  }

  /** Decode normalized to the 16-bit range using the STREAMINFO bit depth,
    * mirroring [[MediaKernels.wavSamples]] conventions so WAV and FLAC
    * encodings of the same recording yield identical samples regardless of
    * container bit depth: bps>16 → arithmetic `>> (bps-16)` (same floor as
    * the WAV 24/32-bit path), bps==8 → ×257 (full-span rescale, matching
    * WAV's unsigned-byte rescale after the ±128 bias difference cancels),
    * other bps<16 → `<< (16-bps)`. */
  def decode16(b: Array[Byte]): Array[Int] = {
    val s = decode(b)
    if (s == null) return null
    val bps = streamInfoBps(b)
    if (bps == 16 || bps <= 0) s
    else {
      var i = 0
      while (i < s.length) {
        s(i) =
          if (bps > 16) s(i) >> (bps - 16)
          else if (bps == 8) s(i) * 257
          else s(i) << (16 - bps)
        i += 1
      }
      s
    }
  }

  /** Bits-per-sample from STREAMINFO, or -1 when unparseable. */
  private def streamInfoBps(b: Array[Byte]): Int = {
    if (b == null || b.length < 42) return -1
    var bits = 0L
    var i = 0
    while (i < 8) { bits = (bits << 8) | (b(4 + 4 + 10 + i) & 0xFFL); i += 1 }
    ((bits >>> 36) & 0x1FL).toInt + 1
  }

  private def decodeInner(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 42) return null
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return null
    // metadata blocks: STREAMINFO first, walk to the last block
    var p = 4
    var last = false
    var channels = 0; var bps = 0; var total = 0L
    var first = true
    while (!last) {
      if (p + 4 > b.length) return null
      last = (b(p) & 0x80) != 0
      val typ = b(p) & 0x7F
      val len = ((b(p + 1) & 0xFF) << 16) | ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
      if (first) {
        if (typ != 0 || len < 34) return null
        var bits = 0L
        var i = 0
        while (i < 8) { bits = (bits << 8) | (b(p + 4 + 10 + i) & 0xFFL); i += 1 }
        channels = ((bits >>> 41) & 0x7L).toInt + 1
        bps = ((bits >>> 36) & 0x1FL).toInt + 1
        total = bits & 0xFFFFFFFFFL
        first = false
      }
      p += 4 + len
    }
    if (channels <= 0 || bps < 4 || bps > 24) return null
    if (total <= 0 || total * channels > (1L << 28)) return null // bound memory
    val out = new Array[Int]((total * channels).toInt)
    var written = 0L

    val r = new BitReader(b, p)
    while (written < total && r.pos < b.length) {
      // ---- frame header (RFC 9639 §9.1)
      if (r.read(14) != 0x3FFE) return null // sync
      r.read(1) // reserved
      r.read(1) // blocking strategy
      val bsCode = r.read(4).toInt
      val srCode = r.read(4).toInt
      val chAsgn = r.read(4).toInt
      val ssCode = r.read(3).toInt
      r.read(1) // reserved
      // coded number (UTF-8-style, 1-7 bytes)
      val lead = r.read(8).toInt
      var extra = 0
      var mask = 0x80
      while ((lead & mask) != 0) { extra += 1; mask >>= 1 }
      if (extra == 1 || extra > 6) return null
      var i = 0
      while (i < math.max(0, extra - 1)) { if ((r.read(8).toInt & 0xC0) != 0x80) return null; i += 1 }
      val blockSize = BlockSizes(bsCode) match {
        case 0 => return null
        case -8 => r.read(8).toInt + 1
        case -16 => r.read(16).toInt + 1
        case v => v
      }
      srCode match { // sample rate: consume trailing forms; value unused here
        case 12 => r.read(8)
        case 13 | 14 => r.read(16)
        case _ => ()
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8; case 2 => 12; case 4 => 16; case 5 => 20; case 6 => 24
        case _ => return null
      }
      r.read(8) // CRC-8 (consumed, not verified)

      val frameChannels = if (chAsgn <= 7) chAsgn + 1 else 2
      if (frameChannels != channels) return null
      val chans = Array.ofDim[Long](frameChannels, blockSize)
      var c = 0
      while (c < frameChannels) {
        val extraBit = chAsgn match {
          case 8 => if (c == 1) 1 else 0  // left/side
          case 9 => if (c == 0) 1 else 0  // right/side
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        decodeSubframe(r, chans(c), blockSize, frameBps + extraBit)
        c += 1
      }
      r.align()
      r.read(16) // frame CRC-16 (consumed)

      // undo stereo decorrelation
      chAsgn match {
        case 8 => // left/side: right = left - side
          var k = 0
          while (k < blockSize) { chans(1)(k) = chans(0)(k) - chans(1)(k); k += 1 }
        case 9 => // right/side (side, right): left = right + side
          var k = 0
          while (k < blockSize) {
            val side = chans(0)(k)
            chans(0)(k) = chans(1)(k) + side
            k += 1
          }
        case 10 => // mid/side
          var k = 0
          while (k < blockSize) {
            val mid = chans(0)(k); val side = chans(1)(k)
            val m2 = (mid << 1) | (side & 1L)
            chans(0)(k) = (m2 + side) >> 1
            chans(1)(k) = (m2 - side) >> 1
            k += 1
          }
        case _ => ()
      }

      val n = math.min(blockSize.toLong, total - written).toInt
      var k = 0
      while (k < n) {
        var cc = 0
        while (cc < frameChannels) {
          out((written.toInt + k) * frameChannels + cc) = chans(cc)(k).toInt
          cc += 1
        }
        k += 1
      }
      written += n
    }
    if (written < total) null else out
  }

  private def decodeSubframe(r: BitReader, out: Array[Long], n: Int, bps: Int): Unit = {
    if (r.read(1) != 0) throw new IllegalArgumentException("subframe pad bit")
    val typ = r.read(6).toInt
    var wasted = 0
    if (r.read(1) == 1) wasted = r.unary() + 1
    val eff = bps - wasted
    typ match {
      case 0 => // CONSTANT
        val v = r.readSigned(eff)
        java.util.Arrays.fill(out, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < n) { out(i) = r.readSigned(eff); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        val order = t - 8
        var i = 0
        while (i < order) { out(i) = r.readSigned(eff); i += 1 }
        readResidual(r, out, n, order)
        i = order
        while (i < n) {
          val p = order match {
            case 0 => 0L
            case 1 => out(i - 1)
            case 2 => 2 * out(i - 1) - out(i - 2)
            case 3 => 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
            case _ => 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) - out(i - 4)
          }
          out(i) += p
          i += 1
        }
      case t if t >= 32 => // LPC order 1-32
        val order = t - 31
        var i = 0
        while (i < order) { out(i) = r.readSigned(eff); i += 1 }
        val precision = r.read(4).toInt + 1
        if (precision == 16) throw new IllegalArgumentException("invalid lpc precision")
        val shift = r.readSigned(5).toInt
        val coefs = new Array[Long](order)
        i = 0
        while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
        readResidual(r, out, n, order)
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
          out(i) += (acc >> shift)
          i += 1
        }
      case _ => throw new IllegalArgumentException(s"reserved subframe type $typ")
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
  }

  /** Rice-coded residual into out(order until n). */
  private def readResidual(r: BitReader, out: Array[Long], n: Int, order: Int): Unit = {
    val method = r.read(2).toInt
    if (method > 1) throw new IllegalArgumentException("reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val po = r.read(4).toInt
    val partitions = 1 << po
    if (n % partitions != 0) throw new IllegalArgumentException("partition misfit")
    var idx = order
    var part = 0
    while (part < partitions) {
      val count = (n >> po) - (if (part == 0) order else 0)
      if (count < 0) throw new IllegalArgumentException("order exceeds partition")
      val param = r.read(paramBits).toInt
      if (param == escape) {
        val raw = r.read(5).toInt
        var i = 0
        while (i < count) { out(idx) = if (raw == 0) 0L else r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary().toLong
          val rem = if (param == 0) 0L else r.read(param)
          val u = (q << param) | rem
          out(idx) = (u >>> 1) ^ -(u & 1L) // zigzag
          idx += 1
          i += 1
        }
      }
      part += 1
    }
  }

  // ------------------------------------------------------------ encoding

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF; k += 1 }
      i += 1
    }
    crc
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF else (crc << 1) & 0xFFFF; k += 1 }
      i += 1
    }
    crc
  }

  /** Encode mono 16-bit samples as a real FLAC file: STREAMINFO + one
    * frame per 4096-sample block, FIXED-predictor subframes (best of
    * order 0-2 by residual magnitude) with single-partition Rice
    * residuals, correct CRC-8/CRC-16. */
  def encodeMono16(sampleRate: Int, samples: Array[Int]): Array[Byte] =
    encode16(sampleRate, Array(samples), chAsgn = 0, nChannels = 1,
      total = samples.length)

  /** Encode a stereo pair with a chosen channel assignment — 1 =
    * independent L/R, 8 = left/side, 9 = right/side, 10 = mid/side — so
    * specs can drive every stereo-decorrelation decode path with known
    * source samples. */
  def encodeStereo16(sampleRate: Int, left: Array[Int], right: Array[Int],
                     chAsgn: Int = 10): Array[Byte] = {
    require(left.length == right.length, "stereo channels must align")
    val planes: Array[Array[Int]] = chAsgn match {
      case 1 => Array(left, right)
      case 8 => Array(left, Array.tabulate(left.length)(i => left(i) - right(i)))
      case 9 => Array(Array.tabulate(left.length)(i => left(i) - right(i)), right)
      case 10 => Array(
        Array.tabulate(left.length)(i => (left(i) + right(i)) >> 1),
        Array.tabulate(left.length)(i => left(i) - right(i)))
      case other => throw new IllegalArgumentException(s"channel assignment $other")
    }
    encode16(sampleRate, planes, chAsgn, nChannels = 2, total = left.length)
  }

  /** Subframe bit width for channel `c` under an assignment: the SIDE
    * channel carries one extra bit. */
  private def chBps(chAsgn: Int, c: Int): Int = chAsgn match {
    case 8 => if (c == 1) 17 else 16
    case 9 => if (c == 0) 17 else 16
    case 10 => if (c == 1) 17 else 16
    case _ => 16
  }

  private def encode16(sampleRate: Int, planes: Array[Array[Int]],
                       chAsgn: Int, nChannels: Int, total: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('f', 'L', 'a', 'C'), 0, 4)
    // STREAMINFO (last metadata block)
    val si = new Array[Byte](38)
    si(0) = 0x80.toByte; si(3) = 34
    val bs = 4096
    si(4) = (bs >> 8).toByte; si(5) = (bs & 0xFF).toByte // min blocksize
    si(6) = (bs >> 8).toByte; si(7) = (bs & 0xFF).toByte // max blocksize
    var packed = (sampleRate.toLong << 44) | ((nChannels - 1).toLong << 41) |
      (15L << 36) | (total.toLong & 0xFFFFFFFFFL)
    var i = 7
    while (i >= 0) { si(4 + 10 + i) = (packed & 0xFF).toByte; packed >>>= 8; i -= 1 }
    out.write(si, 0, 38)

    // frame channel-assignment field: 0-7 = channels-1 (independent),
    // 8/9/10 = stereo decorrelation modes
    val asgnField = if (chAsgn == 0 || chAsgn == 1) nChannels - 1 else chAsgn
    var frameNo = 0
    var off = 0
    while (off < total) {
      val n = math.min(bs, total - off)
      val frame = new java.io.ByteArrayOutputStream()
      val w = new BitWriter(frame)
      w.put(0x3FFE, 14); w.put(0, 1); w.put(0, 1) // sync, reserved, fixed blocking
      w.put(7, 4)  // blocksize: 16-bit value-1 follows
      w.put(0, 4)  // sample rate: from STREAMINFO
      w.put(asgnField.toLong, 4)
      w.put(4, 3)  // sample size: 16
      w.put(0, 1)
      // coded frame number, UTF-8 style (fixtures stay < 2^31 frames)
      encodeUtf8Number(w, frameNo)
      w.put((n - 1).toLong, 16)
      w.align()
      val headBytes = frame.toByteArray
      frame.reset()
      frame.write(headBytes, 0, headBytes.length)
      frame.write(crc8(headBytes, 0, headBytes.length))
      // subframes on the remaining bit stream
      val w2 = new BitWriter(frame)
      var c = 0
      while (c < planes.length) {
        writeSubframe(w2, planes(c), off, n, chBps(chAsgn, c))
        c += 1
      }
      w2.align()
      val body = frame.toByteArray
      val c16 = crc16(body, 0, body.length)
      frame.write(c16 >> 8); frame.write(c16 & 0xFF)
      frame.writeTo(out)
      off += n
      frameNo += 1
    }
    out.toByteArray
  }

  private def encodeUtf8Number(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.put(v, 8)
    else if (v < 0x800) {
      w.put(0xC0L | (v >> 6), 8); w.put(0x80L | (v & 0x3F), 8)
    } else if (v < 0x10000) {
      w.put(0xE0L | (v >> 12), 8); w.put(0x80L | ((v >> 6) & 0x3F), 8)
      w.put(0x80L | (v & 0x3F), 8)
    } else {
      w.put(0xF0L | (v >> 18), 8); w.put(0x80L | ((v >> 12) & 0x3F), 8)
      w.put(0x80L | ((v >> 6) & 0x3F), 8); w.put(0x80L | (v & 0x3F), 8)
    }
  }

  private def writeSubframe(w: BitWriter, s: Array[Int], off: Int, n: Int,
                            bps: Int = 16): Unit = {
    // pick the fixed order 0-2 with the smallest residual magnitude
    def resid(order: Int): Array[Long] = {
      val r = new Array[Long](n - order)
      var i = order
      while (i < n) {
        val p = order match {
          case 0 => 0L
          case 1 => s(off + i - 1).toLong
          case _ => 2L * s(off + i - 1) - s(off + i - 2)
        }
        r(i - order) = s(off + i) - p
        i += 1
      }
      r
    }
    val candidates = (0 to math.min(2, n - 1)).map(o => o -> resid(o))
    val (order, res) = candidates.minBy { case (_, r) => r.map(math.abs).sum }
    // rice parameter from the mean absolute residual
    val meanAbs = if (res.isEmpty) 0L else res.map(math.abs).sum / math.max(1, res.length)
    var param = 0
    while ((1L << param) < meanAbs + 1 && param < 14) param += 1
    val maxQ = res.map(v => (zigzag(v) >>> param)).foldLeft(0L)(math.max)
    val mask = (1L << bps) - 1
    if (maxQ > (1 << 16)) { // pathological: verbatim beats runaway unary
      w.put(0, 1); w.put(1, 6); w.put(0, 1) // VERBATIM
      var i = 0
      while (i < n) { w.put(s(off + i).toLong & mask, bps); i += 1 }
      return
    }
    w.put(0, 1); w.put(8 + order, 6); w.put(0, 1) // FIXED(order), no wasted bits
    var i = 0
    while (i < order) { w.put(s(off + i).toLong & mask, bps); i += 1 }
    w.put(0, 2) // residual method 0 (4-bit rice)
    w.put(0, 4) // partition order 0
    w.put(param, 4)
    res.foreach { v =>
      val u = zigzag(v)
      w.putUnary((u >>> param).toInt)
      if (param > 0) w.put(u & ((1L << param) - 1), param)
    }
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
}

package graft.functions

/**
 * Baseline-sequential JPEG codec (ITU-T T.81 / ISO 10918-1, public spec),
 * written so pHash-family signatures over JPEG payloads are BIT-STABLE
 * across JVMs and clusters — the platform `javax.imageio` decoder is not
 * (vendor-specific IDCT/upsampling), which forced round-11 pipelines to
 * transcode JPEGs before image near-dedup. JPEG is the dominant format in
 * any real crawl corpus, so the deterministic path has to cover it.
 *
 * Decoder scope (T.81 Annexes F and G.2):
 *  - SOF0 (baseline) and SOF1 (extended sequential) frames, 8-bit samples,
 *    1-4 components, sampling factors 1-4 (covers 4:4:4 / 4:2:2 / 4:2:0 /
 *    4:1:1), single interleaved scan;
 *  - SOF2 (progressive) frames: multi-scan spectral selection and
 *    successive approximation, DC and AC scans, EOBn run lengths —
 *    decoded natively by [[decodeProgressive]];
 *  - DQT (8- and 16-bit precision), DHT (canonical code build from
 *    BITS/HUFFVAL, T.81 C.2), DRI + RST0-7 restart handling (byte
 *    realign + DC predictor reset, F.2.1.3.1), 0xFF00 byte stuffing,
 *    0xFF fill bytes before markers (B.1.1.2);
 *  - arithmetic-coded / hierarchical / lossless / 12-bit frames are
 *    rejected with null (<1% of crawl JPEGs) — the caller falls back to
 *    ImageIO for pixels (metadata still parses), keeping the documented
 *    determinism boundary explicit.
 *
 * Output is the LUMA plane directly: for YCbCr JPEGs the Y channel IS the
 * BT.601 integer luma this engine's [[ImageKernels.Gray]] contract wants,
 * so chroma blocks are entropy-decoded (the bits are interleaved and must
 * be consumed) but skip dequant/IDCT entirely — half the arithmetic of a
 * full RGB decode on 4:2:0 data, and no chroma upsampling variance can
 * ever leak into a signature.
 *
 * Determinism: everything is integer; the IDCT is a separable fixed-point
 * transform over a 13-bit scaled cosine table built once with
 * `StrictMath` (exactly-specified fdlibm bits on every JVM — the same
 * discipline as the pHash DCT in ImageKernels).
 *
 * The encoder exists for fixtures and round-trip specs: grayscale (one
 * component) or YCbCr with per-axis subsampling, flat-length canonical
 * Huffman tables (valid per C.2, deliberately simple rather than the
 * Annex K defaults — ImageIO-written files exercise the standard-table
 * path in specs), optional restart intervals.
 */
private[graft] object Jpeg {
  import ImageKernels.Gray

  // zigzag order: ZIGZAG(k) = natural index of the k-th zigzag coefficient
  private val ZIGZAG: Array[Int] = {
    val out = new Array[Int](64)
    var k = 0
    var d = 0
    while (d < 15) { // anti-diagonals (x + y = d); even diagonals travel
      // up-right (x ascending: ...,(0,2),(1,1),(2,0),...), odd travel
      // down-left (x descending: (1,0),(0,1)) — T.81 figure 5, the
      // canonical sequence 0, 1, 8, 16, 9, 2, 3, 10, ...
      val range = if (d % 2 == 0) (math.max(0, d - 7) to math.min(d, 7))
                  else (math.min(d, 7) to math.max(0, d - 7) by -1)
      range.foreach { x => val y = d - x; out(k) = y * 8 + x; k += 1 }
      d += 1
    }
    out
  }

  // 13-bit fixed-point IDCT basis: TAB(u*8+x) = round(2^13 * C(u)/2 *
  // cos((2x+1) u pi / 16)), C(0)=1/sqrt(2), C(u>0)=1. Built with
  // StrictMath for cross-JVM bit stability.
  private val IDCT_SCALE_BITS = 13
  private val TAB: Array[Long] = {
    val t = new Array[Long](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = StrictMath.round(
          (1 << IDCT_SCALE_BITS) * (cu / 2.0) *
            StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0))
        x += 1
      }
      u += 1
    }
    t
  }

  // ============================================================= decoding

  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // canonical decode tables per T.81 F.2.2.3: mincode/maxcode/valptr by
    // code length; maxcode = -1 marks lengths with no codes
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val values = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l)
          k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader with 0xFF00 stuffing; stops at any marker. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nBits = 0
    var hitMarker = false

    private def fill(): Unit = {
      while (nBits <= 56 && !hitMarker) {
        if (pos >= b.length) { hitMarker = true; return }
        val v = b(pos) & 0xFF
        if (v == 0xFF) {
          var q = pos + 1
          while (q < b.length && (b(q) & 0xFF) == 0xFF) q += 1 // fill bytes
          if (q < b.length && b(q) == 0) { // stuffed 0xFF data byte
            acc = (acc << 8) | 0xFFL; nBits += 8; pos = q + 1
          } else { hitMarker = true; return } // a real marker: stop here
        } else { acc = (acc << 8) | v; nBits += 8; pos += 1 }
      }
    }

    def bit(): Int = {
      if (nBits == 0) fill()
      if (nBits == 0) return 0 // past the marker: pad with zeros (F.2.2.5)
      nBits -= 1
      ((acc >>> nBits) & 1L).toInt
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and step past an expected RSTn marker. False when the
      * stream is desynced (no restart where one is required). */
    def restart(): Boolean = {
      acc = 0L; nBits = 0; hitMarker = false
      // skip fill bytes, expect FF D0-D7
      while (pos < b.length && (b(pos) & 0xFF) == 0xFF &&
        pos + 1 < b.length && (b(pos + 1) & 0xFF) == 0xFF) pos += 1
      if (pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF) {
        val m = b(pos + 1) & 0xFF
        if (m >= 0xD0 && m <= 0xD7) { pos += 2; return true }
      }
      false
    }

    def decodeHuff(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.values(h.valPtr(l) + code - h.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      -1 // invalid code
    }
  }

  /** T.81 F.2.2.1 EXTEND: map a T-bit magnitude to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Component(id: Int, hs: Int, vs: Int, tq: Int)

  /** Decode a baseline JPEG to its luma plane, or null when the payload is
    * outside the baseline scope (progressive, 12-bit, corrupt, ...). */
  def decode(b: Array[Byte]): Gray = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    try decodeInner(b) catch { case _: Exception => null }
  }

  private def decodeInner(b: Array[Byte]): Gray = {
    val qt = Array.ofDim[Int](4, 64) // zigzag order, as transmitted
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0

    var p = 2
    while (p + 3 < b.length) {
      if ((b(p) & 0xFF) != 0xFF) return null
      while (p + 3 < b.length && (b(p + 1) & 0xFF) == 0xFF) p += 1 // fill bytes
      val marker = b(p + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) { p += 2 }
      else if (marker == 0xD9) return null // EOI before any scan
      else {
        val len = ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
        if (len < 2 || p + 2 + len > b.length) return null
        val seg = p + 4
        val segEnd = p + 2 + len
        marker match {
          case 0xDB => // DQT: one or more tables
            var q = seg
            while (q < segEnd) {
              val pq = (b(q) & 0xFF) >> 4; val tq = b(q) & 0x0F
              if (tq > 3 || pq > 1 || q + 1 + 64 * (pq + 1) > segEnd) return null
              var k = 0
              while (k < 64) {
                qt(tq)(k) =
                  if (pq == 0) b(q + 1 + k) & 0xFF
                  else ((b(q + 1 + 2 * k) & 0xFF) << 8) | (b(q + 2 + 2 * k) & 0xFF)
                k += 1
              }
              q += 1 + 64 * (pq + 1)
            }
          case 0xC4 => // DHT: one or more tables
            var q = seg
            while (q < segEnd) {
              val tc = (b(q) & 0xFF) >> 4; val th = b(q) & 0x0F
              if (tc > 1 || th > 3 || q + 17 > segEnd) return null
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = b(q + l) & 0xFF; total += bits(l); l += 1 }
              if (total > 256 || q + 17 + total > segEnd) return null
              val vals = new Array[Int](total)
              var i = 0
              while (i < total) { vals(i) = b(q + 17 + i) & 0xFF; i += 1 }
              val t = new Huff(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + total
            }
          case 0xC0 | 0xC1 => // SOF0 / SOF1
            if (b(seg) != 8) return null // sample precision
            h = ((b(seg + 1) & 0xFF) << 8) | (b(seg + 2) & 0xFF)
            w = ((b(seg + 3) & 0xFF) << 8) | (b(seg + 4) & 0xFF)
            val nf = b(seg + 5) & 0xFF
            if (w <= 0 || h <= 0 || nf < 1 || nf > 4 || seg + 6 + nf * 3 > segEnd) return null
            comps = Array.tabulate(nf) { i =>
              val c = seg + 6 + i * 3
              val hv = b(c + 1) & 0xFF
              Component(b(c) & 0xFF, hv >> 4, hv & 0x0F, b(c + 2) & 0x0F)
            }
            if (comps.exists(c => c.hs < 1 || c.hs > 4 || c.vs < 1 || c.vs > 4 || c.tq > 3))
              return null
          case 0xC2 =>
            // progressive DCT: its multi-scan state machine lives apart
            // from the single-scan baseline path
            return decodeProgressive(b)
          case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return null // lossless / arithmetic / differential: out of scope
          case 0xDD => // DRI
            restartInterval = ((b(seg) & 0xFF) << 8) | (b(seg + 1) & 0xFF)
          case 0xDA => // SOS: decode the (single, interleaved) scan
            if (comps == null) return null
            val ns = b(seg) & 0xFF
            if (ns != comps.length || seg + 1 + ns * 2 + 3 > segEnd) return null
            val scanDc = new Array[Huff](ns)
            val scanAc = new Array[Huff](ns)
            var i = 0
            while (i < ns) {
              val cs = b(seg + 1 + i * 2) & 0xFF
              val tt = b(seg + 2 + i * 2) & 0xFF
              val ci = comps.indexWhere(_.id == cs)
              if (ci != i) return null // interleaved scan in frame order only
              scanDc(i) = dcTabs(tt >> 4)
              scanAc(i) = acTabs(tt & 0x0F)
              if (scanDc(i) == null || scanAc(i) == null) return null
              i += 1
            }
            return decodeScan(b, segEnd, comps, qt, scanDc, scanAc, w, h, restartInterval)
          case _ => () // APPn / COM / others: skip
        }
        p = segEnd
      }
    }
    null
  }

  /** Entropy-decode the interleaved scan; IDCT only the luma component. */
  private def decodeScan(b: Array[Byte], start: Int, comps: Array[Component],
                         qt: Array[Array[Int]], scanDc: Array[Huff], scanAc: Array[Huff],
                         w: Int, h: Int, restartInterval: Int): Gray = {
    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // 100 TB discipline: one corrupt/hostile row must not OOM an executor.
    // Dimensions are 16-bit so the plane is bounded, but still cap the
    // decode surface (a 65535x65535 "image" would be a 4 GiB allocation).
    if (w.toLong * h > (1L << 26)) return null // 64 Mpx cap per payload
    val luma = comps(0)
    val planeW = mcusX * 8 * luma.hs
    val planeH = mcusY * 8 * luma.vs
    val plane = new Array[Int](planeW * planeH)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64) // natural order, dequantized
    val tmp = new Array[Long](64)
    val r = new BitReader(b, start)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.restart()) return null
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val isLuma = ci == 0
        val q = qt(c.tq)
        var by = 0
        while (by < c.vs) {
          var bx = 0
          while (bx < c.hs) {
            // ---- one 8x8 block (T.81 F.2.2)
            if (isLuma) java.util.Arrays.fill(coef, 0)
            val t = r.decodeHuff(scanDc(ci))
            if (t < 0 || t > 15) return null
            val diff = extend(r.bits(t), t)
            pred(ci) += diff
            if (isLuma) coef(0) = pred(ci) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = r.decodeHuff(scanAc(ci))
              if (rs < 0) return null
              val run = rs >> 4
              val size = rs & 0x0F
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += run
                if (k > 63) return null
                if (isLuma) coef(ZIGZAG(k)) = extend(r.bits(size), size) * q(k)
                else r.bits(size) // consume; chroma never touches a signature
                k += 1
              }
            }
            if (isLuma)
              idctInto(coef, tmp, plane, planeW,
                (my * c.vs + by) * 8, (mx * c.hs + bx) * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    assemblePlane(plane, planeW, planeH, w, h, luma, hMax, vMax)
  }

  // ================================================ progressive (Annex G)

  /** Progressive DCT decode (SOF2): multi-scan spectral-selection /
    * successive-approximation refinement per T.81 Annex G. Only the LUMA
    * coefficient plane is buffered (chroma DC scans are consumed; chroma
    * AC scans — always single-component — are skipped at the byte level);
    * after the last scan the accumulated coefficients dequantize and IDCT
    * exactly like the baseline path, so signatures stay bit-stable. */
  private def decodeProgressive(b: Array[Byte]): Gray = {
    val qt = Array.ofDim[Int](4, 64)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var coefs: Array[Int] = null // luma plane, block-raster × 64 zigzag
    var blocksW = 0; var blocksH = 0
    var hMax = 1; var vMax = 1
    var mcusX = 0; var mcusY = 0
    var sawEoi = false

    var p = 2
    while (!sawEoi && p + 3 < b.length) {
      if ((b(p) & 0xFF) != 0xFF) return null
      while (p + 3 < b.length && (b(p + 1) & 0xFF) == 0xFF) p += 1
      val marker = b(p + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) p += 2
      else if (marker == 0xD9) sawEoi = true
      else {
        val len = ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
        if (len < 2 || p + 2 + len > b.length) return null
        val seg = p + 4
        val segEnd = p + 2 + len
        marker match {
          case 0xDB =>
            var q = seg
            while (q < segEnd) {
              val pq = (b(q) & 0xFF) >> 4; val tq = b(q) & 0x0F
              if (tq > 3 || pq > 1 || q + 1 + 64 * (pq + 1) > segEnd) return null
              var k = 0
              while (k < 64) {
                qt(tq)(k) =
                  if (pq == 0) b(q + 1 + k) & 0xFF
                  else ((b(q + 1 + 2 * k) & 0xFF) << 8) | (b(q + 2 + 2 * k) & 0xFF)
                k += 1
              }
              q += 1 + 64 * (pq + 1)
            }
          case 0xC4 =>
            var q = seg
            while (q < segEnd) {
              val tc = (b(q) & 0xFF) >> 4; val th = b(q) & 0x0F
              if (tc > 1 || th > 3 || q + 17 > segEnd) return null
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = b(q + l) & 0xFF; total += bits(l); l += 1 }
              if (total > 256 || q + 17 + total > segEnd) return null
              val vals = new Array[Int](total)
              var i = 0
              while (i < total) { vals(i) = b(q + 17 + i) & 0xFF; i += 1 }
              val t = new Huff(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + total
            }
          case 0xC2 =>
            if (b(seg) != 8) return null
            h = ((b(seg + 1) & 0xFF) << 8) | (b(seg + 2) & 0xFF)
            w = ((b(seg + 3) & 0xFF) << 8) | (b(seg + 4) & 0xFF)
            val nf = b(seg + 5) & 0xFF
            if (w <= 0 || h <= 0 || nf < 1 || nf > 4 || seg + 6 + nf * 3 > segEnd) return null
            // tighter cap than baseline: progressive buffers the whole
            // luma COEFFICIENT plane (4 bytes/px)
            if (w.toLong * h > (1L << 24)) return null
            comps = Array.tabulate(nf) { i =>
              val c = seg + 6 + i * 3
              val hv = b(c + 1) & 0xFF
              Component(b(c) & 0xFF, hv >> 4, hv & 0x0F, b(c + 2) & 0x0F)
            }
            if (comps.exists(c => c.hs < 1 || c.hs > 4 || c.vs < 1 || c.vs > 4 || c.tq > 3))
              return null
            hMax = comps.map(_.hs).max; vMax = comps.map(_.vs).max
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            blocksW = mcusX * comps(0).hs
            blocksH = mcusY * comps(0).vs
            coefs = new Array[Int](blocksW * blocksH * 64)
          case 0xDD =>
            restartInterval = ((b(seg) & 0xFF) << 8) | (b(seg + 1) & 0xFF)
          case 0xDA =>
            if (comps == null || coefs == null) return null
            p = decodeProgScan(b, seg, segEnd, comps, dcTabs, acTabs,
              coefs, blocksW, blocksH, mcusX, mcusY, w, h, restartInterval)
            if (p < 0) return null
          case _ => ()
        }
        if (marker != 0xDA) p = segEnd
      }
    }
    if (coefs == null) return null

    // dequantize + IDCT the accumulated luma plane
    val luma = comps(0)
    val q = qt(luma.tq)
    val planeW = blocksW * 8
    val planeH = blocksH * 8
    val plane = new Array[Int](planeW * planeH)
    val nat = new Array[Int](64)
    val tmp = new Array[Long](64)
    var by = 0
    while (by < blocksH) {
      var bx = 0
      while (bx < blocksW) {
        val off = (by * blocksW + bx) * 64
        var k = 0
        while (k < 64) { nat(ZIGZAG(k)) = coefs(off + k) * q(k); k += 1 }
        idctInto(nat, tmp, plane, planeW, by * 8, bx * 8)
        bx += 1
      }
      by += 1
    }
    assemblePlane(plane, planeW, planeH, w, h, luma, hMax, vMax)
  }

  /** One progressive scan. Returns the byte offset of the next marker, or
    * -1 on a malformed scan. */
  private def decodeProgScan(b: Array[Byte], seg: Int, segEnd: Int,
                             comps: Array[Component],
                             dcTabs: Array[Huff], acTabs: Array[Huff],
                             coefs: Array[Int], blocksW: Int, blocksH: Int,
                             mcusX: Int, mcusY: Int, w: Int, h: Int,
                             restartInterval: Int): Int = {
    val ns = b(seg) & 0xFF
    if (seg + 1 + ns * 2 + 3 > segEnd) return -1
    val scanComp = new Array[Int](ns)
    val scanDc = new Array[Huff](ns)
    val scanAc = new Array[Huff](ns)
    var i = 0
    while (i < ns) {
      val cs = b(seg + 1 + i * 2) & 0xFF
      val tt = b(seg + 2 + i * 2) & 0xFF
      val ci = comps.indexWhere(_.id == cs)
      if (ci < 0) return -1
      scanComp(i) = ci
      scanDc(i) = dcTabs(tt >> 4)
      scanAc(i) = acTabs(tt & 0x0F)
      i += 1
    }
    val ss = b(seg + 1 + ns * 2) & 0xFF
    val se = b(seg + 2 + ns * 2) & 0xFF
    val a = b(seg + 3 + ns * 2) & 0xFF
    val ah = a >> 4; val al = a & 0x0F
    if (ss > 63 || se > 63 || se < ss) return -1
    val dataStart = segEnd

    def nextMarker(from: Int): Int = {
      var q = from
      while (q + 1 < b.length) {
        if ((b(q) & 0xFF) == 0xFF) {
          val m = b(q + 1) & 0xFF
          if (m != 0 && m != 0xFF && !(m >= 0xD0 && m <= 0xD7)) return q
        }
        q += 1
      }
      b.length
    }

    if (ss == 0) {
      // DC scan (interleaved or single-component); Se must be 0
      if (se != 0) return -1
      if (ah == 0 && scanDc.exists(_ == null)) return -1
      val r = new BitReader(b, dataStart)
      val pred = new Array[Int](ns)
      if (ns > 1) {
        val nMcus = mcusX * mcusY
        var mcu = 0
        while (mcu < nMcus) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            if (!r.restart()) return -1
            java.util.Arrays.fill(pred, 0)
          }
          val mx = mcu % mcusX; val my = mcu / mcusX
          var si = 0
          while (si < ns) {
            val c = comps(scanComp(si))
            val isLuma = scanComp(si) == 0
            var byy = 0
            while (byy < c.vs) {
              var bxx = 0
              while (bxx < c.hs) {
                if (ah == 0) {
                  val t = r.decodeHuff(scanDc(si))
                  if (t < 0 || t > 15) return -1
                  pred(si) += extend(r.bits(t), t)
                  if (isLuma) {
                    val off = ((my * c.vs + byy) * blocksW + (mx * c.hs + bxx)) * 64
                    coefs(off) = pred(si) << al
                  }
                } else {
                  val bit = r.bit()
                  if (isLuma && bit == 1) {
                    val off = ((my * c.vs + byy) * blocksW + (mx * c.hs + bxx)) * 64
                    coefs(off) |= (1 << al)
                  }
                }
                bxx += 1
              }
              byy += 1
            }
            si += 1
          }
          mcu += 1
        }
      } else {
        val c = comps(scanComp(0))
        val isLuma = scanComp(0) == 0
        if (!isLuma) return nextMarker(dataStart) // consumed implicitly
        // non-interleaved scans cover the component's OWN block grid
        // (ceil(compW/8) × ceil(compH/8)) — NOT the MCU-padded plane
        val hM = comps.map(_.hs).max; val vM = comps.map(_.vs).max
        val cw = (w * c.hs + hM - 1) / hM
        val chh = (h * c.vs + vM - 1) / vM
        val nbx = (cw + 7) / 8
        val nby = (chh + 7) / 8
        var blk = 0
        val total = nbx * nby
        while (blk < total) {
          if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
            if (!r.restart()) return -1
            java.util.Arrays.fill(pred, 0)
          }
          val off = ((blk / nbx) * blocksW + (blk % nbx)) * 64
          if (ah == 0) {
            val t = r.decodeHuff(scanDc(0))
            if (t < 0 || t > 15) return -1
            pred(0) += extend(r.bits(t), t)
            coefs(off) = pred(0) << al
          } else if (r.bit() == 1) coefs(off) |= (1 << al)
          blk += 1
        }
      }
      nextMarker(r.pos)
    } else {
      // AC scan: always single-component in progressive
      if (ns != 1) return -1
      if (scanComp(0) != 0) return nextMarker(dataStart) // chroma: skip bytes
      val ac = scanAc(0)
      if (ac == null) return -1
      val c = comps(0)
      // component-grid block count, as in the DC non-interleaved path
      val hM = comps.map(_.hs).max; val vM = comps.map(_.vs).max
      val cw = (w * c.hs + hM - 1) / hM
      val chh = (h * c.vs + vM - 1) / vM
      val nbx = (cw + 7) / 8
      val nby = (chh + 7) / 8
      val r = new BitReader(b, dataStart)
      var eobrun = 0L
      var blk = 0
      val total = nbx * nby
      while (blk < total) {
        if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
          if (!r.restart()) return -1
          eobrun = 0L
        }
        val off = ((blk / nbx) * blocksW + (blk % nbx)) * 64
        if (ah == 0) {
          // first AC pass (G.1.2.2)
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var done = false
            while (k <= se && !done) {
              val rs = r.decodeHuff(ac)
              if (rs < 0) return -1
              val run = rs >> 4; val size = rs & 15
              if (size == 0) {
                if (run == 15) k += 16
                else { eobrun = (1L << run) - 1 + (if (run > 0) r.bits(run) else 0); done = true }
              } else {
                k += run
                if (k > se) return -1
                coefs(off + k) = extend(r.bits(size), size) << al
                k += 1
              }
            }
          }
        } else {
          // AC refinement pass (G.1.2.3)
          val p1 = 1 << al
          var k = ss
          if (eobrun == 0) {
            var done = false
            while (k <= se && !done) {
              val rs = r.decodeHuff(ac)
              if (rs < 0) return -1
              val run = rs >> 4; val size = rs & 15
              var newVal = 0
              if (size == 0) {
                if (run < 15) {
                  eobrun = (1L << run) + (if (run > 0) r.bits(run) else 0)
                  done = true
                }
                // run == 15: ZRL — pass over 16 zero-history coeffs
              } else {
                if (size != 1) return -1
                newVal = if (r.bit() == 1) p1 else -p1
              }
              if (!done) {
                // G.1.2.3 traversal: consume `slots` zero-HISTORY
                // coefficients (depositing the new value in the last one
                // when S=1); nonzero-history coefficients encountered on
                // the way read a correction bit and do not count
                var slots = if (size == 0) 16 else run + 1
                while (k <= se && slots > 0) {
                  val cv = coefs(off + k)
                  if (cv != 0) {
                    if (r.bit() == 1 && (cv & p1) == 0)
                      coefs(off + k) = cv + (if (cv >= 0) p1 else -p1)
                  } else {
                    slots -= 1
                    if (slots == 0 && newVal != 0) coefs(off + k) = newVal
                  }
                  k += 1
                }
              }
            }
          }
          if (eobrun > 0) {
            while (k <= se) {
              val cv = coefs(off + k)
              if (cv != 0 && r.bit() == 1 && (cv & p1) == 0)
                coefs(off + k) = cv + (if (cv >= 0) p1 else -p1)
              k += 1
            }
            eobrun -= 1
          }
        }
        blk += 1
      }
      nextMarker(r.pos)
    }
  }

  /** Crop the MCU-padded decoded plane to image dimensions (replicating
    * when the luma component is itself subsampled — exotic but legal). */
  private def assemblePlane(plane: Array[Int], planeW: Int, planeH: Int,
                            w: Int, h: Int, luma: Component,
                            hMax: Int, vMax: Int): Gray = {
    val lw = (w * luma.hs + hMax - 1) / hMax
    val lh = (h * luma.vs + vMax - 1) / vMax
    if (lw == w && lh == h) {
      if (planeW == w && planeH == h) Gray(w, h, plane)
      else {
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          System.arraycopy(plane, y * planeW, px, y * w, w)
          y += 1
        }
        Gray(w, h, px)
      }
    } else {
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val sy = math.min(y * luma.vs / vMax, lh - 1)
        var x = 0
        while (x < w) {
          px(y * w + x) = plane(sy * planeW + math.min(x * luma.hs / hMax, lw - 1))
          x += 1
        }
        y += 1
      }
      Gray(w, h, px)
    }
  }

  /** Separable fixed-point 8x8 IDCT + level shift + clamp, written into
    * `plane` at (row0, col0). Scale bookkeeping: TAB carries C(u)/2 at
    * 2^13, so after both passes the result is scaled by 2^26 (the 1/4 of
    * the 2D IDCT is absorbed by the two /2 factors). */
  private def idctInto(coef: Array[Int], tmp: Array[Long],
                       plane: Array[Int], planeW: Int, row0: Int, col0: Int): Unit = {
    // row pass: tmp(v, x) = sum_u coef(v, u) * TAB(u, x)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0L
        var u = 0
        while (u < 8) { s += coef(v * 8 + u) * TAB(u * 8 + x); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    // column pass + descale + level shift
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0L
        var vv = 0
        while (vv < 8) { s += tmp(vv * 8 + x) * TAB(vv * 8 + y); vv += 1 }
        val value = 128 + ((s + (1L << (2 * IDCT_SCALE_BITS - 1))) >> (2 * IDCT_SCALE_BITS)).toInt
        plane((row0 + y) * planeW + (col0 + x)) =
          if (value < 0) 0 else if (value > 255) 255 else value
        y += 1
      }
      x += 1
    }
  }

  // ============================================================= encoding

  /** Forward-DCT basis: FTAB(u*8+x) = TAB(u*8+x) (the DCT-II matrix is the
    * transpose of the IDCT basis with the same normalization). */
  private def fdctCoef(px: Array[Int]): Array[Int] = {
    val tmp = new Array[Long](64)
    // F(u, v) = (1/4) C(u)C(v) sum_x sum_y f(x,y) cos.. — two passes with
    // the same table, reading it transposed
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0L
        var x = 0
        while (x < 8) { s += (px(y * 8 + x) - 128) * TAB(u * 8 + x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var vv = 0
      while (vv < 8) {
        var s = 0L
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * TAB(vv * 8 + yy); yy += 1 }
        // same normalization as the inverse: TAB carries C/2 at 2^13 per
        // axis, so the double product is 2^26 * F(u,v)
        out(vv * 8 + u) = ((s + (1L << (2 * IDCT_SCALE_BITS - 1))) >> (2 * IDCT_SCALE_BITS)).toInt
        vv += 1
      }
      u += 1
    }
    out
  }

  /** Near-flat canonical Huffman: symbols 0..n-1 assigned in canonical
    * code order starting at the minimal length L with 2^L >= n+1,
    * spilling to longer lengths where a DHT constraint binds (BITS are
    * single bytes, so <= 255 codes per length; at least one slot is left
    * free per length so the code can extend and the all-ones max-length
    * code stays unassigned). Returns (bits, vals, codeOf, lenOf). */
  private def flatTable(n: Int): (Array[Int], Array[Int], Array[Int], Array[Int]) = {
    val bits = new Array[Int](17)
    val codes = new Array[Int](n)
    val lens = new Array[Int](n)
    var l = 1
    while ((1 << l) < n + 1) l += 1
    var remaining = n
    var code = 0
    var idx = 0
    while (remaining > 0) {
      require(l <= 16, s"flatTable: $n symbols do not fit 16-bit codes")
      val capacity = (1 << l) - code
      val take = math.min(remaining, math.min(255, capacity - 1))
      bits(l) = take
      var i = 0
      while (i < take) { codes(idx) = code; lens(idx) = l; code += 1; idx += 1; i += 1 }
      remaining -= take
      code <<= 1
      l += 1
    }
    (bits, Array.tabulate(n)(identity), codes, lens)
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = { // pad with 1s (T.81 F.1.2.3)
      if (n > 0) put(0x7F, 8 - n)
    }
  }

  private def category(v: Int): Int = {
    var t = 0
    var a = math.abs(v)
    while (a > 0) { t += 1; a >>= 1 }
    t
  }

  /** Encode planes as a baseline JPEG. `planes(i)` is (samples, sw, sh,
    * hs, vs): already-subsampled component data. Quant table `quant` is
    * shared by all components (zigzag order). */
  private def encodePlanes(planes: Array[(Array[Int], Int, Int, Int, Int)],
                           w: Int, h: Int, quant: Array[Int],
                           restartEvery: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8)
    // DQT
    marker(0xDB); u16(2 + 1 + 64); u8(0)
    quant.foreach(u8)
    // SOF0
    marker(0xC0); u16(8 + 3 * planes.length); u8(8); u16(h); u16(w); u8(planes.length)
    planes.zipWithIndex.foreach { case ((_, _, _, hs, vs), i) =>
      u8(i + 1); u8((hs << 4) | vs); u8(0)
    }
    // DHT: flat DC (12 categories) + near-flat AC (256 symbols)
    val (dcBits, dcVals, dcCodes, dcLens) = flatTable(12)
    val (acBits, acVals, acCodes, acLens) = flatTable(256)
    marker(0xC4); u16(2 + 17 + dcVals.length); u8(0x00)
    (1 to 16).foreach(l => u8(dcBits(l))); dcVals.foreach(u8)
    marker(0xC4); u16(2 + 17 + acVals.length); u8(0x10)
    (1 to 16).foreach(l => u8(acBits(l))); acVals.foreach(u8)
    if (restartEvery > 0) { marker(0xDD); u16(4); u16(restartEvery) }
    // SOS
    marker(0xDA); u16(6 + 2 * planes.length); u8(planes.length)
    planes.indices.foreach { i => u8(i + 1); u8(0x00) }
    u8(0); u8(63); u8(0)

    val hMax = planes.map(_._4).max
    val vMax = planes.map(_._5).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val bw = new BitWriter(out)
    val pred = new Array[Int](planes.length)
    val block = new Array[Int](64)
    var mcu = 0
    var rst = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
        bw.flush(); marker(0xD0 + (rst & 7)); rst += 1
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < planes.length) {
        val (samples, sw, sh, hs, vs) = planes(ci)
        var by = 0
        while (by < vs) {
          var bx = 0
          while (bx < hs) {
            // gather the 8x8 block, edge-replicated
            var yy = 0
            while (yy < 8) {
              val sy = math.min((my * vs + by) * 8 + yy, sh - 1)
              var xx = 0
              while (xx < 8) {
                val sx = math.min((mx * hs + bx) * 8 + xx, sw - 1)
                block(yy * 8 + xx) = samples(sy * sw + sx)
                xx += 1
              }
              yy += 1
            }
            val f = fdctCoef(block)
            // quantize in zigzag order
            var k = 0
            val zz = new Array[Int](64)
            while (k < 64) {
              val c = f(ZIGZAG(k))
              val q = quant(k)
              zz(k) = if (c >= 0) (c + q / 2) / q else -((-c + q / 2) / q)
              k += 1
            }
            val diff = zz(0) - pred(ci)
            pred(ci) = zz(0)
            val t = category(diff)
            bw.put(dcCodes(t), dcLens(t))
            if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
            var last = 63
            while (last > 0 && zz(last) == 0) last -= 1
            k = 1
            while (k <= last) {
              var run = 0
              while (zz(k) == 0) { run += 1; k += 1 }
              while (run >= 16) { bw.put(acCodes(0xF0), acLens(0xF0)); run -= 16 }
              val s = category(zz(k))
              val rs = (run << 4) | s
              bw.put(acCodes(rs), acLens(rs))
              bw.put(if (zz(k) >= 0) zz(k) else zz(k) + (1 << s) - 1, s)
              k += 1
            }
            if (last < 63) bw.put(acCodes(0x00), acLens(0x00)) // EOB
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    bw.flush()
    marker(0xD9)
    out.toByteArray
  }

  /** Near-lossless flat quant table (all 1s) for round-trip specs. */
  val FlatQuant: Array[Int] = Array.fill(64)(1)

  /** The T.81 Annex K.1 example luminance table (natural order here,
    * zigzag-reordered below as transmitted) — the "typical" table real
    * encoders scale; used by fixtures for realistic coefficient spectra. */
  val StdQuant: Array[Int] = {
    val natural = Array(
      16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99)
    Array.tabulate(64)(k => natural(ZIGZAG(k)))
  }

  /** Encode a grayscale image (single component, no subsampling). */
  def encodeGray(w: Int, h: Int, px: Array[Int],
                 quant: Array[Int] = FlatQuant, restartEvery: Int = 0): Array[Byte] =
    encodePlanes(Array((px, w, h, 1, 1)), w, h, quant, restartEvery)

  /** Encode a grayscale source as a 3-component YCbCr 4:2:0 JPEG (chroma
    * planes neutral 128): exercises the interleaved-MCU + subsampled
    * decode path with a known luma. */
  def encodeYcc420(w: Int, h: Int, px: Array[Int],
                   quant: Array[Int] = FlatQuant, restartEvery: Int = 0): Array[Byte] = {
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val neutral = Array.fill(cw * ch)(128)
    encodePlanes(Array((px, w, h, 2, 2), (neutral, cw, ch, 1, 1), (neutral, cw, ch, 1, 1)),
      w, h, quant, restartEvery)
  }
}

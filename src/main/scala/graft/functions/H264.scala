package graft.functions

/** Native H.264 (AVC) I-frame decoder — the avc1 face of the video
  * tier, closing the dominant-crawl-codec gap: real-world MP4 video is
  * overwhelmingly avc1, and before this path such files yielded zero
  * frames silently. Scope mirrors the VP8 face: IDR keyframes only
  * (what the near-dup vote consumes), 4:2:0, I_PCM / I_16x16 / I_4x4
  * macroblocks with all intra prediction modes, exact integer inverse
  * transforms (spec 8.5), in-loop deblocking (spec 8.7), and BOTH
  * entropy layers: baseline CAVLC (clause 9.2) and Main-profile
  * I-slice CABAC (clause 9.3 — the x264-default entropy mode, so
  * genuine crawl MP4 decodes). High-profile streams decode when they
  * use none of the High-only coding tools (no 8x8 transform, no
  * scaling matrices, no split Cr offset — parsePps fails closed on
  * each).
  *
  * Implemented from the PUBLIC ITU-T Rec. H.264 specification. CAVLC
  * code tables and CABAC state/init tables ride in [[H264Tables]]
  * (generated, provenance documented there and in
  * tools/h264_tables.py; the CABAC context-init priors are a
  * best-effort transcription this environment cannot re-verify — the
  * engine, binarizations and context derivations carry no such
  * caveat). Correctness anchors: the independent Python spec
  * implementation in tools/h264_codec.py must reproduce every decode
  * bit-exactly (H264Spec), and the q_video_frames_h264 gates pin
  * decoded-frame pHashes against the SAME pattern content decoded
  * through the unrelated JPEG/PNG image path.
  *
  * Totality: every entry point returns null on hostile/unsupported
  * bytes (non-4:2:0, truncations, corrupt VLC/arithmetic state) —
  * never throws, never allocates from untrusted length fields beyond
  * sane caps.
  */
object H264 {

  final case class Frame(w: Int, h: Int,
                         y: Array[Int], u: Array[Int], v: Array[Int])

  private final class Abort extends RuntimeException(null, null, false, false)
  private def abort(): Nothing = throw new Abort

  // ------------------------------------------------------------ bit io

  private final class Reader(val data: Array[Byte]) {
    var pos = 0
    /** Bit index of the final set bit — the rbsp_stop_bit; slice data
      * ends when pos reaches it (more_rbsp_data()). */
    val lastOneBit: Int = {
      var i = data.length - 1
      var r = 0
      var found = false
      while (i >= 0 && !found) {
        if (data(i) != 0) {
          var k = 0
          while (k < 8 && !found) {
            if ((data(i) & (1 << k)) != 0) { r = i * 8 + (7 - k); found = true }
            k += 1
          }
        }
        i -= 1
      }
      r
    }
    def bit(): Int = {
      if ((pos >> 3) >= data.length) abort()
      val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (bit() == 0) { zeros += 1; if (zeros > 31) abort() }
      (1 << zeros) - 1 + (if (zeros > 0) u(zeros) else 0)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
    def align(): Unit = while (pos % 8 != 0) pos += 1
  }

  /** VLC decode against a flat (len, code, symbol) table sorted by
    * (len, code): read bits until a (len, code) pair matches. */
  private def vlc(r: Reader, flat: Array[Int], maxLen: Int): Int = {
    var len = 0
    var code = 0
    while (len < maxLen) {
      code = (code << 1) | r.bit()
      len += 1
      var i = 0
      while (i < flat.length && flat(i) <= len) {
        if (flat(i) == len && flat(i + 1) == code) return flat(i + 2)
        i += 3
      }
    }
    abort()
  }

  // --------------------------------------------------------------- NAL

  /** Annex-B start-code scan: (nal_unit_type, de-escaped RBSP incl. the
    * NAL header byte stripped). */
  private[functions] def splitNals(b: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var i = 0
    val n = b.length
    while (i + 3 < n && out.length < 64) {
      if (b(i) == 0 && b(i + 1) == 0 &&
        (b(i + 2) == 1 || (b(i + 2) == 0 && i + 4 <= n && b(i + 3) == 1))) {
        val start = i + (if (b(i + 2) == 1) 3 else 4)
        var j = start
        while (j + 2 < n && !(b(j) == 0 && b(j + 1) == 0 &&
          (b(j + 2) == 0 || b(j + 2) == 1))) j += 1
        val end = if (j + 2 < n) j else n
        if (end > start) out += ((b(start) & 0x1F, unescape(b, start, end)))
        i = end
      } else i += 1
    }
    out.toSeq
  }

  /** Strip emulation_prevention_three_byte; drops the NAL header byte. */
  private[functions] def unescape(b: Array[Byte], start: Int, end: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(end - start)
    var zeros = 0
    var i = start + 1
    while (i < end) {
      val v = b(i) & 0xFF
      if (zeros >= 2 && v == 3) zeros = 0
      else {
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  // --------------------------------------------------- parameter sets

  private final case class Sps(w: Int, h: Int,
                               cropL: Int, cropT: Int, cropR: Int, cropB: Int,
                               log2MaxFrameNum: Int,
                               pocType: Int, log2MaxPocLsb: Int)
  private final case class Pps(qp: Int, chromaOff: Int, deblockCtl: Boolean,
                               picOrder: Boolean, cabac: Boolean)

  private def parseSps(rbsp: Array[Byte]): Sps = {
    val r = new Reader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    r.u(8) // level
    if (r.ue() != 0) abort() // sps_id
    if (profile == 100 || profile == 110 || profile == 122 || profile == 244 ||
      profile == 44 || profile == 83 || profile == 86 || profile == 118 ||
      profile == 128) {
      if (r.ue() != 1) abort() // chroma_format_idc must be 4:2:0
      if (r.ue() != 0 || r.ue() != 0) abort() // bit depths
      r.u(1) // qpprime_y_zero_transform_bypass
      if (r.u(1) != 0) abort() // seq_scaling_matrix_present
    }
    val log2MaxFrameNum = r.ue() + 4
    val poc = r.ue()
    // POC type 0 puts pic_order_cnt_lsb in every slice header — the
    // slice parse must consume it (log2MaxPocLsb threads through Sps)
    var log2MaxPocLsb = 0
    if (poc == 0) log2MaxPocLsb = r.ue() + 4
    else if (poc == 1) abort() // exotic; out of scope
    if (log2MaxPocLsb > 16) abort()
    r.ue() // max_num_ref_frames
    r.u(1)
    val wmb = r.ue() + 1
    val hmb = r.ue() + 1
    if (wmb <= 0 || hmb <= 0 || wmb > 512 || hmb > 512) abort()
    // hard absolute pixel cap (2^24 px = 65536 MBs, comfortably past 4K)
    // BEFORE any frame-context allocation from these untrusted fields
    if (wmb.toLong * hmb > 65536L) abort()
    if (r.u(1) != 1) abort() // frame_mbs_only required
    r.u(1) // direct_8x8_inference
    var cropL = 0; var cropT = 0; var cropR = 0; var cropB = 0
    if (r.u(1) == 1) { // frame_cropping; CropUnit 2 for 4:2:0 frames
      cropL = r.ue() * 2; cropR = r.ue() * 2
      cropT = r.ue() * 2; cropB = r.ue() * 2
    }
    Sps(wmb * 16, hmb * 16, cropL, cropT, cropR, cropB, log2MaxFrameNum,
      poc, log2MaxPocLsb)
  }

  private def parsePps(rbsp: Array[Byte]): Pps = {
    val r = new Reader(rbsp)
    if (r.ue() != 0 || r.ue() != 0) abort() // pps_id / sps_id
    val cabac = r.u(1) == 1 // entropy_coding_mode_flag
    val picOrder = r.u(1) == 1 // bottom_field_pic_order_in_frame_present
    if (r.ue() != 0) abort() // slice groups out of scope
    r.ue(); r.ue(); r.u(1); r.u(2)
    val qp = 26 + r.se()
    r.se() // qs
    val chromaOff = r.se()
    val dbc = r.u(1) == 1
    r.u(1) // constrained_intra_pred (I-only decode: no behavior change)
    // redundant slices put redundant_pic_cnt in every slice header,
    // which this decoder does not consume — fail closed like the other
    // out-of-scope features (slice groups, POC type 1)
    if (r.u(1) != 0) abort()
    // High-profile PPS extension (more_rbsp_data after the baseline
    // fields): 8x8 transforms and scaling matrices change the slice
    // syntax and the dequant — fail closed; a distinct Cr offset would
    // silently split qpc, so only accept it when equal to the Cb one
    if (r.pos < r.lastOneBit) {
      if (r.u(1) != 0) abort() // transform_8x8_mode_flag
      if (r.u(1) != 0) abort() // pic_scaling_matrix_present_flag
      if (r.se() != chromaOff) abort() // second_chroma_qp_index_offset
    }
    if (qp < 0 || qp > 51) abort()
    Pps(qp, chromaOff, dbc, picOrder, cabac)
  }

  // --------------------------------------------------- tables & maths

  private val ZIGZAG = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val CBP_INTRA = Array(47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14,
    39, 43, 45, 46, 16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2,
    4, 8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  private val QUANT_V = Array(Array(10, 16, 13), Array(11, 18, 14),
    Array(13, 20, 16), Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
  private val QPC_MAP = Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36,
    37, 37, 37, 38, 38, 38, 39, 39, 39, 39)
  private val DB_ALPHA = Array.fill(16)(0) ++ Array(4, 4, 5, 6, 7, 8, 9, 10,
    12, 13, 15, 17, 20, 22, 25, 28, 32, 36, 40, 45, 50, 56, 63, 71, 80, 90,
    101, 113, 127, 144, 162, 182, 203, 226, 255, 255)
  private val DB_BETA = Array.fill(16)(0) ++ Array(2, 2, 2, 3, 3, 3, 3, 4, 4,
    4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15,
    15, 16, 16, 17, 17, 18, 18)
  private val DB_TC0 = Array(
    Array.fill(16)(0) ++ Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1,
      1, 1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13),
    Array.fill(16)(0) ++ Array(0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1,
      1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 5, 6, 6, 7, 8, 8, 10, 11, 12, 13, 17),
    Array.fill(16)(0) ++ Array(0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2,
      2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 23))

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v
  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v
  @inline private def vpos(i: Int, j: Int): Int =
    if ((i & 1) == 0 && (j & 1) == 0) 0 else if ((i & 1) == 1 && (j & 1) == 1) 1 else 2
  @inline private def dequantAc(z: Int, qp: Int, i: Int, j: Int): Int =
    (z * QUANT_V(qp % 6)(vpos(i, j))) << (qp / 6)
  private def dequantLumaDc(f: Int, qp: Int): Int = {
    val ls = 16 * QUANT_V(qp % 6)(0)
    if (qp >= 36) (f * ls) << (qp / 6 - 6)
    else (f * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }
  @inline private def dequantChromaDc(f: Int, qp: Int): Int =
    ((f * 16 * QUANT_V(qp % 6)(0)) << (qp / 6)) >> 5
  private def qpcOf(qpy: Int, off: Int): Int = {
    val qpi = clip3(0, 51, qpy + off)
    if (qpi < 30) qpi else QPC_MAP(qpi - 30)
  }

  /** Spec 8.5.12.2 inverse core transform + (r+32)>>6 + prediction. */
  private def reconBlock(plane: Array[Int], stride: Int, x: Int, y: Int,
                         pred: Array[Int], d: Array[Int]): Unit = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a0 = d(i * 4); val a1 = d(i * 4 + 1); val a2 = d(i * 4 + 2); val a3 = d(i * 4 + 3)
      val e0 = a0 + a2; val e1 = a0 - a2
      val e2 = (a1 >> 1) - a3; val e3 = a1 + (a3 >> 1)
      t(i * 4) = e0 + e3; t(i * 4 + 1) = e1 + e2
      t(i * 4 + 2) = e1 - e2; t(i * 4 + 3) = e0 - e3
      i += 1
    }
    var j = 0
    while (j < 4) {
      val a0 = t(j); val a1 = t(4 + j); val a2 = t(8 + j); val a3 = t(12 + j)
      val e0 = a0 + a2; val e1 = a0 - a2
      val e2 = (a1 >> 1) - a3; val e3 = a1 + (a3 >> 1)
      val r0 = e0 + e3; val r1 = e1 + e2; val r2 = e1 - e2; val r3 = e0 - e3
      plane((y + 0) * stride + x + j) = clip255(pred(0 * 4 + j) + ((r0 + 32) >> 6))
      plane((y + 1) * stride + x + j) = clip255(pred(1 * 4 + j) + ((r1 + 32) >> 6))
      plane((y + 2) * stride + x + j) = clip255(pred(2 * 4 + j) + ((r2 + 32) >> 6))
      plane((y + 3) * stride + x + j) = clip255(pred(3 * 4 + j) + ((r3 + 32) >> 6))
      j += 1
    }
  }

  /** 4x4 Hadamard, its own inverse up to scale (luma DC). */
  private def hadamard4(b: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a0 = b(i * 4); val a1 = b(i * 4 + 1); val a2 = b(i * 4 + 2); val a3 = b(i * 4 + 3)
      val s0 = a0 + a3; val s1 = a1 + a2; val d0 = a0 - a3; val d1 = a1 - a2
      t(i * 4) = s0 + s1; t(i * 4 + 1) = d0 + d1
      t(i * 4 + 2) = s0 - s1; t(i * 4 + 3) = d0 - d1
      i += 1
    }
    val o = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val a0 = t(j); val a1 = t(4 + j); val a2 = t(8 + j); val a3 = t(12 + j)
      val s0 = a0 + a3; val s1 = a1 + a2; val d0 = a0 - a3; val d1 = a1 - a2
      o(j) = s0 + s1; o(4 + j) = d0 + d1; o(8 + j) = s0 - s1; o(12 + j) = d0 - d1
      j += 1
    }
    o
  }

  // --------------------------------------------------------- contexts

  /** In-MB 4x4 Z order: blk -> (x4, y4) offsets in 4-pixel units. */
  @inline private def blkX(blk: Int): Int = (((blk >> 2) & 1) << 1) + (blk & 1)
  @inline private def blkY(blk: Int): Int = ((blk >> 3) << 1) + ((blk >> 1) & 1)
  private val ZIDX: Array[Array[Int]] = {
    val m = Array.fill(4, 4)(0)
    var blk = 0
    while (blk < 16) { m(blkY(blk))(blkX(blk)) = blk; blk += 1 }
    m
  }

  private final class Ctx(val W: Int, val H: Int) {
    val y = new Array[Int](W * H)
    val u = new Array[Int]((W / 2) * (H / 2))
    val v = new Array[Int]((W / 2) * (H / 2))
    val tcY = Array.fill(H / 4, W / 4)(-1)
    val tcU = Array.fill(H / 8, W / 8)(-1)
    val tcV = Array.fill(H / 8, W / 8)(-1)
    val i4mode = Array.fill(H / 4, W / 4)(-1)
    // neighbors in a DIFFERENT slice are unavailable for intra
    // prediction and nC context — the per-MB slice map decides
    val mbSlice = Array.fill(H / 16, W / 16)(-1)
    def availLeft(x: Int, y: Int, sid: Int, mbs: Int): Boolean =
      x > 0 && (x % mbs != 0 || mbSlice(y / mbs)((x - 1) / mbs) == sid)
    def availUp(x: Int, y: Int, sid: Int, mbs: Int): Boolean =
      y > 0 && (y % mbs != 0 || mbSlice((y - 1) / mbs)(x / mbs) == sid)
    def availAr(x: Int, y: Int, sid: Int): Boolean = {
      if (!aboveRightAvail(x, y, W)) false
      else if ((y - 1) / 16 == y / 16 && (x + 4) / 16 == x / 16) true
      else mbSlice((y - 1) / 16)((x + 4) / 16) == sid
    }
    def nc(grid: Array[Array[Int]], bx: Int, by: Int,
           aLeft: Boolean, aUp: Boolean): Int = {
      val nA = if (aLeft) grid(by)(bx - 1) else -1
      val nB = if (aUp) grid(by - 1)(bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA
      else if (nB >= 0) nB
      else 0
    }
    def predI4Mode(bx: Int, by: Int, aLeft: Boolean, aUp: Boolean): Int = {
      if (!aLeft || !aUp) return 2
      val mA = i4mode(by)(bx - 1)
      val mB = i4mode(by - 1)(bx)
      math.min(if (mA >= 0) mA else 2, if (mB >= 0) mB else 2)
    }
  }

  // ------------------------------------------------------------ CAVLC

  /** One residual block into zigzag-ordered coeffs; returns totalCoeff. */
  private def decodeBlock(r: Reader, nC: Int, maxCoeffs: Int,
                          out: Array[Int]): Int = {
    java.util.Arrays.fill(out, 0, maxCoeffs, 0)
    var total = 0
    var t1s = 0
    if (nC >= 8) {
      val v = r.u(6)
      if (v == 3) { total = 0; t1s = 0 }
      else { total = v / 4 + 1; t1s = v % 4 }
    } else {
      val flat = if (nC == -1) H264Tables.ctChromaDc
      else if (nC < 2) H264Tables.ct0
      else if (nC < 4) H264Tables.ct1
      else H264Tables.ct2
      val sym = vlc(r, flat, 16)
      total = sym / 4
      t1s = sym % 4
    }
    if (total == 0) return 0
    if (total > maxCoeffs) abort()
    val levels = new Array[Int](total)
    var i = 0
    while (i < t1s) {
      levels(total - 1 - i) = if (r.bit() == 1) -1 else 1
      i += 1
    }
    var suffixLen = if (total > 10 && t1s < 3) 1 else 0
    i = 0
    while (i < total - t1s) {
      val pos = total - t1s - 1 - i
      var prefix = 0
      while (r.bit() == 0) { prefix += 1; if (prefix > 32) abort() }
      var code = 0
      if (suffixLen == 0) {
        if (prefix < 14) code = prefix
        else if (prefix == 14) code = 14 + r.u(4)
        else {
          code = 15 + r.u(prefix - 3) + 15
          if (prefix >= 16) code += (1 << (prefix - 3)) - 4096
        }
      } else {
        if (prefix < 15) code = (prefix << suffixLen) + r.u(suffixLen)
        else {
          val size = if (prefix >= 16) prefix - 3 else 12
          code = (15 << suffixLen) + r.u(size)
          if (prefix >= 16) code += (1 << (prefix - 3)) - 4096
        }
      }
      if (i == 0 && t1s < 3) code += 2
      val level = if (code % 2 == 0) (code + 2) >> 1 else -((code + 1) >> 1)
      levels(pos) = level
      if (suffixLen == 0) suffixLen = 1
      if (math.abs(level) > (3 << (suffixLen - 1)) && suffixLen < 6) suffixLen += 1
      i += 1
    }
    var totalZeros = 0
    if (total < maxCoeffs) {
      val row = if (nC == -1) H264Tables.totalZerosChromaDc(total - 1)
      else H264Tables.totalZeros(total - 1)
      totalZeros = vlc(r, row, 10)
    }
    val runs = new Array[Int](total)
    var zerosLeft = totalZeros
    var k = total - 1
    while (k > 0 && zerosLeft > 0) {
      val run =
        if (zerosLeft <= 6) vlc(r, H264Tables.runBefore(zerosLeft - 1), 3)
        else {
          val v = r.u(3)
          if (v != 0) 7 - v
          else {
            var run = 7
            while (r.bit() == 0) { run += 1; if (run > 15) abort() }
            run
          }
        }
      if (run > zerosLeft) abort()
      runs(k) = run
      zerosLeft -= run
      k -= 1
    }
    runs(0) = zerosLeft
    var pos = -1
    k = 0
    while (k < total) {
      pos += runs(k) + 1
      if (pos >= maxCoeffs) abort()
      out(pos) = levels(k)
      k += 1
    }
    total
  }

  // ------------------------------------------------- intra prediction

  private def aboveRightAvail(x: Int, y: Int, W: Int): Boolean = {
    if (y == 0 || x + 4 >= W) return false
    if ((y - 1) / 16 < y / 16) return true
    if ((x + 4) / 16 > x / 16) return false
    ZIDX(((y - 1) % 16) / 4)(((x + 4) % 16) / 4) < ZIDX((y % 16) / 4)((x % 16) / 4)
  }

  /** Spec 8.3.1.2 modes 0-8; output row-major 4x4 into `o`;
    * availability (incl. slice boundaries) decided by the caller. */
  private def pred4x4(plane: Array[Int], stride: Int, W: Int,
                      x: Int, y: Int, mode: Int, o: Array[Int],
                      up: Boolean, left: Boolean, ar: Boolean): Unit = {
    val a = new Array[Int](8)
    if (up) {
      var i = 0
      while (i < 4) { a(i) = plane((y - 1) * stride + x + i); i += 1 }
      while (i < 8) {
        a(i) = if (ar) plane((y - 1) * stride + x + i) else a(3)
        i += 1
      }
    }
    val l = new Array[Int](4)
    if (left) {
      var j = 0
      while (j < 4) { l(j) = plane((y + j) * stride + x - 1); j += 1 }
    }
    val q = if (up && left) plane((y - 1) * stride + x - 1) else 0
    @inline def pa(i: Int): Int = if (i < 0) q else a(i)
    @inline def pl(j: Int): Int = if (j < 0) q else l(j)
    val dc =
      if (mode == 2) {
        if (up && left) (a(0) + a(1) + a(2) + a(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
        else if (up) (a(0) + a(1) + a(2) + a(3) + 2) >> 2
        else if (left) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
        else 128
      } else 0
    if ((mode == 0 || mode == 3 || mode == 7) && !up) abort()
    if ((mode == 1 || mode == 8) && !left) abort()
    if ((mode == 4 || mode == 5 || mode == 6) && !(up && left)) abort()
    var y4 = 0
    while (y4 < 4) {
      var x4 = 0
      while (x4 < 4) {
        val v = mode match {
          case 0 => a(x4)
          case 1 => l(y4)
          case 2 => dc
          case 3 =>
            if (x4 == 3 && y4 == 3) (a(6) + 3 * a(7) + 2) >> 2
            else { val k = x4 + y4; (a(k) + 2 * a(k + 1) + a(k + 2) + 2) >> 2 }
          case 4 =>
            if (x4 > y4) { val k = x4 - y4; (pa(k - 2) + 2 * pa(k - 1) + pa(k) + 2) >> 2 }
            else if (x4 < y4) { val k = y4 - x4; (pl(k - 2) + 2 * pl(k - 1) + pl(k) + 2) >> 2 }
            else (pa(0) + 2 * q + pl(0) + 2) >> 2
          case 5 =>
            val z = 2 * x4 - y4
            val k = x4 - (y4 >> 1)
            if (z >= 0 && z % 2 == 0) (pa(k - 1) + pa(k) + 1) >> 1
            else if (z >= 0) (pa(k - 2) + 2 * pa(k - 1) + pa(k) + 2) >> 2
            else if (z == -1) (pl(0) + 2 * q + pa(0) + 2) >> 2
            else (pl(y4 - 1) + 2 * pl(y4 - 2) + pl(y4 - 3) + 2) >> 2
          case 6 =>
            val z = 2 * y4 - x4
            val k = y4 - (x4 >> 1)
            if (z >= 0 && z % 2 == 0) (pl(k - 1) + pl(k) + 1) >> 1
            else if (z >= 0) (pl(k - 2) + 2 * pl(k - 1) + pl(k) + 2) >> 2
            else if (z == -1) (pa(0) + 2 * q + pl(0) + 2) >> 2
            else (pa(x4 - 1) + 2 * pa(x4 - 2) + pa(x4 - 3) + 2) >> 2
          case 7 =>
            val k = x4 + (y4 >> 1)
            if (y4 % 2 == 0) (a(k) + a(k + 1) + 1) >> 1
            else (a(k) + 2 * a(k + 1) + a(k + 2) + 2) >> 2
          case 8 =>
            val z = x4 + 2 * y4
            val k = y4 + (x4 >> 1)
            if (z < 5 && z % 2 == 0) (l(k) + l(k + 1) + 1) >> 1
            else if (z < 5) (l(k) + 2 * l(k + 1) + l(k + 2) + 2) >> 2
            else if (z == 5) (l(2) + 3 * l(3) + 2) >> 2
            else l(3)
          case _ => abort()
        }
        o(y4 * 4 + x4) = v
        x4 += 1
      }
      y4 += 1
    }
  }

  /** 16x16 luma (0 V, 1 H, 2 DC, 3 Plane) or 8x8 chroma (0 DC, 1 H,
    * 2 V, 3 Plane) prediction into `o` (row-major n*n). */
  private def predNxN(plane: Array[Int], stride: Int, x: Int, y: Int,
                      n: Int, mode: Int, chroma: Boolean, o: Array[Int],
                      up: Boolean, left: Boolean): Unit = {
    val a = new Array[Int](n)
    val l = new Array[Int](n)
    if (up) { var i = 0; while (i < n) { a(i) = plane((y - 1) * stride + x + i); i += 1 } }
    if (left) { var j = 0; while (j < n) { l(j) = plane((y + j) * stride + x - 1); j += 1 } }
    val q = if (up && left) plane((y - 1) * stride + x - 1) else 0
    val (vmode, hmode, dcmode, pmode) =
      if (chroma) (2, 1, 0, 3) else (0, 1, 2, 3)
    if (mode == dcmode) {
      if (chroma) {
        // chroma DC is per 4x4 sub-block (spec 8.3.4.1)
        var by = 0
        while (by < n) {
          var bx = 0
          while (bx < n) {
            var dc = 128
            val sumA = if (up) a(bx) + a(bx + 1) + a(bx + 2) + a(bx + 3) else 0
            val sumL = if (left) l(by) + l(by + 1) + l(by + 2) + l(by + 3) else 0
            if (bx == by) {
              if (up && left) dc = (sumA + sumL + 4) >> 3
              else if (up) dc = (sumA + 2) >> 2
              else if (left) dc = (sumL + 2) >> 2
            } else if (bx > by) {
              if (up) dc = (sumA + 2) >> 2
              else if (left) dc = (sumL + 2) >> 2
            } else {
              if (left) dc = (sumL + 2) >> 2
              else if (up) dc = (sumA + 2) >> 2
            }
            var j = 0
            while (j < 4) {
              var i = 0
              while (i < 4) { o((by + j) * n + bx + i) = dc; i += 1 }
              j += 1
            }
            bx += 4
          }
          by += 4
        }
      } else {
        var dc = 128
        if (up && left) dc = (a.sum + l.sum + 16) >> 5
        else if (up) dc = (a.sum + 8) >> 4
        else if (left) dc = (l.sum + 8) >> 4
        java.util.Arrays.fill(o, 0, n * n, dc)
      }
    } else if (mode == vmode) {
      if (!up) abort()
      var j = 0
      while (j < n) { var i = 0; while (i < n) { o(j * n + i) = a(i); i += 1 }; j += 1 }
    } else if (mode == hmode) {
      if (!left) abort()
      var j = 0
      while (j < n) { var i = 0; while (i < n) { o(j * n + i) = l(j); i += 1 }; j += 1 }
    } else if (mode == pmode) {
      if (!(up && left)) abort()
      val half = n / 2
      var hSum = 0; var vSum = 0
      var i = 0
      while (i < half) {
        hSum += (i + 1) * (a(half + i) - (if (half - 2 - i >= 0) a(half - 2 - i) else q))
        vSum += (i + 1) * (l(half + i) - (if (half - 2 - i >= 0) l(half - 2 - i) else q))
        i += 1
      }
      val b = if (n == 16) (5 * hSum + 32) >> 6 else (17 * hSum + 16) >> 5
      val c = if (n == 16) (5 * vSum + 32) >> 6 else (17 * vSum + 16) >> 5
      val aa = 16 * (a(n - 1) + l(n - 1))
      var j = 0
      while (j < n) {
        var x4 = 0
        while (x4 < n) {
          o(j * n + x4) = clip255((aa + b * (x4 - half + 1) + c * (j - half + 1) + 16) >> 5)
          x4 += 1
        }
        j += 1
      }
    } else abort()
  }

  // ---------------------------------------------------------- deblock

  /** In-loop deblocking (spec 8.7). mbParams(mby)(mbx) packs the MB's
    * SLICE parameters as idc | (offA+64) << 8 | (offB+64) << 16: idc 1
    * skips the MB entirely, idc 2 skips MB-boundary edges whose
    * neighbor is in a different slice, offsets shift indexA/indexB. */
  private def deblock(ctx: Ctx, mbqp: Array[Array[Int]], chromaOff: Int,
                      mbParams: Array[Array[Int]]): Unit = {
    val mbsX = ctx.W / 16
    val mbsY = ctx.H / 16
    def filtLine(pl: Array[Int], pos: Int, stride: Int, bs: Int,
                 indexA: Int, alpha: Int, beta: Int, chroma: Boolean): Unit = {
      val p0 = pl(pos - stride); val p1 = pl(pos - 2 * stride)
      val p2 = pl(pos - 3 * stride); val p3 = pl(pos - 4 * stride)
      val q0 = pl(pos); val q1 = pl(pos + stride)
      val q2 = pl(pos + 2 * stride); val q3 = pl(pos + 3 * stride)
      if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
        math.abs(q1 - q0) >= beta) return
      if (bs == 4) {
        val ap = math.abs(p2 - p0) < beta
        val aq = math.abs(q2 - q0) < beta
        val strong = math.abs(p0 - q0) < (alpha >> 2) + 2
        if (!chroma && ap && strong) {
          pl(pos - stride) = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
          pl(pos - 2 * stride) = (p2 + p1 + p0 + q0 + 2) >> 2
          pl(pos - 3 * stride) = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
        } else pl(pos - stride) = (2 * p1 + p0 + q1 + 2) >> 2
        if (!chroma && aq && strong) {
          pl(pos) = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
          pl(pos + stride) = (q2 + q1 + q0 + p0 + 2) >> 2
          pl(pos + 2 * stride) = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
        } else pl(pos) = (2 * q1 + q0 + p1 + 2) >> 2
      } else {
        val tc0 = DB_TC0(bs - 1)(indexA)
        val ap = math.abs(p2 - p0) < beta
        val aq = math.abs(q2 - q0) < beta
        val tc = tc0 + (if (chroma) 1 else (if (ap) 1 else 0) + (if (aq) 1 else 0))
        val delta = clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
        pl(pos - stride) = clip255(p0 + delta)
        pl(pos) = clip255(q0 - delta)
        if (!chroma && ap)
          pl(pos - 2 * stride) = p1 + clip3(-tc0, tc0,
            (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
        if (!chroma && aq)
          pl(pos + stride) = q1 + clip3(-tc0, tc0,
            (q2 + ((q0 + p0 + 1) >> 1) - 2 * q1) >> 1)
      }
    }
    var mby = 0
    while (mby < mbsY) {
      var mbx = 0
      while (mbx < mbsX) {
        val packed = mbParams(mby)(mbx)
        val idc = packed & 0xFF
        val offA = ((packed >> 8) & 0xFF) - 64
        val offB = ((packed >> 16) & 0xFF) - 64
        if (idc != 1) {
          var pi = 0
          while (pi < 3) {
            val chroma = pi != 0
            val pl = if (pi == 0) ctx.y else if (pi == 1) ctx.u else ctx.v
            val pw = if (chroma) ctx.W / 2 else ctx.W
            val mbSz = if (chroma) 8 else 16
            val qpHere = mbqp(mby)(mbx)
            var e = 0
            while (e < mbSz) { // vertical edges
              val crossSlice = e == 0 && mbx > 0 &&
                ctx.mbSlice(mby)(mbx - 1) != ctx.mbSlice(mby)(mbx)
              if (!(e == 0 && mbx == 0) && !(idc == 2 && crossSlice)) {
                val bs = if (e == 0) 4 else 3
                val qpOther = if (e == 0) mbqp(mby)(mbx - 1) else qpHere
                val qav =
                  if (chroma) (qpcOf(qpHere, chromaOff) + qpcOf(qpOther, chromaOff) + 1) >> 1
                  else (qpHere + qpOther + 1) >> 1
                val indexA = clip3(0, 51, qav + offA)
                val indexB = clip3(0, 51, qav + offB)
                val alpha = DB_ALPHA(indexA)
                val beta = DB_BETA(indexB)
                if (alpha != 0 && beta != 0) {
                  val x0 = mbx * mbSz + e
                  var yy = 0
                  while (yy < mbSz) {
                    filtLine(pl, (mby * mbSz + yy) * pw + x0, 1, bs, indexA, alpha, beta, chroma)
                    yy += 1
                  }
                }
              }
              e += 4
            }
            e = 0
            while (e < mbSz) { // horizontal edges
              val crossSlice = e == 0 && mby > 0 &&
                ctx.mbSlice(mby - 1)(mbx) != ctx.mbSlice(mby)(mbx)
              if (!(e == 0 && mby == 0) && !(idc == 2 && crossSlice)) {
                val bs = if (e == 0) 4 else 3
                val qpOther = if (e == 0) mbqp(mby - 1)(mbx) else qpHere
                val qav =
                  if (chroma) (qpcOf(qpHere, chromaOff) + qpcOf(qpOther, chromaOff) + 1) >> 1
                  else (qpHere + qpOther + 1) >> 1
                val indexA = clip3(0, 51, qav + offA)
                val indexB = clip3(0, 51, qav + offB)
                val alpha = DB_ALPHA(indexA)
                val beta = DB_BETA(indexB)
                if (alpha != 0 && beta != 0) {
                  val y0 = mby * mbSz + e
                  var xx = 0
                  while (xx < mbSz) {
                    filtLine(pl, y0 * pw + mbx * mbSz + xx, pw, bs, indexA, alpha, beta, chroma)
                    xx += 1
                  }
                }
              }
              e += 4
            }
            pi += 1
          }
        }
        mbx += 1
      }
      mby += 1
    }
  }

  // -------------------------------------------------------- the slice

  /** One slice of the picture; returns (deblockIdc, nextUndecodedMb).
    * Real encoders split an IDR across several slices — the MB loop
    * stops at the slice's rbsp_stop_bit (more_rbsp_data()), and
    * neighbors in a different slice are unavailable. */
  private def decodeSlice(r: Reader, sps: Sps, pps: Pps, ctx: Ctx,
                          mbqp: Array[Array[Int]], mbParams: Array[Array[Int]],
                          expectMb: Int): Int = {
    val mbsX = sps.w / 16
    val mbsY = sps.h / 16
    if (pps.cabac) abort() // CABAC slices take the decodeSliceCabac path
    val firstMb = r.ue()
    if (firstMb != expectMb) abort() // missing/overlapping slice
    val sid = firstMb // unique per slice of this picture
    val sliceType = r.ue()
    if (sliceType != 2 && sliceType != 7) abort() // I slices only
    if (r.ue() != 0) abort() // pps_id
    r.u(sps.log2MaxFrameNum) // frame_num
    r.ue() // idr_pic_id
    if (sps.pocType == 0) {
      r.u(sps.log2MaxPocLsb) // pic_order_cnt_lsb
      if (pps.picOrder) r.se() // delta_pic_order_cnt_bottom
    }
    r.u(1); r.u(1) // dec_ref_pic_marking (IDR)
    var qpy = pps.qp + r.se()
    if (qpy < 0 || qpy > 51) abort()
    var deblockIdc = 0
    var offA = 0
    var offB = 0
    if (pps.deblockCtl) {
      deblockIdc = r.ue()
      if (deblockIdc > 2) abort()
      if (deblockIdc != 1) {
        offA = r.se() * 2
        offB = r.se() * 2
        if (offA < -12 || offA > 12 || offB < -12 || offB > 12) abort()
      }
    }
    val packedParams = (deblockIdc & 0xFF) | ((offA + 64) << 8) | ((offB + 64) << 16)
    val zz = new Array[Int](16)
    val pred16 = new Array[Int](256)
    val pred4 = new Array[Int](16)
    val pred8 = new Array[Int](64)
    val d = new Array[Int](16)
    var mbi = firstMb
    while (mbi < mbsX * mbsY && r.pos < r.lastOneBit) {
      val mbx = mbi % mbsX
      val mby = mbi / mbsX
      ctx.mbSlice(mby)(mbx) = sid
      mbParams(mby)(mbx) = packedParams
      val upOk = ctx.availUp(mbx * 16, mby * 16, sid, 16)
      val leftOk = ctx.availLeft(mbx * 16, mby * 16, sid, 16)
      val mbType = r.ue()
      if (mbType == 25) { // I_PCM
        r.align()
        var j = 0
        while (j < 16) {
          var i = 0
          while (i < 16) { ctx.y((mby * 16 + j) * ctx.W + mbx * 16 + i) = r.u(8); i += 1 }
          j += 1
        }
        var pi = 0
        while (pi < 2) {
          val pl = if (pi == 0) ctx.u else ctx.v
          j = 0
          while (j < 8) {
            var i = 0
            while (i < 8) { pl((mby * 8 + j) * (ctx.W / 2) + mbx * 8 + i) = r.u(8); i += 1 }
            j += 1
          }
          pi += 1
        }
        var by = 0
        while (by < 4) {
          var bx = 0
          while (bx < 4) {
            ctx.tcY(mby * 4 + by)(mbx * 4 + bx) = 16
            ctx.i4mode(mby * 4 + by)(mbx * 4 + bx) = -1
            bx += 1
          }
          by += 1
        }
        by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            ctx.tcU(mby * 2 + by)(mbx * 2 + bx) = 16
            ctx.tcV(mby * 2 + by)(mbx * 2 + bx) = 16
            bx += 1
          }
          by += 1
        }
        mbqp(mby)(mbx) = 0 // spec: QPy = 0 for I_PCM deblocking
      } else if (mbType == 0) { // Intra_4x4
        val flags = new Array[Int](16)
        val rems = new Array[Int](16)
        var blk = 0
        while (blk < 16) {
          flags(blk) = r.bit()
          if (flags(blk) == 0) rems(blk) = r.u(3)
          blk += 1
        }
        val cmode = r.ue()
        if (cmode > 3) abort()
        val cbpIdx = r.ue()
        if (cbpIdx >= 48) abort()
        val cbp = CBP_INTRA(cbpIdx)
        val cbpLuma = cbp & 15
        val cbpChroma = cbp >> 4
        if (cbp != 0) qpy = ((qpy + r.se()) + 52) % 52
        mbqp(mby)(mbx) = qpy
        val qpc = qpcOf(qpy, pps.chromaOff)
        blk = 0
        while (blk < 16) {
          val x = mbx * 16 + blkX(blk) * 4
          val y = mby * 16 + blkY(blk) * 4
          val gx = x / 4
          val gy = y / 4
          val aL = ctx.availLeft(x, y, sid, 16)
          val aU = ctx.availUp(x, y, sid, 16)
          val predm = ctx.predI4Mode(gx, gy, aL, aU)
          val m = if (flags(blk) == 1) predm
          else if (rems(blk) < predm) rems(blk) else rems(blk) + 1
          ctx.i4mode(gy)(gx) = m
          pred4x4(ctx.y, ctx.W, ctx.W, x, y, m, pred4,
            aU, aL, ctx.availAr(x, y, sid))
          val quad = (if ((x % 16) >= 8) 1 else 0) + (if ((y % 16) >= 8) 2 else 0)
          if ((cbpLuma & (1 << quad)) != 0)
            ctx.tcY(gy)(gx) = decodeBlock(r, ctx.nc(ctx.tcY, gx, gy, aL, aU), 16, zz)
          else { java.util.Arrays.fill(zz, 0); ctx.tcY(gy)(gx) = 0 }
          var k = 0
          java.util.Arrays.fill(d, 0)
          while (k < 16) {
            val z = ZIGZAG(k)
            d(z) = dequantAc(zz(k), qpy, z / 4, z % 4)
            k += 1
          }
          reconBlock(ctx.y, ctx.W, x, y, pred4, d)
          blk += 1
        }
        decodeChroma(r, ctx, mbx, mby, cbpChroma, cmode, qpc, zz, pred8, d,
          sid, upOk, leftOk)
      } else if (mbType >= 1 && mbType <= 24) { // I_16x16
        val mode = (mbType - 1) % 4
        val cbpChroma = ((mbType - 1) / 4) % 3
        val cbpLuma = 15 * ((mbType - 1) / 12)
        val cmode = r.ue()
        if (cmode > 3) abort()
        qpy = ((qpy + r.se()) + 52) % 52
        mbqp(mby)(mbx) = qpy
        val qpc = qpcOf(qpy, pps.chromaOff)
        predNxN(ctx.y, ctx.W, mbx * 16, mby * 16, 16, mode, chroma = false,
          pred16, upOk, leftOk)
        decodeBlock(r, ctx.nc(ctx.tcY, mbx * 4, mby * 4, leftOk, upOk), 16, zz)
        // un-zigzag the DC matrix, inverse Hadamard, dequant
        val dcm = new Array[Int](16)
        var k = 0
        while (k < 16) { dcm(ZIGZAG(k)) = zz(k); k += 1 }
        val dci = hadamard4(dcm)
        val ac = new Array[Int](15)
        var blk = 0
        while (blk < 16) {
          val x = mbx * 16 + blkX(blk) * 4
          val y = mby * 16 + blkY(blk) * 4
          val gx = x / 4
          val gy = y / 4
          java.util.Arrays.fill(d, 0)
          if (cbpLuma != 0) {
            java.util.Arrays.fill(ac, 0)
            val tc = decodeBlock(r, ctx.nc(ctx.tcY, gx, gy,
              ctx.availLeft(x, y, sid, 16), ctx.availUp(x, y, sid, 16)), 15, ac)
            ctx.tcY(gy)(gx) = tc
            var kk = 0
            while (kk < 15) {
              val z = ZIGZAG(kk + 1)
              d(z) = dequantAc(ac(kk), qpy, z / 4, z % 4)
              kk += 1
            }
          } else ctx.tcY(gy)(gx) = 0
          ctx.i4mode(gy)(gx) = -1
          d(0) = dequantLumaDc(dci(blkY(blk) * 4 + blkX(blk)), qpy)
          var j = 0
          while (j < 4) {
            var i2 = 0
            while (i2 < 4) {
              pred4(j * 4 + i2) = pred16((blkY(blk) * 4 + j) * 16 + blkX(blk) * 4 + i2)
              i2 += 1
            }
            j += 1
          }
          reconBlock(ctx.y, ctx.W, x, y, pred4, d)
          blk += 1
        }
        decodeChroma(r, ctx, mbx, mby, cbpChroma, cmode, qpc, zz, pred8, d,
          sid, upOk, leftOk)
      } else abort()
      mbi += 1
    }
    mbi
  }

  private def decodeChroma(r: Reader, ctx: Ctx, mbx: Int, mby: Int,
                           cbpChroma: Int, cmode: Int, qpc: Int,
                           zz: Array[Int], pred8: Array[Int], d: Array[Int],
                           sid: Int, upOk: Boolean, leftOk: Boolean): Unit = {
    val cw = ctx.W / 2
    val dcs = Array.fill(2)(new Array[Int](4))
    if (cbpChroma != 0) {
      var pi = 0
      while (pi < 2) {
        decodeBlock(r, -1, 4, zz)
        Array.copy(zz, 0, dcs(pi), 0, 4)
        pi += 1
      }
    }
    var pi = 0
    val ac = new Array[Int](15)
    while (pi < 2) {
      val pl = if (pi == 0) ctx.u else ctx.v
      val grid = if (pi == 0) ctx.tcU else ctx.tcV
      predNxN(pl, cw, mbx * 8, mby * 8, 8, cmode, chroma = true, pred8,
        upOk, leftOk)
      val acs = Array.fill(4)(new Array[Int](15))
      var blk = 0
      while (blk < 4) {
        val gx = mbx * 2 + blk % 2
        val gy = mby * 2 + blk / 2
        if (cbpChroma == 2) {
          java.util.Arrays.fill(ac, 0)
          val tc = decodeBlock(r, ctx.nc(grid, gx, gy,
            ctx.availLeft(gx * 4, gy * 4, sid, 8),
            ctx.availUp(gx * 4, gy * 4, sid, 8)), 15, ac)
          Array.copy(ac, 0, acs(blk), 0, 15)
          grid(gy)(gx) = tc
        } else grid(gy)(gx) = 0
        blk += 1
      }
      // 2x2 inverse Hadamard of the parsed DC (raster order)
      val f = dcs(pi)
      val dci = Array(f(0) + f(1) + f(2) + f(3), f(0) - f(1) + f(2) - f(3),
        f(0) + f(1) - f(2) - f(3), f(0) - f(1) - f(2) + f(3))
      blk = 0
      while (blk < 4) {
        val bx = blk % 2
        val by = blk / 2
        java.util.Arrays.fill(d, 0)
        var kk = 0
        while (kk < 15) {
          val z = ZIGZAG(kk + 1)
          d(z) = dequantAc(acs(blk)(kk), qpc, z / 4, z % 4)
          kk += 1
        }
        if (cbpChroma != 0) d(0) = dequantChromaDc(dci(blk), qpc)
        val p4 = new Array[Int](16)
        var j = 0
        while (j < 4) {
          var i2 = 0
          while (i2 < 4) { p4(j * 4 + i2) = pred8((by * 4 + j) * 8 + bx * 4 + i2); i2 += 1 }
          j += 1
        }
        reconBlock(pl, cw, mbx * 8 + bx * 4, mby * 8 + by * 4, p4, d)
        blk += 1
      }
      pi += 1
    }
  }

  // ------------------------------------------------------- CABAC (9.3)
  // Main-profile I-slice arithmetic entropy layer: engine (9.3.3.2),
  // context initialization (9.3.1.1), binarizations (9.3.2) and
  // context-increment derivations (9.3.3.1). Tables ride in
  // [[H264Tables]] (single transcription shared with the Python fixture
  // codec — see tools/h264_tables.py for the provenance note: the
  // engine/binarization/derivation logic follows the public spec
  // exactly; the context-init PRIORS are a best-effort transcription
  // that this environment cannot re-verify, which leaves every
  // fixture/gate bit-exact but marks third-party-stream conformance as
  // pending one external check of those constants).

  /** Arithmetic decoder; models pack pStateIdx << 1 | valMPS. */
  private final class Cabac(r: Reader) {
    private[this] var range = 510
    private[this] var offset = r.u(9)
    def decision(models: Array[Int], idx: Int): Int = {
      val m = models(idx)
      val st = m >> 1
      val mps = m & 1
      val rlps = H264Tables.rangeTabLps((st << 2) | ((range >> 6) & 3))
      range -= rlps
      var b = 0
      if (offset >= range) {
        b = 1 - mps
        offset -= range
        range = rlps
        val nmps = if (st == 0) 1 - mps else mps
        models(idx) = (H264Tables.transIdxLps(st) << 1) | nmps
      } else {
        b = mps
        models(idx) = (math.min(st + 1, 62) << 1) | mps
      }
      while (range < 256) { range <<= 1; offset = (offset << 1) | r.bit() }
      b
    }
    def bypass(): Int = {
      offset = (offset << 1) | r.bit()
      if (offset >= range) { offset -= range; 1 } else 0
    }
    /** end_of_slice_flag / the I_PCM bin. When this returns 1 the
      * reader's bit position equals the encoder's flushed output end
      * (the engine's 9-bit pre-read exactly offsets the flush tail), so
      * byte-aligned pcm samples follow directly. */
    def terminate(): Int = {
      range -= 2
      if (offset >= range) 1
      else {
        while (range < 256) { range <<= 1; offset = (offset << 1) | r.bit() }
        0
      }
    }
  }

  private def cabacInitModels(sliceQp: Int): Array[Int] = {
    val qp = clip3(0, 51, sliceQp)
    val out = new Array[Int](276)
    var i = 0
    while (i < 276) {
      val m = H264Tables.ctxInitI(2 * i)
      val n = H264Tables.ctxInitI(2 * i + 1)
      val pre = clip3(1, 126, ((m * qp) >> 4) + n)
      out(i) = if (pre <= 63) (63 - pre) << 1 else ((pre - 64) << 1) | 1
      i += 1
    }
    out
  }

  // residual-section bases and per-category offsets (Table 9-40)
  private val CBF_BASE = 85
  private val SIG_BASE = 105
  private val LAST_BASE = 166
  private val ABS_BASE = 227
  private val CAT_OFF_CBF = Array(0, 4, 8, 12, 16)
  private val CAT_OFF_SIG = Array(0, 15, 29, 44, 47)
  private val CAT_OFF_ABS = Array(0, 10, 20, 30, 39)

  /** Picture-level neighbor state for the context-increment
    * derivations (9.3.3.1.1); slices share it, context models do not.
    * kind: -1 undecoded, 0 I_NxN, 1 I_16x16, 2 I_PCM. */
  private final class CabacPic(val mbsX: Int, val mbsY: Int) {
    val kind = Array.fill(mbsY, mbsX)(-1)
    val cbpLuma = Array.fill(mbsY, mbsX)(0)
    val cbpChroma = Array.fill(mbsY, mbsX)(0)
    val cmode = Array.fill(mbsY, mbsX)(0)
    val cbfY = Array.fill(mbsY * 4, mbsX * 4)(0)
    val cbfDcY = Array.fill(mbsY, mbsX)(0)
    val cbfC = Array.fill(2)(Array.fill(mbsY * 2, mbsX * 2)(0))
    val cbfDcC = Array.fill(2)(Array.fill(mbsY, mbsX)(0))
    var lastDeltaNz = false

    def setPcm(mbx: Int, mby: Int): Unit = {
      kind(mby)(mbx) = 2
      var j = 0
      while (j < 4) {
        var i = 0
        while (i < 4) { cbfY(mby * 4 + j)(mbx * 4 + i) = 1; i += 1 }
        j += 1
      }
      cbfDcY(mby)(mbx) = 1
      var c = 0
      while (c < 2) {
        j = 0
        while (j < 2) {
          var i = 0
          while (i < 2) { cbfC(c)(mby * 2 + j)(mbx * 2 + i) = 1; i += 1 }
          j += 1
        }
        cbfDcC(c)(mby)(mbx) = 1
        c += 1
      }
      lastDeltaNz = false
    }

    def mbTypeInc(ctx: Ctx, sid: Int, mbx: Int, mby: Int): Int = {
      var inc = 0
      if (ctx.availLeft(mbx * 16, mby * 16, sid, 16) &&
        kind(mby)(mbx - 1) != 0) inc += 1
      if (ctx.availUp(mbx * 16, mby * 16, sid, 16) &&
        kind(mby - 1)(mbx) != 0) inc += 1
      inc
    }

    def cmodeInc(ctx: Ctx, sid: Int, mbx: Int, mby: Int): Int = {
      var inc = 0
      if (ctx.availLeft(mbx * 16, mby * 16, sid, 16) &&
        kind(mby)(mbx - 1) != 2 && cmode(mby)(mbx - 1) != 0) inc += 1
      if (ctx.availUp(mbx * 16, mby * 16, sid, 16) &&
        kind(mby - 1)(mbx) != 2 && cmode(mby - 1)(mbx) != 0) inc += 1
      inc
    }

    /** coded_block_pattern luma condTermFlag (inverted polarity per
      * 9.3.3.1.1.4): 1 iff the neighboring 8x8 block exists in this
      * slice, is not I_PCM and its cbp bit is CLEAR. curBits carries
      * the current macroblock's already-coded luma bins. */
    private def cbpLumaCond(ctx: Ctx, sid: Int, mbx: Int, mby: Int,
                            curBits: Int, nbx: Int, nby: Int,
                            nblk: Int): Int = {
      if (nbx == mbx && nby == mby)
        return if (((curBits >> nblk) & 1) != 0) 0 else 1
      val avail =
        if (nbx < mbx) ctx.availLeft(mbx * 16, mby * 16, sid, 16)
        else ctx.availUp(mbx * 16, mby * 16, sid, 16)
      if (!avail || kind(nby)(nbx) == 2) return 0
      if (((cbpLuma(nby)(nbx) >> nblk) & 1) != 0) 0 else 1
    }

    def cbpLumaInc(ctx: Ctx, sid: Int, mbx: Int, mby: Int, blk: Int,
                   curBits: Int): Int = {
      val a =
        if (blk == 0 || blk == 2)
          cbpLumaCond(ctx, sid, mbx, mby, curBits, mbx - 1, mby, blk + 1)
        else cbpLumaCond(ctx, sid, mbx, mby, curBits, mbx, mby, blk - 1)
      val b =
        if (blk == 0 || blk == 1)
          cbpLumaCond(ctx, sid, mbx, mby, curBits, mbx, mby - 1, blk + 2)
        else cbpLumaCond(ctx, sid, mbx, mby, curBits, mbx, mby, blk - 2)
      a + 2 * b
    }

    private def cbpChromaCond(ctx: Ctx, sid: Int, mbx: Int, mby: Int,
                              left: Boolean, want2: Boolean): Int = {
      val avail =
        if (left) ctx.availLeft(mbx * 16, mby * 16, sid, 16)
        else ctx.availUp(mbx * 16, mby * 16, sid, 16)
      if (!avail) return 0
      val nbx = if (left) mbx - 1 else mbx
      val nby = if (left) mby else mby - 1
      if (kind(nby)(nbx) == 2) return 1
      val c = cbpChroma(nby)(nbx)
      if (if (want2) c == 2 else c != 0) 1 else 0
    }

    def cbpChromaInc(ctx: Ctx, sid: Int, mbx: Int, mby: Int,
                     binIdx: Int): Int = {
      val want2 = binIdx == 1
      val a = cbpChromaCond(ctx, sid, mbx, mby, left = true, want2)
      val b = cbpChromaCond(ctx, sid, mbx, mby, left = false, want2)
      (if (want2) 4 else 0) + a + 2 * b
    }

    /** coded_block_flag condTermFlag for a per-MB transform block (DC
      * categories 0 and 3): unavailable -> 1 (intra picture), I_PCM ->
      * 1, else the stored flag (0 when the neighbor carried no such
      * block). */
    private def mbCond(ctx: Ctx, sid: Int, mbx: Int, mby: Int,
                       left: Boolean, grid: Array[Array[Int]]): Int = {
      val avail =
        if (left) ctx.availLeft(mbx * 16, mby * 16, sid, 16)
        else ctx.availUp(mbx * 16, mby * 16, sid, 16)
      if (!avail) return 1
      val nbx = if (left) mbx - 1 else mbx
      val nby = if (left) mby else mby - 1
      if (kind(nby)(nbx) == 2) 1 else grid(nby)(nbx)
    }

    def cbfDcYInc(ctx: Ctx, sid: Int, mbx: Int, mby: Int): Int =
      mbCond(ctx, sid, mbx, mby, left = true, cbfDcY) +
        2 * mbCond(ctx, sid, mbx, mby, left = false, cbfDcY)

    def cbfDcCInc(ctx: Ctx, sid: Int, mbx: Int, mby: Int, c: Int): Int =
      mbCond(ctx, sid, mbx, mby, left = true, cbfDcC(c)) +
        2 * mbCond(ctx, sid, mbx, mby, left = false, cbfDcC(c))

    /** coded_block_flag condTermFlag for a sub-block neighbor (cats
      * 1/2/4) at grid (ngx, ngy), per blocks-per-MB-edge `per`. */
    private def blkFlag(ctx: Ctx, sid: Int, mbx: Int, mby: Int,
                        ngx: Int, ngy: Int, grid: Array[Array[Int]],
                        per: Int): Int = {
      if (ngx < 0 || ngy < 0) return 1
      val nmbx = ngx / per
      val nmby = ngy / per
      if (nmbx == mbx && nmby == mby) return grid(ngy)(ngx)
      val avail =
        if (nmbx < mbx) ctx.availLeft(mbx * 16, mby * 16, sid, 16)
        else ctx.availUp(mbx * 16, mby * 16, sid, 16)
      if (!avail || kind(nmby)(nmbx) == 2) 1 else grid(ngy)(ngx)
    }

    def cbfYInc(ctx: Ctx, sid: Int, mbx: Int, mby: Int,
                gx: Int, gy: Int): Int =
      blkFlag(ctx, sid, mbx, mby, gx - 1, gy, cbfY, 4) +
        2 * blkFlag(ctx, sid, mbx, mby, gx, gy - 1, cbfY, 4)

    def cbfCInc(ctx: Ctx, sid: Int, mbx: Int, mby: Int,
                gx: Int, gy: Int, c: Int): Int =
      blkFlag(ctx, sid, mbx, mby, gx - 1, gy, cbfC(c), 2) +
        2 * blkFlag(ctx, sid, mbx, mby, gx, gy - 1, cbfC(c), 2)
  }

  /** mb_type for I slices (Table 9-36): 0 I_NxN, 25 I_PCM, 1..24
    * I_16x16 (pred + 4*cbpChroma + 12*cbpLuma15). */
  private def cabacMbType(cab: Cabac, models: Array[Int], pic: CabacPic,
                          ctx: Ctx, sid: Int, mbx: Int, mby: Int): Int = {
    val inc = pic.mbTypeInc(ctx, sid, mbx, mby)
    if (cab.decision(models, 3 + inc) == 0) return 0
    if (cab.terminate() == 1) return 25
    val b2 = cab.decision(models, 6)
    var cbpChroma = 0
    if (cab.decision(models, 7) == 1)
      cbpChroma = if (cab.decision(models, 8) == 1) 2 else 1
    val pm = 2 * cab.decision(models, 9) + cab.decision(models, 10)
    1 + pm + 4 * cbpChroma + 12 * b2
  }

  private def cabacCmode(cab: Cabac, models: Array[Int], pic: CabacPic,
                         ctx: Ctx, sid: Int, mbx: Int, mby: Int): Int = {
    val inc = pic.cmodeInc(ctx, sid, mbx, mby)
    if (cab.decision(models, 64 + inc) == 0) return 0
    if (cab.decision(models, 67) == 0) return 1
    if (cab.decision(models, 67) == 0) 2 else 3
  }

  private def cabacCbp(cab: Cabac, models: Array[Int], pic: CabacPic,
                       ctx: Ctx, sid: Int, mbx: Int, mby: Int): Int = {
    var luma = 0
    var blk = 0
    while (blk < 4) {
      val inc = pic.cbpLumaInc(ctx, sid, mbx, mby, blk, luma)
      luma |= cab.decision(models, 73 + inc) << blk
      blk += 1
    }
    var chroma = 0
    if (cab.decision(models, 77 + pic.cbpChromaInc(ctx, sid, mbx, mby, 0)) == 1)
      chroma =
        if (cab.decision(models, 77 + pic.cbpChromaInc(ctx, sid, mbx, mby, 1)) == 1) 2
        else 1
    luma | (chroma << 4)
  }

  private def cabacQpDelta(cab: Cabac, models: Array[Int],
                           pic: CabacPic): Int = {
    val inc = if (pic.lastDeltaNz) 1 else 0
    var k = 0
    if (cab.decision(models, 60 + inc) == 1) {
      k = 1
      while (cab.decision(models, if (k == 1) 62 else 63) == 1) {
        k += 1
        if (k > 110) abort() // unary runaway on hostile bits
      }
    }
    val delta = if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    pic.lastDeltaNz = delta != 0
    delta
  }

  /** residual_block_cabac (7.3.5.3.3): coded_block_flag, significance
    * map, levels in reverse scan order. Fills `out` (length n,
    * scan-ordered) and returns the coded_block_flag. */
  private def cabacResidual(cab: Cabac, models: Array[Int], cat: Int,
                            n: Int, cbfInc: Int, out: Array[Int]): Int = {
    java.util.Arrays.fill(out, 0, n, 0)
    if (cab.decision(models, CBF_BASE + CAT_OFF_CBF(cat) + cbfInc) == 0)
      return 0
    val sigBase = SIG_BASE + CAT_OFF_SIG(cat)
    val lastBase = LAST_BASE + CAT_OFF_SIG(cat)
    val sig = new Array[Boolean](n)
    var numCoeff = n
    var i = 0
    while (i < numCoeff - 1) {
      val inc = if (cat == 3) math.min(i, 2) else i
      if (cab.decision(models, sigBase + inc) == 1) {
        sig(i) = true
        if (cab.decision(models, lastBase + inc) == 1) numCoeff = i + 1
      }
      i += 1
    }
    if (numCoeff == n) sig(n - 1) = true // implied significant
    val absBase = ABS_BASE + CAT_OFF_ABS(cat)
    var eq1 = 0
    var gt1 = 0
    i = numCoeff - 1
    while (i >= 0) {
      if (sig(i)) {
        val inc0 = if (gt1 != 0) 0 else math.min(4, 1 + eq1)
        val incRest = 5 + math.min(if (cat == 3) 3 else 4, gt1)
        var v = 0
        while (v < 14 &&
          cab.decision(models, absBase + (if (v == 0) inc0 else incRest)) == 1)
          v += 1
        if (v == 14) { // UEG0 suffix in bypass (9.3.2.3)
          var k = 0
          while (cab.bypass() == 1) {
            v += 1 << k
            k += 1
            if (k > 30) abort()
          }
          while (k > 0) { k -= 1; v += cab.bypass() << k }
        }
        var level = v + 1
        if (cab.bypass() == 1) level = -level
        out(i) = level
        if (v == 0) eq1 += 1 else gt1 += 1
      }
      i -= 1
    }
    1
  }

  /** CABAC twin of [[decodeSlice]]: same reconstruction, arithmetic
    * entropy layer. `pic` carries the picture-level neighbor state. */
  private def decodeSliceCabac(r: Reader, sps: Sps, pps: Pps, ctx: Ctx,
                               mbqp: Array[Array[Int]],
                               mbParams: Array[Array[Int]],
                               expectMb: Int, pic: CabacPic): Int = {
    val mbsX = sps.w / 16
    val mbsY = sps.h / 16
    val firstMb = r.ue()
    if (firstMb != expectMb) abort()
    val sid = firstMb
    val sliceType = r.ue()
    if (sliceType != 2 && sliceType != 7) abort()
    if (r.ue() != 0) abort() // pps_id
    r.u(sps.log2MaxFrameNum)
    r.ue() // idr_pic_id
    if (sps.pocType == 0) {
      r.u(sps.log2MaxPocLsb)
      if (pps.picOrder) r.se()
    }
    r.u(1); r.u(1) // dec_ref_pic_marking (IDR)
    var qpy = pps.qp + r.se()
    if (qpy < 0 || qpy > 51) abort()
    var deblockIdc = 0
    var offA = 0
    var offB = 0
    if (pps.deblockCtl) {
      deblockIdc = r.ue()
      if (deblockIdc > 2) abort()
      if (deblockIdc != 1) {
        offA = r.se() * 2
        offB = r.se() * 2
        if (offA < -12 || offA > 12 || offB < -12 || offB > 12) abort()
      }
    }
    val packedParams = (deblockIdc & 0xFF) | ((offA + 64) << 8) | ((offB + 64) << 16)
    while (r.pos % 8 != 0) if (r.bit() != 1) abort() // cabac_alignment_one_bit
    var cab = new Cabac(r)
    val models = cabacInitModels(qpy)
    pic.lastDeltaNz = false
    val zz = new Array[Int](16)
    val ac = new Array[Int](15)
    val pred16 = new Array[Int](256)
    val pred4 = new Array[Int](16)
    val pred8 = new Array[Int](64)
    val d = new Array[Int](16)
    var mbi = firstMb
    var done = false
    while (!done) {
      if (mbi >= mbsX * mbsY) abort() // slice overruns the picture
      val mbx = mbi % mbsX
      val mby = mbi / mbsX
      ctx.mbSlice(mby)(mbx) = sid
      mbParams(mby)(mbx) = packedParams
      val upOk = ctx.availUp(mbx * 16, mby * 16, sid, 16)
      val leftOk = ctx.availLeft(mbx * 16, mby * 16, sid, 16)
      val mbType = cabacMbType(cab, models, pic, ctx, sid, mbx, mby)
      if (mbType == 25) { // I_PCM: raw samples; engine re-inits after
        r.align()
        var j = 0
        while (j < 16) {
          var i = 0
          while (i < 16) { ctx.y((mby * 16 + j) * ctx.W + mbx * 16 + i) = r.u(8); i += 1 }
          j += 1
        }
        var pi = 0
        while (pi < 2) {
          val pl = if (pi == 0) ctx.u else ctx.v
          j = 0
          while (j < 8) {
            var i = 0
            while (i < 8) { pl((mby * 8 + j) * (ctx.W / 2) + mbx * 8 + i) = r.u(8); i += 1 }
            j += 1
          }
          pi += 1
        }
        var by = 0
        while (by < 4) {
          var bx = 0
          while (bx < 4) { ctx.i4mode(mby * 4 + by)(mbx * 4 + bx) = -1; bx += 1 }
          by += 1
        }
        mbqp(mby)(mbx) = 0
        pic.setPcm(mbx, mby)
        cab = new Cabac(r)
      } else if (mbType == 0) { // Intra_4x4
        pic.kind(mby)(mbx) = 0
        val flags = new Array[Int](16)
        val rems = new Array[Int](16)
        var blk = 0
        while (blk < 16) {
          flags(blk) = cab.decision(models, 68)
          if (flags(blk) == 0) { // FL cMax 7 is LSB-first (9.3.2.4)
            var rem = cab.decision(models, 69)
            rem |= cab.decision(models, 69) << 1
            rem |= cab.decision(models, 69) << 2
            rems(blk) = rem
          }
          blk += 1
        }
        val cmode = cabacCmode(cab, models, pic, ctx, sid, mbx, mby)
        pic.cmode(mby)(mbx) = cmode
        val cbp = cabacCbp(cab, models, pic, ctx, sid, mbx, mby)
        val cbpLuma = cbp & 15
        val cbpChroma = cbp >> 4 // the TU binarization caps this at 2
        pic.cbpLuma(mby)(mbx) = cbpLuma
        pic.cbpChroma(mby)(mbx) = cbpChroma
        if (cbp != 0) qpy = ((qpy + cabacQpDelta(cab, models, pic)) + 52) % 52
        else pic.lastDeltaNz = false
        mbqp(mby)(mbx) = qpy
        val qpc = qpcOf(qpy, pps.chromaOff)
        blk = 0
        while (blk < 16) {
          val x = mbx * 16 + blkX(blk) * 4
          val y = mby * 16 + blkY(blk) * 4
          val gx = x / 4
          val gy = y / 4
          val aL = ctx.availLeft(x, y, sid, 16)
          val aU = ctx.availUp(x, y, sid, 16)
          val predm = ctx.predI4Mode(gx, gy, aL, aU)
          val m = if (flags(blk) == 1) predm
          else if (rems(blk) < predm) rems(blk) else rems(blk) + 1
          ctx.i4mode(gy)(gx) = m
          pred4x4(ctx.y, ctx.W, ctx.W, x, y, m, pred4,
            aU, aL, ctx.availAr(x, y, sid))
          val quad = (if ((x % 16) >= 8) 1 else 0) + (if ((y % 16) >= 8) 2 else 0)
          if ((cbpLuma & (1 << quad)) != 0)
            pic.cbfY(gy)(gx) = cabacResidual(cab, models, 2, 16,
              pic.cbfYInc(ctx, sid, mbx, mby, gx, gy), zz)
          else java.util.Arrays.fill(zz, 0)
          var k = 0
          java.util.Arrays.fill(d, 0)
          while (k < 16) {
            val z = ZIGZAG(k)
            d(z) = dequantAc(zz(k), qpy, z / 4, z % 4)
            k += 1
          }
          reconBlock(ctx.y, ctx.W, x, y, pred4, d)
          blk += 1
        }
        decodeChromaCabac(cab, models, pic, ctx, sid, mbx, mby, cbpChroma,
          cmode, qpc, zz, ac, pred8, d, upOk, leftOk)
      } else if (mbType >= 1 && mbType <= 24) { // I_16x16
        val mode = (mbType - 1) % 4
        val cbpChroma = ((mbType - 1) / 4) % 3
        val cbpLuma = 15 * ((mbType - 1) / 12)
        pic.kind(mby)(mbx) = 1
        pic.cbpLuma(mby)(mbx) = cbpLuma
        pic.cbpChroma(mby)(mbx) = cbpChroma
        val cmode = cabacCmode(cab, models, pic, ctx, sid, mbx, mby)
        pic.cmode(mby)(mbx) = cmode
        qpy = ((qpy + cabacQpDelta(cab, models, pic)) + 52) % 52
        mbqp(mby)(mbx) = qpy
        val qpc = qpcOf(qpy, pps.chromaOff)
        predNxN(ctx.y, ctx.W, mbx * 16, mby * 16, 16, mode, chroma = false,
          pred16, upOk, leftOk)
        pic.cbfDcY(mby)(mbx) = cabacResidual(cab, models, 0, 16,
          pic.cbfDcYInc(ctx, sid, mbx, mby), zz)
        val dcm = new Array[Int](16)
        var k = 0
        while (k < 16) { dcm(ZIGZAG(k)) = zz(k); k += 1 }
        val dci = hadamard4(dcm)
        var blk = 0
        while (blk < 16) {
          val x = mbx * 16 + blkX(blk) * 4
          val y = mby * 16 + blkY(blk) * 4
          val gx = x / 4
          val gy = y / 4
          java.util.Arrays.fill(d, 0)
          if (cbpLuma != 0) {
            pic.cbfY(gy)(gx) = cabacResidual(cab, models, 1, 15,
              pic.cbfYInc(ctx, sid, mbx, mby, gx, gy), ac)
            var kk = 0
            while (kk < 15) {
              val z = ZIGZAG(kk + 1)
              d(z) = dequantAc(ac(kk), qpy, z / 4, z % 4)
              kk += 1
            }
          }
          ctx.i4mode(gy)(gx) = -1
          d(0) = dequantLumaDc(dci(blkY(blk) * 4 + blkX(blk)), qpy)
          var j = 0
          while (j < 4) {
            var i2 = 0
            while (i2 < 4) {
              pred4(j * 4 + i2) = pred16((blkY(blk) * 4 + j) * 16 + blkX(blk) * 4 + i2)
              i2 += 1
            }
            j += 1
          }
          reconBlock(ctx.y, ctx.W, x, y, pred4, d)
          blk += 1
        }
        decodeChromaCabac(cab, models, pic, ctx, sid, mbx, mby, cbpChroma,
          cmode, qpc, zz, ac, pred8, d, upOk, leftOk)
      } else abort()
      mbi += 1
      done = cab.terminate() == 1 // end_of_slice_flag
    }
    mbi
  }

  private def decodeChromaCabac(cab: Cabac, models: Array[Int],
                                pic: CabacPic, ctx: Ctx, sid: Int,
                                mbx: Int, mby: Int, cbpChroma: Int,
                                cmode: Int, qpc: Int, zz: Array[Int],
                                ac: Array[Int], pred8: Array[Int],
                                d: Array[Int], upOk: Boolean,
                                leftOk: Boolean): Unit = {
    val cw = ctx.W / 2
    val dcs = Array.fill(2)(new Array[Int](4))
    if (cbpChroma != 0) {
      var pi = 0
      while (pi < 2) {
        pic.cbfDcC(pi)(mby)(mbx) = cabacResidual(cab, models, 3, 4,
          pic.cbfDcCInc(ctx, sid, mbx, mby, pi), zz)
        Array.copy(zz, 0, dcs(pi), 0, 4)
        pi += 1
      }
    }
    var pi = 0
    while (pi < 2) {
      val pl = if (pi == 0) ctx.u else ctx.v
      predNxN(pl, cw, mbx * 8, mby * 8, 8, cmode, chroma = true, pred8,
        upOk, leftOk)
      val acs = Array.fill(4)(new Array[Int](15))
      var blk = 0
      while (blk < 4) {
        val gx = mbx * 2 + blk % 2
        val gy = mby * 2 + blk / 2
        if (cbpChroma == 2) {
          pic.cbfC(pi)(gy)(gx) = cabacResidual(cab, models, 4, 15,
            pic.cbfCInc(ctx, sid, mbx, mby, gx, gy, pi), ac)
          Array.copy(ac, 0, acs(blk), 0, 15)
        }
        blk += 1
      }
      val f = dcs(pi)
      val dci = Array(f(0) + f(1) + f(2) + f(3), f(0) - f(1) + f(2) - f(3),
        f(0) + f(1) - f(2) - f(3), f(0) - f(1) - f(2) + f(3))
      blk = 0
      while (blk < 4) {
        val bx = blk % 2
        val by = blk / 2
        java.util.Arrays.fill(d, 0)
        var kk = 0
        while (kk < 15) {
          val z = ZIGZAG(kk + 1)
          d(z) = dequantAc(acs(blk)(kk), qpc, z / 4, z % 4)
          kk += 1
        }
        if (cbpChroma != 0) d(0) = dequantChromaDc(dci(blk), qpc)
        val p4 = new Array[Int](16)
        var j = 0
        while (j < 4) {
          var i2 = 0
          while (i2 < 4) { p4(j * 4 + i2) = pred8((by * 4 + j) * 8 + bx * 4 + i2); i2 += 1 }
          j += 1
        }
        reconBlock(pl, cw, mbx * 8 + bx * 4, mby * 8 + by * 4, p4, d)
        blk += 1
      }
      pi += 1
    }
  }

  // ------------------------------------------------------ entry points

  /** Decode the first IDR picture of an Annex-B stream (SPS+PPS+IDR,
    * the picture possibly split across several slice NALs). Null on
    * hostile/unsupported/incomplete input. */
  def decodeAnnexB(b: Array[Byte]): Frame = {
    if (b == null || b.length < 8) return null
    try {
      var sps: Sps = null
      var pps: Pps = null
      var ctx: Ctx = null
      var mbqp: Array[Array[Int]] = null
      var mbParams: Array[Array[Int]] = null
      var pic: CabacPic = null
      var nextMb = 0
      var total = Int.MaxValue
      splitNals(b).foreach { case (typ, rbsp) =>
        typ match {
          case 7 => sps = parseSps(rbsp)
          case 8 => pps = parsePps(rbsp)
          case 5 if sps != null && pps != null && nextMb < total =>
            if (ctx == null) {
              total = (sps.w / 16) * (sps.h / 16)
              // allocation guard: a legal I-picture needs well over two
              // bits per MB — refuse hostile SPS dims whose frame context
              // would dwarf the actual stream (the 4 KB 8192x8192 bomb);
              // parseSps additionally hard-caps total pixels at 2^24
              if (b.length.toLong * 4L < total) abort()
              ctx = new Ctx(sps.w, sps.h)
              mbqp = Array.fill(sps.h / 16, sps.w / 16)(0)
              // default params = idc 1 (off) until a slice stamps its MBs
              mbParams = Array.fill(sps.h / 16, sps.w / 16)(1)
              if (pps.cabac) pic = new CabacPic(sps.w / 16, sps.h / 16)
            }
            nextMb =
              if (pps.cabac) decodeSliceCabac(new Reader(rbsp), sps, pps,
                ctx, mbqp, mbParams, nextMb, pic)
              else decodeSlice(new Reader(rbsp), sps, pps, ctx, mbqp,
                mbParams, nextMb)
          case _ => ()
        }
      }
      if (ctx == null || nextMb < total) return null // no/incomplete picture
      deblock(ctx, mbqp, pps.chromaOff, mbParams)
      crop(ctx, sps)
    } catch { case _: Abort | _: ArrayIndexOutOfBoundsException |
                   _: NegativeArraySizeException => null }
  }

  /** Decode one IDR picture given raw SPS/PPS NAL units and the escaped
    * IDR NAL payloads (possibly several slices) — the avcC +
    * length-prefixed-sample shape MP4 carries. */
  def decodeAvcc(spsNal: Array[Byte], ppsNal: Array[Byte],
                 idrNals: Seq[Array[Byte]]): Frame = {
    if (spsNal == null || ppsNal == null || idrNals == null || idrNals.isEmpty)
      return null
    try {
      val sps = parseSps(unescape(spsNal, 0, spsNal.length))
      val pps = parsePps(unescape(ppsNal, 0, ppsNal.length))
      // allocation guard, same rationale as decodeAnnexB (parseSps
      // hard-caps total pixels at 2^24 before this point)
      if (idrNals.iterator.map(_.length.toLong).sum * 4L <
        (sps.w / 16).toLong * (sps.h / 16)) abort()
      val ctx = new Ctx(sps.w, sps.h)
      val mbqp = Array.fill(sps.h / 16, sps.w / 16)(0)
      val mbParams = Array.fill(sps.h / 16, sps.w / 16)(1)
      val pic = if (pps.cabac) new CabacPic(sps.w / 16, sps.h / 16) else null
      var nextMb = 0
      idrNals.foreach { nal =>
        val rr = new Reader(unescape(nal, 0, nal.length))
        nextMb =
          if (pps.cabac) decodeSliceCabac(rr, sps, pps, ctx, mbqp,
            mbParams, nextMb, pic)
          else decodeSlice(rr, sps, pps, ctx, mbqp, mbParams, nextMb)
      }
      if (nextMb < (sps.w / 16) * (sps.h / 16)) return null // incomplete
      deblock(ctx, mbqp, pps.chromaOff, mbParams)
      crop(ctx, sps)
    } catch { case _: Abort | _: ArrayIndexOutOfBoundsException |
                   _: NegativeArraySizeException => null }
  }

  /** Display dimensions from a raw (unescaped) SPS RBSP — container
    * metadata for formats that declare none themselves (MPEG-TS).
    * Null on unparseable/unsupported SPS. */
  private[functions] def spsDisplayDims(rbsp: Array[Byte]): (Int, Int) =
    try {
      val s = parseSps(rbsp)
      (s.w - s.cropL - s.cropR, s.h - s.cropT - s.cropB)
    } catch { case _: Abort | _: ArrayIndexOutOfBoundsException => null }

  private def crop(ctx: Ctx, sps: Sps): Frame = {
    val w = ctx.W - sps.cropL - sps.cropR
    val h = ctx.H - sps.cropT - sps.cropB
    if (w <= 0 || h <= 0) return null
    if (w == ctx.W && h == ctx.H) return Frame(w, h, ctx.y, ctx.u, ctx.v)
    val y = new Array[Int](w * h)
    val u = new Array[Int]((w / 2) * (h / 2))
    val v = new Array[Int]((w / 2) * (h / 2))
    var j = 0
    while (j < h) {
      Array.copy(ctx.y, (sps.cropT + j) * ctx.W + sps.cropL, y, j * w, w)
      j += 1
    }
    j = 0
    while (j < h / 2) {
      val src = (sps.cropT / 2 + j) * (ctx.W / 2) + sps.cropL / 2
      Array.copy(ctx.u, src, u, j * (w / 2), w / 2)
      Array.copy(ctx.v, src, v, j * (w / 2), w / 2)
      j += 1
    }
    Frame(w, h, y, u, v)
  }
}

package graft.functions

/**
 * WebP lossless (VP8L) codec — RFC 9649 / the public "WebP Lossless
 * Bitstream Specification". Decoder scope:
 *
 *  - RIFF container: bare `VP8L` chunks, `VP8X`-wrapped files, and
 *    animations via their FIRST `ANMF` frame (the signature-bearing
 *    frame for dedup; later frames are deltas against a canvas state
 *    that carries no extra near-dup signal worth the decode);
 *  - the full VP8L still-image stream: canonical prefix codes (simple
 *    2-symbol and code-length-coded forms, incl. the 16/17/18 repeat
 *    extensions and the max_symbol early cutoff), LZ77 backward
 *    references with the 120-entry 2-D distance map, color cache,
 *    meta-prefix (spatially varying code groups), and all four
 *    transforms: predictor (14 modes), cross-color, subtract-green,
 *    color indexing (incl. sub-byte pixel packing for palettes <= 16);
 *  - `ALPH` lossless alpha planes (compression method 1): the same
 *    stream without the 5-byte header, alpha in the green channel —
 *    this is how real libwebp bitstreams are cross-validated in specs
 *    (WebpSpec decodes a libwebp-written alpha stream from the CPython
 *    test suite), since the JDK has no WebP ImageIO plugin to diff
 *    against.
 *
 * Lossy VP8 stills decode through [[Vp8]] (RFC 6386 is exact-integer
 * end to end, same as VP8L, so lossy decode IS bit-portable across
 * implementations — Vp8Spec proves plane-equality against libwebp);
 * [[decodeGray]] dispatches to whichever chunk the container carries.
 *
 * Everything is integer arithmetic; decode of a given byte array is
 * bit-identical on any JVM, so pHash-family signatures over WebP
 * payloads are cluster-stable (the same determinism contract as
 * [[Jpeg]] and [[ImageKernels.decodePng]]).
 *
 * The encoder exists for fixtures and round-trip specs: a minimal legal
 * gray stream (subtract-green transform, one code group, 8-bit literal
 * green code via the code-length code, single-symbol red/blue/alpha/
 * distance codes) — deliberately simple, it exercises the normal-code
 * reader and one transform inverse while platform validation rides on
 * the libwebp alpha stream.
 *
 * Reference semantics: earthmover has no WebP support (beyond-reference
 * tier); format per RFC 9649 §3 (container) and the lossless bitstream
 * sections cited inline.
 */
object Webp {

  import ImageKernels.Gray

  // ------------------------------------------------------------ bit I/O

  /** LSB-first bit reader (VP8L convention: first bit read is the least
    * significant bit of the value, like DEFLATE). Reading past the end
    * throws — callers surface it as a null decode. */
  private final class BitReader(b: Array[Byte], start: Int) {
    private var pos = start
    private var acc = 0L
    private var nBits = 0
    private var overrun = 0 // zero-fill bytes pulled past the end (peeks)
    def readBits(n: Int): Int = {
      fill(n)
      // zero-fill occupies the TOP overrun*8 bits of the window; consuming
      // into it means the stream was truncated
      if (n > nBits - overrun * 8) throw new IllegalArgumentException("vp8l: EOF")
      val v = (acc & ((1L << n) - 1)).toInt
      acc >>>= n
      nBits -= n
      v
    }
    private def fill(n: Int): Unit =
      while (nBits < n) {
        if (pos >= b.length) { overrun += 1 }
        else { acc |= (b(pos) & 0xFFL) << nBits; pos += 1 }
        nBits += 8
      }
    /** Next `n` bits without consuming; zero-filled past the end (the
      * table decode peeks the max code length, then consumes the real
      * one — consuming past the end still throws). */
    def peekBits(n: Int): Int = {
      fill(n)
      (acc & ((1L << n) - 1)).toInt
    }
    def consumeBits(n: Int): Unit = {
      if (n > nBits - overrun * 8) throw new IllegalArgumentException("vp8l: EOF")
      acc >>>= n
      nBits -= n
    }
    def readBit(): Int = readBits(1)
  }

  // --------------------------------------------------- canonical codes

  /** Canonical prefix code: codes assigned DEFLATE-style (ascending
    * length, then symbol), first bit read = most significant bit of the
    * code. Decoded via one flat maxLen-bit lookup table (codes stored
    * bit-reversed so the LSB-first peek indexes directly — the classic
    * single-level DEFLATE table); a single-symbol code reads zero bits. */
  private final class PrefixCode(lengths: Array[Int]) {
    private val present = lengths.zipWithIndex.filter(_._1 > 0)
    require(present.nonEmpty, "vp8l: empty prefix code")
    val trivialSymbol: Int = if (present.length == 1) present.head._2 else -1
    private var maxLen = 0
    // flat table: low maxLen peeked bits -> (len << 16) | symbol
    private val table: Array[Int] =
      if (trivialSymbol >= 0) null
      else {
        maxLen = present.map(_._1).max
        require(maxLen <= 15, s"vp8l: code length $maxLen > 15")
        val blCount = new Array[Int](maxLen + 1)
        present.foreach { case (l, _) => blCount(l) += 1 }
        // completeness (Kraft): an over/under-subscribed code is corrupt
        var kraft = 0L
        for (l <- 1 to maxLen) kraft += blCount(l).toLong << (maxLen - l)
        require(kraft == (1L << maxLen), "vp8l: incomplete prefix code")
        val nextCode = new Array[Int](maxLen + 2)
        var code = 0
        for (l <- 1 to maxLen) {
          code = (code + blCount(l - 1)) << 1
          nextCode(l) = code
        }
        val t = new Array[Int](1 << maxLen)
        lengths.zipWithIndex.foreach { case (l, sym) =>
          if (l > 0) {
            val c = nextCode(l)
            nextCode(l) += 1
            // reverse the l code bits so bit j of the index is the j-th
            // bit read (= bit l-1-j of the canonical code)
            var rev = 0
            var j = 0
            while (j < l) { rev |= ((c >> (l - 1 - j)) & 1) << j; j += 1 }
            val entry = (l << 16) | sym
            var idx = rev
            while (idx < t.length) { t(idx) = entry; idx += (1 << l) }
          }
        }
        t
      }
    def decode(r: BitReader): Int = {
      if (trivialSymbol >= 0) return trivialSymbol
      val e = table(r.peekBits(maxLen))
      r.consumeBits(e >>> 16)
      e & 0xFFFF
    }
  }

  /** Code-length symbols are transmitted in this fixed order (spec). */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code: 1 bit selects the simple (1-2 symbol) form or
    * the code-length-coded form with 16/17/18 repeats and the optional
    * max_symbol cutoff. */
  private def readPrefixCode(r: BitReader, alphabetSize: Int): PrefixCode = {
    val lengths = new Array[Int](alphabetSize)
    if (r.readBit() == 1) { // simple
      val numSymbols = r.readBits(1) + 1
      val first =
        if (r.readBit() == 1) r.readBits(8) else r.readBits(1)
      require(first < alphabetSize, "vp8l: simple symbol out of range")
      if (numSymbols == 1) lengths(first) = 1 // trivial: 0 bits on decode
      else {
        val second = r.readBits(8)
        require(second < alphabetSize, "vp8l: simple symbol out of range")
        lengths(first) = 1
        lengths(second) = 1
      }
    } else {
      val numCl = 4 + r.readBits(4)
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = r.readBits(3); i += 1 }
      val clCode = new PrefixCode(clLengths)
      var maxSymbol =
        if (r.readBit() == 1) {
          val nbits = 2 + 2 * r.readBits(3)
          2 + r.readBits(nbits)
        } else alphabetSize
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.decode(r)
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repeat, len) = cl match {
            case 16 => (3 + r.readBits(2), prevLen)
            case 17 => (3 + r.readBits(3), 0)
            case _ => (11 + r.readBits(7), 0)
          }
          require(symbol + repeat <= alphabetSize, "vp8l: repeat overflows alphabet")
          var k = 0
          while (k < repeat) { lengths(symbol) = len; symbol += 1; k += 1 }
        }
      }
    }
    new PrefixCode(lengths)
  }

  // ------------------------------------------------------- LZ77 pieces

  /** Length/distance prefix decode (spec: prefix < 4 is the value + 1,
    * larger prefixes carry extra bits). */
  private def lz77Value(prefix: Int, r: BitReader): Int =
    if (prefix < 4) prefix + 1
    else {
      val extraBits = (prefix - 2) >> 1
      val offset = (2 + (prefix & 1)) << extraBits
      offset + r.readBits(extraBits) + 1
    }

  /** The 120 short-distance codes map to 2-D (dx, dy) neighbors; codes
    * above 120 are plain linear distances (spec distance mapping). */
  private val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (4, 8), (-4, 8), (8, 6),
    (7, 6), (-7, 6), (8, 7))

  private def mapDistance(distCode: Int, width: Int): Int =
    if (distCode > 120) distCode - 120
    else {
      val (dx, dy) = DistanceMap(distCode - 1)
      math.max(1, dy * width + dx)
    }

  // ----------------------------------------------------- transforms

  private sealed trait Transform { def inputWidth: Int }
  private final case class PredictorT(bits: Int, inputWidth: Int,
                                      image: Array[Int]) extends Transform
  private final case class ColorT(bits: Int, inputWidth: Int,
                                  image: Array[Int]) extends Transform
  private final case class SubtractGreenT(inputWidth: Int) extends Transform
  private final case class IndexingT(inputWidth: Int, widthBits: Int,
                                     palette: Array[Int]) extends Transform

  // ------------------------------------------------ stream decoding

  /** One code group: green/length/cache, red, blue, alpha, distance. */
  private final case class Group(g: PrefixCode, r: PrefixCode, b: PrefixCode,
                                 a: PrefixCode, d: PrefixCode)

  /** Decode an entropy-coded ARGB image; `level0` allows transforms and
    * the meta-prefix image (spec: both appear only in the top-level
    * stream — transform data and the entropy image itself are plain). */
  private def decodeImageStream(r: BitReader, width0: Int, height: Int,
                                level0: Boolean): Array[Int] = {
    var width = width0
    var transforms = List.empty[Transform]
    if (level0) {
      var seen = Set.empty[Int]
      while (r.readBit() == 1) {
        val t = r.readBits(2)
        require(!seen(t), "vp8l: duplicate transform")
        seen += t
        t match {
          case 0 | 1 => // predictor / cross-color: per-block subimage
            val bits = r.readBits(3) + 2
            val bw = (width + (1 << bits) - 1) >> bits
            val bh = (height + (1 << bits) - 1) >> bits
            val img = decodeImageStream(r, bw, bh, level0 = false)
            transforms ::=
              (if (t == 0) PredictorT(bits, width, img) else ColorT(bits, width, img))
          case 2 =>
            transforms ::= SubtractGreenT(width)
          case _ =>
            val paletteSize = r.readBits(8) + 1
            val raw = decodeImageStream(r, paletteSize, 1, level0 = false)
            // palette entries are component-wise deltas from the previous
            val pal = new Array[Int](paletteSize)
            var prev = 0
            var i = 0
            while (i < paletteSize) {
              val p = raw(i)
              val v = (((prev >>> 24) + (p >>> 24)) & 0xFF) << 24 |
                ((((prev >> 16) & 0xFF) + ((p >> 16) & 0xFF)) & 0xFF) << 16 |
                ((((prev >> 8) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF) << 8 |
                (((prev & 0xFF) + (p & 0xFF)) & 0xFF)
              pal(i) = v
              prev = v
              i += 1
            }
            val wb = if (paletteSize <= 2) 3
              else if (paletteSize <= 4) 2
              else if (paletteSize <= 16) 1
              else 0
            transforms ::= IndexingT(width, wb, pal)
            width = (width + (1 << wb) - 1) >> wb
        }
      }
    }

    // color cache (read at every level)
    val cacheBits = if (r.readBit() == 1) r.readBits(4) else 0
    require(cacheBits <= 11, "vp8l: cache bits > 11")
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null

    // meta-prefix image (level0 only)
    var metaBits = 0
    var metaImage: Array[Int] = null
    var numGroups = 1
    if (level0 && r.readBit() == 1) {
      metaBits = r.readBits(3) + 2
      val mw = (width + (1 << metaBits) - 1) >> metaBits
      val mh = (height + (1 << metaBits) - 1) >> metaBits
      metaImage = decodeImageStream(r, mw, mh, level0 = false)
      var mx = 0
      metaImage = metaImage.map(p => ((p >> 8) & 0xFFFF)) // (r<<8)|g
      metaImage.foreach(m => mx = math.max(mx, m))
      numGroups = mx + 1
    }

    val greenAlphabet = 256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0)
    val groups = Array.fill(numGroups)(Group(
      readPrefixCode(r, greenAlphabet),
      readPrefixCode(r, 256), readPrefixCode(r, 256),
      readPrefixCode(r, 256), readPrefixCode(r, 40)))

    val n = width * height
    require(n.toLong == width.toLong * height && n <= (1 << 26), "vp8l: image too large")
    val px = new Array[Int](n)
    val metaW = if (metaImage != null) (width + (1 << metaBits) - 1) >> metaBits else 0
    def groupAt(pos: Int): Group =
      if (metaImage == null) groups(0)
      else {
        val x = pos % width; val y = pos / width
        groups(metaImage((y >> metaBits) * metaW + (x >> metaBits)))
      }
    def cacheInsert(argb: Int): Unit =
      if (cache != null)
        cache(((0x1e35a7bd * argb) >>> (32 - cacheBits))) = argb

    var pos = 0
    while (pos < n) {
      val grp = groupAt(pos)
      val s = grp.g.decode(r)
      if (s < 256) {
        val green = s
        val red = grp.r.decode(r)
        val blue = grp.b.decode(r)
        val alpha = grp.a.decode(r)
        val argb = (alpha << 24) | (red << 16) | (green << 8) | blue
        px(pos) = argb
        cacheInsert(argb)
        pos += 1
      } else if (s < 256 + 24) {
        val length = lz77Value(s - 256, r)
        val distCode = lz77Value(grp.d.decode(r), r)
        val dist = mapDistance(distCode, width)
        require(dist <= pos && pos + length <= n, "vp8l: bad backward reference")
        var k = 0
        while (k < length) {
          val v = px(pos - dist)
          px(pos) = v
          cacheInsert(v)
          pos += 1
          k += 1
        }
      } else {
        require(cache != null, "vp8l: cache symbol without cache")
        val v = cache(s - 256 - 24)
        px(pos) = v
        // re-insert is a no-op but keeps the single code path
        cacheInsert(v)
        pos += 1
      }
    }

    // apply inverse transforms in reverse-of-read order (most recently
    // read first — `transforms` is already a stack)
    transforms.foldLeft(px)((img, t) => invertTransform(img, height, t))
  }

  private def avg2(a: Int, b: Int): Int =
    (((a >>> 24) + (b >>> 24)) / 2) << 24 |
      ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) / 2) << 16 |
      ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) / 2) << 8 |
      (((a & 0xFF) + (b & 0xFF)) / 2)

  private def addPixels(a: Int, b: Int): Int =
    (((a >>> 24) + (b >>> 24)) & 0xFF) << 24 |
      ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16 |
      ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8 |
      (((a & 0xFF) + (b & 0xFF)) & 0xFF)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Select predictor (mode 11, spec §predictor transform): the Manhattan
    * distance in ARGB space between the L/T pixels and the L+T-TL plane
    * prediction picks the closer of L and T. */
  private def select(l: Int, t: Int, tl: Int): Int = {
    def c(p: Int, s: Int) = (p >>> s) & 0xFF
    var pl = 0; var pt = 0
    var s = 0
    while (s < 32) {
      val pred = c(l, s) + c(t, s) - c(tl, s)
      pl += math.abs(pred - c(l, s))
      pt += math.abs(pred - c(t, s))
      s += 8
    }
    if (pl < pt) l else t
  }

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    def ch(s: Int) = clamp255(((a >>> s) & 0xFF) + ((b >>> s) & 0xFF) - ((c >>> s) & 0xFF))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(a: Int, c: Int): Int = {
    def ch(s: Int) = {
      val av = (a >>> s) & 0xFF; val cv = (c >>> s) & 0xFF
      clamp255(av + (av - cv) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def colorTransformDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  private def invertTransform(img: Array[Int], height: Int, t: Transform): Array[Int] = t match {
    case SubtractGreenT(w) =>
      var i = 0
      while (i < img.length) {
        val p = img(i)
        val g = (p >> 8) & 0xFF
        val r = (((p >> 16) & 0xFF) + g) & 0xFF
        val b = ((p & 0xFF) + g) & 0xFF
        img(i) = (p & 0xFF00FF00) | (r << 16) | b
        i += 1
      }
      img

    case PredictorT(bits, w, modes) =>
      val bw = (w + (1 << bits) - 1) >> bits
      var i = 0
      while (i < img.length) {
        val x = i % w; val y = i / w
        val pred: Int =
          if (x == 0 && y == 0) 0xFF000000
          else if (y == 0) img(i - 1) // top row: L
          else if (x == 0) img(i - w) // left column: T
          else {
            val mode = (modes((y >> bits) * bw + (x >> bits)) >> 8) & 0xFF
            val l = img(i - 1)
            val tp = img(i - w)
            val tl = img(i - w - 1)
            // TR: one past T in the flat array — wraps to (0, y) on the
            // rightmost column, matching the contiguous-buffer reference
            // decoder behavior the spec encodes
            val tr = img(i - w + 1)
            mode match {
              case 0 => 0xFF000000
              case 1 => l
              case 2 => tp
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), tp)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, tp)
              case 8 => avg2(tl, tp)
              case 9 => avg2(tp, tr)
              case 10 => avg2(avg2(l, tl), avg2(tp, tr))
              case 11 => select(l, tp, tl)
              case 12 => clampAddSubtractFull(l, tp, tl)
              case 13 => clampAddSubtractHalf(avg2(l, tp), tl)
              case _ => throw new IllegalArgumentException(s"vp8l: predictor mode $mode")
            }
          }
        img(i) = addPixels(img(i), pred)
        i += 1
      }
      img

    case ColorT(bits, w, elems) =>
      val bw = (w + (1 << bits) - 1) >> bits
      var i = 0
      while (i < img.length) {
        val x = i % w; val y = i / w
        val e = elems((y >> bits) * bw + (x >> bits))
        // ColorTransformElement: green_to_red = blue(e),
        // green_to_blue = green(e), red_to_blue = red(e) (spec)
        val g2r = e & 0xFF
        val g2b = (e >> 8) & 0xFF
        val r2b = (e >> 16) & 0xFF
        val p = img(i)
        val g = (p >> 8) & 0xFF
        var red = (p >> 16) & 0xFF
        var blue = p & 0xFF
        red = (red + colorTransformDelta(g2r, g)) & 0xFF
        blue = (blue + colorTransformDelta(g2b, g)) & 0xFF
        blue = (blue + colorTransformDelta(r2b, red)) & 0xFF
        img(i) = (p & 0xFF00FF00) | (red << 16) | blue
        i += 1
      }
      img

    case IndexingT(w, wb, palette) =>
      if (wb == 0) {
        var i = 0
        while (i < img.length) {
          val idx = (img(i) >> 8) & 0xFF
          img(i) = if (idx < palette.length) palette(idx) else 0
          i += 1
        }
        img
      } else {
        val packedW = (w + (1 << wb) - 1) >> wb
        val perByte = 1 << wb
        val idxBits = 8 >> wb // bits per index
        val mask = (1 << idxBits) - 1
        val out = new Array[Int](w * height)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < w) {
            val packed = (img(y * packedW + (x >> wb)) >> 8) & 0xFF
            val idx = (packed >> ((x & (perByte - 1)) * idxBits)) & mask
            out(y * w + x) = if (idx < palette.length) palette(idx) else 0
            x += 1
          }
          y += 1
        }
        out
      }
  }

  // ---------------------------------------------------------- fronts

  /** Decode the VP8L payload (starting at the 0x2F signature) to
    * (width, height, ARGB pixels); throws on corrupt input. */
  private[functions] def decodeVp8l(payload: Array[Byte], off: Int): (Int, Int, Array[Int]) = {
    require(off < payload.length && (payload(off) & 0xFF) == 0x2F, "vp8l: bad signature")
    val r = new BitReader(payload, off + 1)
    val w = r.readBits(14) + 1
    val h = r.readBits(14) + 1
    r.readBit() // alpha hint
    require(r.readBits(3) == 0, "vp8l: unknown version")
    (w, h, decodeImageStream(r, w, h, level0 = true))
  }

  /** Decode a lossless `ALPH` payload (VP8L stream WITHOUT the header;
    * dimensions come from the frame) — alpha values are the green
    * channel. Used by specs to cross-validate against real libwebp
    * bitstreams; returns null on failure. */
  private[functions] def decodeAlphaLossless(data: Array[Byte], off: Int,
                                             w: Int, h: Int): Array[Int] =
    try {
      val r = new BitReader(data, off)
      decodeImageStream(r, w, h, level0 = true).map(p => (p >> 8) & 0xFF)
    } catch { case _: Exception => null }

  /** Find the lossy `VP8 ` chunk in a WebP RIFF container (bare,
    * VP8X-wrapped, or the FIRST `ANMF` frame of an animation — same
    * first-still-only scope as the VP8L path); returns (offset, length)
    * of the frame, or null. */
  private[graft] def findVp8(b: Array[Byte]): (Int, Int) = {
    if (b == null || b.length < 20) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return null
    def walk(start: Int, end: Int): (Int, Int) = {
      var p = start
      while (p + 8 <= end) {
        val tag = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = (b(p + 4) & 0xFF) | ((b(p + 5) & 0xFF) << 8) |
          ((b(p + 6) & 0xFF) << 16) | ((b(p + 7) & 0xFF) << 24)
        if (size < 0 || p + 8 + size > end) return null
        if (tag == "VP8 ") return (p + 8, size)
        if (tag == "ANMF" && size > 16) {
          // 16-byte frame params, then the frame's own subchunks
          val r = walk(p + 8 + 16, p + 8 + size)
          if (r != null) return r
        }
        p += 8 + size + (size & 1)
      }
      null
    }
    walk(12, b.length)
  }

  /** Find the VP8L chunk in a WebP RIFF container (bare, VP8X-wrapped, or
    * the FIRST `ANMF` frame of an animation); returns the offset of the
    * 0x2F signature byte, or -1. */
  private def findVp8l(b: Array[Byte]): Int = {
    if (b == null || b.length < 20) return -1
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return -1
    def walk(start: Int, end: Int): Int = {
      var p = start
      while (p + 8 <= end) {
        val tag = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = (b(p + 4) & 0xFF) | ((b(p + 5) & 0xFF) << 8) |
          ((b(p + 6) & 0xFF) << 16) | ((b(p + 7) & 0xFF) << 24)
        if (size < 0 || p + 8 + size > end) return -1
        if (tag == "VP8L") return p + 8
        if (tag == "ANMF" && size > 16) {
          val r = walk(p + 8 + 16, p + 8 + size)
          if (r >= 0) return r
        }
        p += 8 + size + (size & 1) // chunks are even-padded
      }
      -1
    }
    walk(12, b.length)
  }

  /** Animated-WebP frame extraction (the [[MediaKernels.videoFrames]]
    * face, symmetric with the GIF path): each ANMF frame's luma decodes
    * natively (VP8 keyframe Y plane or VP8L BT.601) and composites onto
    * the VP8X canvas at its 2x-scaled offsets; the dispose-to-background
    * flag restores the frame rect to the ANIM background luma. Snapshots
    * re-encode as grayscale PNG payloads. Null for non-animations, empty
    * when nothing composites; never throws on hostile bytes. */
  /** Animated-WebP video metadata: (canvasW, canvasH, durationMs) from
    * VP8X canvas dims + summed ANMF frame durations (u24 ms at ANMF+12).
    * Null unless the VP8X animation flag is set AND >= 2 ANMF frames —
    * stills stay image_meta's face, same contract as gifMeta. */
  private[functions] def animMeta(b: Array[Byte]): Array[Long] = {
    try {
      if (b == null || b.length < 30 ||
        !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return null
      def u24(p: Int) = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) | ((b(p + 2) & 0xFF) << 16)
      var p = 12
      var sw = 0L; var sh = 0L
      var animated = false
      var frames = 0L; var durMs = 0L
      while (p + 8 <= b.length) {
        val tag = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = (b(p + 4) & 0xFF) | ((b(p + 5) & 0xFF) << 8) |
          ((b(p + 6) & 0xFF) << 16) | ((b(p + 7) & 0xFF) << 24)
        if (size < 0 || p + 8 + size > b.length) return null
        val d = p + 8
        tag match {
          case "VP8X" if size >= 10 =>
            animated = (b(d) & 0x02) != 0
            sw = u24(d + 4) + 1; sh = u24(d + 7) + 1
          case "ANMF" if animated && size >= 16 =>
            frames += 1; durMs += u24(d + 12)
          case _ => ()
        }
        p = d + size + (size & 1)
      }
      if (!animated || frames < 2) null else Array(sw, sh, durMs)
    } catch { case _: Exception => null }
  }

  /** Codec of the first ANMF frame's bitstream chunk ("VP8" lossy /
    * "VP8L" lossless) — the diagnosability column for animated WebP. */
  private[functions] def animCodec(b: Array[Byte]): String = {
    try {
      if (b == null || b.length < 30) return null
      var p = 12
      while (p + 8 <= b.length) {
        val tag = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = (b(p + 4) & 0xFF) | ((b(p + 5) & 0xFF) << 8) |
          ((b(p + 6) & 0xFF) << 16) | ((b(p + 7) & 0xFF) << 24)
        if (size < 0 || p + 8 + size > b.length) return null
        if (tag == "ANMF" && size > 24) {
          // sub-chunks start at +16: ALPH may precede the frame chunk
          var q = p + 8 + 16
          while (q + 8 <= p + 8 + size) {
            val st = new String(b, q, 4, java.nio.charset.StandardCharsets.US_ASCII)
            if (st == "VP8 " || st == "VP8L") return st.trim
            val ss = (b(q + 4) & 0xFF) | ((b(q + 5) & 0xFF) << 8) |
              ((b(q + 6) & 0xFF) << 16) | ((b(q + 7) & 0xFF) << 24)
            if (ss < 0) return null
            q += 8 + ss + (ss & 1)
          }
          return null
        }
        p = p + 8 + size + (size & 1)
      }
      null
    } catch { case _: Exception => null }
  }

  private[functions] def animFrames(b: Array[Byte]): Array[Array[Byte]] = {
    try {
      if (b == null || b.length < 30 ||
        !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return null
      def u24(p: Int) = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) | ((b(p + 2) & 0xFF) << 16)
      var p = 12
      var sw = 0; var sh = 0
      var animated = false
      var bgLuma = 255 // ANIM background default: opaque white-ish
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var canvas: Array[Int] = null
      while (p + 8 <= b.length && frames.length < 512) {
        val tag = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = (b(p + 4) & 0xFF) | ((b(p + 5) & 0xFF) << 8) |
          ((b(p + 6) & 0xFF) << 16) | ((b(p + 7) & 0xFF) << 24)
        if (size < 0 || p + 8 + size > b.length) return if (animated) frames.toArray else null
        val d = p + 8
        tag match {
          case "VP8X" if size >= 10 =>
            animated = (b(d) & 0x02) != 0
            sw = u24(d + 4) + 1; sh = u24(d + 7) + 1
            if (sw.toLong * sh > 16L * 1024 * 1024) return Array.empty
          case "ANIM" if size >= 6 =>
            // BGRA background: BT.601 luma of the opaque part
            bgLuma = (299 * (b(d + 2) & 0xFF) + 587 * (b(d + 1) & 0xFF) +
              114 * (b(d) & 0xFF)) / 1000
          case "ANMF" if animated && size > 16 && sw > 0 =>
            if (canvas == null) canvas = Array.fill(sw * sh)(bgLuma)
            val fx = u24(d) * 2; val fy = u24(d + 3) * 2
            val dispose = (b(d + 15) & 0x01) != 0
            // blending method (bit 1): 0 = alpha-blend onto the canvas,
            // 1 = overwrite; our canvas is an opaque luma plane, so the
            // blend is src*a + dst*(255-a) over 255 (integer floor)
            val blend = (b(d + 15) & 0x02) == 0
            val sub = frameLuma(b, d + 16, d + size)
            if (sub != null) {
              val (fw, fh, px, alpha) = sub
              var y = 0
              while (y < fh) {
                val cy = fy + y
                if (cy < sh) {
                  var x = 0
                  while (x < fw) {
                    val cx = fx + x
                    if (cx < sw) {
                      val i = y * fw + x
                      val ci = cy * sw + cx
                      canvas(ci) =
                        if (blend && alpha != null)
                          (px(i) * alpha(i) + canvas(ci) * (255 - alpha(i))) / 255
                        else px(i)
                    }
                    x += 1
                  }
                }
                y += 1
              }
              frames += ImageKernels.encodePng(sw, sh, canvas.clone())
              if (dispose) {
                var ry = fy
                while (ry < math.min(sh, fy + fh)) {
                  var rx = fx
                  while (rx < math.min(sw, fx + fw)) { canvas(ry * sw + rx) = bgLuma; rx += 1 }
                  ry += 1
                }
              }
            }
          case _ => ()
        }
        p = d + size + (size & 1)
      }
      if (!animated) null else frames.toArray
    } catch { case _: Exception => Array.empty }
  }

  /** Luma + alpha of ONE frame's subchunks: VP8 keyframe Y plane with an
    * optional preceding `ALPH` plane, or VP8L BT.601 luma with the pixel
    * alpha channel. Alpha is null when the frame is opaque (bare VP8);
    * null result when nothing decodes. */
  private def frameLuma(b: Array[Byte], start: Int, end: Int)
      : (Int, Int, Array[Int], Array[Int]) = {
    var p = start
    var alphOff = -1
    var alphSize = 0
    while (p + 8 <= end) {
      val tag = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = (b(p + 4) & 0xFF) | ((b(p + 5) & 0xFF) << 8) |
        ((b(p + 6) & 0xFF) << 16) | ((b(p + 7) & 0xFF) << 24)
      if (size < 0 || p + 8 + size > end) return null
      if (tag == "ALPH") { alphOff = p + 8; alphSize = size }
      if (tag == "VP8 ") {
        val pl = Vp8.decode(b, p + 8, size)
        val out = new Array[Int](pl.w * pl.h)
        var yy = 0
        while (yy < pl.h) {
          var xx = 0
          while (xx < pl.w) { out(yy * pl.w + xx) = pl.yAt(xx, yy); xx += 1 }
          yy += 1
        }
        val alpha =
          if (alphOff >= 0) decodeAlph(b, alphOff, alphSize, pl.w, pl.h) else null
        return (pl.w, pl.h, out, alpha)
      }
      if (tag == "VP8L") {
        val (w, h, px) = decodeVp8l(b, p + 8)
        return (w, h, px.map(v =>
          (299 * ((v >> 16) & 0xFF) + 587 * ((v >> 8) & 0xFF) + 114 * (v & 0xFF)) / 1000),
          px.map(_ >>> 24))
      }
      p += 8 + size + (size & 1)
    }
    null
  }

  /** Decode an `ALPH` chunk to a w*h alpha plane: header byte = 2-bit
    * compression method (0 raw, 1 VP8L-green), 2-bit filtering method
    * (none/horizontal/vertical/gradient — residuals add their prediction
    * mod 256 in raster order), 2-bit preprocessing (no inverse needed).
    * Null when malformed. */
  private[functions] def decodeAlph(b: Array[Byte], off: Int, size: Int,
                                    w: Int, h: Int): Array[Int] = {
    if (size < 1) return null
    val head = b(off) & 0xFF
    val method = head & 3
    val filter = (head >> 2) & 3
    val a =
      if (method == 1) decodeAlphaLossless(b, off + 1, w, h)
      else if (method == 0 && size - 1 >= w * h)
        Array.tabulate(w * h)(i => b(off + 1 + i) & 0xFF)
      else null
    if (a == null || a.length != w * h) return null
    if (filter > 0) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          val pred =
            if (x == 0 && y == 0) 0
            else filter match {
              case 1 => if (x > 0) a(i - 1) else a(i - w)
              case 2 => if (y > 0) a(i - w) else a(i - 1)
              case _ =>
                if (x > 0 && y > 0) {
                  val g = a(i - 1) + a(i - w) - a(i - w - 1)
                  if (g < 0) 0 else if (g > 255) 255 else g
                } else if (x > 0) a(i - 1) else a(i - w)
            }
          a(i) = (a(i) + pred) & 0xFF
          x += 1
        }
        y += 1
      }
    }
    a
  }

  /** Grayscale decode of a WebP still, [[ImageKernels.decodeGray]]
    * contract. Lossless (VP8L) maps ARGB through integer BT.601 luma;
    * lossy (VP8) returns the keyframe's Y plane directly — it already IS
    * the luma (studio-swing scaling, which pHash-family signatures are
    * invariant to: an affine map of every pixel shifts all DCT
    * coefficients and their median together, leaving the sign bits
    * unchanged). Null when neither still form decodes. */
  private[functions] def decodeGray(b: Array[Byte]): Gray =
    try {
      val off = findVp8l(b)
      if (off >= 0) {
        val (w, h, px) = decodeVp8l(b, off)
        val out = new Array[Int](w * h)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          out(i) = (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) +
            114 * (p & 0xFF)) / 1000
          i += 1
        }
        Gray(w, h, out)
      } else {
        val lossy = findVp8(b)
        if (lossy == null) null
        else {
          val pl = Vp8.decode(b, lossy._1, lossy._2)
          val out = new Array[Int](pl.w * pl.h)
          var yy = 0
          while (yy < pl.h) {
            var xx = 0
            while (xx < pl.w) { out(yy * pl.w + xx) = pl.yAt(xx, yy); xx += 1 }
            yy += 1
          }
          Gray(pl.w, pl.h, out)
        }
      }
    } catch { case _: Exception => null }

  // ---------------------------------------------------------- encoder

  /** LSB-first bit writer mirroring [[BitReader]]. */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def writeBits(v: Int, n: Int): Unit = {
      acc |= (v.toLong & ((1L << n) - 1)) << nBits
      nBits += n
      while (nBits >= 8) {
        out.write((acc & 0xFF).toInt)
        acc >>>= 8
        nBits -= 8
      }
    }
    /** Write a canonical code MSB-first (the decoder walks the tree from
      * the code's most significant bit). */
    def writeCode(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { writeBits((code >> k) & 1, 1); k -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { out.write((acc & 0xFF).toInt); acc = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** Minimal legal VP8L gray encoder for fixtures: subtract-green
    * transform (so red/blue code to constant 0), no cache, one group;
    * green = all-256-literals-at-8-bits normal code written via the
    * code-length code (lengths: {16: 1 bit, 8: '10', 18: '11'}), red/
    * blue/alpha/distance = single-symbol simple codes. Each pixel then
    * costs exactly 8 bits. */
  def encodeGray(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 16384 && h <= 16384 && px.length == w * h)
    val bw = new BitWriter
    bw.writeBits(0x2F, 8)
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(0, 1) // no alpha
    bw.writeBits(0, 3) // version
    // one transform: subtract-green
    bw.writeBits(1, 1)
    bw.writeBits(2, 2)
    bw.writeBits(0, 1) // no more transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta-prefix image
    // GREEN code (alphabet 280): normal form
    bw.writeBits(0, 1) // not simple
    // code-length code: order is {17,18,0,...,5,16,6,7,8,...}; we need
    // symbol 18 (idx 1) len 2, symbol 16 (idx 8) len 1, symbol 8 (idx 11)
    // len 2 -> num_code_lengths = 12
    bw.writeBits(12 - 4, 4)
    val clLens = Array(0, 2, 0, 0, 0, 0, 0, 0, 1, 0, 0, 2)
    clLens.foreach(l => bw.writeBits(l, 3))
    // canonical CL codes: 16 -> '0'; 8 -> '10'; 18 -> '11'
    bw.writeBits(0, 1) // no max_symbol cutoff: emit all 280 lengths
    bw.writeCode(2, 2) // symbol 8: one literal length "8"
    // 255 more eights via repeat-previous (16): 42 x 6 + 1 x 3
    var rep = 255
    while (rep >= 6) { bw.writeCode(0, 1); bw.writeBits(3, 2); rep -= 6 } // 16, count 6
    if (rep > 0) { // exactly 3 left by construction
      require(rep == 3, s"unexpected repeat remainder $rep")
      bw.writeCode(0, 1); bw.writeBits(0, 2)
    }
    // 24 zeros for the unused length prefixes via 18 (11 + extra(7))
    bw.writeCode(3, 2); bw.writeBits(24 - 11, 7)
    // RED: simple single-symbol 0 (after subtract-green, r - g = 0)
    def simpleSingle(sym: Int): Unit = {
      bw.writeBits(1, 1) // simple
      bw.writeBits(0, 1) // one symbol
      if (sym < 2) { bw.writeBits(0, 1); bw.writeBits(sym, 1) }
      else { bw.writeBits(1, 1); bw.writeBits(sym, 8) }
    }
    simpleSingle(0) // red
    simpleSingle(0) // blue
    simpleSingle(255) // alpha
    simpleSingle(0) // distance (unused but must parse)
    // pixels: green literal = luma, canonical code == symbol at 8 bits
    var i = 0
    while (i < px.length) {
      bw.writeCode(px(i) & 0xFF, 8)
      i += 1
    }
    val payload = bw.toBytes
    // RIFF container
    val out = new java.io.ByteArrayOutputStream()
    def fourcc(s: String): Unit = s.foreach(c => out.write(c))
    def u32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    val chunkLen = payload.length
    val padded = chunkLen + (chunkLen & 1)
    fourcc("RIFF"); u32(4 + 8 + padded); fourcc("WEBP")
    fourcc("VP8L"); u32(chunkLen); out.write(payload, 0, chunkLen)
    if ((chunkLen & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Animated-WebP writer for fixtures: full-canvas gray frames as
    * lossless VP8L ANMF entries (VP8X animation flag, ANIM, one ANMF per
    * frame). [[animFrames]] snapshots these back bit-exactly, which is
    * what lets animated WebP join the video-dedup fixture rotation with
    * the GIF arm's lossless-gray margin. */
  def encodeAnimatedGray(w: Int, h: Int, frames: Seq[Array[Int]],
                         delayMs: Int = 40): Array[Byte] = {
    require(frames.nonEmpty)
    def le24(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte)
    def le32(v: Int) =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] =
      tag.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
    val vp8x = chunk("VP8X",
      Array[Byte](0x02, 0, 0, 0) ++ le24(w - 1) ++ le24(h - 1))
    val anim = chunk("ANIM", le32(0) ++ Array[Byte](0, 0))
    val anmfs = frames.map { px =>
      val still = encodeGray(w, h, px)
      // still layout is fixed: RIFF(12) + "VP8L" + LE32 len + payload
      val len = (still(16) & 0xFF) | ((still(17) & 0xFF) << 8) |
        ((still(18) & 0xFF) << 16) | ((still(19) & 0xFF) << 24)
      val payload = java.util.Arrays.copyOfRange(still, 20, 20 + len)
      chunk("ANMF", le24(0) ++ le24(0) ++ le24(w - 1) ++ le24(h - 1) ++
        le24(delayMs) ++ Array[Byte](0) ++ chunk("VP8L", payload))
    }.reduce(_ ++ _)
    val body = "WEBP".getBytes("US-ASCII") ++ vp8x ++ anim ++ anmfs
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }
}

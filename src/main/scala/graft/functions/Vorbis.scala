package graft.functions

/** Native Vorbis I decoder (Xiph Vorbis I specification, public) — the
  * lossy-audio face of the fingerprint/dedup tier. Reference behavior
  * anchor: the reference pipeline ingests opaque binary columns; this
  * module makes `.ogg` Vorbis files first-class PCM producers the same
  * way Flac.scala does for lossless audio (beyond-reference modality
  * surface).
  *
  * Scope: general Vorbis I with BOTH floor types — floor 1 (the modern
  * piecewise-linear dB floor) and floor 0 (the legacy LSP floor, spec
  * 6.2: bark-warped map, p/q cosine products, amplitude/offset dB
  * mapping) — all codebook shapes (ordered/sparse lengths, lookup types
  * 0/1/2, sequence flag), residue types 0/1/2 with full 8-pass cascades,
  * square-polar channel coupling, both blocksizes with window switching,
  * multi-packet pages and packets spanning pages.
  *
  * Honesty note: Vorbis carries ALL its codebooks in the stream setup
  * header, so — unlike MP3's Table B.7 or H.264's 8x8 CABAC maps —
  * there are no arbitrary normative tables to transcribe. The one
  * derived constant, floor1_inverse_dB_table, follows its closed form
  * 10^((i-255)*7/256) (i=0 reproduces the spec's published first entry
  * 1.0649863e-7; i=255 is exactly 1.0). Cross-implementation anchor:
  * tools/vorbis_codec.py (independent Python encoder+decoder) generates
  * src/test/resources/vorbis/corpus.txt; VorbisSpec requires this
  * decoder to match the Python decode within +-2 LSB on every stream.
  *
  * Totality: every entry point returns null on hostile bytes — bounds-
  * checked reads, capped codebook/packet/output sizes, no allocation
  * from untrusted lengths beyond hard caps.
  */
object Vorbis {

  final case class Decoded(channels: Int, rate: Int, pcm: Array[Int])

  /** Hard caps against hostile setup headers. */
  private val MaxEntries = 1 << 22
  private val MaxOutSamples = 1 << 26
  private val MaxPackets = 1 << 18

  private final class VorbisError(msg: String) extends RuntimeException(msg)
  @inline private def fail(msg: String): Nothing = throw new VorbisError(msg)

  // ------------------------------------------------------- bit reader
  // Vorbis packs bits LSB-first within bytes.
  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private val limit = data.length.toLong * 8

    def read(n: Int): Int = {
      if (pos + n > limit) fail("packet underrun")
      var v = 0
      var i = 0
      while (i < n) {
        if (((data(pos >> 3) >> (pos & 7)) & 1) != 0) v |= 1 << i
        pos += 1
        i += 1
      }
      v
    }

    def readLong(n: Int): Long = {
      if (pos + n > limit) fail("packet underrun")
      var v = 0L
      var i = 0
      while (i < n) {
        if (((data(pos >> 3) >> (pos & 7)) & 1) != 0) v |= 1L << i
        pos += 1
        i += 1
      }
      v
    }

    def bit(): Int = {
      if (pos >= limit) fail("packet underrun")
      val b = (data(pos.toInt >> 3) >> (pos & 7)) & 1
      pos += 1
      b
    }

    /** The next `n` (<= 12) bits in Huffman order (first stream bit =
      * MSB of the code), WITHOUT consuming, left-aligned to n bits when
      * fewer remain. One 3-byte load + a 12-bit reversal table instead
      * of a per-bit walk — the codebook fast path's hot read. Returns
      * the code in the high part of the pair and the available count. */
    def peekMsb(n: Int): (Int, Int) = {
      val avail = math.min(n.toLong, limit - pos).toInt
      val byteAt = pos >> 3
      val off = pos & 7
      var raw = 0
      var k = 0
      while (k < 3 && byteAt + k < data.length) {
        raw |= (data(byteAt + k) & 0xFF) << (8 * k)
        k += 1
      }
      val lsb = (raw >>> off) & ((1 << avail) - 1) // stream order, LSB-first
      val code = Rev12(lsb) >>> (12 - avail) // first stream bit -> code MSB
      (code << (n - avail), avail)
    }

    def skip(n: Int): Unit = pos += n
  }

  /** 12-bit reversal table for the Huffman peek. */
  private val Rev12: Array[Int] =
    Array.tabulate(1 << 12)(i => Integer.reverse(i) >>> 20)

  @inline private def ilog(x0: Int): Int = {
    var x = x0
    var r = 0
    while (x > 0) { r += 1; x >>= 1 }
    r
  }

  private def float32Unpack(v: Long): Double = {
    val mant = (v & 0x1FFFFF).toDouble
    val sign = if ((v & 0x80000000L) != 0) -1.0 else 1.0
    val exp = ((v >> 21) & 0x3FF).toInt
    sign * mant * math.pow(2.0, exp - 788)
  }

  // --------------------------------------------------------- codebook

  private final class Codebook(r: BitReader) {
    if (r.read(24) != 0x564342) fail("codebook sync lost")
    val dims: Int = r.read(16)
    val entries: Int = r.read(24)
    if (entries > MaxEntries || dims <= 0 || dims > (1 << 16) ||
      entries.toLong * dims > MaxEntries) fail("codebook too large")
    val lengths = new Array[Int](entries)
    if (r.bit() == 1) { // ordered
      var cur = r.read(5) + 1
      var at = 0
      while (at < entries) {
        val num = r.read(ilog(entries - at))
        if (num > entries - at) fail("ordered count overflow")
        var i = 0
        while (i < num) { lengths(at + i) = cur; i += 1 }
        at += num
        cur += 1
        if (cur > 32) fail("codeword too long")
      }
    } else {
      val sparse = r.bit() == 1
      var i = 0
      while (i < entries) {
        lengths(i) =
          if (sparse) { if (r.bit() == 1) r.read(5) + 1 else 0 }
          else r.read(5) + 1
        i += 1
      }
    }
    val lookupType: Int = r.read(4)
    var minV = 0.0
    var deltaV = 0.0
    private var seqP = false
    private var multiplicands: Array[Int] = null
    private var lookupVals = 0
    if (lookupType == 1 || lookupType == 2) {
      minV = float32Unpack(r.readLong(32))
      deltaV = float32Unpack(r.readLong(32))
      val valueBits = r.read(4) + 1
      seqP = r.bit() == 1
      lookupVals =
        if (lookupType == 1) {
          var lv = 0
          while (math.pow(lv + 1, dims) <= entries + 0.5) lv += 1
          lv
        } else entries * dims
      multiplicands = new Array[Int](lookupVals)
      var i = 0
      while (i < lookupVals) { multiplicands(i) = r.read(valueBits); i += 1 }
    } else if (lookupType != 0) fail("reserved lookup type")

    // canonical Vorbis codeword assignment (entries in order take the
    // lowest available leaf at their depth), then a (len,code) -> entry
    // map for decode
    private val dec = new java.util.HashMap[Long, Integer]()
    locally {
      val available = new Array[Long](33)
      var first = true
      var used = 0
      var e = 0
      while (e < entries) {
        val l = lengths(e)
        if (l > 0) {
          used += 1
          if (first) {
            dec.put(key(l, 0), e)
            var i = 1
            while (i <= l) { available(i) = 1L << (32 - i); i += 1 }
            first = false
          } else {
            var z = l
            while (z > 0 && available(z) == 0) z -= 1
            if (z == 0) fail("over-subscribed codebook")
            val res = available(z)
            available(z) = 0
            dec.put(key(l, (res >> (32 - l)).toInt), e)
            var y = l
            while (y > z) { available(y) = res + (1L << (32 - y)); y -= 1 }
          }
        }
        e += 1
      }
      if (used == 0) fail("empty codebook")
      if (used == 1) {
        // single-entry book: one short codeword (spec errata)
        dec.clear()
        var k = 0
        while (lengths(k) == 0) k += 1
        dec.put(key(lengths(k), 0), k)
      }
    }

    @inline private def key(len: Int, code: Int): Long =
      (len.toLong << 33) | (code.toLong & 0xFFFFFFFFL)

    // fast path: one table read resolves every codeword of length <=
    // fastBits (packed (len << 24) | (entry + 1); 0 = fall back to the
    // bit-by-bit map walk for the long-tail codes)
    private val fastBits: Int = {
      var mx = 0
      var e = 0
      while (e < entries) { if (lengths(e) > mx) mx = lengths(e); e += 1 }
      math.min(mx, 12)
    }
    private val fast = new Array[Int](1 << fastBits)
    locally {
      val it = dec.entrySet().iterator()
      while (it.hasNext) {
        val kv = it.next()
        val len = (kv.getKey >>> 33).toInt
        val code = (kv.getKey & 0xFFFFFFFFL).toInt
        if (len <= fastBits && entries < (1 << 24)) {
          val base = code << (fastBits - len)
          var i = 0
          while (i < (1 << (fastBits - len))) {
            fast(base | i) = (len << 24) | (kv.getValue.intValue() + 1)
            i += 1
          }
        }
      }
    }

    def decodeEntry(r: BitReader): Int = {
      val (peek, avail) = r.peekMsb(fastBits)
      val f = fast(peek)
      if (f != 0) {
        val len = f >>> 24
        if (len <= avail) {
          r.skip(len)
          return (f & 0xFFFFFF) - 1
        }
      }
      var code = 0
      var len = 0
      while (len <= 32) {
        code = (code << 1) | r.bit()
        len += 1
        val e = dec.get(key(len, code))
        if (e != null) return e.intValue()
      }
      fail("codeword desync")
    }

    /** VQ vector for an entry (lookup types 1/2). */
    def vq(entry: Int, out: Array[Double]): Unit = {
      var last = 0.0
      if (lookupType == 1) {
        var div = 1
        var i = 0
        while (i < dims) {
          val off = (entry / div) % lookupVals
          val v = multiplicands(off) * deltaV + minV + last
          out(i) = v
          if (seqP) last = v
          div *= lookupVals
          i += 1
        }
      } else {
        var i = 0
        while (i < dims) {
          val v = multiplicands(entry * dims + i) * deltaV + minV + last
          out(i) = v
          if (seqP) last = v
          i += 1
        }
      }
    }
  }

  // ---------------------------------------------------------- floors

  /** Per-packet floor interface shared by the two floor types: decode the
    * packet-side data (null = unvoiced channel), then synthesize the curve
    * the residue spectrum is multiplied by. */
  private sealed trait VFloor {
    def decodeHeader(r: BitReader, books: Array[Codebook]): AnyRef
    def curve(data: AnyRef, n2: Int): Array[Double]
  }

  /** Floor type 0 — the legacy LSP floor (spec 6.2). The per-map-value
    * p/q products follow the spec pseudocode; tools/vorbis_codec.py's
    * selftest validates that transcription against a DIRECT complex
    * evaluation of the LSP polynomial factorization (p = |P(e^{jw})|²/4,
    * q = |Q|²/4 — an independent route to the same numbers), and the
    * committed corpus pins this decoder to the Python mirror at ±2 LSB.
    * amplitude_bits caps at 32 (one machine word, the oggpack_read bound —
    * no real encoder exceeds ~20). */
  private final class Floor0(r0: BitReader, books0: Array[Codebook]) extends VFloor {
    val order: Int = r0.read(8)
    val rate: Int = r0.read(16)
    val barkMapSize: Int = r0.read(16)
    val ampBits: Int = r0.read(6)
    val ampOffset: Int = r0.read(8)
    val bookList: Array[Int] = Array.fill(r0.read(4) + 1)(r0.read(8))
    if (order < 1 || rate < 1 || barkMapSize < 1 || ampBits > 32)
      fail("floor0 parameters")
    if (bookList.exists(b => b >= books0.length || books0(b).lookupType == 0))
      fail("floor0 book list")

    // map[i] per half-block size (spec 6.2.3 step 1), cached: block sizes
    // repeat for the whole stream, the atan walk is per-size one-time
    private val maps = new java.util.HashMap[Integer, Array[Int]]()
    private def barkMap(n: Int): Array[Int] = {
      var m = maps.get(n)
      if (m == null) {
        m = floor0BarkMap(rate, barkMapSize, n)
        maps.put(n, m)
      }
      m
    }

    def decodeHeader(r: BitReader, books: Array[Codebook]): AnyRef = {
      val amplitude = r.read(ampBits)
      if (amplitude <= 0) return null
      val bn = r.read(ilog(bookList.length))
      if (bn >= bookList.length) fail("floor0 book number")
      val b = books(bookList(bn))
      // reads of `dims` coefficients until `order` are on hand; the spec's
      // running `last` adds to every element of each vector AFTER which it
      // becomes that vector's final element; overshoot past order is read
      // but discarded at curve time
      val coeffs = new Array[Double](order + b.dims)
      val tmp = new Array[Double](b.dims)
      var count = 0
      var last = 0.0
      while (count < order) {
        b.vq(b.decodeEntry(r), tmp)
        var i = 0
        while (i < b.dims) { coeffs(count + i) = tmp(i) + last; i += 1 }
        last = coeffs(count + b.dims - 1)
        count += b.dims
      }
      (amplitude, coeffs)
    }

    def curve(data: AnyRef, n2: Int): Array[Double] = {
      val (amplitude, coeffs) = data.asInstanceOf[(Int, Array[Double])]
      floor0Curve(order, barkMapSize, ampBits, ampOffset, barkMap(n2),
        amplitude, coeffs, n2)
    }
  }

  /** bark(x) = 13.1 atan(.00074x) + 2.24 atan(.0000000185x²) + .0001x
    * (spec 6.2.3). */
  private def bark(x: Double): Double =
    13.1 * math.atan(0.00074 * x) +
      2.24 * math.atan(0.0000000185 * x * x) + 0.0001 * x

  /** Floor-0 bark-warped frequency map (spec 6.2.3 step 1) — shared by
    * the decoder and the fixture encoder's floor-0 arm. */
  private[functions] def floor0BarkMap(rate: Int, barkMapSize: Int,
                                       n: Int): Array[Int] = {
    val c = barkMapSize / bark(0.5 * rate)
    Array.tabulate(n)(i => math.min(barkMapSize - 1,
      math.floor(bark(0.5 * rate * i / n) * c).toInt))
  }

  /** Floor-0 curve synthesis (spec 6.2.3 step 2) from decoded
    * (amplitude, coefficients) — shared by decode and the encoder so the
    * fixture encoder's residue division uses the EXACT decode-side curve. */
  private[functions] def floor0Curve(order: Int, barkMapSize: Int,
                                     ampBits: Int, ampOffset: Int,
                                     m: Array[Int], amplitude: Int,
                                     coeffs: Array[Double], n2: Int): Array[Double] = {
    val cosc = new Array[Double](order)
    var i = 0
    while (i < order) { cosc(i) = math.cos(coeffs(i)); i += 1 }
    val scale = ((1L << ampBits) - 1).toDouble
    val out = new Array[Double](n2)
    i = 0
    while (i < n2) {
      val k = m(i)
      val cw = math.cos(math.Pi * k / barkMapSize)
      var p = 0.0
      var q = 0.0
      if ((order & 1) == 1) {
        p = 1.0 - cw * cw
        q = 0.25
        var j = 0
        while (j < (order - 1) / 2) {
          val d = cosc(2 * j + 1) - cw
          p *= 4.0 * d * d
          j += 1
        }
        j = 0
        while (j < (order + 1) / 2) {
          val d = cosc(2 * j) - cw
          q *= 4.0 * d * d
          j += 1
        }
      } else {
        p = (1.0 - cw) / 2.0
        q = (1.0 + cw) / 2.0
        var j = 0
        while (j < order / 2) {
          var d = cosc(2 * j + 1) - cw
          p *= 4.0 * d * d
          d = cosc(2 * j) - cw
          q *= 4.0 * d * d
          j += 1
        }
      }
      val pq = p + q
      val v =
        if (pq <= 0) 0.0 // defined identically in the Python mirror
        else math.exp(0.11512925 * (amplitude * ampOffset /
          (scale * math.sqrt(pq)) - ampOffset))
      while (i < n2 && m(i) == k) { out(i) = v; i += 1 }
    }
    out
  }

  // ---------------------------------------------------------- floor 1

  /** floor1_inverse_dB_table from its closed form (see file header). */
  private val InvDb: Array[Double] =
    Array.tabulate(256)(i => math.pow(10.0, (i - 255) * 7.0 / 256.0))
  private val Floor1Ranges = Array(256, 128, 86, 64)

  private final class Floor1(r: BitReader) extends VFloor {
    val partitions: Int = r.read(5)
    val classList: Array[Int] = Array.fill(partitions)(r.read(4))
    private val maxClass = if (partitions == 0) -1 else classList.max
    val classDims = new Array[Int](maxClass + 1)
    val classSubs = new Array[Int](maxClass + 1)
    val classMaster = new Array[Int](maxClass + 1)
    val subBooks = new Array[Array[Int]](maxClass + 1)
    locally {
      var i = 0
      while (i <= maxClass) {
        classDims(i) = r.read(3) + 1
        classSubs(i) = r.read(2)
        classMaster(i) = if (classSubs(i) > 0) r.read(8) else -1
        subBooks(i) = Array.fill(1 << classSubs(i))(r.read(8) - 1)
        i += 1
      }
    }
    val multiplier: Int = r.read(2) + 1
    val rangebits: Int = r.read(4)
    val xs: Array[Int] = {
      val buf = scala.collection.mutable.ArrayBuffer(0, 1 << rangebits)
      var i = 0
      while (i < partitions) {
        var j = 0
        while (j < classDims(classList(i))) { buf += r.read(rangebits); j += 1 }
        i += 1
      }
      if (buf.length > 288) fail("too many floor posts")
      buf.toArray
    }

    /** Per-packet floor data; null = unvoiced channel. */
    def decodeHeader(r: BitReader, books: Array[Codebook]): Array[Int] = {
      if (r.bit() == 0) return null
      val range = Floor1Ranges(multiplier - 1)
      val ys = new Array[Int](xs.length)
      ys(0) = r.read(ilog(range - 1))
      ys(1) = r.read(ilog(range - 1))
      var at = 2
      var i = 0
      while (i < partitions) {
        val cls = classList(i)
        val cdim = classDims(cls)
        val cbits = classSubs(cls)
        val csub = (1 << cbits) - 1
        var cval = 0
        if (cbits > 0) {
          val mb = classMaster(cls)
          if (mb < 0 || mb >= books.length) fail("floor masterbook range")
          cval = books(mb).decodeEntry(r)
        }
        var j = 0
        while (j < cdim) {
          val book = subBooks(cls)(cval & csub)
          cval >>= cbits
          if (book >= 0) {
            if (book >= books.length) fail("floor book range")
            ys(at) = books(book).decodeEntry(r)
          } else ys(at) = 0
          at += 1
          j += 1
        }
        i += 1
      }
      ys
    }

    private def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
      val dy = y1 - y0
      val adx = x1 - x0
      val off = (math.abs(dy) * (x - x0)) / adx
      if (dy < 0) y0 - off else y0 + off
    }

    private def renderLine(x0: Int, y0: Int, x1: Int, y1: Int,
                           v: Array[Int], n: Int): Unit = {
      val dy = y1 - y0
      val adx = x1 - x0
      var ady = math.abs(dy)
      val base = dy / adx // trunc toward zero
      var y = y0
      var err = 0
      val sy = if (dy >= 0) base + 1 else base - 1
      ady -= math.abs(base) * adx
      if (x0 < n) v(x0) = y
      var x = x0 + 1
      val to = math.min(x1, n)
      while (x < to) {
        err += ady
        if (err >= adx) { err -= adx; y += sy } else y += base
        v(x) = y
        x += 1
      }
    }

    def curve(data: AnyRef, n2: Int): Array[Double] =
      curve(data.asInstanceOf[Array[Int]], n2)

    /** Synthesized floor curve (length n2): the spec's integer
      * amplitude fit + line render, then the inverse-dB map. */
    def curve(ys: Array[Int], n2: Int): Array[Double] = {
      val range = Floor1Ranges(multiplier - 1)
      val posts = xs.length
      val finalY = new Array[Int](posts)
      val step2 = new Array[Boolean](posts)
      finalY(0) = ys(0)
      finalY(1) = ys(1)
      step2(0) = true
      step2(1) = true
      var i = 2
      while (i < posts) {
        val lo = lowNeighbor(i)
        val hi = highNeighbor(i)
        val predicted = renderPoint(xs(lo), finalY(lo), xs(hi), finalY(hi), xs(i))
        val v = ys(i)
        val highroom = range - predicted
        val lowroom = predicted
        val room = 2 * math.min(highroom, lowroom)
        if (v != 0) {
          step2(lo) = true
          step2(hi) = true
          step2(i) = true
          finalY(i) =
            if (v >= room) {
              if (highroom > lowroom) v - lowroom + predicted
              else predicted - v + highroom - 1
            } else if ((v & 1) == 1) predicted - (v + 1) / 2
            else predicted + v / 2
        } else {
          step2(i) = false
          finalY(i) = predicted
        }
        i += 1
      }
      val order = (0 until posts).sortBy(xs)
      val fy = finalY.map(y => math.max(0, math.min(range - 1, y)))
      val out = new Array[Int](n2)
      var hx = 0
      var hy = 0
      var lx = 0
      var ly = fy(order.head) * multiplier
      order.tail.foreach { j =>
        if (step2(j)) {
          hx = xs(j)
          hy = fy(j) * multiplier
          if (lx < n2) renderLine(lx, ly, hx, hy, out, n2)
          lx = hx
          ly = hy
        }
      }
      if (hx < n2) renderLine(hx, hy, n2, hy, out, n2)
      out.map(y => InvDb(math.min(255, math.max(0, y))))
    }

    private def lowNeighbor(i: Int): Int = {
      var best = -1
      var j = 0
      while (j < i) {
        if (xs(j) < xs(i) && (best < 0 || xs(j) > xs(best))) best = j
        j += 1
      }
      if (best < 0) fail("floor neighbor") else best
    }

    private def highNeighbor(i: Int): Int = {
      var best = -1
      var j = 0
      while (j < i) {
        if (xs(j) > xs(i) && (best < 0 || xs(j) < xs(best))) best = j
        j += 1
      }
      if (best < 0) fail("floor neighbor") else best
    }
  }

  // ---------------------------------------------------------- residue

  private final class Residue(r: BitReader, val rtype: Int) {
    val begin: Int = r.read(24)
    val end: Int = r.read(24)
    val psize: Int = r.read(24) + 1
    val classifications: Int = r.read(6) + 1
    val classbook: Int = r.read(8)
    val cascade: Array[Int] = Array.fill(classifications) {
      val low = r.read(3)
      val high = if (r.bit() == 1) r.read(5) else 0
      (high << 3) | low
    }
    val books: Array[Array[Int]] = Array.tabulate(classifications) { i =>
      Array.tabulate(8)(p => if ((cascade(i) & (1 << p)) != 0) r.read(8) else -1)
    }

    /** Decode residue vectors for the channels of half-block size n2;
      * doNotDecode marks unvoiced channels. */
    def decode(r: BitReader, allBooks: Array[Codebook],
               doNotDecode: Array[Boolean], n2: Int): Array[Array[Double]] = {
      val ch = doNotDecode.length
      if (rtype == 2) {
        val all = Array(doNotDecode.forall(identity))
        val vec = core(r, allBooks, all, n2 * ch)(0)
        Array.tabulate(ch)(j => Array.tabulate(n2)(k => vec(k * ch + j)))
      } else core(r, allBooks, doNotDecode, n2)
    }

    private def core(r: BitReader, allBooks: Array[Codebook],
                     doNotDecode: Array[Boolean], vlen: Int): Array[Array[Double]] = {
      val ch = doNotDecode.length
      val out = Array.fill(ch)(new Array[Double](vlen))
      val b = math.min(begin, vlen)
      val e = math.min(end, vlen)
      val nRead = e - b
      if (nRead <= 0) return out
      if (classbook >= allBooks.length) fail("residue classbook range")
      val cb = allBooks(classbook)
      val pts = nRead / psize
      val cls = Array.ofDim[Int](ch, math.max(1, pts))
      val tmp = new Array[Double](64)
      var pas = 0
      while (pas < 8) {
        var pc = 0
        while (pc < pts) {
          if (pas == 0) {
            var j = 0
            while (j < ch) {
              if (!doNotDecode(j)) {
                var temp = cb.decodeEntry(r)
                var i = cb.dims - 1
                while (i >= 0) {
                  if (pc + i < pts) cls(j)(pc + i) = temp % classifications
                  temp /= classifications
                  i -= 1
                }
              }
              j += 1
            }
          }
          var i = 0
          while (i < cb.dims && pc < pts) {
            var j = 0
            while (j < ch) {
              if (!doNotDecode(j)) {
                val c = cls(j)(pc)
                if ((cascade(c) & (1 << pas)) != 0) {
                  val bi = books(c)(pas)
                  if (bi < 0 || bi >= allBooks.length) fail("residue book range")
                  val book = allBooks(bi)
                  if (book.dims > 64) fail("residue book dims")
                  val off = b + pc * psize
                  val v = out(j)
                  if (rtype == 0) {
                    val step = psize / book.dims
                    var k = 0
                    while (k < step) {
                      book.vq(book.decodeEntry(r), tmp)
                      var l = 0
                      while (l < book.dims) {
                        v(off + k + l * step) += tmp(l)
                        l += 1
                      }
                      k += 1
                    }
                  } else {
                    var k = 0
                    while (k < psize) {
                      book.vq(book.decodeEntry(r), tmp)
                      var l = 0
                      while (l < book.dims && k < psize) {
                        v(off + k) += tmp(l)
                        k += 1
                        l += 1
                      }
                    }
                  }
                }
              }
              j += 1
            }
            pc += 1
            i += 1
          }
        }
        pas += 1
      }
      out
    }
  }

  // --------------------------------------------------- setup & modes

  private final case class Mapping(submaps: Int, coupling: Array[(Int, Int)],
                                   mux: Array[Int], smFloor: Array[Int],
                                   smResidue: Array[Int])

  private final class Setup(ident: Array[Byte], setup: Array[Byte]) {
    // identification header
    locally {
      if (ident.length < 30 || !startsWith(ident, 1, "vorbis") || ident(0) != 1)
        fail("not a vorbis ident header")
    }
    private def le32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
        ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
    val channels: Int = ident(11) & 0xFF
    val rate: Int = le32(ident, 12).toInt
    val bs0: Int = 1 << (ident(28) & 0x0F)
    val bs1: Int = 1 << ((ident(28) >> 4) & 0x0F)
    if (channels < 1 || channels > 16 || rate <= 0 ||
      bs0 < 64 || bs1 < bs0 || bs1 > 8192) fail("ident parameters")

    // setup header
    if (setup.length < 8 || setup(0) != 5 || !startsWith(setup, 1, "vorbis"))
      fail("not a vorbis setup header")
    private val r = new BitReader(java.util.Arrays.copyOfRange(setup, 7, setup.length))
    val books: Array[Codebook] = Array.fill(r.read(8) + 1)(new Codebook(r))
    locally {
      val timeCount = r.read(6) + 1
      var i = 0
      while (i < timeCount) { if (r.read(16) != 0) fail("time transform"); i += 1 }
    }
    val floors: Array[VFloor] = Array.fill(r.read(6) + 1) {
      r.read(16) match {
        case 0 => new Floor0(r, books) // legacy LSP floor
        case 1 => new Floor1(r)
        case _ => fail("reserved floor type")
      }
    }
    val residues: Array[Residue] = Array.fill(r.read(6) + 1) {
      val rt = r.read(16)
      if (rt > 2) fail("reserved residue type")
      new Residue(r, rt)
    }
    val mappings: Array[Mapping] = Array.fill(r.read(6) + 1) {
      if (r.read(16) != 0) fail("reserved mapping type")
      val submaps = if (r.bit() == 1) r.read(4) + 1 else 1
      val coupling =
        if (r.bit() == 1) {
          val steps = r.read(8) + 1
          Array.fill(steps) {
            val m = r.read(ilog(channels - 1))
            val a = r.read(ilog(channels - 1))
            if (m >= channels || a >= channels || m == a) fail("coupling range")
            (m, a)
          }
        } else Array.empty[(Int, Int)]
      if (r.read(2) != 0) fail("mapping reserved bits")
      val mux =
        if (submaps > 1) Array.fill(channels)(r.read(4))
        else new Array[Int](channels)
      if (mux.exists(_ >= submaps)) fail("mux range")
      val smF = new Array[Int](submaps)
      val smR = new Array[Int](submaps)
      var i = 0
      while (i < submaps) {
        r.read(8) // time configuration placeholder
        smF(i) = r.read(8)
        smR(i) = r.read(8)
        if (smF(i) >= floors.length || smR(i) >= residues.length)
          fail("submap range")
        i += 1
      }
      Mapping(submaps, coupling, mux, smF, smR)
    }
    val modes: Array[(Int, Int)] = Array.fill(r.read(6) + 1) {
      val bf = r.bit()
      if (r.read(16) != 0 || r.read(16) != 0) fail("mode transform")
      val m = r.read(8)
      if (m >= mappings.length) fail("mode mapping range")
      (bf, m)
    }
    if (r.bit() != 1) fail("setup framing bit")
  }

  private def startsWith(b: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(at + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  // ------------------------------------------------------------ IMDCT
  // y[j] = Re[ e^{i*pi*j/n} * F[j] ],  F = length-n DFT (sign +) of
  // c_k = X[k] * e^{i*phi_k},  phi_k = pi/(2n) * (1 + n/2) * (2k+1),
  // c_k = 0 for k >= n/2 — the direct-sum kernel factored through one
  // radix-2 FFT (blocksizes are powers of two), O(n log n).

  private val twiddleCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Double], Array[Double], Array[Double], Array[Double])]()

  private def twiddles(n: Int) = {
    var t = twiddleCache.get(n)
    if (t == null) {
      val preRe = new Array[Double](n / 2)
      val preIm = new Array[Double](n / 2)
      var k = 0
      while (k < n / 2) {
        val phi = math.Pi / (2.0 * n) * (1 + n / 2) * (2 * k + 1)
        preRe(k) = math.cos(phi)
        preIm(k) = math.sin(phi)
        k += 1
      }
      val postRe = new Array[Double](n)
      val postIm = new Array[Double](n)
      var j = 0
      while (j < n) {
        postRe(j) = math.cos(math.Pi * j / n)
        postIm(j) = math.sin(math.Pi * j / n)
        j += 1
      }
      t = (preRe, preIm, postRe, postIm)
      twiddleCache.put(n, t)
    }
    t
  }

  /** In-place iterative radix-2 FFT with kernel e^{+i*2*pi*jk/n}. */
  private def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        var t = re(i); re(i) = re(j); re(j) = t
        t = im(i); im(i) = im(j); im(j) = t
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = 2.0 * math.Pi / len // positive sign kernel
      val wRe = math.cos(ang)
      val wIm = math.sin(ang)
      var base = 0
      while (base < n) {
        var curRe = 1.0
        var curIm = 0.0
        var k = 0
        while (k < len / 2) {
          val aRe = re(base + k)
          val aIm = im(base + k)
          val bRe = re(base + k + len / 2) * curRe - im(base + k + len / 2) * curIm
          val bIm = re(base + k + len / 2) * curIm + im(base + k + len / 2) * curRe
          re(base + k) = aRe + bRe
          im(base + k) = aIm + bIm
          re(base + k + len / 2) = aRe - bRe
          im(base + k + len / 2) = aIm - bIm
          val nRe = curRe * wRe - curIm * wIm
          curIm = curRe * wIm + curIm * wRe
          curRe = nRe
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  private def imdct(spec: Array[Double], n: Int): Array[Double] = {
    val (preRe, preIm, postRe, postIm) = twiddles(n)
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var k = 0
    while (k < n / 2) {
      re(k) = spec(k) * preRe(k)
      im(k) = spec(k) * preIm(k)
      k += 1
    }
    fft(re, im)
    val out = new Array[Double](n)
    var j = 0
    while (j < n) {
      out(j) = postRe(j) * re(j) - postIm(j) * im(j)
      j += 1
    }
    out
  }

  // ------------------------------------------------------------ window

  private val windowCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Boolean, Boolean, Int), Array[Double]]()

  private def vorbisWindow(i: Int, n: Int): Double = {
    val s = math.sin(math.Pi * (i + 0.5) / n)
    math.sin(math.Pi / 2 * s * s)
  }

  /** Block window; slopes narrow to the short blocksize n0 when the
    * neighbor is short (spec 4.3.1). */
  private def blockWindow(n: Int, prevShort: Boolean, nextShort: Boolean,
                          n0: Int): Array[Double] = {
    val key = (n, prevShort, nextShort, n0)
    var w = windowCache.get(key)
    if (w == null) {
      w = new Array[Double](n)
      val leftN = if (prevShort) n0 else n
      val rightN = if (nextShort) n0 else n
      val leftStart = n / 4 - leftN / 4
      val rightStart = n - (n / 4 - rightN / 4) - rightN / 2
      var i = 0
      while (i < n) {
        w(i) =
          if (i < leftStart) 0.0
          else if (i < leftStart + leftN / 2) vorbisWindow(i - leftStart, leftN)
          else if (i < rightStart) 1.0
          else if (i < rightStart + rightN / 2)
            vorbisWindow(i - rightStart + rightN / 2, rightN)
          else 0.0
        i += 1
      }
      windowCache.put(key, w)
    }
    w
  }

  // --------------------------------------------------------- Ogg demux

  /** Packets of the logical stream whose BOS packet is a Vorbis ident
    * header (multiplexed files lock to that serial), plus the final
    * granule. Null when the buffer carries no Vorbis stream. */
  private def packets(b: Array[Byte]): (Array[Array[Byte]], Long) = {
    if (b == null || b.length < 58) return null
    if (!(b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')) return null
    var serial = Long.MinValue
    var lastGranule = -1L
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var cur = new java.io.ByteArrayOutputStream()
    var p = 0
    var pages = 0
    while (p + 27 <= b.length && pages < (1 << 20) &&
      b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' && b(p + 3) == 'S') {
      val ht = b(p + 5) & 0xFF
      var granule = 0L
      var i = 0
      while (i < 8) { granule |= (b(p + 6 + i) & 0xFFL) << (8 * i); i += 1 }
      var ser = 0L
      i = 0
      while (i < 4) { ser |= (b(p + 14 + i) & 0xFFL) << (8 * i); i += 1 }
      val nseg = b(p + 26) & 0xFF
      if (p + 27 + nseg > b.length) return finishPackets(out, lastGranule)
      var plen = 0
      i = 0
      while (i < nseg) { plen += b(p + 27 + i) & 0xFF; i += 1 }
      val d = p + 27 + nseg
      if (d + plen > b.length) return finishPackets(out, lastGranule)
      if (serial == Long.MinValue && (ht & 0x02) != 0 && nseg > 0 &&
        plen >= 7 && b(d) == 1 && startsWith(b, d + 1, "vorbis"))
        serial = ser
      if (ser == serial) {
        if ((ht & 0x01) == 0) cur = new java.io.ByteArrayOutputStream()
        var off = d
        i = 0
        while (i < nseg) {
          val v = b(p + 27 + i) & 0xFF
          cur.write(b, off, v)
          off += v
          if (v < 255) {
            if (out.length >= MaxPackets) return finishPackets(out, lastGranule)
            out += cur.toByteArray
            cur = new java.io.ByteArrayOutputStream()
          }
          i += 1
        }
        if (granule >= 0) lastGranule = granule
      }
      p = d + plen
      pages += 1
    }
    finishPackets(out, lastGranule)
  }

  private def finishPackets(out: scala.collection.mutable.ArrayBuffer[Array[Byte]],
                            g: Long): (Array[Array[Byte]], Long) =
    if (out.isEmpty) null else (out.toArray, g)

  // --------------------------------------------------------- decoding

  /** Decode an Ogg-Vorbis stream to interleaved PCM16. Null when the
    * buffer is not decodable Vorbis (wrong container, hostile bytes,
    * over-cap output). */
  def decode(b: Array[Byte]): Decoded = {
    try {
      val pk = packets(b)
      if (pk == null) return null
      decodePacketStream(pk._1, pk._2)
    } catch { case _: Exception => null }
  }

  /** The container-independent core: decode a raw Vorbis packet
    * sequence (identification, comment, setup, audio...) with an
    * optional final-granule trim (negative = keep everything) — Ogg
    * hands packets with a granule, Matroska hands packets without one.
    * Null on anything undecodable. */
  def decodePacketStream(pkts: Array[Array[Byte]], lastGranule: Long): Decoded = {
    try {
      if (pkts == null || pkts.length < 4) return null
      if (pkts(1).length < 7 || pkts(1)(0) != 3 || !startsWith(pkts(1), 1, "vorbis"))
        return null
      val s = new Setup(pkts(0), pkts(2))
      val ch = s.channels
      // growable primitive buffers (a boxed collection here was the
      // decode path's hottest allocation)
      var out = Array.fill(ch)(new Array[Double](8192))
      var len = 0
      var prevRight: Array[Array[Double]] = null
      var prevN = 0
      var pi = 3
      while (pi < pkts.length) {
        val res = decodePacket(s, pkts(pi))
        if (res != null) {
          val (pcm, n) = res
          if (prevRight != null) {
            val span = (prevN + n) / 4
            if (len + span > MaxOutSamples) return null
            if (len + span > out(0).length) {
              val cap = math.max(out(0).length * 2, len + span)
              out = out.map(a => java.util.Arrays.copyOf(a, cap))
            }
            val shift = n / 4 - prevN / 4
            var j = 0
            while (j < ch) {
              val o = out(j)
              var i = 0
              while (i < span) {
                val a = if (i < prevN / 2) prevRight(j)(i) else 0.0
                val ci = i + shift
                val c = if (ci >= 0 && ci < n / 2) pcm(j)(ci) else 0.0
                o(len + i) = a + c
                i += 1
              }
              j += 1
            }
            len += span
          }
          prevRight = Array.tabulate(ch)(j =>
            java.util.Arrays.copyOfRange(pcm(j), n / 2, n))
          prevN = n
        }
        pi += 1
      }
      val total = if (lastGranule >= 0) math.min(lastGranule, len.toLong)
      else len.toLong
      val pcm = new Array[Int]((total * ch).toInt)
      var i = 0
      while (i < total) {
        var j = 0
        while (j < ch) {
          val v = math.round(out(j)(i.toInt)).toInt
          pcm(i.toInt * ch + j) = math.max(-32768, math.min(32767, v))
          j += 1
        }
        i += 1
      }
      Decoded(ch, s.rate, pcm)
    } catch { case _: Exception => null }
  }

  private def decodePacket(s: Setup, pkt: Array[Byte]): (Array[Array[Double]], Int) = {
    try {
      val r = new BitReader(pkt)
      if (r.bit() != 0) return null // non-audio packet
      val modeBits = ilog(s.modes.length - 1)
      val (bf, mappingIdx) = s.modes(if (modeBits > 0) r.read(modeBits) else 0)
      val n = if (bf == 1) s.bs1 else s.bs0
      var prevShort = false
      var nextShort = false
      if (bf == 1) {
        prevShort = r.bit() == 0
        nextShort = r.bit() == 0
      }
      val m = s.mappings(mappingIdx)
      val ch = s.channels
      // floors
      val floorYs = new Array[AnyRef](ch)
      val nonzero = new Array[Boolean](ch)
      var j = 0
      while (j < ch) {
        val fl = s.floors(m.smFloor(m.mux(j)))
        floorYs(j) = fl.decodeHeader(r, s.books)
        nonzero(j) = floorYs(j) != null
        j += 1
      }
      m.coupling.foreach { case (mg, an) =>
        if (nonzero(mg) || nonzero(an)) { nonzero(mg) = true; nonzero(an) = true }
      }
      // residues per submap
      val spectra = new Array[Array[Double]](ch)
      var sm = 0
      while (sm < m.submaps) {
        val chans = (0 until ch).filter(m.mux(_) == sm).toArray
        val dnd = chans.map(!nonzero(_))
        val vecs = s.residues(m.smResidue(sm)).decode(r, s.books, dnd, n / 2)
        var k = 0
        while (k < chans.length) { spectra(chans(k)) = vecs(k); k += 1 }
        sm += 1
      }
      // inverse coupling (spec 4.3.5), reverse step order
      var ci = m.coupling.length - 1
      while (ci >= 0) {
        val (mg, an) = m.coupling(ci)
        val mv = spectra(mg)
        val av = spectra(an)
        var k = 0
        while (k < n / 2) {
          val M = mv(k)
          val A = av(k)
          if (M > 0) {
            if (A > 0) { mv(k) = M; av(k) = M - A }
            else { mv(k) = M + A; av(k) = M }
          } else {
            if (A > 0) { mv(k) = M; av(k) = M + A }
            else { mv(k) = M - A; av(k) = M }
          }
          k += 1
        }
        ci -= 1
      }
      // floor multiply + IMDCT + window
      val w = blockWindow(n, prevShort, nextShort, s.bs0)
      val pcm = new Array[Array[Double]](ch)
      j = 0
      while (j < ch) {
        // nonzero(j) may be coupling-PROPAGATED onto a channel whose own
        // floor packet data is null (unvoiced channel coupled to a voiced
        // one — spec 4.3.6: it renders as silence while the packet still
        // decodes); fl.curve(null, ...) would NPE and the catch below
        // would drop the whole packet on ALL channels
        val spec =
          if (nonzero(j) && floorYs(j) != null) {
            val fl = s.floors(m.smFloor(m.mux(j)))
            val curve = fl.curve(floorYs(j), n / 2)
            val sp = spectra(j)
            var k = 0
            while (k < n / 2) { sp(k) *= curve(k); k += 1 }
            sp
          } else new Array[Double](n / 2)
        val t = imdct(spec, n)
        var i = 0
        while (i < n) { t(i) *= w(i); i += 1 }
        pcm(j) = t
        j += 1
      }
      (pcm, n)
    } catch { case _: Exception => null } // a bad packet skips, not aborts
  }

  // --------------------------------------------------------- encoder
  // Fixture encoder (executor-side Ogg-Vorbis payload generation for
  // the lossy-dedup gates): mono, single 256-sample blocksize, flat
  // 0 dB floor, residue type 0 with a two-pass scalar cascade (coarse
  // 2048-level grid + fine correction) — a strict subset of what the
  // decoder above and the Python mirror accept. SNR ~ 45-100 dB
  // depending on content: lossy, but spectrally faithful.

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var bits = 0
    def write(value: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        if (((value >> i) & 1) != 0) cur |= 1 << bits
        bits += 1
        if (bits == 8) { buf.write(cur); cur = 0; bits = 0 }
        i += 1
      }
    }
    def writeLong(value: Long, n: Int): Unit = {
      var i = 0
      while (i < n) {
        if (((value >> i) & 1) != 0) cur |= 1 << bits
        bits += 1
        if (bits == 8) { buf.write(cur); cur = 0; bits = 0 }
        i += 1
      }
    }
    /** Huffman codeword for a FLAT complete book: entry == codeword,
      * written MSB-first. */
    def code(entry: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { write((entry >> i) & 1, 1); i -= 1 }
    }
    def data(): Array[Byte] = {
      if (bits > 0) { buf.write(cur); cur = 0; bits = 0 }
      buf.toByteArray
    }
  }

  private def float32Pack(x0: Double): Long = {
    if (x0 == 0) return 0L
    var x = x0
    var sign = 0L
    if (x < 0) { sign = 1L << 31; x = -x }
    var exp = math.floor(math.log(x) / math.log(2.0)).toInt
    var mant = math.round(x / math.pow(2.0, exp - 20))
    if (mant >= (1L << 21)) { mant >>= 1; exp += 1 }
    sign | ((exp - 20 + 788).toLong << 21) | (mant & 0x1FFFFF)
  }

  private val EncN = 256
  private lazy val encCos: Array[Array[Double]] = {
    val n = EncN
    Array.tabulate(n)(j => Array.tabulate(n / 2)(k =>
      math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))))
  }

  /** Mono PCM16 -> Ogg-Vorbis (fixture subset). `twoPass = true` is
    * near-transparent (the fine pass reconstructs to < 0.5 LSB on
    * typical content); `twoPass = false` keeps only the 11-bit coarse
    * grid — genuinely lossy (~45 dB), the shape the lossy-dedup gates
    * need so their tolerance claim is actually exercised. `floor0 = true`
    * swaps the flat floor-1 for a legacy LSP floor-0 stream (fixed
    * near-uniform 8-angle coefficient set, one VQ book): the residue is
    * divided by the EXACT decode-side curve, so decoders reconstruct the
    * same spectra — the gate-reachable face of floor-0 decode. */
  def encode(rate: Int, samples: Array[Int], twoPass: Boolean = true,
             floor0: Boolean = false): Array[Byte] = {
    val (pkts, granules) = encodePacketSeq(rate, samples, twoPass, floor0)
    val pagesBuf = new java.io.ByteArrayOutputStream()
    val serial = 0x67766273L
    var i = 0
    while (i < pkts.length) {
      val ht = if (i == 0) 2 else if (i == pkts.length - 1) 4 else 0
      pagesBuf.write(Ogg.page(serial, i.toLong, granules(i), ht, pkts(i)))
      i += 1
    }
    pagesBuf.toByteArray
  }

  /** The encoder's raw packet sequence (identification, comment, setup,
    * audio...) plus per-packet granules — the container-independent
    * half, so the Matroska fixture can wrap the SAME packets. */
  def encodePacketSeq(rate: Int, samples: Array[Int],
                      twoPass: Boolean = true,
                      floor0: Boolean = false): (Array[Array[Byte]], Array[Long]) = {
    val n = EncN
    val n2 = n / 2
    val nsamp = samples.length
    val frames = (nsamp + n2 - 1) / n2 + 1
    val w = blockWindow(n, prevShort = false, nextShort = false, n)
    // forward MDCT per frame (scale 4/n pairs with the unscaled IMDCT)
    val mdcts = Array.tabulate(frames) { i =>
      val start = i * n2 - n2 // center c_i = i*n/2
      val seg = Array.tabulate(n)(k => {
        val at = start + k
        (if (at >= 0 && at < nsamp) samples(at).toDouble else 0.0) * w(k)
      })
      Array.tabulate(n2)(k => {
        var acc = 0.0
        var j = 0
        while (j < n) { acc += seg(j) * encCos(j)(k); j += 1 }
        acc * 4.0 / n
      })
    }
    // floor-0 arm: a fixed near-uniform 8-angle LSP set, quantized through
    // the VQ book exactly as a decoder will see it, and the curve computed
    // by the SAME synthesis the decoder runs — the residue then carries
    // spec/curve and every conforming decoder reconstructs spec
    val F0Order = 8
    val F0Bark = 64
    val F0AmpBits = 6
    val F0AmpOffset = 10
    val F0Amp = 48
    if (floor0) require(rate <= 65535, "floor0 header rate field is 16-bit")
    val f0target = Array.tabulate(F0Order)(k =>
      math.Pi * (k + 1) / (F0Order + 1.0) + 0.013 * (k % 3 - 1))
    val f0rows: Array[Double] = {
      val r0 = f0target.slice(0, 4)
      val last = f0target(3)
      val r1 = f0target.slice(4, 8).map(_ - last)
      r0 ++ r1
    }
    val f0mn = float32Unpack(float32Pack(f0rows.min))
    val f0dl = float32Unpack(float32Pack((f0rows.max - f0rows.min) / 4095.0))
    val f0mult = f0rows.map(v =>
      math.max(0, math.min(4095, math.round((v - f0mn) / f0dl).toInt)))
    val f0coeffs: Array[Double] = {
      val r0 = Array.tabulate(4)(i => f0mult(i) * f0dl + f0mn)
      val last = r0(3)
      val r1 = Array.tabulate(4)(i => f0mult(4 + i) * f0dl + f0mn + last)
      r0 ++ r1
    }
    val f0curve: Array[Double] =
      if (!floor0) null
      else floor0Curve(F0Order, F0Bark, F0AmpBits, F0AmpOffset,
        floor0BarkMap(rate, F0Bark, n2), F0Amp, f0coeffs, n2)
    // residue-domain spectra: spec/curve under floor 0, spec itself under
    // the flat 0 dB floor-1
    val specs =
      if (!floor0) mdcts
      else mdcts.map(sp => Array.tabulate(n2)(k => sp(k) / f0curve(k)))
    var maxAbs = 1.0
    specs.foreach(_.foreach(v => if (math.abs(v) > maxAbs) maxAbs = math.abs(v)))
    val a = math.pow(2.0, ilog(maxAbs.toInt)).max(1.0)
    val coarseMin = float32Unpack(float32Pack(-a))
    val coarseDelta = float32Unpack(float32Pack(2.0 * a / 2047))
    val fineMin = float32Unpack(float32Pack(-2.0 * coarseDelta))
    val fineDelta = float32Unpack(float32Pack(4.0 * coarseDelta / 2047))

    // ---- headers
    val ident = new BitWriter
    ident.write(1, 8) // packet type: identification
    "vorbis".foreach(c => ident.write(c, 8))
    ident.writeLong(0L, 32)
    ident.write(1, 8)
    ident.writeLong(rate.toLong, 32)
    ident.writeLong(0L, 32); ident.writeLong(0L, 32); ident.writeLong(0L, 32)
    ident.write(ilog(n - 1), 4)
    ident.write(ilog(n - 1), 4)
    ident.write(1, 1)

    val comment = new BitWriter
    comment.write(3, 8) // packet type: comment
    "vorbis".foreach(c => comment.write(c, 8))
    val vendor = "graft"
    comment.writeLong(vendor.length.toLong, 32)
    vendor.foreach(c => comment.write(c, 8))
    comment.writeLong(0L, 32)
    comment.write(1, 1)

    val setup = new BitWriter
    setup.write(5, 8) // packet type: setup
    "vorbis".foreach(c => setup.write(c, 8))
    setup.write(if (floor0) 4 else 3, 8) // 4 books (+1 floor-0 LSP book)
    // book 0: classbook dim 4, 16 entries, flat len 4, lookup 0
    def flatBook(dims: Int, entries: Int, len: Int): Unit = {
      setup.write(0x564342, 24)
      setup.write(dims, 16)
      setup.write(entries, 24)
      setup.write(0, 1) // not ordered
      setup.write(0, 1) // not sparse
      var i = 0
      while (i < entries) { setup.write(len - 1, 5); i += 1 }
    }
    flatBook(4, 16, 4)
    setup.write(0, 4) // lookup 0
    // book 1: coarse scalar (dim 1, 2048 entries, flat len 11, lookup 2)
    def scalarBook(mn: Double, dl: Double): Unit = {
      flatBook(1, 2048, 11)
      setup.write(2, 4)
      setup.writeLong(float32Pack(mn), 32)
      setup.writeLong(float32Pack(dl), 32)
      setup.write(10, 4) // value_bits - 1 = 10 (11-bit multiplicands)
      setup.write(0, 1) // sequence_p
      var i = 0
      while (i < 2048) { setup.write(i, 11); i += 1 }
    }
    scalarBook(coarseMin, coarseDelta)
    // book 2: floor post book (dim 1, 256 entries, flat len 8, lookup 0)
    flatBook(1, 256, 8)
    setup.write(0, 4)
    // book 3: fine scalar
    scalarBook(fineMin, fineDelta)
    if (floor0) {
      // book 4: the LSP delta rows — dim 4, 2 entries (row 0 absolute,
      // row 1 relative to row 0's last element), flat 1-bit codewords,
      // lookup 2 with 12-bit multiplicands
      flatBook(4, 2, 1)
      setup.write(2, 4)
      setup.writeLong(float32Pack(f0mn), 32)
      setup.writeLong(float32Pack(f0dl), 32)
      setup.write(11, 4) // value_bits - 1 = 11
      setup.write(0, 1) // sequence_p
      f0mult.foreach(m => setup.write(m, 12))
    }
    setup.write(0, 6) // time count - 1
    setup.write(0, 16)
    setup.write(0, 6) // floor count - 1
    if (floor0) {
      setup.write(0, 16) // floor type 0 (legacy LSP)
      setup.write(F0Order, 8)
      setup.write(rate, 16)
      setup.write(F0Bark, 16)
      setup.write(F0AmpBits, 6)
      setup.write(F0AmpOffset, 8)
      setup.write(0, 4) // number_of_books - 1
      setup.write(4, 8) // the LSP book
    } else {
    setup.write(1, 16) // floor type 1
    setup.write(1, 5) // partitions
    setup.write(0, 4) // class 0
    setup.write(0, 3) // class dim - 1 = 0 (one post)
    setup.write(0, 2) // subclasses
    setup.write(2 + 1, 8) // subclass book 2 (+1 on the wire)
    setup.write(0, 2) // multiplier - 1
    setup.write(7, 4) // rangebits
    setup.write(64, 7) // the one extra post at x = 64
    }
    setup.write(0, 6) // residue count - 1
    setup.write(0, 16) // residue type 0
    setup.write(0, 24) // begin
    setup.write(0xFFFFFF, 24) // end (capped to n/2 at decode)
    setup.write(31, 24) // psize - 1 = 31
    setup.write(1, 6) // classifications - 1 = 1
    setup.write(0, 8) // classbook
    var ci = 0
    while (ci < 2) { // cascade per class: pass 0, plus pass 1 when twoPass
      setup.write(if (twoPass) 3 else 1, 3)
      setup.write(0, 1)
      ci += 1
    }
    ci = 0
    while (ci < 2) {
      setup.write(1, 8) // pass-0 book: coarse
      if (twoPass) setup.write(3, 8) // pass-1 book: fine
      ci += 1
    }
    setup.write(0, 6) // mapping count - 1
    setup.write(0, 16) // type 0
    setup.write(0, 1) // one submap
    setup.write(0, 1) // no coupling
    setup.write(0, 2)
    setup.write(0, 8) // time
    setup.write(0, 8) // floor 0
    setup.write(0, 8) // residue 0
    setup.write(0, 6) // mode count - 1
    setup.write(0, 1) // blockflag
    setup.write(0, 16)
    setup.write(0, 16)
    setup.write(0, 8) // mapping 0
    setup.write(1, 1)

    // ---- audio packets
    val outPkts = scala.collection.mutable.ArrayBuffer[Array[Byte]](
      ident.data(), comment.data(), setup.data())
    val outGran = scala.collection.mutable.ArrayBuffer[Long](-1L, -1L, -1L)
    var granule = 0L
    var fi = 0
    while (fi < frames) {
      val pkt = new BitWriter
      pkt.write(0, 1) // audio packet
      // (single mode: zero mode bits)
      if (floor0) {
        pkt.write(F0Amp, F0AmpBits) // amplitude > 0: voiced
        pkt.write(0, 1) // booknumber (ilog(1) = 1 bit)
        pkt.code(0, 1) // row 0 (absolute angles)
        pkt.code(1, 1) // row 1 (relative to row 0's last)
      } else {
        pkt.write(1, 1) // floor nonzero
        pkt.write(255, 8) // y0
        pkt.write(255, 8) // y1
        pkt.code(0, 8) // the one extra post: val 0 -> on the line (flat)
      }
      // residue: pts = 128/32 = 4, classbook dim 4 -> one classword
      val spec = specs(fi)
      val recon = new Array[Double](n2)
      var pass = 0
      val nPasses = if (twoPass) 2 else 1
      while (pass < nPasses) {
        val (mn, dl) = if (pass == 0) (coarseMin, coarseDelta) else (fineMin, fineDelta)
        var pc = 0
        while (pc < 4) {
          if (pass == 0 && pc == 0) pkt.code(0, 4) // classes all 0
          val off = pc * 32
          var k = 0
          while (k < 32) {
            val v = spec(off + k) - recon(off + k)
            var q = math.round((v - mn) / dl).toInt
            if (q < 0) q = 0
            if (q > 2047) q = 2047
            recon(off + k) += q * dl + mn
            pkt.code(q, 11)
            k += 1
          }
          pc += 1
        }
        pass += 1
      }
      if (fi > 0) granule += n2
      val isLast = fi == frames - 1
      val g = if (fi == 0) -1L else if (isLast) math.min(granule, nsamp.toLong) else granule
      outPkts += pkt.data()
      outGran += g
      fi += 1
    }
    (outPkts.toArray, outGran.toArray)
  }

  /** (channels, rate, nSamples) without decoding samples — null when
    * not Vorbis. Used by audio_meta as a cheap existence probe. */
  def info(b: Array[Byte]): Array[Long] = {
    try {
      val pk = packets(b)
      if (pk == null) return null
      val (pkts, lastGranule) = pk
      if (pkts.isEmpty || pkts(0).length < 30) return null
      val id = pkts(0)
      if (id(0) != 1 || !startsWith(id, 1, "vorbis")) return null
      val chn = id(11) & 0xFF
      var rate = 0L
      var i = 0
      while (i < 4) { rate |= (id(12 + i) & 0xFFL) << (8 * i); i += 1 }
      Array(chn.toLong, rate, math.max(0L, lastGranule))
    } catch { case _: Exception => null }
  }
}

package graft.functions

/**
 * Mergeable-sketch kernels — HyperLogLog distinct count, Count-Min frequency,
 * and a log-scaled (HDR-style) quantile histogram. These are the summary
 * structures a 100 TB pipeline carries INSTEAD of re-scanning: a per-day
 * sketch column is a few KB per group, merges associatively across days /
 * partitions / streams, and answers distinct/frequency/quantile queries with
 * bounded error and zero re-reads.
 *
 * Everything here is deterministic integer arithmetic on a fixed hash
 * (splitmix64 over the key's 64-bit image), so every estimate is exactly
 * reproducible by the DuckDB oracle SQL in SparkEntry — the same discipline
 * as the quantized-ANN and LSH gates. No RNG, no float accumulation order
 * dependence: the HLL harmonic sum is an exact integer (BigInt) before the
 * single final division, and the histogram/CMS are pure counters.
 *
 * References (public): Flajolet et al., "HyperLogLog: the analysis of a
 * near-optimal cardinality estimation algorithm" (AofA 2007); Cormode &
 * Muthukrishnan, "An improved data stream summary: the count-min sketch and
 * its applications" (J. Algorithms 2005); the log-bucketed histogram follows
 * the HdrHistogram/DDSketch idea (Masson et al., VLDB 2019) restricted to
 * non-negative integers so bucketing is exact bit arithmetic.
 */
object SketchKernels {

  // ------------------------------------------------------------------ hash
  /** splitmix64 finalizer (Steele et al., "Fast splittable pseudorandom
    * number generators", OOPSLA 2014) — full-avalanche 64→64 mix, and cheap
    * to reproduce in SQL (two 32-bit-split multiplies mod 2^64). */
  def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over raw bytes — the string-key path. Multiplier fits in
    * 41 bits, so the SQL reproduction needs no multiply splitting. The weak
    * low-bit avalanche of FNV is repaired by the splitmix64 finalizer in
    * [[hashString]]. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001B3L; i += 1 }
    h
  }

  def hashLong(k: Long): Long = splitmix64(k)
  def hashString(s: org.apache.spark.unsafe.types.UTF8String): Long =
    splitmix64(fnv1a64(s.getBytes))

  // ------------------------------------------------------------- HyperLogLog
  // State: Array[Byte] of m = 2^p registers, p in [4, 16]. Register j holds
  // max over inserted hashes with top-p bits == j of (leading-zeros-of-rest
  // + 1), capped at 64-p+1 (so a register always fits a byte).

  def hllCreate(p: Int): Array[Byte] = {
    require(p >= 4 && p <= 16, s"hll precision must be in [4,16], got $p")
    new Array[Byte](1 << p)
  }

  def hllUpdate(regs: Array[Byte], p: Int, hash: Long): Unit = {
    val shift = 64 - p
    val idx = (hash >>> shift).toInt
    val w = if (shift == 64) hash else hash & ((1L << shift) - 1)
    // rank = position of the first 1-bit within the low `shift` bits,
    // counted from the MSB of that field; all-zero field -> shift + 1.
    val rank =
      if (w == 0) shift + 1
      else shift + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Register-wise max — HLL merge is associative, commutative, idempotent. */
  def hllMerge(into: Array[Byte], from: Array[Byte]): Unit = {
    require(into.length == from.length,
      s"hll merge: register counts differ (${into.length} vs ${from.length} — mixed precisions)")
    var i = 0
    while (i < into.length) { if (from(i) > into(i)) into(i) = from(i); i += 1 }
  }

  /** Flajolet estimator with the standard small-range (linear counting)
    * correction, rounded to a Long. The harmonic sum sum(2^-M_j) is computed
    * as an exact integer N = sum(2^(shift+1 - M_j)) (BigInt — it can reach
    * 2^65), so the raw path's only float operation is the final
    * alpha*m^2*2^(shift+1) / N division: both engines convert the SAME
    * integer to double and divide, which is order-independent and bit-equal.
    * When the raw estimate falls at or below 2.5m and empty registers
    * remain, linear counting m*ln(m/V) takes over (the raw estimator floors
    * near alpha*m regardless of true cardinality — without this branch any
    * n << m reads as ~0.72m). No 32-bit large-range correction: the hash is
    * 64-bit, collisions are irrelevant at any feasible cardinality.
    * Cross-engine note: ln() may differ from DuckDB's by 1 ulp; after
    * Math.round that flips only if m*ln(m/V) sits within an ulp of x.5 —
    * the oracle gates verify the actual fixture values. */
  def hllEstimate(regs: Array[Byte], p: Int): Long = {
    val m = 1 << p
    val shift = 64 - p
    var n = BigInt(0)
    var zeros = 0
    var i = 0
    while (i < regs.length) {
      n += BigInt(1) << (shift + 1 - regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m * java.lang.Math.pow(2.0, (shift + 1).toDouble) / n.toDouble
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    Math.round(est)
  }

  /** Serialized form: [magic 'H', p, regs...] — self-describing so merge can
    * reject mixed precisions diagnosably. */
  def hllSerialize(regs: Array[Byte], p: Int): Array[Byte] = {
    val out = new Array[Byte](2 + regs.length)
    out(0) = 'H'; out(1) = p.toByte
    System.arraycopy(regs, 0, out, 2, regs.length)
    out
  }

  /** Returns (p, registers); throws IllegalArgumentException on garbage. */
  def hllDeserialize(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 2 && bytes(0) == 'H', "not an HLL sketch (bad magic)")
    val p = bytes(1).toInt
    require(p >= 4 && p <= 16, s"hll sketch precision out of range: $p")
    require(bytes.length == 2 + (1 << p),
      s"hll sketch truncated: ${bytes.length} bytes for p=$p (want ${2 + (1 << p)})")
    val regs = new Array[Byte](1 << p)
    System.arraycopy(bytes, 2, regs, 0, regs.length)
    (p, regs)
  }

  // ---------------------------------------------------------- Count-Min
  // State: depth x width Long counters (row-major). Row r uses hash
  // splitmix64(baseHash ^ CMS_SEED(r)) mod width. Seeds are fixed constants
  // (splitmix64 of the row index) so the SQL oracle can embed them as
  // literals. Width is a power of two so `mod width` is a mask.

  val CmsMaxDepth = 8
  private val cmsSeeds: Array[Long] = Array.tabulate(CmsMaxDepth)(r => splitmix64(r + 1L))
  def cmsSeed(row: Int): Long = cmsSeeds(row)

  def cmsCreate(depth: Int, width: Int): Array[Long] = {
    require(depth >= 1 && depth <= CmsMaxDepth, s"cms depth must be in [1,$CmsMaxDepth], got $depth")
    require(width >= 16 && (width & (width - 1)) == 0 && width <= (1 << 24),
      s"cms width must be a power of two in [16, 2^24], got $width")
    new Array[Long](depth * width)
  }

  def cmsUpdate(counters: Array[Long], depth: Int, width: Int, baseHash: Long, inc: Long): Unit = {
    var r = 0
    while (r < depth) {
      val b = (splitmix64(baseHash ^ cmsSeeds(r)) & (width - 1)).toInt
      counters(r * width + b) += inc
      r += 1
    }
  }

  def cmsMerge(into: Array[Long], from: Array[Long]): Unit = {
    require(into.length == from.length,
      s"cms merge: shapes differ (${into.length} vs ${from.length} counters)")
    var i = 0
    while (i < into.length) { into(i) += from(i); i += 1 }
  }

  /** Point estimate: min over rows — an upper bound on the true count
    * (never under-counts), with error <= 2N/width at probability
    * 1 - 2^-depth. */
  def cmsQuery(counters: Array[Long], depth: Int, width: Int, baseHash: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val b = (splitmix64(baseHash ^ cmsSeeds(r)) & (width - 1)).toInt
      val c = counters(r * width + b)
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** [magic 'C', depth, log2(width), counters as big-endian longs]. */
  def cmsSerialize(counters: Array[Long], depth: Int, width: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(3 + counters.length * 8)
    bb.put('C'.toByte).put(depth.toByte)
      .put(java.lang.Integer.numberOfTrailingZeros(width).toByte)
    counters.foreach(bb.putLong)
    bb.array()
  }

  def cmsDeserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    require(bytes.length >= 3 && bytes(0) == 'C', "not a CMS sketch (bad magic)")
    val depth = bytes(1).toInt
    val width = 1 << bytes(2).toInt
    require(depth >= 1 && depth <= CmsMaxDepth, s"cms sketch depth out of range: $depth")
    require(bytes(2) >= 4 && bytes(2) <= 24, s"cms sketch width exponent out of range: ${bytes(2)}")
    require(bytes.length == 3 + depth * width * 8,
      s"cms sketch truncated: ${bytes.length} bytes for ${depth}x$width")
    val bb = java.nio.ByteBuffer.wrap(bytes, 3, depth * width * 8)
    val counters = new Array[Long](depth * width)
    var i = 0
    while (i < counters.length) { counters(i) = bb.getLong(); i += 1 }
    (depth, width, counters)
  }

  // ------------------------------------------- log-scaled quantile histogram
  // Non-negative integer values; subBits = s significant bits kept below the
  // leading bit. bucket(v) = v for v < 2^(s+1), else (v >>> e) + e * 2^s with
  // e = bitlen(v) - s - 1 — monotone, contiguous, and exact bit arithmetic,
  // so the relative error of a bucket's lower bound is < 2^-s. A value this
  // shape (HdrHistogram's sub-bucket scheme) needs no log() anywhere, which
  // is what makes the oracle reproduction exact.

  def logHistNumBuckets(subBits: Int): Int = {
    require(subBits >= 1 && subBits <= 10, s"sub_bits must be in [1,10], got $subBits")
    // max value 2^63-1 has bitlen 63 -> e_max = 62 - subBits; max bucket =
    // (2^(s+1)-1) + e_max * 2^s, so every bucket's lower bound stays a
    // positive Long (no phantom buckets whose lower bound would overflow)
    (1 << (subBits + 1)) + (62 - subBits) * (1 << subBits)
  }

  def logHistBucket(v: Long, subBits: Int): Int = {
    require(v >= 0, s"log histogram requires non-negative values, got $v")
    if (v < (1L << (subBits + 1))) v.toInt
    else {
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(v)
      val e = bitlen - subBits - 1
      ((v >>> e) + e.toLong * (1 << subBits)).toInt
    }
  }

  /** Inclusive lower bound of a bucket — the value the quantile reports. */
  def logHistLower(bucket: Int, subBits: Int): Long = {
    if (bucket < (1 << (subBits + 1))) bucket.toLong
    else {
      val sub = 1 << subBits
      val e = bucket / sub - 1
      val mant = bucket - e * sub // in [2^s, 2^(s+1))
      mant.toLong << e
    }
  }

  def logHistUpdate(counts: Array[Long], subBits: Int, v: Long): Unit =
    counts(logHistBucket(v, subBits)) += 1

  def logHistMerge(into: Array[Long], from: Array[Long]): Unit = {
    require(into.length == from.length,
      s"log-hist merge: bucket counts differ (${into.length} vs ${from.length})")
    var i = 0
    while (i < into.length) { into(i) += from(i); i += 1 }
  }

  /** Quantile q in [0,1]: lower bound of the bucket holding the element of
    * rank max(1, ceil(q*n)) in sorted order. Deterministic: pure integer
    * ranks (the q*n product is exact for any realistic n since q is a
    * round literal and doubles are exact integers to 2^53). */
  def logHistQuantile(counts: Array[Long], subBits: Int, q: Double): Long = {
    require(q >= 0.0 && q <= 1.0, s"quantile fraction must be in [0,1], got $q")
    var n = 0L
    var i = 0
    while (i < counts.length) { n += counts(i); i += 1 }
    if (n == 0) return -1L // empty sketch sentinel; expression layer turns this into null
    val rank = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    i = 0
    while (i < counts.length) {
      cum += counts(i)
      if (cum >= rank) return logHistLower(i, subBits)
      i += 1
    }
    logHistLower(counts.length - 1, subBits) // unreachable; defensive
  }

  // -------------------------------------------------------------- Bloom
  // m bits (power of two), k probes via standard double hashing (Kirsch &
  // Mitzenmacher 2006): bit_i = (h1 + i*h2) mod m with h1 = splitmix64(key)
  // and h2 = splitmix64(h1 ^ BloomSeed) — both SQL-reproducible. Merge = OR.

  val BloomSeed: Long = splitmix64(0x626C6F6FL) // "bloo"

  def bloomCreate(logBits: Int): Array[Long] = {
    require(logBits >= 6 && logBits <= 30, s"bloom log2(bits) must be in [6,30], got $logBits")
    new Array[Long](1 << (logBits - 6))
  }

  /** bit_i = (h1 + i*h2) mod 2^64, masked to logBits — the form the SQL
    * oracle mirrors directly (mod of a power of two = low bits). */
  def bloomBit(h1: Long, i: Int, logBits: Int): Int = {
    val h2 = splitmix64(h1 ^ BloomSeed)
    ((h1 + i.toLong * h2) & ((1L << logBits) - 1)).toInt
  }

  def bloomUpdate(words: Array[Long], logBits: Int, k: Int, h1: Long): Unit = {
    var i = 0
    while (i < k) {
      val bit = bloomBit(h1, i, logBits)
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def bloomContains(words: Array[Long], logBits: Int, k: Int, h1: Long): Boolean = {
    var i = 0
    while (i < k) {
      val bit = bloomBit(h1, i, logBits)
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0) return false
      i += 1
    }
    true
  }

  def bloomMerge(into: Array[Long], from: Array[Long]): Unit = {
    require(into.length == from.length,
      s"bloom merge: sizes differ (${into.length} vs ${from.length} words)")
    var i = 0
    while (i < into.length) { into(i) |= from(i); i += 1 }
  }

  /** [magic 'B', log2(bits), k, words as big-endian longs]. */
  def bloomSerialize(words: Array[Long], logBits: Int, k: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(3 + words.length * 8)
    bb.put('B'.toByte).put(logBits.toByte).put(k.toByte)
    words.foreach(bb.putLong)
    bb.array()
  }

  def bloomDeserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    require(bytes.length >= 3 && bytes(0) == 'B', "not a Bloom sketch (bad magic)")
    val logBits = bytes(1).toInt
    val k = bytes(2).toInt
    require(logBits >= 6 && logBits <= 30, s"bloom sketch log2(bits) out of range: $logBits")
    require(k >= 1 && k <= 32, s"bloom sketch k out of range: $k")
    val nWords = 1 << (logBits - 6)
    require(bytes.length == 3 + nWords * 8,
      s"bloom sketch truncated: ${bytes.length} bytes for logBits=$logBits")
    val bb = java.nio.ByteBuffer.wrap(bytes, 3, nWords * 8)
    val words = new Array[Long](nWords)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    (logBits, k, words)
  }

  // ------------------------------------------------------- KMV (theta)
  // k-minimum-values sketch (Bar-Yossef et al. 2002; the theta-sketch
  // family): the k smallest DISTINCT key hashes in unsigned order.
  // Fully deterministic (no register probability — the k-min SET itself is
  // a pure function of the key set), mergeable (merge + keep k smallest),
  // and supports the set algebra HLL cannot: intersection estimates.
  // Estimates are pure integer arithmetic: est = floor((k-1)*2^64 / h_k).

  /** Insert preserving "k smallest distinct unsigned hashes, sorted".
    * Returns the (possibly new) array — callers treat state as immutable
    * between calls; the aggregate wraps this in a growable buffer. */
  def kmvInsert(state: Array[Long], n: Int, k: Int, h: Long): Int = {
    // state has capacity >= k; n = current fill; unsigned-sorted prefix
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(state(mid), h)
      if (c < 0) lo = mid + 1 else hi = mid
    }
    if (lo < n && state(lo) == h) return n // duplicate
    if (n == k && lo == k) return n // larger than current k-th: ignore
    val newN = math.min(n + 1, k)
    // shift right from lo, dropping the last element if already full
    var i = newN - 1
    while (i > lo) { state(i) = state(i - 1); i -= 1 }
    state(lo) = h
    newN
  }

  def kmvMerge(a: Array[Long], na: Int, b: Array[Long], nb: Int, k: Int): (Array[Long], Int) = {
    val out = new Array[Long](k)
    var n = 0
    var i = 0
    while (i < na) { n = kmvInsert(out, n, k, a(i)); i += 1 }
    i = 0
    while (i < nb) { n = kmvInsert(out, n, k, b(i)); i += 1 }
    (out, n)
  }

  /** Distinct estimate: exact below k; floor((k-1)*2^64 / h_k) at k,
    * saturating at Long.MaxValue (a pathologically small k-th hash — only
    * reachable adversarially — would otherwise overflow the Long). */
  def kmvEstimate(state: Array[Long], n: Int, k: Int): Long = {
    if (n < k) n.toLong
    else {
      val hk = BigInt(state(k - 1)) & ((BigInt(1) << 64) - 1)
      (((BigInt(k - 1) << 64) / hk) min BigInt(Long.MaxValue)).toLong
    }
  }

  /** Intersection estimate of two same-k sketches: take the union's
    * threshold (its k-th min, or the max seen when under-filled), count
    * common hashes at or below it, scale the union estimate. All integer:
    * floor(c * unionEst / kEff). */
  def kmvIntersect(a: Array[Long], na: Int, b: Array[Long], nb: Int, k: Int): Long = {
    val (u, nu) = kmvMerge(a, na, b, nb, k)
    if (nu == 0) return 0L
    val unionEst = kmvEstimate(u, nu, k)
    // common hashes within the union's retained set
    val inU = new scala.collection.mutable.HashSet[Long]
    var i = 0
    while (i < nu) { inU += u(i); i += 1 }
    var c = 0L
    i = 0
    while (i < na) { if (inU.contains(a(i)) && contains(b, nb, a(i))) c += 1; i += 1 }
    // BigInt: c*unionEst can exceed Long when unionEst saturates
    ((BigInt(c) * unionEst / nu) min BigInt(Long.MaxValue)).toLong
  }

  private def contains(arr: Array[Long], n: Int, h: Long): Boolean = {
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val cmp = java.lang.Long.compareUnsigned(arr(mid), h)
      if (cmp < 0) lo = mid + 1 else hi = mid
    }
    lo < n && arr(lo) == h
  }

  /** [magic 'K', k as u16, n as u16, hashes...]. */
  def kmvSerialize(state: Array[Long], n: Int, k: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(5 + n * 8)
    bb.put('K'.toByte).putShort(k.toShort).putShort(n.toShort)
    var i = 0
    while (i < n) { bb.putLong(state(i)); i += 1 }
    bb.array()
  }

  def kmvDeserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    require(bytes.length >= 5 && bytes(0) == 'K', "not a KMV sketch (bad magic)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.get()
    val k = bb.getShort().toInt
    val n = bb.getShort().toInt
    require(k >= 2 && k <= 65535, s"kmv sketch k out of range: $k")
    require(n >= 0 && n <= k, s"kmv sketch fill $n exceeds k=$k")
    require(bytes.length == 5 + n * 8,
      s"kmv sketch truncated: ${bytes.length} bytes for n=$n")
    val state = new Array[Long](k)
    var i = 0
    while (i < n) { state(i) = bb.getLong(); i += 1 }
    (k, n, state)
  }

  /** [magic 'Q', subBits, counts as varint-free big-endian longs]. Buckets
    * are dense but small (<= 2^(s+1) + 58*2^s entries — ~15 KB at s=5). */
  def logHistSerialize(counts: Array[Long], subBits: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + counts.length * 8)
    bb.put('Q'.toByte).put(subBits.toByte)
    counts.foreach(bb.putLong)
    bb.array()
  }

  def logHistDeserialize(bytes: Array[Byte]): (Int, Array[Long]) = {
    require(bytes.length >= 2 && bytes(0) == 'Q', "not a quantile histogram sketch (bad magic)")
    val subBits = bytes(1).toInt
    val nb = logHistNumBuckets(subBits)
    require(bytes.length == 2 + nb * 8,
      s"quantile sketch truncated: ${bytes.length} bytes for sub_bits=$subBits (want ${2 + nb * 8})")
    val bb = java.nio.ByteBuffer.wrap(bytes, 2, nb * 8)
    val counts = new Array[Long](nb)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong(); i += 1 }
    (subBits, counts)
  }
}

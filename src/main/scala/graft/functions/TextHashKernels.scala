package graft.functions

/**
 * Static kernel faces for the codegen expressions (graft.expressions): one
 * call per row from GENERATED Java, so this must be a TOP-LEVEL object —
 * scalac emits static forwarders on the companion class that Janino can
 * resolve as `graft.functions.TextHashKernels.minhashSig(...)`; a nested
 * object (`Dedup.Kernels`) has no Java-static path and fails codegen
 * compilation at runtime (observed: silent interpreter-mode fallback).
 * Same arithmetic as the mapPartitions kernels in [[Dedup]], so expression
 * and kernel outputs are bit-identical.
 */
object TextHashKernels {

  /** 64-bit FNV+splitmix hashes of the distinct n-word shingles. */
  def shingleHashes(text: String, shingleSize: Int): Array[Long] = {
    val toks = Dedup.shinglesScala(if (text == null) "" else text, shingleSize)
    val hs = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { hs(i) = Dedup.hash64(toks(i)); i += 1 }
    hs
  }

  /** MinHash signature over the hashed shingles — identical per-seed mixing
    * to [[Dedup.docSignatures]]. */
  def minhashSig(text: String, numHashes: Int, shingleSize: Int): Array[Long] = {
    val toks = Dedup.shinglesScala(if (text == null) "" else text, shingleSize)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < toks.length) {
      val h0 = Dedup.hash64(toks(t))
      var i = 0
      while (i < numHashes) {
        val h = Dedup.mix64(h0 ^ (i * 0x9e3779b97f4a7c15L))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    sig
  }

  /** Combined (toks, sig) in ONE tokenization pass, as an InternalRow for
    * the `doc_signature` struct expression — the codegen face of
    * [[Dedup.docSignatures]]'s kernel arithmetic. */
  def docSigRow(text: String, numHashes: Int,
                shingleSize: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = Dedup.shinglesScala(if (text == null) "" else text, shingleSize)
    val hs = new Array[Long](toks.length)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < toks.length) {
      val h0 = Dedup.hash64(toks(t))
      hs(t) = h0
      var i = 0
      while (i < numHashes) {
        val h = Dedup.mix64(h0 ^ (i * 0x9e3779b97f4a7c15L))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new org.apache.spark.sql.catalyst.util.GenericArrayData(hs),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)))
  }

  /** Integer-exact trigram rarity over PRE-LOWERCASED text against a sorted
    * LM: `keys` ascending by natural String order with parallel `cnts`,
    * binary-searched per trigram. Returns [rarity_sum, n_trigrams, rarity]
    * — the same arithmetic as Corpus.scoreTrigramRarity's contract. */
  def trigramRarity(text: String, keys: Array[String], cnts: Array[Long],
                    scale: Long, totalN: Long): Array[Long] = {
    var s = 0L
    var n = 0L
    if (text != null && text.length >= 3) {
      var i = 0
      val last = text.length - 3
      while (i <= last) {
        val idx = java.util.Arrays.binarySearch(
          keys.asInstanceOf[Array[AnyRef]], text.substring(i, i + 3))
        val cnt = if (idx >= 0) cnts(idx) else 0L
        s += math.min(scale * totalN / (cnt + 1L), 1000000000000L)
        n += 1
        i += 1
      }
    }
    Array(s, n, if (n == 0) 0L else s / n)
  }

  /** All overlapping character n-grams (UTF-16 window — identical to
    * `String.sliding(n)` on the corpus alphabet), as UTF8Strings so the
    * exploding expression allocates nothing downstream. */
  def charNgrams(text: String, n: Int): Array[org.apache.spark.unsafe.types.UTF8String] = {
    if (text == null || text.length < n)
      return Array.empty[org.apache.spark.unsafe.types.UTF8String]
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](text.length - n + 1)
    var i = 0
    while (i + n <= text.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(text.substring(i, i + n))
      i += 1
    }
    out
  }

  /** Rank-based language score: for each language (sorted array), the sum
    * over the text's trigram OCCURRENCES of the trigram's profile rank
    * (`lang + 0x1f + tri` binary-searched in `keys`/`ranks`), OOV costing
    * `topK + 1`; returns the arg-min language (ties: language asc — the
    * langs array is sorted, and strict `<` keeps the first minimum). */
  def langScore(text: String, langs: Array[String], keys: Array[String],
                ranks: Array[Int], topK: Int): org.apache.spark.unsafe.types.UTF8String = {
    val keysRef = keys.asInstanceOf[Array[AnyRef]]
    val scores = new Array[Long](langs.length)
    if (text != null && text.length >= 3) {
      var i = 0
      while (i + 3 <= text.length) {
        val tri = text.substring(i, i + 3)
        var l = 0
        while (l < langs.length) {
          val k = java.util.Arrays.binarySearch(keysRef, langs(l) + '\u001f' + tri)
          scores(l) += (if (k >= 0) ranks(k) else topK + 1)
          l += 1
        }
        i += 1
      }
    }
    var best = 0
    var l = 1
    while (l < langs.length) { if (scores(l) < scores(best)) best = l; l += 1 }
    org.apache.spark.unsafe.types.UTF8String.fromString(langs(best))
  }

  private val nbMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First three lowercase hex chars of md5(token) — the SQL-replicable
    * 4096-bucket feature hash (`substr(md5(tok), 1, 3)` in DuckDB). */
  private def nbBucket(tok: String): String = {
    val d = nbMd5.get()
    d.reset()
    val h = d.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = "0123456789abcdef"
    new String(Array(
      hex.charAt((h(0) >> 4) & 0xF), hex.charAt(h(0) & 0xF),
      hex.charAt((h(1) >> 4) & 0xF)))
  }

  /** Integer-quantized multinomial Naive Bayes scoring: tokens (ASCII-
    * whitespace runs, matching the `\s+` split both engines use) hash to
    * md5-hex3 buckets; score_l = prior_l + Σ_tok (weight_l(bucket) −
    * norm_l) with weight = bitLength(count+1) (1 when unseen), all
    * integers — bit-identical on every JVM and rebuildable in SQL with
    * floor(log2(x))+1. Highest score wins, ties on label ascending (the
    * labels array is sorted). */
  def nbScore(text: String, labels: Array[String],
              bucketKeys: Array[Array[String]], weights: Array[Array[Int]],
              norms: Array[Int], priors: Array[Int]): org.apache.spark.unsafe.types.UTF8String = {
    val scores = new Array[Long](labels.length)
    var l = 0
    while (l < labels.length) { scores(l) = priors(l); l += 1 }
    if (text != null) {
      var i = 0
      val n = text.length
      def isWs(c: Char): Boolean =
        c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'
      while (i < n) {
        while (i < n && isWs(text.charAt(i))) i += 1
        val start = i
        while (i < n && !isWs(text.charAt(i))) i += 1
        if (i > start) {
          val h3 = nbBucket(text.substring(start, i))
          l = 0
          while (l < labels.length) {
            val k = java.util.Arrays.binarySearch(
              bucketKeys(l).asInstanceOf[Array[AnyRef]], h3)
            scores(l) += (if (k >= 0) weights(l)(k) else 1) - norms(l)
            l += 1
          }
        }
      }
    }
    var best = 0
    l = 1
    while (l < labels.length) { if (scores(l) > scores(best)) best = l; l += 1 }
    org.apache.spark.unsafe.types.UTF8String.fromString(labels(best))
  }

  /** True iff the host or any dot-suffix of it appears in `sorted` (natural
    * String order): the blocklist parent-domain rule without materializing
    * a suffix array per row. O(labels × log |list|). */
  def domainMatch(host: String, sorted: Array[String]): Boolean = {
    if (host == null || host.isEmpty) return false
    val keys = sorted.asInstanceOf[Array[AnyRef]]
    var start = 0
    while (start < host.length) {
      val suffix = if (start == 0) host else host.substring(start)
      if (java.util.Arrays.binarySearch(keys, suffix) >= 0) return true
      val dot = host.indexOf('.', start)
      if (dot < 0 || dot + 1 >= host.length) return false
      start = dot + 1
    }
    false
  }
}

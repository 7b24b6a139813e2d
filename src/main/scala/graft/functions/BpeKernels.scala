package graft.functions

/**
 * Byte-pair-encoding kernels (Sennrich et al. 2016, "Neural Machine
 * Translation of Rare Words with Subword Units" — the public BPE
 * algorithm): greedy merge application over a learned, ordered merge
 * table. Static-call targets for the codegen'd expressions in
 * [[graft.expressions.BpeExpressions]].
 *
 * Encoding algorithm (must stay in lock-step with the SQL oracle, which
 * re-implements it as a recursive CTE): a word starts as its character
 * sequence; repeatedly the adjacent pair with the LOWEST merge rank is
 * merged at its LEFTMOST occurrence, until no adjacent pair is in the
 * table. For merge tables produced by BPE training this one-at-a-time
 * rule coincides with the usual merge-all-occurrences formulation (a
 * pair built FROM an earlier merge always ranks later), and it is the
 * formulation a SQL oracle can express one recursion step at a time.
 *
 * The merge table travels as two parallel arrays — pair keys
 * `l + u001f + r` SORTED lexicographically, and each key's merge rank —
 * so rank lookup is a binary search with zero per-row allocation and the
 * arrays ride inside the expression via `addReferenceObj` (the
 * TrigramRarity state-carrying pattern).
 */
object BpeKernels {

  final val Sep = '\u001f' // unit separator — never inside a token

  private def rankOf(l: String, r: String,
                     pairKeys: Array[String], ranks: Array[Int]): Int = {
    val i = java.util.Arrays.binarySearch(pairKeys.asInstanceOf[Array[AnyRef]],
      l + Sep + r)
    if (i >= 0) ranks(i) else Int.MaxValue
  }

  /** The greedy loop shared by both alphabets: repeatedly merge the
    * lowest-rank adjacent pair at its leftmost occurrence. */
  private def mergeLoop(toks: java.util.ArrayList[String],
                        pairKeys: Array[String], ranks: Array[Int]): Array[String] = {
    var changed = true
    while (changed && toks.size > 1) {
      var best = Int.MaxValue
      var pos = -1
      var j = 0
      while (j < toks.size - 1) {
        val r = rankOf(toks.get(j), toks.get(j + 1), pairKeys, ranks)
        if (r < best) { best = r; pos = j }
        j += 1
      }
      if (pos < 0) changed = false
      else {
        toks.set(pos, toks.get(pos) + toks.get(pos + 1))
        toks.remove(pos + 1)
      }
    }
    toks.toArray(new Array[String](toks.size))
  }

  /** Greedy BPE encode of one word (already lowercased), CHAR alphabet. */
  def encodeWord(word: String, pairKeys: Array[String], ranks: Array[Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    val toks = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) { toks.add(String.valueOf(word.charAt(i))); i += 1 }
    mergeLoop(toks, pairKeys, ranks)
  }

  /** Greedy BPE encode of one word at BYTE level: the initial symbols are
    * the word's UTF-8 BYTES, each rendered as the latin-1 character of its
    * value (the standard bytes-as-chars embedding — a fixed 256-symbol
    * base alphabet), so a FROZEN merges file covers any input text: no
    * out-of-alphabet symbol can ever appear, the property production
    * tokenizers rely on when budgets are enforced against a fixed model.
    * On pure-ASCII text this coincides with the char-level encode. */
  def encodeWordBytes(word: String, pairKeys: Array[String], ranks: Array[Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val toks = new java.util.ArrayList[String](bs.length)
    var i = 0
    while (i < bs.length) { toks.add(String.valueOf((bs(i) & 0xFF).toChar)); i += 1 }
    mergeLoop(toks, pairKeys, ranks)
  }

  /** Whitespace words of the lowercased text (ASCII-stable lowering —
    * matches SQL `lower()` on the corpus alphabet). */
  private def words(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  /** Total BPE token count of a document. */
  def tokenCount(text: String, pairKeys: Array[String], ranks: Array[Int]): Long =
    tokenCount(text, pairKeys, ranks, false)

  def tokenCount(text: String, pairKeys: Array[String], ranks: Array[Int],
                 byteLevel: Boolean): Long = {
    var n = 0L
    val ws = words(text)
    var i = 0
    while (i < ws.length) {
      n += (if (byteLevel) encodeWordBytes(ws(i), pairKeys, ranks)
            else encodeWord(ws(i), pairKeys, ranks)).length
      i += 1
    }
    n
  }

  /** Concatenated token stream of a document (word order preserved). */
  def encodeText(text: String, pairKeys: Array[String], ranks: Array[Int]): Array[String] =
    encodeText(text, pairKeys, ranks, false)

  def encodeText(text: String, pairKeys: Array[String], ranks: Array[Int],
                 byteLevel: Boolean): Array[String] = {
    val out = new java.util.ArrayList[String]()
    val ws = words(text)
    var i = 0
    while (i < ws.length) {
      val toks = if (byteLevel) encodeWordBytes(ws(i), pairKeys, ranks)
                 else encodeWord(ws(i), pairKeys, ranks)
      var j = 0
      while (j < toks.length) { out.add(toks(j)); j += 1 }
      i += 1
    }
    out.toArray(new Array[String](out.size))
  }
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Trained byte-pair encoding for corpus token accounting — replacing the
 * regex token-count heuristic wherever exact, model-consistent counts
 * matter (token_budget cuts, sequence packing, mixture budgeting).
 *
 * Training (Sennrich 2016): word-TYPE frequencies, not the raw corpus,
 * drive the merge induction — the classic formulation where the driver
 * loop runs over a bounded vocabulary:
 *
 *   1. one distributed pass: lowercased whitespace word counts, top
 *      `maxWordTypes` by (count desc, word asc) — a deterministic,
 *      bounded collect (the same driver-state class as IVF centroids /
 *      the trigram LM);
 *   2. driver loop, `numMerges` rounds: count adjacent symbol pairs
 *      weighted by word count, merge the most frequent (ties broken
 *      lexicographically — deterministic on any cluster), rewrite the
 *      vocabulary.
 *
 * At 100 TB the distributed pass is one shuffle on word keys with
 * map-side partials; everything after is O(vocab · merges) driver work,
 * independent of corpus size. Scoring is a single codegen'd expression
 * per row ([[graft.expressions.BpeTokenCount]]) with the merge table
 * inside the plan — shuffle-free, stream-safe against a static model
 * (the production shape: train offline, score deltas as they land).
 */
object Bpe {

  /** Learn `numMerges` merges from the corpus. Returns the ordered merge
    * list (rank = position). */
  def train(df: DataFrame, textCol: String, numMerges: Int = 200,
            maxWordTypes: Int = 100000): Seq[(String, String)] = {
    require(numMerges > 0, "Bpe.train: numMerges must be positive")
    require(maxWordTypes > 0, "Bpe.train: maxWordTypes must be positive")
    val wordCounts = df
      .select(explode(split(lower(col(textCol).cast("string")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // vocabulary as mutable symbol sequences, weighted by word count
    val words: Array[java.util.ArrayList[String]] = wordCounts.map { case (w, _) =>
      val l = new java.util.ArrayList[String](w.length)
      var i = 0
      while (i < w.length) { l.add(String.valueOf(w.charAt(i))); i += 1 }
      l
    }
    val counts: Array[Long] = wordCounts.map(_._2)

    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < words.length) {
        val w = words(wi); val c = counts(wi)
        var j = 0
        while (j < w.size - 1) {
          pairCounts.merge((w.get(j), w.get(j + 1)), c, java.lang.Long.sum)
          j += 1
        }
        wi += 1
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // most frequent pair; ties broken lexicographically — deterministic
        var best: (String, String) = null
        var bestN = -1L
        pairCounts.forEach { (p, n) =>
          if (n > bestN || (n == bestN &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestN = n
          }
        }
        merges += best
        // rewrite: merge all occurrences left-to-right, non-overlapping
        wi = 0
        while (wi < words.length) {
          val w = words(wi)
          var j = 0
          while (j < w.size - 1) {
            if (w.get(j) == best._1 && w.get(j + 1) == best._2) {
              w.set(j, w.get(j) + w.get(j + 1))
              w.remove(j + 1)
            } else j += 1
          }
          wi += 1
        }
        m += 1
      }
    }
    merges.result()
  }

  /** (sorted pair keys, parallel ranks) for the kernels/expressions. */
  private[graft] def lookupArrays(merges: Seq[(String, String)]): (Array[String], Array[Int]) = {
    val keyed = merges.zipWithIndex
      .map { case ((l, r), rank) => (l + BpeKernels.Sep + r, rank) }
      .sortBy(_._1)
    (keyed.map(_._1).toArray, keyed.map(_._2).toArray)
  }

  private def registryName(prefix: String, keys: Array[String]): String =
    prefix + java.lang.Long.toHexString(
      keys.foldLeft(keys.length.toLong)((h, k) => h * 1000003L + k.hashCode))

  /** Exact BPE token count per row under the trained merges — one fused
    * codegen expression, no shuffle. `byteLevel` switches the initial
    * alphabet from chars to UTF-8 bytes (the fixed-tokenizer shape:
    * budgets against a frozen 256-base-symbol model, never an
    * out-of-alphabet miss). */
  def withTokenCount(df: DataFrame, textCol: String, merges: Seq[(String, String)],
                     outCol: String = "bpe_tokens",
                     byteLevel: Boolean = false): DataFrame = {
    val (keys, ranks) = lookupArrays(merges)
    val spark = df.sparkSession
    val fname = registryName(if (byteLevel) "graft_bpe_bcount_" else "graft_bpe_count_", keys)
    graft.expressions.GraftFunctions.registerIfAbsent(spark, fname, {
      case Seq(t) => graft.expressions.BpeTokenCount(t, keys, ranks, byteLevel)
      case other => throw new IllegalArgumentException(
        s"$fname takes 1 argument, got ${other.size}")
    })
    df.withColumn(outCol,
      coalesce(call_function(fname, col(textCol).cast("string")), lit(0L)))
  }

  /** The token stream itself (array column, word order preserved);
    * `byteLevel` keeps it consistent with same-flag token counts. */
  def withEncoded(df: DataFrame, textCol: String, merges: Seq[(String, String)],
                  outCol: String = "bpe_toks",
                  byteLevel: Boolean = false): DataFrame = {
    val (keys, ranks) = lookupArrays(merges)
    val spark = df.sparkSession
    val fname = registryName(
      if (byteLevel) "graft_bpe_bencode_" else "graft_bpe_encode_", keys)
    graft.expressions.GraftFunctions.registerIfAbsent(spark, fname, {
      case Seq(t) => graft.expressions.BpeEncode(t, keys, ranks, byteLevel)
      case other => throw new IllegalArgumentException(
        s"$fname takes 1 argument, got ${other.size}")
    })
    df.withColumn(outCol, call_function(fname, col(textCol).cast("string")))
  }

  /** Persist / reload a merge table (one `l<TAB>r` line per merge, rank =
    * line order) — train once per corpus, score any later frame or
    * stream against the same model. */
  def saveMerges(merges: Seq[(String, String)], path: java.nio.file.Path): Unit =
    java.nio.file.Files.write(path,
      merges.map { case (l, r) => s"$l\t$r" }.mkString("", "\n", "\n").getBytes("UTF-8"))

  /** Accepts both our tab-separated dump and the merges.txt SHAPE
    * (space-separated pairs, `#`-prefixed header lines, CRLF or LF).
    * Scope note: the file's SYMBOLS are taken literally — GPT-2-family
    * vocabularies that remap bytes through bytes_to_unicode (Ġ-prefixed
    * space carriers etc.) use a different alphabet and pre-tokenizer and
    * will NOT reproduce that tokenizer's counts here; byte-level mode's
    * alphabet is the raw latin-1 byte rendering (BpeKernels). */
  def loadMerges(path: java.nio.file.Path): Seq[(String, String)] =
    new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      .split("\r?\n").toSeq.filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
        val i = { val t = line.indexOf('\t'); if (t > 0) t else line.indexOf(' ') }
        require(i > 0, s"bad merge line: `$line`")
        (line.substring(0, i), line.substring(i + 1))
      }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * counting, quality scoring, language ID, and document fingerprinting.
 *
 * All are pure Column expressions (no UDFs): they stay inside whole-stage
 * codegen / evaluate as vectorizable expressions per partition, so they scale
 * linearly with input and never shuffle on their own.
 */
object TextFunctions {

  /** Whitespace tokenization (multi-space safe). */
  def words(text: Column): Column =
    filter(split(text, " +"), w => length(w) > 0)

  /** Whitespace token count, as BIGINT. */
  def wordCount(text: Column): Column = size(words(text)).cast(LongType)

  /** BPE-ish token count: runs of word chars count one token each, every
    * other non-space character counts alone — the standard cheap
    * pre-tokenizer upper bound. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n]"), lit(0))).cast(LongType)

  /** Mean word length, NULL for empty documents. */
  def avgWordLength(text: Column): Column = {
    val ws = words(text)
    when(size(ws) > 0,
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(ws))
  }

  /** Ratio of tokens found in `stopwords` — high values indicate natural
    * prose, near-zero indicates tables/code/noise. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val ws = words(text)
    when(size(ws) > 0,
      size(filter(ws, w => w.isInCollection(stopwords))).cast("double") / size(ws))
  }

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))).cast("double") / length(text))

  /** Composite quality score in [0,1]: length band + stopword presence —
    * the standard heuristic-filter shape (length, symbol ratio, stopword
    * density) used by public web-corpus cleaning pipelines. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenOk = when(length(text).between(50, 10000), 1.0).otherwise(0.0)
    val stopOk = when(coalesce(stopwordRatio(text, stopwords), lit(0.0)) > 0.01, 1.0).otherwise(0.0)
    val punctOk = when(coalesce(punctRatio(text), lit(0.0)) < 0.3, 1.0).otherwise(0.0)
    round((lenOk + stopOk + punctOk) / 3.0, 4)
  }

  /** The Gopher stop-word presence list (Rae et al. 2021, appendix A1.1 —
    * public): a document should contain at least two of these. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher-rule quality stats + keep flag (Rae et al. 2021 appendix A1.1,
   * public): word count band, mean word length in [3,10], symbol-to-word
   * ratio (# and …) ≤ 0.1, ≤ 90% bullet-started lines, ≤ 30%
   * ellipsis-ended lines, ≥ 80% of words containing a letter, and ≥ 2
   * distinct stop words. Every threshold is evaluated in INTEGER
   * arithmetic (e.g. mean-length ∈ [3,10] ⇔ 3n ≤ Σlen ≤ 10n) so the
   * DuckDB oracle reproduces the flag bit-exactly — no float boundaries.
   * All expressions are native Catalyst higher-order functions over the
   * split arrays (no UDFs), so the filter is a narrow, pushdown-friendly
   * projection at any scale.
   */
  def withGopherQuality(df: org.apache.spark.sql.DataFrame, textCol: String,
                        minWords: Long = 50, maxWords: Long = 100000)
      : org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val ws = filter(split(text, "\\s+"), w => length(w) > lit(0))
    val lines = split(text, "\n")
    val out = df
      .withColumn("__words", ws)
      .withColumn("__lines", lines)
      .withColumn("n_words", size(col("__words")).cast(LongType))
      .withColumn("total_word_len",
        aggregate(col("__words"), lit(0L), (acc, w) => acc + length(w)))
      .withColumn("n_alpha_words",
        size(filter(col("__words"), w => w.rlike("[A-Za-z]"))).cast(LongType))
      .withColumn("n_symbols",
        (length(text) - length(regexp_replace(text, "#", "")) +
          (length(text) - length(regexp_replace(text, "\\.\\.\\.", "")) ) / 3).cast(LongType))
      .withColumn("n_lines", size(col("__lines")).cast(LongType))
      .withColumn("n_bullet_lines",
        size(filter(col("__lines"), l => ltrim(l).rlike("^[-*•]"))).cast(LongType))
      .withColumn("n_ellipsis_lines",
        size(filter(col("__lines"), l => rtrim(l).endsWith("..."))).cast(LongType))
      .withColumn("stop_hits", // DISTINCT stop words present, per the rule
        // hash-based set intersection, O(words + stopwords): lowering the
        // word array once and intersecting beats the old
        // filter(stopwords, s => array_contains(transform(...)))) shape,
        // which re-lowered the whole array per stopword (O(S×W) interpreted
        // lambda calls — the HOF-overhead trap Corpus.scala warns about)
        size(array_intersect(
          transform(col("__words"), lower _), typedLit(gopherStopwords))).cast(LongType))
    out
      .withColumn("gopher_keep",
        col("n_words").between(minWords, maxWords) &&
          col("total_word_len") >= lit(3L) * col("n_words") &&
          col("total_word_len") <= lit(10L) * col("n_words") &&
          lit(10L) * col("n_symbols") <= col("n_words") &&
          lit(10L) * col("n_bullet_lines") <= lit(9L) * col("n_lines") &&
          lit(10L) * col("n_ellipsis_lines") <= lit(3L) * col("n_lines") &&
          lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words") &&
          col("stop_hits") >= lit(2L))
      .drop("__words", "__lines")
  }

  /**
   * C4-style line-level cleaning (Raffel et al. 2020 §2.2, public): keep
   * only lines that end in terminal punctuation (. ! ? ") and contain at
   * least `minLineWords` words and no "javascript"; then drop documents
   * whose cleaned text has fewer than `minLines` surviving lines or
   * contains "lorem ipsum" or a curly brace. Adds `clean_text` (surviving
   * lines re-joined), `n_kept_lines`, and the `c4_keep` flag. Exact
   * string/integer predicates only — the DuckDB oracle reproduces the
   * output byte-for-byte. Narrow projection, no shuffle, no UDF.
   */
  def withC4Clean(df: org.apache.spark.sql.DataFrame, textCol: String,
                  minLineWords: Int = 5, minLines: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val kept = filter(split(text, "\n"), l =>
      rtrim(l).rlike("[.!?\"]$") &&
        size(filter(split(l, "\\s+"), w => length(w) > lit(0))) >= lit(minLineWords) &&
        !lower(l).contains("javascript"))
    df.withColumn("__kept", kept)
      .withColumn("clean_text", array_join(col("__kept"), "\n"))
      .withColumn("n_kept_lines", size(col("__kept")).cast(LongType))
      .withColumn("c4_keep",
        col("n_kept_lines") >= lit(minLines.toLong) &&
          !lower(text).contains("lorem ipsum") &&
          !text.contains("{"))
      .drop("__kept")
  }

  /**
   * HTML → text extraction for crawl pipelines (WARC `response` records →
   * the text ops): drops script/style/head blocks and comments, strips
   * tags, unescapes the common entities, and collapses runs of blank
   * lines / spaces. A chained regexp_replace Column — codegen'd, narrow,
   * no UDF — i.e. the C4/CCNet-style extraction step, deliberately
   * heuristic (a full DOM parse is out of scope at 100 TB and the
   * downstream quality filters absorb the difference).
   */
  /** String twin of [[htmlToText]] for driver/parser call sites (the mail
    * source's text/html fallback) — SAME regex chain term by term, so the
    * two faces stay semantically identical. */
  def htmlToTextString(html0: String): String = {
    var c = html0
    for (t <- Seq("script", "style", "head"))
      c = c.replaceAll(s"(?is)<$t[^>]*>.*?</$t>", " ")
    c = c.replaceAll("(?s)<!--.*?-->", " ")
    c = c.replaceAll("(?i)<(br|/p|/div|/h[1-6]|/li|/tr)[^>]*>", "\n")
    c = c.replaceAll("(?s)<[^>]*>", " ")
    c = c.replaceAll("&nbsp;", " ")
    c = c.replaceAll("&lt;", "<")
    c = c.replaceAll("&gt;", ">")
    c = c.replaceAll("&quot;", "\"")
    c = c.replaceAll("&#39;", "'")
    c = c.replaceAll("&amp;", "&")
    c = c.replaceAll("[ \\t]+", " ")
    c = c.replaceAll(" ?\\n ?", "\n")
    c = c.replaceAll("\\n{2,}", "\n")
    c.replaceAll("^[ \\n\\t]+|[ \\n\\t]+$", "")
  }

  def htmlToText(html: Column): Column = {
    // per-tag patterns (not one backreference pattern) so the DuckDB
    // oracle — RE2, no backreferences — mirrors term by term
    var c = html
    for (t <- Seq("script", "style", "head"))
      c = regexp_replace(c, s"(?is)<$t[^>]*>.*?</$t>", " ")
    c = regexp_replace(c, "(?s)<!--.*?-->", " ")
    // block-level closers become newlines so paragraphs survive the strip
    c = regexp_replace(c, "(?i)<(br|/p|/div|/h[1-6]|/li|/tr)[^>]*>", "\n")
    c = regexp_replace(c, "(?s)<[^>]*>", " ")
    c = regexp_replace(c, "&nbsp;", " ")
    c = regexp_replace(c, "&lt;", "<")
    c = regexp_replace(c, "&gt;", ">")
    c = regexp_replace(c, "&quot;", "\"")
    c = regexp_replace(c, "&#39;", "'")
    // `&amp;` LAST so escaped entity text (`&amp;lt;`) yields the literal
    // `&lt;` instead of double-unescaping to `<`
    c = regexp_replace(c, "&amp;", "&")
    c = regexp_replace(c, "[ \\t]+", " ")          // collapse spaces
    c = regexp_replace(c, " ?\\n ?", "\n")         // trim around newlines
    c = regexp_replace(c, "\\n{2,}", "\n")         // collapse blank lines
    trim(c, " \n\t") // plain trim strips spaces only — include \n\t
  }

  /** Stopword vote lists per language for the n-gram/stopword language-ID
    * heuristic. Deliberately small and public-knowledge. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "es" -> Seq("el", "de", "y", "los", "las", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"),
  )

  /** Language ID: count stopword hits per language, pick the argmax with a
    * fixed priority order for ties (list order above). Returns the language
    * code, "und" when no list scores.
    *
    * Single-pass formulation: one fold over the words accumulates all
    * per-language counts, and the argmax happens in the aggregate's finish
    * lambda, where the accumulator is a lambda variable (each reference is a
    * cheap variable read). The naive shape — a filter+size per language
    * referenced from `greatest` and every `when` — re-splits and re-scans
    * the text ~3× per language because common-subexpression elimination
    * does not reach interpreted higher-order functions. */
  def langId(text: Column): Column = {
    val ws = words(lower(text))
    val n = langStopwords.size
    aggregate(
      ws,
      array_repeat(lit(0), n),
      (acc, w) => zip_with(
        acc,
        array(langStopwords.map { case (_, stops) =>
          when(w.isInCollection(stops), 1).otherwise(0)
        }: _*),
        (a, b) => a + b),
      acc => {
        val scores = (0 until n).map(i => element_at(acc, i + 1))
        val best = scores.reduce((a, b) => greatest(a, b))
        // first matching WHEN wins → earlier languages take ties
        coalesce(langStopwords.zip(scores).map { case ((lang, _), s) =>
          when(s === best && s > 0, lit(lang))
        } :+ lit("und"): _*)
      })
  }

  /** DataFrame-level word statistics appending (n_words, avg_word_len,
    * stopword_ratio) from ONE tokenization pass — the expression forms each
    * re-split the text (interpreted HOFs are outside common-subexpression
    * elimination), so a corpus pass pays the split 3×. Semantics identical
    * to wordCount/avgWordLength/stopwordRatio (null avg/ratio for empty
    * documents). */
  def withWordStats(df: org.apache.spark.sql.DataFrame, textCol: String,
                    stopwords: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val schema = df.schema
      .add("n_words", LongType, nullable = false)
      .add("n_tokens", LongType, nullable = false)
      .add("avg_word_len", DoubleType, nullable = true)
      .add("stopword_ratio", DoubleType, nullable = true)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val ti = df.schema.fieldIndex(textCol)
    val stopArr = stopwords.toArray
    df.mapPartitions { it =>
      val stops = new java.util.HashSet[String]()
      stopArr.foreach(stops.add)
      // tokenCount's regex, compiled once per partition and COUNTED with a
      // matcher loop — regexp_extract_all materializes every match into an
      // array just to take its size
      val tokenRe = java.util.regex.Pattern.compile("[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n]")
      it.map { row =>
        val text = row.get(ti)
        val s = if (text == null) "" else text.toString
        val ws = s.split(" +").filter(_.nonEmpty)
        var chars = 0L; var hits = 0L
        var i = 0
        while (i < ws.length) {
          chars += ws(i).length
          if (stops.contains(ws(i))) hits += 1
          i += 1
        }
        var tokens = 0L
        val m = tokenRe.matcher(s)
        while (m.find()) tokens += 1
        val n = ws.length.toLong
        val avg: Any = if (n > 0) chars.toDouble / n else null
        val ratio: Any = if (n > 0) hits.toDouble / n else null
        org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(n, tokens, avg, ratio))
      }
    }(enc)
  }

  /** DataFrame-level language ID appending `outCol`: a mapPartitions
    * kernel with per-partition-initialized hash sets, semantically
    * identical to the `langId` expression (same tokenization, same
    * priority-ordered argmax) but ~an order of magnitude faster — the
    * expression fold pays interpreted-lambda cost per word per language.
    * Use the Column form for composability, this form for corpus passes. */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String,
                 outCol: String = "lang_pred"): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(outCol, org.apache.spark.sql.types.StringType, nullable = false)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val ti = df.schema.fieldIndex(textCol)
    val langs = langStopwords.map(_._1).toArray
    val stopSeqs = langStopwords.map(_._2.toArray).toArray
    df.mapPartitions { it =>
      // per-partition init: stopword hash sets built once
      val sets = stopSeqs.map { ws =>
        val s = new java.util.HashSet[String]()
        ws.foreach(s.add); s
      }
      it.map { row =>
        val text = row.get(ti)
        val ws = (if (text == null) "" else text.toString).toLowerCase.split(" +")
        val scores = new Array[Int](sets.length)
        var i = 0
        while (i < ws.length) {
          var l = 0
          while (l < sets.length) {
            if (sets(l).contains(ws(i))) scores(l) += 1
            l += 1
          }
          i += 1
        }
        var best = 0; var bestIdx = -1
        var l = 0
        while (l < scores.length) {
          if (scores(l) > best) { best = scores(l); bestIdx = l } // first max wins ties
          l += 1
        }
        val lang = if (bestIdx < 0) "und" else langs(bestIdx)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ lang)
      }
    }(enc)
  }

  /** Document fingerprint: md5 of the normalized text (lowercased,
    * punctuation stripped, whitespace collapsed). Identical fingerprints ⇒
    * near-identical documents up to case/punct/spacing — the cheap exact
    * stage of a dedup cascade. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")))
}

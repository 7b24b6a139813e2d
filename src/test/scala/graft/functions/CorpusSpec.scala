package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, IPv4s, and phone runs, leaves prose alone") {
    val df = Seq(
      "write to jane.doe+spam@mail.example.org today",
      "server at 10.0.255.7 responded",
      "call +1-555-000-1234 or 5550001234",
      "nothing sensitive here, just 42 and 3.14",
    ).toDF("text").select(Corpus.redactPii(col("text")).as("t"))
    val out = df.as[String].collect()
    assert(out(0) == "write to <EMAIL> today")
    assert(out(1) == "server at <IP> responded")
    assert(out(2) == "call <PHONE> or <PHONE>")
    assert(out(3) == "nothing sensitive here, just 42 and 3.14")
  }

  test("withRepetitionStats computes line and word repetition signals") {
    val df = Seq(
      (0L, "same line\nother line\nsame line"),   // 3 lines, 1 dup
      (1L, "a b a b a b"),                        // heavy 2-gram repetition
      (2L, "all words totally distinct here"),
      (3L, ""),                                   // empty → nulls
    ).toDF("id", "text")
    val r = Corpus.withRepetitionStats(df, "text").collect()
      .map(row => row.getLong(0) -> row).toMap

    assert(r(0L).getAs[Long]("n_lines") == 3L)
    assert(math.abs(r(0L).getAs[Double]("dup_line_ratio") - 1.0 / 3) < 1e-9)
    // dup chars = len("same line") = 9; total = 9*2 + 10 = 28
    assert(math.abs(r(0L).getAs[Double]("dup_line_char_ratio") - 9.0 / 28) < 1e-9)

    // "a b a b a b": 6 words, 2 distinct → rep 2/3; top 2-gram "a b" ×3,
    // len 3 → 9 / norm len 11
    assert(math.abs(r(1L).getAs[Double]("word_rep_ratio") - 2.0 / 3) < 1e-9)
    assert(math.abs(r(1L).getAs[Double]("top_ngram_char_ratio") - 9.0 / 11) < 1e-9)

    assert(r(2L).getAs[Double]("word_rep_ratio") == 0.0)
    assert(r(3L).getAs[Long]("n_lines") == 0L)
    assert(r(3L).isNullAt(r(3L).fieldIndex("dup_line_ratio")))
    assert(r(3L).isNullAt(r(3L).fieldIndex("word_rep_ratio")))
  }

  test("removeBoilerplate strips frequent lines, keeps order, restores all-boiler docs") {
    val df = Seq(
      (0L, "unique zero\nshared footer\nmore zero"),
      (1L, "unique one\nshared footer"),
      (2L, "shared footer\nunique two"),
      (3L, "shared footer"),                      // only boilerplate → ""
    ).toDF("id", "text")
    val out = Corpus.removeBoilerplate(df, "id", "text", minDocs = 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "unique zero\nmore zero") // order preserved
    assert(out(1L) == "unique one")
    assert(out(2L) == "unique two")
    assert(out(3L) == "")
    // below threshold nothing is removed
    val none = Corpus.removeBoilerplate(df, "id", "text", minDocs = 5L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(none(0L) == "unique zero\nshared footer\nmore zero")
  }

  test("chunk windows words with overlap, keeps empty docs, drops no text") {
    val df = Seq(
      (0L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
      (1L, "one two"),                                // shorter than a chunk
      (2L, ""),                                       // empty → one empty chunk
    ).toDF("id", "text")
    val out = Corpus.chunk(df, "id", "text", chunkWords = 4, overlapWords = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    // doc 0: stride 2, starts 0,2,4,6 (max(10-2,1)=8 exclusive) → 4 chunks
    assert(out((0L, 0L)) == ("w1 w2 w3 w4", 4L))
    assert(out((0L, 1L)) == ("w3 w4 w5 w6", 4L))
    assert(out((0L, 3L)) == ("w7 w8 w9 w10", 4L))
    assert(!out.contains((0L, 4L)))
    // every word appears in some chunk (no text dropped)
    assert((1 to 10).forall(i => out.exists(_._2._1.split(" ").contains(s"w$i"))))
    assert(out((1L, 0L)) == ("one two", 2L))
    assert(out((2L, 0L)) == ("", 0L))
  }

  test("tfidfTopTerms ranks rare-but-frequent terms first, float-free") {
    val df = Seq(
      (0L, "apple apple apple shared shared common"),
      (1L, "banana banana shared common common common"),
      (2L, "common shared kiwi"),
    ).toDF("id", "text")
    val top = Corpus.tfidfTopTerms(df, "id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(5)) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 0: apple tf=3 df=1 is rank 1; shared tf=2 df=3 rank 2
    assert(top((0L, 1L)) == ("apple", 3L, 1L))
    assert(top((0L, 2L)) == ("shared", 2L, 3L))
    // doc 2: all tf=1 → df asc then term asc: kiwi (df=1) first, then
    // common/shared both df=3 → "common" by term order
    assert(top((2L, 1L))._1 == "kiwi")
    assert(top((2L, 2L))._1 == "common")
    // score payload: tf * ln(N/df)
    val kiwiScore = Corpus.tfidfTopTerms(df, "id", "text", k = 2)
      .filter(col("term") === "kiwi").select("score").head().getDouble(0)
    assert(math.abs(kiwiScore - math.rint(1.0 * math.log(3.0) * 1e4) / 1e4) < 1e-9)
  }

  test("ngramCounts counts raw occurrences across the corpus") {
    val df = Seq(
      "a b c a b c",   // "a b c" ×2, "b c a" ×1, "c a b" ×1
      "a b c",         // "a b c" ×1
      "x y",           // shorter than n → nothing
    ).toDF("text")
    val counts = Corpus.ngramCounts(df, "text", n = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a b c") == 3L)
    assert(counts("b c a") == 1L)
    assert(counts("c a b") == 1L)
    assert(!counts.keys.exists(_.startsWith("x")))
  }

  test("contamination flags corpus docs sharing an n-gram with the bench set") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val corpus = Seq(
      (0L, "prefix text then the quick brown fox jumps over something"), // shares 5-grams
      (1L, "completely unrelated words about databases and engines"),
      (2L, "the quick brown fox jumps over the lazy dog exactly"),       // shares many
    ).toDF("id", "text")
    val out = Corpus.contamination(corpus, bench, "id", "text", shingleSize = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(0L) && out(0L) >= 1L)
    assert(out.contains(2L) && out(2L) > out(0L))
    assert(!out.contains(1L))
  }

  test("withTrigramRarity: hand-computed LM on a tiny corpus, empty docs score 0") {
    // corpus: "aaaa" (tris aaa×2), "aaab" (aaa, aab), "xy" (no trigram)
    // counts: aaa=3, aab=1 → vocab (K=4096) keeps both, N=4
    // rar(aaa) = 1000·4/(3+1) = 1000; rar(aab) = 1000·4/(1+1) = 2000
    val docs = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "xy")).toDF("doc_id", "text")
    val got = Corpus.withTrigramRarity(docs, "doc_id", "text")
      .select("doc_id", "rarity_sum", "n_trigrams", "rarity")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2000L, 2L, 1000L),  // aaa+aaa
      (2L, 3000L, 2L, 1500L),  // aaa+aab
      (3L, 0L, 0L, 0L)))       // too short: no trigrams, rarity 0
    // uppercase input lowercases into the same LM
    val up = Corpus.withTrigramRarity(
      Seq((9L, "AAAA")).toDF("doc_id", "text").union(docs.filter($"doc_id" =!= 1L)),
      "doc_id", "text")
      .filter($"doc_id" === 9L).select("rarity_sum").as[Long].head()
    assert(up == 2000L)
  }

  test("normalizeUrl applies the documented canonicalization rules") {
    val cases = Seq(
      // fragment + tracking params + default port + uppercase authority
      ("  HTTP://WWW.Example.COM:80/A/B?utm_source=x&q=1&gclid=z#top  ",
        "http://www.example.com/A/B?q=1"),
      // https default port; path case preserved; bare trailing slash
      ("HTTPS://Site.Org:443/Path/", "https://site.org/Path"),
      // non-default port survives; fbclid-only query collapses entirely
      ("http://h.net:8080/x?fbclid=abc", "http://h.net:8080/x"),
      // tracking param in the middle repairs the separator chain
      ("http://a.io/p?a=1&utm_medium=m&b=2", "http://a.io/p?a=1&b=2"),
      // host-only with trailing slash
      ("http://Host.Com/", "http://host.com"))
    val got = cases.map(_._1).toDF("u")
      .select(Corpus.normalizeUrl(col("u")).as("n")).as[String].collect().toSeq
    assert(got == cases.map(_._2), s"got=$got")
  }

  test("urlDomain strips scheme, userinfo, port, and leading www") {
    val cases = Seq(
      ("HTTP://WWW.Example.COM:80/A/B", "example.com"),
      ("https://user:pw@Www.Deep.Sub.Site.org:8443/x", "deep.sub.site.org"),
      ("http://plain.net", "plain.net"),
      ("not a url", ""))
    val got = cases.map(_._1).toDF("u")
      .select(Corpus.urlDomain(col("u")).as("d")).as[String].collect().toSeq
    assert(got == cases.map(_._2), s"got=$got")
  }

  test("normalizeText: NFC composes, NFKC folds, controls strip, whitespace collapses") {
    import spark.implicits._
    val decomposed = "cafe\u0301" // e + combining acute
    val fullwidth = "\uFF11\uFF12" // fullwidth 1, 2
    val df = Seq((1L, s" a\u0007b  $decomposed\t$fullwidth ")).toDF("id", "text")
    val nfc = Corpus.withNormalizedText(df, "text").as[(Long, String)].head()._2
    assert(nfc == "ab caf\u00e9 \uFF11\uFF12") // BEL gone, tab+runs collapsed, accent composed
    val nfkc = Corpus.withNormalizedText(df, "text", form = "NFKC")
      .as[(Long, String)].head()._2
    assert(nfkc == "ab caf\u00e9 12") // fullwidth digits fold under NFKC
    val keepCtl = Corpus.withNormalizedText(df, "text", stripControls = false,
      collapseWhitespace = false).as[(Long, String)].head()._2
    assert(keepCtl.contains("\u0007") && keepCtl.contains("  "))
  }

  test("splitSentences: dense ordinals, fragments kept, empties dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, "First one. Second!   Third?? Tail fragment"),
      (2L, "...."), // punctuation only -> no sentences
      (3L, "")).toDF("doc_id", "text")
    val got = Corpus.splitSentences(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(got == Seq(
      (1L, 0L, "First one."), (1L, 1L, "Second!"),
      (1L, 2L, "Third??"), (1L, 3L, "Tail fragment")))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained BPE: merge induction against hand-computed expectations,
  * greedy-encode laws, expression/kernel parity, persistence, YAML op. */
class BpeSpec extends SparkSpec {

  test("training learns the hand-computable merge sequence") {
    import spark.implicits._
    // corpus: "low" ×5, "lower" ×2 — classic Sennrich worked example shape.
    // Pair counts round 1: (l,o)=7, (o,w)=7, (w,e)=2, (e,r)=2
    // → tie (l,o)/(o,w) broken lexicographically: (l,o) first.
    val df = (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).toDF("text")
    val merges = Bpe.train(df, "text", numMerges = 4, maxWordTypes = 100)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")))
  }

  test("greedy encode applies lowest rank first, leftmost on ties") {
    val (keys, ranks) = Bpe.lookupArrays(Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")))
    assert(BpeKernels.encodeWord("low", keys, ranks).toSeq == Seq("low"))
    assert(BpeKernels.encodeWord("lower", keys, ranks).toSeq == Seq("lower"))
    assert(BpeKernels.encodeWord("lowlow", keys, ranks).toSeq == Seq("low", "low"))
    assert(BpeKernels.encodeWord("slower", keys, ranks).toSeq == Seq("s", "lower"))
    assert(BpeKernels.encodeWord("xyz", keys, ranks).toSeq == Seq("x", "y", "z"))
    assert(BpeKernels.encodeWord("", keys, ranks).isEmpty)
  }

  test("encode is a partition of the word; count equals stream length") {
    val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"))
    val (keys, ranks) = Bpe.lookupArrays(merges)
    for (w <- Seq("the", "thethe", "anthem", "in", "zzz", "a")) {
      val toks = BpeKernels.encodeWord(w, keys, ranks)
      assert(toks.mkString == w, s"$w: ${toks.toSeq}")
    }
    val text = "The quick anthem IN  the\tthin"
    assert(BpeKernels.tokenCount(text, keys, ranks) ==
      BpeKernels.encodeText(text, keys, ranks).length)
  }

  test("expression column matches the kernel and fuses with null handling") {
    import spark.implicits._
    val merges = Seq(("t", "h"), ("th", "e"))
    val df = Seq((1L, "the theory"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = Bpe.withTokenCount(df, "text", merges)
      .select("id", "bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (keys, ranks) = Bpe.lookupArrays(merges)
    assert(got(1L) == BpeKernels.tokenCount("the theory", keys, ranks))
    assert(got(1L) == 5, s"got ${got(1L)}") // "the"(1) + "the","o","r","y"(4)
    assert(got(2L) == 0 && got(3L) == 0)
  }

  test("withEncoded yields the token stream in word order") {
    import spark.implicits._
    val merges = Seq(("a", "b"))
    val df = Seq((1L, "ab ba aab")).toDF("id", "text")
    val toks = Bpe.withEncoded(df, "text", merges).select("bpe_toks")
      .as[Seq[String]].head()
    assert(toks == Seq("ab", "b", "a", "a", "ab"))
  }

  test("merge table persists and reloads byte-identically") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val f = java.nio.file.Files.createTempFile("graft-bpe", ".merges")
    Bpe.saveMerges(merges, f)
    assert(Bpe.loadMerges(f) == merges)
  }

  test("byte-level encode: UTF-8 bytes are the base alphabet; ASCII == char level") {
    import spark.implicits._
    val merges = Seq(("l", "o"), ("lo", "w"))
    // ASCII: byte level and char level coincide exactly
    assert(BpeKernels.encodeWordBytes("low", Bpe.lookupArrays(merges)._1,
      Bpe.lookupArrays(merges)._2).toSeq ==
      BpeKernels.encodeWord("low", Bpe.lookupArrays(merges)._1,
        Bpe.lookupArrays(merges)._2).toSeq)
    // multibyte: 'é' is TWO UTF-8 bytes (0xC3 0xA9) — two base symbols at
    // byte level, one at char level; a frozen byte-level model can never
    // hit an out-of-alphabet symbol
    val (k0, r0) = Bpe.lookupArrays(Seq.empty)
    assert(BpeKernels.encodeWordBytes("é", k0, r0).length == 2)
    assert(BpeKernels.encodeWord("é", k0, r0).length == 1)
    // a merge over the two bytes of 'é' (latin-1 rendered) applies
    val byteMerge = Seq((String.valueOf(0xC3.toChar), String.valueOf(0xA9.toChar)))
    val (k1, r1) = Bpe.lookupArrays(byteMerge)
    assert(BpeKernels.encodeWordBytes("é", k1, r1).length == 1)
    // the YAML op flag threads through; counts differ on multibyte text
    val df = Seq((1L, "café olé")).toDF("id", "text")
    val engine = new graft.engine.Engine(spark)
    def count(byteLevel: Boolean): Long = engine.applyOperation(df,
      Map("operation" -> "bpe_token_count", "column" -> "text",
        "num_merges" -> 1, "max_word_types" -> 10, "byte_level" -> byteLevel),
      Map.empty, "spec").agg(sum("bpe_tokens")).head().getLong(0)
    assert(count(true) == count(false) + 2, // one extra byte per é
      s"byte=${count(true)} char=${count(false)}")
  }

  test("loadMerges accepts space-separated merges.txt with a #version header") {
    val f = java.nio.file.Files.createTempFile("graft-bpe", ".txt")
    java.nio.file.Files.write(f,
      "#version: 0.2\nl o\nlo w\ne r\n".getBytes("UTF-8"))
    assert(Bpe.loadMerges(f) == Seq(("l", "o"), ("lo", "w"), ("e", "r")))
    // CRLF (Windows-saved) files must not leave \r on the right symbol —
    // a trailing \r makes every merge silently dead
    val crlf = java.nio.file.Files.createTempFile("graft-bpe", ".txt")
    java.nio.file.Files.write(crlf,
      "#version: 0.2\r\nl o\r\nlo w\r\n".getBytes("UTF-8"))
    assert(Bpe.loadMerges(crlf) == Seq(("l", "o"), ("lo", "w")))
  }

  test("withEncoded byteLevel agrees with same-flag token counts on multibyte text") {
    import spark.implicits._
    val df = Seq((1L, "café olé")).toDF("id", "text")
    val merges = Seq((String.valueOf(0xC3.toChar), String.valueOf(0xA9.toChar)))
    val toks = Bpe.withEncoded(df, "text", merges, byteLevel = true)
      .select("bpe_toks").as[Seq[String]].head()
    val count = Bpe.withTokenCount(df, "text", merges, byteLevel = true)
      .select("bpe_tokens").as[Long].head()
    assert(toks.length.toLong == count,
      s"encode length ${toks.length} != count $count")
    // the é byte-pair merged into one token in both faces
    assert(count == 4 + 3) // c,a,f,<é> + o,l,<é>
  }

  test("bpe_token_count YAML op: inline training and merges_file paths agree") {
    import spark.implicits._
    val df = (Seq.fill(5)("low low") ++ Seq.fill(2)("lower")).toDF("text")
    val engine = new graft.engine.Engine(spark)
    val inline = engine.applyOperation(df,
      Map("operation" -> "bpe_token_count", "column" -> "text",
        "num_merges" -> 4, "max_word_types" -> 100), Map.empty, "spec")
      .agg(sum("bpe_tokens")).head().getLong(0)
    val mf = java.nio.file.Files.createTempFile("graft-bpe", ".merges")
    Bpe.saveMerges(Bpe.train(df, "text", 4, 100), mf)
    val fromFile = engine.applyOperation(df,
      Map("operation" -> "bpe_token_count", "column" -> "text",
        "merges_file" -> mf.toString),
      Map.empty, "spec", configDir = java.nio.file.Paths.get("/"))
      .agg(sum("bpe_tokens")).head().getLong(0)
    assert(inline == fromFile)
    // 5×"low low" → 10 single tokens + 2×"lower" → 2 = 12 total
    assert(inline == 12L, s"got $inline")
  }
}

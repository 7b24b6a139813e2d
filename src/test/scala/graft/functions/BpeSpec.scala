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

package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The engine-extension corpus operations, driven through the YAML
  * `operation:` dispatch exactly as a declared pipeline would hit them. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val engine = new Engine(spark)
  private def run(df: DataFrame, op: Map[String, Any],
                  frames: Map[String, DataFrame] = Map.empty): DataFrame =
    engine.applyOperation(df, op + ("operation" -> op("operation")), frames, "spec")

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river"),
    (1L, "the quick brown fox jumps over the lazy dog near the river"), // dup of 0
    (2L, "write to jane@example.org about databases and engines today"),
  ).toDF("doc_id", "text")

  test("pii_redact / lang_id / quality_score / fingerprint / text_stats dispatch") {
    val redacted = run(docs, Map("operation" -> "pii_redact", "column" -> "text"))
      .filter($"doc_id" === 2L).select("text").as[String].head()
    assert(redacted.contains("<EMAIL>") && !redacted.contains("jane@"))

    val lang = run(docs, Map("operation" -> "lang_id", "column" -> "text"))
    assert(lang.columns.contains("lang_pred"))
    assert(lang.filter($"doc_id" === 0L).select("lang_pred").as[String].head() == "en")

    val q = run(docs, Map("operation" -> "quality_score", "column" -> "text",
      "stopwords" -> Seq("the", "a")))
    assert(q.columns.contains("quality"))

    val fp = run(docs, Map("operation" -> "fingerprint", "column" -> "text"))
    val fps = fp.select("doc_id", "fingerprint").as[(Long, String)].collect().toMap
    assert(fps(0L) == fps(1L) && fps(0L) != fps(2L))

    val stats = run(docs, Map("operation" -> "text_stats", "column" -> "text",
      "stopwords" -> Seq("the")))
    assert(stats.columns.contains("n_words") && stats.columns.contains("stopword_ratio"))
  }

  test("chunk reshapes to (id, chunk_id, text, n_words)") {
    val out = run(docs, Map("operation" -> "chunk", "id_column" -> "doc_id",
      "column" -> "text", "chunk_words" -> 8, "overlap_words" -> 2))
    assert(out.columns.toSeq == Seq("doc_id", "chunk_id", "text", "n_words"))
    assert(out.filter($"doc_id" === 0L).count() == 2) // 12 words, stride 6
  }

  test("token_budget and shuffle_rows dispatch (string columns, the engine's model)") {
    // token_budget with `column`: counts tokens itself; tiny budget keeps a prefix
    val kept = run(docs, Map("operation" -> "token_budget", "id_column" -> "doc_id",
      "column" -> "text", "budget" -> "12"))
    assert(kept.count() >= 1 && kept.count() < 3) // budget exhausts before all docs
    assert(kept.columns.toSeq == docs.columns.toSeq) // helper column dropped
    // tokens_column path: explicit numeric column
    val withTok = docs.withColumn("toks",
      org.apache.spark.sql.functions.lit(10L))
    val kept2 = run(withTok, Map("operation" -> "token_budget", "id_column" -> "doc_id",
      "tokens_column" -> "toks", "budget" -> "20"))
    assert(kept2.count() == 2)
    // shuffle_rows: a 0-based permutation position
    val sh = run(docs, Map("operation" -> "shuffle_rows", "id_column" -> "doc_id"))
    assert(sh.columns.contains("shuffle_pos"))
    assert(sh.select("shuffle_pos").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("pack_contexts dispatch: tokens_column and counted-column paths") {
    val withTok = docs.withColumn("toks",
      org.apache.spark.sql.functions.lit(10L))
    val packed = run(withTok, Map("operation" -> "pack_contexts", "id_column" -> "doc_id",
      "tokens_column" -> "toks", "context_tokens" -> "20"))
    assert(packed.columns.contains("context_id"))
    // 3 docs × 10 tokens into 20-token contexts → ids {0,0,1} in md5 order
    assert(packed.select("context_id").as[Long].collect().sorted.toSeq == Seq(0L, 0L, 1L))
    val counted = run(docs, Map("operation" -> "pack_contexts", "id_column" -> "doc_id",
      "column" -> "text", "context_tokens" -> "12"))
    assert(counted.columns.toSeq == docs.columns.toSeq :+ "context_id") // helper dropped
    // group_column routes to the per-group variant: each doc_id here gets
    // its own stream when grouped by itself, so every context_id is 0
    val grouped = run(withTok, Map("operation" -> "pack_contexts", "id_column" -> "doc_id",
      "tokens_column" -> "toks", "context_tokens" -> "20", "group_column" -> "doc_id"))
    assert(grouped.select("context_id").as[Long].collect().toSeq.forall(_ == 0L))
  }

  test("url_normalize and url_domain dispatch") {
    val rows = Seq((1L, "HTTP://WWW.A.COM:80/x?utm_source=s&k=1#f"))
      .toDF("doc_id", "url")
    val norm = run(rows, Map("operation" -> "url_normalize", "column" -> "url"))
    assert(norm.head().getString(1) == "http://www.a.com/x?k=1")
    val kept = run(rows, Map("operation" -> "url_normalize", "column" -> "url",
      "new_column" -> "url_norm"))
    assert(kept.columns.toSeq == Seq("doc_id", "url", "url_norm"))
    val dom = run(rows, Map("operation" -> "url_domain", "column" -> "url"))
    assert(dom.select("domain").head().getString(0) == "a.com")
  }

  test("domain_filter dispatch: drop/keep, parent-domain suffix match, domains_file") {
    val rows = Seq(
      (1L, "http://www.ads.example.com/x"),   // subdomain of a blocked domain
      (2L, "http://example.com/y"),           // exact blocked domain
      (3L, "http://notexample.com/z"),        // suffix WITHOUT dot boundary — kept
      (4L, "https://clean.org/w")).toDF("doc_id", "url")
    val dropped = run(rows, Map("operation" -> "domain_filter", "column" -> "url",
      "domains" -> List("Example.COM")))
    assert(dropped.select("doc_id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    val kept = run(rows, Map("operation" -> "domain_filter", "column" -> "url",
      "domains" -> List("example.com"), "mode" -> "keep"))
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // domains_file: one domain per line, resolved against the config dir
    val dir = java.nio.file.Files.createTempDirectory("graft-blocklist")
    java.nio.file.Files.write(dir.resolve("block.txt"), "clean.org\n\n".getBytes)
    val fromFile = new Engine(spark).applyOperation(rows,
      Map("operation" -> "domain_filter", "column" -> "url",
        "domains_file" -> "block.txt"), Map.empty, "t", dir)
    assert(fromFile.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException](run(rows,
      Map("operation" -> "domain_filter", "column" -> "url")))
    // >16 domains exercises the suffix-array set-membership path; results
    // must be identical to the OR-chain semantics
    val bigList = (1 to 20).map(i => s"filler$i.net").toList ++ List("example.com")
    val bigDropped = run(rows, Map("operation" -> "domain_filter", "column" -> "url",
      "domains" -> bigList))
    assert(bigDropped.select("doc_id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("trigram_rarity dispatch adds the three integer columns") {
    val out = run(docs, Map("operation" -> "trigram_rarity",
      "id_column" -> "doc_id", "column" -> "text", "vocab_size" -> 64))
    assert(out.columns.toSeq == docs.columns.toSeq ++ Seq("rarity_sum", "n_trigrams", "rarity"))
    assert(out.count() == docs.count())
    // identical texts score identically; all real docs have trigrams
    val scores = out.select("doc_id", "rarity").as[(Long, Long)].collect().toMap
    assert(scores(0L) == scores(1L))
    assert(out.filter($"n_trigrams" === 0).count() == 0)
  }

  test("asof_join dispatch pulls the right frame from sources") {
    val probe = Seq((1L, 10L, 100L), (2L, 10L, 250L)).toDF("id", "user", "t")
    val rates = Seq((10L, 90L, 1.5), (10L, 200L, 2.5)).toDF("user", "t", "rate")
    val out = run(probe, Map("operation" -> "asof_join",
      "sources" -> List("$sources.rates"), "key_column" -> "user",
      "time_column" -> "t", "value_columns" -> List("rate")),
      frames = Map("sources.rates" -> rates))
    val got = out.select("id", "rate_asof").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.5, 2L -> 2.5))
    intercept[IllegalArgumentException](run(probe, Map("operation" -> "asof_join",
      "sources" -> List.empty[String], "key_column" -> "user",
      "time_column" -> "t", "value_columns" -> List("rate"))))
  }

  test("range_join dispatch pulls the intervals frame from sources") {
    val points = Seq((1L, 5L), (2L, 25L)).toDF("id", "p")
    val iv = Seq((10L, 0L, 10L), (20L, 20L, 30L)).toDF("iid", "s", "e")
    val out = run(points, Map("operation" -> "range_join",
      "sources" -> List("$sources.iv"), "point_column" -> "p",
      "start_column" -> "s", "end_column" -> "e", "bin_width" -> "8"),
      frames = Map("sources.iv" -> iv))
    assert(out.select("id", "iid").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L)))
  }

  test("domain_cap and rebalance_mixture dispatch") {
    val rows = ((0L until 30L).map(i => (i, s"payload $i", "big")) ++
      (30L until 35L).map(i => (i, s"payload $i", "small"))).toDF("doc_id", "text", "source")
    val capped = run(rows, Map("operation" -> "domain_cap",
      "group_column" -> "source", "id_column" -> "doc_id", "k" -> 10))
    val perGroup = capped.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perGroup == Map("big" -> 10L, "small" -> 5L))
    assert(capped.columns.toSeq == rows.columns.toSeq)
    intercept[IllegalArgumentException](
      run(rows, Map("operation" -> "domain_cap",
        "group_column" -> "source", "id_column" -> "doc_id")))

    val rebal = run(rows, Map("operation" -> "rebalance_mixture",
      "stratum_column" -> "source", "key_column" -> "text",
      "weights" -> Map("big" -> 1.0, "small" -> 1.0)))
    val byStratum = rebal.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(byStratum.getOrElse("small", 0L) == 5L) // binding stratum kept whole
    assert(byStratum.getOrElse("big", 0L) <= 30L)
    intercept[IllegalArgumentException](
      run(rows, Map("operation" -> "rebalance_mixture",
        "stratum_column" -> "source", "key_column" -> "text")))
  }

  test("salted_join dispatch matches a plain join") {
    val dim = Seq((0L, "zero"), (1L, "one")).toDF("doc_id", "label")
    val out = run(docs, Map("operation" -> "salted_join",
      "keys" -> Seq("doc_id"), "salt_buckets" -> 4,
      "sources" -> List("$sources.dim")), Map("sources.dim" -> dim))
    val expected = docs.join(dim, Seq("doc_id")).collect().map(_.toSeq).toSet
    assert(out.collect().map(_.toSeq).toSet == expected)
    intercept[IllegalArgumentException](
      run(docs, Map("operation" -> "salted_join", "keys" -> Seq("doc_id"))))
  }

  test("dedup_near keeps one representative per near-dup group, all three methods") {
    for (method <- Seq("minhash", "jaccard", "simhash")) {
      val out = run(docs, Map("operation" -> "dedup_near", "id_column" -> "doc_id",
        "column" -> "text", "method" -> method))
      val kept = out.select("doc_id").as[Long].collect().toSet
      assert(kept == Set(0L, 2L), s"method=$method kept $kept") // 1 is 0's duplicate
    }
    intercept[IllegalArgumentException](
      run(docs, Map("operation" -> "dedup_near", "id_column" -> "doc_id",
        "column" -> "text", "method" -> "nope")))
  }

  test("dedup_near_incremental drops batch rows matching the sources: corpus or earlier batch rows") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river"), // dup of corpus 0
      (20L, "write to jane@example.org about databases and engines today"),
      (21L, "write to jane@example.org about databases and engines today") // dup of batch 20
    ).toDF("doc_id", "text")
    val out = run(batch, Map("operation" -> "dedup_near_incremental",
      "id_column" -> "doc_id", "column" -> "text", "threshold" -> "0.7",
      "sources" -> List("$sources.corpus")), Map("sources.corpus" -> corpus))
    assert(out.columns.toSeq == batch.columns.toSeq)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(20L))
    // UUID ids route both frames through the consistent surrogate path
    import org.apache.spark.sql.functions.{concat, lit}
    val uc = corpus.withColumn("doc_id", concat(lit("c-"), $"doc_id"))
    val ub = batch.withColumn("doc_id", concat(lit("b-"), $"doc_id"))
    val uout = run(ub, Map("operation" -> "dedup_near_incremental",
      "id_column" -> "doc_id", "column" -> "text", "threshold" -> "0.7",
      "sources" -> List("$sources.corpus")), Map("sources.corpus" -> uc))
    val ukept = uout.select("doc_id").as[String].collect().toSet
    assert(ukept.size == 1 && Set("b-20", "b-21").exists(ukept.contains),
      s"one of the duplicate batch pair survives, none of the corpus matches: $ukept")
    // missing corpus source fails loudly
    intercept[IllegalArgumentException](
      run(batch, Map("operation" -> "dedup_near_incremental",
        "id_column" -> "doc_id", "column" -> "text")))
    // corpus_is_index: sources names a persisted shingleIndex — same keep set
    val index = graft.functions.Dedup.shingleIndex(corpus, "doc_id", "text")
    val iout = run(batch, Map("operation" -> "dedup_near_incremental",
      "id_column" -> "doc_id", "column" -> "text", "threshold" -> "0.7",
      "corpus_is_index" -> "true",
      "sources" -> List("$sources.idx")), Map("sources.idx" -> index))
    assert(iout.select("doc_id").as[Long].collect().toSet == Set(20L))
    // non-numeric batch ids with an index are rejected, not silently wrong
    intercept[IllegalArgumentException](
      run(ub, Map("operation" -> "dedup_near_incremental",
        "id_column" -> "doc_id", "column" -> "text", "corpus_is_index" -> "true",
        "sources" -> List("$sources.idx")), Map("sources.idx" -> index)))
  }

  test("dedup_near broadcast_edge_threshold reaches the CC crossover (0 forces distributed path)") {
    // threshold 0 means even one edge exceeds the driver union-find cap, so
    // the distributed hash-min propagation runs — same answer either way
    val out = run(docs, Map("operation" -> "dedup_near", "id_column" -> "doc_id",
      "column" -> "text", "method" -> "minhash", "broadcast_edge_threshold" -> "0"))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(0L, 2L))
  }

  test("semantic_dedup dispatch prunes in-cell near-dups; string ids use the surrogate") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
    ).toDF("vec_id", "embedding")
    val out = run(vecs, Map("operation" -> "semantic_dedup", "id_column" -> "vec_id",
      "column" -> "embedding", "threshold" -> "0.99", "nlist" -> "1", "iters" -> "0"))
    // the full original row survives (all columns), dup id 1 dropped
    assert(out.columns.toSeq == Seq("vec_id", "embedding"))
    assert(out.select("vec_id").as[Long].collect().toSet == Set(0L, 2L))

    // string ids: surrogate-hash path keeps one of the identical pair + the
    // distinct vector, and never silently drops everything through a null cast
    val svecs = Seq(
      ("alpha", Array(1f, 0f)), ("beta", Array(1f, 0f)), ("gamma", Array(0f, 1f)),
    ).toDF("id", "embedding")
    val sout = run(svecs, Map("operation" -> "semantic_dedup", "id_column" -> "id",
      "column" -> "embedding", "threshold" -> "0.99", "nlist" -> "1", "iters" -> "0"))
    val ids = sout.select("id").as[String].collect().toSet
    assert(ids.size == 2 && ids.contains("gamma") &&
      (ids.contains("alpha") || ids.contains("beta")))
  }

  test("dedup_substring dispatch rewrites the text column in place") {
    val docs = Seq(
      (0L, "a b c d e"), (1L, "x a b c y"),
    ).toDF("doc_id", "text")
    val out = run(docs, Map("operation" -> "dedup_substring",
      "id_column" -> "doc_id", "column" -> "text", "window" -> "3"))
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    val m = out.as[(Long, String)].collect().toMap
    assert(m == Map(0L -> "a b c d e", 1L -> "x y"))
  }

  test("dedup_paragraphs dispatch removes later paragraph copies in place") {
    val docs = Seq(
      (0L, "keep me\nshared footer"), (1L, "other\nshared footer"),
    ).toDF("doc_id", "text")
    val out = run(docs, Map("operation" -> "dedup_paragraphs",
      "id_column" -> "doc_id", "column" -> "text"))
    val m = out.as[(Long, String)].collect().toMap
    assert(m == Map(0L -> "keep me\nshared footer", 1L -> "other"))
  }

  test("dedup_near with non-numeric ids (UUIDs) dedups via the surrogate-hash path") {
    // the pair/CC machinery keys on LongType; a UUID id must NOT silently
    // cast to null and drop every row — the engine hashes it to a surrogate
    // and joins back on the original column
    val uuidDocs = Seq(
      ("a3f1c9e2-0001-4a7b-9b1d-000000000001", "the quick brown fox jumps over the lazy dog near the river"),
      ("a3f1c9e2-0002-4a7b-9b1d-000000000002", "the quick brown fox jumps over the lazy dog near the river"),
      ("a3f1c9e2-0003-4a7b-9b1d-000000000003", "write to jane at example dot org about databases and engines today"),
    ).toDF("doc_id", "text")
    for (method <- Seq("minhash", "jaccard", "simhash")) {
      val out = run(uuidDocs, Map("operation" -> "dedup_near", "id_column" -> "doc_id",
        "column" -> "text", "method" -> method))
      assert(out.columns.toSeq == uuidDocs.columns.toSeq, s"method=$method")
      val kept = out.select("doc_id").as[String].collect().toSet
      assert(kept.size == 2 && kept.contains("a3f1c9e2-0003-4a7b-9b1d-000000000003"),
        s"method=$method kept $kept") // one of the two dups + the distinct doc
    }
  }

  test("dedup_near method=embedding removes cosine near-dups of a vector column") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.14f, 0.0f)), // cos ≈ 0.990 with vec 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val out = run(vecs, Map("operation" -> "dedup_near", "id_column" -> "vec_id",
      "column" -> "embedding", "method" -> "embedding", "threshold" -> "0.9"))
    assert(out.select("vec_id").as[Long].collect().toSet == Set(0L, 2L))
    assert(out.columns.toSeq == vecs.columns.toSeq)
  }

  test("ann_topk operation reshapes to (id, cos_sim), query vector inline in YAML") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val out = run(vecs, Map("operation" -> "ann_topk", "id_column" -> "vec_id",
      "column" -> "embedding", "k" -> 2, "query" -> List("1.0", "0.0")))
    assert(out.columns.toSeq == Seq("id", "cos_sim"))
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L, 2L)) // exact top-2
    // the multi-table LSH method dispatches and finds the identical vector
    val mt = run(vecs, Map("operation" -> "ann_topk", "id_column" -> "vec_id",
      "column" -> "embedding", "k" -> 3, "query" -> List("1.0", "0.0"),
      "method" -> "multitable", "num_planes" -> 6, "num_tables" -> 4))
    assert(mt.select("id").as[Long].collect().contains(1L))
    intercept[IllegalArgumentException](
      run(vecs, Map("operation" -> "ann_topk", "id_column" -> "vec_id",
        "column" -> "embedding", "query" -> List("1.0", "0.0"), "method" -> "nope")))
  }

  test("ann_join operation retrieves per-query top-k from the sources: corpus frame") {
    val qs = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.9f, 0.1f)), (12L, Array(0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val out = run(qs, Map("operation" -> "ann_join", "id_column" -> "vec_id",
      "column" -> "embedding", "k" -> 2, "num_planes" -> 4, "num_tables" -> 8,
      "sources" -> List("$sources.corpus")), frames = Map("sources.corpus" -> corpus))
    assert(out.columns.toSeq == Seq("q_id", "c_id", "cos_sim", "rk"))
    val top = out.orderBy("rk").collect()
    assert(top.nonEmpty && top.head.getLong(1) == 10L && top.head.getDouble(2) == 1.0)
    intercept[IllegalArgumentException](
      run(qs, Map("operation" -> "ann_join", "id_column" -> "vec_id",
        "column" -> "embedding")))
  }

  test("dedup_exact keeps the min-id representative per distinct text") {
    val out = run(docs, Map("operation" -> "dedup_exact",
      "id_column" -> "doc_id", "column" -> "text"))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(0L, 2L))
    assert(out.columns.toSeq == docs.columns.toSeq) // schema passes through
  }

  test("quality_filter keeps Gopher-passing docs and drops the stat columns") {
    val mixed = Seq(
      // passes: 11 words, all alphabetic, two stop words (the, of)
      (0L, "the family of foxes walked slowly toward the quiet river bank"),
      // fails: bullet lines dominate (3 of 3 lines start with '-')
      (1L, "- the one of\n- the two of\n- the three of"),
      // fails: too few words at min_words=10
      (2L, "the end of it"),
      // fails: symbol-heavy (### per word) even with stop words present
      (3L, "the ### cost of ### things ### rises ### here ### now ###"),
    ).toDF("doc_id", "text")
    val out = run(mixed, Map("operation" -> "quality_filter", "column" -> "text",
      "min_words" -> "10"))
    assert(out.columns.toSeq == Seq("doc_id", "text")) // stats dropped
    assert(out.select("doc_id").as[Long].collect().toSet == Set(0L))
  }

  test("html_to_text strips tags/scripts, unescapes entities, keeps paragraphs") {
    val html = Seq((0L,
      "<html><head><script>x&amp;y</script></head>" +
        "<body><p>first para.</p><p>second &amp; third.</p><!-- note --></body></html>"))
      .toDF("doc_id", "text")
    val out = run(html, Map("operation" -> "html_to_text", "column" -> "text"))
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    assert(out.head().getString(1) == "first para.\nsecond & third.")
    // escaped entity text must not double-unescape: `&amp;lt;` is the
    // literal string "&lt;", not "<" (the &amp; pass runs LAST)
    val esc = Seq((0L, "<p>a &amp;lt; b</p>")).toDF("doc_id", "text")
    val out2 = run(esc, Map("operation" -> "html_to_text", "column" -> "text"))
    assert(out2.head().getString(1) == "a &lt; b")
  }

  test("c4_clean keeps passing docs with surviving lines re-joined") {
    val mixed = Seq(
      // line 2 lacks terminal punctuation -> dropped; doc survives
      (0L, "the fox runs far today.\nno punctuation here\nthe dog sleeps now!"),
      // all lines fail the word minimum -> doc dropped
      (1L, "short one.\ntiny two."),
      // lorem ipsum -> doc dropped even with good lines
      (2L, "lorem ipsum dolor sit amet paragraph."),
    ).toDF("doc_id", "text")
    val out = run(mixed, Map("operation" -> "c4_clean", "column" -> "text",
      "min_line_words" -> "3", "min_lines" -> "1"))
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L))
    assert(rows.head.getString(1) == "the fox runs far today.\nthe dog sleeps now!")
  }

  test("hash_sample plain and stratified dispatch") {
    val plain = run(docs, Map("operation" -> "hash_sample", "column" -> "text", "rate" -> "1.0"))
    assert(plain.count() == 3)
    val none = run(docs, Map("operation" -> "hash_sample", "column" -> "text", "rate" -> "0.0"))
    assert(none.count() == 0)
    val strat = run(
      docs.withColumn("lang", org.apache.spark.sql.functions.lit("en")),
      Map("operation" -> "hash_sample", "column" -> "text", "strata_column" -> "lang",
        "rates" -> Map("en" -> "1.0"), "default_rate" -> "0.0"))
    assert(strat.count() == 3)
  }

  test("a declared YAML pipeline runs the corpus ops end to end") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-corpus-e2e")
    Files.writeString(dir.resolve("docs.csv"),
      """doc_id,text
        |1,reach me at bob@example.net for the brown fox papers
        |2,the quick brown fox jumps over the lazy dog
        |3,the quick brown fox jumps over the lazy dog
        |""".stripMargin)
    Files.writeString(dir.resolve("project.yaml"),
      """version: 2
        |
        |config:
        |  output_dir: ${OUT_DIR}
        |
        |sources:
        |  docs:
        |    file: docs.csv
        |
        |transformations:
        |  cleaned:
        |    source: $sources.docs
        |    operations:
        |      - operation: dedup_exact
        |        id_column: doc_id
        |        column: text
        |      - operation: pii_redact
        |        column: text
        |      - operation: lang_id
        |        column: text
        |      - operation: chunk
        |        id_column: doc_id
        |        column: text
        |        chunk_words: 6
        |
        |destinations:
        |  chunks:
        |    source: $transformations.cleaned
        |    extension: jsonl
        |""".stripMargin)
    val outDir = dir.resolve("out")
    val result = new Engine(spark).run(dir.resolve("project.yaml").toString,
      params = Map("OUT_DIR" -> outDir.toString))
    assert(result.written.keySet == Set("destinations.chunks"))
    import scala.jdk.CollectionConverters._
    val lines = Files.readAllLines(outDir.resolve("chunks.jsonl")).asScala.toList
    // doc 3 deduped away; docs 1 (9 words) and 2 (9 words) → 2 chunks each
    assert(lines.size == 4)
    assert(lines.exists(l => l.contains("<EMAIL>")))
    assert(!lines.exists(l => l.contains("bob@")))
  }

  test("boilerplate_removal and decontaminate dispatch") {
    val multi = Seq(
      (0L, "keep zero\nshared footer"),
      (1L, "keep one\nshared footer"),
      (2L, "keep two\nshared footer"),
    ).toDF("doc_id", "text")
    val cleaned = run(multi, Map("operation" -> "boilerplate_removal",
      "id_column" -> "doc_id", "column" -> "text", "min_docs" -> 3))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(cleaned(0L) == "keep zero" && cleaned(2L) == "keep two")

    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog near the river"))
      .toDF("doc_id", "text")
    val decon = run(docs, Map("operation" -> "decontaminate",
      "sources" -> Seq("$sources.bench"), "id_column" -> "doc_id", "column" -> "text"),
      frames = Map("sources.bench" -> bench))
    // docs 0/1 share 5-grams with the bench doc; only doc 2 survives
    assert(decon.select("doc_id").as[Long].collect().toSet == Set(2L))
  }
}

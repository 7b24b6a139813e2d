package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about database engines and query planners here"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"),   // exact dup of 0
    (4L, "short doc"),
  ).toDF("doc_id", "text")

  test("exactGroups finds the exact duplicate with min-id representative") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    val dup = g.filter(col("dup_count") > 1).collect()
    assert(dup.length == 1)
    assert(dup.head.getAs[Long]("keep_id") == 0L)
    assert(dup.head.getAs[Long]("dup_count") == 2L)
  }

  test("jaccardPairs finds near and exact dups above threshold, not the unrelated doc") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact
    assert(pairs.contains((0L, 1L))) // near
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("jaccardPairs with negative ids falls back off the packed-long path correctly") {
    // ids that would corrupt a shiftleft/bitwiseAND pack — results must match
    // the same corpus with shifted non-negative ids
    val negDocs = docs.withColumn("doc_id", col("doc_id") - lit(2L))
    val pairs = Dedup.jaccardPairs(negDocs, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((-2L, 1L))) // exact dup (0,3) shifted by -2
    assert(pairs.contains((-2L, -1L))) // near dup (0,1) shifted by -2
    assert(!pairs.exists { case (a, b) => a == 0L || b == 0L }) // unrelated doc 2 → 0
  }

  test("jaccardPairs maxDocFreq: permissive cap matches uncapped; cap=1 kills all pairs") {
    val uncapped = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // a cap larger than the corpus filters nothing — must be identical
    val permissive = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5,
      maxDocFreq = Some(100L))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(permissive == uncapped && uncapped.nonEmpty)
    // cap=1 drops every shingle shared by ≥2 docs — no co-occurrence survives
    val strict = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5,
      maxDocFreq = Some(1L))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(strict.isEmpty)
  }

  test("withWordStats kernel agrees with the wordCount/avgWordLength/stopwordRatio expressions") {
    val texts = Seq(
      (0L, "the quick brown fox and the lazy dog"),
      (1L, "  doubled  spaces  here  "),
      (2L, "")).toDF("doc_id", "text")
    val stops = Seq("the", "a", "of", "and", "to")
    val viaExpr = texts.select(col("doc_id"),
      TextFunctions.wordCount(col("text")).as("n"),
      TextFunctions.tokenCount(col("text")).as("toks"),
      TextFunctions.avgWordLength(col("text")).as("avg"),
      TextFunctions.stopwordRatio(col("text"), stops).as("ratio"))
      .collect().map(r => (r.getLong(0), r.toSeq.drop(1))).toMap
    val viaKernel = TextFunctions.withWordStats(texts, "text", stops)
      .select("doc_id", "n_words", "n_tokens", "avg_word_len", "stopword_ratio")
      .collect().map(r => (r.getLong(0), r.toSeq.drop(1))).toMap
    assert(viaKernel == viaExpr)
    assert(viaKernel(2L) == Seq(0L, 0L, null, null)) // empty doc → null avg/ratio
  }

  test("withLangId kernel agrees with the langId expression") {
    val texts = Seq(
      (0L, "the cat is in the house and it is warm"),
      (1L, "le chat est dans la maison et il est chaud"),
      (2L, "xyzzy plugh"), // no stopwords → und
      (3L, "un une"),      // fr/es tie on shared stopwords → first list wins
      (4L, "")).toDF("doc_id", "text")
    val viaExpr = texts.select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
      .as[(Long, String)].collect().toMap
    val viaKernel = TextFunctions.withLangId(texts, "text").select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(viaKernel == viaExpr)
    assert(viaKernel(0L) == "en" && viaKernel(1L) == "fr" && viaKernel(2L) == "und")
  }

  test("connectedComponents groups chained pairs, keeps singletons, min-id representative") {
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("id")
    // chain 0-1-2 (transitive), pair 3-4, singleton 5
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 3L)).toDF("a_id", "b_id")
    val expected = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 5L)
    // broadcast union-find path (default) and distributed hash-min fallback
    // (forced by a zero edge threshold) must agree
    val viaBroadcast = Dedup.connectedComponents(nodes, "id", pairs)
      .as[(Long, Long)].collect().toMap
    // the strategy choice is DETERMINISTIC in the edge count vs threshold
    // (bench-bimodality pin: a sub-threshold edge set always takes the
    // broadcast union-find, never races into hash-min)
    assert(Dedup.lastCcPath == "broadcast", Dedup.lastCcPath)
    val viaDistributed = Dedup.connectedComponents(nodes, "id", pairs,
      broadcastEdgeThreshold = 0L).as[(Long, Long)].collect().toMap
    assert(Dedup.lastCcPath == "hashmin", Dedup.lastCcPath)
    assert(viaBroadcast == expected)
    assert(viaDistributed == expected)
  }

  test("connectedComponents distributed path converges on a long chain (lineage checkpoint rounds)") {
    // path graph 0-1-2-...-15: diameter 15, hash-min needs many propagation
    // rounds, so the loop crosses the every-5-rounds localCheckpoint cut —
    // this is the lineage-bounding regression test for high-diameter inputs
    val n = 16
    val nodes = (0L until n.toLong).toDF("id")
    val chain = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("a_id", "b_id")
    val labels = Dedup.connectedComponents(nodes, "id", chain, broadcastEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(labels == (0L until n.toLong).map(_ -> 0L).toMap)
  }

  test("hashSample is deterministic, monotone in rate, and stratified rates apply per stratum") {
    val docs2 = (0L until 200L).map(i => (i, s"document number $i payload")).toDF("doc_id", "text")
    val s20a = Sampling.hashSample(docs2, "text", 0.2).select("doc_id").as[Long].collect().toSet
    val s20b = Sampling.hashSample(docs2, "text", 0.2).select("doc_id").as[Long].collect().toSet
    assert(s20a == s20b && s20a.nonEmpty && s20a.size < 200)
    val s50 = Sampling.hashSample(docs2, "text", 0.5).select("doc_id").as[Long].collect().toSet
    assert(s20a.subsetOf(s50)) // nested samples: smaller rate ⊂ larger rate
    assert(Sampling.hashSample(docs2, "text", 1.0).count() == 200)
    assert(Sampling.hashSample(docs2, "text", 0.0).count() == 0)
    val strat = docs2.withColumn("stratum", when(col("doc_id") < 100, "keep").otherwise("drop"))
    val out = Sampling.stratifiedHashSample(strat, "text", "stratum",
      Map("keep" -> 1.0), defaultRate = 0.0)
    assert(out.select("doc_id").as[Long].collect().toSet == (0L until 100L).toSet)
  }

  test("similarityJoin: cross-frame fuzzy matches only, sides never mix") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    def mut(s: String, w: String) = s.replace("today", w)
    val left = Seq(
      (1L, base), (2L, base), // 1-2 near-dup WITHIN left: must NOT pair
      (3L, "completely unrelated text about catalyst optimizer internals today yes")
    ).toDF("id", "text")
    val right = Seq(
      (10L, mut(base, "tomorrow")), // near-dup of left 1 and 2
      (11L, "some entirely different document about parquet row group pruning")
    ).toDF("rid", "rtext")
    val got = Dedup.similarityJoin(left, right, "id", "text", "rid", "rtext", 0.6)
      .select("left_id", "right_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L)), got)
    // identical text across frames scores jaccard 1.0
    val self = Dedup.similarityJoin(left, Seq((99L, base)).toDF("rid", "rtext"),
      "id", "text", "rid", "rtext", 0.9)
    val ones = self.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(ones(1L) == 1.0 && ones(2L) == 1.0 && !ones.contains(3L))
    // YAML dispatch with defaulted right-side column names
    val eng = new graft.engine.Engine(spark)
    val viaYaml = eng.applyOperation(left,
      Map("operation" -> "similarity_join", "sources" -> List("$transformations.r"),
        "id_column" -> "id", "text_column" -> "text", "threshold" -> "0.6",
        "right_id_column" -> "rid", "right_text_column" -> "rtext"),
      Map("transformations.r" -> right), "spec")
    assert(viaYaml.select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == got)
  }

  test("sampleExact: exact n, deterministic, a prefix of every rate cut; top-k plan") {
    val docs = (1L to 1000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val s1 = Sampling.sampleExact(docs, "doc_id", 50).select("doc_id")
      .as[Long].collect().toSet
    assert(s1.size == 50)
    assert(s1 == Sampling.sampleExact(docs, "doc_id", 50).select("doc_id")
      .as[Long].collect().toSet) // deterministic
    // same md5 draw as hashSample → the exact-n set sits inside any rate
    // cut large enough to contain n rows
    val rateCut = Sampling.hashSample(docs, "doc_id", 0.5).select("doc_id")
      .as[Long].collect().toSet
    assert(s1.subsetOf(rateCut), "exact sample must be a prefix of the rate cut")
    // n >= rows → everything, still exact
    assert(Sampling.sampleExact(docs, "doc_id", 5000).count() == 1000)
    // top-k physical shape, never a global sort
    val plan = Sampling.sampleExact(docs, "doc_id", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assertThrows[IllegalArgumentException](Sampling.sampleExact(docs, "doc_id", 0))
    assertThrows[IllegalArgumentException](Sampling.sampleExact(docs, "zz", 5))
  }

  test("weightedHashSample: per-row ppm probability, monotone in weight, exact edges") {
    val docs = (0L until 400L).map(i => (i, (i % 5) * 250000L)).toDF("doc_id", "w")
    val kept = Sampling.weightedHashSample(docs, "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    // w=0 rows never keep; w=1e6 rows always keep
    assert((0L until 400L).filter(_ % 5 == 0).forall(!kept.contains(_)))
    assert((0L until 400L).filter(_ % 5 == 4).forall(kept.contains))
    // monotone: a row kept at weight w stays kept when every weight rises
    val keptHi = Sampling.weightedHashSample(
      docs.withColumn("w", least(lit(1000000L), col("w") + 250000L)), "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.subsetOf(keptHi))
    // the draw is the SAME as hashSample's: at uniform w=500000ppm the
    // kept set equals hashSample at rate 0.5
    val uni = docs.withColumn("w", lit(500000L))
    assert(Sampling.weightedHashSample(uni, "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet ==
      Sampling.hashSample(docs, "doc_id", 0.5).select("doc_id").as[Long].collect().toSet)
    // null / negative / oversized weights: drop, drop, clamp-keep
    val edges = Seq((1L, null.asInstanceOf[java.lang.Long]), (2L, java.lang.Long.valueOf(-5L)),
      (3L, java.lang.Long.valueOf(99999999L))).toDF("doc_id", "w")
    assert(Sampling.weightedHashSample(edges, "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet == Set(3L))
    // YAML dispatch
    val eng = new graft.engine.Engine(spark)
    val viaYaml = eng.applyOperation(docs,
      Map("operation" -> "weighted_sample", "key_column" -> "doc_id",
        "weight_column" -> "w"), Map.empty, "spec")
    assert(viaYaml.select("doc_id").as[Long].collect().toSet == kept)
  }

  test("incremental dedup: corpus match drops a batch doc in either id order; batch chain keeps first writer") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    def mut(s: String, w: String) = s.replace("today", w)
    val corpus = Seq(
      (1L, base),                       // corpus doc, id BELOW batch ids
      (100L, mut(base, "yesterday")),   // corpus doc, id ABOVE batch ids
      (2L, "completely unrelated text about spark catalyst optimizer internals plans")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),                      // dup of corpus 1 (smaller corpus id)
      (11L, mut(base, "yesterday")),    // dup of corpus 100 (LARGER corpus id)
      // chain head must NOT match the corpus: one changed word only moves
      // one trigram (J≈0.83 vs base!), so use a mostly-new sentence
      (20L, "the quick silver wolf runs under a sleepy cat never and rarely tonight"),
      (21L, "the quick silver wolf runs under a sleepy cat never and rarely tonight"), // exact dup of 20 → dropped (earlier batch doc)
      (30L, "document with its own entirely distinct vocabulary nothing shared here at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairsIncremental(batch, corpus, "doc_id", "text", threshold = 0.7)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // a-side is always a batch doc; corpus-corpus pairs never computed
    assert(pairs.forall { case (a, _) => Set(10L, 11L, 20L, 21L).contains(a) })
    assert(pairs.contains((10L, 1L)))   // batch-corpus, corpus id smaller
    assert(pairs.contains((11L, 100L))) // batch-corpus, corpus id larger
    assert(pairs.contains((20L, 21L)))  // batch-batch, emitted once a<b
    val keptIds = Dedup.dedupNearIncremental(batch, corpus, "doc_id", "text", threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds == Set(20L, 30L),
      s"10/11 match corpus, 21 matches earlier batch doc 20; got $keptIds")
    // precomputed-index path (corpus shingled once) is result-identical
    val index = Dedup.shingleIndex(corpus, "doc_id", "text")
    val keptIndexed = Dedup.dedupNearIncrementalIndexed(batch, index, "doc_id", "text", threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(keptIndexed == keptIds)

    // the NARROW large-index strategy (corpus scanned, never shuffled —
    // picked automatically past spark.graft.dedup.narrowIndexBytes; 0
    // forces it) must be result-identical to the fused path above, pairs
    // and keep set, with and without a live stop set. maxDocFreq=3 makes
    // the base sentence's shared trigrams exceed the cap (base + its two
    // mutations + their batch dups), so the stop-filtering arm is real.
    val fusedPairs = Dedup.jaccardPairsIncremental(
      batch, corpus, "doc_id", "text", threshold = 0.7)
      .orderBy("a_id", "b_id").collect().map(_.toString).toSeq
    val fusedKeptCapped = Dedup.dedupNearIncremental(
      batch, corpus, "doc_id", "text", threshold = 0.7, maxDocFreq = Some(3L))
      .select("doc_id").as[Long].collect().toSet
    spark.conf.set("spark.graft.dedup.narrowIndexBytes", "0")
    try {
      val narrowPairs = Dedup.jaccardPairsIncremental(
        batch, corpus, "doc_id", "text", threshold = 0.7)
        .orderBy("a_id", "b_id").collect().map(_.toString).toSeq
      assert(narrowPairs == fusedPairs)
      val narrowKept = Dedup.dedupNearIncremental(
        batch, corpus, "doc_id", "text", threshold = 0.7)
        .select("doc_id").as[Long].collect().toSet
      assert(narrowKept == keptIds)
      val narrowKeptIndexed = Dedup.dedupNearIncrementalIndexed(
        batch, index, "doc_id", "text", threshold = 0.7)
        .select("doc_id").as[Long].collect().toSet
      assert(narrowKeptIndexed == keptIds)
      val narrowKeptCapped = Dedup.dedupNearIncremental(
        batch, corpus, "doc_id", "text", threshold = 0.7, maxDocFreq = Some(3L))
        .select("doc_id").as[Long].collect().toSet
      assert(narrowKeptCapped == fusedKeptCapped)
    } finally spark.conf.unset("spark.graft.dedup.narrowIndexBytes")
  }

  test("capPerGroup: ≤k per group, identical to the single-window reference at any salt count") {
    import org.apache.spark.sql.expressions.Window
    // skewed groups: g0 has 150 rows, g1 has 40, g2 has 10 (under the cap)
    val rows = ((0L until 150L).map(i => (i, "g0")) ++
      (150L until 190L).map(i => (i, "g1")) ++
      (190L until 200L).map(i => (i, "g2"))).toDF("doc_id", "source")
    val reference = rows
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("rn") <= 25).select("doc_id").as[Long].collect().toSet
    for (salts <- Seq(1, 2, 32)) {
      val got = Sampling.capPerGroup(rows, "source", "doc_id", k = 25, salts = salts)
      assert(got.columns.toSeq == Seq("doc_id", "source")) // helper cols dropped
      val perGroup = got.groupBy("source").count().as[(String, Long)].collect().toMap
      assert(perGroup == Map("g0" -> 25L, "g1" -> 25L, "g2" -> 10L), s"salts=$salts")
      assert(got.select("doc_id").as[Long].collect().toSet == reference, s"salts=$salts")
    }
  }

  test("rebalanceToMixture: binding stratum kept whole, others downsampled to the target ratio") {
    val rows = ((0L until 50L).map(i => (i, s"doc payload $i", "a")) ++
      (50L until 350L).map(i => (i, s"doc payload $i", "b")) ++
      (350L until 400L).map(i => (i, s"doc payload $i", "zzz_unweighted")))
      .toDF("doc_id", "text", "source")
    // weights 1:1 but counts 50:300 → stratum a binds (kept whole), b drops to ≈50
    val out = Sampling.rebalanceToMixture(rows, "source", "text", Map("a" -> 0.5, "b" -> 0.5))
    val byStratum = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(byStratum.getOrElse("a", 0L) == 50L) // binding stratum: rate 1.0, nothing lost
    assert(!byStratum.contains("zzz_unweighted")) // no weight → dropped
    val b = byStratum.getOrElse("b", 0L)
    assert(b > 25 && b < 75, s"b kept $b, expected ≈50") // hash sampling ≈ rate 1/6
    // deterministic: same call, same rows
    val again = Sampling.rebalanceToMixture(rows, "source", "text", Map("a" -> 0.5, "b" -> 0.5))
    assert(again.select("doc_id").as[Long].collect().toSet ==
      out.select("doc_id").as[Long].collect().toSet)
    // empty weighted intersection → empty frame, not a crash
    assert(Sampling.rebalanceToMixture(rows, "source", "text", Map("nope" -> 1.0)).count() == 0)
  }

  test("minhashLshPairs recall matches exact jaccard on this corpus") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh == exact) // banded candidates + exact verify ⇒ no false positives; recall here is total
  }

  test("simhashPairs finds the exact dup at hamming 0 and the near dup within budget") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("simhash of identical texts is identical; different texts differ") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash("text").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(3L))
    assert(sigs(0L) != sigs(2L))
  }

  test("TextFunctions: counts, ratios, language id, fingerprint invariance") {
    val one = Seq((1L, "The quick  brown fox, the END!")).toDF("id", "text")
    val row = one.select(
      TextFunctions.wordCount(col("text")),
      TextFunctions.tokenCount(col("text")),
      TextFunctions.langId(col("text")),
      TextFunctions.fingerprint(col("text")),
      TextFunctions.fingerprint(lit("the quick brown fox the end"))).head()
    assert(row.getLong(0) == 6L)   // whitespace words (double space collapsed)
    assert(row.getLong(1) == 8L)   // 6 word-runs + ',' + '!'
    assert(row.getString(2) == "en")
    assert(row.getString(3) == row.getString(4)) // normalization invariance
    val fr = Seq((1L, "le chat et la souris sont dans la maison")).toDF("id", "text")
    assert(fr.select(TextFunctions.langId(col("text"))).head().getString(0) == "fr")
  }

  test("Similarity: cosine basics and brute-force top-k ordering") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val self = vecs.select(Similarity.cosine(col("embedding"), col("embedding"))).as[Double].collect()
    assert(self.forall(v => math.abs(v - 1.0) < 1e-9))
    val top = Similarity.bruteForceTopK(vecs.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      Seq(1.0f, 0.0f), 2).select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L))
  }

  test("Similarity: lsh bucket is deterministic and groups an identical vector with the query") {
    val vecs = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val buckets = vecs.select(Similarity.lshBucket(col("embedding"), 8)).as[Long].collect()
    assert(buckets(0) == buckets(1))
  }

  test("cosinePairsBlocked tiling: multi-block result identical to single-block") {
    val vecs = (0L until 30L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.7 + j).toFloat))).toDF("vec_id", "embedding")
    val single = Similarity.cosinePairsBlocked(vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    // blockRows=7 forces 5 blocks — every unordered pair must appear exactly
    // once (owned by the block containing the larger id) with the same score
    val tiled = Similarity.cosinePairsBlocked(vecs, "vec_id", "embedding", 0.9, blockRows = 7)
    val tiledRows = tiled.as[(Long, Long, Double)].collect()
    assert(tiledRows.length == tiledRows.toSet.size) // no pair duplicated across blocks
    assert(tiledRows.toSet == single && single.nonEmpty)
    // scores agree with the plain exact cross-join kernel (bitwise: same
    // accumulation order, both rounded to 4 decimals)
    val exact = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(tiledRows.toSet == exact)
    // negative ids: floorMod blocking must not drop or duplicate pairs
    val neg = vecs.withColumn("vec_id", col("vec_id") - 15)
    val negPairs = Similarity.cosinePairsBlocked(neg, "vec_id", "embedding", 0.9, blockRows = 7)
      .as[(Long, Long, Double)].collect()
    assert(negPairs.length == tiledRows.length)
  }

  test("cosinePairsBlocked exchanges blocks executor-side (no driver collect in the body)") {
    // structural pin for the 100 TB property the round-8 review flagged:
    // the exact all-pairs kernel must not funnel blocks through the driver.
    val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/scala/graft/functions/Similarity.scala")), "UTF-8")
    val start = src.indexOf("def cosinePairsBlocked")
    assert(start > 0)
    val body = src.substring(start, src.indexOf("\n  def ", start))
    assert(!body.contains(".collect()"), "cosinePairsBlocked must not collect blocks to the driver")
    assert(!body.contains("broadcast("), "cosinePairsBlocked must not rebroadcast blocks from the driver")
    assert(body.contains("flatMapGroups"), "expected the block-pair group exchange")
  }

  test("semanticDedup single cell equals the upper-triangular rule; zero vectors never dup") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.999f, 0.04f, 0f)),  // near-dup of 0 → dropped
      (2L, Array(0f, 1f, 0f)),         // orthogonal → kept
      (3L, Array(0.998f, 0.06f, 0f)),  // near-dup of 0 AND of (dropped) 1 → dropped
      (4L, Array(0f, 0f, 0f)),         // zero norm: no defined angle → kept
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.95, nlist = 1, iters = 0)
    assert(kept.columns.toSeq == Seq("id", "cell"))
    assert(kept.select("id").as[Long].collect().toSet == Set(0L, 2L, 4L))
  }

  test("semanticDedup with k-means cells (iters=2) drops exactly the injected copies") {
    // two well-separated clusters of 5 distinct directions each (pairwise
    // cos ≤ cos 10° ≈ 0.985 within a cluster, ~0 across), plus an IDENTICAL
    // copy of every vector at id+100. At threshold 0.99 only the copies are
    // duplicates — and a copy always lands in its original's cell, whatever
    // the refined centroids are, so the survivor set is exactly the
    // originals no matter how Lloyd iterations move the cells.
    val base = (0 until 5).flatMap { i =>
      val th = math.toRadians(10.0 * i)
      Seq(
        (i.toLong, Array.tabulate(8)(j =>
          if (j == 0) math.cos(th).toFloat else if (j == 1) math.sin(th).toFloat else 0f)),
        (10L + i, Array.tabulate(8)(j =>
          if (j == 2) math.cos(th).toFloat else if (j == 3) math.sin(th).toFloat else 0f)))
    }
    val withCopies = base ++ base.map { case (id, v) => (id + 100L, v) }
    val df = withCopies.toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.99, nlist = 2, iters = 2).select("id").as[Long].collect().toSet
    assert(kept == base.map(_._1).toSet)
    // deterministic: a second run returns the identical survivor set
    val again = Similarity.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.99, nlist = 2, iters = 2).select("id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("duplicateSpans flags every later occurrence of a repeated window") {
    val docs = Seq(
      (0L, "a b c d e"),        // first occurrence of "a b c"
      (1L, "x a b c y"),        // repeat at pos 2 → flagged
      (2L, "short"),            // < k tokens: never flagged
    ).toDF("doc_id", "text")
    val flags = Dedup.duplicateSpans(docs, "doc_id", "text", windowTokens = 3)
      .as[(Long, Long)].collect().toSet
    assert(flags == Set((1L, 2L)))

    // within-document repeats count: "a b" at 1,3,5 and "b a" at 2,4 —
    // first of each survives, the rest flag
    val self = Seq((7L, "a b a b a b")).toDF("doc_id", "text")
    val selfFlags = Dedup.duplicateSpans(self, "doc_id", "text", windowTokens = 2)
      .as[(Long, Long)].collect().toSet
    assert(selfFlags == Set((7L, 3L), (7L, 4L), (7L, 5L)))
  }

  test("paragraph dedup flags later copies only; whitespace paragraphs never flag") {
    val docs = Seq(
      (0L, "alpha\nboiler\nbeta"),
      (1L, "gamma\nboiler"),    // boiler repeat → flagged at pos 2
      (2L, "boiler\n\ndelta"),  // boiler repeat at pos 1; blank pos 2 never flags
      (3L, "\n"),               // two empty paragraphs: formatting, untouched
    ).toDF("doc_id", "text")
    val flags = Dedup.duplicateParagraphs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(flags == Set((1L, 2L), (2L, 1L)))

    val cleaned = Dedup.stripDuplicateParagraphs(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(cleaned == Map(
      0L -> "alpha\nboiler\nbeta",  // first occurrence survives verbatim
      1L -> "gamma",
      2L -> "\ndelta",              // blank separator kept
      3L -> "\n",
    ))
  }

  test("stripDuplicateSpans deletes flagged spans, keeps schema and other columns") {
    val docs = Seq(
      (0L, "a b c d e", "en"),
      (1L, "x a b c y", "fr"),
      (2L, "a b c d e", "de"),  // whole doc is a repeat of doc 0's windows
    ).toDF("doc_id", "text", "lang")
    val out = Dedup.stripDuplicateSpans(docs, "doc_id", "text", windowTokens = 3)
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang"))
    val m = out.as[(Long, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(0L) == ("a b c d e", "en"))   // first occurrences survive verbatim
    assert(m(1L) == ("x y", "fr"))         // covered tokens 2-4 removed
    assert(m(2L) == ("", "de"))            // fully-duplicated doc empties out
    // string ids work directly — the window rank orders by the id as-is
    val sdocs = Seq(("alpha", "p q r s"), ("beta", "p q r t")).toDF("id", "text")
    val sout = Dedup.stripDuplicateSpans(sdocs, "id", "text", windowTokens = 3)
      .as[(String, String)].collect().toMap
    assert(sout == Map("alpha" -> "p q r s", "beta" -> "t"))
  }

  test("multi-table LSH recovers the recall single-probe loses at numPlanes=12") {
    // Deterministic clustered corpus: 20 near neighbors of the query at
    // cosine ≈ 0.95 (the near-dup regime multi-table LSH exists for) among
    // 200 decoys in random directions. At 12 planes a single AND-only
    // bucket is so selective that most true neighbors land elsewhere; the
    // union over 16 independent tables recovers them. Everything here is
    // deterministic (sin-based vectors, splitmix64 planes), so the recall
    // values are exact, not flaky.
    val dim = 64
    val q = Array.tabulate(dim)(j => math.sin(j * 0.31 + 1).toFloat)
    val near = (1L to 20L).map(i => (i,
      Array.tabulate(dim)(j => (math.sin(j * 0.31 + 1) + 0.35 * math.sin(i * 1.7 + j * 0.53)).toFloat)))
    val far = (100L until 300L).map(i => (i,
      Array.tabulate(dim)(j => math.sin(i * 2.9 + j * 1.3 + 7).toFloat)))
    val vecs = (near ++ far).toDF("vec_id", "embedding")
    val truth = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q.toSeq, 10)
      .select("id").as[Long].collect().toSet
    def recall(ids: Seq[Long]): Double = ids.count(truth).toDouble / truth.size
    val single = recall(Similarity.lshTopK(vecs, "vec_id", "embedding", q.toSeq, 10, numPlanes = 12)
      .select("id").as[Long].collect().toSeq)
    val multi = recall(Similarity.lshTopKMultiTable(vecs, "vec_id", "embedding", q.toSeq, 10,
      numPlanes = 12, numTables = 16).select("id").as[Long].collect().toSeq)
    assert(multi > single, s"multi=$multi single=$single")
    assert(multi >= 0.7, s"multi=$multi")
  }

  test("quantizedTopK: int8 candidates + exact rerank match brute-force exactly here") {
    // same deterministic clustered corpus as the multi-table test; with
    // rerank=50 ≫ k=10 the int8 stage must not exclude any true neighbor
    val dim = 64
    val q = Array.tabulate(dim)(j => math.sin(j * 0.31 + 1).toFloat)
    val near = (1L to 20L).map(i => (i,
      Array.tabulate(dim)(j => (math.sin(j * 0.31 + 1) + 0.35 * math.sin(i * 1.7 + j * 0.53)).toFloat)))
    val far = (100L until 300L).map(i => (i,
      Array.tabulate(dim)(j => math.sin(i * 2.9 + j * 1.3 + 7).toFloat)))
    val vecs = (near ++ far).toDF("vec_id", "embedding")
    val truth = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q.toSeq, 10)
      .select("id", "cos_sim").as[(Long, Double)].collect().toSeq
    val quant = Similarity.quantizedTopK(vecs, "vec_id", "embedding", q.toSeq, 10, rerank = 50)
      .select("id", "cos_sim").as[(Long, Double)].collect().toSeq
    assert(quant == truth, s"quantized=$quant truth=$truth")
  }

  test("tokenBudgetSample admits docs in md5 order until the budget; stable under repartition") {
    val toks = Seq((10L, 100L), (11L, 100L), (12L, 100L), (13L, 100L), (14L, 100L))
      .toDF("doc_id", "n_tokens")
    // manual truth: order ids by (md5(id), id), admit while cumulative-before < 250
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map(b => f"${b & 0xff}%02x").mkString
    val order = Seq(10L, 11L, 12L, 13L, 14L).sortBy(i => (md5hex(i.toString), i))
    val expected = order.take(3).toSet // 0,100,200 < 250; 300 is not
    val got = Sampling.tokenBudgetSample(toks, "doc_id", "n_tokens", 250L)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected, s"got=$got expected=$expected (order=$order)")
    val got8 = Sampling.tokenBudgetSample(toks.repartition(8), "doc_id", "n_tokens", 250L)
      .select("doc_id").as[Long].collect().toSet
    assert(got8 == expected)
  }

  test("packContexts assigns split-free greedy context ids in md5 order, stable under repartition") {
    val toks = Seq((10L, 100L), (11L, 100L), (12L, 100L), (13L, 150L), (14L, 100L))
      .toDF("doc_id", "n_tokens")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map(b => f"${b & 0xff}%02x").mkString
    val order = Seq(10L, 11L, 12L, 13L, 14L).sortBy(i => (md5hex(i.toString), i))
    val tokOf = Map(10L -> 100L, 11L -> 100L, 12L -> 100L, 13L -> 150L, 14L -> 100L)
    // manual truth: context = floor(tokens-before / 250)
    var before = 0L
    val expected = order.map { id =>
      val ctx = before / 250L; before += tokOf(id); id -> ctx
    }.toMap
    val got = Sampling.packContexts(toks, "doc_id", "n_tokens", 250L)
      .select("doc_id", "context_id").as[(Long, Long)].collect().toMap
    assert(got == expected, s"got=$got expected=$expected (order=$order)")
    // a doc is never split: each context holds consecutive stream positions
    val byCtx = order.map(id => got(id))
    assert(byCtx == byCtx.sorted, "context ids must be monotone in stream order")
    val got8 = Sampling.packContexts(toks.repartition(8), "doc_id", "n_tokens", 250L)
      .select("doc_id", "context_id").as[(Long, Long)].collect().toMap
    assert(got8 == expected)
  }

  test("asofJoin: latest at-or-before match, tolerance nulls, tie dedupe, partition stability") {
    val probe = Seq((1L, "u", 100L), (2L, "u", 205L), (3L, "u", 50L), (4L, "v", 100L))
      .toDF("id", "k", "t")
    val build = Seq(("u", 100L, 10.0), ("u", 100L, 12.0), // (k,ts) tie → struct-max 12.0
      ("u", 200L, 20.0), ("w", 1L, 99.0))
      .toDF("k", "t", "v")
    def run(df: org.apache.spark.sql.DataFrame, tol: Option[Double]) =
      Joins.asofJoin(df, build, "k", "t", Seq("v"), toleranceSecs = tol)
        .select("id", "t_asof", "v_asof")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2))).sortBy(_._1).toSeq
    assert(run(probe, None) == Seq(
      (1L, 100L, 12.0),  // equal ts matches; tie resolved to max struct
      (2L, 200L, 20.0),  // latest at-or-before
      (3L, -1L, -1.0),   // nothing before t=50
      (4L, -1L, -1.0)))  // no rows for key v
    // tolerance: match must be within 5 of the probe time
    assert(run(probe, Some(5.0)) == Seq(
      (1L, 100L, 12.0), (2L, 200L, 20.0), (3L, -1L, -1.0), (4L, -1L, -1.0)))
    assert(run(probe, Some(2.0)).map(_._2) == Seq(100L, -1L, -1L, -1L)) // 205-200 > 2
    assert(run(probe.repartition(8), None) == run(probe, None))
  }

  test("rangeJoin: bin rewrite matches the naive non-equi join, negatives and boundaries included") {
    val points = Seq((1L, -25L), (2L, -10L), (3L, 0L), (4L, 10L), (5L, 19L), (6L, 20L))
      .toDF("pid", "p")
    val intervals = Seq((100L, -30L, -9L), (200L, 0L, 20L), (300L, 15L, 40L),
      (400L, 50L, 50L), (500L, 60L, 55L)) // empty + inverted intervals drop
      .toDF("iid", "s", "e")
    def viaBins(w: Long) =
      Joins.rangeJoin(points, intervals, Nil, "p", "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(naive == Set((1L, 100L), (2L, 100L), (3L, 200L), (4L, 200L),
      (5L, 200L), (5L, 300L), (6L, 300L)))
    for (w <- Seq(1L, 7L, 10L, 1000L)) assert(viaBins(w) == naive, s"binWidth=$w")
  }

  test("packContextsBy packs independently per group; null groups share a stream") {
    val toks = Seq((10L, "en", 100L), (11L, "fr", 100L), (12L, "en", 100L),
      (13L, "fr", 150L), (14L, null.asInstanceOf[String], 100L))
      .toDF("doc_id", "lang", "n_tokens")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map(b => f"${b & 0xff}%02x").mkString
    val tokOf = Map(10L -> 100L, 11L -> 100L, 12L -> 100L, 13L -> 150L, 14L -> 100L)
    val groups = Map(10L -> "en", 11L -> "fr", 12L -> "en", 13L -> "fr", 14L -> null)
    val expected = groups.keys.toSeq.groupBy(groups).flatMap { case (_, ids) =>
      var before = 0L
      ids.sortBy(i => (md5hex(i.toString), i)).map { id =>
        val c = before / 150L; before += tokOf(id); id -> c
      }
    }
    val got = Sampling.packContextsBy(toks, "lang", "doc_id", "n_tokens", 150L)
      .select("doc_id", "context_id").as[(Long, Long)].collect().toMap
    assert(got == expected, s"got=$got expected=$expected")
    // stable under partitioning
    val got8 = Sampling.packContextsBy(toks.repartition(8), "lang", "doc_id", "n_tokens", 150L)
      .select("doc_id", "context_id").as[(Long, Long)].collect().toMap
    assert(got8 == expected)
  }

  test("grouped prefix sum holds at crawl-scale group cardinality (100k+ groups, no driver step)") {
    // per-DOMAIN packing shape: group count grows with the data — the base
    // computation must stay distributed (a |groups|x256 driver collect OOMs
    // here by construction at real scale). Oracle: the naive whole-group
    // window, safe in-test because every synthetic group is tiny.
    import org.apache.spark.sql.expressions.Window
    val n = 300000
    val docs = spark.range(n.toLong)
      .withColumn("domain", concat(lit("d"), pmod(col("id"), lit(120000L))))
      .withColumn("n_tokens", pmod(col("id") * 37L, lit(90L)) + 10L)
    val got = Sampling.packContextsBy(docs, "domain", "id", "n_tokens", 64L)
      .select(col("id"), col("context_id"))
    val oracle = docs
      .withColumn("__h__", md5(col("id").cast("string")))
      .withColumn("__before__",
        coalesce(sum(col("n_tokens")).over(
          Window.partitionBy(col("domain")).orderBy(col("__h__"), col("id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), floor(col("__before__") / 64L).cast("long").as("context_id"))
    assert(got.except(oracle).isEmpty && oracle.except(got).isEmpty,
      "grouped prefix sum diverges from the whole-group window oracle")
    assert(got.count() == n.toLong)
  }

  test("packContextsText concatenates members in stream order, tokens and counts per context") {
    val docs = Seq((10L, "aa bb", 2L), (11L, "cc", 1L), (12L, "dd ee ff", 3L),
      (13L, "gg", 1L), (14L, "hh ii", 2L)).toDF("doc_id", "text", "n_tokens")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map(b => f"${b & 0xff}%02x").mkString
    val order = Seq(10L, 11L, 12L, 13L, 14L).sortBy(i => (md5hex(i.toString), i))
    val text = Map(10L -> "aa bb", 11L -> "cc", 12L -> "dd ee ff", 13L -> "gg", 14L -> "hh ii")
    val toks = Map(10L -> 2L, 11L -> 1L, 12L -> 3L, 13L -> 1L, 14L -> 2L)
    var before = 0L
    val truth = order.map { id => val c = before / 4; before += toks(id); (c, id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = truth.map { case (c, ids) =>
      c -> (ids.map(text).mkString(" "), ids.map(toks).sum, ids.size.toLong)
    }
    val got = Sampling.packContextsText(docs, "doc_id", "text", "n_tokens", 4L)
      .select("context_id", "text", "n_tokens", "n_docs")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("assignSplit labels by hash bands: exhaustive, stable, near-declared proportions") {
    val df = (0L until 2000L).toDF("doc_id")
    val got = Sampling.assignSplit(df, "doc_id",
      Seq("test" -> 0.25, "train" -> 0.5, "val" -> 0.25))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.keySet == Set("train", "val", "test"))
    assert(got.values.sum == 2000L) // every row labeled, catch-all band works
    assert(math.abs(got("train") - 1000L) < 100, s"train=$got")
    // stable under repartitioning and reruns
    val a = Sampling.assignSplit(df, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .as[(Long, String)].collect().toMap
    val b = Sampling.assignSplit(df.repartition(7), "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .as[(Long, String)].collect().toMap
    assert(a == b)
    intercept[IllegalArgumentException](
      Sampling.assignSplit(df, "doc_id", Seq("x" -> -1.0)))
  }

  test("hashShuffle yields a stable 0-based permutation, invariant to partitioning") {
    val df = (0L until 100L).toDF("doc_id")
    val pos = Sampling.hashShuffle(df, "doc_id").select("doc_id", "shuffle_pos")
      .as[(Long, Long)].collect().toMap
    assert(pos.values.toSeq.sorted == (0L until 100L).toSeq) // a permutation
    val pos8 = Sampling.hashShuffle(df.repartition(8), "doc_id").select("doc_id", "shuffle_pos")
      .as[(Long, Long)].collect().toMap
    assert(pos8 == pos)
    // the order is the md5 order, not the input order
    assert(pos.toSeq.sortBy(_._2).map(_._1) !=
      (0L until 100L).toSeq)
  }

  test("saltedJoin matches the plain join on a skewed corpus; rejects right joins") {
    // 90% of the large side shares one hot key — the shape that melts a
    // single shuffle partition at scale
    val large = (0L until 2000L).map(i => (if (i % 10 == 0) i % 7 else 999L, i))
      .toDF("k", "v")
    val small = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (42L, "unmatched"))
      .toDF("k", "tag")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = large.join(small, Seq("k"), jt)
      val salted = Joins.saltedJoin(large, small, Seq("k"), saltBuckets = 8, joinType = jt)
      assert(salted.columns.toSeq == plain.columns.toSeq, jt)
      val ps = plain.collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val ss = salted.collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(ss == ps, s"joinType=$jt")
    }
    intercept[IllegalArgumentException](
      Joins.saltedJoin(large, small, Seq("k"), 8, joinType = "right"))
    intercept[IllegalArgumentException](
      Joins.saltedJoin(large, small, Seq("k"), 8, joinType = "outer"))
  }

  test("annJoin: identical vector is guaranteed candidate and ranks first; k bounds per query") {
    val qs = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // identical to query 0 → same bucket in EVERY table
      (11L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (12L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val out = Similarity.annJoin(qs, corpus, "vec_id", "embedding", k = 2,
      numPlanes = 4, numTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val q0 = out.filter(_._1 == 0L).sortBy(_._4)
    assert(q0.nonEmpty && q0.head._2 == 10L && q0.head._3 == 1.0 && q0.head._4 == 1L)
    assert(out.groupBy(_._1).forall(_._2.length <= 2)) // k bound per query
  }

  test("ivfTopK probing every cell is exact; narrowing the probe keeps only true top-k members") {
    val dim = 32
    val vecs = (1L to 120L).map(i =>
      (i, Array.tabulate(dim)(j => math.sin(i * 0.9 + j * 0.37).toFloat))).toDF("vec_id", "embedding")
    val q = Array.tabulate(dim)(j => math.sin(0.9 + j * 0.37).toFloat) // near id 1
    val truth = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q.toSeq, 10)
      .as[(Long, Double)].collect().toSeq
    // nprobe == nlist scans everything → must equal brute force exactly
    val all = Similarity.ivfTopK(vecs, "vec_id", "embedding", q.toSeq, 10,
      nlist = 8, nprobe = 8, iters = 0).as[(Long, Double)].collect().toSeq
    assert(all == truth)
    // a narrow probe returns a subset of the corpus ranked by the same
    // exact cosine — every returned (id, score) it shares with truth matches
    val narrow = Similarity.ivfTopK(vecs, "vec_id", "embedding", q.toSeq, 10,
      nlist = 8, nprobe = 2, iters = 0).as[(Long, Double)].collect()
    val truthMap = truth.toMap
    assert(narrow.nonEmpty)
    narrow.foreach { case (id, s) => truthMap.get(id).foreach(t => assert(t == s)) }
  }

  test("ivf k-means refinement keeps recall on a clustered corpus; ivfAssign covers every row once") {
    // 3 tight clusters; seeds (smallest ids) all come from cluster 0, so
    // iters=0 cells are degenerate — two Lloyd rounds must pull centroids
    // apart enough that probing 2 of 6 cells still finds the query's cluster
    val dim = 16
    def member(cluster: Int, i: Long) = Array.tabulate(dim)(j =>
      (math.sin(cluster * 2.1 + j * 0.5) + 0.05 * math.sin(i * 1.3 + j)).toFloat)
    val vecs = ((1L to 40L).map(i => (i, member(0, i))) ++
      (41L to 80L).map(i => (i, member(1, i))) ++
      (81L to 120L).map(i => (i, member(2, i)))).toDF("vec_id", "embedding")
    val q = member(2, 999L)
    val truth = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q.toSeq, 10)
      .select("id").as[Long].collect().toSet
    val got = Similarity.ivfTopK(vecs, "vec_id", "embedding", q.toSeq, 10,
      nlist = 6, nprobe = 2, iters = 2).select("id").as[Long].collect().toSeq
    val recall = got.count(truth).toDouble / truth.size
    assert(recall >= 0.9, s"recall=$recall got=$got")
    // assignment is a partition: every id appears exactly once, cell ∈ [0, nlist)
    val cents = Similarity.ivfCentroids(vecs, "vec_id", "embedding", nlist = 6, iters = 2)
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", cents)
      .select("id", "cell").as[(Long, Int)].collect()
    assert(assigned.map(_._1).toSet == (1L to 120L).toSet && assigned.length == 120)
    assert(assigned.forall { case (_, c) => c >= 0 && c < 6 })
  }

  test("cluster_assign YAML op: partition into cells, Lloyd tightens the clustering") {
    val e = new graft.engine.Engine(spark)
    val dim = 16
    def member(cluster: Int, i: Long) = Array.tabulate(dim)(j =>
      (math.sin(cluster * 2.1 + j * 0.5) + 0.05 * math.sin(i * 1.3 + j)).toFloat)
    val vecs = ((1L to 40L).map(i => (i, member(0, i))) ++
      (41L to 80L).map(i => (i, member(1, i))) ++
      (81L to 120L).map(i => (i, member(2, i)))).toDF("vec_id", "embedding")
    def assign(iters: Int) = e.applyOperation(vecs,
      Map("operation" -> "cluster_assign", "id_column" -> "vec_id",
        "column" -> "embedding", "nlist" -> 3, "iters" -> iters),
      Map.empty, "spec")
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    def purity(a: Map[Long, Long]): Double = {
      // majority-label fraction per true cluster, averaged
      val groups = a.groupBy { case (id, _) => (id - 1) / 40 }
      groups.values.map { m =>
        m.values.groupBy(identity).values.map(_.size).max.toDouble / m.size
      }.sum / groups.size
    }
    val refined = assign(2)
    assert(refined.keySet == (1L to 120L).toSet)
    assert(refined.values.forall(c => c >= 0 && c < 3))
    // 3 well-separated clusters, 3 refined cells: near-perfect purity
    assert(purity(refined) >= 0.95, s"refined purity ${purity(refined)}")
    // seed-only centroids (iters=0, all 3 seeds from cluster 0) must not
    // beat the refined ones — refinement is doing real work
    assert(purity(refined) >= purity(assign(0)))
    // custom output column name
    val named = e.applyOperation(vecs, Map("operation" -> "cluster_assign",
      "id_column" -> "vec_id", "column" -> "embedding", "nlist" -> 3,
      "new_column" -> "k"), Map.empty, "spec")
    assert(named.columns.toSeq == Seq("vec_id", "embedding", "k"))
  }

  test("cosinePairs bucketed variant is a subset of exact pairs with identical scores") {
    val vecs = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.7 + j).toFloat))).toDF("vec_id", "embedding")
    val exact = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.9, bucketed = true)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exact))
  }
}

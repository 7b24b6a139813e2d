package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-artifact contracts that bit rounds 6 and 8: the stdout line
  * must fit the driver's 2000-char tail window at any plausible suite size,
  * and the best-ever file must round-trip through its own parser. */
class BenchFormatSpec extends AnyFunSuite {

  // realistic name lengths: the live suite averages 13 chars per query name
  private def syntheticMins(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"q_synth_$i%03d" -> (0.05 + (i % 37) * 0.113))

  test("fmt strips trailing zeros but stays numeric JSON") {
    assert(BenchFormat.fmt(0.120, 3) == "0.12")
    assert(BenchFormat.fmt(20.600, 2) == "20.6")
    assert(BenchFormat.fmt(0.0, 3) == "0")
    assert(BenchFormat.fmt(1.0, 2) == "1")
    assert(BenchFormat.fmt(0.077, 3) == "0.077")
  }

  test("stdout line fits the 2000-char driver tail window at 90 queries") {
    val line = BenchFormat.stdoutLine(
      total = 123.456, mins = syntheticMins(90),
      spreadWarn = Seq("q_synthetic_name_001" -> 2.7),
      contendedCount = 2, machineContended = false,
      resultsFile = "/root/repo/BENCH_RESULTS.json",
      reps = 3, cpus = "32", sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 2000, s"line was ${line.length} chars")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains(""""queries":{"""))
  }

  test("stdout line survives a pathological 150-query suite") {
    val line = BenchFormat.stdoutLine(
      total = 999.9, mins = syntheticMins(150),
      spreadWarn = syntheticMins(150).map { case (k, _) => k -> 81.0 },
      contendedCount = 150, machineContended = true,
      resultsFile = "/root/repo/BENCH_RESULTS.json",
      reps = 3, cpus = "32", sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 2000, s"line was ${line.length} chars")
    assert(line.contains(""""machine_contended":true"""))
  }

  test("decisecond tier keeps the whole suite past the prefix-strip limit") {
    // 95 × 16-char names: too long for the minimal and prefix-strip tiers,
    // exactly inside the decisecond tier — every query must be present,
    // with qprefix + qunit announcing both transforms
    val mid = (1 to 95).map(i => f"q_operator_n_$i%03d" -> 0.123)
    val line = BenchFormat.stdoutLine(
      total = 12.0, mins = mid, spreadWarn = Nil,
      contendedCount = 0, machineContended = false,
      resultsFile = "/root/repo/BENCH_RESULTS.json",
      reps = 3, cpus = "32", sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 2000, s"line was ${line.length} chars")
    assert(!line.contains("queries_omitted"), s"all 95 queries must survive: $line")
    assert(line.contains("\"qunit\":\"ds\"") && line.contains("\"qprefix\":\"q_\""), line.take(120))
    assert(line.contains("\"operator_n_001\":1")) // 0.123s → 1 ds
    (1 to 95).foreach(i =>
      assert(line.contains(f"operator_n_$i%03d"), s"missing query $i"))
  }

  test("a suite too large to ever fit degrades to valid truncated JSON, never an unparseable line") {
    // slow queries interleaved among cheap ones: truncation must keep the
    // slow tail (the regression signal), not the alphabetical prefix
    val huge = (1 to 300).map(i =>
      f"q_very_long_synthetic_query_name_$i%03d" -> (if (i % 50 == 0) 45.0 else 0.1))
    val line = BenchFormat.stdoutLine(
      total = 450.0, mins = huge, spreadWarn = Nil,
      contendedCount = 0, machineContended = false,
      resultsFile = "/root/repo/BENCH_RESULTS.json",
      reps = 3, cpus = "32", sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 2000, s"line was ${line.length} chars")
    assert(line.contains(""""queries_omitted":"""))
    assert(line.startsWith("{") && line.endsWith("}"))
    // balanced braces = structurally parseable
    assert(line.count(_ == '{') == line.count(_ == '}'))
    // every 45-second query survived the cut
    (50 to 300 by 50).foreach(i =>
      assert(line.contains(f"q_very_long_synthetic_query_name_$i%03d"),
        s"slow query $i must survive truncation"))
  }

  test("current SparkEntry suite fits tier 1 (3-decimal) or tier 2") {
    val names = "etl_render" +: SparkEntry.queries.keys.toSeq.sorted
    val mins = names.map(_ -> 0.123)
    val line = BenchFormat.stdoutLine(
      total = 25.0, mins = mins, spreadWarn = Nil,
      contendedCount = 0, machineContended = false,
      resultsFile = "/root/repo/BENCH_RESULTS.json",
      reps = 3, cpus = "32", sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 2000, s"line was ${line.length} chars for ${names.size} queries")
    // compressed tiers are acceptable: every query must be present under
    // its full name, its "q_"-stripped name, or its family-abbreviated
    // name — each transform announced in the line ("qprefix" / "qabbr")
    val strippedTier = line.contains("\"qprefix\":\"q_\"")
    val abbrTier = line.contains("\"qabbr\":")
    val abbr =
      if (!abbrTier) Nil
      else BenchFormat.familyAbbreviations(
        names.map(n => if (n.startsWith("q_")) n.drop(2) else n))
    names.foreach { n =>
      val short = if (strippedTier && n.startsWith("q_")) n.drop(2) else n
      val key = abbr.collectFirst {
        case (fam, code) if short.startsWith(fam) => code + short.drop(fam.length)
      }.getOrElse(short)
      assert(line.contains("\"" + key + "\":"), s"missing $n (as $key)")
    }
    assert(!line.contains("queries_omitted"), "no query may be dropped for the current suite")
  }

  test("familyAbbreviations: deterministic codes, reverse map round-trips every name") {
    val names = Seq("source_csv", "source_tsv", "source_xml", "dedup_exact",
      "dedup_near", "dedup_url", "data_x", "solo_one", "ann_a")
    val abbr = BenchFormat.familyAbbreviations(names)
    assert(abbr == BenchFormat.familyAbbreviations(names)) // deterministic
    val m = abbr.toMap
    assert(m.contains("source_") && m.contains("dedup_"))
    assert(!m.values.toSeq.groupBy(identity).values.exists(_.size > 1), "codes unique")
    assert(!m.contains("solo_")) // single member: announcement outweighs savings
    assert(!m.contains("ann_")) // ditto — net-savings rule, not a length rule
    // codes are single uppercase letters, clash-walked deterministically
    val codes = m.values.toSet
    assert(codes.forall(c => c.length == 1 && c.head.isUpper))
    assert(codes.size == m.size)
    // applying then reversing the most-specific family restores the name
    names.foreach { n =>
      val enc = abbr.collectFirst {
        case (fam, code) if n.startsWith(fam) => (fam, code + n.drop(fam.length))
      }
      enc.foreach { case (fam, e) =>
        val code = m(fam)
        assert(e.startsWith(code) && fam + e.drop(code.length) == n)
      }
    }
  }

  test("fastSuspect: anomalous too-fast min is suspect until reproduced") {
    // min far below best, only one sample under 0.75x best → suspect
    assert(BenchFormat.fastSuspect(0.159, Vector(0.054, 0.16, 0.17)))
    // reproduced: two samples under 0.75x best → genuine improvement
    assert(!BenchFormat.fastSuspect(0.159, Vector(0.054, 0.058, 0.17)))
    // min not far below best → not suspect
    assert(!BenchFormat.fastSuspect(0.159, Vector(0.12, 0.16)))
    // no prior best → nothing to compare against
    assert(!BenchFormat.fastSuspect(0.0, Vector(0.054)))
  }

  test("mergeBest: failed/suspect mins never enter the baseline") {
    val prev = Map("q_a" -> 0.2, "q_b" -> 0.5, "q_gone" -> 1.0)
    val mins = Map("q_a" -> 0.1, "q_b" -> 0.05, "q_new" -> 0.3)
    val merged = BenchFormat.mergeBest(prev, mins, exclude = Set("q_b")).toMap
    assert(merged("q_a") == 0.1)    // genuine improvement merges
    assert(merged("q_b") == 0.5)    // excluded min keeps prior best
    assert(merged("q_gone") == 1.0) // absent this run keeps prior best
    assert(merged("q_new") == 0.3)  // new query seeds from first observation
  }

  test("assessContention trips on count, aggregate slowdown, or spread cluster") {
    // per-query count trip (round-8 heuristic)
    assert(BenchFormat.assessContention(5, 30, Nil, 10, 10, 20))
    assert(!BenchFormat.assessContention(2, 90, Nil, 10, 10, 20))
    // aggregate min-sum over best-ever sum (round-9 gap was 1.51x; a calm
    // run on this VM measures ~1.31x, which must NOT trip)
    assert(BenchFormat.assessContention(0, 90, Nil, 15.0, 10.0, 20))
    assert(!BenchFormat.assessContention(0, 90, Nil, 13.1, 10.0, 20))
    // too few comparable queries → aggregate evidence insufficient
    assert(!BenchFormat.assessContention(0, 90, Nil, 15.0, 10.0, 5))
    // several queries with spread > 3x
    assert(BenchFormat.assessContention(0, 90, Seq(6.2, 3.5, 4.0, 1.1), 10, 10, 20))
    assert(!BenchFormat.assessContention(0, 90, Seq(6.2, 3.5, 1.2, 1.1), 10, 10, 20))
  }

  test("stdout line carries failed count when nonzero, in full and minimal tiers") {
    val base = (n: Int) => BenchFormat.stdoutLine(
      total = 10.0, mins = syntheticMins(n), spreadWarn = Nil,
      contendedCount = 0, machineContended = false,
      resultsFile = "/root/repo/BENCH_RESULTS.json",
      reps = 3, cpus = "32", sfDir = "/root/testdata/sf0.1", failedCount = 2)
    assert(base(90).contains(""","failed":2"""))
    assert(base(150).contains(""","failed":2""")) // minimal-envelope tier
    val clean = BenchFormat.stdoutLine(
      total = 10.0, mins = syntheticMins(10), spreadWarn = Nil,
      contendedCount = 0, machineContended = false,
      resultsFile = "x.json", reps = 3, cpus = "32", sfDir = "sf0.1")
    assert(!clean.contains("failed"))
  }

  test("BENCH_BEST round-trips through parseFlat") {
    val best = Seq("q_a" -> 0.123, "q_b_long_name" -> 4.5, "q_c" -> 0.007)
    val parsed = BenchFormat.parseFlat(BenchFormat.jsMap(best, 3))
    assert(parsed == best.toMap)
  }

  test("parseFlat tolerates whitespace and ignores malformed entries") {
    assert(BenchFormat.parseFlat("""{ "q_x" : 1.5 , "q_y":2 }""") ==
      Map("q_x" -> 1.5, "q_y" -> 2.0))
    assert(BenchFormat.parseFlat("not json at all") == Map.empty[String, Double])
  }
}

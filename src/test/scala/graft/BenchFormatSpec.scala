package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-artifact contracts that bit rounds 6, 8, and 11: the
  * stdout line must fit the driver's tail window AT THE BUDGET — which is
  * NOT 2000 chars: the driver keeps the last 2000 chars of stdout and sbt's
  * `[success] Total time…` epilogue (~74 chars) shares that window, so the
  * line alone gets ~1900 (round 11 budgeted 1990, emitted 1960, and the
  * head was clipped → parsed:null). Also pins that the best-ever file
  * round-trips through its own parser and that token compression is
  * lossless. */
class BenchFormatSpec extends AnyFunSuite {

  test("stdout budget leaves room for the sbt epilogue inside the 2000-char driver tail") {
    assert(BenchFormat.StdoutBudget <= 1900,
      "driver tail (2000) minus sbt '[success] Total time' epilogue (~74) minus margin")
  }

  // realistic name lengths: the live suite averages 13 chars per query name
  private def syntheticMins(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"q_synth_$i%03d" -> (0.05 + (i % 37) * 0.113))

  /** Reconstruct full query names from any tier's line: parse qtok/qabbr/
    * qprefix announcements and decode each key in the queries map. */
  private def decodedNames(line: String): Set[String] = {
    val qtok = """"qtok":"([^"]*)"""".r.findFirstMatchIn(line)
      .map(_.group(1).split(",").toSeq)
      .getOrElse(Nil)
    // names announced as fast-dropped (values bounded by qmin_ds) count
    // as present: the artifact stays name-complete
    val qdrop = """"qdrop":"([^"]*)"""".r.findFirstMatchIn(line)
      .map(_.group(1).split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Nil)
    // names-only tier: sorted tok-encoded names under prefix compression
    val qpfx = """"qpfx":"([^"]*)"""".r.findFirstMatchIn(line)
      .map(m => BenchFormat.prefixDecode(m.group(1)))
      .getOrElse(Nil)
    val qabbr = """"qabbr":\{([^}]*)\}""".r.findFirstMatchIn(line)
      .map(m => """"([^"]+)":"([^"]+)"""".r.findAllMatchIn(m.group(1))
        .map(x => x.group(1) -> x.group(2)).toMap)
      .getOrElse(Map.empty[String, String])
    val prefixed = line.contains("\"qprefix\":\"q_\"")
    val qs = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(line).map(_.group(1)).getOrElse("")
    val mapKeys = """"([^"]+)":""".r.findAllMatchIn(qs).map(_.group(1)).toSeq
    (mapKeys ++ qdrop ++ qpfx).flatMap { k0 =>
      val k1 =
        if (qtok.nonEmpty) BenchFormat.tokDecode(k0, qtok)
        else if (k0.nonEmpty && k0.head.isUpper)
          qabbr.get(k0.take(1)).map(_ + k0.drop(1)).getOrElse(k0)
        else k0
      // qprefix strips only names that HAD the prefix; a non-"q_" name
      // (etl_render) rides unstripped, so both readings are candidates
      if (prefixed) Seq("q_" + k1, k1) else Seq(k1)
    }.toSet
  }

  test("fmt strips trailing zeros but stays numeric JSON") {
    assert(BenchFormat.fmt(0.120, 3) == "0.12")
    assert(BenchFormat.fmt(20.600, 2) == "20.6")
    assert(BenchFormat.fmt(0.0, 3) == "0")
    assert(BenchFormat.fmt(1.0, 2) == "1")
    assert(BenchFormat.fmt(0.077, 3) == "0.077")
  }

  test("stdout line fits the budget at 90 queries") {
    val line = BenchFormat.stdoutLine(
      total = 123.456, mins = syntheticMins(90),
      spreadWarn = Seq("q_synthetic_name_001" -> 2.7),
      contendedCount = 2, machineContended = false,
      resultsFile = "/root/repo/BENCH_RESULTS.json",
      reps = 3, cpus = "32", sfDir = "/root/testdata/sf0.1")
    assert(line.length <= BenchFormat.StdoutBudget, s"line was ${line.length} chars")
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
    assert(line.length <= BenchFormat.StdoutBudget, s"line was ${line.length} chars")
    assert(line.contains(""""machine_contended":true"""))
  }

  /** Parse the values-first tier: (plain kept entries name->ds, omitted
    * count, max omitted ds). */
  private def valuesTier(line: String): (Map[String, Long], Int, Long) = {
    val qs = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(line).map(_.group(1)).getOrElse("")
    val entries = """"([^"]+)":(\d+)""".r.findAllMatchIn(qs)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    val omitted = """"queries_omitted":(\d+)""".r.findFirstMatchIn(line)
      .map(_.group(1).toInt).getOrElse(0)
    val omax = """"qomax_ds":(\d+)""".r.findFirstMatchIn(line)
      .map(_.group(1).toLong).getOrElse(0L)
    (entries, omitted, omax)
  }

  test("values-first tier: past the complete-map limit, plain names + ds values for the slowest") {
    // 135 × 16-char names at realistic mixed timings: past what the
    // complete plain tiers fit under the 1900 budget. The r21 PERF lesson:
    // the driver never decoded the token/prefix compressed tiers, so a
    // name-complete valueless line gave it NOTHING — values with PLAIN
    // keys must win, omission announced and bounded.
    val mid = (1 to 135).map(i => f"q_operator_n_$i%03d" -> (0.05 + (i % 37) * 0.113))
    val line = BenchFormat.stdoutLine(
      total = 12.0, mins = mid, spreadWarn = Nil,
      contendedCount = 0, machineContended = false,
      resultsFile = "/root/repo/BENCH_RESULTS.json",
      reps = 3, cpus = "32", sfDir = "/root/testdata/sf0.1")
    assert(line.length <= BenchFormat.StdoutBudget, s"line was ${line.length} chars")
    assert(line.contains("\"qunit\":\"ds\"") && line.contains("\"qprefix\":\"q_\""))
    assert(!line.contains("\"qtok\":") && !line.contains("\"qabbr\":"),
      s"values-first tier must not token-encode keys: ${line.take(200)}")
    val (entries, omitted, omax) = valuesTier(line)
    assert(entries.nonEmpty && entries.size + omitted == 135)
    // kept = the slowest; every kept value bounds every omitted one
    assert(entries.values.forall(_ >= omax), s"kept mins must be >= qomax_ds=$omax")
    // keys are plainly the stripped names
    entries.keys.foreach(k => assert(mid.exists(_._1 == "q_" + k), s"non-plain key $k"))
  }

  test("values-first tier keeps the ENTIRE slow tail at 150 incompressible names") {
    val rng = new scala.util.Random(42)
    val mixed = (1 to 150).map { i =>
      val name = "q_" + (1 to 18).map(_ => ('a' + rng.nextInt(26)).toChar).mkString + f"$i%03d"
      name -> (if (i % 3 == 0) 0.5 + (i % 20) * 0.3 else 0.08)
    }
    val line = BenchFormat.stdoutLine(
      total = 200.0, mins = mixed, spreadWarn = Nil,
      contendedCount = 0, machineContended = false,
      resultsFile = "/root/repo/BENCH_RESULTS.json",
      reps = 3, cpus = "32", sfDir = "/root/testdata/sf0.1")
    assert(line.length <= BenchFormat.StdoutBudget, s"line was ${line.length} chars")
    val (entries, omitted, omax) = valuesTier(line)
    assert(entries.size + omitted == 150)
    // every slow query (>= 0.5s) rides with its value, plain-keyed
    mixed.filter(_._2 >= 0.5).foreach { case (k, v) =>
      assert(entries.get(k.drop(2)).contains(math.round(v * 10)),
        s"slow query $k must ride the values tier: ${line.take(200)}")
    }
    assert(omax <= 1, "only the sub-0.1s filler may be omitted")
  }

  test("a suite too large to ever fit degrades to valid slowest-first JSON, never unparseable") {
    // 300 queries with INCOMPRESSIBLE names (md5-derived): no complete
    // tier can fit ~9 KB of raw names — the values-first tier must keep
    // the slowest, announce the omission, and stay structurally parseable
    val huge = (1 to 300).map { i =>
      val noise = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString.take(24)
      f"q_${noise}_$i%03d" -> (if (i % 50 == 0) 45.0 else 2.0)
    }
    val line = BenchFormat.stdoutLine(
      total = 450.0, mins = huge, spreadWarn = Nil,
      contendedCount = 0, machineContended = false,
      resultsFile = "/root/repo/BENCH_RESULTS.json",
      reps = 3, cpus = "32", sfDir = "/root/testdata/sf0.1")
    assert(line.length <= BenchFormat.StdoutBudget, s"line was ${line.length} chars")
    assert(line.contains(""""queries_omitted":"""))
    assert(line.startsWith("{") && line.endsWith("}"))
    // balanced braces = structurally parseable
    assert(line.count(_ == '{') == line.count(_ == '}'))
    // every 45-second query survived the cut (keys are "q_"-stripped,
    // announced via qprefix)
    (50 to 300 by 50).foreach { i =>
      val name = huge(i - 1)._1.drop(2)
      assert(line.contains("\"" + name + "\":450"),
        s"slow query $name must survive the cut")
    }
  }

  test("tokenAbbreviations: lossless round-trip, codes are uppercase, deterministic") {
    val names = Seq("source_csv", "source_tsv", "dedup_exact", "dedup_near_lsh",
      "image_phash_dedup", "image_meta", "audio_fingerprint", "group_by_rank",
      "filter_rows", "filter_rows_str", "rename_columns", "drop_columns")
    val toks = BenchFormat.tokenAbbreviations(names)
    assert(toks == BenchFormat.tokenAbbreviations(names)) // deterministic
    assert(toks.nonEmpty && toks.size <= 26)
    names.foreach { n =>
      val enc = BenchFormat.tokEncode(n, toks)
      assert(BenchFormat.tokDecode(enc, toks) == n, s"round-trip failed for $n via $enc")
      assert(enc.length <= n.length)
    }
    // encoded names stay unique (decode inverts encode, so they must)
    assert(names.map(BenchFormat.tokEncode(_, toks)).distinct.size == names.size)
  }

  test("prefixEncode/Decode round-trips sorted name lists exactly") {
    val names = ("etl_render" +: SparkEntry.queries.keys.toSeq).map(n =>
      if (n.startsWith("q_")) n.drop(2) else n)
    val toks = BenchFormat.tokenAbbreviations(names)
    val enc = names.map(BenchFormat.tokEncode(_, toks)).sorted
    assert(BenchFormat.prefixDecode(BenchFormat.prefixEncode(enc)) == enc)
    assert(BenchFormat.prefixDecode(BenchFormat.prefixEncode(Seq("a"))) == Seq("a"))
    assert(BenchFormat.prefixDecode("") == Nil)
    // prefixes beyond the 35-char cap still round-trip
    val long = Seq("x" * 60 + "a", "x" * 60 + "b").sorted
    assert(BenchFormat.prefixDecode(BenchFormat.prefixEncode(long)) == long)
  }

  test("prefixDecode handles the pre-round-19 comma/base-36 legacy layout") {
    // entries comma-separated; each later entry opens with one base-36
    // char = shared-prefix length — qpfx lines from r18-and-earlier
    // artifacts must decode, not come back as one bogus name
    assert(BenchFormat.prefixDecode("q_agg,5_sum,2join") ==
      Seq("q_agg", "q_agg_sum", "q_join"))
    // prefix counts past 9 use letters ('f' = 15)
    assert(BenchFormat.prefixDecode("q_dedup_minhash,f_lsh") ==
      Seq("q_dedup_minhash", "q_dedup_minhash_lsh"))
    // a malformed legacy entry raises instead of silently misdecoding
    intercept[IllegalArgumentException] {
      BenchFormat.prefixDecode("q_agg,,x")
    }
  }

  test("current SparkEntry suite ships a NON-EMPTY plain-keyed values map (the r21 PERF fix)") {
    // realistic decisecond spread (r11 data shape: mostly 1-13 ds). At the
    // REAL suite size the r21 line degraded to names-only `"queries":{}`
    // and the driver's PERF computed zero per-query diffs and an empty
    // scaling block — the values-first tier must instead carry plain
    // stripped names + ds values for the slowest queries that fit, with
    // the omitted (fast) tail announced and bounded.
    val names = "etl_render" +: SparkEntry.queries.keys.toSeq.sorted
    val mins = names.zipWithIndex.map { case (n, i) => n -> (0.1 + (i % 13) * 0.1) }
    val line = BenchFormat.stdoutLine(
      total = 45.0, mins = mins, spreadWarn = Nil,
      contendedCount = 0, machineContended = false,
      resultsFile = "/root/repo/BENCH_RESULTS.json",
      reps = 3, cpus = "32", sfDir = "/root/testdata/sf0.1")
    assert(line.length <= BenchFormat.StdoutBudget,
      s"line was ${line.length} chars for ${names.size} queries")
    val (entries, omitted, omax) = valuesTier(line)
    assert(entries.size >= 60,
      s"the driver must see a usable per-query map; got ${entries.size} entries")
    assert(entries.size + omitted == names.size)
    assert(entries.values.forall(_ >= omax))
    assert(!line.contains("\"qtok\":") && !line.contains("\"qpfx\":"),
      "keys must be plain (qprefix-stripped only) — the driver decodes nothing else")
    // every kept key is a real query name, stripped of at most "q_"
    val nameSet = names.toSet
    entries.keys.foreach(k =>
      assert(nameSet.contains("q_" + k) || nameSet.contains(k), s"bogus key $k"))
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

  test("rebaseRefusedSlower: a sweep >5% over the standing floor cannot become it") {
    // the r17 accident: a slow-box sweep (1.19x floor) promoted to BENCH_BEST
    assert(BenchFormat.rebaseRefusedSlower(118.6, 100.0, force = false))
    // at or under the floor (the intended re-baseline shape) is allowed
    assert(!BenchFormat.rebaseRefusedSlower(97.2, 100.0, force = false))
    // within the 5% tolerance band is allowed (same-box noise)
    assert(!BenchFormat.rebaseRefusedSlower(104.9, 100.0, force = false))
    // deliberate reset overrides
    assert(!BenchFormat.rebaseRefusedSlower(118.6, 100.0, force = true))
    // no standing floor -> nothing to protect
    assert(!BenchFormat.rebaseRefusedSlower(118.6, 0.0, force = false))
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

  test("per-rep telemetry arrays (GC sec / storage MB) render as valid JSON maps") {
    val js = BenchFormat.jsArrays(Seq(
      "q_a" -> Vector(0.012, 0.5, 16.83),
      "q_b" -> Vector(128.0),
      "q_c" -> Vector.empty[Double]), 3)
    assert(js == """{"q_a":[0.012,0.5,16.83],"q_b":[128],"q_c":[]}""")
    // arrays embed inside the BENCH_RESULTS envelope without breaking a
    // JSON parse (the artifact is what evidences slow-window claims)
    val envelope = s"""{"samples_gc_sec":$js,"samples_storage_mb":$js}"""
    assert(envelope.count(_ == '{') == envelope.count(_ == '}'))
    assert(envelope.count(_ == '[') == envelope.count(_ == ']'))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.SparkException

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("addColumns: static literal and Jinja template") {
    val df = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    val out = Ops.addColumns(df, Seq("tag" -> "x", "both" -> "{{k}}-{{v}}", "calc" -> "{{ v|int * 10 }}"))
    assert(out.columns.toSeq == Seq("k", "v", "tag", "both", "calc"))
    assert(out.orderBy("k").collect().map(_.mkString(",")).toSeq == Seq("a,1,x,a-1,10", "b,2,x,b-2,20"))
  }

  test("modifyColumns binds {{value}} and sees the whole row") {
    val df = Seq(("a", "1")).toDF("k", "v")
    val out = Ops.modifyColumns(df, Seq("v" -> "{{value}}{{k}}"))
    assert(out.head().getString(1) == "1a")
  }

  test("{{__row_number__}} binds the zero-based input ordinal in add/modify templates") {
    val df = Seq("a", "b", "c", "d").toDF("k").coalesce(1)
    val added = Ops.addColumns(df, Seq("n" -> "row {{__row_number__}}"))
    assert(added.columns.toSeq == Seq("k", "n")) // helper column dropped
    assert(added.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq("a" -> "row 0", "b" -> "row 1", "c" -> "row 2", "d" -> "row 3"))
    val modified = Ops.modifyColumns(df, Seq("k" -> "{{value}}{{__row_number__}}"))
    assert(modified.columns.toSeq == Seq("k"))
    assert(modified.as[String].collect().toSeq == Seq("a0", "b1", "c2", "d3"))
  }

  test("mapValues: exact match replace, unmatched passes through (pandas .replace)") {
    val df = Seq("x", "y", "zz").toDF("c")
    val out = Ops.mapValues(df, Seq("c"), Map("x" -> "X", "y" -> "Y"))
    assert(out.as[String].collect().sorted.toSeq == Seq("X", "Y", "zz"))
  }

  test("wildcard column matching (fnmatch)") {
    val cols = Seq("school_id", "school_name", "grade")
    assert(Ops.matchWildcardColumns(cols, Seq("school_*")) == Seq("school_id", "school_name"))
    assert(Ops.matchWildcardColumns(cols, Seq("grade?"), raiseOnUnmatched = false).isEmpty)
    intercept[IllegalArgumentException](Ops.matchWildcardColumns(cols, Seq("nope")))
  }

  test("snakeCaseColumns handles camelCase and acronyms; collision errors") {
    val df = Seq((1, 2, 3)).toDF("studentID", "schoolYear", "already_snake")
    assert(Ops.snakeCaseColumns(df).columns.toSeq == Seq("student_id", "school_year", "already_snake"))
    val clash = Seq((1, 2)).toDF("aB", "a_b")
    intercept[IllegalArgumentException](Ops.snakeCaseColumns(clash))
  }

  test("dateFormat: reformat; strict mode fails on garbage; ignore_errors nulls it") {
    val df = Seq("2024-01-15", "garbage").toDF("d")
    val lenient = Ops.dateFormat(df, Seq("d"), "%Y-%m-%d", "%d/%m/%Y", ignoreErrors = true)
    assert(lenient.as[String].collect().toSet == Set("15/01/2024", null))
    val strict = Ops.dateFormat(df, Seq("d"), "%Y-%m-%d", "%d/%m/%Y")
    val e = intercept[Exception](strict.collect()) // raise_error → SparkRuntimeException
    assert(e.getMessage.contains("cannot parse"))
  }

  test("filterRows include/exclude with pandas null semantics") {
    val df = Seq(("a", "5"), ("b", null)).toDF("k", "v")
    assert(Ops.filterRows(df, "v == '5'").count() == 1)
    // exclude keeps the null row (pandas: not(NaN == '5') → True)
    assert(Ops.filterRows(df, "v == '5'", "exclude").select("k").as[String].collect().toSeq == Seq("b"))
  }

  test("monotone keep-filter (raw compile) keeps EXACTLY the pandas-null rows") {
    // include-mode monotone queries compile without the coalesce wrappers
    // (pushdown); nulls must still drop identically across and/or/in/str
    val df = Seq(("a", "5", "xx"), ("b", null, "xy"), ("c", "7", null),
      ("d", "5", "zz"), ("e", null, null)).toDF("k", "v", "s")
    def keep(q: String): Seq[String] =
      Ops.filterRows(df, q).select("k").as[String].collect().toSeq.sorted
    assert(keep("v == '5'") == Seq("a", "d"))
    assert(keep("v == '5' and s.str.contains('x')") == Seq("a"))
    assert(keep("v == '5' or s.str.startswith('x')") == Seq("a", "b", "d"))
    assert(keep("v in ['5', '7'] and s.str.contains('x')") == Seq("a"))
    assert(keep("v in ['5', '7'] and s.str.endswith('y')") == Nil) // null v drops b
    // negation falls back to the exact pandas-null compile: NaN != '5' is
    // True, so the null-v rows are KEPT — the raw form would drop them
    assert(keep("v != '5'") == Seq("b", "c", "e"))
    assert(keep("not (v == '5')") == Seq("b", "c", "e"))
  }

  test("boolean-equality keep-filters fall back to the exact pandas compile") {
    // token-monotone but NOT raw-safe: a predicate operand of == sees the
    // pandas-mode inner coalesce (null → false), which the outer == can
    // flip back to true — raw compile would drop rows compile() keeps
    val df = Seq(("a", "5", "xx"), ("b", null, "xy"), ("c", "7", null),
      ("d", "5", "zz"), ("e", null, null)).toDF("k", "v", "s")
    def keep(q: String): Seq[String] =
      Ops.filterRows(df, q).select("k").as[String].collect().toSeq.sorted
    def drop(q: String): Seq[String] =
      Ops.filterRows(df, q, "exclude").select("k").as[String].collect().toSeq.sorted
    // null s: pandas contains → False; False == False → True → row KEPT
    assert(keep("s.str.contains('x') == False") == Seq("c", "d", "e"))
    // include and exclude must PARTITION the rows (no row vanishing from both)
    assert((keep("s.str.contains('x') == False") ++
      drop("s.str.contains('x') == False")).sorted == Seq("a", "b", "c", "d", "e"))
    // predicate == predicate: null leaves coalesce to false on BOTH sides
    assert(keep("(v == '5') == (s.str.contains('x'))") == Seq("a", "c", "e"))
  }

  test("sortRows with +/- prefixes and descending override") {
    val df = Seq(("a", "2"), ("b", "1"), ("c", "2")).toDF("k", "v")
    assert(Ops.sortRows(df, Seq("-v", "+k")).select("k").as[String].collect().toSeq == Seq("a", "c", "b"))
    assert(Ops.sortRows(df, Seq("+v", "+k"), descending = true).select("k").as[String].collect().toSeq
      == Seq("c", "a", "b"))
  }

  test("limitRows count+offset; count must be positive") {
    val df = spark.range(10).toDF("i")
    assert(Ops.limitRows(df.orderBy("i"), 3, 2).as[Long].collect().toSeq == Seq(2L, 3L, 4L))
    intercept[IllegalArgumentException](Ops.limitRows(df, 0))
  }

  test("flatten: wrappers stripped, separator split, empty string keeps one row") {
    val df = Seq((1, """["a", "b"]"""), (2, ""), (3, "solo")).toDF("id", "arr")
    val out = Ops.flatten(df, "arr", "v").orderBy("id", "v")
    assert(out.columns.toSeq == Seq("id", "v"))
    assert(out.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (1, "b"), (2, ""), (3, "solo")))
  }

  test("join: same-name keys merge into one column; outer coalesces both sides") {
    val l = Seq(("k1", "lv1"), ("k2", "lv2")).toDF("k", "lv")
    val r = Seq(("k2", "rv2"), ("k3", "rv3")).toDF("k", "rv")
    val out = Ops.join(l, Seq(r), "outer", Seq("k"), Seq("k")).orderBy("k")
    assert(out.columns.toSeq == Seq("k", "lv", "rv"))
    assert(out.collect().map(_.mkString("|")).toSeq ==
      Seq("k1|lv1|null", "k2|lv2|rv2", "k3|null|rv3"))
  }

  test("join: colliding non-key columns get _x/_y suffixes (pandas merge)") {
    val l = Seq(("1", "L")).toDF("id", "name")
    val r = Seq(("1", "R")).toDF("rid", "name")
    val out = Ops.join(l, Seq(r), "inner", Seq("id"), Seq("rid"))
    assert(out.columns.toSeq == Seq("id", "name_x", "rid", "name_y"))
  }

  test("join: keep/drop column pruning and key-drop guard") {
    val l = Seq(("1", "a", "b")).toDF("id", "keep", "drop")
    val r = Seq(("1", "x")).toDF("id", "rcol")
    val kept = Ops.join(l, Seq(r), "inner", Seq("id"), Seq("id"), leftKeep = Seq("keep"))
    assert(kept.columns.toSeq == Seq("id", "keep", "rcol"))
    intercept[IllegalArgumentException](
      Ops.join(l, Seq(r), "inner", Seq("id"), Seq("id"), leftDrop = Seq("id")))
  }

  test("union: column mismatch errors unless fill_missing_columns") {
    val a = Seq(("1", "x")).toDF("id", "v")
    val b = Seq("2").toDF("id")
    intercept[IllegalArgumentException](Ops.union(a, Seq(b)))
    val filled = Ops.union(a, Seq(b), fillMissingColumns = true).orderBy("id")
    assert(filled.collect().map(_.mkString("|")).toSeq == Seq("1|x", "2|null"))
  }

  test("melt defaults: all non-id vars, melt_variable/melt_value names") {
    val df = Seq(("1", "a", "b")).toDF("id", "c1", "c2")
    val out = Ops.melt(df, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "melt_variable", "melt_value"))
    assert(out.count() == 2)
  }

  test("pivot: uniqueness pre-check errors like the reference") {
    val dup = Seq(("r", "c", "1"), ("r", "c", "2")).toDF("row", "colv", "v")
    intercept[IllegalArgumentException](Ops.pivot(dup, Seq("row"), "colv", "v"))
    val ok = Seq(("r1", "A", "1"), ("r1", "B", "2"), ("r2", "A", "3")).toDF("row", "colv", "v")
    val out = Ops.pivot(ok, Seq("row"), "colv", "v").orderBy("row")
    assert(out.columns.toSeq == Seq("row", "A", "B"))
    assert(out.collect().map(_.mkString("|")).toSeq == Seq("r1|1|2", "r2|3|null"))
  }

  test("melt then pivot round-trips") {
    val df = Seq(("1", "a", "b"), ("2", "c", "d")).toDF("id", "c1", "c2")
    val melted = Ops.melt(df, Seq("id"))
    val back = Ops.pivot(melted, Seq("id"), "melt_variable", "melt_value").orderBy("id")
    assert(back.columns.toSeq == Seq("id", "c1", "c2"))
    assert(back.collect().map(_.mkString("|")).toSeq == Seq("1|a|b", "2|c|d"))
  }

  test("groupBy: mean is sum/size not avg (reference groupby.py:155)") {
    // null cell: mean divides by group SIZE (3), plain AVG would use the
    // non-null count (2). Garbage strings raise under ANSI — matching the
    // reference's pd.to_numeric(errors='raise').
    val df = Seq(("g", Some("2")), ("g", Some("4")), ("g", None)).toDF("k", "v")
    val out = Ops.groupBy(df, Seq("k"), Seq("m" -> "mean(v)", "n" -> "count()", "s" -> "sum(v)"))
    val row = out.head()
    assert(row.getDouble(1) == 2.0) // (2+4)/3, not 3.0
    assert(row.getLong(2) == 3L)
    assert(row.getDouble(3) == 6.0)
    val garbage = Seq(("g", "x")).toDF("k", "v")
    intercept[Exception](Ops.groupBy(garbage, Seq("k"), Seq("s" -> "sum(v)")).collect())
  }

  test("groupBy: agg concat, json_array_agg, str_min/max, std/var") {
    val df = Seq(("g", "b"), ("g", "a")).toDF("k", "v")
    val out = Ops.groupBy(df, Seq("k"), Seq(
      "joined" -> "agg(v,;)", "js" -> "json_array_agg(v)", "jstr" -> "json_array_agg(v,str)",
      "lo" -> "str_min(v)", "hi" -> "str_max(v)"))
    val row = out.head()
    assert(Set("a;b", "b;a").contains(row.getString(1)))
    assert(row.getString(4) == "a" && row.getString(5) == "b")
    assert(row.getString(3).startsWith("[\""))
    val bad = intercept[IllegalArgumentException](Ops.groupBy(df, Seq("k"), Seq("x" -> "mode(v)")))
    assert(bad.getMessage.contains("invalid aggregation function"))
  }

  test("groupBy: exact median/percentile extensions (percentile_cont interpolation)") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 10.0),
      ("h", 5.0)).toDF("k", "v")
    val out = Ops.groupBy(df, Seq("k"), Seq(
      "med" -> "median(v)", "p25" -> "percentile(v,0.25)", "p100" -> "percentile(v,1.0)"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("g") == ((2.5, 1.75, 10.0))) // linear interpolation between ranks
    assert(out("h") == ((5.0, 5.0, 5.0)))
    val badP = intercept[IllegalArgumentException](
      Ops.groupBy(df, Seq("k"), Seq("x" -> "percentile(v,1.5)")))
    assert(badP.getMessage.contains("fraction must be in [0,1]"))
    // the sketch path (100 TB groups) agrees with exact on small groups
    val approx = Ops.groupBy(df, Seq("k"), Seq("a50" -> "approx_percentile(v,0.5)"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx("h") == 5.0 && approx("g") >= 2.0 && approx("g") <= 3.0)
  }

  test("groupBy: approx_distinct HLL extension (exact below the register regime)") {
    graft.expressions.GraftFunctions.register(spark)
    // 3 groups x 120 distinct string keys each — far below 2^12 registers,
    // so the linear-counting branch answers EXACTLY
    val df = (0 until 720).map(i => (s"g${i % 3}", s"k${i % 360}")).toDF("k", "v")
    val out = Ops.groupBy(df, Seq("k"), Seq("nd" -> "approx_distinct(v)"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.forall(v => math.abs(v - 120L) <= 2), out.toString)
    // precision rides the separator slot; out-of-range rejects
    val p8 = Ops.groupBy(df, Seq("k"), Seq("nd" -> "approx_distinct(v,8)"))
      .collect().map(_.getLong(1))
    assert(p8.forall(v => v > 90 && v < 150))
    val bad = intercept[IllegalArgumentException](
      Ops.groupBy(df, Seq("k"), Seq("x" -> "approx_distinct(v,99)")))
    assert(bad.getMessage.contains("[4,16]"))
  }

  test("fillNa/dropNa: typed constant fills, any/all drop semantics, rejects") {
    val df = Seq((1L, Some(2.5), Some("a")), (2L, None, Some("b")),
      (3L, Some(4.0), None), (4L, None, None))
      .map { case (i, v, s) => (i, v.map(Double.box).orNull, s.orNull) }
      .toDF("id", "v", "s")
    val filled = Ops.fillNa(df, Seq("v" -> "-1", "s" -> "none"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(filled == Seq((1L, 2.5, "a"), (2L, -1.0, "b"), (3L, 4.0, "none"), (4L, -1.0, "none")))
    assert(Ops.fillNa(df, Seq("v" -> "-1")).schema("v").dataType ==
      org.apache.spark.sql.types.DoubleType) // typed, not stringified
    // any over [v, s]: only the fully non-null row survives
    assert(Ops.dropNa(df, Seq("v", "s")).collect().map(_.getLong(0)).toSeq == Seq(1L))
    // all: only the all-null row drops
    assert(Ops.dropNa(df, Seq("v", "s"), how = "all")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // default column set = every column (id never null -> any keeps row 1)
    assert(Ops.dropNa(df, Nil).count() == 1)
    assert(intercept[IllegalArgumentException](
      Ops.dropNa(df, Seq("v"), how = "some")).getMessage.contains("any/all"))
    assert(intercept[IllegalArgumentException](
      Ops.fillNa(df, Nil)).getMessage.contains("must not be empty"))
    assert(intercept[IllegalArgumentException](
      Ops.fillNa(df, Seq("zz" -> "0"))).getMessage.contains("not defined"))
  }

  test("explodeColumn: element rows, ordinals, outer mode, replace-vs-new, rejects") {
    val df = Seq((1L, Seq("a", "b"), "x"), (2L, Seq.empty[String], "y"),
      (3L, Seq("c"), "z")).toDF("id", "arr", "other")
    // default: exploded value REPLACES the array column; empty arrays drop
    val repl = Ops.explodeColumn(df, "arr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(repl == Seq((1L, "a", "x"), (1L, "b", "x"), (3L, "c", "z")))
    // new_column keeps the array; position_column adds 0-based ordinals
    val pos = Ops.explodeColumn(df, "arr", "w", Some("i"))
    assert(pos.columns.toSeq == Seq("id", "arr", "other", "i", "w"))
    assert(pos.filter(col("id") === 1 && col("i") === 1).head().getAs[String]("w") == "b")
    // keep_empty: the empty-array row survives with a null element
    val outer = Ops.explodeColumn(df, "arr", keepEmpty = true)
    assert(outer.count() == 4 && outer.filter(col("id") === 2).head().isNullAt(1))
    assert(intercept[IllegalArgumentException](
      Ops.explodeColumn(df, "other")).getMessage.contains("must be an array"))
    assert(intercept[IllegalArgumentException](
      Ops.explodeColumn(df, "zz")).getMessage.contains("not defined"))
  }

  test("castColumns: typed exits, ANSI raise on malformed, type/column rejects") {
    val df = Seq(("1", "2.5", "x"), ("2", "7.25", "y")).toDF("a", "b", "c")
    val out = Ops.castColumns(df, Seq("a" -> "bigint", "b" -> "double"))
    assert(out.schema("a").dataType == org.apache.spark.sql.types.LongType)
    assert(out.schema("b").dataType == org.apache.spark.sql.types.DoubleType)
    assert(out.agg(sum("b")).head().getDouble(0) == 9.75)
    // ANSI: malformed numeric raises at execution, never silently nulls
    val bad = Ops.castColumns(Seq(Tuple1("oops")).toDF("a"), Seq("a" -> "bigint"))
    assertThrows[Exception](bad.collect())
    assert(intercept[IllegalArgumentException](
      Ops.castColumns(df, Seq("zz" -> "bigint"))).getMessage.contains("not defined"))
    assert(intercept[IllegalArgumentException](
      Ops.castColumns(df, Seq("a" -> "not_a_type"))).getMessage.contains("invalid type"))
    assert(intercept[IllegalArgumentException](
      Ops.castColumns(df, Nil)).getMessage.contains("must not be empty"))
  }

  test("subtract/intersect rows: keyed anti/semi keep duplicates, keyless is multiset") {
    val l = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "v")
    val block = Seq((1L, "zzz")).toDF("k", "x")
    // keyed: BOTH k=1 rows drop, duplicates elsewhere survive
    val sub = Ops.subtractRows(l, Seq(block), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(sub == Seq((2L, "c"), (3L, "d")))
    val sem = Ops.intersectRows(l, Seq(block), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(sem == Seq((1L, "a"), (1L, "b"))) // semi keeps both duplicate rows
    // keyless multiset: counts are per-occurrence, not distinct
    val a = Seq("x", "x", "x", "y").toDF("c")
    val b = Seq("x", "x", "z").toDF("c")
    assert(Ops.subtractRows(a, Seq(b), Nil).collect().map(_.getString(0)).sorted.toSeq
      == Seq("x", "y")) // 3 x's minus 2 x's leaves one x
    assert(Ops.intersectRows(a, Seq(b), Nil).collect().map(_.getString(0)).toSeq
      == Seq("x", "x")) // min(3, 2) occurrences
    // rejects: schema mismatch keyless, missing key, empty sources
    assert(intercept[IllegalArgumentException](
      Ops.subtractRows(l, Seq(block), Nil)).getMessage.contains("schemas must match"))
    assert(intercept[IllegalArgumentException](
      Ops.subtractRows(l, Seq(block), Seq("nope"))).getMessage.contains("not in the dataset"))
    assert(intercept[IllegalArgumentException](
      Ops.subtractRows(l, Nil, Nil)).getMessage.contains("at least one"))
    // YAML dispatch
    val e = new graft.engine.Engine(spark)
    val y = e.applyOperation(l, Map("operation" -> "subtract_rows",
      "sources" -> List("$sources.b"), "keys" -> List("k")),
      Map("sources.b" -> block), "spec")
    assert(y.count() == 2)
  }

  test("join broadcast hint: forces BroadcastHashJoin where the planner would sort-merge") {
    val dim = (1L to 50L).map(i => (i, s"name$i")).toDF("k", "nm")
    val fact = (1L to 500L).map(i => (i % 50 + 1, i * 1.0)).toDF("k", "v")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // no auto-broadcast
    try {
      def planOf(b: Option[String]) = Ops.join(fact, Seq(dim), "inner",
        Seq("k"), Seq("k"), broadcastSide = b)
        .queryExecution.executedPlan.toString
      assert(!planOf(None).contains("BroadcastHashJoin"),
        "without the hint and auto-broadcast off, the join must not broadcast")
      assert(planOf(Some("right")).contains("BroadcastHashJoin"))
      assert(planOf(Some("left")).contains("BroadcastHashJoin"))
      val joined = Ops.join(fact, Seq(dim), "inner", Seq("k"), Seq("k"),
        broadcastSide = Some("right"))
      assert(joined.count() == 500) // hint never changes semantics
      val bad = intercept[IllegalArgumentException](
        Ops.join(fact, Seq(dim), "inner", Seq("k"), Seq("k"), broadcastSide = Some("both")))
      assert(bad.getMessage.contains("`broadcast` must be"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("groupBy grouping sets: rollup subtotals, cube margins, invalid grouping rejected") {
    val df = Seq(("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0))
      .toDF("k1", "k2", "v")
    def m(g: String) = Ops.groupBy(df, Seq("k1", "k2"), Seq("s" -> "sum(v)"), grouping = g)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getDouble(2)).toMap
    val base = m("groups")
    assert(base.size == 3 && base((Some("a"), Some("y"))) == 2.0)
    val roll = m("rollup")
    assert(roll.size == 6) // 3 leaves + 2 per-k1 subtotals + grand total
    assert(roll((Some("a"), None)) == 3.0 && roll((None, None)) == 7.0)
    assert(!roll.contains((None, Some("x")))) // rollup has no per-k2 margin
    val cube = m("cube")
    assert(cube.size == 8 && cube((None, Some("x"))) == 5.0)
    val bad = intercept[IllegalArgumentException](
      Ops.groupBy(df, Seq("k1"), Seq("s" -> "sum(v)"), grouping = "sets"))
    assert(bad.getMessage.contains("invalid grouping"))
  }

  test("windowAgg: rolling frame, lag/lead, ordinals; global window rejected") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0), ("b", 1L, 5.0))
      .toDF("k", "t", "v")
    val rolled = Ops.windowAgg(df, Seq("k"), Seq("t"), "sum", "v", "rs",
      rowsPreceding = Some(1), rowsFollowing = Some(0))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(rolled(("a", 1L)) == 10.0 && rolled(("a", 2L)) == 30.0 &&
      rolled(("a", 3L)) == 50.0 && rolled(("b", 1L)) == 5.0)
    val lagged = Ops.windowAgg(df, Seq("k"), Seq("-t"), "lag", "v", "pv")
      .filter(col("k") === "a" && col("t") === 2L).head()
    assert(lagged.getDouble(3) == 30.0) // descending order: prev of t=2 is t=3
    val seq = Ops.windowAgg(df, Seq("k"), Seq("t"), "row_number", "", "n")
      .filter(col("k") === "a" && col("t") === 3L).head()
    assert(seq.getLong(3) == 3L)
    val bad = intercept[IllegalArgumentException](
      Ops.windowAgg(df, Nil, Seq("t"), "sum", "v", "x"))
    assert(bad.getMessage.contains("partition_by is required"))
    val badFn = intercept[IllegalArgumentException](
      Ops.windowAgg(df, Seq("k"), Seq("t"), "mode", "v", "x"))
    assert(badFn.getMessage.contains("invalid window function"))
  }

  test("windowAgg: ranking tier — rank ties, dense_rank, ntile, percent_rank, first/last") {
    // duplicate order key at t=2 makes rank/dense_rank diverge from row_number
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 2L, 30.0), ("a", 3L, 40.0))
      .toDF("k", "t", "v")
    def vals(fn: String, c: String = "", off: Int = 1) =
      Ops.windowAgg(df, Seq("k"), Seq("t", "v"), fn, c, "x", offset = off)
        .orderBy("t", "v").select("x").collect().map(_.get(0)).toSeq
    val rankDf = Ops.windowAgg(df, Seq("k"), Seq("t"), "rank", "", "x")
      .orderBy("t", "v").select("x").as[Long].collect().toSeq
    assert(rankDf == Seq(1L, 2L, 2L, 4L)) // ties share rank, next skips
    val dr = Ops.windowAgg(df, Seq("k"), Seq("t"), "dense_rank", "", "x")
      .orderBy("t", "v").select("x").as[Long].collect().toSeq
    assert(dr == Seq(1L, 2L, 2L, 3L)) // dense: no gap after the tie
    assert(vals("ntile", off = 3) == Seq(1L, 1L, 2L, 3L)) // 4 rows into 3 buckets: 2,1,1
    assert(vals("percent_rank") == Seq(0.0, 1.0 / 3, 2.0 / 3, 1.0))
    assert(vals("cume_dist") == Seq(0.25, 0.5, 0.75, 1.0))
    assert(vals("first_value", "v") == Seq(10.0, 10.0, 10.0, 10.0))
    assert(vals("last_value", "v") == Seq(10.0, 20.0, 30.0, 40.0))
    val badN = intercept[IllegalArgumentException](
      Ops.windowAgg(df, Seq("k"), Seq("t"), "ntile", "", "x", offset = 0))
    assert(badN.getMessage.contains("positive bucket count"))
  }

  test("groupByWithRank: 0-based cumcount within groups") {
    val df = Seq(("g1", "a"), ("g1", "b"), ("g2", "c")).toDF("g", "v")
    val out = Ops.groupByWithRank(df, Seq("g"), "rk", orderBy = Seq("v"))
    assert(out.orderBy("g", "v").select("rk").as[Int].collect().toSeq == Seq(0, 1, 0))
  }

  test("expect and requireRows assertions") {
    val df = Seq(("5", "ok")).toDF("n", "s")
    Ops.expect(df, Seq("n|int > 4"))
    intercept[IllegalStateException](Ops.expect(df, Seq("n|int > 10")))
    Ops.requireRows(df, 1)
    intercept[IllegalStateException](Ops.requireRows(df, 2))
  }

  test("distinctRows with subset keeps one row per key") {
    val df = Seq(("a", "1"), ("a", "2"), ("b", "1")).toDF("k", "v")
    assert(Ops.distinctRows(df, Seq("k")).count() == 2)
    assert(Ops.distinctRows(df).count() == 3)
  }

  test("debug operation: head/tail/describe/columns with keep/skip/transpose pass data through") {
    val df = Seq(("1", "a", "x"), ("2", "b", "y"), ("3", "c", "z")).toDF("id", "v", "w")
    def captured(f: => Any): String = {
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos))(f)
      bos.toString("UTF-8")
    }
    val headOut = captured(assert(Ops.debug(df, "head", rows = 2).count() == 3))
    assert(headOut.contains("debug (head 2)"))
    assert(headOut.contains("id") && headOut.contains("1") && !headOut.contains("3"))
    val tailOut = captured(Ops.debug(df.orderBy("id"), "tail", rows = 1))
    assert(tailOut.contains("3") && !tailOut.contains("2 "))
    val colsOut = captured(Ops.debug(df, "columns"))
    assert(colsOut.contains("[id, v, w]"))
    val keepOut = captured(Ops.debug(df, "head", rows = 3,
      keepColumns = Some(Seq("id", "v")), skipColumns = Seq("v")))
    assert(keepOut.contains("id") && !keepOut.contains("v "))
    val transposed = captured(Ops.debug(df, "head", rows = 2, transpose = true))
    assert(transposed.contains("column") && transposed.contains("row0"))
    val descOut = captured(Ops.debug(df.select("id"), "describe"))
    assert(descOut.contains("summary") && descOut.contains("mean"))
    intercept[Exception](Ops.debug(df, "nope"))
  }
}

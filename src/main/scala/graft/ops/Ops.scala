package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import graft.translate.{PandasQuery, Strftime}
import graft.template.RowTemplates

/**
 * The operator library: every dataflow operation of the reference engine
 * (reference operations directory, inventory in SURVEY.md §2), re-expressed as
 * declarative Spark transforms so Catalyst gets full visibility (pushdown,
 * pruning, join selection). Config errors throw IllegalArgumentException with
 * operator context, mirroring the reference's error_handler contract.
 */
object Ops {

  private def err(op: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"`$op` operation: $msg")

  // ------------------------------------------------------------- wildcards
  /** fnmatch-style wildcard expansion against the current columns
    * (reference nodes/node.py:207-241): `*` any run, `?` one char,
    * `[seq]` char class. Non-wildcard patterns must match exactly. */
  def matchWildcardColumns(all: Seq[String], patterns: Seq[String],
                           raiseOnUnmatched: Boolean = true, op: String = "op"): Seq[String] = {
    val out = Seq.newBuilder[String]
    patterns.foreach { p =>
      if (p.exists(c => c == '*' || c == '?' || c == '[')) {
        val rx = fnmatchToRegex(p)
        val hits = all.filter(rx.matches)
        out ++= hits
      } else {
        if (!all.contains(p)) {
          if (raiseOnUnmatched) err(op, s"column `$p` not defined in the dataset (have: ${all.mkString(", ")})")
        } else out += p
      }
    }
    out.result().distinct
  }

  private def fnmatchToRegex(p: String): scala.util.matching.Regex = {
    val sb = new StringBuilder
    var i = 0
    while (i < p.length) {
      p.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append(".")
        case '[' =>
          val j = p.indexOf(']', i + 1)
          if (j < 0) { sb.append("\\["); }
          else { sb.append(p.substring(i, j + 1)); i = j }
        case c => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      i += 1
    }
    sb.toString.r
  }

  // ====================================================== column operators

  /** `{{__row_number__}}` (reference docs/configuration.md "Tip: use
    * Jinja!"): zero-based input ordinal, bound only when a template asks for
    * it. Implemented with zipWithIndex — contiguous and partition-ordered,
    * so it is the file/input order for any single-source frame; like
    * group_by_with_rank's cumcount, the assignment is only deterministic up
    * to the input's partition order (a repartition upstream reorders it —
    * same caveat the reference inherits from the pandas index). */
  private val RowNumberVar = "__row_number__"
  private def withRowNumberCol(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(RowNumberVar, org.apache.spark.sql.types.LongType)
    spark.createDataFrame(
      df.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
  }
  private def withTemplateOrdinal(d: DataFrame, tpl: String)(
      render: DataFrame => DataFrame): DataFrame =
    if (tpl.contains(RowNumberVar) && !d.columns.contains(RowNumberVar))
      render(withRowNumberCol(d)).drop(RowNumberVar)
    else render(d)

  /** add_columns (reference operations/column.py:16-61): new columns from
    * static strings or per-row Jinja templates. */
  def addColumns(df: DataFrame, specs: Seq[(String, String)]): DataFrame =
    specs.foldLeft(df) { case (d, (name, tpl)) =>
      withTemplateOrdinal(d, tpl)(dd => dd.withColumn(name, RowTemplates.templateColumn(dd, tpl)))
    }

  /** modify_columns (column.py:64-122): rewrite existing columns; the Jinja
    * context binds `value` to the current cell (plus the whole row). Supports
    * wildcard column patterns. */
  def modifyColumns(df: DataFrame, specs: Seq[(String, String)]): DataFrame =
    specs.foldLeft(df) { case (d, (pattern, tpl)) =>
      withTemplateOrdinal(d, tpl) { base =>
        matchWildcardColumns(base.columns.filterNot(_ == RowNumberVar).toSeq, Seq(pattern),
          raiseOnUnmatched = true, "modify_columns")
          .foldLeft(base)((dd, c) => dd.withColumn(c, RowTemplates.templateColumn(dd, tpl, bindValue = Some(c))))
      }
    }

  /** duplicate_columns (column.py:125-159). */
  def duplicateColumns(df: DataFrame, specs: Seq[(String, String)]): DataFrame =
    specs.foldLeft(df) { case (d, (old, nw)) =>
      if (!d.columns.contains(old)) err("duplicate_columns", s"column `$old` not defined")
      d.withColumn(nw, col(old))
    }

  /** rename_columns (column.py:162-194). */
  def renameColumns(df: DataFrame, mapping: Map[String, String]): DataFrame = {
    mapping.keys.foreach(o => if (!df.columns.contains(o)) err("rename_columns", s"column `$o` not defined"))
    df.withColumnsRenamed(mapping)
  }

  /** drop_columns (column.py:197-227), wildcards allowed. */
  def dropColumns(df: DataFrame, patterns: Seq[String]): DataFrame = {
    val cols = matchWildcardColumns(df.columns.toSeq, patterns, raiseOnUnmatched = false, "drop_columns")
    df.drop(cols: _*)
  }

  /** keep_columns (column.py:230-254), wildcards allowed, errors on unmatched. */
  def keepColumns(df: DataFrame, patterns: Seq[String]): DataFrame = {
    val cols = matchWildcardColumns(df.columns.toSeq, patterns, raiseOnUnmatched = true, "keep_columns")
    df.select(cols.map(col): _*)
  }

  /** combine_columns (column.py:257-289): string-concat with separator. */
  def combineColumns(df: DataFrame, newName: String, columns: Seq[String], separator: String): DataFrame = {
    val cols = matchWildcardColumns(df.columns.toSeq, columns, raiseOnUnmatched = true, "combine_columns")
    df.withColumn(newName, concat_ws(separator, cols.map(c => col(c).cast(StringType)): _*))
  }

  /** map_values (column.py:293-368): exact-match dictionary replace —
    * unmatched values pass through (pandas `.replace` semantics), so this is
    * `element_at(map, col)` + coalesce, a codegen'd expression rather than a
    * broadcast join for the typical small inline mapping. */
  def mapValues(df: DataFrame, columns: Seq[String], mapping: Map[String, String]): DataFrame = {
    val cols = matchWildcardColumns(df.columns.toSeq, columns, raiseOnUnmatched = true, "map_values")
    val m = typedlit(mapping)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, coalesce(element_at(m, col(c).cast(StringType)), col(c))))
  }

  /** date_format (column.py:372-421): reparse from_format → to_format using
    * the strftime translator. ignore_errors=false must FAIL on unparseable
    * non-null input (pandas errors='raise'); Spark's to_timestamp returns
    * null, so strict mode guards with raise_error. */
  def dateFormat(df: DataFrame, columns: Seq[String], fromFormat: String, toFormat: String,
                 ignoreErrors: Boolean = false): DataFrame = {
    val fromJ = Strftime.toJavaParsePattern(fromFormat)
    val toJ = Strftime.toJavaPattern(toFormat)
    val cols = matchWildcardColumns(df.columns.toSeq, columns, raiseOnUnmatched = true, "date_format")
    cols.foldLeft(df) { (d, c) =>
      // try_to_timestamp: Spark 4 ANSI mode makes plain to_timestamp throw on
      // the first bad value even when we want coerce-to-null semantics
      val parsed = try_to_timestamp(col(c), lit(fromJ))
      val out = date_format(parsed, toJ)
      val guarded =
        if (ignoreErrors) out
        else when(col(c).isNotNull && parsed.isNull,
          raise_error(concat(lit(s"date_format: cannot parse `$c` value '"), col(c), lit(s"' with format '$fromFormat'"))))
          .otherwise(out)
      d.withColumn(c, guarded)
    }
  }

  /** snake_case_columns (column.py:425-473): camelCase → snake_case on all
    * names; errors if two names collide after conversion. */
  def snakeCaseColumns(df: DataFrame): DataFrame = {
    val renamed = df.columns.map(snakeCase)
    val dupes = renamed.groupBy(identity).collect { case (n, hits) if hits.length > 1 => n }
    if (dupes.nonEmpty) err("snake_case_columns", s"column name collision after snake_casing: ${dupes.mkString(", ")}")
    df.toDF(renamed.toIndexedSeq: _*)
  }

  def snakeCase(name: String): String = {
    // public two-step camel→snake idiom: split acronym-word and word-Word
    val s1 = "(.)([A-Z][a-z]+)".r.replaceAllIn(name, m => m.group(1) + "_" + m.group(2))
    val s2 = "([a-z0-9])([A-Z])".r.replaceAllIn(s1, m => m.group(1) + "_" + m.group(2))
    s2.replace(' ', '_').replace("__", "_").toLowerCase
  }

  /** lowercase_columns / uppercase_columns (column.py:475-483). */
  def lowercaseColumns(df: DataFrame): DataFrame = df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)
  def uppercaseColumns(df: DataFrame): DataFrame = df.toDF(df.columns.map(_.toUpperCase).toIndexedSeq: _*)

  // ========================================================= row operators

  /** distinct_rows (row.py:10-49): optional subset; keeps one row per key. */
  def distinctRows(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    columns.foreach(c => if (!df.columns.contains(c)) err("distinct_rows", s"column `$c` not defined"))
    if (columns.isEmpty) df.dropDuplicates() else df.dropDuplicates(columns)
  }

  /** filter_rows (row.py:52-96): pandas-query dialect predicate; `exclude`
    * wraps in not(...). The translator compiles to a native Catalyst
    * predicate (pushdown-able), with pandas two-valued null semantics. */
  def filterRows(df: DataFrame, query: String, behavior: String = "include"): DataFrame =
    behavior match {
      // keep-mode: monotone queries compile WITHOUT the pandas-null
      // coalesce wrappers (filter-equivalent; see compileForKeepFilter) so
      // the comparisons push into the parquet scan — at 100TB the wrapped
      // form reads every row group, the raw form skips on min/max stats
      case "include" => df.filter(PandasQuery.compileForKeepFilter(query))
      // exclude wraps in not(): null handling must stay exactly pandas'
      case "exclude" => df.filter(!PandasQuery.compile(query))
      case other => err("filter_rows", s"`behavior` must be one of [include, exclude], not `$other`")
    }

  /** sort_rows (row.py:98-154): `+col`/`-col` prefixes; `descending` forces
    * all directions descending. Global sort → range-partitioned exchange. */
  def sortRows(df: DataFrame, columns: Seq[String], descending: Boolean = false): DataFrame = {
    val keys = columns.map {
      case c if c.startsWith("-") => (c.substring(1), false)
      case c if c.startsWith("+") => (c.substring(1), true)
      case c => (c, true)
    }.map { case (c, asc) => (c, if (descending) false else asc) }
    keys.foreach { case (c, _) => if (!df.columns.contains(c)) err("sort_rows", s"column `$c` not defined") }
    df.orderBy(keys.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }: _*)
  }

  /** window_agg (engine extension): per-partition ordered window
    * computations — rolling aggregates (sum/avg/min/max/count over a rows
    * frame), lag/lead, row_number — the time-series feature-engineering
    * pass (rolling averages, previous-event deltas, per-key ordinals).
    *
    * `partition_by` is REQUIRED: an empty partitioning would put the
    * whole frame on one task — global running totals belong to the
    * bucketed prefix-sum operators (Sampling.withHashPrefixSum), which
    * never collapse to a single partition. Order keys take the sort_rows
    * `-col` descending prefix. Frame defaults: unbounded preceding →
    * current row (the running-aggregate shape); `rows_preceding` /
    * `rows_following` bound it (e.g. 3/0 = 4-row trailing window). */
  def windowAgg(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[String],
                function: String, column: String, newColumn: String,
                rowsPreceding: Option[Long] = None, rowsFollowing: Option[Long] = None,
                offset: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (partitionBy.isEmpty)
      err("window_agg", "partition_by is required (a global window runs on ONE task; " +
        "use the bucketed prefix-sum operators for global running totals)")
    val columnFree = Set("row_number", "count", "rank", "dense_rank",
      "percent_rank", "cume_dist", "ntile")
    (partitionBy ++ orderBy.map(_.stripPrefix("-").stripPrefix("+")) ++
      (if (columnFree.contains(function)) Nil else Seq(column)))
      .foreach(c => if (!df.columns.contains(c)) err("window_agg", s"column `$c` not defined"))
    if (function == "ntile" && offset < 1)
      err("window_agg", s"ntile needs a positive bucket count in `offset` (got $offset)")
    val orderCols = orderBy.map {
      case c if c.startsWith("-") => col(c.substring(1)).desc
      case c => col(c.stripPrefix("+")).asc
    }
    val base = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderCols: _*)
    val lo = rowsPreceding.map(-_).getOrElse(Window.unboundedPreceding)
    val hi = rowsFollowing.getOrElse(0L)
    val framed = base.rowsBetween(lo, hi)
    val num = col(column).cast(DoubleType)
    val result = function match {
      case "sum" => sum(num).over(framed)
      case "avg" | "mean" => avg(num).over(framed)
      case "min" => min(num).over(framed)
      case "max" => max(num).over(framed)
      case "count" => count(lit(1)).over(framed)
      case "lag" => lag(col(column), offset).over(base)
      case "lead" => lead(col(column), offset).over(base)
      case "row_number" => row_number().over(base).cast(org.apache.spark.sql.types.LongType)
      // ranking / distribution functions (unframed — rank semantics are
      // defined by order position, not a frame); percent_rank/cume_dist are
      // exact small-integer ratios, IEEE-identical cross-engine
      case "rank" => rank().over(base).cast(org.apache.spark.sql.types.LongType)
      case "dense_rank" => dense_rank().over(base).cast(org.apache.spark.sql.types.LongType)
      case "percent_rank" => percent_rank().over(base)
      case "cume_dist" => cume_dist().over(base)
      // bucket count rides the `offset` slot (the one integer knob)
      case "ntile" => ntile(offset).over(base).cast(org.apache.spark.sql.types.LongType)
      case "first_value" | "first" => first(col(column)).over(framed)
      case "last_value" | "last" => last(col(column)).over(framed)
      case other => err("window_agg",
        s"invalid window function `$other` (sum/avg/min/max/count/lag/lead/row_number/" +
          "rank/dense_rank/percent_rank/cume_dist/ntile/first_value/last_value)")
    }
    df.withColumn(newColumn, result)
  }

  /** limit_rows (row.py:156-185): head(count+offset).tail(count). */
  def limitRows(df: DataFrame, count: Int, offset: Int = 0): DataFrame = {
    if (count < 1) err("limit_rows", "count for a limit operation must be a positive integer")
    if (offset > 0) df.offset(offset).limit(count) else df.limit(count)
  }

  /** flatten (row.py:188-248): strip wrapper chars, split a stringified array
    * on `separator`, trim each element, one output row per element (an empty
    * string still yields one row holding ""). Pure split+explode — narrow,
    * no shuffle. */
  def flatten(df: DataFrame, flattenColumn: String, valueColumn: String,
              separator: String = ",",
              leftWrapper: String = "[\"'", rightWrapper: String = "\"']",
              trimWhitespace: String = " \t\r\n\"'"): DataFrame = {
    if (!df.columns.contains(flattenColumn)) err("flatten", s"column `$flattenColumn` not defined")
    def cls(chars: String) = "[" + chars.flatMap(c => "\\" + c) + "]"
    val stripped = regexp_replace(
      regexp_replace(col(flattenColumn).cast(StringType), s"^${cls(leftWrapper)}+", ""),
      s"${cls(rightWrapper)}+$$", "")
    val parts = split(stripped, java.util.regex.Pattern.quote(separator), -1)
    val trimmed = transform(parts, x =>
      regexp_replace(regexp_replace(x, s"^${cls(trimWhitespace)}+", ""), s"${cls(trimWhitespace)}+$$", ""))
    df.withColumn(valueColumn, explode(trimmed)).drop(flattenColumn)
  }

  // ================================================ join / union / reshape

  /** join (dataframe.py:14-141): sequential binary equi-joins of the pipeline
    * frame with named frames, with pandas `merge` semantics:
    *  - same-name key columns merge into one (coalesced for outer);
    *  - differently-named keys are both kept;
    *  - colliding non-key columns are auto-suffixed `_x`/`_y`;
    *  - optional per-side keep/drop pruning before the join (manual projection
    *    in the reference; here it also helps Catalyst prune early).
    * Catalyst picks broadcast/SMJ/SHJ; small dimension frames broadcast
    * automatically under AQE. */
  def join(left: DataFrame, rights: Seq[DataFrame], joinType: String,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftKeep: Seq[String] = Nil, leftDrop: Seq[String] = Nil,
           rightKeep: Seq[String] = Nil, rightDrop: Seq[String] = Nil,
           broadcastSide: Option[String] = None): DataFrame = {
    if (!Seq("inner", "left", "right", "outer").contains(joinType))
      err("join", s"`join_type` must be one of [inner, left, right, outer], not `$joinType`")
    if (leftKeys.size != rightKeys.size) err("join", "left and right key counts differ")
    if (!broadcastSide.forall(Set("left", "right").contains))
      err("join", s"`broadcast` must be `left` or `right`, not `${broadcastSide.get}`")

    def prune(df: DataFrame, keep: Seq[String], drop: Seq[String], keys: Seq[String], side: String): DataFrame =
      if (keep.nonEmpty) {
        keep.foreach(c => if (!df.columns.contains(c)) err("join", s"columns in `${side}_keep_columns` are not defined in the dataset"))
        // preserve original column order for determinism (reference uses set union)
        val wanted = (keep ++ keys).toSet
        df.select(df.columns.filter(wanted.contains).map(col).toIndexedSeq: _*)
      } else if (drop.nonEmpty) {
        if (drop.exists(keys.contains)) err("join", s"you may not `${side}_drop_columns` that are part of the `${side}_key(s)`")
        df.drop(drop: _*)
      } else df

    // `broadcast: left|right` declares which side is the small dimension:
    // at 100 TB the planner can't always see through a transformed input's
    // size, and a missed broadcast turns a map-side hash join into a full
    // sort-merge shuffle of the fact table. The hint survives pruning and
    // applies to every merge in an N-way join.
    val l0 = prune(left, leftKeep, leftDrop, leftKeys, "left")
    val lh = if (broadcastSide.contains("left"))
      org.apache.spark.sql.functions.broadcast(l0) else l0
    rights.foldLeft(lh) { (acc, right0) =>
      val right0p = prune(right0, rightKeep, rightDrop, rightKeys, "right")
      val right = if (broadcastSide.contains("right"))
        org.apache.spark.sql.functions.broadcast(right0p) else right0p
      joinPandas(acc, right, joinType, leftKeys, rightKeys)
    }
  }

  /** Constant null replacement (pandas `fillna`): per-column values, each
    * cast to its column's type (ANSI — a malformed replacement raises at
    * plan time on literals, never silently nulls back). Narrow projection. */
  def fillNa(df: DataFrame, values: Seq[(String, String)]): DataFrame = {
    if (values.isEmpty) err("fill_na", "`columns` must not be empty")
    values.foldLeft(df) { case (d, (c, v)) =>
      if (!d.columns.contains(c)) err("fill_na", s"column `$c` not defined")
      d.withColumn(c, coalesce(col(c), lit(v).cast(d.schema(c).dataType)))
    }
  }

  /** Drop rows with nulls (pandas `dropna`): `how = any` drops a row when
    * ANY of the named columns (default: all columns) is null; `how = all`
    * only when EVERY one is. Narrow filter, no shuffle. */
  def dropNa(df: DataFrame, columns: Seq[String], how: String = "any"): DataFrame = {
    if (!Seq("any", "all").contains(how))
      err("drop_na", s"`how` must be any/all, not `$how`")
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    cols.foreach(c => if (!df.columns.contains(c)) err("drop_na", s"column `$c` not defined"))
    val conds = cols.map(col(_).isNotNull)
    df.filter(if (how == "any") conds.reduce(_ && _) else conds.reduce(_ || _))
  }

  /** One row per ARRAY element (pandas `explode` over real array columns —
    * the typed sibling of `flatten`, which handles delimiter-wrapped
    * strings): the exploded value replaces the array column unless
    * `newColumn` names a fresh one; `positionColumn` adds the 0-based
    * element ordinal (posexplode); `keepEmpty` emits a null row for
    * empty/null arrays (explode_outer) instead of dropping them. Pure
    * generator in the scan stage — no shuffle at any scale. */
  def explodeColumn(df: DataFrame, column: String, newColumn: String = "",
                    positionColumn: Option[String] = None,
                    keepEmpty: Boolean = false): DataFrame = {
    if (!df.columns.contains(column)) err("explode_column", s"column `$column` not defined")
    df.schema(column).dataType match {
      case _: org.apache.spark.sql.types.ArrayType => ()
      case other => err("explode_column",
        s"column `$column` must be an array, got ${other.catalogString} " +
          "(use `flatten` for delimiter-wrapped strings)")
    }
    val out = if (newColumn.nonEmpty) newColumn else column
    val tmp = "__graft_explode__"
    val gen = (positionColumn, keepEmpty) match {
      case (Some(p), false) => posexplode(col(column)).as(Seq(p, tmp))
      case (Some(p), true) => posexplode_outer(col(column)).as(Seq(p, tmp))
      case (None, false) => explode(col(column)).as(tmp)
      case (None, true) => explode_outer(col(column)).as(tmp)
    }
    // the exploded value (and ordinal) take the consumed column's position
    // when replacing; with new_column they append after the kept columns
    val selects: Seq[Column] = df.columns.toSeq.flatMap {
      case `column` if out == column => Seq(gen)
      case c => Seq(col(c))
    } ++ (if (out != column) Seq(gen) else Nil)
    df.select(selects: _*).withColumnRenamed(tmp, out)
  }

  /** Typed casts for the all-string model's exit ramp: the reference's
    * pipelines stay strings end-to-end, but a parquet/orc/avro destination
    * (or a numeric downstream op) wants real types. ANSI semantics —
    * Spark 4's default — make a malformed value RAISE (the group_by tier's
    * pd.to_numeric(errors='raise') contract) instead of silently nulling.
    * Types are any DDL-parseable Spark type (`bigint`, `double`, `date`,
    * `timestamp`, `decimal(12,2)`, ...). Pure narrow projection. */
  def castColumns(df: DataFrame, casts: Seq[(String, String)]): DataFrame = {
    if (casts.isEmpty) err("cast_columns", "`columns` must not be empty")
    casts.foldLeft(df) { case (d, (c, t)) =>
      if (!d.columns.contains(c)) err("cast_columns", s"column `$c` not defined")
      val dt = try org.apache.spark.sql.types.DataType.fromDDL(t) catch {
        case e: Exception =>
          err("cast_columns", s"invalid type `$t` for column `$c`: ${e.getMessage}")
      }
      d.withColumn(c, col(c).cast(dt))
    }
  }

  /** Exact row subtraction — the blocklist/holdout shape. With `keys`,
    * each source acts as a key blocklist via a LEFT ANTI join (duplicates
    * on the left survive; only the key columns of the source are read, so
    * column pruning reaches its scan). Without keys, SQL EXCEPT ALL
    * multiset semantics over identical schemas. Both are single-shuffle
    * hash joins; a small blocklist broadcasts under AQE as usual. */
  def subtractRows(df: DataFrame, others: Seq[DataFrame], keys: Seq[String]): DataFrame =
    setOp("subtract_rows", df, others, keys, "left_anti", _ exceptAll _)

  /** Exact row intersection: keyed LEFT SEMI (keep rows whose key appears
    * in EVERY source) or keyless INTERSECT ALL. */
  def intersectRows(df: DataFrame, others: Seq[DataFrame], keys: Seq[String]): DataFrame =
    setOp("intersect_rows", df, others, keys, "left_semi", _ intersectAll _)

  private def setOp(op: String, df: DataFrame, others: Seq[DataFrame], keys: Seq[String],
                    joinType: String, whole: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    if (others.isEmpty) err(op, "`sources` must name at least one frame")
    if (keys.nonEmpty) {
      keys.foreach(k => if (!df.columns.contains(k)) err(op, s"key column `$k` not in the dataset"))
      others.foldLeft(df) { (acc, o) =>
        keys.foreach(k => if (!o.columns.contains(k)) err(op, s"key column `$k` not in a source frame"))
        acc.join(o.select(keys.map(col): _*), keys, joinType)
      }
    } else others.foldLeft(df) { (acc, o) =>
      if (acc.columns.toSeq != o.columns.toSeq)
        err(op, s"without `keys`, schemas must match: [${acc.columns.mkString(", ")}] vs " +
          s"[${o.columns.mkString(", ")}]")
      whole(acc, o)
    }
  }

  /** One pandas-semantics merge. Right-side key columns are renamed to
    * unique temp names before the join so every column name in the joined
    * frame is distinct — plain-name resolution then works even when both
    * sides share lineage (a self-join, e.g. two branches of one source),
    * where `df("col")` attribute resolution is ambiguous. */
  def joinPandas(left: DataFrame, right: DataFrame, joinType: String,
                 leftKeys: Seq[String], rightKeys: Seq[String]): DataFrame = {
    val keyPairs = leftKeys.zip(rightKeys)
    val sameName = keyPairs.filter { case (a, b) => a == b }.map(_._1).toSet
    // non-key collisions → _x/_y, as pandas suffixes them
    val collisions = (left.columns.toSet intersect right.columns.toSet) -- sameName
    val l = collisions.foldLeft(left)((d, c) => d.withColumnRenamed(c, c + "_x"))
    val r0 = collisions.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + "_y"))
    val lk = leftKeys.map(k => if (collisions.contains(k)) k + "_x" else k)
    val rk0 = rightKeys.map(k => if (collisions.contains(k)) k + "_y" else k)

    // rename right keys colliding with left names to unique temp names
    def tmp(k: String): String = s"__graft_rk_${k}__"
    val needsTmp = rk0.filter(l.columns.contains).toSet
    val r = needsTmp.foldLeft(r0)((d, k) => d.withColumnRenamed(k, tmp(k)))
    val rk = rk0.map(k => if (needsTmp.contains(k)) tmp(k) else k)

    val cond = lk.zip(rk).map { case (a, b) => col(a) === col(b) }.reduce(_ && _)
    val joined = l.join(r, cond, joinType)
    // select: left cols (same-name keys coalesced over both sides, covering
    // right/outer rows), then right cols minus the same-name keys
    val leftCols = l.columns.map { c =>
      if (sameName.contains(c)) coalesce(col(c), col(tmp(c))).as(c) else col(c)
    }
    val rightCols = r.columns.filterNot(c => rk.contains(c) && sameName.contains(rightKeys(rk.indexOf(c)))).map(col)
    val out = joined.select((leftCols ++ rightCols).toIndexedSeq: _*)
    // a (rare) tmp-renamed key that is not a merged same-name key keeps its
    // original name in the output
    needsTmp.filterNot(sameName).foldLeft(out)((d, k) => d.withColumnRenamed(tmp(k), k))
  }

  /** union (dataframe.py:144-189): N-way concat; errors when column sets
    * differ unless fill_missing_columns. */
  def union(first: DataFrame, others: Seq[DataFrame], fillMissingColumns: Boolean = false): DataFrame =
    others.foldLeft(first) { (acc, other) =>
      if (!fillMissingColumns && acc.columns.toSet != other.columns.toSet)
        err("union", s"dataframes to union do not share the same columns (use fill_missing_columns)")
      acc.unionByName(other, allowMissingColumns = fillMissingColumns)
    }

  /** melt (dataframe.py:251-304): wide→long unpivot. */
  def melt(df: DataFrame, idVars: Seq[String], valueVars: Seq[String] = Nil,
           varName: String = "melt_variable", valueName: String = "melt_value"): DataFrame = {
    val values = if (valueVars.nonEmpty) valueVars else df.columns.filterNot(idVars.contains).toSeq
    df.unpivot(idVars.map(col).toArray, values.map(col).toArray, varName, valueName)
  }

  /** pivot (dataframe.py:306-411): long→wide with aggfunc=first; the
    * reference pre-checks (rows_by+cols_by) uniqueness and errors telling the
    * user to group_by first — we keep that contract. */
  def pivot(df: DataFrame, rowsBy: Seq[String], colsBy: String, values: String,
            checkUnique: Boolean = true, pivotValues: Option[Seq[Any]] = None): DataFrame = {
    (rowsBy :+ colsBy :+ values).foreach(c => if (!df.columns.contains(c)) err("pivot", s"column `$c` not defined"))
    val vals: Seq[Any] = pivotValues.getOrElse {
      // One job serves both the reference's uniqueness pre-check
      // (dataframe.py pivot) and Spark's pivot-values discovery: aggregate
      // (rowsBy+colsBy) counts, then fold to (colsBy value, max count) —
      // ordered like Spark's own discovery so column order is unchanged.
      // Passing explicit values below then skips the built-in discovery job
      // (3 jobs → 2; with `pivot_values` configured, 1).
      val summary = df.groupBy((rowsBy :+ colsBy).map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .groupBy(col(colsBy)).agg(max(col("__n")).as("__m"))
        .orderBy(col(colsBy))
        .collect()
      if (checkUnique && summary.exists(_.getLong(1) > 1))
        err("pivot", "combinations of `rows_by` + `cols_by` are not unique; use group_by to aggregate first")
      summary.map(_.get(0)).toSeq
    }
    df.groupBy(rowsBy.map(col): _*).pivot(colsBy, vals).agg(first(col(values)))
  }

  // ========================================================== aggregations

  /** group_by (groupby.py:46-174): `create_columns: {name: "func(col,sep)"}`.
    * The reference runs one groupby().apply per aggregate and merges the
    * results; here the whole thing is a single groupBy().agg — one shuffle
    * with map-side partial aggregation regardless of aggregate count. */
  def groupBy(df: DataFrame, groupByColumns: Seq[String], createColumns: Seq[(String, String)],
              grouping: String = "groups"): DataFrame = {
    groupByColumns.foreach(c => if (!df.columns.contains(c)) err("group_by", s"group-by column `$c` not in the dataset"))
    val aggExprs = createColumns.map { case (name, funcSpec) => parseAgg(funcSpec, df.columns.toSeq).as(name) }
    if (aggExprs.isEmpty) err("group_by", "create_columns must not be empty")
    // `grouping: rollup|cube` switches to grouping-set aggregation (subtotal
    // levels appear with NULL keys, SQL GROUP BY ROLLUP/CUBE semantics) —
    // still ONE shuffle: Spark expands the grouping sets map-side, so the
    // partial-aggregation property is identical to a plain groupBy.
    val grouped = grouping match {
      case "groups" => df.groupBy(groupByColumns.map(col): _*)
      case "rollup" => df.rollup(groupByColumns.map(col): _*)
      case "cube" => df.cube(groupByColumns.map(col): _*)
      case other => err("group_by", s"invalid grouping `$other` (groups/rollup/cube)")
    }
    grouped.agg(aggExprs.head, aggExprs.tail: _*)
    // NB the reference drops size-0 groups (groupby.py:137-138); Spark's
    // groupBy never emits empty groups, so no filter is needed.
  }

  /** Parse the reference's `func(col,sep)` aggregate mini-language
    * (groupby.py:95-98 regex) into a Column aggregate. Numeric aggregates
    * coerce with cast-to-double; under Spark 4 ANSI mode a malformed numeric
    * string raises — exactly the reference's pd.to_numeric(errors='raise')
    * contract. Nulls flow through (pd.to_numeric(NaN) → NaN), which is where
    * mean = sum/group-size differs from avg = sum/non-null-count
    * (groupby.py:155). */
  def parseAgg(spec: String, columns: Seq[String]): Column = {
    val m = "([A-Za-z0-9_]*)\\(([A-Za-z0-9_]*)?,?(.*)?\\)".r.findFirstMatchIn(spec)
      .getOrElse(err("group_by", s"cannot parse aggregate `$spec`"))
    val (aggType, c, sep) = (m.group(1), Option(m.group(2)).getOrElse(""), Option(m.group(3)).getOrElse(""))
    val needsCol = Set("agg", "aggregate", "max", "maximum", "min", "minimum", "sum",
      "mean", "avg", "std", "stdev", "stddev", "var", "variance",
      "str_min", "str_minimum", "str_max", "str_maximum", "json_array_agg",
      "median", "percentile", "approx_percentile", "approx_distinct")
    if (needsCol.contains(aggType)) {
      if (c.isEmpty) err("group_by", s"aggregation function `$aggType`(column) missing required column")
      if (!columns.contains(c)) err("group_by", s"aggregation function `$aggType`($c) refers to a column $c which does not exist")
    }
    val num = col(c).cast(DoubleType)
    aggType match {
      case "agg" | "aggregate" => concat_ws(sep, collect_list(col(c).cast(StringType)))
      case "json_array_agg" =>
        if (sep == "str") to_json(collect_list(col(c).cast(StringType)))
        else concat(lit("["), concat_ws(",", collect_list(col(c).cast(StringType))), lit("]"))
      case "count" | "size" => count(lit(1))
      case "min" | "minimum" => min(num)
      case "max" | "maximum" => max(num)
      case "str_min" | "str_minimum" => min(col(c).cast(StringType))
      case "str_max" | "str_maximum" => max(col(c).cast(StringType))
      case "sum" => sum(num)
      case "mean" | "avg" => sum(num) / count(lit(1))
      case "std" | "stdev" | "stddev" => stddev_samp(num)
      case "var" | "variance" => var_samp(num)
      // engine extensions beyond the reference's mapping: quantiles.
      // EXACT median/percentile use SQL percentile_cont interpolation
      // (matches DuckDB quantile_cont) — exact quantiles buffer each
      // group's values, the right trade for human-scale group counts;
      // at 100 TB with huge groups use `approx_percentile(col,p)`
      // (Spark's Greenwald-Khanna sketch: bounded memory per group,
      // deterministic for a given dataset, ±1e-4 relative rank error).
      // The fraction rides the separator slot of the `func(col,sep)`
      // grammar.
      // built through the functions API (not SQL-string interpolation) so
      // column names needing backtick quoting resolve like every other
      // aggregate here
      case "median" => percentile(num, lit(0.5))
      case "percentile" | "approx_percentile" =>
        val p = try sep.trim.toDouble catch {
          case _: NumberFormatException =>
            err("group_by", s"$aggType($c,$sep): the separator slot must be a fraction in [0,1]")
        }
        if (p < 0 || p > 1)
          err("group_by", s"$aggType($c,$sep): fraction must be in [0,1]")
        if (aggType == "percentile") percentile(num, lit(p))
        else approx_percentile(num, lit(p), lit(10000))
      // engine extension: HLL distinct estimate (graft sketch tier). The
      // separator slot carries the precision p (registers = 2^p; relative
      // error ~1.04/sqrt(2^p)); requires GraftFunctions registration, which
      // Engine.applyOperation performs before dispatching. Keys hash as-is
      // (no numeric coercion — strings and integers are both valid).
      case "approx_distinct" =>
        val p = if (sep.trim.isEmpty) 12 else try sep.trim.toInt catch {
          case _: NumberFormatException =>
            err("group_by", s"approx_distinct($c,$sep): the separator slot must be an integer precision in [4,16]")
        }
        if (p < 4 || p > 16)
          err("group_by", s"approx_distinct($c,$sep): precision must be in [4,16]")
        call_function("hll_estimate", call_function("hll_sketch", col(c), lit(p)))
      case other => err("group_by", s"invalid aggregation function `$other` in `group_by` operation")
    }
  }

  /** group_by_with_rank (groupby.py:12-43): 0-based cumulative count within
    * groups, original rows preserved. The reference's order is dask encounter
    * order (nondeterministic under repartition); we order by an explicit
    * ordinal when given, else by all non-group columns for stability. */
  def groupByWithRank(df: DataFrame, groupByColumns: Seq[String], rankColumn: String,
                      orderBy: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    groupByColumns.foreach(c => if (!df.columns.contains(c)) err("group_by_with_rank", s"column `$c` not in the dataset"))
    val ord = if (orderBy.nonEmpty) orderBy else df.columns.filterNot(groupByColumns.contains).toSeq
    val w = Window.partitionBy(groupByColumns.map(col): _*).orderBy(ord.map(col): _*)
    df.withColumn(rankColumn, row_number().over(w) - 1)
  }

  // ================================================== node-level features

  /** `debug` operation (operations/dataframe.py:192-248): print a head/tail
    * sample, describe() stats, or the column list — optionally column-subset
    * (keep/skip) and transposed — and pass the data through unchanged.
    * head/tail move only `rows` rows to the driver; describe aggregates
    * distributed then prints the tiny stats frame. */
  def debug(df: DataFrame, func: String = "head", rows: Int = 5,
            skipColumns: Seq[String] = Nil, keepColumns: Option[Seq[String]] = None,
            transpose: Boolean = false, nodeName: String = "debug"): DataFrame = {
    if (!Seq("head", "tail", "describe", "columns").contains(func))
      err("debug", s"debug type `$func` not defined")
    val rowsStr = if (func == "head" || func == "tail") s" $rows" else ""
    val transposeStr = if (transpose) ", Transpose" else ""
    println(s"debug ($func$rowsStr$transposeStr) for $nodeName:")
    if (func == "columns") { println(df.columns.mkString("[", ", ", "]")); return df }

    val keep = keepColumns.filter(_.nonEmpty).getOrElse(df.columns.toSeq)
    val selected = df.columns.filter(c => keep.contains(c) && !skipColumns.contains(c)).toSeq
    val sub = df.select(selected.map(col): _*)
    val sample: Array[org.apache.spark.sql.Row] = func match {
      case "head" => sub.take(rows)
      case "tail" => sub.tail(rows)
      case _ => sub.describe().collect() // describe: summary column first
    }
    val header: Seq[String] =
      if (func == "describe") "summary" +: selected else selected
    val cells: Seq[Seq[String]] =
      sample.toSeq.map(r => (0 until r.length).map(i => Option(r.get(i)).map(_.toString).getOrElse("")))
    val table: Seq[Seq[String]] =
      if (transpose)
        ("column" +: cells.indices.map(i => s"row$i")) +:
          header.indices.map(c => header(c) +: cells.map(_(c)))
      else header +: cells
    val widths = table.transpose.map(_.map(_.length).max)
    table.foreach { r =>
      println(r.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString(" ").stripTrailing())
    }
    df
  }

  /** `expect:` assertions (nodes/node.py:165-194): per-row Jinja boolean;
    * the run fails if any row renders falsy. */
  def expect(df: DataFrame, expectations: Seq[String], nodeName: String = "node"): Unit =
    expectations.foreach { e =>
      val pred = RowTemplates.templateColumn(df, "{% if " + e + " %}True{% else %}False{% endif %}")
      val bad = df.filter(pred === lit("False")).count()
      if (bad > 0)
        throw new IllegalStateException(s"Expectation failed on $nodeName: `$e` ($bad failing rows)")
    }

  /** require_rows (node.py:124-143). */
  def requireRows(df: DataFrame, n: Long, nodeName: String = "node"): Unit = {
    val c = df.count()
    if (c < n) throw new IllegalStateException(s"$nodeName: requires at least $n rows but has $c")
  }
}

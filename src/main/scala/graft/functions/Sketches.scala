package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Frame-level faces of the mergeable sketch tier (aggregates in
 * [[graft.expressions.SketchExpressions]], kernels + error contracts in
 * [[SketchKernels]]). These are the YAML-dispatchable shapes:
 *
 *  - approxDistinct / mergeDistinct — per-group HyperLogLog cardinality,
 *    and the re-aggregation path that merges PERSISTED sketches (yesterday's
 *    parquet column + today's) without touching raw rows.
 *  - heavyHitters — sketch-guided exact frequent keys: one Count-Min pass
 *    collapses to a single ~32 KB sketch (bounded driver collect), which
 *    then PRUNES the second pass to candidate-key rows before the exact
 *    group-count. At 100 TB with billions of distinct keys this is the
 *    difference between shuffling every key's partial counts and shuffling
 *    only the heavy candidates' — CMS never under-counts, so no true heavy
 *    hitter is pruned and the output is EXACTLY `HAVING count >= minCount`.
 *  - quantileSketch / mergeQuantiles — per-group log-histogram quantiles
 *    over non-negative integers (relative value error < 2^-subBits).
 */
object Sketches {

  private def registered(df: DataFrame): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    df
  }

  private def grouped(df: DataFrame, groupCols: Seq[String]) =
    df.groupBy(groupCols.map(col): _*)

  /** Per-group HLL distinct estimate; optionally also keep the binary sketch
    * (the artifact a pipeline persists for later merging). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String,
                     precision: Int = 12, estimateCol: String = "approx_distinct",
                     sketchCol: Option[String] = None): DataFrame = {
    val d = registered(df)
    val sk = call_function("hll_sketch", col(keyCol), lit(precision))
    val agg = grouped(d, groupCols).agg(sk.as("__sk__"))
    val withEst = agg.withColumn(estimateCol, call_function("hll_estimate", col("__sk__")))
    sketchCol match {
      case Some(s) => withEst.withColumnRenamed("__sk__", s)
      case None => withEst.drop("__sk__")
    }
  }

  /** Merge persisted HLL sketches up to a coarser grouping and estimate.
    * Register-wise max is associative/commutative/idempotent, so any
    * partition of the original rows into sketches gives the same answer. */
  def mergeDistinct(df: DataFrame, groupCols: Seq[String], sketchCol: String,
                    estimateCol: String = "approx_distinct",
                    keepSketchCol: Option[String] = None): DataFrame = {
    val d = registered(df)
    val agg = grouped(d, groupCols).agg(call_function("hll_merge", col(sketchCol)).as("__sk__"))
    val withEst = agg.withColumn(estimateCol, call_function("hll_estimate", col("__sk__")))
    keepSketchCol match {
      case Some(s) => withEst.withColumnRenamed("__sk__", s)
      case None => withEst.drop("__sk__")
    }
  }

  /** Exact keys with frequency >= minCount, sketch-pruned.
    *
    * Pass 1 builds ONE Count-Min sketch (map-side partials merge to
    * depth*width longs — a bounded, documented driver collect of ~32 KB at
    * the defaults). Pass 2 filters rows to keys whose CMS upper bound
    * reaches minCount (narrow scan, no shuffle), then exact-counts only
    * those. Because CMS estimates never under-count, the candidate set is a
    * superset of the true heavy hitters, and the final HAVING makes the
    * result exactly `SELECT key, count(*) ... HAVING count(*) >= minCount`. */
  def heavyHitters(df: DataFrame, keyCol: String, minCount: Long,
                   depth: Int = 4, width: Int = 8192,
                   countCol: String = "frequency"): DataFrame = {
    require(minCount >= 1, s"heavy_hitters: min_count must be >= 1, got $minCount")
    val d = registered(df)
    val skRow = d.agg(call_function("cms_sketch", col(keyCol), lit(depth), lit(width)).as("sk"))
      .head() // bounded: one serialized sketch, 3 + depth*width*8 bytes
    val sketch = skRow.getAs[Array[Byte]]("sk")
    // ship the sketch as a torrent broadcast, NOT a Literal: a prune-grade
    // sketch (2^20 buckets = 32 MB) embedded in the plan rides in every
    // task binary; the broadcast handle costs bytes once per executor
    val bc = d.sparkSession.sparkContext.broadcast(sketch)
    val fname = s"graft_cms_query_bc_${bc.id}"
    graft.expressions.GraftFunctions.registerIfAbsent(d.sparkSession, fname, {
      case Seq(k) => graft.expressions.CmsQueryBroadcast(k, bc)
      case other => throw new IllegalArgumentException(
        s"$fname takes 1 argument, got ${other.size}")
    })
    d.filter(call_function(fname, col(keyCol)) >= lit(minCount))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as(countCol))
      .filter(col(countCol) >= lit(minCount))
  }

  /** Build a Bloom membership filter over `seen`'s key column (one bounded
    * collect: 2^logBits bits), then keep or drop the rows of `df` whose key
    * probes positive. `keep = false` (the seen-list/blocklist shape) is
    * exact-with-collateral: false positives DROP ~fpRate extra rows, never
    * leak a seen row through. `keep = true` is a superset filter (false
    * positives keep strays) — the shape for sketch-guided pre-filters that
    * a later exact join tightens. The filter ships as a torrent broadcast
    * behind [[graft.expressions.BloomContainsBroadcast]]. */
  def bloomFilterRows(df: DataFrame, keyCol: String, seen: DataFrame, seenCol: String,
                      logBits: Int = 20, k: Int = 5, keep: Boolean = false): DataFrame = {
    val d = registered(df)
    val sketch = registered(seen)
      .agg(call_function("bloom_sketch", col(seenCol), lit(logBits), lit(k)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val bc = d.sparkSession.sparkContext.broadcast(sketch)
    val fname = s"graft_bloom_contains_bc_${bc.id}"
    graft.expressions.GraftFunctions.registerIfAbsent(d.sparkSession, fname, {
      case Seq(key) => graft.expressions.BloomContainsBroadcast(key, bc)
      case other => throw new IllegalArgumentException(
        s"$fname takes 1 argument, got ${other.size}")
    })
    val probe = call_function(fname, col(keyCol))
    if (keep) d.filter(probe) else d.filter(!probe)
  }

  /** One-row set-cardinality algebra over two key columns via same-k KMV
    * sketches: (est_a, est_b, est_union, est_intersect). Each side
    * collapses to k hashes before anything crosses the wire — comparing
    * two 100 TB corpora's key overlap costs two narrow scans and a
    * constant-size merge, no join. */
  def setOverlap(dfA: DataFrame, colA: String, dfB: DataFrame, colB: String,
                 k: Int = 256): DataFrame = {
    val a = registered(dfA)
      .agg(call_function("kmv_sketch", col(colA), lit(k)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val b = registered(dfB)
      .agg(call_function("kmv_sketch", col(colB), lit(k)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val spark = dfA.sparkSession
    import spark.implicits._
    val merged = Seq(a, b).toDF("sk")
      .agg(call_function("kmv_merge", col("sk")).as("u"))
    merged.select(
      call_function("kmv_estimate", lit(a)).as("est_a"),
      call_function("kmv_estimate", lit(b)).as("est_b"),
      call_function("kmv_estimate", col("u")).as("est_union"),
      call_function("kmv_intersect", lit(a), lit(b)).as("est_intersect"))
  }

  private def fracName(f: Double): String =
    // Whole-number fractions must not collide with their decimal twins:
    // stripTrailingZeros renders both 1.0 and 0.1 as "q1", so sketch_quantile
    // with [0.1, 1.0] would silently overwrite p10 with the max. Whole
    // fractions render as percentages (1.0 -> q100) which cannot collide
    // with the "0."-stripped decimal forms (those never start with "0").
    if (f >= 1.0 && f == math.floor(f)) "q" + (f * 100).toLong
    else "q" + BigDecimal(f).bigDecimal.stripTrailingZeros.toPlainString.replace("0.", "").replace(".", "_")

  /** Per-group quantiles from a log-histogram sketch over a non-negative
    * integral column. Emits one `q<frac>` column per fraction (q5 for 0.5,
    * q99 for 0.99 — the leading "0." is dropped), each the lower bound of
    * the rank-q bucket. Optionally keeps the sketch for later merging. */
  def quantileSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     fractions: Seq[Double], subBits: Int = 5,
                     sketchCol: Option[String] = None): DataFrame = {
    require(fractions.nonEmpty, "sketch_quantile: fractions must not be empty")
    val d = registered(df)
    val agg = grouped(d, groupCols)
      .agg(call_function("qhist_sketch", col(valueCol), lit(subBits)).as("__sk__"))
    finishQuantiles(agg, fractions, sketchCol)
  }

  /** Per-group quantile-threshold ROW FILTER — the Gopher-style "keep
    * documents above the per-domain median quality" corpus cut as one op.
    * The threshold is the log-histogram sketch quantile (mergeable,
    * bounded memory, rel err < 2^-subBits, and EXACTLY reproducible — the
    * q_sketch_quantile oracle machinery), computed over integer units
    * `round(value · scale)` (scale=1 for already-integral columns, the
    * fixed-point discipline everywhere else). Group cardinality bounds the
    * threshold frame, which re-joins as a broadcast-sized dimension; rows
    * with null values drop. `mode`: keep_above (u ≥ q) / keep_below
    * (u ≤ q). Without groupCols the single global threshold rides a
    * 1-row collect (the n=count() driver-bounded class). Values must be
    * NON-NEGATIVE after scaling (the log-histogram domain — a negative
    * value raises diagnosably inside the sketch); shift-or-clamp signed
    * columns first. */
  def quantileFilter(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     fraction: Double, mode: String = "keep_above",
                     scale: Long = 1L, subBits: Int = 5): DataFrame = {
    require(mode == "keep_above" || mode == "keep_below",
      s"quantile_filter: mode must be keep_above/keep_below, not `$mode`")
    require(fraction > 0 && fraction <= 1, s"quantile_filter: fraction must be in (0,1], got $fraction")
    require(scale > 0, s"quantile_filter: scale must be positive, got $scale")
    (groupCols :+ valueCol).foreach(c => require(df.columns.contains(c),
      s"quantile_filter: column `$c` not defined"))
    val u = round(col(valueCol) * scale).cast("long")
    val withU = df.withColumn("__qf_u__", u)
    val qCol = "q" + BigDecimal(fraction).bigDecimal.stripTrailingZeros
      .toPlainString.replace("0.", "").replace(".", "_")
    val keep: (Column, Column) => Column =
      if (mode == "keep_above") _ >= _ else _ <= _
    val out =
      if (groupCols.isEmpty) {
        val thr = quantileSketch(withU, Nil, "__qf_u__", Seq(fraction), subBits)
          .head().getAs[Long](qCol) // ONE row — driver-bounded by construction
        withU.filter(keep(col("__qf_u__"), lit(thr)))
      } else {
        val thrs = quantileSketch(withU, groupCols, "__qf_u__", Seq(fraction), subBits)
          .select((groupCols.map(col) :+ col(qCol).as("__qf_thr__")): _*)
        withU.join(broadcast(thrs), groupCols)
          .filter(keep(col("__qf_u__"), col("__qf_thr__")))
          .drop("__qf_thr__")
      }
    out.drop("__qf_u__")
  }

  /** Merge persisted quantile sketches to a coarser grouping, then report. */
  def mergeQuantiles(df: DataFrame, groupCols: Seq[String], sketchColIn: String,
                     fractions: Seq[Double],
                     sketchCol: Option[String] = None): DataFrame = {
    require(fractions.nonEmpty, "sketch_quantile merge: fractions must not be empty")
    val d = registered(df)
    val agg = grouped(d, groupCols)
      .agg(call_function("qhist_merge", col(sketchColIn)).as("__sk__"))
    finishQuantiles(agg, fractions, sketchCol)
  }

  private def finishQuantiles(agg: DataFrame, fractions: Seq[Double],
                              sketchCol: Option[String]): DataFrame = {
    val names = fractions.map(fracName)
    require(names.distinct.size == names.size,
      s"sketch_quantile: fractions ${fractions.mkString("[", ", ", "]")} generate " +
        s"duplicate column names ${names.mkString("[", ", ", "]")}")
    val withQs = fractions.foldLeft(agg) { (acc, f) =>
      acc.withColumn(fracName(f), call_function("qhist_quantile", col("__sk__"), lit(f)))
    }
    sketchCol match {
      case Some(s) => withQs.withColumnRenamed("__sk__", s)
      case None => withQs.drop("__sk__")
    }
  }
}

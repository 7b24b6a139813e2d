package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation join for hot keys. Spark's AQE rewrites skewed
 * sort-merge joins at runtime, but only after the skewed shuffle has been
 * written; salting removes the hot-partition problem at the source and
 * also covers the shapes AQE skew-handling doesn't (e.g. when the skewed
 * side must stay deterministically partitioned for a downstream stage).
 *
 * The large side gets a deterministic salt in [0, buckets) hashed from the
 * full row (NOT from the join key — rows sharing a hot key must spread
 * across buckets); the small side is replicated `buckets` times. The join
 * key becomes (keys..., salt), so each hot key's rows land in `buckets`
 * different shuffle partitions, each holding a full copy of that key's
 * small-side rows. Semantics are identical to the plain join for inner /
 * left_outer / left_semi / left_anti (the small side is the replicated
 * one, so right-side multiplicity is unchanged per salted partition);
 * right/full joins would double-count unmatched small rows and are
 * rejected.
 */
object Joins {

  private val allowed = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti, not `$joinType` " +
        "(replicating the small side would duplicate unmatched right rows)")
    val salt = "__graft_salt__"
    val l = large.withColumn(salt,
      pmod(xxhash64(struct(large.columns.map(col).toIndexedSeq: _*)), lit(saltBuckets)))
    val s = small.withColumn(salt,
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)).toIndexedSeq: _*)))
    l.join(s, (keys :+ salt).toIndexedSeq, joinType).drop(salt)
  }

  /** As-of (point-in-time) join: for each left row, the LATEST right row of
    * the same key with `right.ts <= left.ts` (and, with `toleranceSecs`,
    * within that many seconds) — the time-series enrichment join Spark has
    * no operator for, expressed Spark-first as a union + per-key carry
    * instead of an O(rows × candidates) range join:
    *
    *   1. union the tagged sides (right rows sort BEFORE left rows at equal
    *      timestamps, so `<=` matches);
    *   2. ONE shuffle: `Window.partitionBy(key).orderBy(ts, tag)` carries
    *      `last(right value, ignoreNulls)` down the stream;
    *   3. keep left rows; null out carries older than the tolerance.
    *
    * Right-side (key, ts) ties are resolved BEFORE the union by keeping the
    * struct-max of the value columns — deterministic on any cluster.
    * Matched right columns arrive suffixed, plus `<tsCol><suffix>` (the
    * matched timestamp, null when no match).
    *
    * Scale shape: by default a key's whole history lands on one task (the
    * inherent as-of order dependency) — parallelism is across keys, the
    * natural cardinality of time-series data; no cross join, no range
    * explosion. For a PATHOLOGICAL key (one instrument with 10⁹ events)
    * pass `bucketSecs`: the carry then runs as a two-phase bucketed
    * prefix — per-(key, time-bucket) partial `last`s, a per-key window
    * over the BUCKET partials only (rows = occupied buckets, never
    * events), and bucket-local windows seeded with the carried-in value —
    * the same skeleton as Sampling.withHashPrefixSum, splitting the hot
    * key across as many tasks as it has buckets while computing the
    * identical result. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               valueCols: Seq[String], suffix: String = "_asof",
               toleranceSecs: Option[Double] = None,
               bucketSecs: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(valueCols.nonEmpty, "asofJoin: valueCols must be non-empty")
    require(bucketSecs.forall(_ > 0), "asofJoin: bucketSecs must be positive")
    val tag = "__asof_tag__"
    val bCol = "__asof_b__"
    val rTs = tsCol + suffix
    val rCols = valueCols.map(_ + suffix)
    // dedupe right per (key, ts): struct-max of the values, row-consistent
    val dedupedRight = right
      .groupBy(col(keyCol).as(keyCol), col(tsCol).as(rTs))
      .agg(max(struct(valueCols.map(col): _*)).as("__asof_v__"))
      .select(Seq(col(keyCol), col(rTs)) ++
        valueCols.zip(rCols).map { case (v, o) => col(s"__asof_v__.$v").as(o) }: _*)
    val probe = left.withColumn(tag, lit(1))
      .withColumn(rTs, lit(null).cast(dedupedRight.schema(rTs).dataType))
    val build = dedupedRight
      .withColumn(tsCol, col(rTs))
      .withColumn(tag, lit(0))
    val unioned = probe.unionByName(build, allowMissingColumns = true)

    val carried = bucketSecs match {
      case None =>
        val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tag).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        (rTs +: rCols).foldLeft(unioned) { (d, c) =>
          d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
        }
      case Some(width) =>
        // TIMESTAMP_NTZ has no direct double cast in Spark 4 — route it
        // through TIMESTAMP first (epoch seconds either way)
        val ntz = unioned.schema(tsCol).dataType ==
          org.apache.spark.sql.types.TimestampNTZType
        def bucketOf(ts: Column): Column = {
          val secs = if (ntz) ts.cast("timestamp").cast("double") else ts.cast("double")
          floor(secs / width).cast("long")
        }
        val bucketed = unioned.withColumn(bCol, bucketOf(col(tsCol)))
        // phase 1: the LAST right row per (key, bucket) — equal ts can't
        // straddle buckets, so the within-bucket max struct (ordered by
        // rTs first) is exactly the carry a later bucket needs
        val partials = build.withColumn(bCol, bucketOf(col(tsCol)))
          .groupBy(col(keyCol), col(bCol))
          .agg(max(struct(col(rTs) +: rCols.map(col): _*)).as("__asof_p__"))
        // phase 2: carry INTO each occupied bucket = last partial of any
        // STRICTLY EARLIER bucket; the window partitions by key over
        // bucket ordinals only — bounded by span/width, never by events
        val occupied = bucketed.select(col(keyCol), col(bCol)).distinct()
        val wB = Window.partitionBy(keyCol).orderBy(col(bCol).asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carryIn = occupied.join(partials, Seq(keyCol, bCol), "left")
          .withColumn("__asof_ci__",
            last(col("__asof_p__"), ignoreNulls = true).over(wB))
          .select(col(keyCol), col(bCol), col("__asof_ci__"))
        // phase 3: bucket-local carry, seeded with the carry-in
        val wL = Window.partitionBy(keyCol, bCol)
          .orderBy(col(tsCol).asc, col(tag).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val local = (rTs +: rCols).foldLeft(bucketed) { (d, c) =>
          d.withColumn(c, last(col(c), ignoreNulls = true).over(wL))
        }
        val seeded = local.join(carryIn, Seq(keyCol, bCol), "left")
        // a row's local carry wins when present; the choice is pinned to a
        // FLAG captured from the local rTs BEFORE overwrite, so ts/value
        // columns always come from the same side
        val withFlag = seeded.withColumn("__asof_lh__", col(rTs).isNotNull)
        val filled = (rTs +: rCols).foldLeft(withFlag) { (d, c) =>
          d.withColumn(c,
            when(col("__asof_lh__"), col(c)).otherwise(col(s"__asof_ci__.$c")))
        }
        filled.drop(bCol, "__asof_ci__", "__asof_lh__")
    }
    val matched = toleranceSecs match {
      case Some(tol) =>
        val inTol = col(rTs).isNotNull &&
          (col(tsCol).cast("double") - col(rTs).cast("double")) <= tol
        (rTs +: rCols).foldLeft(carried)((d, c) =>
          d.withColumn(c, when(inTol, col(c))))
      case None => carried
    }
    matched.filter(col(tag) === 1).drop(tag)
  }

  /** Range (interval) join: points against `[start, end)` intervals,
    * optionally keyed — the other classic join Spark lacks an operator
    * for. The naive expression is a non-equi join Catalyst can only run
    * as a broadcast-nested-loop / cartesian (O(points × intervals)); this
    * is the standard binning rewrite instead: every interval replicates to
    * the fixed-width bins it covers, a point carries its one bin, and the
    * join becomes a plain hash EQUI-join on (keys..., bin) with the exact
    * range predicate as a post-filter. Each matching (point, interval)
    * pair meets exactly once — in the point's own bin — so no dedup pass
    * is needed. Pick `binWidth` near the typical interval length: shuffle
    * volume is intervals × (span/binWidth + 1) + points.
    *
    * Bin ids use floor division computed in exact long arithmetic
    * (`(v - pmod(v, w)) div w`), correct for negative values and for
    * magnitudes past double's 2^53 (nanosecond epochs). Intervals with
    * `end <= start` are empty and dropped. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                pointCol: String, startCol: String, endCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, s"rangeJoin: binWidth must be positive, got $binWidth")
    // exact long floor-div through a shadow column: `(v - pmod(v, w)) div w`
    // (integral `div`, never the double `/` — nanosecond epochs overflow
    // double's 2^53 integer range)
    def withBin(df: DataFrame, src: org.apache.spark.sql.Column, out: String): DataFrame =
      df.withColumn("__rj_v__", src.cast("long"))
        .withColumn(out,
          expr(s"(__rj_v__ - pmod(__rj_v__, ${binWidth}L)) div ${binWidth}L"))
        .drop("__rj_v__")
    val p = withBin(points, col(pointCol), "__rj_b__")
    val iv = {
      val nonEmpty = intervals.filter(col(endCol).cast("long") > col(startCol).cast("long"))
      val lo = withBin(nonEmpty, col(startCol), "__rj_lo__")
      val hi = withBin(lo, col(endCol).cast("long") - 1, "__rj_hi__")
      hi.withColumn("__rj_b__", explode(sequence(col("__rj_lo__"), col("__rj_hi__"))))
        .drop("__rj_lo__", "__rj_hi__")
    }
    p.join(iv, (keys :+ "__rj_b__").toIndexedSeq)
      .filter(col(pointCol).cast("long") >= col(startCol).cast("long") &&
        col(pointCol).cast("long") < col(endCol).cast("long"))
      .drop("__rj_b__")
  }
}

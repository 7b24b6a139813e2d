package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering for multi-dimensional scan locality —
 * beyond-reference, the "lay 100 TB of parquet out so filters on EITHER
 * of two keys prune row groups" operator. Sorting by one column gives
 * min/max pruning on that column only; sorting by the interleaved-bit
 * Morton key gives every indexed dimension locality proportional to its
 * bit share, so a `WHERE a BETWEEN … AND b BETWEEN …` scan skips row
 * groups on both predicates.
 *
 * All arithmetic is integer-exact and partition-independent:
 *  - per-column buckets come from UNSIGNED fixed-point scaling
 *    (`divideUnsigned(v - min, ((max-min) >>> bits) + 1)`) — correct for
 *    the full signed Long range including `max - min` overflowing 2^63;
 *  - the key is a plain bit interleave of the buckets.
 * So the same (mins, maxs) always yield the same keys on any cluster —
 * the oracle reproduces them in HUGEINT SQL.
 *
 * Scale shape: [[zorderBy]] is one bounded min/max aggregation (2k longs
 * to the driver, k = column count) + a codegen'd key projection +
 * `repartitionByRange` on the key (Spark samples range bounds
 * distributedly) + partition-local sort. No shuffle beyond the one the
 * re-layout IS; the key computation fuses into whole-stage codegen.
 */
object ZorderKernels {

  /** Per-column quantization step so buckets land in [0, 2^bits):
    * unsigned `((max-min) >>> bits) + 1`. bits >= 1 keeps the +1 from
    * overflowing for any range. */
  def step(min: Long, max: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 62, s"zorder: bits per column must be in [1,62], got $bits")
    ((max - min) >>> bits) + 1L
  }

  /** Scatter `bucket`'s low `bits` bits to positions i, i+k, i+2k, … —
    * the interleave contribution of column i of k. */
  def spread(bucket: Long, bits: Int, k: Int, i: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((bucket >>> b) & 1L) << (b * k + i)
      b += 1
    }
    z
  }

  /** Full key for one row (parity target for the expression's codegen). */
  def zkey(vals: Array[Long], mins: Array[Long], steps: Array[Long], bits: Int): Long = {
    val k = vals.length
    var z = 0L
    var i = 0
    while (i < k) {
      z |= spread(java.lang.Long.divideUnsigned(vals(i) - mins(i), steps(i)), bits, k, i)
      i += 1
    }
    z
  }
}

object Zorder {

  /** Compute per-column [min, max] with one bounded aggregation (2k longs
    * to the driver — the same bounded-collect class as pivot's value
    * discovery). Null-only columns get [0, 0]. */
  def columnRanges(df: DataFrame, cols: Seq[String]): (Array[Long], Array[Long]) = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"__min_$c"), max(col(c).cast("long")).as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = cols.indices.map(i => if (row.isNullAt(2 * i)) 0L else row.getLong(2 * i)).toArray
    val maxs = cols.indices.map(i => if (row.isNullAt(2 * i + 1)) 0L else row.getLong(2 * i + 1)).toArray
    (mins, maxs)
  }

  /** Add the Morton key column for `cols` with the given per-column bit
    * width (k * bits <= 63). Ranges default to a one-pass min/max scan;
    * pass them explicitly to key a DELTA with the corpus's frozen grid
    * (the incremental-layout case). Null values bucket at the column
    * minimum. */
  def withZorderKey(df: DataFrame, cols: Seq[String], bits: Int = 8,
                    keyCol: String = "zkey",
                    ranges: Option[(Array[Long], Array[Long])] = None): DataFrame = {
    require(cols.nonEmpty, "zorder: need at least one column")
    require(cols.size * bits <= 63,
      s"zorder: ${cols.size} columns x $bits bits exceeds the 63-bit key")
    val (mins, maxs) = ranges.getOrElse(columnRanges(df, cols))
    val steps = mins.indices.map(i => ZorderKernels.step(mins(i), maxs(i), bits)).toArray
    val spark = df.sparkSession
    val fname = "graft_zorder_" + java.lang.Long.toHexString(
      mins.zip(maxs).foldLeft(bits.toLong * 31 + cols.size)((h, p) =>
        h * 1000003L + p._1 * 31 + p._2))
    graft.expressions.GraftFunctions.registerIfAbsent(spark, fname, {
      case children if children.size == cols.size =>
        graft.expressions.ZorderKey(children.toIndexedSeq, bits, mins, steps)
      case other => throw new IllegalArgumentException(
        s"$fname takes ${cols.size} arguments, got ${other.size}")
    })
    df.withColumn(keyCol, call_function(fname, cols.map(c => col(c).cast("long")): _*))
  }

  /** Re-layout: key, range-partition on the key, sort within partitions —
    * the write-side clustering pass a parquet corpus runs once so every
    * later multi-dimension filter scan prunes. */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 8,
               numPartitions: Option[Int] = None, keepKey: Boolean = false): DataFrame = {
    val keyed = withZorderKey(df, cols, bits)
    val parted = numPartitions match {
      case Some(n) => keyed.repartitionByRange(n, col("zkey"))
      case None => keyed.repartitionByRange(col("zkey"))
    }
    val sorted = parted.sortWithinPartitions("zkey")
    if (keepKey) sorted else sorted.drop("zkey")
  }
}

package graft.functions

import org.apache.spark.sql.DataFrame
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
}

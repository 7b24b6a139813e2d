package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Change-data-capture operators for snapshot maintenance — the "keep a
 * 100 TB corpus current against a daily change feed" tier (beyond-
 * reference; the reference engine is batch-only over static files).
 *
 * Two faces:
 *  - [[applyChanges]]: fold an (op, seq)-stamped changeset into a
 *    snapshot — the MERGE INTO shape (upsert + delete, latest change
 *    wins per key).
 *  - [[scd2]]: historize a change stream into validity intervals
 *    (valid_from / valid_to / is_current) — slowly-changing-dimension
 *    type 2.
 *
 * Scale design: applyChanges is ONE map-side-combinable aggregation over
 * the changeset (latest-per-key via `max(struct(...))` — partial
 * aggregation collapses each key's churn before the shuffle, so a feed
 * with hot keys ships one row per key per map task) followed by ONE
 * co-partitioned full-outer join against the snapshot; the aggregation
 * output is already hash-partitioned on the key, so only the snapshot
 * side shuffles. Nothing is collected. scd2 is a single per-key window
 * (the inherent SCD2 order dependency; parallelism is across keys, the
 * natural cardinality of a dimension feed) — the optional change-only
 * filter runs inside the SAME window partitioning, adding no exchange.
 */
object Cdc {

  /** Apply a changeset to a snapshot. `changes` must carry the snapshot's
    * columns plus `seqCol` (change version/timestamp — higher wins) and
    * `opCol` (values in `deleteValues`, case-insensitive, delete the key;
    * anything else upserts). For each key the LATEST change decides:
    * delete drops the row, upsert replaces/inserts it; keys untouched by
    * the feed pass through. Ties on `seqCol` break deterministically by
    * (op, attribute values) — identical duplicates are harmless, and a
    * same-seq delete+upsert resolves by descending struct order, not by
    * partition layout. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, keys: Seq[String],
                   seqCol: String, opCol: String,
                   deleteValues: Seq[String] = Seq("d", "delete")): DataFrame = {
    require(keys.nonEmpty, "apply_changes: key_columns must be non-empty")
    val attrs = snapshot.columns.filterNot(keys.contains).toSeq
    val missing = (keys ++ attrs :+ seqCol :+ opCol).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"apply_changes: changes frame is missing columns [${missing.mkString(", ")}]")
    val dels = deleteValues.map(_.toLowerCase)

    // latest change per key: max over struct(seq, op, attrs...) — struct
    // ordering is lexicographic, so seq dominates and the tail is a pure
    // deterministic tie-break. groupBy+max gets map-side partials (a hot
    // key's churn collapses before the shuffle), unlike a window rank.
    val pick = struct((col(seqCol) +: col(opCol) +: attrs.map(col)): _*)
    val latest = changes.groupBy(keys.map(col): _*).agg(max(pick).as("__c"))

    // co-partitioned full-outer join: `latest` is already hash-partitioned
    // on the keys from its aggregation, so only the snapshot shuffles
    val joined = snapshot.join(latest, keys, "full_outer")
    // a null op value counts as an upsert (coalesce guards the 3-valued
    // `isin` from silently dropping the row)
    val isDelete = col("__c").isNotNull &&
      coalesce(lower(col("__c").getField(opCol).cast("string")).isin(dels: _*), lit(false))
    joined
      .filter(!isDelete)
      .select((keys.map(col) ++ attrs.map { a =>
        when(col("__c").isNotNull, col("__c").getField(a))
          .otherwise(col(a)).as(a)
      }): _*)
  }

  /** Compact a changeset to its latest change per key, RETAINING the op
    * column (deletes stay as tombstones) — the per-micro-batch write of
    * the streaming CDC face, and a valid pre-aggregation for
    * [[applyChanges]] (max of per-subset maxes = the global max, so
    * compacted changesets merge identically). Same deterministic struct
    * ordering as applyChanges. */
  def latestChanges(changes: DataFrame, keys: Seq[String], seqCol: String,
                    opCol: String): DataFrame = {
    require(keys.nonEmpty, "latestChanges: key_columns must be non-empty")
    val attrs = changes.columns.filterNot(c =>
      keys.contains(c) || c == seqCol || c == opCol).toSeq
    val pick = struct((col(seqCol) +: col(opCol) +: attrs.map(col)): _*)
    changes.groupBy(keys.map(col): _*).agg(max(pick).as("__c"))
      .select((keys.map(col) ++
        Seq(col("__c").getField(seqCol).as(seqCol), col("__c").getField(opCol).as(opCol)) ++
        attrs.map(a => col("__c").getField(a).as(a))): _*)
  }

  /** Historize a change stream into SCD2 validity intervals: each row
    * gains `valid_from` (its own `seqCol`), `valid_to` (the NEXT change's
    * seq for the same key, null while current) and `is_current`. With
    * `changeOnly`, rows whose attributes equal the key's previous state
    * are dropped FIRST (a feed that re-states unchanged rows daily —
    * the common snapshot-diff shape — collapses to true transitions),
    * and intervals chain across the dropped rows.
    *
    * (key, seq) duplicates order deterministically by attribute values,
    * so re-stated duplicates always sit adjacent and collapse under
    * `changeOnly` regardless of partitioning. */
  def scd2(changes: DataFrame, keys: Seq[String], seqCol: String,
           changeOnly: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "scd2: key_columns must be non-empty")
    val attrs = changes.columns.filterNot(c => keys.contains(c) || c == seqCol).toSeq
    val state = struct(attrs.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).asc, state.asc)
    val base =
      if (!changeOnly) changes
      else changes
        .withColumn("__prev", lag(state, 1).over(w))
        .filter(col("__prev").isNull || col("__prev") =!= state)
        .drop("__prev")
    // the filter preserves the window's hash partitioning, so the second
    // window adds a sort but NO exchange
    base
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}

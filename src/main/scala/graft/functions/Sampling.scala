package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines. RNG-based sampling
 * (`df.sample`) is not reproducible across cluster sizes or reruns; the
 * standard corpus practice is content-hash bucketing — a row is in the
 * sample iff the hash of its key falls under the rate threshold, so the
 * same slice comes back on every run, on any cluster, and membership is
 * stable under re-partitioning. Pure codegen'd Column expressions.
 */
object Sampling {

  /** Hex-prefix threshold for `rate` ∈ [0,1]: first 8 md5 hex chars are
    * uniform in [0, 2^32); lexicographic comparison against the threshold
    * keeps ≈rate of rows. */
  private[functions] def thresholdHex(rate: Double): String =
    (math.min(math.max(rate, 0.0), 1.0) * 4294967296.0).toLong match {
      case n if n >= 4294967296L => "g" // sorts above every hex char ⇒ keep all
      case n => f"$n%08x"
    }

  /** Membership predicate: row in the deterministic `rate` sample of key. */
  def inHashSample(key: Column, rate: Double): Column =
    substring(md5(key.cast("string")), 1, 8) < lit(thresholdHex(rate))

  /** Keep a stable ≈`rate` fraction of rows keyed by `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(inHashSample(col(keyCol), rate))

  /** EXACT-size uniform sample: the `n` rows with the smallest md5 draw
    * (same draw as [[hashSample]], so it composes: the exact-n sample is a
    * prefix of every rate cut), key as tie-break. Deterministic for a given
    * dataset and replayable. Compiles to TakeOrderedAndProject — each
    * partition keeps a local top-n, only n rows per partition travel —
    * never a global sort. The fixed-rate [[hashSample]] stays the
    * shuffle-FREE choice when ±√n wobble is acceptable. Determinism
    * requires a UNIQUE key column: rows sharing a key share a draw AND the
    * tie-break, so the cut among them is partition-order dependent. */
  def sampleExact(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    if (!df.columns.contains(keyCol))
      throw new IllegalArgumentException(s"`sample_rows` operation: column `$keyCol` not defined")
    if (n <= 0)
      throw new IllegalArgumentException(s"`sample_rows` operation: count must be positive, got $n")
    df.orderBy(md5(col(keyCol).cast("string")), col(keyCol)).limit(n)
  }

  /** PER-ROW weighted Bernoulli sampling: each row keeps with its OWN
    * probability `weight_ppm / 10^6` (clamped to [0, 10^6]; null drops) —
    * the quality-weighted corpus cut ("sample documents proportional to
    * their quality score") that a fixed-rate sample can't express.
    * Deterministic and integer-exact: the row's uniform draw is its first
    * 8 md5 hex chars of `keyCol` (the SAME draw hashSample uses, so a
    * row kept at weight w stays kept at any w' >= w — monotone, replayable
    * cuts), and the threshold is `(w * 2^32) div 10^6` in pure Long
    * arithmetic (4.3e18 max, no overflow; never a double). Still a single
    * narrow filter pass — no shuffle at any scale. */
  def weightedHashSample(df: DataFrame, keyCol: String, weightPpmCol: String): DataFrame =
    // coalesce BEFORE the clamp: Spark's least/greatest skip nulls, so a
    // bare least(10^6, NULL) would resolve to 10^6 and keep the row
    df.withColumn("__wps_w__",
        greatest(lit(0L), least(lit(1000000L),
          coalesce(col(weightPpmCol).cast("long"), lit(0L)))))
      .withColumn("__wps_u__",
        conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long"))
      .filter(expr("__wps_u__ < (__wps_w__ * 4294967296) div 1000000"))
      .drop("__wps_w__", "__wps_u__")

  /** Per-stratum deterministic sampling: rate looked up per value of
    * `stratumCol` (e.g. {"en" -> 0.1, "fr" -> 1.0}), default for strata not
    * listed. The backbone of language/domain rebalancing at corpus scale —
    * still a single narrow filter pass, no shuffle. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
                           rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val hex = substring(md5(col(keyCol).cast("string")), 1, 8)
    val threshold = rates.foldLeft(lit(thresholdHex(defaultRate))) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(thresholdHex(r))).otherwise(acc)
    }
    df.filter(hex < threshold)
  }

  /** Global prefix sum of `value` in deterministic hash order of `idCol`,
    * WITHOUT a global single-partition window (the naive
    * `Window.orderBy(hash)` collapses 100 TB onto one task). Two phases:
    * per-bucket totals (bucket = first `hexChars` md5 chars, ≤16^hexChars
    * groups — a tiny shuffle), driver-side running bases over the sorted
    * bucket totals (bounded state, ≤65k rows at hexChars=4), then a
    * per-bucket window that adds the bucket's base. Result column
    * `prefixCol` = sum of `value` over all rows strictly BEFORE the row in
    * (md5(id), id) order. */
  private[graft] def withHashPrefixSum(df: DataFrame, idCol: String, value: Column,
                                       prefixCol: String, hexChars: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val h = md5(col(idCol).cast("string"))
    val bucketed = df.withColumn("__g_h__", h)
      .withColumn("__g_b__", substring(col("__g_h__"), 1, hexChars))
      .withColumn("__g_v__", value.cast("long"))
    val totals = bucketed.groupBy("__g_b__").agg(sum(col("__g_v__")).as("__g_t__"))
      .orderBy("__g_b__").collect()
    var running = 0L
    val bases = totals.map { r =>
      val base = (r.getString(0), running); running += r.getLong(1); base
    }.toSeq
    import spark.implicits._
    val baseDf = bases.toDF("__g_b__", "__g_base__")
    val w = Window.partitionBy(col("__g_b__")).orderBy(col("__g_h__"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(baseDf), Seq("__g_b__"))
      .withColumn(prefixCol,
        col("__g_base__") + coalesce(sum(col("__g_v__")).over(w), lit(0L)))
      .drop("__g_b__", "__g_h__", "__g_v__", "__g_base__")
  }

  /** Token-budget sampling: admit documents in deterministic hash order of
    * `idCol` until the cumulative `tokensCol` reaches `budget` — the
    * standard way to cut an N-token training mix from a larger corpus,
    * reproducible on any cluster. A document is admitted iff the budget is
    * not exhausted BEFORE it, so the total may overshoot by at most one
    * document. Scale path: bucketed two-phase prefix sum (above), never a
    * global sort onto one task. */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokensCol: String,
                        budget: Long, hexChars: Int = 2): DataFrame =
    withHashPrefixSum(df, idCol, col(tokensCol), "__g_before__", hexChars)
      .filter(col("__g_before__") < budget)
      .drop("__g_before__")

  /** Sequence packing: assign documents, in deterministic md5(id) stream
    * order, to consecutive training contexts of ≈`contextTokens` tokens —
    * the standard pretraining prep step that concatenates documents into
    * fixed-size model contexts. Split-free greedy semantics: a document
    * belongs to context `floor(tokens_before_it / contextTokens)`, i.e. a
    * new context opens once the running total has crossed a boundary, so a
    * context may overflow by at most its last document (documents are never
    * split across contexts). Deterministic on any cluster, reproducible
    * across reruns, and verifiable by an ORDER BY window oracle.
    *
    * Scale shape: the bucketed two-phase prefix sum (withHashPrefixSum) —
    * never a global single-partition window. Downstream concatenation is a
    * `groupBy("context_id")` whose groups are ≈contextTokens tokens each,
    * so the shuffle is perfectly size-bounded. */
  def packContexts(df: DataFrame, idCol: String, tokensCol: String,
                   contextTokens: Long, hexChars: Int = 2): DataFrame = {
    require(contextTokens > 0, s"packContexts: contextTokens must be positive, got $contextTokens")
    withHashPrefixSum(df, idCol, col(tokensCol), "__g_before__", hexChars)
      .withColumn("context_id", floor(col("__g_before__") / contextTokens).cast("long"))
      .drop("__g_before__")
  }

  /** Per-group variant of the two-phase prefix sum: independent running
    * totals per value of `groupCol`, same bucketed shape. Fully
    * distributed — NOTHING is collected to the driver: the per-(group,
    * bucket) bases are themselves a window over the aggregated totals
    * frame (partitioned by group, ordered by bucket — ≤ 16^hexChars rows
    * per window partition no matter how many groups exist), so the
    * primitive holds at crawl-scale group cardinality (per REGISTRABLE
    * DOMAIN: millions of groups) exactly as it does per language. The
    * bucketed rows then join the base frame on (group, bucket); AQE
    * broadcast-converts that join when the base frame is small (the
    * per-language case) and shuffles it otherwise. */
  private[graft] def withGroupedHashPrefixSum(df: DataFrame, groupCol: String,
                                              idCol: String, value: Column,
                                              prefixCol: String,
                                              hexChars: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(idCol).cast("string"))
    val bucketed = df.withColumn("__g_h__", h)
      .withColumn("__g_b__", substring(col("__g_h__"), 1, hexChars))
      .withColumn("__g_v__", value.cast("long"))
      // string shadow of the group key: the base join stays type-stable
      // whatever the caller's group column type is
      .withColumn("__g_g__", coalesce(col(groupCol).cast("string"), lit("\u0000null")))
    // base(g, b) = sum of bucket totals for buckets < b within group g —
    // a window whose partitions are one row per bucket (≤ 16^hexChars),
    // cheap at any group cardinality
    val wBase = Window.partitionBy(col("__g_g__")).orderBy(col("__g_b__"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val baseDf = bucketed.groupBy("__g_g__", "__g_b__")
      .agg(sum(col("__g_v__")).as("__g_t__"))
      .withColumn("__g_base__", coalesce(sum(col("__g_t__")).over(wBase), lit(0L)))
      .drop("__g_t__")
    val w = Window.partitionBy(col("__g_g__"), col("__g_b__"))
      .orderBy(col("__g_h__"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(baseDf, Seq("__g_g__", "__g_b__"))
      .withColumn(prefixCol,
        col("__g_base__") + coalesce(sum(col("__g_v__")).over(w), lit(0L)))
      .drop("__g_g__", "__g_b__", "__g_h__", "__g_v__", "__g_base__")
  }

  /** [[packContexts]] within groups: contexts never cross a group boundary
    * (pack per language / per domain — the multilingual pipeline rule).
    * `context_id` is the group-LOCAL context ordinal; (group, context_id)
    * identifies a context, and the group column rides in the output. */
  def packContextsBy(df: DataFrame, groupCol: String, idCol: String,
                     tokensCol: String, contextTokens: Long,
                     hexChars: Int = 2): DataFrame = {
    require(contextTokens > 0, s"packContextsBy: contextTokens must be positive, got $contextTokens")
    withGroupedHashPrefixSum(df, groupCol, idCol, col(tokensCol), "__g_before__", hexChars)
      .withColumn("context_id", floor(col("__g_before__") / contextTokens).cast("long"))
      .drop("__g_before__")
  }

  /** Deterministic split assignment: label every row train/val/test (any
    * names) by md5-hash bands of `keyCol` in the declared order, weights
    * normalized to sum 1. The standard leakage-safe split rule: membership
    * depends only on the key, so the same document lands in the same split
    * on every run, any cluster, any partitioning — and keying by a
    * dedup-group representative or URL makes the split leak-proof across
    * near-duplicates. Pure codegen'd CASE over the hash prefix, no
    * shuffle. */
  def assignSplit(df: DataFrame, keyCol: String,
                  weights: Seq[(String, Double)],
                  splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) && weights.map(_._2).sum > 0,
      s"assignSplit: weights must be non-negative and sum > 0, got $weights")
    val total = weights.map(_._2).sum
    val hex = substring(md5(col(keyCol).cast("string")), 1, 8)
    // cumulative upper bounds; the last band is a catch-all so rounding can
    // never leave a row unlabeled
    val cum = weights.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val cased = weights.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), ub)) =>
        val cond = hex < lit(thresholdHex(ub))
        Some(acc.map(c => c.when(cond, name)).getOrElse(when(cond, name)))
    }
    val assigned = cased.map(_.otherwise(weights.last._1)).getOrElse(lit(weights.last._1))
    df.withColumn(splitCol, assigned)
  }

  /** Materialized packing: one row per context with the member documents'
    * text concatenated in stream (md5(id), id) order — the actual training
    * sample. The groupBy's groups are ≈contextTokens tokens by
    * construction, so the shuffle is size-bounded per key no matter how
    * large the corpus: skew cannot exist in the output of packContexts. */
  def packContextsText(df: DataFrame, idCol: String, textCol: String,
                       tokensCol: String, contextTokens: Long,
                       sep: String = " ", hexChars: Int = 2): DataFrame =
    packContexts(df, idCol, tokensCol, contextTokens, hexChars)
      .withColumn("__p_h__", md5(col(idCol).cast("string")))
      .groupBy("context_id")
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(struct(
            col("__p_h__").as("h"), col(idCol).cast("long").as("i"),
            col(textCol).as("t")))),
          x => x.getField("t"))).as(textCol),
        sum(col(tokensCol).cast("long")).as("n_tokens"),
        count(lit(1)).as("n_docs"))

  /** Per-group document cap: keep at most `k` rows per value of `groupCol`,
    * selected in deterministic (md5(id), id) order — the per-domain cap every
    * crawl-curation pipeline applies so no single domain dominates the mix
    * (RefinedWeb/FineWeb-style "max N pages per domain").
    *
    * Scale shape: a single `Window.partitionBy(group)` puts each group's
    * ENTIRE row set on one task — a 100 TB crawl has domains with 10⁸ pages,
    * so that window is a skew bomb. Two-stage exact top-k instead: stage 1
    * ranks within (group, salt) — each giant group split across `salts`
    * tasks — and keeps ≤ k rows per salted slice; stage 2 ranks the ≤
    * salts·k survivors per group exactly. The global top-k of a group is a
    * subset of the union of its salted top-ks, so the result is identical to
    * the single-window answer while the per-task row bound drops from
    * |group| to max(|group|/salts, salts·k). */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int,
                  salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"capPerGroup: k must be positive, got $k")
    val salted = df
      .withColumn("__c_h__", md5(col(idCol).cast("string")))
      .withColumn("__c_s__", pmod(xxhash64(col(idCol)), lit(salts.toLong)))
    val w1 = Window.partitionBy(col(groupCol), col("__c_s__"))
      .orderBy(col("__c_h__"), col(idCol))
    val partial = salted.withColumn("__c_r__", row_number().over(w1))
      .filter(col("__c_r__") <= k)
    val w2 = Window.partitionBy(col(groupCol)).orderBy(col("__c_h__"), col(idCol))
    partial.withColumn("__c_r__", row_number().over(w2))
      .filter(col("__c_r__") <= k)
      .drop("__c_h__", "__c_s__", "__c_r__")
  }

  /** Rebalance a corpus to target mixture `weights` over `stratumCol`
    * WITHOUT upsampling: the output is the LARGEST subset whose stratum
    * proportions match the weights exactly (in expectation), i.e. the
    * binding stratum (smallest count/weight ratio) is kept in full and every
    * other stratum is hash-downsampled to match. The mixture-construction
    * step of training-data pipelines (DoReMi-style static domain weights).
    *
    * Mechanics: one tiny groupBy collects per-stratum counts (bounded by the
    * number of strata — the same driver-state class as IVF centroids), the
    * driver computes λ = min over weighted strata of countₛ/weightₛ and each
    * stratum's keep rate λ·weightₛ/countₛ, then membership is the usual
    * narrow md5-threshold filter — deterministic, cluster-size-independent,
    * no data shuffle. Strata without a weight are dropped (weight 0). */
  def rebalanceToMixture(df: DataFrame, stratumCol: String, keyCol: String,
                         weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "rebalanceToMixture: weights must be positive")
    val counts = df.filter(col(stratumCol).isin(weights.keys.toSeq: _*))
      .groupBy(stratumCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return df.filter(lit(false))
    val lambda = present.map { case (s, w) => counts(s).toDouble / w }.min
    val rates = present.map { case (s, w) => s -> lambda * w / counts(s) }
    stratifiedHashSample(df, keyCol, stratumCol, rates, defaultRate = 0.0)
  }

  /** Deterministic corpus shuffle: a stable global permutation position
    * (0-based `posCol`) in md5 order of `idCol` — the reproducible
    * alternative to `ORDER BY rand()` for training-data mixing. Same
    * bucketed two-phase skeleton; the ordinal makes the order itself
    * verifiable, not just the membership. */
  def hashShuffle(df: DataFrame, idCol: String, posCol: String = "shuffle_pos",
                  hexChars: Int = 2): DataFrame =
    withHashPrefixSum(df, idCol, lit(1L), posCol, hexChars)
}

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

  /** Deterministic corpus shuffle: a stable global permutation position
    * (0-based `posCol`) in md5 order of `idCol` — the reproducible
    * alternative to `ORDER BY rand()` for training-data mixing. Same
    * bucketed two-phase skeleton; the ordinal makes the order itself
    * verifiable, not just the membership. */
  def hashShuffle(df: DataFrame, idCol: String, posCol: String = "shuffle_pos",
                  hexChars: Int = 2): DataFrame =
    withHashPrefixSum(df, idCol, lit(1L), posCol, hexChars)
}

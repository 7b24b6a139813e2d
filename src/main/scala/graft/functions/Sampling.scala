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
}

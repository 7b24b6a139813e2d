package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * In-engine evaluation of a trained classifier's predictions against a
 * held-out truth column — the router-quality measurement a mixture-routing
 * pipeline needs BEFORE committing a corpus cut on [[NaiveBayes]] /
 * [[LangId]] predictions. Composes with `assign_split`: split, train on
 * one band (`nb_train`), score another (`nb_classify` + `model_file`),
 * then `model_eval` on the held-out band.
 *
 * Output: one row per label observed as truth OR prediction, with the
 * per-label confusion counts (`tp`, `fp`, `fn`, `support`) and
 * `precision_ppm` / `recall_ppm` = floor(1e6 · tp / denominator) —
 * parts-per-million integer quantization (same float-free discipline as
 * the NB scores themselves: `div` in Spark and `//` in DuckDB agree
 * exactly on non-negative longs, where an IEEE divide-then-floor can
 * straddle an integer by one ulp). Null metric when the denominator is 0
 * (a label never predicted has no precision; never true, no recall).
 *
 * Semantics: rows with a null truth label are excluded (unlabeled); a
 * null prediction counts as a miss for its truth label (`fn`) and is
 * nobody's false positive.
 *
 * Scale shape: two partial aggregations over (label) and (prediction) —
 * cardinality = |labels|, data-size-independent — joined full-outer on
 * label. Nothing is collected; label cardinality may grow without a
 * driver step.
 */
object ModelEval {

  def evalPredictions(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val pairs = df.select(col(labelCol).cast("string").as("__e_l__"),
        col(predCol).cast("string").as("__e_p__"))
      .filter(col("__e_l__").isNotNull)
    val byTrue = pairs.groupBy(col("__e_l__").as("label"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("__e_l__") === col("__e_p__"), 1L).otherwise(0L)).as("tp"))
    val byPred = pairs.filter(col("__e_p__").isNotNull)
      .groupBy(col("__e_p__").as("label"))
      .agg(count(lit(1)).as("predicted"))
    byTrue.join(byPred, Seq("label"), "full_outer")
      .select(col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("predicted"), lit(0L)).as("predicted"))
      .withColumn("fp", col("predicted") - col("tp"))
      .withColumn("fn", col("support") - col("tp"))
      .withColumn("precision_ppm",
        when(col("predicted") > 0, expr("tp * 1000000 div predicted")))
      .withColumn("recall_ppm",
        when(col("support") > 0, expr("tp * 1000000 div support")))
      .drop("predicted")
  }
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-trained language identification: a rank-based character n-gram
 * classifier in the spirit of Cavnar & Trenkle 1994 ("N-Gram-Based Text
 * Categorization" — the public n-gram profile method), all-integer (the
 * repo's float-free-rank discipline):
 *
 *  - TRAIN: per language, the top-`topK` lowercased character trigrams of
 *    the labeled seed by (count desc, trigram asc); a trigram's RANK
 *    (1-based) is its position in that list.
 *  - SCORE: a document's score for language L is the sum over its trigram
 *    OCCURRENCES of rank_L(trigram), out-of-vocabulary costing topK + 1.
 *    Lowest score wins; ties break on language name ascending.
 *
 * Integer ranks make predictions bit-identical on any cluster, any
 * partitioning, and SQL-replicable — the oracle rebuilds training AND
 * scoring from the same corpus.
 *
 * Scale shape: training is one groupBy over (lang, trigram) — bounded by
 * |langs| · |alphabet|³ — with a per-lang top-K window and a ≤ |langs|·topK
 * collect (the trigram-LM driver-state class). Scoring is ONE codegen'd
 * expression per row with the profile inside the plan
 * ([[graft.expressions.LangScore]]) — shuffle-free, stream-safe against
 * the static model.
 */
object LangId {

  /** Per-language trigram rank profiles from labeled seed rows. */
  def trainProfiles(seed: DataFrame, langCol: String, textCol: String,
                    topK: Int = 300): Map[String, Map[String, Int]] = {
    require(topK > 0, "LangId.trainProfiles: topK must be positive")
    val spark = seed.sparkSession
    graft.expressions.GraftFunctions.register(spark)
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("tri").asc)
    seed
      .filter(col(langCol).isNotNull)
      .select(col(langCol).cast("string").as("lang"),
        explode(call_function("char_ngrams",
          lower(col(textCol).cast("string")), lit(3))).as("tri"))
      .groupBy("lang", "tri").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("lang", "tri", "rank")
      .as[(String, String, Int)].collect()
      .groupBy(_._1).map { case (l, rows) =>
        l -> rows.map(r => r._2 -> r._3).toMap
      }
  }

  /** Append the predicted language under the trained profiles — one fused
    * expression, no shuffle. Documents with no trigrams predict the
    * lexicographically-first language (all scores 0). */
  def withPrediction(df: DataFrame, textCol: String,
                     profiles: Map[String, Map[String, Int]], topK: Int = 300,
                     outCol: String = "lang_pred"): DataFrame = {
    require(profiles.nonEmpty, "LangId.withPrediction: profiles must be non-empty")
    val langs: Array[String] = profiles.keys.toArray.sorted
    val keyed = for {
      (l, p) <- profiles.toSeq
      (tri, rank) <- p
    } yield (l + BpeKernels.Sep + tri, rank)
    val sortedKeys = keyed.sortBy(_._1)
    val keys: Array[String] = sortedKeys.map(_._1).toArray
    val ranks: Array[Int] = sortedKeys.map(_._2).toArray
    val spark = df.sparkSession
    val fname = "graft_lang_score_" + java.lang.Long.toHexString(
      keys.foldLeft(topK.toLong)((h, k) => h * 1000003L + k.hashCode))
    graft.expressions.GraftFunctions.registerIfAbsent(spark, fname, {
      case Seq(t) => graft.expressions.LangScore(
        org.apache.spark.sql.catalyst.expressions.Lower(t), langs, keys, ranks, topK)
      case other => throw new IllegalArgumentException(
        s"$fname takes 1 argument, got ${other.size}")
    })
    df.withColumn(outCol, call_function(fname, col(textCol).cast("string")))
  }

  /** Train on the labeled rows of `df` itself, predict for every row —
    * the YAML-op shape. */
  def trainAndPredict(df: DataFrame, langCol: String, textCol: String,
                      topK: Int = 300, outCol: String = "lang_pred"): DataFrame =
    withPrediction(df, textCol,
      trainProfiles(df.filter(col(langCol).isNotNull), langCol, textCol, topK),
      topK, outCol)
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-trained document classification: integer-quantized multinomial
 * Naive Bayes (the public NB formulation — e.g. Manning/Raghavan/Schütze
 * IR ch. 13 — with log-likelihoods quantized to integer bit-lengths, the
 * repo's float-free determinism discipline). Generalizes the trained-
 * model tier ([[LangId]], trained BPE, trigram LM) to ARBITRARY labels —
 * topic/quality/source classification for mixture curation:
 *
 *  - FEATURES: whitespace tokens of the lowercased text, hashed to 4096
 *    buckets via the first three hex chars of md5(token) — SQL-replicable
 *    (`substr(md5(tok), 1, 3)`), so the oracle rebuilds training AND
 *    scoring end-to-end.
 *  - TRAIN: per (label, bucket) token-occurrence counts; weight =
 *    bitLength(count + 1) (an exact integer log2 quantization of the
 *    Laplace-smoothed likelihood), norm_l = bitLength(totalTokens_l +
 *    4096), prior_l = bitLength(docs_l).
 *  - SCORE: score_l = prior_l + Σ_tokens (weight_l(bucket) − norm_l),
 *    unseen buckets scoring bitLength(0 + 1) = 1. Highest score wins;
 *    ties break on label ascending.
 *
 * Integer scores make predictions bit-identical on any cluster and any
 * partitioning — no IEEE log in the hot path, no ulp-sensitive argmax.
 *
 * Scale shape: training is ONE groupBy over (label, bucket) — the
 * collect is bounded by |labels| · 4096 (driver-state class, like the
 * LangId profiles); scoring is a single shuffle-free codegen expression
 * with the model inside the plan ([[graft.expressions.NbScore]]),
 * stream-safe against the static model.
 */
object NaiveBayes {

  val Buckets = 4096

  final case class Model(labels: Array[String],
                         bucketKeys: Array[Array[String]],
                         weights: Array[Array[Int]],
                         norms: Array[Int], priors: Array[Int])

  private def bitLen(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Train from labeled seed rows (null labels ignored). */
  def train(seed: DataFrame, labelCol: String, textCol: String): Model = {
    val spark = seed.sparkSession
    import spark.implicits._
    val labeled = seed.filter(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("label"),
        lower(col(textCol).cast("string")).as("t"))
    val toks = labeled
      .select(col("label"), explode(split(col("t"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("label"), substring(md5(col("tok")), 1, 3).as("b"))
    // ONE shuffle; the collect is <= |labels| * 4096 rows
    val counts = toks.groupBy("label", "b").agg(count(lit(1)).as("cnt"))
      .as[(String, String, Long)].collect()
    val docs = labeled.groupBy("label").agg(count(lit(1)).as("docs"))
      .as[(String, Long)].collect().toMap
    require(docs.nonEmpty, "nb_classify: no labeled seed rows")
    val labels = docs.keys.toArray.sorted
    val byLabel = counts.groupBy(_._1)
    val bucketKeys = labels.map(l =>
      byLabel.getOrElse(l, Array.empty).map(_._2).sorted)
    val weights = labels.zipWithIndex.map { case (l, i) =>
      val m = byLabel.getOrElse(l, Array.empty).map(r => r._2 -> r._3).toMap
      bucketKeys(i).map(b => bitLen(m(b) + 1))
    }
    val norms = labels.map(l =>
      bitLen(byLabel.getOrElse(l, Array.empty).map(_._3).sum + Buckets))
    val priors = labels.map(l => bitLen(docs(l)))
    Model(labels, bucketKeys, weights, norms, priors)
  }

  /** Content-complete 64-bit hash of EVERY builder-captured model field.
    * registerIfAbsent is first-registration-wins, so the name must be a
    * function of the whole model: hashing only labels + norm totals let
    * two same-size retrains collide, silently scoring with the first
    * model's weights for the life of the session. */
  private def modelHash(m: Model): Long = {
    var h = 0xcbf29ce484222325L
    def mix(v: Long): Unit = { h ^= v; h *= 0x100000001b3L }
    def mixStr(s: String): Unit = { mix(s.length.toLong); mix(s.hashCode.toLong) }
    m.labels.foreach(mixStr)
    m.bucketKeys.foreach { ks => mix(ks.length.toLong); ks.foreach(mixStr) }
    m.weights.foreach { ws => mix(ws.length.toLong); ws.foreach(w => mix(w.toLong)) }
    m.norms.foreach(n => mix(n.toLong))
    m.priors.foreach(p => mix(p.toLong))
    Dedup.mix64(h)
  }

  /** Append the predicted label — one fused expression, no shuffle. */
  def withPrediction(df: DataFrame, textCol: String, model: Model,
                     outCol: String = "label_pred"): DataFrame = {
    val spark = df.sparkSession
    val fname = "graft_nb_score_" + java.lang.Long.toHexString(modelHash(model))
    graft.expressions.GraftFunctions.registerIfAbsent(spark, fname, {
      case Seq(t) => graft.expressions.NbScore(
        org.apache.spark.sql.catalyst.expressions.Lower(t),
        model.labels, model.bucketKeys, model.weights, model.norms, model.priors)
      case other => throw new IllegalArgumentException(
        s"$fname takes 1 argument, got ${other.size}")
    })
    df.withColumn(outCol, call_function(fname, col(textCol).cast("string")))
  }

  /** Train on the labeled rows of `df` itself, predict for every row —
    * the YAML-op shape. */
  def trainAndPredict(df: DataFrame, labelCol: String, textCol: String,
                      outCol: String = "label_pred"): DataFrame =
    withPrediction(df, textCol, train(df, labelCol, textCol), outCol)

  /** Persist a model as parquet (the production train-once/score-deltas
    * shape, like the BPE merges table): one row per (label, bucket,
    * weight), plus a NULL-bucket row per label carrying (norm, prior). */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                path: String): Unit = {
    import spark.implicits._
    val rows =
      model.labels.indices.flatMap { i =>
        (model.labels(i), Option.empty[String], model.norms(i), model.priors(i)) +:
          model.bucketKeys(i).indices.map(k =>
            (model.labels(i), Some(model.bucketKeys(i)(k)), model.weights(i)(k), 0))
      }
    rows.toDF("label", "bucket", "weight", "prior")
      .write.mode("overwrite").parquet(path)
  }

  /** Inverse of [[saveModel]]. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("label"), col("bucket"), col("weight"), col("prior"))
      .as[(String, Option[String], Int, Int)].collect() // bounded: labels × 4097
    val labels = rows.map(_._1).distinct.sorted
    val header = rows.collect { case (l, None, n, p) => l -> (n, p) }.toMap
    val byLabel = rows.collect { case (l, Some(b), w, _) => (l, b, w) }.groupBy(_._1)
    val sorted = labels.map(l => byLabel.getOrElse(l, Array.empty).sortBy(_._2))
    Model(labels,
      sorted.map(_.map(_._2)),
      sorted.map(_.map(_._3)),
      labels.map(l => header(l)._1),
      labels.map(l => header(l)._2))
  }
}

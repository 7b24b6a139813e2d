package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-quantized Naive Bayes classifier: training determinism, fused
  * shuffle-free scoring, held-out accuracy, YAML dispatch, and plan
  * shape. */
class NaiveBayesSpec extends SparkSpec {

  private val phrases = Map(
    "sports" -> "the team won the match and the score was great goal",
    "finance" -> "the market rose and the stock price gained value today",
    "science" -> "the experiment measured the sample under the microscope lens")

  private def corpus = {
    val label = element_at(typedLit(Seq("sports", "finance", "science")),
      (col("id") % 3 + 1).cast("int"))
    val phrase = phrases.foldLeft(lit("")) { case (acc, (l, p)) =>
      when(label === l, lit(p)).otherwise(acc)
    }
    spark.range(150).select(col("id").as("doc_id"), label.as("topic"),
      concat(lit("doc "), col("id"), lit(" "), phrase,
        lit(" row "), col("id")).as("text"))
  }

  test("training is deterministic with bounded, sorted model state") {
    val seed = corpus.filter(col("doc_id") % 5 === 0)
    val m1 = NaiveBayes.train(seed, "topic", "text")
    val m2 = NaiveBayes.train(seed, "topic", "text")
    assert(m1.labels.toSeq == Seq("finance", "science", "sports")) // sorted
    assert(m1.labels.toSeq == m2.labels.toSeq)
    m1.bucketKeys.zip(m2.bucketKeys).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
      assert(a.toSeq == a.toSeq.sorted) // binary-search invariant
      assert(a.length <= NaiveBayes.Buckets)
    }
    m1.weights.zip(m2.weights).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    assert(m1.norms.toSeq == m2.norms.toSeq && m1.priors.toSeq == m2.priors.toSeq)
    assert(m1.weights.flatten.forall(_ >= 1))
  }

  test("held-out classification is perfect on the synthetic topics") {
    val df = corpus
    val model = NaiveBayes.train(df.filter(col("doc_id") % 5 === 0), "topic", "text")
    val pred = NaiveBayes.withPrediction(df, "text", model)
    val acc = pred.filter(col("label_pred") === col("topic")).count().toDouble / 150
    assert(acc == 1.0, s"held-out accuracy $acc")
  }

  test("YAML nb_classify op trains on non-null labels and predicts every row") {
    val engine = new graft.engine.Engine(spark)
    val seeded = corpus.withColumn("topic",
      when(col("doc_id") % 5 === 0, col("topic"))) // 80% unlabeled
    val out = engine.applyOperation(seeded,
      Map("operation" -> "nb_classify", "column" -> "text",
        "label_column" -> "topic", "new_column" -> "pred"),
      Map.empty, "spec")
    assert(out.count() == 150)
    val labeledAgree = out.filter(col("topic").isNotNull)
      .filter(col("pred") === col("topic")).count()
    assert(labeledAgree == 30, "every labeled row must classify to its own label")
  }

  test("scoring is a zero-exchange codegen pass with the model inside the plan") {
    val df = corpus
    val model = NaiveBayes.train(df.filter(col("doc_id") % 5 === 0), "topic", "text")
    val plan = NaiveBayes.withPrediction(df, "text", model)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(plan.contains("[codegen id :"), "scoring must stay in codegen")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SerializeFromObject"))
  }

  test("persisted model round-trips through parquet and scores via the YAML model_file path") {
    val df = corpus
    val model = NaiveBayes.train(df.filter(col("doc_id") % 5 === 0), "topic", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-nbmodel")
    val path = s"$dir/model.parquet"
    NaiveBayes.saveModel(spark, model, path)
    val back = NaiveBayes.loadModel(spark, path)
    assert(back.labels.toSeq == model.labels.toSeq)
    back.bucketKeys.zip(model.bucketKeys).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    back.weights.zip(model.weights).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    assert(back.norms.toSeq == model.norms.toSeq && back.priors.toSeq == model.priors.toSeq)
    // the production shape: score a DELTA with the persisted model, no
    // label column needed
    val engine = new graft.engine.Engine(spark)
    val out = engine.applyOperation(df.drop("topic"),
      Map("operation" -> "nb_classify", "column" -> "text",
        "model_file" -> "model.parquet", "new_column" -> "pred"),
      Map.empty, "spec", configDir = dir)
    val expect = NaiveBayes.withPrediction(df, "text", model, "pred")
      .select("doc_id", "pred").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.select("doc_id", "pred").collect().foreach(r =>
      assert(r.getString(1) == expect(r.getLong(0))))
  }

  test("YAML nb_train persists a model that nb_classify + model_file scores identically") {
    val df = corpus
    val dir = java.nio.file.Files.createTempDirectory("graft-nbtrain")
    val engine = new graft.engine.Engine(spark)
    val through = engine.applyOperation(df.filter(col("doc_id") % 5 === 0),
      Map("operation" -> "nb_train", "column" -> "text",
        "label_column" -> "topic", "model_file" -> "m.parquet"),
      Map.empty, "spec", configDir = dir)
    assert(through.count() == 30, "nb_train passes the frame through")
    val scored = engine.applyOperation(df.drop("topic"),
      Map("operation" -> "nb_classify", "column" -> "text",
        "model_file" -> "m.parquet", "new_column" -> "pred"),
      Map.empty, "spec", configDir = dir)
    val inline = NaiveBayes.trainAndPredict(
      df.withColumn("topic", when(col("doc_id") % 5 === 0, col("topic"))),
      "topic", "text", "pred")
      .select("doc_id", "pred").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    scored.select("doc_id", "pred").collect().foreach(r =>
      assert(r.getString(1) == inline(r.getLong(0))))
  }

  test("empty and whitespace-only docs predict deterministically (prior argmax)") {
    import spark.implicits._
    val model = NaiveBayes.train(corpus, "topic", "text")
    val edge = Seq((1L, ""), (2L, "   \t\n  "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = NaiveBayes.withPrediction(edge, "text", model).collect()
    // equal priors → lexicographically-first label; null text → null pred
    assert(out.filter(_.getLong(0) <= 2).forall(_.getString(2) == "finance"))
    assert(out.find(_.getLong(0) == 3L).get.isNullAt(2))
  }

  test("NB scoring is stream-safe: identical predictions on a MemoryStream micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val model = NaiveBayes.train(corpus, "topic", "text")
    val rows = corpus.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, String]
    val q = NaiveBayes.withPrediction(mem.toDF().toDF("doc_id", "text"), "text", model)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("doc_id", "label_pred").collect()
          .foreach(r => got(r.getLong(0)) = r.getString(1))
        ()
      }.start()
    try { mem.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    val batchPred = NaiveBayes.withPrediction(corpus, "text", model)
      .select("doc_id", "label_pred").as[(Long, String)].collect().toMap
    assert(got.toMap == batchPred, "stream scoring must equal batch scoring")
  }

  test("model_eval: per-label confusion counts and ppm metrics, hand-checked") {
    import spark.implicits._
    // truth a: predicted a,a,b,null → tp=2 fn=2; truth b: predicted a → fp
    // for a; label c appears ONLY as a prediction (support 0, recall null);
    // the null-truth row is excluded entirely
    val rows = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), ("a", null),
      ("b", "a"), ("b", "c"),
      (null, "a")).toDF("truth", "pred")
    val got = ModelEval.evalPredictions(rows, "truth", "pred")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6))).toMap
    // a: support 4, tp 2, predicted 3 → fp 1, fn 2, prec 666666, rec 500000
    assert(got("a") == ((4L, 2L, 1L, 2L, 666666L, 500000L)))
    // b: support 2, tp 0, predicted 1 → fp 1, fn 2, prec 0, rec 0
    assert(got("b") == ((2L, 0L, 1L, 2L, 0L, 0L)))
    // c: never true → support 0, recall null; predicted once, wrong
    assert(got("c") == ((0L, 0L, 1L, 0L, 0L, -1L)))
    assert(got.size == 3)
  }

  test("model_eval composes with assign_split + nb_train/nb_classify as a held-out harness") {
    import spark.implicits._
    val eng = new graft.engine.Engine(spark)
    val split = eng.applyOperation(corpus,
      Map("operation" -> "assign_split", "key_column" -> "doc_id",
        "weights" -> Map("train" -> 0.6, "val" -> 0.4)), Map.empty, "spec")
    val scored = eng.applyOperation(
      split.withColumn("label",
        when(col("split") === "train", col("topic"))),
      Map("operation" -> "nb_classify", "column" -> "text",
        "label_column" -> "label"), Map.empty, "spec")
    val eval = eng.applyOperation(scored.filter(col("split") === "val"),
      Map("operation" -> "model_eval", "label_column" -> "topic",
        "predicted_column" -> "label_pred"), Map.empty, "spec")
      .collect()
    assert(eval.nonEmpty)
    // integer identity: per-label tp+fn == support
    eval.foreach(r => assert(r.getLong(2) + r.getLong(4) == r.getLong(1)))
    // global identity: Σtp + Σfp == number of non-null predictions on val
    val predsN = scored.filter(col("split") === "val" &&
      col("label_pred").isNotNull).count()
    assert(eval.map(r => r.getLong(2) + r.getLong(3)).sum == predsN)
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-trained rank-profile language ID: training determinism, fused
  * scoring, accuracy against labels (and against the stopword heuristic),
  * YAML-op dispatch. */
class LangIdSpec extends SparkSpec {

  // deterministic multi-language fixture: shared "noise" words plus
  // per-language function words — the heuristic knows the stopword lists,
  // the trained model has to LEARN the distribution from the seed
  private val phrases = Map(
    "en" -> "the cat is on the mat and it is warm",
    "fr" -> "le chat est sur le tapis et il est chaud",
    "es" -> "el gato es sobre la alfombra y es caliente",
    "de" -> "die katze ist auf der matte und ist warm")

  // spark.range keeps the scan in the physical plan (a Seq.toDF collapses
  // to a pre-evaluated LocalTableScan and hides the codegen span)
  private def corpus = {
    val lang = element_at(typedLit(Seq("en", "fr", "es", "de")),
      (col("id") % 4 + 1).cast("int"))
    val phrase = phrases.foldLeft(lit("")) { case (acc, (l, p)) =>
      when(lang === l, lit(p)).otherwise(acc)
    }
    spark.range(200).select(col("id").as("doc_id"), lang.as("lang"),
      concat(lit("sample "), col("id"), lit(" "), phrase,
        lit(" row "), col("id")).as("text"))
  }

  test("training is deterministic and profiles are rank-consistent") {
    val df = corpus
    val p1 = LangId.trainProfiles(df.filter(col("doc_id") % 5 === 0), "lang", "text", 100)
    val p2 = LangId.trainProfiles(df.filter(col("doc_id") % 5 === 0), "lang", "text", 100)
    assert(p1 == p2)
    assert(p1.keySet == Set("en", "fr", "es", "de"))
    p1.values.foreach { prof =>
      assert(prof.size <= 100)
      assert(prof.values.toSeq.sorted == (1 to prof.size)) // ranks dense 1..K
    }
  }

  test("trained model classifies the held-out corpus perfectly and beats the heuristic") {
    val df = corpus
    val seed = df.filter(col("doc_id") % 5 === 0)
    val profiles = LangId.trainProfiles(seed, "lang", "text", 100)
    val pred = LangId.withPrediction(df, "text", profiles, 100)
    val trainedAcc = pred.filter(col("lang_pred") === col("lang")).count().toDouble / 200
    assert(trainedAcc == 1.0, s"trained accuracy $trainedAcc")
    // the stopword heuristic has no Spanish/German rows wrong? measure it
    val heurAcc = TextFunctions.withLangId(df, "text")
      .filter(col("lang_pred") === col("lang")).count().toDouble / 200
    assert(trainedAcc >= heurAcc,
      s"trained $trainedAcc must be >= heuristic $heurAcc on the fixture")
  }

  test("scoring fuses into codegen with the profile inside the plan — no UDF, no shuffle") {
    val df = corpus
    val profiles = LangId.trainProfiles(df, "lang", "text", 50)
    val pred = LangId.withPrediction(df, "text", profiles, 50)
    val plan = pred.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("lang_score")),
      s"expected lang_score inside a codegen span:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("Exchange"),
      s"scoring must be shuffle-free:\n$plan")
  }

  test("ties break on language name ascending; empty text takes the first language") {
    val profiles = Map(
      "aa" -> Map("xyz" -> 1),
      "bb" -> Map("xyz" -> 1))
    import spark.implicits._
    val df = Seq((1L, "xyz"), (2L, ""), (3L, "qq")).toDF("id", "text")
    val got = LangId.withPrediction(df, "text", profiles, 10)
      .select("id", "lang_pred").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "aa", 2L -> "aa", 3L -> "aa"))
  }

  test("lang_id_trained YAML op trains on labeled rows and scores every row") {
    val df = corpus.withColumn("lang",
      when(col("doc_id") % 5 === 0, col("lang"))) // only the seed is labeled
    val out = new graft.engine.Engine(spark).applyOperation(df,
      Map("operation" -> "lang_id_trained", "column" -> "text",
        "label_column" -> "lang", "top_k" -> 100), Map.empty, "spec")
    assert(out.count() == 200)
    // unlabeled rows are still classified correctly (doc_id%4 drives truth)
    val acc = out.withColumn("truth",
        element_at(typedLit(Seq("en", "fr", "es", "de")), (col("doc_id") % 4 + 1).cast("int")))
      .filter(col("lang_pred") === col("truth")).count()
    assert(acc == 200L, s"got $acc/200")
  }
}

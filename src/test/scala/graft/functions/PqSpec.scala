package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Product-quantization ANN: integer-exact kernels, Lloyd refinement
  * (objective must decrease), recall on a clustered corpus (the shape PQ is
  * built for — random uniform vectors have no codeable structure), plan
  * shape (fused expression over a parquet scan, TakeOrderedAndProject, no
  * full-sort Exchange), and diagnosable rejects. */
class PqSpec extends SparkSpec {

  // clustered corpus: 20 centers x 40 members, small perturbation — unit-
  // normalized so L2 order is cosine order
  private def clustered(n: Int = 800, centers: Int = 20, dims: Int = 64): Seq[(Long, Seq[Float])] = {
    val rnd = new Random(5)
    val cs = Seq.fill(centers)(Array.fill(dims)(rnd.nextGaussian()))
    (0 until n).map { i =>
      val c = cs(i % centers)
      val v = c.map(x => x + rnd.nextGaussian() * 0.15)
      val norm = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / norm).toFloat).toSeq)
    }
  }

  private def asParquet(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toFile
    dir.deleteOnExit()
    rows.toDF("vec_id", "embedding").write.mode("overwrite").parquet(dir.getAbsolutePath)
    spark.read.parquet(dir.getAbsolutePath)
  }

  test("halfUp matches Spark SQL round away-from-zero on the .5 boundary") {
    assert(Pq.halfUp(2.5) === 3L && Pq.halfUp(-2.5) === -3L && Pq.halfUp(2.4999) === 2L)
    val sparkRound = spark.sql("SELECT round(2.5D), round(-2.5D)").head()
    assert(sparkRound.getDouble(0) === 3.0 && sparkRound.getDouble(1) === -3.0)
  }

  test("encode/adc are deterministic and tie-break to the lowest centroid") {
    val dims = 8; val m = 2; val subDim = 4; val ksub = 3
    // duplicate centroids 0 and 1 -> ties must pick 0
    val base = Array(10, 0, 0, 0)
    val codebook = (base ++ base ++ Array(0, 10, 0, 0)) ++ (base ++ base ++ Array(0, 10, 0, 0))
    val v = Array(10.0, 0.0, 0.0, 0.0, 10.0, 0.0, 0.0, 0.0)
    val q = Pq.quantize(v, 256) // normalized: 10/sqrt(200)*256
    val codes = Pq.encode(q, codebook, m, ksub, subDim)
    // the quantized vector is closest to the (10,0,0,0)-shaped centroids
    assert(codes.toSeq === Seq(0, 0), s"expected lowest-index ties, got ${codes.toSeq}")
  }

  test("Lloyd refinement strictly improves the quantization objective") {
    val rows = clustered()
    val df = asParquet(rows)
    val quantized = rows.map(r => Pq.quantize(r._2.map(_.toDouble).toArray, 256))
    val errs = Seq(0, 1, 3).map { it =>
      val cb = Pq.trainCodebook(df, "vec_id", "embedding", 64, m = 8, ksub = 16,
        scale = 256, iters = it)
      Pq.quantizationError(quantized, cb, 8, 16, 8)
    }
    assert(errs(1) < errs(0), s"one Lloyd pass should cut the seed-codebook error: $errs")
    assert(errs(2) <= errs(1), s"more passes must not regress the objective: $errs")
  }

  test("pq top-k recalls the brute-force neighbors on a clustered corpus") {
    val rows = clustered()
    val df = asParquet(rows)
    val query = rows.head._2
    val corpus = df.filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    for (it <- Seq(0, 2)) {
      val pq = Pq.pqTopK(corpus, "vec_id", "embedding", query,
        k = 10, m = 8, ksub = 16, rerank = 60, iters = it)
        .collect().map(_.getLong(0)).toSet
      val recall = (pq & exact).size
      assert(recall >= 9, s"iters=$it recall $recall/10 on a clustered corpus (pq=$pq exact=$exact)")
    }
  }

  test("plan: fused pq_adc over the parquet scan, TakeOrderedAndProject, no sort Exchange") {
    val df = asParquet(clustered(200))
    val query = clustered(1).head._2
    val plan = Pq.pqTopK(df, "vec_id", "embedding", query, k = 5, rerank = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("pq_adc") || plan.contains("graft_pq_adc"), plan.take(1500))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    // the candidate stage must not globally sort: no Exchange between the
    // scan and the TakeOrdered (broadcast/driver-side ops excluded)
    val beforeTop = plan.substring(plan.indexOf("TakeOrderedAndProject"))
    assert(!beforeTop.contains("Exchange rangepartitioning"), plan.take(2000))
  }

  test("diagnosable rejects: zero vector, bad dims, thin corpus") {
    val df = asParquet(clustered(10))
    val e1 = intercept[IllegalArgumentException](
      Pq.quantize(Array(0.0, 0.0), 256))
    assert(e1.getMessage.contains("zero vector"))
    val e2 = intercept[IllegalArgumentException](
      Pq.pqTopK(df, "vec_id", "embedding", Seq.fill(63)(0.1f), k = 5))
    assert(e2.getMessage.contains("not divisible"))
    val e3 = intercept[IllegalArgumentException](
      Pq.pqTopK(df, "vec_id", "embedding", clustered(1).head._2, k = 5, ksub = 16))
    assert(e3.getMessage.contains("ksub"))
  }

  test("ivf-pq composition: cell prune then ADC, recall holds on a clustered corpus") {
    val rows = clustered()
    val df = asParquet(rows)
    val query = rows.head._2
    val corpus = df.filter(col("vec_id") =!= 0)
    val survivors = Similarity.ivfProbeFilter(corpus, "vec_id", "embedding", query,
      nlist = 16, nprobe = 4)
    val total = corpus.count()
    val nSurv = survivors.count()
    assert(nSurv < total, s"probe must prune ($nSurv of $total)")
    assert(survivors.columns.toSeq === Seq("vec_id", "embedding"))
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val ivfpq = Pq.ivfPqTopK(corpus, "vec_id", "embedding", query,
      k = 10, nlist = 16, nprobe = 4, rerank = 60)
      .collect().map(_.getLong(0)).toSet
    // clusters are tight (0.15 sigma): the query's cluster lands inside the
    // probed cells, so the composition keeps the brute-force neighbors
    assert((ivfpq & exact).size >= 9, s"recall ${(ivfpq & exact).size}/10 (ivfpq=$ivfpq)")
  }

  test("pre-encoded codes scan returns exactly the float-path results") {
    val rows = clustered(400)
    val df = asParquet(rows)
    val query = rows.head._2
    val corpus = df.filter(col("vec_id") =!= 0)
    val (encoded, cb) = Pq.encodeVectors(corpus, "vec_id", "embedding", 64)
    // persist + re-read: the codes column must survive parquet round-trip
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-codes").toFile
    dir.deleteOnExit()
    encoded.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val enc = spark.read.parquet(dir.getAbsolutePath)
    assert(enc.select("pq_codes").head().getAs[Array[Byte]](0).length === 8)
    val viaCodes = Pq.pqTopKOnCodes(enc, "vec_id", "pq_codes", "embedding", query, cb,
      k = 10, rerank = 60).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaFloats = Pq.pqTopK(corpus, "vec_id", "embedding", query,
      k = 10, rerank = 60).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaCodes === viaFloats,
      "codes-scan and float-scan paths must produce identical results")
  }

  test("ann_topk YAML dispatch reaches ivf and ivf_pq") {
    val rows = clustered(200)
    val df = asParquet(rows)
    for (method <- Seq("ivf", "ivf_pq")) {
      val out = new graft.engine.Engine(spark).applyOperation(df,
        Map("operation" -> "ann_topk", "id_column" -> "vec_id", "column" -> "embedding",
          "method" -> method, "k" -> "5", "nprobe" -> "8", "rerank" -> "30",
          "query" -> rows.head._2.map(_.toString).toList),
        Map.empty, "spec")
      assert(out.columns.toSeq === Seq("id", "cos_sim"), method)
      assert(out.count() === 5, method)
      assert(out.collect().map(_.getLong(0)).contains(0L), method)
    }
  }

  test("ann_topk YAML dispatch reaches the pq method") {
    val rows = clustered(100)
    val df = asParquet(rows)
    val out = new graft.engine.Engine(spark).applyOperation(df,
      Map("operation" -> "ann_topk", "id_column" -> "vec_id", "column" -> "embedding",
        "method" -> "pq", "k" -> "5", "rerank" -> "30",
        "query" -> rows.head._2.map(_.toString).toList),
      Map.empty, "spec")
    assert(out.columns.toSeq === Seq("id", "cos_sim"))
    assert(out.count() === 5)
    assert(out.collect().map(_.getLong(0)).contains(0L)) // the query vector itself is in the corpus
  }
}

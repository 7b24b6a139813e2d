package graft.functions

import org.apache.spark.sql.functions._

class DimReduceSpec extends graft.SparkSpec {
  import spark.implicits._

  private def mkVec(seed: Long, d: Int): Array[Float] =
    Array.tabulate(d)(i => ((SketchKernels.splitmix64(seed * 7919 + i) % 1000) / 1000.0f))

  test("kernel: deterministic, seed-sensitive, linear in the quantized grid") {
    val x = mkVec(1, 64)
    val a = DimReduceKernels.project(x, 8, 42L, 10)
    val b = DimReduceKernels.project(x, 8, 42L, 10)
    assert(a.toSeq == b.toSeq)
    assert(DimReduceKernels.project(x, 8, 43L, 10).toSeq != a.toSeq)
    // linearity holds exactly for inputs ON the fixed-point grid (floor
    // is a no-op there); off-grid inputs re-quantize, so test on-grid
    val g = Array.tabulate(64)(i => ((i * 13 % 41) - 20) / 1024.0f)
    val ga = DimReduceKernels.project(g, 8, 42L, 10)
    assert(DimReduceKernels.project(g.map(_ * 2), 8, 42L, 10).toSeq == ga.map(_ * 2).toSeq)
  }

  test("JL property: pairwise dot products are preserved in expectation") {
    val d = 256; val k = 64
    val vecs = (0 until 20).map(v => mkVec(v.toLong, d))
    val proj = vecs.map(v => DimReduceKernels.projectFloat(v, k, 42L, 10))
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (p, q) => p.toDouble * q }.sum
    // E[y_a . y_b] = k * (x_a . x_b) for a ±1 sign matrix. True dots of
    // these near-symmetric vectors sit close to 0, so normalize the
    // error by the norm product (cosine scale), not by the dot itself.
    val errs = for (i <- 0 until 20; j <- (i + 1) until 20) yield {
      val t = dot(vecs(i), vecs(j))
      val p = dot(proj(i), proj(j)) / k
      math.abs(p - t) / math.sqrt(dot(vecs(i), vecs(i)) * dot(vecs(j), vecs(j)))
    }
    val mean = errs.sum / errs.size
    assert(mean < 0.25, s"mean cosine-scale dot error $mean")
  }

  test("expression path matches the kernel and stays in codegen") {
    val df = spark.range(100).select(col("id"),
      expr("transform(sequence(0, 31), i -> cast((id * 31 + i) % 97 AS float) / 97.0f)").as("emb"))
      .select(col("id"), col("emb").cast("array<float>").as("emb"))
    val out = DimReduce.withProjection(df, "emb", "yq", k = 4, seed = 7, sBits = 8, asFloat = false)
    out.collect().foreach { r =>
      val emb = r.getSeq[Float](1).toArray
      val expect = DimReduceKernels.project(emb, 4, 7L, 8)
      assert(r.getSeq[Long](2).toSeq == expect.toSeq, s"id=${r.getLong(0)}")
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("dim_reduce_q")),
      s"expected dim_reduce_q inside a codegen span:\n$plan")
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("float face is the exact sums dequantized; ANN top-1 survives reduction") {
    // three tight clusters in 64-dim; nearest neighbor within a cluster
    // must survive projection to 16 dims
    val d = 64
    def cluster(c: Int, m: Int): Seq[Array[Float]] =
      (0 until m).map { v =>
        Array.tabulate(d)(i =>
          (if (i % 3 == c) 1.0f else 0.0f) +
            ((SketchKernels.splitmix64(c * 1000L + v * 97L + i) % 100) / 2000.0f))
      }
    val all = (0 until 3).flatMap(c => cluster(c, 5))
    val proj = all.map(v => DimReduceKernels.projectFloat(v, 16, 42L, 10))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val num = a.zip(b).map { case (p, q) => p.toDouble * q }.sum
      num / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    for (q <- all.indices) {
      val fullBest = all.indices.filter(_ != q).maxBy(i => cos(all(q), all(i)))
      val projBest = all.indices.filter(_ != q).maxBy(i => cos(proj(q), proj(i)))
      // same cluster (exact index can differ — JL preserves geometry,
      // not ranks); clusters are laid out 5-consecutive per cluster
      assert(projBest / 5 == fullBest / 5, s"q=$q full=$fullBest proj=$projBest")
    }
  }

  test("YAML dispatch + input validation") {
    val eng = new graft.engine.Engine(spark)
    val df = spark.range(10).select(col("id"),
      expr("cast(array(1.0, 2.0, 3.0, 4.0) AS array<float>)").as("emb"))
    val out = eng.applyOperation(df,
      Map("operation" -> "dim_reduce", "column" -> "emb", "new_column" -> "r",
        "k" -> "4", "seed" -> "1", "s_bits" -> "8"), Map.empty, "spec")
    assert(out.schema("r").dataType.simpleString == "array<float>")
    assert(out.count() == 10)

    val bad = spark.range(3).select(col("id").cast("string").as("emb"))
    val e = intercept[Exception] {
      DimReduce.withProjection(bad, "emb", "r", k = 4).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"), e.getMessage)
  }
}

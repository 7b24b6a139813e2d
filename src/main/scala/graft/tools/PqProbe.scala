// scratch: PQ/IVF-PQ scan cost at 1M x 64-dim vectors (synthetic clustered
// corpus written once to /tmp/graft-pq1m) vs the exact float brute-force
// scan, plus the distributed Lloyd training cost per iteration. Numbers
// land in PLANS.md ("sketch/ANN scale legs").
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Pq, Similarity}

object PqProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val dir = s"/tmp/graft-pq$n"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      // 256 deterministic cluster centers, hash-jittered members, unit-norm
      spark.range(n).map { i =>
        def h(x: Long): Long = graft.functions.SketchKernels.splitmix64(x)
        val c = (i % 256).toInt
        val v = Array.tabulate(64) { d =>
          val center = (h(c * 64L + d) % 1000) / 1000.0
          val jitter = (h(i * 64L + d) % 1000) / 10000.0
          center + jitter
        }
        val norm = math.sqrt(v.map(x => x * x).sum)
        (i, v.map(x => (x / norm).toFloat))
      }.toDF("vec_id", "embedding").write.mode("overwrite").parquet(dir)
    }
    val df = spark.read.parquet(dir)
    df.count() // warm file listing
    val query = df.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val corpus = df.filter(col("vec_id") =!= 0)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val (exact, tBrute) = time(Similarity.bruteForceTopK(corpus, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet)
    spark.catalog.clearCache()
    val (pq, tPq) = time(Pq.pqTopK(corpus, "vec_id", "embedding", query,
      k = 10, m = 8, ksub = 16, rerank = 2000).collect().map(_.getLong(0)).toSet)
    spark.catalog.clearCache()
    val (ivfpq, tIvfPq) = time(Pq.ivfPqTopK(corpus, "vec_id", "embedding", query,
      k = 10, nlist = 64, nprobe = 8, m = 8, ksub = 16, rerank = 2000)
      .collect().map(_.getLong(0)).toSet)
    spark.catalog.clearCache()
    val (_, tTrain) = time(Pq.trainCodebook(corpus, "vec_id", "embedding", 64,
      m = 8, ksub = 16, scale = 256, iters = 2))
    println(f"SCALE-LEG pq$n brute=$tBrute%.1fs pq=$tPq%.1fs (recall ${(pq & exact).size}/10) " +
      f"ivfpq=$tIvfPq%.1fs (recall ${(ivfpq & exact).size}/10) lloyd2=$tTrain%.1fs")

    // the codes-scan path: persist (id, embedding, pq_codes) once; the
    // candidate scan then reads ONLY the 8-byte codes column (parquet
    // column pruning) — the bandwidth shape a 100 TB ANN corpus runs
    val encDir = s"$dir-enc"
    val (encoded0, cb) = Pq.encodeVectors(corpus, "vec_id", "embedding", 64)
    if (!new java.io.File(s"$encDir/_SUCCESS").exists())
      encoded0.write.mode("overwrite").parquet(encDir)
    val enc = spark.read.parquet(encDir)
    enc.count()
    spark.catalog.clearCache()
    val (pqc, tCodes) = time(Pq.pqTopKOnCodes(enc, "vec_id", "pq_codes", "embedding",
      query, cb, k = 10, rerank = 2000).collect().map(_.getLong(0)).toSet)
    println(f"SCALE-LEG pq$n codes_scan=$tCodes%.1fs (recall ${(pqc & exact).size}/10, " +
      f"vs floats_scan=$tPq%.1fs)")
    spark.stop()
  }
}

// scratch: deterministic embedding corpus for the similarity-tier scale
// smoke (same statistical shape as /root/testdata embeddings.parquet:
// unit-ish 64-dim float vectors, a seeded ~10% of rows near-duplicating the
// previous id at cosine ≈ 0.99 so the dedup kernels have planted work).
package graft.tools

import org.apache.spark.sql.SparkSession

object GenVectors {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft-vec50k")
    val nVecs = args.lift(1).map(_.toInt).getOrElse(50000)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // per-id deterministic RNG: reproducible under any partitioning
    val vecs = spark.range(nVecs).as[Long].mapPartitions { it =>
      it.map { id =>
        val isDup = id % 10 == 1 && id >= 10 // near-dup of id-1's vector
        val baseId = if (isDup) id - 1 else id
        val rnd = new scala.util.Random(baseId * 0x9e3779b97f4a7c15L)
        val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
        if (isDup) {
          // small deterministic perturbation: cosine to the base ≈ 0.99
          val prnd = new scala.util.Random(id * 0x9e3779b97f4a7c15L)
          var i = 0
          while (i < dim) { v(i) += 0.12f * prnd.nextGaussian().toFloat; i += 1 }
        }
        (id, v)
      }
    }.toDF("vec_id", "embedding")
    vecs.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"wrote $nVecs vecs dim=$dim -> $outDir/embeddings.parquet")
    spark.stop()
  }
}

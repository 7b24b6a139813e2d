// scratch: end-to-end scale smoke for the embedding-similarity tier. Runs
// the exact blocked all-pairs kernel (executor-side block exchange), the
// LSH-bucketed pair pruner, and SemDeDup over each given embeddings.parquet
// dir and prints wall seconds + result counts, so growth across
// 2k -> 50k -> 500k vectors is measured, not argued. The exact kernel is
// skipped above `exactCap` rows — all-pairs is inherently O(n²) work and the
// scale path beyond the cap is the bucketed/SemDeDup/ANN family. Numbers
// land in PLANS.md ("similarity scale smoke").
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.Similarity

object VecScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft-vec50k", "/tmp/graft-vec500k")
    val exactCap = sys.env.getOrElse("GRAFT_EXACT_CAP", "60000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    dirs.foreach { d =>
      val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      val n = vecs.count()
      // exact all-pairs through the executor-side block exchange; block
      // size chosen so a task's buffered block stays ~4k vectors
      val (ec, tExact) =
        if (n <= exactCap)
          time(Similarity.cosinePairsBlocked(vecs, "vec_id", "embedding",
            threshold = 0.95, blockRows = 4096).count())
        else (-1L, -1.0)
      spark.catalog.clearCache()
      // LSH-bucketed pruning: the >cap path for pair generation
      val (bc, tBuck) = time(Similarity.cosinePairs(vecs, "vec_id", "embedding",
        threshold = 0.95, bucketed = true, numPlanes = 12).count())
      spark.catalog.clearCache()
      // planes must scale ~log2(n) to hold in-bucket pair counts: with
      // FIXED planes, pairs grow n²/2^planes — +4 planes at 10× the rows
      // restores the per-bucket occupancy of the smaller corpus
      val (bc16, tBuck16) =
        if (n > 100000)
          time(Similarity.cosinePairs(vecs, "vec_id", "embedding",
            threshold = 0.95, bucketed = true, numPlanes = 16).count())
        else (-1L, -1.0)
      spark.catalog.clearCache()
      // SemDeDup: cells sized so corpus/nlist ≈ 500 vectors per cell
      val nlist = math.max(16, (n / 500).toInt)
      val (kept, tSem) = time(Similarity.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.95, nlist = nlist, iters = 2).count())
      spark.catalog.clearCache()
      val exactStr = if (ec >= 0) f"exact=$tExact%.1fs($ec) " else "exact=skipped(>cap) "
      val b16Str = if (bc16 >= 0) f"lsh_16planes=$tBuck16%.1fs($bc16) " else ""
      println(f"VECSCALE $d vecs=$n $exactStr" +
        f"lsh_bucketed=$tBuck%.1fs($bc) $b16Str" +
        f"semantic_dedup[nlist=$nlist]=$tSem%.1fs(kept=$kept)")
    }
    spark.stop()
  }
}

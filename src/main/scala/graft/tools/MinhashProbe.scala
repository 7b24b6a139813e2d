// scratch: per-stage timings for q_dedup_minhash under the cleared-cache
// protocol, plus a cheaper-parameter recall check (numHashes=32/bands=8 vs
// the 64/16 default) on the scale-smoke corpora. Conclusions land in
// PLANS.md.
package graft.functions
// (package graft.functions for access to the private docSignatures kernel)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    for (rep <- 1 to 3) {
      spark.catalog.clearCache()
      // stage 1: the 64-hash signature kernel alone (what every rep re-pays
      // once the cache is cleared)
      val (_, tKernel) = time {
        Dedup.docSignatures(docs, "doc_id", "text", 64, 3)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      val (_, tFull) = time {
        Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.7)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"rep$rep kernel=$tKernel%.2fs full=$tFull%.2fs")
    }
    // cheaper parameters: same threshold, half the hashes — compare pair
    // counts (64/16 has measured recall 1.0 vs exact jaccard on these
    // corpora, so equal counts here = equal recall at half the kernel cost)
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft-scale10x")) {
      val dd = spark.read.parquet(s"$dir/documents.parquet")
      spark.catalog.clearCache()
      val (c64, t64) = time(Dedup.minhashLshPairs(dd, "doc_id", "text", 0.7,
        numHashes = 64, bands = 16).count())
      spark.catalog.clearCache()
      val (c32, t32) = time(Dedup.minhashLshPairs(dd, "doc_id", "text", 0.7,
        numHashes = 32, bands = 8).count())
      println(f"PARAMS $dir 64/16=$c64 (${t64}%.2fs) 32/8=$c32 (${t32}%.2fs)")
    }
    spark.stop()
  }
}

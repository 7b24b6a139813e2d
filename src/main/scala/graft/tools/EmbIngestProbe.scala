package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.Similarity

/**
 * Scale probe for the embedding ingest face's kernel
 * (`Similarity.embeddingDedupIncremental`): delta-vs-index cosine dedup
 * over multi-table LSH bucket joins. The cost model to verify is
 * candidates ≈ delta × (index / 2^planes) × tables — LINEAR in each side
 * at fixed bucket occupancy, with `numPlanes` the occupancy knob: doubling
 * the corpus at constant planes doubles per-bucket occupancy (≈4x pair
 * work), +2 planes restores it. Copies must drop, novel rows must keep —
 * the probe asserts exact keep counts (hash-random 64-dim vectors cannot
 * reach cosine 0.9 by chance at this scale).
 */
object EmbIngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def vec(i: Long): Array[Float] =
      Array.tabulate(64)(j => ((mix(i * 64 + j) % 1000L) / 500.0f))
    def vecs(ids: Range, idOff: Long, srcOff: Long => Long): DataFrame =
      spark.range(ids.start, ids.end).map { i =>
        (i + idOff, vec(srcOff(i)))
      }.toDF("id", "vec")

    def leg(name: String, nIndex: Int, nDelta: Int, planes: Int): Unit = {
      val index = vecs(0 until nIndex, 0, identity)
      // delta: half byte-identical copies of index vectors, half novel
      val dups = vecs(0 until nDelta / 2, 1000000L, identity) // copies of index 0..n/2
      val novel = vecs(0 until nDelta / 2, 2000000L, i => 10000000L + i)
      val delta = dups.unionAll(novel)
      val t0 = System.nanoTime()
      val kept = Similarity.embeddingDedupIncremental(delta, index, "id", "vec",
        threshold = 0.9, numPlanes = planes, numTables = 4).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"EMB-LEG $name index=$nIndex delta=$nDelta planes=$planes kept=$kept " +
        f"(expect ${nDelta / 2}) wall=$t%.1fs")
      require(kept == nDelta / 2, s"$name: kept $kept != ${nDelta / 2}")
      spark.catalog.clearCache()
    }

    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    leg("base", 200000, 100000, 12)
    leg("2x_same_planes", 400000, 200000, 12) // occupancy doubles: ~4x pair work
    leg("2x_replaned", 400000, 200000, 14)    // +2 planes restores occupancy
    spark.stop()
  }
}

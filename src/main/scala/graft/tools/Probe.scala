// scratch perf probe: runMain graft.functions.Probe
package graft.functions
// (package graft.functions for access to private[functions] kernels)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("warmup")(spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save())
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.7, maxDocFreq = Some(1000L))
    time("pairs materialize")(println("  pairs: " + pairs.count()))
    val pairsCached = pairs.persist()
    pairsCached.count()
    time("cc on cached pairs")(
      Dedup.connectedComponents(docs.select("doc_id"), "doc_id", pairsCached)
        .write.format("noop").mode("overwrite").save())
    time("cc full (uncached pairs)")(
      Dedup.connectedComponents(docs.select("doc_id"), "doc_id",
          Dedup.jaccardPairs(docs, "doc_id", "text", 0.7, maxDocFreq = Some(1000L)))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

// scratch perf probe: runMain graft.tools.Probe
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Dedup
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("warmup")(spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save())
    time("minhash sig only")(docs.select(Dedup.minhashSignature("text", 64)).write.format("noop").mode("overwrite").save())
    time("simhash sig only")(docs.select(Dedup.simhash("text")).write.format("noop").mode("overwrite").save())
    time("minhash full")(Dedup.minhashLshPairs(docs, "doc_id", "text", 0.7).write.format("noop").mode("overwrite").save())
    time("jaccard full")(Dedup.jaccardPairs(docs, "doc_id", "text", 0.7).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

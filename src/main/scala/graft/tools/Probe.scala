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
    val TF = TextFunctions
    time("warmup")(spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save())
    def viaKernel() = TF.withWordStats(docs.select("doc_id", "text"), "text",
        Seq("the", "a", "of", "and", "to"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        round(col("avg_word_len"), 4).as("avg_word_len"),
        round(col("stopword_ratio"), 4).as("stopword_ratio"),
        TF.fingerprint(col("text")).as("fingerprint"))
    def viaExpr() = docs.select(col("doc_id"),
      TF.wordCount(col("text")).as("n_words"),
      TF.tokenCount(col("text")).as("n_tokens"),
      round(TF.avgWordLength(col("text")), 4).as("avg_word_len"),
      round(TF.stopwordRatio(col("text"), Seq("the", "a", "of", "and", "to")), 4).as("stopword_ratio"),
      TF.fingerprint(col("text")).as("fingerprint"))
    for (i <- 1 to 3) {
      time(s"kernel $i")(viaKernel().write.format("noop").mode("overwrite").save())
      time(s"expr $i")(viaExpr().write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

// scratch perf probe for q_dedup_groups phases: runMain graft.tools.GroupsProbe
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Dedup

object GroupsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("warmup")(spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save())
    for (rep <- 1 to 3) {
      spark.catalog.clearCache()
      var pairs: org.apache.spark.sql.DataFrame = null
      var cc: org.apache.spark.sql.DataFrame = null
      time(s"rep$rep construct jaccardPairs") {
        pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.7, maxDocFreq = Some(1000L))
      }
      time(s"rep$rep connectedComponents") {
        cc = Dedup.connectedComponents(docs.select("doc_id"), "doc_id", pairs)
      }
      time(s"rep$rep noop result")(
        cc.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

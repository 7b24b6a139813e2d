// scratch: minhash signature computation three ways — interpreted HOF
// column (minhashSignature), mapPartitions kernel (docSignatures), and the
// codegen'd native expression (minhash_sig) — min-of-3 wall per path, so
// the expression's place on the preference ladder is measured, not argued.
// Numbers land in PLANS.md.
package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ExprProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft-scale50k")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf3(f: => Unit): Double =
      (1 to 3).map { _ => val t = time(f); spark.catalog.clearCache(); t }.min
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    dirs.foreach { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text")
      val n = docs.count()
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val tKernel = minOf3(noop(
        Dedup.docSignatures(docs, "doc_id", "text", 64, 3).select("id", "sig")))
      val tExpr = minOf3(noop(
        docs.selectExpr("doc_id", "minhash_sig(text, 64, 3) AS sig")))
      val tHof = minOf3(noop(
        docs.select(col("doc_id"), Dedup.minhashSignature("text", 64).as("sig"))))
      println(f"EXPR-PROBE $d docs=$n kernel=$tKernel%.2fs expr=$tExpr%.2fs hof=$tHof%.2fs")
    }
    spark.stop()
  }
}

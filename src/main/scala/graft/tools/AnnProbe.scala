// scratch: recall of single-probe vs multi-table LSH vs brute force
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity

object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val base = e.filter(col("vec_id") =!= 0)
    val truth = Similarity.bruteForceTopK(base, "vec_id", "embedding", q, 10)
      .select("id").as[Long].collect().toSet
    println(s"truth: $truth")
    def recall(ids: Seq[Long]): Double = ids.count(truth).toDouble / truth.size
    for (p <- Seq(4, 8, 12, 16)) {
      val single = Similarity.lshTopK(base, "vec_id", "embedding", q, 10, numPlanes = p)
        .select("id").as[Long].collect().toSeq
      println(f"single P=$p%-3d hits=${single.size}%-3d recall=${recall(single)}%.2f")
      for (l <- Seq(2, 4, 8, 16)) {
        val multi = Similarity.lshTopKMultiTable(base, "vec_id", "embedding", q, 10,
          numPlanes = p, numTables = l)
          .select("id").as[Long].collect().toSeq
        println(f"multi  P=$p%-3d L=$l%-3d hits=${multi.size}%-3d recall=${recall(multi)}%.2f")
      }
    }
    spark.stop()
  }
}

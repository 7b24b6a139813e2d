// scratch: PageRank iteration scaling — synthetic 5M-edge hub graph
// (5M sources fanning into 50k hubs plus a hub->hub ring), 3 fixed-point
// iterations, wall seconds per corpus size. Numbers land in PLANS.md.
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.{Graph, SketchKernels}

object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(500000L, 5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    sizes.foreach { n =>
      val hubs = math.max(100L, n / 100)
      val edges = spark.range(n).map { i =>
        val dst = (SketchKernels.splitmix64(i) & Long.MaxValue) % hubs
        (i, n + dst) // hub ids offset past the source range
      }.toDF("src", "dst")
        .union(spark.range(hubs).map(h => (n + h, n + (h + 1) % hubs)).toDF("src", "dst"))
      val t0 = System.nanoTime()
      val ranks = Graph.pageRank(edges, "src", "dst", iters = 3)
      val cnt = ranks.count()
      val top = ranks.orderBy(org.apache.spark.sql.functions.col("rank").desc).limit(3)
        .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SCALE-LEG pagerank n=$n edges wall=$dt%.1fs nodes=$cnt top=[$top]")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

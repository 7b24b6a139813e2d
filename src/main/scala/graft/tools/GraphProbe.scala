// scratch: scale legs for the graph + similarity_join tier (r14 VERDICT
// #5). Graph ops run over the real lineitem link graphs at sf0.01 (51.7k
// distinct edges) and sf0.1 (591k, 11.4x) plus a synthetic 5M-edge /
// 500k-node graph (8.5x again) — iteration wall must grow <= data growth
// (fixed shuffle count per iteration, node/edge-cardinality state).
// similarity_join runs cross-corpus halves at 5k and 50k docs (10x): if
// the prefix-filtered index degenerated to all-pairs, 10x docs would cost
// ~100x wall; the measured growth is the evidence. Numbers land in
// PLANS.md ("scale smoke").
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val legFilter: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_LEGS").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def leg(name: String)(f: => Long): Unit = {
      if (legFilter.forall(_.contains(name))) {
        val t0 = System.nanoTime()
        val n = f
        println(f"SCALE-LEG graph $name=${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n")
        spark.catalog.clearCache()
      } else println(s"SCALE-LEG graph $name=SKIPPED")
    }
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def li(sf: String) = spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")
      .select(col("l_suppkey"), col("l_partkey"))
    // synthetic decade: 5M edges over 500k nodes, deterministic mix64
    def synth = spark.range(5000000L).select(
      (abs(xxhash64(col("id"))) % 500000L).as("src"),
      (abs(xxhash64(col("id") + 7777777L)) % 500000L).as("dst"))

    leg("pagerank_52k")(graft.functions.Graph.pageRank(li("sf0.01"), "l_suppkey", "l_partkey", 3).count())
    leg("pagerank_591k")(graft.functions.Graph.pageRank(li("sf0.1"), "l_suppkey", "l_partkey", 3).count())
    leg("pagerank_5m")(graft.functions.Graph.pageRank(synth, "src", "dst", 3).count())
    leg("pagerank_dangling_591k")(graft.functions.Graph.pageRank(
      li("sf0.1"), "l_suppkey", "l_partkey", 3, dangling = "redistribute").count())
    leg("hits_52k")(graft.functions.Graph.hits(li("sf0.01"), "l_suppkey", "l_partkey", 2).count())
    leg("hits_591k")(graft.functions.Graph.hits(li("sf0.1"), "l_suppkey", "l_partkey", 2).count())
    leg("hits_5m")(graft.functions.Graph.hits(synth, "src", "dst", 2).count())

    def docs(path: String) = spark.read.parquet(path)
    def simjoin(d: org.apache.spark.sql.DataFrame): Long =
      graft.functions.Dedup.similarityJoin(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", "doc_id", "text", threshold = 0.7,
        maxDocFreq = Some(1000L)).count()
    leg("simjoin_5k")(simjoin(docs("/root/testdata/sf0.1/documents.parquet")))
    leg("simjoin_50k")(simjoin(docs("/tmp/graft-scale10x/documents.parquet")))

    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Benchmark main. Prints ONE JSON line with per-query wall times at
 * SPARK_GRAFT_SF_DIR.
 *
 * Action: `noop` datasource write — forces full evaluation of every
 * projection (a count() would let Catalyst prune the very operators being
 * measured) without paying filesystem cost.
 *
 * `etl_render` reproduces the reference's only published benchmark workload
 * (BASELINE.md: map_values + rename_columns + add_columns + per-row template
 * render to JSONL, ≈33k rows/s single-process): lineitem rows through the
 * same operator chain, rendered and written as text. Its row rate is the
 * headline comparable.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup so the first measured query isn't charged for it
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // headline ETL pipeline (reference big_earthmover.yaml shape), written
    // spark-native multi-part (the 100TB output shape)
    val outDir = java.nio.file.Files.createTempDirectory("graft-bench").toString
    results("etl_render") = time {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val stringly = li.select(li.columns.map(c => col(c).cast("string").as(c)).toIndexedSeq: _*)
      val piped = graft.ops.Ops.addColumns(
        graft.ops.Ops.renameColumns(
          graft.ops.Ops.mapValues(stringly, Seq("l_returnflag"),
            Map("A" -> "ACCEPTED", "N" -> "NONE", "R" -> "RETURNED")),
          Map("l_orderkey" -> "order_id")),
        Seq("source_system" -> "graft-bench"))
      val rendered = piped.select(to_json(struct(piped.columns.map(col).toIndexedSeq: _*)).as("value"))
      rendered.write.mode("overwrite").text(s"$outDir/etl_render")
    }

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = time {
        try noop(fn(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      }
      // drop caches persisted inside operators (dedup signature frames, CC
      // labels) so queries don't evict each other and timings stay isolated
      spark.catalog.clearCache()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

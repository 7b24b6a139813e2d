// scratch: WebDataset shard tier at crawl scale — write N small members
// across S shards with the distributed sink, read them back through the
// tar source, and check the read cost tracks the data (shard-level
// parallelism, streaming member decode, no driver bottleneck). Numbers
// land in PLANS.md.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object TarProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)

    val legs = Seq((200000L, 8), (800000L, 32))
    legs.foreach { case (n, shards) =>
      val dir = s"/tmp/graft-tar-probe-$n"
      val df = spark.range(n).select(
        concat(lit("s"), col("id")).as("key"), lit("txt").as("ext"),
        encode(concat(lit("member payload body text number "), col("id"),
          lit(" with some repeated filler to reach realistic size ....")), "UTF-8").as("content"))
      val t0 = System.nanoTime()
      graft.engine.Tar.writeShards(df.repartition(shards), dir)
      val tw = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val back = graft.engine.Sources.read(spark, "probe",
        Map("file" -> s"$dir/shard-*", "type" -> "tar"), java.nio.file.Paths.get("/tmp"))
      val agg = back.agg(count(lit(1)), sum("n_bytes")).collect().head
      val tr = (System.nanoTime() - t1) / 1e9
      println(f"SCALE-LEG tar n=$n shards=$shards write=$tw%.1fs read=$tr%.1fs " +
        f"members=${agg.getLong(0)} bytes=${agg.getLong(1)}")
    }
    spark.stop()
  }
}

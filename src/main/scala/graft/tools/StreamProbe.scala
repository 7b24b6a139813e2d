// scratch: scale legs for the streaming ingest faces (r14 VERDICT #5).
// Replays REAL micro-batches (4 single-file parquet appends, each driven
// to completion with processAllAvailable) through cdcIngest and
// resampleIngest at 100k and 1M change rows (10x), then materializes the
// read-side merge (cdcCurrent / resampleTotals). Per-batch work is one
// map-side-combinable aggregation + one batch-stamped partition overwrite,
// so wall should carry a fixed per-batch latency term plus a data term
// growing ~linearly — never a history rewrite. Numbers land in PLANS.md.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    // deterministic change feed: n rows over n/10 keys, ascending seq,
    // ~1/8 deletes, values integer cents
    def feed(n: Long): DataFrame = spark.range(n).select(
      (col("id") % (n / 10)).as("k"),
      col("id").as("seq"),
      when(col("id") % 8 === 3, lit("d")).otherwise(lit("u")).as("op"),
      (col("id") % 100000).as("cents"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L).as("ts"))

    for (n <- Seq(100000L, 1000000L)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-streamprobe-$n").toString
      val batches = (0 until 4).map(b => feed(n).filter(col("id") % 4 === b))

      // ---- CDC face
      val (_, tCdc) = time {
        batches.head.coalesce(1).write.parquet(s"$dir/cdc-src")
        val src = spark.readStream.schema(batches.head.schema).parquet(s"$dir/cdc-src")
        val q = graft.streaming.Streams.cdcIngest(src, Seq("k"), "seq", "op",
          s"$dir/cdc-changes", s"$dir/cdc-ckpt")
        try {
          q.processAllAvailable()
          batches.tail.foreach { b =>
            b.coalesce(1).write.mode("append").parquet(s"$dir/cdc-src")
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      val (cur, tCur) = time {
        val snap = feed(n / 10).select(col("k"), lit(-1L).as("seq"),
          lit("u").as("op"), lit(0L).as("cents"), col("ts")).drop("seq", "op")
        graft.streaming.Streams.cdcCurrent(
          snap, s"$dir/cdc-changes", Seq("k"), "seq", "op").count()
      }
      println(f"SCALE-LEG stream cdc_ingest_$n=$tCdc%.1fs current=$tCur%.1fs rows=$cur")

      // ---- resample face
      val (_, tRs) = time {
        batches.head.coalesce(1).write.parquet(s"$dir/rs-src")
        val src = spark.readStream.schema(batches.head.schema).parquet(s"$dir/rs-src")
        val q = graft.streaming.Streams.resampleIngest(src, "ts", Seq("k"),
          3600000000L, "cents", s"$dir/rs-agg", s"$dir/rs-ckpt")
        try {
          q.processAllAvailable()
          batches.tail.foreach { b =>
            b.coalesce(1).write.mode("append").parquet(s"$dir/rs-src")
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      val (tot, tTot) = time {
        graft.streaming.Streams.resampleTotals(spark, s"$dir/rs-agg", Seq("k")).count()
      }
      println(f"SCALE-LEG stream resample_ingest_$n=$tRs%.1fs totals=$tTot%.1fs rows=$tot")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

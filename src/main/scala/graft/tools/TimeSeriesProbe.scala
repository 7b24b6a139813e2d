package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TimeSeries

/**
 * Scale probe for the time-series tier: every operator is a per-key window
 * or per-key grouped aggregation, so the claims to verify are
 *   (1) wall grows ~linearly with rows (10x data ≲ ~10x wall, same keys),
 *   (2) key cardinality is free or better (MORE keys = smaller windows and
 *       more parallelism; the hazard shape is FEW giant keys, measured
 *       explicitly at K=32 — one key per core, the worst case that still
 *       saturates the box),
 *   (3) the resample gap grid stays bounded by the in-plan cap and its
 *       generate-join co-partitions with the aggregation.
 *
 * Events are synthesized from spark.range (no disk): ts walks a fixed span
 * so bucket counts are stable across K, value nulls every 7th row so
 * fill/interpolate do real work.
 */
object TimeSeriesProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val legFilter: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_LEGS").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def leg[A](name: String)(f: => A): Double = {
      if (!legFilter.forall(_.contains(name))) { println(s"TS-LEG $name=SKIPPED"); -1.0 }
      else {
        val t0 = System.nanoTime(); f
        val t = (System.nanoTime() - t0) / 1e9
        println(f"TS-LEG $name=$t%.1fs")
        spark.catalog.clearCache()
        t
      }
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // 90 days of events in a fixed span regardless of row count or K:
    // per-key bucket grids stay ~2160 hourly buckets, well under the cap
    val SpanUs = 90L * 86400L * 1000000L
    val MIN = 60000000L
    def events(rows: Long, keys: Long): DataFrame =
      spark.range(rows).select(
        (col("id") % keys).as("uid"),
        timestamp_micros(col("id") * (SpanUs / rows) + (col("id") * 7919) % MIN).as("ts"),
        when(col("id") % 7 === 0, lit(null))
          .otherwise((col("id") * 31) % 100000).cast("long").as("v"))

    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    for ((rows, tag) <- Seq(2000000L -> "2m", 20000000L -> "20m")) {
      val ev100k = events(rows, 100000L)
      val ev32 = events(rows, 32L) // few giant keys: the hazard shape
      leg(s"resample_${tag}_100k")(noop(
        TimeSeries.resample(ev100k, "ts", Seq("uid"), 3600L * 1000000L,
          Seq("n" -> "count()", "s" -> "sum(v)"))))
      leg(s"resample_${tag}_32")(noop(
        TimeSeries.resample(ev32, "ts", Seq("uid"), 3600L * 1000000L,
          Seq("n" -> "count()", "s" -> "sum(v)"))))
      leg(s"ffill_${tag}_100k")(noop(
        TimeSeries.fillForward(ev100k, Seq("v"), Seq("uid"), Seq("ts"))))
      leg(s"ffill_${tag}_32")(noop(
        TimeSeries.fillForward(ev32, Seq("v"), Seq("uid"), Seq("ts"))))
      leg(s"twa_${tag}_100k")(noop(
        TimeSeries.timeWindowAgg(ev100k, Seq("uid"), "ts", "sum", "v", "s",
          3600L * 1000000L)))
      leg(s"twa_${tag}_32")(noop(
        TimeSeries.timeWindowAgg(ev32, Seq("uid"), "ts", "sum", "v", "s",
          3600L * 1000000L)))
      leg(s"interp_${tag}_100k")(noop(
        TimeSeries.interpolate(ev100k, "v", "ts", Seq("uid"))))
      leg(s"interp_${tag}_32")(noop(
        TimeSeries.interpolate(ev32, "v", "ts", Seq("uid"))))
    }
    spark.stop()
  }
}

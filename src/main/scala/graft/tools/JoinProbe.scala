package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale legs for the custom joins: synthesized keyed time-series at three
  * sizes, verifying the rewrites hold their shapes — the range join's cost
  * tracks points + replicated-interval bins (never points × intervals),
  * the as-of join's one shuffle tracks the union size. Counts are
  * deterministic (id-derived series, no RNG) so growth is comparable
  * across runs. */
object JoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    for (n <- Seq(50000L, 500000L, 5000000L)) {
      val keys = math.max(n / 50, 1L) // ~50 events per key
      // points: n events spread over [0, 1e9) "micros", keyed
      val points = spark.range(n).select(
        col("id").as("pid"),
        pmod(col("id"), lit(keys)).as("k"),
        pmod(col("id") * 2654435761L, lit(1000000000L)).as("t"))
      // build side: every 10th point is a marker (same key space)
      val build = points.filter(col("pid") % 10 === 0)
        .select(col("k"), col("t"), (col("pid") % 97).cast("double").as("v"))
      val (ac, tAsof) = time(
        graft.functions.Joins.asofJoin(points, build, "k", "t", Seq("v"))
          .filter(col("v_asof").isNotNull).count())
      spark.catalog.clearCache()
      // intervals: keys/4 per-key windows of width ~4e6 (≈ bin width)
      val intervals = spark.range(math.max(keys / 4, 1L)).select(
        pmod(col("id"), lit(keys)).as("k"),
        pmod(col("id") * 40503L, lit(996000000L)).as("s"))
        .withColumn("e", col("s") + 4000000L)
      val (rc, tRange) = time(
        graft.functions.Joins.rangeJoin(points, intervals, Seq("k"),
          "t", "s", "e", binWidth = 4000000L).count())
      spark.catalog.clearCache()
      // pathological hot key: ONE key holds the whole series. The plain
      // carry serializes it onto a single task; the bucketed two-phase
      // carry (≈100 time buckets here) spreads it across tasks and must
      // return the identical match count.
      val oneKey = points.withColumn("k", lit(0L))
      val oneBuild = build.withColumn("k", lit(0L))
      val (hp, tHotPlain) = time(
        graft.functions.Joins.asofJoin(oneKey, oneBuild, "k", "t", Seq("v"))
          .filter(col("v_asof").isNotNull).count())
      spark.catalog.clearCache()
      val (hb, tHotBuck) = time(
        graft.functions.Joins.asofJoin(oneKey, oneBuild, "k", "t", Seq("v"),
            bucketSecs = Some(1e7))
          .filter(col("v_asof").isNotNull).count())
      spark.catalog.clearCache()
      require(hb == hp, s"bucketed hot-key count $hb != plain $hp")
      println(f"JOIN-SCALE n=$n asof=$tAsof%.1fs($ac) range=$tRange%.1fs($rc) " +
        f"hotkey_plain=$tHotPlain%.1fs hotkey_bucketed=$tHotBuck%.1fs($hb)")
    }
    spark.stop()
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.SparkException

/** Time-series tier: resample/gap-fill, forward fill, trailing time-range
  * windows, linear interpolation — semantics pinned on hand-built frames
  * plus the YAML dispatch path. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val MIN = 60000000L // one minute in micros

  private def ev(rows: (Long, String, Long, java.lang.Double)*) =
    rows.toSeq.toDF("id", "key", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))

  // ------------------------------------------------------------ intervals
  test("parseInterval: units, singular/plural/short forms") {
    assert(TimeSeries.parseInterval("t", "15 minutes") === 15 * MIN)
    assert(TimeSeries.parseInterval("t", "1 hour") === 60 * MIN)
    assert(TimeSeries.parseInterval("t", "2d") === 2 * 24 * 60 * MIN)
    assert(TimeSeries.parseInterval("t", "500 ms") === 500000L)
    assert(TimeSeries.parseInterval("t", "1w") === 7 * 24 * 60 * MIN)
  }

  test("parseInterval: rejects garbage, zero, unknown unit") {
    for (bad <- Seq("fast", "0 hours", "3 fortnights", "-1 hour"))
      assertThrows[IllegalArgumentException](TimeSeries.parseInterval("t", bad))
  }

  // ------------------------------------------------------------- resample
  test("resample: buckets, gap fill with count 0 and null sum") {
    // key a: events in minutes 0 and 3 of a 1-min grid -> gaps at 1, 2
    val df = ev((1, "a", 10L, 1.0), (2, "a", 20L, 2.0), (3, "a", 3 * MIN + 5, 4.0),
      (4, "b", 0L, 9.0))
    val out = TimeSeries.resample(df, "ts", Seq("key"), MIN,
      Seq("n" -> "count()", "sv" -> "sum(v)"))
      .select(col("key"), unix_micros(col("bucket")).as("b"), col("n"), col("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq(
      ("a", 0L, 2L, Some(3.0)), ("a", MIN, 0L, None), ("a", 2 * MIN, 0L, None),
      ("a", 3 * MIN, 1L, Some(4.0)), ("b", 0L, 1L, Some(9.0))))
  }

  test("resample: fillGaps=false emits only occupied buckets") {
    val df = ev((1, "a", 10L, 1.0), (2, "a", 3 * MIN, 2.0))
    val out = TimeSeries.resample(df, "ts", Seq("key"), MIN,
      Seq("n" -> "count()"), fillGaps = false)
    assert(out.count() === 2)
  }

  test("resample: per-key bucket cap raises inside the plan") {
    val df = ev((1, "a", 0L, 1.0), (2, "a", 100 * MIN, 2.0))
    val out = TimeSeries.resample(df, "ts", Seq("key"), MIN,
      Seq("n" -> "count()"), maxBucketsPerKey = 10)
    val e = intercept[Exception](out.collect())
    assert(e.getMessage.contains("spans") || Option(e.getCause).exists(_.getMessage.contains("spans")))
  }

  test("resample: rejects missing partition_by, unknown column, name collision") {
    val df = ev((1, "a", 0L, 1.0))
    assertThrows[IllegalArgumentException](
      TimeSeries.resample(df, "ts", Nil, MIN, Seq("n" -> "count()")))
    assertThrows[IllegalArgumentException](
      TimeSeries.resample(df, "ts", Seq("nope"), MIN, Seq("n" -> "count()")))
    assertThrows[IllegalArgumentException](
      TimeSeries.resample(df, "ts", Seq("key"), MIN, Seq("bucket" -> "count()")))
    assertThrows[IllegalArgumentException](
      TimeSeries.resample(df, "ts", Seq("key"), MIN, Nil))
    assertThrows[IllegalArgumentException](
      TimeSeries.resample(df, "ts", Seq("key"), MIN, Seq("n" -> "count()"),
        maxBucketsPerKey = 0))
  }

  // --------------------------------------------------------- fill forward
  test("fillForward: carries last non-null per key; leading nulls stay") {
    val df = ev((1, "a", 0L, null), (2, "a", MIN, 5.0), (3, "a", 2 * MIN, null),
      (4, "a", 3 * MIN, 7.0), (5, "b", 0L, null))
    val out = TimeSeries.fillForward(df, Seq("v"), Seq("key"), Seq("us"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out === Map(1L -> None, 2L -> Some(5.0), 3L -> Some(5.0),
      4L -> Some(7.0), 5L -> None))
  }

  test("fillForward: default value fills leading nulls; desc order honored") {
    val df = ev((1, "a", 0L, null), (2, "a", MIN, 5.0))
    val filled = TimeSeries.fillForward(df, Seq("v"), Seq("key"), Seq("us"),
      default = Some("0.5"))
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(filled === Map(1L -> 0.5, 2L -> 5.0))
    // descending order: the "last" value is now the temporally earliest
    val desc = TimeSeries.fillForward(df, Seq("v"), Seq("key"), Seq("-us"))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(desc === Map(2L -> Some(5.0), 1L -> Some(5.0)))
  }

  test("fillForward: rejects missing partition_by / order_by / column") {
    val df = ev((1, "a", 0L, 1.0))
    assertThrows[IllegalArgumentException](
      TimeSeries.fillForward(df, Seq("v"), Nil, Seq("us")))
    assertThrows[IllegalArgumentException](
      TimeSeries.fillForward(df, Seq("v"), Seq("key"), Nil))
    assertThrows[IllegalArgumentException](
      TimeSeries.fillForward(df, Seq("zz"), Seq("key"), Seq("us")))
  }

  // ------------------------------------------------------ time window agg
  test("timeWindowAgg: trailing range includes peers at the same timestamp") {
    val df = ev((1, "a", 0L, 1.0), (2, "a", 30 * MIN, 2.0), (3, "a", 30 * MIN, 4.0),
      (4, "a", 90 * MIN, 8.0), (5, "b", 30 * MIN, 16.0))
    val out = TimeSeries.timeWindowAgg(df, Seq("key"), "ts", "sum", "v", "s",
      60 * MIN).select("id", "s").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // ties at 30min share a frame (peer semantics): both rows see 1+2+4
    assert(out === Map(1L -> 1.0, 2L -> 7.0, 3L -> 7.0,
      4L -> 14.0, // 90min sees the 30min pair (within 60) + itself, not t=0
      5L -> 16.0))
  }

  test("timeWindowAgg: count function and argument validation") {
    val df = ev((1, "a", 0L, 1.0), (2, "a", MIN, 2.0))
    val n = TimeSeries.timeWindowAgg(df, Seq("key"), "ts", "count", "", "n", 2 * MIN)
      .select("id", "n").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n === Map(1L -> 1L, 2L -> 2L))
    assertThrows[IllegalArgumentException](
      TimeSeries.timeWindowAgg(df, Nil, "ts", "sum", "v", "s", MIN))
    assertThrows[IllegalArgumentException](
      TimeSeries.timeWindowAgg(df, Seq("key"), "ts", "mode", "v", "s", MIN))
    assertThrows[IllegalArgumentException](
      TimeSeries.timeWindowAgg(df, Seq("key"), "ts", "sum", "v", "s", 0L))
  }

  // ---------------------------------------------------------- interpolate
  test("interpolate: exact linear-in-time values; edge nulls stay null") {
    // t=0 -> 10, t=10min -> 20; null at t=4min interpolates to 14
    val df = ev((1, "a", 0L, 10.0), (2, "a", 4 * MIN, null), (3, "a", 10 * MIN, 20.0),
      (4, "a", 11 * MIN, null), // trailing null: no next -> stays null
      (5, "b", 0L, null)) // lone null key: stays null
    val out = TimeSeries.interpolate(df, "v", "ts", Seq("key"), Seq("id"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(1L -> Some(10.0), 2L -> Some(14.0), 3L -> Some(20.0),
      4L -> None, 5L -> None))
  }

  test("interpolate: newColumn leaves the source column untouched") {
    val df = ev((1, "a", 0L, 1.0), (2, "a", MIN, null), (3, "a", 2 * MIN, 3.0))
    val out = TimeSeries.interpolate(df, "v", "ts", Seq("key"), Seq("id"), "vi")
      .select("id", "v", "vi").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2))).sortBy(_._1)
    assert(out(1)._2.isEmpty && out(1)._3 === 2.0)
  }

  test("interpolate: rejects missing partition_by / unknown column") {
    val df = ev((1, "a", 0L, 1.0))
    assertThrows[IllegalArgumentException](
      TimeSeries.interpolate(df, "v", "ts", Nil))
    assertThrows[IllegalArgumentException](
      TimeSeries.interpolate(df, "zz", "ts", Seq("key")))
  }

  // -------------------------------------------------------- YAML dispatch
  test("YAML dispatch: all four ops route through Engine.applyOperation") {
    val e = new graft.engine.Engine(spark)
    val df = ev((1, "a", 0L, 1.0), (2, "a", 2 * MIN, null), (3, "a", 4 * MIN, 5.0))
    val rs = e.applyOperation(df, Map("operation" -> "resample",
      "time_column" -> "ts", "partition_by" -> List("key"), "interval" -> "1 minute",
      "aggregations" -> Map("n" -> "count()")), Map.empty, "spec")
    assert(rs.count() === 5) // minutes 0..4 gap-filled
    val ff = e.applyOperation(df, Map("operation" -> "fill_forward",
      "columns" -> List("v"), "partition_by" -> List("key"),
      "order_by" -> List("us", "id")), Map.empty, "spec")
    assert(ff.filter(col("v").isNull).count() === 0)
    val tw = e.applyOperation(df, Map("operation" -> "time_window_agg",
      "partition_by" -> List("key"), "time_column" -> "ts", "function" -> "count",
      "new_column" -> "n", "trailing" -> "3 minutes"), Map.empty, "spec")
    assert(tw.agg(max("n")).head.getLong(0) === 2L)
    val ip = e.applyOperation(df, Map("operation" -> "interpolate",
      "column" -> "v", "time_column" -> "ts", "partition_by" -> List("key"),
      "tie_break" -> List("id")), Map.empty, "spec")
    assert(ip.filter(col("id") === 2).head.getDouble(3) === 3.0)
  }
}

package graft.engine

import graft.SparkSpec
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** The sketch family end-to-end through a DECLARED YAML pipeline — every
  * op dispatched by Engine over an all-string csv source, outputs through
  * real destinations: distinct rollup (sketch column persisted through a
  * downstream merge), heavy hitters, quantiles (string coercion), Bloom
  * seen-list filtering, and the KMV overlap row. */
class SketchOpsSpec extends SparkSpec {

  test("declared pipeline runs the whole sketch family") {
    val dir = Files.createTempDirectory("graft-sketch-e2e")
    // 3000 events: 5 hot users (u0..u4, 200 rows each) + 20 cold users
    // (u10.., 100 rows each); region r<i%4>, latency i%700
    val rows = (0 until 3000).map { i =>
      val u = if (i % 3 == 0) s"u${i % 5}" else s"u${10 + i % 30}"
      s"$u,r${i % 4},${i % 700}"
    }
    Files.writeString(dir.resolve("events.csv"),
      "user,region,latency\n" + rows.mkString("\n") + "\n")
    Files.writeString(dir.resolve("blocked.csv"),
      "user\n" + (0 until 10).filter(_ % 2 == 1).map(i => s"u$i").mkString("\n") + "\n")
    Files.writeString(dir.resolve("p.yaml"),
      """version: 2
        |config:
        |  output_dir: ${OUT_DIR}
        |sources:
        |  events:
        |    file: events.csv
        |  blocked:
        |    file: blocked.csv
        |transformations:
        |  fine:
        |    source: $sources.events
        |    operations:
        |      - operation: sketch_distinct
        |        group_by_columns: [region, user]
        |        column: latency
        |        precision: 10
        |        sketch_column: sk
        |  rollup:
        |    source: $transformations.fine
        |    operations:
        |      - operation: sketch_distinct
        |        group_by_columns: [region]
        |        column: sk
        |        merge_sketches: true
        |        estimate_column: distinct_latencies
        |      - operation: sort_rows
        |        columns: [region]
        |  hot_users:
        |    source: $sources.events
        |    operations:
        |      - operation: heavy_hitters
        |        column: user
        |        min_count: 150
        |        width: 64
        |      - operation: sort_rows
        |        columns: [user]
        |  latency_quantiles:
        |    source: $sources.events
        |    operations:
        |      - operation: sketch_quantile
        |        group_by_columns: [region]
        |        column: latency
        |        fractions: [0.5, 0.99]
        |      - operation: sort_rows
        |        columns: [region]
        |  allowed:
        |    source: $sources.events
        |    operations:
        |      - operation: bloom_filter
        |        sources: [$sources.blocked]
        |        column: user
        |        log_bits: 16
        |        mode: drop
        |  region_overlap:
        |    source: $transformations.allowed
        |    operations:
        |      - operation: sketch_overlap
        |        sources: [$sources.events]
        |        column: user
        |        k: 1024
        |destinations:
        |  rollup:
        |    source: $transformations.rollup
        |    extension: jsonl
        |    columns: [region, distinct_latencies]
        |  hot_users:
        |    source: $transformations.hot_users
        |    extension: jsonl
        |  latency_quantiles:
        |    source: $transformations.latency_quantiles
        |    extension: jsonl
        |  region_overlap:
        |    source: $transformations.region_overlap
        |    extension: jsonl
        |""".stripMargin)
    val outDir = dir.resolve("out")
    val result = new Engine(spark).run(dir.resolve("p.yaml").toString,
      params = Map("OUT_DIR" -> outDir.toString))
    assert(result.written.keySet === Set("destinations.rollup", "destinations.hot_users",
      "destinations.latency_quantiles", "destinations.region_overlap"))

    // rollup: each region sees latencies {r, r+4, ...} -> 175 distinct;
    // p=10 keeps that exact-ish (sigma 3.3%)
    val rollup = Files.readAllLines(outDir.resolve("rollup.jsonl")).asScala.toList
    assert(rollup.size === 4)
    rollup.foreach { line =>
      val est = """"distinct_latencies": "(\d+)"""".r.findFirstMatchIn(line).get.group(1).toInt
      assert(math.abs(est - 175.0) / 175.0 < 0.15, line)
    }

    // heavy hitters: exactly the 5 hot users (200 each; cold users 100)
    val hh = Files.readAllLines(outDir.resolve("hot_users.jsonl")).asScala.toList
    assert(hh.size === 5)
    (0 until 5).foreach(i => assert(hh.exists(_.contains(s""""user": "u$i"""")), s"u$i missing"))
    assert(hh.forall(_.contains(""""frequency": "200"""")))

    // quantiles: latency uniform 0..699 per region -> q5 near 350 within
    // the 1/32 bucket error
    val lq = Files.readAllLines(outDir.resolve("latency_quantiles.jsonl")).asScala.toList
    assert(lq.size === 4)
    lq.foreach { line =>
      val q5 = """"q5": "(\d+)"""".r.findFirstMatchIn(line).get.group(1).toInt
      assert(q5 >= 320 && q5 <= 350, line)
    }

    // overlap: blocked u1,u3 exist (u5,u7,u9 do not) -> allowed = 23 of
    // the 25 real users; k=1024 -> every estimate exact
    val ov = Files.readAllLines(outDir.resolve("region_overlap.jsonl")).asScala.toList
    assert(ov.size === 1)
    assert(ov.head.contains(""""est_a": "23""""))
    assert(ov.head.contains(""""est_b": "25""""))
    assert(ov.head.contains(""""est_union": "25""""))
    assert(ov.head.contains(""""est_intersect": "23""""))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: closed-form graphs, exact partition independence
  * (the property the integer arithmetic buys), mass accounting, and the
  * YAML dispatch. */
class GraphSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  test("symmetric cycle: every node holds exactly the same rank at every iteration") {
    val n = 5
    val cyc = edges((0L until n.toLong).map(i => i -> ((i + 1) % n)): _*)
    for (iters <- Seq(1, 4)) {
      val ranks = Graph.pageRank(cyc, "src", "dst", iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ranks.size === n)
      assert(ranks.values.toSet.size === 1, s"cycle ranks must be uniform: $ranks")
    }
  }

  test("star: the hub collects the leaves' damped mass (closed form)") {
    // 4 leaves -> hub 9; one iteration from uniform 1/5 mass each
    val star = edges(1L -> 9L, 2L -> 9L, 3L -> 9L, 4L -> 9L, 9L -> 1L)
    val ranks = Graph.pageRank(star, "src", "dst", iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r0 = Graph.Mass / 5
    val base = (Graph.Mass * 150000L / 1000000L) / 5
    val contrib = r0 * 850000L / 1000000L // out_deg = 1 for every node
    assert(ranks(9L) === base + 4 * contrib)
    assert(ranks(1L) === base + contrib) // only the hub links to 1
    assert(ranks(2L) === base) // nothing links to a leaf
  }

  test("ranks are exactly partition-independent (integer sums commute)") {
    val rnd = new scala.util.Random(13)
    val e = edges(Seq.fill(3000)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong)): _*)
    val a = Graph.pageRank(e.repartition(1), "src", "dst", 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRank(e.repartition(7, col("dst")), "src", "dst", 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "fixed-point ranks must not depend on partitioning")
  }

  test("mass is conserved up to floor losses; duplicates and self-loops behave") {
    val e = edges(1L -> 2L, 1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 3L)
    val ranks = Graph.pageRank(e, "src", "dst", 4).collect().map(_.getLong(1))
    val total = ranks.sum
    // every floor drops < 1 unit per edge per iteration; no dangling nodes
    assert(total <= Graph.Mass && total >= Graph.Mass - 4 * 5 - 4 * 3,
      s"mass off: $total vs ${Graph.Mass}")
    // duplicate (1->2) must count once: node 1's out_deg is 1, so node 2
    // receives 1's whole damped rank, strictly more than node 1 gets from 3
    val m = Graph.pageRank(e, "src", "dst", 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(2L) > m(1L))
  }

  test("dangling mass drains (documented simplification); rejects bad params") {
    val e = edges(1L -> 2L, 3L -> 2L) // node 2 has no outlinks
    val ranks = Graph.pageRank(e, "src", "dst", 2).collect().map(_.getLong(1)).sum
    assert(ranks < Graph.Mass, "node 2's collected mass drains in iteration 2")
    assert(intercept[IllegalArgumentException](
      Graph.pageRank(e, "src", "dst", 0)).getMessage.contains("iters"))
    assert(intercept[IllegalArgumentException](
      Graph.pageRank(e, "src", "dst", 3, dampingPpm = 2000000L)).getMessage.contains("damping"))
  }

  test("pagerank YAML dispatch") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val out = new graft.engine.Engine(spark).applyOperation(e,
      Map("operation" -> "pagerank", "src_column" -> "src", "dst_column" -> "dst",
        "iterations" -> "2"),
      Map.empty, "spec")
    assert(out.columns.toSeq === Seq("node", "rank"))
    assert(out.count() === 3)
    assert(out.select("rank").collect().map(_.getLong(0)).toSet.size === 1) // 3-cycle: uniform
  }

  test("hits star: the center is a pure hub, the leaves pure authorities") {
    val star = edges((1L to 6L).map(l => 0L -> l): _*)
    val out = Graph.hits(star, "src", "dst", iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (hubC, authC) = out(0L)
    assert(authC == 0L && hubC > 0L, s"center: $hubC/$authC")
    (1L to 6L).foreach { l =>
      val (hubL, authL) = out(l)
      assert(hubL == 0L && authL > 0L, s"leaf $l: $hubL/$authL")
      assert(authL == out(1L)._2, "symmetric leaves score equally")
    }
    assert(hubC > out(1L)._2, "the single hub concentrates more mass than any leaf")
  }

  test("hits is exactly partition-independent and duplicate-edge immune") {
    val pairs = (0L until 60L).map(i => (i % 7) -> (7 + i % 11))
    val base = Graph.hits(edges(pairs: _*), "src", "dst", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val repart = Graph.hits(edges(pairs: _*).repartition(13), "src", "dst", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(base == repart)
    val dup = Graph.hits(edges((pairs ++ pairs): _*), "src", "dst", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(base == dup, "duplicate edges count once")
  }

  test("hits normalization keeps totals near the fixed-point mass; YAML dispatch") {
    val pairs = (0L until 40L).map(i => i -> ((i * 3 + 1) % 40))
    val out = Graph.hits(edges(pairs: _*), "src", "dst", 3)
    val sums = out.agg(sum("hub"), sum("authority")).collect().head
    val M = 1000000000L
    assert(math.abs(sums.getLong(0) - M) < M / 10, s"hub mass ${sums.getLong(0)}")
    assert(math.abs(sums.getLong(1) - M) < M / 10, s"auth mass ${sums.getLong(1)}")
    val eng = new graft.engine.Engine(spark)
    val viaYaml = eng.applyOperation(edges(pairs: _*),
      Map("operation" -> "hits", "src_column" -> "src", "dst_column" -> "dst",
        "iterations" -> "3"), Map.empty, "spec")
    assert(viaYaml.columns.toSeq == Seq("node", "hub", "authority"))
    assert(viaYaml.orderBy("node").collect().toSeq == out.orderBy("node").collect().toSeq)
  }

  test("concurrent pageRank and hits on one context never release each other's checkpoints") {
    // regression canary: checkpointTracked once derived its block-set by
    // diffing the GLOBAL persistent-RDD registry around localCheckpoint, so
    // a concurrent graph query's blocks could land in the diff and be
    // unpersisted out from under it — unrecoverable for a localCheckpoint
    // (lineage truncated), failing the victim with missing-block errors.
    // Tracking now reads the checkpoint's own LogicalRDD id; parallel
    // redistribute-mode runs must all succeed and stay exact.
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val pairs = (0L until 40L).flatMap(i =>
      Seq(i -> ((i * 7 + 3) % 40), i -> ((i + 1) % 40)))
    val g = edges(pairs: _*)
    val expectPr = Graph.pageRank(g, "src", "dst", 4, dangling = "redistribute")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectHits = Graph.hits(g, "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    (0 until 2).foreach { _ =>
      val f1 = Future(Graph.pageRank(g, "src", "dst", 4, dangling = "redistribute")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      val f2 = Future(Graph.hits(g, "src", "dst", 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
      assert(Await.result(f1, 180.seconds) == expectPr)
      assert(Await.result(f2, 180.seconds) == expectHits)
    }
  }
}

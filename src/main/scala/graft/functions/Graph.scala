package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Link-graph analytics for crawl curation — the rank signal web-corpus
 * pipelines weight quality and crawl priority by (Page et al. 1999; Common
 * Crawl publishes exactly this family of ranks per host).
 *
 * Arithmetic is FIXED-POINT: ranks are integer micro-units of a 10^12 total
 * mass, and every per-edge contribution is one Long floor-division —
 * integer sums commute, so the result is independent of partitioning,
 * join order, and engine, and the DuckDB oracle (unrolled iteration
 * layers) reproduces it EXACTLY. Floating-point PageRank cannot make that
 * promise (per-vertex sums would depend on aggregation order).
 *
 * Scale shape: each iteration is one equi-join (ranks x edges on src) and
 * one groupBy(dst) sum — both shuffle on the same key, with map-side
 * partial aggregation; iteration count is a fixed small constant, so the
 * whole computation is `iters` shuffles over the edge list, never a
 * driver-side loop over rows. Dangling mass (nodes without outlinks) is
 * DROPPED by default, the common crawl-weighting simplification — ranks
 * then bound relative link authority rather than a strict probability;
 * `dangling = "redistribute"` restores canonical-parity conservation
 * (each iteration spreads the dangling mass uniformly, damped, keeping
 * integer exactness at the cost of one scalar aggregate per iteration).
 *
 * r21 shuffle audit (optimization guide §2.4 — remove exchanges outright):
 *  - the node set derives from ONE exploded pass over the cached edge
 *    list (the former union-of-two-selects materialized both branches in
 *    one stage, before the edge cache existed, scanning the source twice);
 *  - out-degree is fused onto the edge list with a window over src — one
 *    exchange — instead of groupBy(src) + self-join (two exchanges plus a
 *    join), and it leaves the cached edge list hash-partitioned by src,
 *    exactly the clustering the per-iteration rank join needs;
 *  - the iteration loops persist() superseded frames instead of
 *    localCheckpoint()ing them: a persist is materialized BY the scalar
 *    action that follows (no extra job per iteration) and keeps the
 *    logical output partitioning visible to the planner (a checkpointed
 *    RDD scans as UnknownPartitioning, forcing the next iteration to
 *    re-exchange both join sides). Cached parents short-circuit stage
 *    submission, so per-iteration stage growth stays linear — the same
 *    property the old per-iteration checkpoint bought, without its job.
 */
object Graph {
  /** Total fixed-point mass (micro-rank units). rank*damping products stay
    * under 2^63: 10^12 * 10^6 = 10^18. */
  val Mass: Long = 1000000000000L

  /** Optional plan evidence hook for the optimization rounds: when
    * SPARK_GRAFT_PLAN_DIR is set, write the INTERNAL pre-checkpoint plan
    * (the public frame is a localCheckpoint scan, which explains to a bare
    * ExistingRDD). No behavior change when unset. */
  private def dumpPlan(df: DataFrame, name: String): Unit =
    sys.env.get("SPARK_GRAFT_PLAN_DIR").foreach { dir =>
      try {
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.write(p.resolve(s"$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            .getBytes("UTF-8"))
      } catch { case _: Exception => () }
    }

  /** PageRank over an edge frame. Returns (node, rank) with ranks in
    * micro-units of [[Mass]]. `dampingPpm` = damping factor in parts per
    * million (850000 = the canonical 0.85). Duplicate edges count once
    * (the link exists or it does not); self-loops participate like any
    * other edge. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, dampingPpm: Long = 850000L,
               dangling: String = "drop"): DataFrame = {
    require(iters >= 1 && iters <= 50, s"pagerank: iters must be in [1,50], got $iters")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"pagerank: damping_ppm must be in [0,1e6], got $dampingPpm")
    require(dangling == "drop" || dangling == "redistribute",
      s"pagerank: dangling must be drop|redistribute, got $dangling")
    // ONE cached edge frame for the whole pass (r21 profile: the former
    // separate `e` cache existed only to derive this frame and the node
    // set, yet cost its own full columnar cache build+write per run —
    // every consumer reads e2 equally well). out-degree is fused on with
    // ONE window exchange (the degree never changes across iterations);
    // groupBy+join spent two exchanges and a join on the same thing, and
    // the window leaves the frame hash-partitioned by src, the exact
    // clustering the per-iteration rank join keys on.
    val e2 = edges
      .select(col(srcCol).cast(LongType).as("src"), col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .withColumn("out_deg", count(lit(1)).over(Window.partitionBy("src")))
      .persist()
    // ONE exploded pass over the cached edge list — the former
    // union-of-two-selects materialized both branches inside a single
    // stage, BEFORE the edge cache existed, so the source was scanned twice
    val nodes = e2.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct().persist()
    try {
      val n = nodes.count() // one pass; materializes e2's cache en route
      require(n > 0, "pagerank: edge frame has no valid edges")
      val base = (Mass * (1000000L - dampingPpm) / 1000000L) / n
      // dangling-mass redistribution needs the node set WITHOUT outlinks;
      // its per-iteration scalar sum forces a materialization, so the loop
      // persists each round's ranks (the scalar action materializes the
      // cache; no separate checkpoint job) — the drop default stays a
      // single lazy chain with zero mid-loop actions
      val redistribute = dangling == "redistribute"
      val danglingNodes =
        if (redistribute)
          nodes.join(e2.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
            .persist()
        else null
      var ranks = nodes.withColumn("rank", lit(Mass / n))
      // persisted per-iteration frames, released once superseded: ranks_k
      // is consumed by ranks_{k+1}'s materialization, so after iteration
      // k+1's scalar action lands, ranks_k's cache can go. An over-eager
      // release would cost a recompute (cache miss), never correctness —
      // unlike the old localCheckpoint whose blocks were unrecoverable.
      var livePersists: List[DataFrame] = Nil
      var it = 0
      while (it < iters) {
        if (redistribute) {
          ranks = ranks.persist()
          livePersists = livePersists :+ ranks
        }
        // contribution of u to each neighbor: rank_u * d DIV (1e6 * deg_u)
        // — integral DIV, NOT `/`: Spark's `/` on longs is double
        // division, and rank*d reaches 10^18 > 2^53 where doubles drop
        // low bits (the oracle's integer `//` would then disagree)
        val contribs = ranks
          .join(e2, ranks("node") === e2("src"))
          .select(col("dst").as("node"),
            expr(s"rank * ${dampingPpm}L div (1000000L * out_deg)").as("contrib"))
          .groupBy("node").agg(sum("contrib").as("in_mass"))
        // uniform damped share of this round's dangling mass: floor twice,
        // matching the oracle's `(dm * d // 1e6) // n` (floor composition
        // over positive ints equals the single division)
        val dShare =
          if (!redistribute) 0L
          else {
            val dm = ranks.join(danglingNodes, Seq("node"), "left_semi")
              .agg(coalesce(sum("rank"), lit(0L))).head().getLong(0)
            // this action materialized ranks_k; ranks_{k-1} is superseded
            if (livePersists.size > 1) {
              livePersists.head.unpersist(blocking = false)
              livePersists = livePersists.tail
            }
            dm * dampingPpm / 1000000L / n
          }
        ranks = nodes
          .join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit(base + dShare) + coalesce(col("in_mass"), lit(0L))).as("rank"))
        it += 1
      }
      if (danglingNodes != null) danglingNodes.unpersist()
      dumpPlan(ranks, s"pagerank_internal_$dangling")
      // ONE materializing pass (localCheckpoint also truncates the
      // iters-deep lineage, so downstream plans stay flat); the (node,
      // rank) blocks it stores are reclaimed by the ContextCleaner when
      // the frame is garbage-collected — unlike a persist() the caller
      // could never safely release
      val out = ranks.select(col("node"), col("rank")).localCheckpoint(true)
      livePersists.foreach(_.unpersist(blocking = false)) // final iterations' caches
      out
    } finally { nodes.unpersist(); e2.unpersist() }
  }

  /** The "lineage has been truncated" WARN fires when the ContextCleaner
    * (its own thread) releases a dropped checkpoint's blocks after the
    * frame is garbage-collected. Graft's own batch mains and specs call
    * this once per process to pin the one emitting logger to ERROR;
    * library users who want the warning keep it (nothing is touched
    * unless this is called). */
  def quietCheckpointReleaseWarns(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)

  /** HITS hubs & authorities (Kleinberg 1999) — PageRank's complement for
    * crawl curation: authorities rank CONTENT pages worth keeping, hubs
    * rank LINK pages worth crawling from; PageRank conflates the two.
    *
    * Same fixed-point discipline as [[pageRank]], with the L1
    * normalization HITS needs made integer-exact: after each half-step
    * the raw scores divide by `q = Σraw div 10^9 + 1` (one bounded scalar
    * aggregate per half-step, the same driver-bounded class as
    * pageRank's `n = nodes.count()`), so normalized scores sum to ≈10^9
    * and every value is a pure Long floor-division of commuting integer
    * sums — partition/join-order/engine independent, oracle-exact.
    * Overflow bound: a raw score is Σ of ≈10^9-unit scores over a node's
    * in/out edges, safe to ~4x10^9 edges per node.
    *
    * Scale shape per iteration: two equi-join + partial-agg groupBy
    * pairs (authority from src-join, hub from dst-join) — a fixed stage
    * count over the ONE cached edge list, nothing row-wise on the driver;
    * only the fresh scores move (broadcast while they fit).
    *
    * r22: scores stay SPARSE through the iterations. A node whose raw
    * score is 0 contributes 0 to every downstream sum AND 0 to the L1
    * total, so the per-half-step dense completion (nodes left-join +
    * coalesce 0 — one extra join and broadcast per half-step) is pure
    * plan weight; zeros are attached ONCE at the end. Values identical
    * (0 div q = 0). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 50, s"hits: iters must be in [1,50], got $iters")
    val HitsMass = 1000000000L
    val e = edges
      .select(col(srcCol).cast(LongType).as("src"), col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist()
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct().persist()
    // r21 plan audit: every half-step join BROADCASTS the fresh score
    // frame (node count << edge bytes) and probes the edge CACHE — the
    // edge side is never exchanged in either clustering. The former
    // eBySrc/eByDst pre-partitioned copies (added on the §2.4 share-one-
    // exchange theory) therefore never paid: each cost a full repartition
    // + columnar cache build per run while the planner ignored their
    // partitioning. One cache serves both half-steps. (In the regime
    // where scores outgrow the broadcast threshold — ~10^9+ nodes — the
    // planner shifts to SMJ and per-key edge copies become worth their
    // build; that is a planner-visible size decision, not a local tune.)
    try {
      require(nodes.count() > 0, "hits: edge frame has no valid edges")
      // a half-step's cache becomes releasable once the frame TWO
      // half-steps later has materialized (h_{k-1} feeds only a_k; a_{k-1}
      // feeds only h_{k-1} and is superseded by a_k) — same eager-release
      // discipline as before, with persist() instead of localCheckpoint:
      // the L1 scalar action materializes the cache (no separate
      // checkpoint job per half-step), partitioning stays visible to the
      // planner, and an early release costs a recompute, not blocks.
      var pending: List[DataFrame] = Nil
      def normalize(raw0: DataFrame, outCol: String): DataFrame = {
        val raw = raw0.persist()
        pending = pending :+ raw
        if (pending.size > 2) {
          pending.head.unpersist(blocking = false)
          pending = pending.tail
        }
        // Σraw is one Long scalar (bounded driver state); div not `/` —
        // the long `/` is double division and drops low bits past 2^53
        val total = raw.agg(sum("raw")).head().getLong(0)
        val q = total / HitsMass + 1
        raw.select(col("node"), expr(s"raw div ${q}L").as(outCol))
      }
      // SPARSE half-step: rows only for nodes that received mass. Absent
      // rows are exact zeros — they add nothing to the L1 total (q is
      // unchanged) and produce no contributions when joined against the
      // edges next half-step, so the dense completion can wait until the
      // final output frame.
      def halfStep(scores: DataFrame, scoreCol: String,
                   joinKey: String, groupKey: String): DataFrame = {
        val ej = e
        scores.join(ej, scores("node") === ej(joinKey))
          .groupBy(col(groupKey).as("node")).agg(sum(scoreCol).as("raw"))
      }
      var h = nodes.withColumn("h", lit(HitsMass))
      var a: DataFrame = null
      var it = 0
      while (it < iters) {
        a = normalize(halfStep(h, "h", "src", "dst"), "a")
        h = normalize(halfStep(a, "a", "dst", "src"), "h")
        it += 1
      }
      // dense completion, once: every node surfaces, zeros filled in
      val joined = nodes
        .join(h, Seq("node"), "left")
        .join(a, Seq("node"), "left")
        .select(col("node"), coalesce(col("h"), lit(0L)).as("hub"),
          coalesce(col("a"), lit(0L)).as("authority"))
      dumpPlan(joined, "hits_internal")
      val out = joined.localCheckpoint(true)
      pending.foreach(_.unpersist(blocking = false)) // final a & h caches
      out
    } finally { nodes.unpersist(); e.unpersist() }
  }
}

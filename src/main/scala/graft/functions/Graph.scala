package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
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
 * integer exactness at the cost of one scalar aggregate + lineage cut
 * per iteration).
 */
object Graph {
  /** Total fixed-point mass (micro-rank units). rank*damping products stay
    * under 2^63: 10^12 * 10^6 = 10^18. */
  val Mass: Long = 1000000000000L

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
    // edge list and node set are read `iters`+1 times — cache them for the
    // duration of the single materializing pass below, then release
    val e = edges
      .select(col(srcCol).cast(LongType).as("src"), col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    try {
      val n = nodes.count() // one pass; the cached node set feeds the loop
      require(n > 0, "pagerank: edge frame has no valid edges")
      // out-degree fused into the edge list ONCE — one join per iteration,
      // not two (the degree never changes across iterations)
      val e2 = e.join(e.groupBy("src").agg(count(lit(1)).as("out_deg")), "src").persist()
      val base = (Mass * (1000000L - dampingPpm) / 1000000L) / n
      // dangling-mass redistribution needs the node set WITHOUT outlinks;
      // its per-iteration scalar sum forces a materialization, so (like
      // HITS) the loop cuts lineage each round — the drop default stays a
      // single lazy chain with zero mid-loop actions
      val redistribute = dangling == "redistribute"
      val danglingNodes =
        if (redistribute)
          nodes.join(e.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
            .persist()
        else null
      var ranks = nodes.withColumn("rank", lit(Mass / n))
      var prevCkpt: Set[Int] = Set.empty // superseded checkpoint block ids
      var it = 0
      while (it < iters) {
        if (redistribute) {
          // each round's checkpoint consumes the previous round's blocks;
          // release them NOW instead of waiting for driver GC + the
          // ContextCleaner — in a long-lived JVM (the bench sweep) the
          // per-iteration block-sets otherwise pile up in the shared
          // block manager and late reps bog down (the r18 dangling
          // rep-bimodality attribution)
          val (ck, ids) = checkpointTracked(ranks)
          releaseTracked(ranks.sparkSession, prevCkpt)
          prevCkpt = ids
          ranks = ck
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
            dm * dampingPpm / 1000000L / n
          }
        ranks = nodes
          .join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit(base + dShare) + coalesce(col("in_mass"), lit(0L))).as("rank"))
        it += 1
      }
      if (danglingNodes != null) danglingNodes.unpersist()
      // ONE materializing pass (localCheckpoint also truncates the
      // iters-deep lineage, so downstream plans stay flat); the (node,
      // rank) blocks it stores are reclaimed by the ContextCleaner when
      // the frame is garbage-collected — unlike a persist() the caller
      // could never safely release
      val out = ranks.select(col("node"), col("rank")).localCheckpoint(true)
      releaseTracked(out.sparkSession, prevCkpt) // the final iteration's blocks
      e2.unpersist()
      out
    } finally { nodes.unpersist(); e.unpersist() }
  }

  /** localCheckpoint plus the ids of the persistent-RDD entries it
    * created, so a superseded iteration's blocks can be released the
    * moment the next checkpoint has consumed them. Without this the
    * blocks wait for the Dataset to be garbage-collected AND the
    * ContextCleaner to run — unbounded lag in a long-lived driver. */
  private def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val ck = df.localCheckpoint(eager = true)
    // Track ONLY the RDD this checkpoint persisted — the LogicalRDD leaf
    // the returned frame wraps. A global before/after diff of
    // sc.getPersistentRDDs would also capture RDDs persisted by CONCURRENT
    // jobs on the shared context, and releasing a foreign localCheckpoint's
    // blocks is unrecoverable (lineage truncated): the victim job fails
    // with missing-block errors instead of recomputing.
    val ids = ck.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }.toSet
    (ck, ids)
  }

  private def releaseTracked(spark: SparkSession, ids: Set[Int]): Unit = {
    if (ids.nonEmpty) {
      val live = spark.sparkContext.getPersistentRDDs
      val rdds = ids.flatMap(live.get)
      if (rdds.nonEmpty) quietRddWarns {
        rdds.foreach(_.unpersist(blocking = false))
      }
    }
  }

  /** Unpersisting a CONSUMED localCheckpoint is the whole point of the
    * tracked release, but RDD.unpersist WARNs "lineage ... truncated and
    * cannot be recomputed after unpersisting" for every such block-set —
    * one spurious warning per iteration per run, emitted by the CONCRETE
    * subclass logger (MapPartitionsRDD et al.). Expected and safe here
    * (the next checkpoint has already materialized), so drop the rdd
    * package logger to ERROR for the duration of the call and restore. */
  private val rddWarnLock = new Object
  private var rddWarnDepth = 0
  private var rddWarnPrev: org.apache.logging.log4j.Level = null

  private def quietRddWarns[A](body: => A): A = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    // already quiet (graft's mains and specs pin the emitting logger once
    // at startup): skip — Configurator.setLevel REBUILDS the logger
    // configuration (~tens of ms), and paid twice per iteration it showed
    // up as a 25-35% graph-query regression in the r20 sweep
    if (!LogManager.getLogger("org.apache.spark.rdd.MapPartitionsRDD").isWarnEnabled)
      return body
    // refcounted toggle: concurrent graph queries on the shared context
    // otherwise interleave set/restore — one thread's restore could undo
    // another's pin, or persist ERROR past the block process-wide
    val name = "org.apache.spark.rdd"
    rddWarnLock.synchronized {
      if (rddWarnDepth == 0) {
        rddWarnPrev = LogManager.getLogger(name).getLevel
        Configurator.setLevel(name, Level.ERROR)
      }
      rddWarnDepth += 1
    }
    try body finally rddWarnLock.synchronized {
      rddWarnDepth -= 1
      if (rddWarnDepth == 0) Configurator.setLevel(name, rddWarnPrev)
    }
  }

  /** The SAME expected warning also fires when the ContextCleaner (its
    * own thread — out of reach of the call-scoped guard above) releases a
    * dropped checkpoint's blocks after the frame is garbage-collected.
    * Graft's own batch mains and specs call this once per process to pin
    * the one emitting logger to ERROR; library users who want the
    * warning keep it (nothing is touched unless this is called). */
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
    * count over the edge list, nothing row-wise on the driver. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 50, s"hits: iters must be in [1,50], got $iters")
    val HitsMass = 1000000000L
    val e = edges
      .select(col(srcCol).cast(LongType).as("src"), col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    try {
      require(nodes.count() > 0, "hits: edge frame has no valid edges")
      // a half-step's checkpoint blocks become releasable once the
      // checkpoint TWO half-steps later has materialized (h_{k-1} feeds
      // only a_k; a_{k-1} feeds only h_{k-1} and is superseded by a_k) —
      // same eager-release discipline as pageRank's redistribute loop
      var pending: List[Set[Int]] = Nil
      def normalize(raw0: DataFrame, outCol: String): DataFrame = {
        // Unlike pageRank (no mid-loop actions, ONE materializing pass at
        // the end), the L1 quotient is data-dependent, forcing a scalar
        // action per half-step — so each half-step MUST cut its lineage
        // first, or action k re-executes half-steps 1..k-1 from scratch
        // (measured 7x wall on the bench graph).
        val (raw, ids) = checkpointTracked(raw0)
        pending = pending :+ ids
        if (pending.size > 2) {
          releaseTracked(raw.sparkSession, pending.head)
          pending = pending.tail
        }
        // Σraw is one Long scalar (bounded driver state); div not `/` —
        // the long `/` is double division and drops low bits past 2^53
        val total = raw.agg(sum("raw")).head().getLong(0)
        val q = total / HitsMass + 1
        raw.select(col("node"), expr(s"raw div ${q}L").as(outCol))
      }
      def halfStep(scores: DataFrame, scoreCol: String,
                   joinKey: String, groupKey: String): DataFrame =
        nodes.join(
          scores.join(e, scores("node") === e(joinKey))
            .groupBy(col(groupKey).as("node")).agg(sum(scoreCol).as("m")),
          Seq("node"), "left")
          .select(col("node"), coalesce(col("m"), lit(0L)).as("raw"))
      var h = nodes.withColumn("h", lit(HitsMass))
      var a: DataFrame = null
      var it = 0
      while (it < iters) {
        a = normalize(halfStep(h, "h", "src", "dst"), "a")
        h = normalize(halfStep(a, "a", "dst", "src"), "h")
        it += 1
      }
      val out = h.join(a, Seq("node"))
        .select(col("node"), col("h").as("hub"), col("a").as("authority"))
        .localCheckpoint(true)
      pending.foreach(releaseTracked(out.sparkSession, _)) // final a & h blocks
      out
    } finally { nodes.unpersist(); e.unpersist() }
  }
}

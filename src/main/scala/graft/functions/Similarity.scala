package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Vector similarity search over an embedding column (`array<float>`):
 * cosine primitives, brute-force top-k (the exact baseline), LSH-bucketed
 * ANN (random hyperplanes) and embedding-cosine near-dup pairs — all pure
 * Column expressions (zip_with/aggregate HOFs), no UDFs.
 */
object Similarity {

  /** Codegen'd cosine ([[graft.expressions.CosineSim]], SQL `cosine_sim`)
    * for BULK pair scoring — one JIT'd loop per pair vs the HOF
    * [[cosine]]'s per-element lambda dispatch (measured 12x on the
    * embedding-dedup probe). Identical arithmetic shape, so swapping the
    * two never changes a result bit. Float-vector inputs only. */
  private def fastCos(spark: org.apache.spark.sql.SparkSession)(a: Column, b: Column): Column = {
    graft.expressions.GraftFunctions.register(spark)
    call_function("cosine_sim", a, b)
  }

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; null when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm(a); val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb))
  }

  /** Exact brute-force top-k by cosine against a single query vector.
    * One narrow scan + a driver-side k-row sort: the correctness baseline
    * every ANN variant is measured against. At scale the scan distributes
    * perfectly (no shuffle before the final top-k, which Spark executes as
    * per-partition TakeOrdered + merge). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = typedlit(query)
    df.select(col(idCol).cast(LongType).as("id"),
        round(fastCos(df.sparkSession)(col(vecCol), q), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  /** Int8-quantized brute-force top-k with exact rerank. Per-vector
    * symmetric quantization (scale = max|x|/127, component = round(x/scale)
    * ∈ [-127,127]) is the standard production first pass for a
    * bandwidth-bound ANN scan — at 100 TB the quantized corpus is 4× less
    * scan traffic, and the narrow shape (scan → TakeOrdered(rerank) → exact
    * top-k) is unchanged from [[bruteForceTopK]]. The approximate score
    * `⟨qa,qb⟩·sa·sb` keeps all arithmetic in doubles over integer-valued
    * components, so the candidate set is bit-reproducible (integer sums are
    * exact — no float summation-order sensitivity) and an SQL oracle can
    * mirror it. The top `rerank` candidates are re-scored with exact float
    * cosine; with rerank ≫ k the int8 candidate stage virtually never
    * excludes a true top-k neighbor (verified vs bruteForceTopK in
    * FunctionsSpec). */
  def quantizedTopK(df: DataFrame, idCol: String, vecCol: String,
                    query: Seq[Float], k: Int, rerank: Int = 50): DataFrame = {
    // driver-side query quantization — HALF_UP away from zero, matching
    // Spark SQL / DuckDB `round` (math.round would round -2.5 to -2)
    def halfUp(x: Double): Double =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
    val qScale = query.map(x => math.abs(x.toDouble)).max / 127.0
    val qVec = query.map(x => if (qScale > 0) halfUp(x.toDouble / qScale) else 0.0)
    val cScale = aggregate(transform(col(vecCol), x => abs(x.cast("double"))),
      lit(0.0), (a, x) => greatest(a, x)) / lit(127.0)
    val quantized = df
      .withColumn("__q_s__", cScale)
      .withColumn("__q_v__",
        when(col("__q_s__") > 0,
          transform(col(vecCol), x => round(x.cast("double") / col("__q_s__"))))
          .otherwise(transform(col(vecCol), _ => lit(0.0))))
    val approx = aggregate(zip_with(col("__q_v__"), typedlit(qVec), _ * _),
      lit(0.0), _ + _) * col("__q_s__") * lit(qScale)
    val candidates = quantized
      .withColumn("__q_a__", approx)
      .orderBy(col("__q_a__").desc, col(idCol).asc)
      .limit(rerank)
    candidates
      .select(col(idCol).cast(LongType).as("id"),
        round(cosine(col(vecCol), typedlit(query)), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 sign — reproducible across the cluster with no RNG state. */
  private def planeComponent(plane: Int, dim: Column): Column =
    when(xxhash64(lit(plane), dim).bitwiseAND(1) === 1, 1.0).otherwise(-1.0)

  /** Random-hyperplane LSH bucket key: `numPlanes` sign bits packed into a
    * long. Cosine-close vectors collide with high probability. */
  def lshBucket(vecCol: Column, numPlanes: Int = 16): Column = {
    val bits = (0 until numPlanes).map { p =>
      val s = aggregate(
        zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(s > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k via LSH buckets: score only vectors in the query's bucket
    * (fall back to brute force if the bucket has < k hits is the caller's
    * choice). The scale path: bucket key is computed in the scan, the
    * bucket filter prunes before any sort. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, numPlanes: Int = 8): DataFrame = {
    val q = typedlit(query)
    val qBucket = lshBucket(q, numPlanes)
    df.filter(lshBucket(col(vecCol), numPlanes) === qBucket)
      .select(col(idCol).cast(LongType).as("id"),
        round(cosine(col(vecCol), q), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  // ----------------------------------------------- multi-table (OR) LSH
  // Single-bucket AND-only LSH (lshTopK above) loses recall as numPlanes
  // grows: P(all planes agree) decays exponentially. The standard fix is
  // OR-amplification — L independent plane sets ("tables"); a vector is a
  // candidate if it matches the query's bucket in ANY table — then exact
  // cosine rerank of the (small) candidate union. Recall 1−(1−p^P)^L vs p^P.

  /** Deterministic ±1 hyperplane sign for (table, plane, dim): splitmix64
    * mix of the packed coordinates — reproducible anywhere with no RNG
    * state, including the DuckDB oracle which embeds the same signs as
    * literals (see `planesSqlValues`). */
  private[functions] def planeSign(table: Int, plane: Int, dim: Int): Double = {
    val h = Dedup.mix64((table.toLong << 40) ^ (plane.toLong << 20) ^ dim.toLong)
    if ((h & 1L) == 1L) 1.0 else -1.0
  }

  private[functions] def planeMatrix(table: Int, numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim)((p, d) => planeSign(table, p, d))

  /** Bucket of one vector under one table's plane set: sign bits packed into
    * a long. Plain JVM math — used on the driver for the query vector and in
    * the scan kernel for every row, so both sides share one code path. */
  private[functions] def bucketOf(v: Array[Float], planes: Array[Array[Double]]): Long = {
    var b = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var s = 0.0
      var i = 0
      val n = math.min(pl.length, v.length)
      while (i < n) { s += v(i) * pl(i); i += 1 }
      if (s > 0) b |= (1L << p)
      p += 1
    }
    b
  }

  /** DuckDB `(table, plane, signs)` VALUES rows for the same sign matrix the
    * Spark side uses — the oracle's single source of truth. */
  def planesSqlValues(numTables: Int, numPlanes: Int, dim: Int): String =
    (for (t <- 0 until numTables; p <- 0 until numPlanes) yield {
      val signs = (0 until dim)
        .map(d => if (planeSign(t, p, d) > 0) "1" else "-1").mkString(",")
      s"($t, $p, [$signs]::DOUBLE[])"
    }).mkString(",\n             ")

  /** OR-amplified ANN top-k: candidate = bucket match in ANY of `numTables`
    * independent plane sets, then exact cosine rerank. One narrow scan
    * (mapPartitions kernel, tight loops over the L×P sign matrix), no
    * shuffle before the final TakeOrdered — the 100 TB shape. At selective
    * plane counts (P ≥ 12) this is the recall-safe replacement for the
    * single-probe `lshTopK`. */
  def lshTopKMultiTable(df: DataFrame, idCol: String, vecCol: String,
                        query: Seq[Float], k: Int,
                        numPlanes: Int = 12, numTables: Int = 4): DataFrame = {
    require(numPlanes <= 63, "numPlanes must fit in a long bucket key")
    val spark = df.sparkSession
    import spark.implicits._
    val qArr = query.toArray
    val tables = Array.tabulate(numTables)(t => planeMatrix(t, numPlanes, qArr.length))
    val qBuckets = tables.map(bucketOf(qArr, _))
    var qs = 0.0
    qArr.foreach(x => qs += x.toDouble * x.toDouble)
    val qNorm = math.sqrt(qs)
    df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (id, v) =>
          var hit = false
          var t = 0
          while (!hit && t < tables.length) {
            if (bucketOf(v, tables(t)) == qBuckets(t)) hit = true
            t += 1
          }
          if (!hit) None
          else {
            var dot = 0.0
            var s = 0.0
            var i = 0
            while (i < v.length) {
              dot += v(i).toDouble * qArr(i)
              s += v(i).toDouble * v(i)
              i += 1
            }
            val n = math.sqrt(s)
            if (n > 0 && qNorm > 0) Some((id, dot / (n * qNorm))) else None
          }
        }
      }.toDF("id", "cos_sim")
      .select(col("id"), round(col("cos_sim"), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  /** Banded bucket expansion for one side of an ANN join: (id, tbl, bucket)
    * per table — a single narrow kernel pass; the plane matrices are built
    * lazily from the first vector's dimension so no driver action is
    * needed. */
  private def bandedBuckets(df: DataFrame, idCol: String, vecCol: String,
                            numPlanes: Int, numTables: Int,
                            outId: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        var tables: Array[Array[Array[Double]]] = null
        it.flatMap { case (id, v) =>
          if (tables == null)
            tables = Array.tabulate(numTables)(t => planeMatrix(t, numPlanes, v.length))
          tables.indices.map(t => (id, t, bucketOf(v, tables(t))))
        }
      }.toDF(outId, "tbl", "bucket")
  }

  /** Batch ANN JOIN — for every row of `queries`, the top-k rows of
    * `corpus` by cosine (the embedding-retrieval shape: millions of queries
    * against a billion-vector corpus, never all-pairs). Candidates come
    * from the OR'd multi-table bucket equi-join (one shuffle per side on
    * (table, bucket)); only the candidate ids travel, vectors re-join
    * after the distinct; exact cosine rerank + per-query top-k via
    * row_number (Spark executes it as WindowGroupLimit — partial top-k
    * before the final shuffle). Output: (q_id, c_id, cos_sim, rk). */
  def annJoin(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, numPlanes: Int = 8, numTables: Int = 8): DataFrame = {
    require(numPlanes <= 63, "numPlanes must fit in a long bucket key")
    val qb = bandedBuckets(queries, idCol, vecCol, numPlanes, numTables, "q_id")
    val cb = bandedBuckets(corpus, idCol, vecCol, numPlanes, numTables, "c_id")
    val cand = qb.join(cb, Seq("tbl", "bucket")).select("q_id", "c_id").distinct()
    val qv = queries.select(col(idCol).cast(LongType).as("q_id"), col(vecCol).as("q_vec"))
    val cv = corpus.select(col(idCol).cast(LongType).as("c_id"), col(vecCol).as("c_vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id").asc)
    cand.join(qv, "q_id").join(cv, "c_id")
      .withColumn("cos_sim", round(fastCos(queries.sparkSession)(col("q_vec"), col("c_vec")), 4))
      .filter(col("cos_sim").isNotNull)
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select("q_id", "c_id", "cos_sim", "rk")
  }

  /** Delta-vs-index embedding near-dedup — the vector twin of the text
    * tier's `Dedup.dedupNearIncrementalIndexed` and the signature tier's
    * `Images.sigDedupIncremental`: a delta row drops if its cosine to ANY
    * persisted index vector exceeds `threshold`, and within the delta an
    * earlier (smaller-id) row condemns a later one — identical pair
    * semantics to the sig face. Candidates come from the OR'd multi-table
    * LSH bucket equi-join (never an all-pairs scan; exact cosine verifies
    * only bucket collisions). OR-amplified recall applies: byte-identical
    * copies collide in EVERY table (recall 1 — the gate's configuration);
    * looser near-dups are found with recall 1−(1−p^P)^L like every LSH
    * path here. Index schema: (id, vec). Returns kept delta rows. */
  def embeddingDedupIncremental(delta: DataFrame, index: DataFrame, idCol: String,
                                vecCol: String, threshold: Double,
                                numPlanes: Int = 12, numTables: Int = 4): DataFrame = {
    require(numPlanes <= 63, "numPlanes must fit in a long bucket key")
    // Vectors RIDE the (tbl, bucket) exchange (numTables copies of each
    // side) and the verify runs directly on the collision rows through the
    // codegen'd `cosine_sim` expression (ONE tight loop per pair — the HOF
    // cosine interprets a lambda per element, untenable at 10^7 pairs): a
    // pair colliding in several tables is verified up to numTables times,
    // but the plan needs NO candidate distinct and NO re-join of the
    // candidate list back to the vectors by id. Only the condemned ids
    // are deduped (a tiny set). Probe legs in PLANS.md.
    graft.expressions.GraftFunctions.register(delta.sparkSession)
    def sim(a: Column, b: Column): Column =
      org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
    val dbv = bandedBucketsVec(delta, idCol, vecCol, numPlanes, numTables, "a_id", "a_vec")
    val iv = index.select(col("id").cast(LongType).as("b_id"), col("vec").as("b_vec"))
    val ibv = bandedBucketsVec(iv, "b_id", "b_vec", numPlanes, numTables, "b_id", "b_vec")
    val vsIndex = dbv.join(ibv, Seq("tbl", "bucket"))
      .filter(sim(col("a_vec"), col("b_vec")) > threshold)
      .select(col("a_id").as("drop_id"))
    val within = dbv.join(
        dbv.select(col("a_id").as("b_id"), col("a_vec").as("b_vec"),
          col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .filter(sim(col("a_vec"), col("b_vec")) > threshold)
      .select(col("b_id").as("drop_id")) // (a < b) condemns b
    val condemned = vsIndex.union(within).distinct()
    delta.join(condemned, col(idCol).cast(LongType) === col("drop_id"), "left_anti")
  }

  /** [[bandedBuckets]] with the vector carried through: (id, vec, tbl,
    * bucket) per table — lets the verify run on the bucket-join output
    * directly instead of re-joining candidates to vectors by id. */
  private def bandedBucketsVec(df: DataFrame, idCol: String, vecCol: String,
                               numPlanes: Int, numTables: Int,
                               outId: String, outVec: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        var tables: Array[Array[Array[Double]]] = null
        it.flatMap { case (id, v) =>
          if (tables == null)
            tables = Array.tabulate(numTables)(t => planeMatrix(t, numPlanes, v.length))
          tables.indices.map(t => (id, v, t, bucketOf(v, tables(t))))
        }
      }.toDF(outId, outVec, "tbl", "bucket")
  }

  // --------------------------------------------------------------- IVF
  // Inverted-file ANN: partition the corpus into `nlist` cells around
  // centroids; a query probes only the `nprobe` nearest cells and reranks
  // exactly. The third classic ANN family next to brute force and LSH. At
  // 100 TB the cell id from `ivfAssign` is the Hive partition key — write
  // the corpus `partitionBy("cell")` and the probe filter prunes whole
  // partitions at the scan, so a query touches nprobe/nlist of the data.

  /** Deterministic IVF centroids: seeds are the `iters == 0`-replicable
    * `nlist` in-scope rows with the smallest ids (no RNG state — the DuckDB
    * oracle mirrors the same seed rule), optionally refined by `iters`
    * distributed Lloyd iterations: assignment is a broadcast-centroid
    * mapPartitions kernel (narrow), the update is one groupBy-sum shuffle
    * of (cell, sumVec, count) with map-side partial aggregation. Returned
    * centroids are ordered by seed id, so index == tie-break rank. */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String,
                   nlist: Int, iters: Int = 0): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
    var cents: Array[Array[Double]] = vecs.orderBy(col("id")).limit(nlist)
      .collect().map(_._2.map(_.toDouble))
    require(cents.nonEmpty, "ivfCentroids: input has no rows")
    var it = 0
    while (it < iters) {
      val b = spark.sparkContext.broadcast(cents)
      // (cell, sumVec, count) — reduceGroups does map-side partial combine,
      // so one nlist-row shuffle per iteration regardless of corpus size.
      val updated = vecs.mapPartitions { rows =>
        val cs = b.value
        val norms = cs.map(c => math.sqrt(c.map(x => x * x).sum))
        rows.map { case (_, v) =>
          (nearestCell(v, cs, norms), (v.map(_.toDouble), 1L))
        }
      }.groupByKey(_._1).mapValues(_._2)
        .reduceGroups { (a, b) =>
          val s = a._1.clone()
          var i = 0
          while (i < s.length) { s(i) += b._1(i); i += 1 }
          (s, a._2 + b._2)
        }.collect()
      val next = cents.clone()
      updated.foreach { case (cell, (sum, n)) => next(cell) = sum.map(_ / n) }
      cents = next // cells that captured no rows keep their previous centroid
      b.destroy()
      it += 1
    }
    cents
  }

  /** The IVF coarse stage alone: keep only (id, vec) rows falling in the
    * `nprobe` cells nearest the query — the reusable front half of
    * [[ivfTopK]], so other scorers (PQ-ADC in `Pq.ivfPqTopK`) can ride the
    * same partition-pruning. Output columns keep the caller's names. */
  def ivfProbeFilter(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], nlist: Int = 16, nprobe: Int = 4,
                     iters: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(df, idCol, vecCol, nlist, iters)
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val qArr = query.toArray
    val qNorm = math.sqrt(qArr.map(x => x.toDouble * x.toDouble).sum)
    val probed = cents.indices
      .map { c =>
        val sim =
          if (norms(c) > 0 && qNorm > 0) {
            var dot = 0.0
            var i = 0
            val n = math.min(qArr.length, cents(c).length)
            while (i < n) { dot += qArr(i).toDouble * cents(c)(i); i += 1 }
            dot / (norms(c) * qNorm)
          } else Double.NegativeInfinity
        (c, sim)
      }.sortBy { case (c, sim) => (-sim, c) }.take(nprobe).map(_._1).toSet
    val b = spark.sparkContext.broadcast((cents, norms, probed))
    df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val (cs, ns, probe) = b.value
        rows.filter { case (_, v) => probe.contains(nearestCell(v, cs, ns)) }
      }
      .toDF(idCol, vecCol)
  }

  /** Nearest centroid by cosine (ranking needs only dot/|c| — |v| factors
    * out); ties and the zero-vector degenerate case go to the smallest
    * cell id, matching the oracle's `ORDER BY sim DESC, cid ASC`. */
  private def nearestCell(v: Array[Float], cents: Array[Array[Double]],
                          norms: Array[Double]): Int = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      if (norms(c) > 0) {
        val cent = cents(c)
        var dot = 0.0
        var i = 0
        val n = math.min(v.length, cent.length)
        while (i < n) { dot += v(i).toDouble * cent(i); i += 1 }
        val sim = dot / norms(c)
        if (sim > bestSim) { bestSim = sim; best = c }
      }
      c += 1
    }
    best
  }

  /** Tag every row with its IVF cell — the build side of the index. Persist
    * this (or write it `partitionBy("cell")`) once and every query's probe
    * filter becomes partition pruning instead of a full scan. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(centroids)
    df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val cs = b.value
        val norms = cs.map(c => math.sqrt(c.map(x => x * x).sum))
        rows.map { case (id, v) => (id, v, nearestCell(v, cs, norms)) }
      }.toDF("id", "vec", "cell")
  }

  /** IVF ANN top-k: find the `nprobe` cells nearest the query, then one
    * narrow kernel pass assigns + filters + scores in the same loop (no
    * materialized assignment, no shuffle before the final TakeOrdered).
    * `iters = 0` keeps the raw seed vectors as centroids — the exact
    * configuration the `q_ann_ivf` DuckDB oracle replicates; production
    * callers pass `iters ≥ 2` for real k-means cells and precompute
    * `ivfCentroids`/`ivfAssign` once per corpus. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(df, idCol, vecCol, nlist, iters)
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val qArr = query.toArray
    val qNorm = math.sqrt(qArr.map(x => x.toDouble * x.toDouble).sum)
    // nprobe nearest cells to the query, same tie-break as assignment
    val probed = cents.indices
      .map { c =>
        val sim =
          if (norms(c) > 0 && qNorm > 0) {
            var dot = 0.0
            var i = 0
            val n = math.min(qArr.length, cents(c).length)
            while (i < n) { dot += qArr(i).toDouble * cents(c)(i); i += 1 }
            dot / (norms(c) * qNorm)
          } else Double.NegativeInfinity
        (c, sim)
      }.sortBy { case (c, sim) => (-sim, c) }.take(nprobe).map(_._1).toSet
    val b = spark.sparkContext.broadcast((cents, norms, probed))
    df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val (cs, ns, probe) = b.value
        rows.flatMap { case (id, v) =>
          if (!probe.contains(nearestCell(v, cs, ns))) None
          else {
            var dot = 0.0
            var s = 0.0
            var i = 0
            while (i < v.length) {
              dot += v(i).toDouble * qArr(i)
              s += v(i).toDouble * v(i)
              i += 1
            }
            val n = math.sqrt(s)
            if (n > 0 && qNorm > 0) Some((id, dot / (n * qNorm))) else None
          }
        }
      }.toDF("id", "cos_sim")
      .select(col("id"), round(col("cos_sim"), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  /** Exact cosine near-duplicate pairs via a distributed block-pair
    * exchange (the classic triangle/theta all-pairs join): the id space is
    * partitioned into `ceil(n / blockRows)` blocks by `id mod numBlocks`,
    * every row is replicated executor-side to the block PAIRS (i ≤ j) its
    * block participates in — a plain hash shuffle Catalyst schedules, NO
    * driver collect — and each pair group runs the tight dot-product kernel
    * with one block buffered and the other streamed. Each unordered pair is
    * emitted exactly once: diagonal groups require a_id < b_id, off-diagonal
    * groups normalize orientation by id. ~100× the throughput of interpreted
    * HOF expressions on a cross join, with identical double-precision
    * results (same accumulation order).
    *
    * Scale shape: shuffle volume is n·(numBlocks+1) rows = O(n²/blockRows)
    * — the inherent cost of exact all-pairs, but now spread across
    * executors instead of transiting the driver serially (the round-8 shape
    * collected every block to the driver: bounded memory, unbounded time).
    * Per-task memory is one buffered block (≤ blockRows vectors). At 100 TB
    * raise `blockRows` to the executor memory budget, or use
    * `cosinePairs(bucketed = true)` / LSH-ANN to prune candidates instead
    * of scanning all pairs. */
  def cosinePairsBlocked(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, blockRows: Int = 200000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // persist: count + both replicated sides read the decoded vectors from
    // cache instead of re-running the source scan three times.
    // MEMORY_AND_DISK so an over-memory cache spills, not re-scans.
    val vecs = df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = vecs.count()
    // Block size balances task overhead against parallelism and memory: a
    // ~4k-row block means ~16M dot-ops per pair group (enough to amortize a
    // task), n²/16M groups total (plenty of fan-out once n is big enough to
    // matter), and a per-task buffer far under any executor budget.
    // `blockRows` still caps the buffer when the caller sets it lower.
    val targetBlock = math.min(blockRows, 4096)
    val numBlocks = math.max(1L, (n + targetBlock - 1) / targetBlock).toInt

    def blockOf(id: Long): Int = java.lang.Math.floorMod(id, numBlocks.toLong).toInt
    // ONE tagged replication stream → ONE shuffle: a row of block b ships
    // once to its diagonal group (side 2) and once per off-diagonal pair it
    // participates in (side 0 = lower block of the pair, side 1 = upper).
    val tagged = vecs.flatMap { case (id, v) =>
      val b = blockOf(id)
      Iterator.single((b.toLong * numBlocks + b, 2.toByte, id, v)) ++
        (b + 1 until numBlocks).iterator.map(j => (b.toLong * numBlocks + j, 0.toByte, id, v)) ++
        (0 until b).iterator.map(i => (i.toLong * numBlocks + b, 1.toByte, id, v))
    }
    val pairs = tagged.groupByKey(_._1).flatMapGroups { (key, it) =>
      val diagonal = (key / numBlocks) == (key % numBlocks)
      // buffer both sides as primitive-array matrices with precomputed norms
      // (≤ 2 blocks per task); diagonal groups carry one side only
      val aIds = scala.collection.mutable.ArrayBuffer.empty[Long]
      val aMat = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      val aNorms = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bIds = scala.collection.mutable.ArrayBuffer.empty[Long]
      val bMat = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      val bNorms = scala.collection.mutable.ArrayBuffer.empty[Double]
      it.foreach { case (_, side, id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
        if (side == 1.toByte) { bIds += id; bMat += v; bNorms += math.sqrt(s) }
        else { aIds += id; aMat += v; aNorms += math.sqrt(s) }
      }
      val (xIds, xMat, xNorms) = (aIds, aMat, aNorms)
      val (yIds, yMat, yNorms) = if (diagonal) (aIds, aMat, aNorms) else (bIds, bMat, bNorms)
      val out = List.newBuilder[(Long, Long, Double)]
      var j = 0
      while (j < yIds.length) {
        val bid = yIds(j); val bv = yMat(j); val bNorm = yNorms(j)
        var i = 0
        while (i < xIds.length) {
          val aid = xIds(i)
          // diagonal: same block both sides — keep a < b to emit each
          // unordered pair once; off-diagonal: all cross pairs qualify
          if ((if (diagonal) aid < bid else true) && bNorm > 0 && xNorms(i) > 0) {
            val w = xMat(i)
            var dot = 0.0; var k = 0
            while (k < bv.length) { dot += bv(k).toDouble * w(k).toDouble; k += 1 }
            val sim = dot / (bNorm * xNorms(i))
            if (sim >= threshold)
              out += ((math.min(aid, bid), math.max(aid, bid), sim))
          }
          i += 1
        }
        j += 1
      }
      out.result()
    }
    // Materialize now so the cached vecs can be released immediately instead
    // of leaking until the caller's action; the checkpointed result is only
    // the matched pairs — small at any near-dup threshold.
    val result = pairs
      .toDF("a_id", "b_id", "cos_sim")
      .select(col("a_id"), col("b_id"), round(col("cos_sim"), 4).as("cos_sim"))
      .localCheckpoint()
    vecs.unpersist()
    result
  }

  // ---------------------------------------------------- semantic dedup
  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public): cluster the
    * embedding space with k-means, then prune near-duplicates WITHIN each
    * cluster only — O(n²/nlist) comparisons instead of O(n²), the trick
    * that made embedding-level dedup tractable at LAION/web scale. A row is
    * dropped iff an EARLIER row (smaller id) of the SAME cluster sits above
    * `threshold` cosine — the paper's upper-triangular max rule (a point is
    * removed when max sim to any prior cluster member exceeds ε, whether or
    * not that member itself survived). Deterministic, independent of
    * partitioning, and expressible as a NOT EXISTS for the SQL oracle.
    * Returns survivors as (id, cell).
    *
    * Scale shape: centroid fit is `ivfCentroids` (broadcast-assign + one
    * nlist-row shuffle per Lloyd iteration), assignment a narrow broadcast
    * kernel, and the prune ONE groupByKey shuffle keyed by cell. Each
    * cluster prunes in memory via an early-exit triangular scan — per-task
    * memory is O(cluster size), which is the SemDeDup deployment model:
    * size `nlist` so corpus/nlist vectors fit one executor core (the paper
    * runs ~100k clusters for LAION-scale corpora), mirroring its
    * per-cluster similarity matrices. `iters = 0` keeps the deterministic
    * smallest-id seed centroids the DuckDB oracle replicates; production
    * callers pass `iters ≥ 2` for real k-means cells. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, nlist: Int = 16, iters: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(df, idCol, vecCol, nlist, iters)
    ivfAssign(df, idCol, vecCol, cents)
      .as[(Long, Array[Float], Int)]
      .groupByKey(_._3)
      .flatMapGroups { (cell, rows) =>
        // ids ascending: the drop rule only ever looks at earlier rows
        val members = rows.toArray.sortBy(_._1)
        val n = members.length
        val norms = new Array[Double](n)
        var i = 0
        while (i < n) {
          val v = members(i)._2
          var s = 0.0
          var k = 0
          while (k < v.length) { s += v(k).toDouble * v(k).toDouble; k += 1 }
          norms(i) = math.sqrt(s)
          i += 1
        }
        val kept = List.newBuilder[(Long, Int)]
        i = 0
        while (i < n) {
          val vi = members(i)._2
          var dup = false
          var j = 0
          while (j < i && !dup) {
            // zero-norm vectors have no defined angle — never a duplicate
            if (norms(i) > 0 && norms(j) > 0) {
              val vj = members(j)._2
              var dot = 0.0
              var k = 0
              val len = math.min(vi.length, vj.length)
              while (k < len) { dot += vi(k).toDouble * vj(k).toDouble; k += 1 }
              if (dot / (norms(i) * norms(j)) > threshold) dup = true
            }
            j += 1
          }
          if (!dup) kept += ((members(i)._1, cell))
          i += 1
        }
        kept.result().iterator
      }
      .toDF("id", "cell")
      .select(col("id"), col("cell").cast(LongType).as("cell"))
  }

  /** Embedding-cosine near-duplicate pairs with similarity ≥ threshold.
    * The `bucketed` variant prunes candidate pairs through LSH buckets
    * (one shuffle on the bucket key) instead of the full cross join; the
    * plain variant is the exact oracle-checkable version, to be bounded by
    * the caller via pre-filtering. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
                  bucketed: Boolean = false, numPlanes: Int = 8): DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
    val (a, b) =
      if (bucketed) {
        val withB = base.withColumn("bucket", lshBucket(col("vec"), numPlanes))
        (withB.toDF("a_id", "a_vec", "bucket"), withB.toDF("b_id", "b_vec", "bucket"))
      } else (base.toDF("a_id", "a_vec"), base.toDF("b_id", "b_vec"))
    val joined =
      if (bucketed) a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      else a.crossJoin(b).filter(col("a_id") < col("b_id"))
    joined
      .withColumn("cos_sim", fastCos(df.sparkSession)(col("a_vec"), col("b_vec")))
      .filter(col("cos_sim") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos_sim"), 4).as("cos_sim"))
  }
}

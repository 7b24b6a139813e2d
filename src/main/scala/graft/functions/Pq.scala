package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Product quantization ANN (Jégou, Douze, Schmid: "Product Quantization for
 * Nearest Neighbor Search", TPAMI 2011) — the billion-scale memory path: a
 * D-dim vector compresses to `m` one-byte codes (argmin centroid per
 * subspace), and a query scans codes with an ADC lookup table instead of
 * floats. At 100 TB the PQ-coded corpus is D*4/m times less scan traffic
 * (64-dim float -> 8 bytes = 32x), and the scan shape stays
 * narrow-projection -> TakeOrderedAndProject, no shuffle.
 *
 * Determinism contract (the oracle-gate discipline shared with the
 * quantized/LSH variants): vectors are L2-normalized and quantized to an
 * integer grid (round(x/||v||*256) — sqrt/divide/multiply are IEEE
 * correctly-rounded, so DuckDB computes the IDENTICAL integers), every
 * distance is an exact integer sum, and ties break to the lowest centroid
 * index. The `iters = 0` codebook is the first `ksub` vectors' sub-slices
 * (the q_ann_ivf seeding pattern — reproducible in SQL); `iters > 0` runs
 * distributed Lloyd refinement per subspace (spec-covered: the quantization
 * objective must decrease) where each step stays integer-exact (LONG sums,
 * one correctly-rounded division, HALF_UP re-quantization).
 *
 * The per-row encode+ADC is a fused codegen expression
 * ([[graft.expressions.PqAdcDistance]]) with the codebook and query LUT as
 * plan reference objects (m*ksub*subDim ints + m*ksub longs — a few KB).
 */
object Pq {
  /** HALF_UP (away from zero) — matches Spark SQL and DuckDB `round`. */
  def halfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Normalize-and-quantize one vector to the integer grid. */
  def quantize(v: Array[Double], scale: Int): Array[Int] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val n = math.sqrt(ss)
    require(n > 0, "pq: zero vector cannot be normalized")
    val out = new Array[Int](v.length)
    i = 0
    while (i < v.length) { out(i) = halfUp(v(i) / n * scale).toInt; i += 1 }
    out
  }

  /** Exact integer L2^2 between a quantized subvector (emb, offset) and a
    * codebook row (flat layout [(s*ksub + j)*subDim + i]). */
  private def subDist(q: Array[Int], off: Int, codebook: Array[Int], base: Int, subDim: Int): Long = {
    var dist = 0L
    var i = 0
    while (i < subDim) {
      val d = (q(off + i) - codebook(base + i)).toLong
      dist += d * d
      i += 1
    }
    dist
  }

  /** Encode one quantized vector: argmin centroid per subspace (ties ->
    * lowest j). Returns the m codes. */
  def encode(q: Array[Int], codebook: Array[Int], m: Int, ksub: Int, subDim: Int): Array[Int] = {
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Long.MaxValue
      var bestJ = 0
      var j = 0
      while (j < ksub) {
        val d = subDist(q, s * subDim, codebook, (s * ksub + j) * subDim, subDim)
        if (d < best) { best = d; bestJ = j }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    codes
  }

  /** Fused encode + ADC: the asymmetric distance of one raw vector to the
    * query via its nearest codebook entries. `emb` is the raw (float)
    * embedding; quantization happens inside so the expression is a single
    * kernel call per row. */
  def adcDistance(emb: Array[Double], scale: Int, codebook: Array[Int],
                  lut: Array[Long], m: Int, ksub: Int, subDim: Int): Long = {
    val q = quantize(emb, scale)
    var total = 0L
    var s = 0
    while (s < m) {
      var best = Long.MaxValue
      var bestJ = 0
      var j = 0
      while (j < ksub) {
        val d = subDist(q, s * subDim, codebook, (s * ksub + j) * subDim, subDim)
        if (d < best) { best = d; bestJ = j }
        j += 1
      }
      total += lut(s * ksub + bestJ)
      s += 1
    }
    total
  }

  /** The mean quantization error (objective Lloyd minimizes), for specs. */
  def quantizationError(vectors: Seq[Array[Int]], codebook: Array[Int],
                        m: Int, ksub: Int, subDim: Int): Double = {
    var total = 0L
    vectors.foreach { q =>
      var s = 0
      while (s < m) {
        var best = Long.MaxValue
        var j = 0
        while (j < ksub) {
          val d = subDist(q, s * subDim, codebook, (s * ksub + j) * subDim, subDim)
          if (d < best) best = d
          j += 1
        }
        total += best
        s += 1
      }
    }
    total.toDouble / math.max(1, vectors.size)
  }

  /** Codebook: seed from the first `ksub` vectors' sub-slices (by id —
    * deterministic, SQL-reproducible), then `iters` distributed Lloyd
    * passes per subspace. Bounded driver work: ksub seed rows + m*ksub
    * centroid rows per iteration (the nlist pattern from semanticDedup);
    * vectors themselves never collect. */
  def trainCodebook(df: DataFrame, idCol: String, vecCol: String, dims: Int,
                    m: Int, ksub: Int, scale: Int, iters: Int): Array[Int] = {
    val spark = df.sparkSession
    require(dims % m == 0, s"pq: dims $dims not divisible by m=$m subspaces")
    val subDim = dims / m

    // ---- codebook init: sub-slices of the first ksub vectors by id
    val seedRows: Array[Row] = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(ksub).collect()
    require(seedRows.length == ksub,
      s"pq: need at least ksub=$ksub vectors to seed the codebook, got ${seedRows.length}")
    var codebook = new Array[Int](m * ksub * subDim)
    seedRows.zipWithIndex.foreach { case (r, j) =>
      val q = quantize(r.getSeq[Double](1).toArray, scale)
      var s = 0
      while (s < m) {
        System.arraycopy(q, s * subDim, codebook, (s * ksub + j) * subDim, subDim)
        s += 1
      }
    }

    // ---- optional distributed Lloyd refinement (per subspace)
    var it = 0
    while (it < iters) {
      val cb = spark.sparkContext.broadcast(codebook)
      import spark.implicits._
      // (s, j, sums..., count) per subspace cluster — one shuffle of
      // m*ksub*(subDim+1) longs regardless of corpus size
      val assigned = df.select(col(vecCol).cast("array<double>").as("v"))
        .as[Array[Double]]
        .mapPartitions { rows =>
          rows.flatMap { v =>
            val q = quantize(v, scale)
            val codes = encode(q, cb.value, m, ksub, subDim)
            (0 until m).iterator.map { s =>
              val sums = new Array[Long](subDim)
              var i = 0
              while (i < subDim) { sums(i) = q(s * subDim + i).toLong; i += 1 }
              ((s, codes(s)), (sums, 1L))
            }
          }
        }
        .rdd.reduceByKey { (a, b) =>
          val sums = new Array[Long](subDim)
          var i = 0
          while (i < subDim) { sums(i) = a._1(i) + b._1(i); i += 1 }
          (sums, a._2 + b._2)
        }
        .collect() // bounded: at most m*ksub entries
      val next = codebook.clone() // empty clusters keep their old centroid
      assigned.foreach { case ((s, j), (sums, cnt)) =>
        var i = 0
        while (i < subDim) {
          next((s * ksub + j) * subDim + i) = halfUp(sums(i).toDouble / cnt).toInt
          i += 1
        }
      }
      cb.destroy()
      codebook = next
      it += 1
    }
    codebook
  }

  /** PQ top-k against one query vector: train/seed the codebook, build the
    * query LUT, scan with one fused expression ->
    * TakeOrderedAndProject(rerank) -> exact-cosine rerank to k. */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String, query: Seq[Float],
             k: Int = 10, m: Int = 8, ksub: Int = 16, rerank: Int = 100,
             scale: Int = 256, iters: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val dims = query.length
    val subDim = dims / m
    val codebook = trainCodebook(df, idCol, vecCol, dims, m, ksub, scale, iters)

    // ---- query LUT (driver, integer)
    val qq = quantize(query.map(_.toDouble).toArray, scale)
    val lut = new Array[Long](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        lut(s * ksub + j) = subDist(qq, s * subDim, codebook, (s * ksub + j) * subDim, subDim)
        j += 1
      }
      s += 1
    }

    // ---- scan: fused expression (model rides in the plan — a few KB)
    val fname = "graft_pq_adc_" + java.lang.Long.toHexString(
      java.util.Arrays.hashCode(codebook).toLong * 1000003L + java.util.Arrays.hashCode(lut))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(fname, {
      case Seq(e) => graft.expressions.PqAdcDistance(e, scale, codebook, lut, m, ksub, subDim)
      case other => throw new IllegalArgumentException(s"$fname takes 1 argument, got ${other.size}")
    }, "built-in")
    val candidates = df
      .withColumn("__pq_d__", call_function(fname, col(vecCol)))
      .orderBy(col("__pq_d__").asc, col(idCol).asc)
      .limit(rerank)
    candidates
      .select(col(idCol).cast(LongType).as("id"),
        round(Similarity.cosine(col(vecCol), typedlit(query)), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  /** Encode a corpus to PQ codes (m bytes per vector) against a codebook
    * trained here — the artifact a 100 TB deployment PERSISTS: scanning
    * m=8 one-byte codes instead of 64 floats is 32x less read bandwidth,
    * and that, not the ADC arithmetic, is where PQ pays (pqTopK over raw
    * floats decodes the float column anyway — measured at parity with
    * brute force locally; see PLANS.md). Returns (df + codesCol, codebook)
    * so queries can build LUTs against the same codebook. */
  def encodeVectors(df: DataFrame, idCol: String, vecCol: String, dims: Int,
                    codesCol: String = "pq_codes", m: Int = 8, ksub: Int = 16,
                    scale: Int = 256, iters: Int = 0): (DataFrame, Array[Int]) = {
    val codebook = trainCodebook(df, idCol, vecCol, dims, m, ksub, scale, iters)
    val spark = df.sparkSession
    val fname = "graft_pq_encode_" + java.lang.Long.toHexString(
      java.util.Arrays.hashCode(codebook).toLong * 1000003L + m * 31L + ksub)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(fname, {
      case Seq(e) => graft.expressions.PqEncode(e, scale, codebook, m, ksub, dims / m)
      case other => throw new IllegalArgumentException(s"$fname takes 1 argument, got ${other.size}")
    }, "built-in")
    (df.withColumn(codesCol, call_function(fname, col(vecCol))), codebook)
  }

  /** Top-k over a PRE-ENCODED codes frame: the scan touches only the
    * m-byte codes column (column pruning drops the floats), candidates
    * come from a pure LUT sum per row, and only the `rerank` survivors
    * join back to their float vectors for the exact rerank — at scale
    * that join reads `rerank` rows, not the corpus. */
  def pqTopKOnCodes(encoded: DataFrame, idCol: String, codesCol: String, vecCol: String,
                    query: Seq[Float], codebook: Array[Int],
                    k: Int = 10, m: Int = 8, ksub: Int = 16, rerank: Int = 100,
                    scale: Int = 256): DataFrame = {
    val spark = encoded.sparkSession
    val dims = query.length
    val subDim = dims / m
    val qq = quantize(query.map(_.toDouble).toArray, scale)
    val lut = new Array[Long](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        lut(s * ksub + j) = subDist(qq, s * subDim, codebook, (s * ksub + j) * subDim, subDim)
        j += 1
      }
      s += 1
    }
    val fname = "graft_pq_lut_" + java.lang.Long.toHexString(
      java.util.Arrays.hashCode(lut).toLong * 1000003L + m)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(fname, {
      case Seq(e) => graft.expressions.PqAdcFromCodes(e, lut, m, ksub)
      case other => throw new IllegalArgumentException(s"$fname takes 1 argument, got ${other.size}")
    }, "built-in")
    val candidates = encoded
      .select(col(idCol), col(codesCol)) // column-pruned: floats stay on disk
      .withColumn("__pq_d__", call_function(fname, col(codesCol)))
      .orderBy(col("__pq_d__").asc, col(idCol).asc)
      .limit(rerank)
    encoded.join(candidates.select(idCol), Seq(idCol), "left_semi")
      .select(col(idCol).cast(LongType).as("id"),
        round(Similarity.cosine(col(vecCol), typedlit(query)), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  /** IVF-PQ: the billion-scale composition — the IVF coarse quantizer
    * prunes the scan to the `nprobe` cells nearest the query (the fraction
    * of the corpus actually read), then PQ-ADC scores the survivors at 8
    * bytes/vector equivalent with the exact-cosine rerank on top. Both
    * stages keep their own deterministic seeding, so the whole composition
    * is oracle-reproducible (q_ann_ivfpq). The PQ codebook trains on the
    * SURVIVOR set — the residual-free variant: cells localize, codes
    * refine within the probed region. */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String, query: Seq[Float],
                k: Int = 10, nlist: Int = 16, nprobe: Int = 4,
                m: Int = 8, ksub: Int = 16, rerank: Int = 100,
                scale: Int = 256, iters: Int = 0): DataFrame = {
    val survivors = Similarity.ivfProbeFilter(df, idCol, vecCol, query, nlist, nprobe, iters)
    pqTopK(survivors, idCol, vecCol, query, k, m, ksub, rerank, scale, iters)
  }
}

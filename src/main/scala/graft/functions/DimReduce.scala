package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Seeded random-projection dimensionality reduction (Johnson-
 * Lindenstrauss with a ±1 sign matrix, Achlioptas's database-friendly
 * variant) — beyond-reference: shrink a 1024-dim embedding column to k
 * dims before ANN / clustering so every downstream distance computation
 * touches k floats instead of 1024.
 *
 * Integer-exact by construction, so the DuckDB oracle reproduces every
 * output value:
 *  - inputs quantize to a fixed-point grid (`floor(x * 2^sBits)` — the
 *    float→double widening and power-of-two multiply are both exact
 *    IEEE operations, floor is unambiguous);
 *  - the projection matrix is NEVER materialized: sign(i→j) is bit 63
 *    of `splitmix64(seed + j*1048573 + i)`, recomputed on the fly in
 *    codegen (the matrix ships as a 3-literal recipe, not data);
 *  - outputs are exact Long sums — integer addition commutes, so the
 *    result is partition/order independent.
 *
 * Scale shape: a pure narrow codegen projection — zero shuffles, zero
 * driver state, composes with `ann_topk` (brute-force over k=16 floats
 * scans 64x less than over 1024) and with the PQ/IVF tier.
 */
object DimReduceKernels {

  /** Exact integer projection: y_j = Σ_i sign(i,j) * floor(x_i * 2^sBits). */
  def project(x: Array[Float], k: Int, seed: Long, sBits: Int): Array[Long] = {
    val d = x.length
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      q(i) = math.floor(x(i).toDouble * (1L << sBits)).toLong
      i += 1
    }
    val y = new Array[Long](k)
    var j = 0
    while (j < k) {
      var s = 0L
      var i2 = 0
      val base = seed + j.toLong * 1048573L
      while (i2 < d) {
        if (SketchKernels.splitmix64(base + i2) < 0) s -= q(i2) else s += q(i2)
        i2 += 1
      }
      y(j) = s
      j += 1
    }
    y
  }

  /** Float face: the exact Long sums dequantized (y / 2^sBits — long→
    * double and the power-of-two divide are deterministic; the final
    * float round is IEEE round-to-nearest). Cosine/dot consumers are
    * unaffected by the uniform 1/sqrt(k) JL scale, so it is omitted. */
  def projectFloat(x: Array[Float], k: Int, seed: Long, sBits: Int): Array[Float] = {
    val y = project(x, k, seed, sBits)
    val out = new Array[Float](k)
    val div = (1L << sBits).toDouble
    var j = 0
    while (j < k) { out(j) = (y(j) / div).toFloat; j += 1 }
    out
  }
}

object DimReduce {

  /** Add the reduced embedding. `asFloat` (default) emits array<float>
    * for the ANN tier; `asFloat = false` emits the exact array<long>
    * sums (the oracle face). */
  def withProjection(df: DataFrame, column: String, newColumn: String,
                     k: Int, seed: Int = 42, sBits: Int = 10,
                     asFloat: Boolean = true): DataFrame = {
    require(k > 0 && k <= 4096, s"dim_reduce: k must be in [1, 4096], got $k")
    require(sBits >= 0 && sBits <= 30, s"dim_reduce: s_bits must be in [0, 30], got $sBits")
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val q = call_function("dim_reduce_q", col(column), lit(k), lit(seed), lit(sBits))
    val out = if (asFloat)
      transform(q, y => (y.cast("double") / lit((1L << sBits).toDouble)).cast("float"))
    else q
    df.withColumn(newColumn, out)
  }
}

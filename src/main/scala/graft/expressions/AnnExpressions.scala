package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Fused PQ encode + ADC distance (kernel + determinism contract in
 * [[graft.functions.Pq]]): one codegen'd call per row computes the
 * asymmetric distance of an embedding to the query through its nearest
 * codebook entries. The codebook (m*ksub*subDim ints) and query LUT
 * (m*ksub longs) ride in the plan via `addReferenceObj` — the TrigramRarity
 * pattern; a few KB of plan state beats a join against a centroid table
 * (which would shuffle) and beats HOF composition (which would interpret
 * 128 subspace distances per row). Not SQL-registrable (the model is not
 * literal-expressible); the Column face is `Pq.pqTopK`'s temp function.
 */
case class PqAdcDistance(child: Expression, scale: Int, codebook: Array[Int],
                         lut: Array[Long], m: Int, ksub: Int, subDim: Int)
    extends UnaryExpression {
  require(codebook.length == m * ksub * subDim, "pq_adc: codebook shape mismatch")
  require(lut.length == m * ksub, "pq_adc: lut shape mismatch")

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires array<float|double>, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  private def toDoubles(a: ArrayData): Array[Double] = elemType.get match {
    case FloatType => a.toFloatArray().map(_.toDouble)
    case _ => a.toDoubleArray()
  }

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.Pq.adcDistance(toDoubles(input.asInstanceOf[ArrayData]),
      scale, codebook, lut, m, ksub, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "int[]")
    val lutRef = ctx.addReferenceObj("pqLut", lut, "long[]")
    val conv = elemType.get match {
      case FloatType =>
        (c: String) => s"""float[] f = $c.toFloatArray();
           |double[] v = new double[f.length];
           |for (int i = 0; i < f.length; i++) v[i] = (double) f[i];""".stripMargin
      case _ => (c: String) => s"double[] v = $c.toDoubleArray();"
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"""${conv(c)}
         |${ev.value} = graft.functions.Pq.adcDistance(v, $scale, $cbRef, $lutRef, $m, $ksub, $subDim);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcDistance =
    copy(child = newChild)
}

/** PQ encode: embedding -> m one-byte codes (the persisted artifact; see
  * Pq.encodeVectors for why codes, not on-the-fly ADC, is the scan-
  * bandwidth story). */
case class PqEncode(child: Expression, scale: Int, codebook: Array[Int],
                    m: Int, ksub: Int, subDim: Int)
    extends UnaryExpression {
  require(codebook.length == m * ksub * subDim, "pq_encode: codebook shape mismatch")
  require(ksub <= 256, s"pq_encode: ksub must fit one byte, got $ksub")

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float|double>, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  private def toDoubles(a: ArrayData): Array[Double] = elemType.get match {
    case FloatType => a.toFloatArray().map(_.toDouble)
    case _ => a.toDoubleArray()
  }
  override protected def nullSafeEval(input: Any): Any = {
    val q = graft.functions.Pq.quantize(toDoubles(input.asInstanceOf[ArrayData]), scale)
    val codes = graft.functions.Pq.encode(q, codebook, m, ksub, subDim)
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) { out(i) = codes(i).toByte; i += 1 }
    out
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "int[]")
    val conv = elemType.get match {
      case FloatType =>
        (c: String) => s"""float[] f = $c.toFloatArray();
           |double[] v = new double[f.length];
           |for (int i = 0; i < f.length; i++) v[i] = (double) f[i];""".stripMargin
      case _ => (c: String) => s"double[] v = $c.toDoubleArray();"
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"""${conv(c)}
         |int[] q = graft.functions.Pq.quantize(v, $scale);
         |int[] codes = graft.functions.Pq.encode(q, $cbRef, $m, $ksub, $subDim);
         |byte[] out = new byte[$m];
         |for (int i = 0; i < $m; i++) out[i] = (byte) codes[i];
         |${ev.value} = out;
         |""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ADC over pre-encoded codes: sum of m LUT lookups — the per-row cost of
  * the codes-scan path. */
case class PqAdcFromCodes(child: Expression, lut: Array[Long], m: Int, ksub: Int)
    extends UnaryExpression {
  require(lut.length == m * ksub, "pq_adc_codes: lut shape mismatch")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc_codes requires binary codes, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_codes"
  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[Array[Byte]]
    var total = 0L
    var s = 0
    val n = math.min(m, codes.length)
    while (s < n) { total += lut(s * ksub + (codes(s) & 0xFF)); s += 1 }
    total
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""long total = 0L;
         |int n = java.lang.Math.min($m, $c.length);
         |for (int s = 0; s < n; s++) total += $lutRef[s * $ksub + ($c[s] & 0xFF)];
         |${ev.value} = total;
         |""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): PqAdcFromCodes =
    copy(child = newChild)
}

/**
 * Exact cosine similarity of two float vectors as ONE codegen'd binary
 * expression — the hot-path verify for near-dup / ANN joins at millions
 * of candidate pairs per task. The HOF formulation
 * (`aggregate(zip_with(...))`) interprets a lambda per ELEMENT (~64
 * closure dispatches per pair); this is a single tight JIT'd loop.
 * Arithmetic shape matches [[graft.functions.Similarity.cosine]] exactly
 * (same dot/sqrt/divide ordering — IEEE-identical results). Null on null
 * input, length mismatch, or a zero-norm side. SQL name: `cosine_sim`.
 */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<float> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.kernel(a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double r = graft.expressions.CosineSim.kernel(
         |  $a.toFloatArray(), $b.toFloatArray());
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
         |""".stripMargin)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Boxed so codegen and eval share one null contract. */
  def kernel(x: Array[Float], y: Array[Float]): java.lang.Double = {
    if (x.length != y.length) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < x.length) {
      val a = x(i).toDouble
      val b = y(i).toDouble
      dot += a * b
      nx += a * a
      ny += b * b
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }
}

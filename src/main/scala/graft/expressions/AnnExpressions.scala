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

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Exact-integer random projection (see
  * [[graft.functions.DimReduceKernels.project]]): array<float> d-dim
  * embedding → array<long> of k signed fixed-point sums. The ±1
  * projection matrix is a (seed, j, i) → splitmix64 recipe evaluated in
  * the generated code — no matrix broadcast, no plan state beyond three
  * int literals, fully codegen-fused into the scan projection. */
case class DimReduceQ(child: Expression, k: Int, seed: Int, sBits: Int)
    extends UnaryExpression {
  require(k > 0 && k <= 4096, s"dim_reduce_q: k must be in [1, 4096], got $k")
  require(sBits >= 0 && sBits <= 30, s"dim_reduce_q: s_bits must be in [0, 30], got $sBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dim_reduce_q requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dim_reduce_q"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(graft.functions.DimReduceKernels.project(
      input.asInstanceOf[ArrayData].toFloatArray(), k, seed.toLong, sBits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.DimReduceKernels.project($c.toFloatArray(), $k, ${seed}L, $sBits));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): DimReduceQ =
    copy(child = newChild)
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave key over k long columns — the clustering
  * key [[graft.functions.Zorder]] sorts a corpus by. The quantization
  * grid (mins, steps) rides INSIDE the expression as plan state (like
  * TrigramRarity's LM): it is derived from a corpus scan, not literal
  * SQL, and must stay frozen when keying a delta against an existing
  * layout. Never null: a null input buckets at its column minimum, which
  * keeps the key total so the range partitioner always has something to
  * sort on. Codegen is straight-line per-column unsigned fixed-point
  * bucketing + a static interleave call — one fused projection, no
  * boxing. */
case class ZorderKey(children: Seq[Expression], bits: Int,
                     mins: Array[Long], steps: Array[Long]) extends Expression {
  require(children.nonEmpty && children.size * bits <= 63,
    s"zorder_key: ${children.size} columns x $bits bits must fit 63 bits")
  require(mins.length == children.size && steps.length == children.size,
    "zorder_key: mins/steps must parallel the children")

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key requires long arguments (cast first), got ${c.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zorder_key"
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val k = children.size
    var z = 0L
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      val lv = if (v == null) mins(i) else v.asInstanceOf[Long]
      z |= graft.functions.ZorderKernels.spread(
        java.lang.Long.divideUnsigned(lv - mins(i), steps(i)), bits, k, i)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("zorderMins", mins, "long[]")
    val stepsRef = ctx.addReferenceObj("zorderSteps", steps, "long[]")
    val k = children.size
    val evals = children.map(_.genCode(ctx))
    val acc = ctx.freshName("zkey")
    val parts = evals.zipWithIndex.map { case (e, i) =>
      s"""${e.code}
         |long v_$i = ${e.isNull} ? $minsRef[$i] : ${e.value};
         |$acc |= graft.functions.ZorderKernels.spread(
         |  java.lang.Long.divideUnsigned(v_$i - $minsRef[$i], $stepsRef[$i]), $bits, $k, $i);
         |""".stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |long $acc = 0L;
        |$parts
        |""".stripMargin,
      isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode.variable(acc, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZorderKey = copy(children = newChildren)
}

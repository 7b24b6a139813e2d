package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions over binary image payloads — the multimodal
 * analogue of the text-hash tier. Metadata extraction and perceptual
 * hashing fuse into the scan projection via `doGenCode` (one static call
 * per row into [[graft.functions.ImageKernels]]), so a 100 TB metadata
 * sweep or signature pass is a single narrow codegen stage: no UDF, no
 * encoder boundary, no second read of the payload bytes.
 */

/** struct(format, width, height, orientation) from the payload's header
  * bytes alone — no pixel decode. Unknown payloads → (null, 0, 0, 0). */
case class ImageMeta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_meta requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("orientation", IntegerType, nullable = false)))
  override def prettyName: String = "image_meta"

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.ImageKernels.imageMetaRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ImageKernels.imageMetaRow($c);")

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

/** 64-bit perceptual hash of the payload: kind 0 = aHash (8×8 mean), 1 =
  * dHash (9×8 gradient), 2 = pHash (32×32 DCT low-frequency). NULL when
  * the payload is not a decodable image — the result is nullable beyond
  * the child, so the codegen is hand-rolled rather than nullSafeCodeGen. */
case class PerceptualHash(child: Expression, kind: Int) extends UnaryExpression {
  require(kind >= 0 && kind <= 2, s"perceptual hash kind must be 0..2, got $kind")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = kind match {
    case 0 => "image_ahash"; case 1 => "image_dhash"; case _ => "image_phash"
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = graft.functions.ImageKernels.perceptualHash(v.asInstanceOf[Array[Byte]], kind)
      if (r == null) null else r.longValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val r = ctx.freshName("ph")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${childGen.isNull}) {
        java.lang.Long $r =
          graft.functions.ImageKernels.perceptualHash(${childGen.value}, $kind);
        if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.longValue(); }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): PerceptualHash =
    copy(child = newChild)
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Document-text extraction fused into the scan projection:
  * `doc_text(binary[, format])` → extracted text (NULL when the payload
  * doesn't parse — the row, not the job, is the unit of failure). One
  * static call per row into [[graft.functions.DocKernels]]; no UDF, no
  * encoder boundary, no temp-file detour for document bytes staged in a
  * parquet binary column. Format is a construction-time literal so a
  * typo fails at analysis, not a billion rows in. */
case class DocText(child: Expression, fmt: String) extends UnaryExpression {
  require(DocText.Formats.contains(fmt),
    s"doc_text: format must be one of ${DocText.Formats.mkString(", ")}; got `$fmt`")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"doc_text requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "doc_text"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else graft.functions.DocKernels.docTextUtf8(v.asInstanceOf[Array[Byte]],
      org.apache.spark.unsafe.types.UTF8String.fromString(fmt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    // the format literal rides as a pre-built UTF8String reference — no
    // per-row allocation, no string-escaping hazards in generated source
    val fmtRef = ctx.addReferenceObj("docTextFmt",
      org.apache.spark.unsafe.types.UTF8String.fromString(fmt),
      "org.apache.spark.unsafe.types.UTF8String")
    val r = ctx.freshName("docText")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
      if (!${childGen.isNull}) {
        org.apache.spark.unsafe.types.UTF8String $r =
          graft.functions.DocKernels.docTextUtf8(${childGen.value}, $fmtRef);
        if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r; }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DocText =
    copy(child = newChild)
}

object DocText {
  val Formats: Set[String] = Set("auto", "rtf", "doc", "docx", "pptx",
    "epub", "pdf", "srt", "vtt", "eml")
}

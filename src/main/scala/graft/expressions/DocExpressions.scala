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

/** `doc_units(binary[, format])` → array of extraction units (paragraphs
  * / slides / chapters / pages / cues) for pipelines that explode and
  * process per unit; NULL when unparseable. Same construction-time
  * format validation as [[DocText]]. */
case class DocUnits(child: Expression, fmt: String) extends UnaryExpression {
  require(DocText.Formats.contains(fmt),
    s"doc_units: format must be one of ${DocText.Formats.mkString(", ")}; got `$fmt`")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"doc_units requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "doc_units"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val units = graft.functions.DocKernels.docUnits(v.asInstanceOf[Array[Byte]], fmt)
      if (units == null) null
      else new org.apache.spark.sql.catalyst.util.GenericArrayData(
        units.map(org.apache.spark.unsafe.types.UTF8String.fromString(_): Any))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val fmtRef = ctx.addReferenceObj("docUnitsFmt", fmt, "java.lang.String")
    val u = ctx.freshName("units")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${childGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $u =
          graft.expressions.DocUnits.toArrayData(
            graft.functions.DocKernels.docUnits(${childGen.value}, $fmtRef));
        if ($u != null) { ${ev.isNull} = false; ${ev.value} = $u; }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DocUnits =
    copy(child = newChild)
}

object DocUnits {
  /** codegen helper: String[] → ArrayData (null-propagating). */
  def toArrayData(units: Array[String]): org.apache.spark.sql.catalyst.util.ArrayData =
    if (units == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      units.map(org.apache.spark.unsafe.types.UTF8String.fromString(_): Any))
}

/** `detect_charset(binary)` → deterministic charset label for raw crawl
  * bytes ("utf-8" | "utf-16le" | "utf-16be" | "windows-1252" | "binary"
  * | "empty") — BOMs, strict UTF-8 validation, zero-parity UTF-16
  * heuristic, legacy-web default. Fused scan projection, no UDF. */
case class DetectCharset(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"detect_charset requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "detect_charset"

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      graft.functions.CharsetKernels.detect(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.CharsetKernels.detect($c));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): DetectCharset =
    copy(child = newChild)
}

/** `decode_text(binary[, charset='auto'])` → decoded text, NULL for
  * binary payloads (the row, not the job, fails). BOMs stripped. */
case class DecodeText(child: Expression, cs: String) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_text requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_text"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val s = graft.functions.CharsetKernels.decode(v.asInstanceOf[Array[Byte]], cs)
      if (s == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val csRef = ctx.addReferenceObj("decodeTextCs", cs, "java.lang.String")
    val r = ctx.freshName("decoded")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
      if (!${childGen.isNull}) {
        java.lang.String $r =
          graft.functions.CharsetKernels.decode(${childGen.value}, $csRef);
        if ($r != null) {
          ${ev.isNull} = false;
          ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r);
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeText =
    copy(child = newChild)
}

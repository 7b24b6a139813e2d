package graft.engine

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/**
 * Minimal OpenDocument spreadsheet/text-table codec (reference
 * nodes/source.py:250-263 dispatches `.odf/.ods/.odt` to
 * `pd.read_excel(engine="odf")`). An ODF file is a ZIP whose table data
 * lives entirely in `content.xml` (ODF 1.2 part 1 §9: `<table:table>`,
 * `<table:table-row>`, `<table:table-cell>`); the JDK's StAX parses it
 * driver-side, dependency-free — the same scale call as Xlsx.scala: a
 * spreadsheet is a bounded, hand-edited artifact, bulk data arrives
 * through the distributed readers.
 *
 * Cell semantics follow the engine's all-string contract (and pandas
 * `keep_default_na=False` stringification): `office:value-type="float"`
 * cells yield the `office:value` attribute text verbatim, booleans
 * True/False, date/time cells their ISO attribute text, string cells the
 * concatenated text content with `<text:s>`/`<text:tab>`/
 * `<text:line-break>` expanded and multiple `<text:p>` paragraphs joined
 * by newline.
 *
 * Repeat handling (`table:number-columns-repeated` /
 * `table:number-rows-repeated`): LibreOffice pads real files with huge
 * trailing empty repeats (a 16384-column empty cell, a ~million-row empty
 * row). Empty repeats are held pending and only materialized when later
 * non-empty content forces them into existence, so trailers vanish
 * without any arbitrary cap while interior gaps stay faithful.
 *
 * `.odt` text documents carry their tables under `office:text` instead of
 * `office:spreadsheet`; the parser collects every `table:table` under the
 * body, so both document families read through the same path.
 */
object Ods {

  /** All rows of one table as strings, empty cells "". `sheet` selects by
    * `table:name` or 0-based index (pandas sheet_name parity). */
  def readRows(path: String, sheet: Option[String]): Vector[Vector[String]] = {
    val zf =
      try new ZipFile(path)
      catch {
        case e: java.util.zip.ZipException => throw new IllegalArgumentException(
          s"$path: not an OpenDocument (ZIP) file — ${e.getMessage}", e)
      }
    try {
      val entry = Option(zf.getEntry("content.xml")).getOrElse(
        throw new IllegalArgumentException(s"not an ODF file: missing content.xml ($path)"))
      val tables = parseContent(zf, entry)
      if (tables.isEmpty)
        throw new IllegalArgumentException(s"ODF file has no tables ($path)")
      val idx = sheet match {
        case None => 0
        case Some(s) if s.forall(_.isDigit) => s.toInt
        case Some(s) =>
          val i = tables.indexWhere(_._1 == s)
          if (i < 0) throw new IllegalArgumentException(
            s"ods $path: no sheet named `$s` (sheets: ${tables.map(_._1).mkString(", ")})")
          i
      }
      if (idx >= tables.size) throw new IllegalArgumentException(
        s"ods $path: sheet index $idx out of range (${tables.size} sheets)")
      val rows = tables(idx)._2
      val width = rows.foldLeft(0)((w, r) => math.max(w, r.size))
      rows.map(_.padTo(width, ""))
    } finally zf.close()
  }

  /** Table names in document order (diagnostics / sheet discovery). */
  def sheetNames(path: String): Vector[String] = {
    val zf = new ZipFile(path)
    try {
      val entry = Option(zf.getEntry("content.xml")).getOrElse(
        throw new IllegalArgumentException(s"not an ODF file: missing content.xml ($path)"))
      parseContent(zf, entry).map(_._1)
    } finally zf.close()
  }

  private def attr(r: javax.xml.stream.XMLStreamReader, local: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local) return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  /** (name, rows) per `table:table`, rows with trailing-empty repeats
    * trimmed via the pending-materialization scheme described above. */
  private def parseContent(zf: ZipFile, entry: ZipEntry): Vector[(String, Vector[Vector[String]])] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(zf.getInputStream(entry))

    val tables = Vector.newBuilder[(String, Vector[Vector[String]])]
    var tableName = ""
    var tableDepth = 0 // >0 while inside a table:table (subtables don't occur)
    val rows = mutable.ArrayBuffer.empty[Vector[String]]
    var pendingEmptyRows = 0L
    var rowRepeat = 1L

    val row = mutable.ArrayBuffer.empty[String]
    var pendingEmptyCells = 0L
    var cellRepeat = 1L
    var cellDepth = 0 // >0 while inside a table-cell
    var coveredCell = false // merged-region shadow: content never surfaces
    var typedValue: Option[String] = None // from office:value / boolean / date
    val paras = mutable.ArrayBuffer.empty[String]
    val para = new StringBuilder
    var inPara = false

    def flushRow(): Unit = {
      // an entirely-empty row leaves pendingEmptyCells unmaterialized
      val materialized = row.toVector
      pendingEmptyCells = 0
      if (materialized.isEmpty) pendingEmptyRows += rowRepeat
      else {
        while (pendingEmptyRows > 0) { rows += Vector.empty; pendingEmptyRows -= 1 }
        var k = 0L
        while (k < rowRepeat) { rows += materialized; k += 1 }
      }
      row.clear()
    }

    def flushCell(): Unit = {
      val v =
        if (coveredCell) ""
        else typedValue.getOrElse(if (paras.nonEmpty) paras.mkString("\n") else "")
      if (v.isEmpty) pendingEmptyCells += cellRepeat
      else {
        while (pendingEmptyCells > 0) { row += ""; pendingEmptyCells -= 1 }
        var k = 0L
        while (k < cellRepeat) { row += v; k += 1 }
      }
      typedValue = None
      paras.clear()
    }

    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "table" if r.getName.getNamespaceURI != null &&
          r.getName.getNamespaceURI.contains("opendocument") =>
          tableDepth += 1
          if (tableDepth == 1) {
            tableName = attr(r, "name").getOrElse(s"Sheet${tables.result().size + 1}")
            rows.clear(); pendingEmptyRows = 0
          }
        case "table-row" if tableDepth == 1 =>
          rowRepeat = attr(r, "number-rows-repeated").map(_.toLong).getOrElse(1L)
          row.clear(); pendingEmptyCells = 0
        case "table-cell" | "covered-table-cell" if tableDepth == 1 =>
          cellDepth += 1
          if (cellDepth == 1) {
            cellRepeat = attr(r, "number-columns-repeated").map(_.toLong).getOrElse(1L)
            paras.clear()
            coveredCell = r.getLocalName == "covered-table-cell"
            typedValue =
              if (coveredCell) None
              else attr(r, "value-type") match {
                case Some("float") | Some("percentage") | Some("currency") => attr(r, "value")
                case Some("boolean") =>
                  attr(r, "boolean-value").map(b => if (b == "true") "True" else "False")
                case Some("date") => attr(r, "date-value")
                case Some("time") => attr(r, "time-value")
                case _ => None // string / absent: text content below
              }
          }
        case "p" if cellDepth == 1 => inPara = true; para.clear()
        case "s" if inPara =>
          val c = attr(r, "c").map(_.toInt).getOrElse(1)
          para.append(" " * c)
        case "tab" if inPara => para.append('\t')
        case "line-break" if inPara => para.append('\n')
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS if inPara => para.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "p" if inPara => inPara = false; paras += para.toString
        case "table-cell" | "covered-table-cell" if tableDepth == 1 =>
          cellDepth -= 1
          if (cellDepth == 0) flushCell()
        case "table-row" if tableDepth == 1 => flushRow()
        case "table" if tableDepth > 0 =>
          tableDepth -= 1
          if (tableDepth == 0) tables += ((tableName, rows.toVector))
        case _ =>
      }
      case _ =>
    } finally r.close()
    tables.result()
  }

  // --------------------------------------------------------------- writer
  /** Minimal single-sheet .ods writer for destinations and fixtures.
    * `typed = true` writes numeric-looking cells as `office:value-type=
    * "float"` (exercising the typed-attribute read path); otherwise all
    * cells are strings. */
  def write(path: Path, rows: Seq[Seq[String]], sheetName: String = "Sheet1",
            typed: Boolean = true): Unit =
    writeSheets(path, Seq(sheetName -> rows), typed)

  /** Multi-sheet writer; sheets appear in the given order. */
  def writeSheets(path: Path, sheets: Seq[(String, Seq[Seq[String]])],
                  typed: Boolean = true): Unit = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\"", "&quot;")
    val numeric = "-?\\d+(\\.\\d+)?".r
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8"?>""")
    sb.append("""<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" office:version="1.2"><office:body><office:spreadsheet>""")
    sheets.foreach { case (sheetName, rows) =>
      sb.append(s"""<table:table table:name="${esc(sheetName)}">""")
      rows.foreach { cells =>
        sb.append("<table:table-row>")
        cells.foreach { v =>
          if (typed && numeric.pattern.matcher(v).matches())
            sb.append(s"""<table:table-cell office:value-type="float" office:value="${esc(v)}"><text:p>${esc(v)}</text:p></table:table-cell>""")
          else
            sb.append(s"""<table:table-cell office:value-type="string"><text:p>${esc(v)}</text:p></table:table-cell>""")
        }
        // a LibreOffice-style trailing empty repeat trailer the reader must trim
        sb.append("""<table:table-cell table:number-columns-repeated="1024"/>""")
        sb.append("</table:table-row>")
      }
      sb.append("""<table:table-row table:number-rows-repeated="1048576"><table:table-cell table:number-columns-repeated="1024"/></table:table-row>""")
      sb.append("</table:table>")
    }
    sb.append("</office:spreadsheet></office:body></office:document-content>")

    val zos = new ZipOutputStream(Files.newOutputStream(path))
    try {
      // per ODF packaging, `mimetype` comes first and STORED (uncompressed)
      val mime = "application/vnd.oasis.opendocument.spreadsheet".getBytes("UTF-8")
      val me = new ZipEntry("mimetype")
      me.setMethod(ZipEntry.STORED)
      me.setSize(mime.length)
      me.setCrc({ val c = new java.util.zip.CRC32; c.update(mime); c.getValue })
      zos.putNextEntry(me); zos.write(mime); zos.closeEntry()
      zos.putNextEntry(new ZipEntry("content.xml"))
      zos.write(sb.toString.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }
}

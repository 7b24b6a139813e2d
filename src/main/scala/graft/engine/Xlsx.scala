package graft.engine

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/**
 * Minimal .xlsx codec (reference nodes/source.py:407 `pd.read_excel`),
 * driver-side and dependency-free: an xlsx is a ZIP of XML parts, parsed
 * here with the JDK's StAX. Driver-side is the right scale call — a
 * spreadsheet is a hand-edited business artifact, bounded by what a human
 * (or Excel itself, 1,048,576 rows) produces; bulk data arrives as
 * parquet/csv through the distributed readers.
 *
 * Cell semantics follow pandas `read_excel(keep_default_na=False)`
 * stringification: shared/inline strings verbatim, numbers as their raw
 * stored text, booleans as True/False.
 */
object Xlsx {

  /** All rows of one sheet as strings, empty cells "". `sheet` selects by
    * name or 0-based index (pandas sheet_name parity); default first. */
  def readRows(path: String, sheet: Option[String]): Vector[Vector[String]] = {
    val zf =
      try new ZipFile(path)
      catch {
        case e: java.util.zip.ZipException => throw new IllegalArgumentException(
          s"$path: not an xlsx (OOXML ZIP) file — ${e.getMessage}", e)
      }
    try {
      val sheetNames = workbookSheets(zf)
      val idx = sheet match {
        case None => 0
        case Some(s) if s.forall(_.isDigit) => s.toInt
        case Some(s) =>
          val i = sheetNames.indexOf(s)
          if (i < 0) throw new IllegalArgumentException(
            s"xlsx $path: no sheet named `$s` (sheets: ${sheetNames.mkString(", ")})")
          i
      }
      if (idx >= sheetNames.size) throw new IllegalArgumentException(
        s"xlsx $path: sheet index $idx out of range (${sheetNames.size} sheets)")
      val shared = sharedStrings(zf)
      // sheetN.xml is conventionally 1-based in sheet order; resolve via the
      // entry that exists (covers the overwhelmingly common layout)
      val entry = Option(zf.getEntry(s"xl/worksheets/sheet${idx + 1}.xml")).getOrElse(
        throw new IllegalArgumentException(s"xlsx $path: missing worksheet part for sheet $idx"))
      parseSheet(zf, entry, shared)
    } finally zf.close()
  }

  private def xmlReader(zf: ZipFile, entry: ZipEntry) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(zf.getInputStream(entry))
  }

  /** Sheet names in workbook order. */
  private def workbookSheets(zf: ZipFile): Vector[String] = {
    val entry = Option(zf.getEntry("xl/workbook.xml")).getOrElse(
      throw new IllegalArgumentException("not an xlsx: missing xl/workbook.xml"))
    val r = xmlReader(zf, entry)
    val names = Vector.newBuilder[String]
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet")
        names += Option(r.getAttributeValue(null, "name")).getOrElse("")
    } finally r.close()
    names.result()
  }

  /** sharedStrings.xml: one entry per `<si>`, concatenating its `<t>` runs
    * (rich-text cells split one string across runs). */
  private def sharedStrings(zf: ZipFile): Vector[String] = {
    Option(zf.getEntry("xl/sharedStrings.xml")) match {
      case None => Vector.empty
      case Some(entry) =>
        val r = xmlReader(zf, entry)
        val out = Vector.newBuilder[String]
        val cur = new StringBuilder
        var inT = false
        var depth = 0 // inside an <si>
        try while (r.hasNext) r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => depth = 1; cur.clear()
              case "t" if depth == 1 => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => depth = 0; out += cur.toString
              case _ =>
            }
          case _ =>
        } finally r.close()
        out.result()
    }
  }

  private def parseSheet(zf: ZipFile, entry: ZipEntry, shared: Vector[String]): Vector[Vector[String]] = {
    val r = xmlReader(zf, entry)
    val rows = Vector.newBuilder[Vector[String]]
    var width = 0
    val row = mutable.ArrayBuffer.empty[String]
    var cellCol = 0    // 0-based column of the current cell
    var cellType = ""  // t attribute
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    val collected = mutable.ArrayBuffer.empty[Vector[String]]
    def flushCell(): Unit = {
      val raw = text.toString
      val v = cellType match {
        case "s" => shared.lift(raw.trim.toInt).getOrElse("")
        case "b" => if (raw.trim == "1") "True" else "False"
        case _ => raw // n / str / inlineStr: stored text verbatim
      }
      while (row.size <= cellCol) row += ""
      row(cellCol) = v
      text.clear()
    }
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" => row.clear(); cellCol = -1
        case "c" =>
          cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex).getOrElse(cellCol + 1)
          cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
          text.clear()
        case "v" => inV = true
        case "t" => inIsT = true // inline string run
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS if inV || inIsT => text.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" => inV = false
        case "t" => inIsT = false
        case "c" => flushCell()
        case "row" =>
          width = math.max(width, row.size)
          collected += row.toVector
        case _ =>
      }
      case _ =>
    } finally r.close()
    collected.foreach(rw => rows += rw.padTo(width, ""))
    rows.result()
  }

  /** "BC12" → 0-based column index 54. */
  private[engine] def colIndex(ref: String): Int = {
    var n = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      n = n * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    n - 1
  }

  // --------------------------------------------------------------- writer
  /** Minimal single-sheet writer (inline strings only) — enough for an xlsx
    * destination and for building test fixtures without Excel. */
  def write(path: Path, rows: Seq[Seq[String]], sheetName: String = "Sheet1"): Unit = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sheetXml = {
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      rows.zipWithIndex.foreach { case (cells, ri) =>
        sb.append(s"""<row r="${ri + 1}">""")
        cells.zipWithIndex.foreach { case (v, ci) =>
          sb.append(s"""<c r="${colRef(ci)}${ri + 1}" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>""")
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""",
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/worksheets/sheet1.xml" -> sheetXml)
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }

  private def colRef(c0: Int): String = {
    var c = c0 + 1
    val sb = new StringBuilder
    while (c > 0) { val r = (c - 1) % 26; sb.insert(0, ('A' + r).toChar); c = (c - 1) / 26 }
    sb.toString
  }
}

package graft.engine

import java.io.{ByteArrayOutputStream, InputStream}
import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import scala.collection.mutable

/**
 * Minimal .xlsb codec (reference nodes/source.py:250-263 dispatches `.xlsb`
 * to `pd.read_excel(engine="pyxlsb")`). An xlsb is the OOXML ZIP package
 * with the XML sheet parts replaced by BIFF12 binary record streams
 * (publicly documented in [MS-XLSB]): each record is a 1-2 byte record id
 * (high bit of the first byte announces a second) followed by a 1-4 byte
 * 7-bit-varint payload length. Driver-side and dependency-free, the same
 * scale call as Xlsx.scala — spreadsheets are bounded hand-edited
 * artifacts; bulk data arrives through the distributed readers.
 *
 * Cell semantics follow the engine's all-string contract: shared/inline
 * strings verbatim, RK/real numbers via the canonical shortest decimal
 * form (integral values render without ".0"), booleans True/False.
 */
object Xlsb {

  // [MS-XLSB] §2.3 record enumeration (the subset a cell table needs)
  private val BrtRowHdr = 0x0000
  private val BrtCellBlank = 0x0001
  private val BrtCellRk = 0x0002
  private val BrtCellError = 0x0003
  private val BrtCellBool = 0x0004
  private val BrtCellReal = 0x0005
  private val BrtCellSt = 0x0006
  private val BrtCellIsst = 0x0007
  private val BrtFmlaString = 0x0008
  private val BrtFmlaNum = 0x0009
  private val BrtFmlaBool = 0x000A
  private val BrtFmlaError = 0x000B
  private val BrtSstItem = 0x0013
  private val BrtBundleSh = 0x009C

  /** All rows of one sheet as strings, empty cells "". `sheet` selects by
    * name or 0-based index (pandas sheet_name parity); default first. */
  def readRows(path: String, sheet: Option[String]): Vector[Vector[String]] = {
    try readRows0(path, sheet)
    catch {
      case e @ (_: ArrayIndexOutOfBoundsException | _: IndexOutOfBoundsException |
                _: NegativeArraySizeException) =>
        throw new IllegalArgumentException(
          s"$path: truncated or corrupt .xlsb (BIFF12) part", e)
    }
  }

  private def readRows0(path: String, sheet: Option[String]): Vector[Vector[String]] = {
    val zf =
      try new ZipFile(path)
      catch {
        case e: java.util.zip.ZipException => throw new IllegalArgumentException(
          s"$path: not an xlsb (OOXML ZIP) file — ${e.getMessage}", e)
      }
    try {
      val sheets = {
        val wb = Option(zf.getEntry("xl/workbook.bin")).getOrElse(
          throw new IllegalArgumentException(s"not an xlsb: missing xl/workbook.bin ($path)"))
        bundleSheets(readAll(zf.getInputStream(wb)))
      }
      val sheetNames = sheets.map(_._1)
      val idx = sheet match {
        case None => 0
        case Some(s) if s.forall(_.isDigit) => s.toInt
        case Some(s) =>
          val i = sheetNames.indexOf(s)
          if (i < 0) throw new IllegalArgumentException(
            s"xlsb $path: no sheet named `$s` (sheets: ${sheetNames.mkString(", ")})")
          i
      }
      if (idx >= sheets.size) throw new IllegalArgumentException(
        s"xlsb $path: sheet index $idx out of range (${sheets.size} sheets)")
      val shared = Option(zf.getEntry("xl/sharedStrings.bin"))
        .map(e => sstItems(readAll(zf.getInputStream(e))))
        .getOrElse(Vector.empty)
      // resolve the sheet's strRelID through xl/_rels/workbook.bin.rels to
      // the actual worksheet part; the sheetN.bin naming convention is only
      // the fallback when rels (or the relId) are absent
      val relTarget = for {
        relId <- sheets(idx)._2
        relsEntry <- Option(zf.getEntry("xl/_rels/workbook.bin.rels"))
        target <- parseRels(new String(readAll(zf.getInputStream(relsEntry)), "UTF-8")).get(relId)
      } yield if (target.startsWith("/")) target.drop(1) else s"xl/$target"
      val entry = relTarget.flatMap(t => Option(zf.getEntry(t)))
        .orElse(Option(zf.getEntry(s"xl/worksheets/sheet${idx + 1}.bin")))
        .getOrElse(throw new IllegalArgumentException(
          s"xlsb $path: missing worksheet part for sheet $idx" +
            relTarget.fold("")(t => s" (rels target `$t` not in package)")))
      parseSheet(readAll(zf.getInputStream(entry)), shared)
    } finally zf.close()
  }

  private def readAll(in: InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Cursor over a BIFF12 record stream. */
  private final class Recs(data: Array[Byte]) {
    var pos = 0
    def hasNext: Boolean = pos < data.length
    /** Advance to the next record; returns (id, payload offset, payload len). */
    def next(): (Int, Int, Int) = {
      val b1 = data(pos) & 0xFF; pos += 1
      val id =
        if ((b1 & 0x80) == 0) b1
        else { val b2 = data(pos) & 0xFF; pos += 1; (b1 & 0x7F) | ((b2 & 0x7F) << 7) }
      var len = 0; var shift = 0; var more = true
      while (more) {
        val b = data(pos) & 0xFF; pos += 1
        len |= (b & 0x7F) << shift; shift += 7
        more = (b & 0x80) != 0
      }
      val off = pos
      pos += len
      (id, off, len)
    }
  }

  private def u32(d: Array[Byte], o: Int): Long =
    (d(o) & 0xFFL) | ((d(o + 1) & 0xFFL) << 8) | ((d(o + 2) & 0xFFL) << 16) | ((d(o + 3) & 0xFFL) << 24)
  private def f64(d: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (d(o + i) & 0xFFL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }
  /** XLWideString: u32 cch + UTF-16LE chars; returns (value, bytes consumed). */
  private def wideString(d: Array[Byte], o: Int): (String, Int) = {
    val cch = u32(d, o).toInt
    (new String(d, o + 4, cch * 2, StandardCharsets.UTF_16LE), 4 + cch * 2)
  }

  /** Sheet names from the workbook part's BrtBundleSh records, in order.
    * Layout ([MS-XLSB] 2.4.304): u32 hsState, u32 iTabID, XLNullableWideString
    * strRelID (cch == 0xFFFFFFFF means null), XLWideString strName. */
  /** (sheet name, relationship id) per BrtBundleSh — the relId (strRelID,
    * an XLNullableWideString before strName) is what maps the sheet to its
    * worksheet PART via xl/_rels/workbook.bin.rels; part names do NOT have
    * to track bundle order (sheet deletion/reorder breaks the sheetN.bin
    * naming convention). */
  private def bundleSheets(wb: Array[Byte]): Vector[(String, Option[String])] = {
    val names = Vector.newBuilder[(String, Option[String])]
    val rs = new Recs(wb)
    while (rs.hasNext) {
      val (id, off, _) = rs.next()
      if (id == BrtBundleSh) {
        var p = off + 8
        val relCch = u32(wb, p)
        p += 4
        val relId =
          if (relCch != 0xFFFFFFFFL) {
            val n = relCch.toInt
            val s = new String(wb, p, n * 2, "UTF-16LE")
            p += n * 2
            Some(s)
          } else None
        names += ((wideString(wb, p)._1, relId))
      }
    }
    names.result()
  }

  /** Id → Target map from an OPC relationships part (attribute order
    * independent). */
  private def parseRels(xml: String): Map[String, String] = {
    val rel = """<Relationship\b[^>]*/?>""".r
    val idAttr = """\bId="([^"]*)"""".r
    val targetAttr = """\bTarget="([^"]*)"""".r
    rel.findAllIn(xml).flatMap { tag =>
      for {
        i <- idAttr.findFirstMatchIn(tag).map(_.group(1))
        t <- targetAttr.findFirstMatchIn(tag).map(_.group(1))
      } yield i -> t
    }.toMap
  }

  /** Shared strings from sharedStrings.bin BrtSstItem records. The item is a
    * RichStr: u8 flags (0x01 rich runs follow, 0x02 phonetic), XLWideString;
    * trailing run/phonetic data is skipped via the record boundary. */
  private def sstItems(sst: Array[Byte]): Vector[String] = {
    val out = Vector.newBuilder[String]
    val rs = new Recs(sst)
    while (rs.hasNext) {
      val (id, off, _) = rs.next()
      if (id == BrtSstItem) out += wideString(sst, off + 1)._1
    }
    out.result()
  }

  private def parseSheet(ws: Array[Byte], shared: Vector[String]): Vector[Vector[String]] = {
    // cell records carry only their column; the row comes from the preceding
    // BrtRowHdr. Sparse rows/cells materialize as "" at the end.
    val cells = mutable.Map.empty[(Int, Int), String] // (row, col) -> value
    var row = 0
    var maxRow = -1
    var maxCol = -1
    val rs = new Recs(ws)
    def put(col: Int, v: String): Unit = {
      if (v.nonEmpty) {
        cells((row, col)) = v
        if (row > maxRow) maxRow = row
        if (col > maxCol) maxCol = col
      }
    }
    while (rs.hasNext) {
      val (id, off, _) = rs.next()
      id match {
        case BrtRowHdr => row = u32(ws, off).toInt
        case BrtCellBlank => // empty
        case BrtCellRk => put(u32(ws, off).toInt, Biff.numToString(Biff.rkToDouble(u32(ws, off + 8).toInt)))
        case BrtCellReal => put(u32(ws, off).toInt, Biff.numToString(f64(ws, off + 8)))
        case BrtCellBool | BrtFmlaBool =>
          put(u32(ws, off).toInt, if (ws(off + 8) != 0) "True" else "False")
        case BrtCellError | BrtFmlaError =>
          put(u32(ws, off).toInt, Biff.errorText(ws(off + 8) & 0xFF))
        case BrtCellSt | BrtFmlaString =>
          put(u32(ws, off).toInt, wideString(ws, off + 8)._1)
        case BrtCellIsst =>
          val isst = u32(ws, off + 8).toInt
          put(u32(ws, off).toInt, shared.lift(isst).getOrElse(""))
        case BrtFmlaNum => put(u32(ws, off).toInt, Biff.numToString(f64(ws, off + 8)))
        case _ => // dimensions/format/etc: not cell data
      }
    }
    if (maxRow < 0) Vector.empty
    else Vector.tabulate(maxRow + 1) { r =>
      Vector.tabulate(maxCol + 1)(c => cells.getOrElse((r, c), ""))
    }
  }

  // --------------------------------------------------------------- writer
  /** Minimal single-sheet .xlsb writer for fixtures: shared strings for
    * text, RK where the value fits (integral / ×100), BrtCellReal
    * otherwise. Exercises 2-byte record ids (BrtBundleSh = 0x9C) and the
    * varint length encoding. */
  def write(path: Path, rows: Seq[Seq[String]], sheetName: String = "Sheet1"): Unit =
    writeSheets(path, Seq(sheetName -> rows))

  /** Multi-sheet writer; sheet N lands at xl/worksheets/sheetN+1.bin, the
    * conventional layout the reader resolves. */
  def writeSheets(path: Path, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    val strings = mutable.LinkedHashMap.empty[String, Int]
    def isstOf(s: String): Int = strings.getOrElseUpdate(s, strings.size)

    def rec(id: Int, payload: Array[Byte]): Array[Byte] = {
      val head = mutable.ArrayBuffer.empty[Byte]
      if (id < 0x80) head += id.toByte
      else { head += ((id & 0x7F) | 0x80).toByte; head += ((id >> 7) & 0x7F).toByte }
      var len = payload.length
      var more = true
      while (more) {
        val b = len & 0x7F
        len >>= 7
        more = len != 0
        head += (if (more) (b | 0x80) else b).toByte
      }
      head.toArray ++ payload
    }
    def u32b(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def wideStr(s: String): Array[Byte] =
      u32b(s.length.toLong) ++ s.getBytes(StandardCharsets.UTF_16LE)
    def cellPrefix(col: Int): Array[Byte] = u32b(col.toLong) ++ u32b(0L) // col + iStyleRef 0

    val numeric = "-?\\d+(\\.\\d+)?".r
    def sheetPart(rows: Seq[Seq[String]]): Array[Byte] = {
      val sheetBuf = new ByteArrayOutputStream()
      rows.zipWithIndex.foreach { case (cells, ri) =>
      sheetBuf.write(rec(BrtRowHdr, u32b(ri.toLong) ++ Array.fill[Byte](13)(0)))
      cells.zipWithIndex.foreach { case (v, ci) =>
        if (v.isEmpty) sheetBuf.write(rec(BrtCellBlank, cellPrefix(ci)))
        else if (numeric.pattern.matcher(v).matches()) {
          val d = v.toDouble
          if (!v.contains('.') && d >= -(1L << 29) && d < (1L << 29))
            sheetBuf.write(rec(BrtCellRk, cellPrefix(ci) ++ u32b(((v.toLong << 2) | 0x2L) & 0xFFFFFFFFL)))
          else {
            var bits = java.lang.Double.doubleToLongBits(d)
            val b = new Array[Byte](8)
            var i = 0
            while (i < 8) { b(i) = (bits & 0xFF).toByte; bits >>= 8; i += 1 }
            sheetBuf.write(rec(BrtCellReal, cellPrefix(ci) ++ b))
          }
        } else if (v == "True" || v == "False")
          sheetBuf.write(rec(BrtCellBool, cellPrefix(ci) :+ (if (v == "True") 1 else 0).toByte))
        else
          sheetBuf.write(rec(BrtCellIsst, cellPrefix(ci) ++ u32b(isstOf(v).toLong)))
        }
      }
      sheetBuf.toByteArray
    }
    val sheetParts = sheets.map { case (_, rows) => sheetPart(rows) }

    val wbBuf = new ByteArrayOutputStream()
    // hsState 0 (visible), iTabID per sheet, strRelID, strName
    sheets.zipWithIndex.foreach { case ((name, _), i) =>
      wbBuf.write(rec(BrtBundleSh,
        u32b(0L) ++ u32b(i + 1L) ++ wideStr(s"rId${i + 1}") ++ wideStr(name)))
    }

    val sstBuf = new ByteArrayOutputStream()
    strings.keys.foreach { s =>
      sstBuf.write(rec(BrtSstItem, Array(0.toByte) ++ wideStr(s)))
    }

    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="bin" ContentType="application/vnd.ms-excel.sheet.binary.macroEnabled.main"/></Types>""".getBytes("UTF-8"),
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.bin"/></Relationships>""".getBytes("UTF-8"),
      "xl/_rels/workbook.bin.rels" -> {
        val rels = sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.bin"/>""")
          .mkString
        (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""")
          .getBytes("UTF-8")
      },
      "xl/workbook.bin" -> wbBuf.toByteArray,
      "xl/sharedStrings.bin" -> sstBuf.toByteArray) ++
      sheetParts.zipWithIndex.map { case (p, i) =>
        s"xl/worksheets/sheet${i + 1}.bin" -> p
      }
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content)
      zos.closeEntry()
    } finally zos.close()
  }
}

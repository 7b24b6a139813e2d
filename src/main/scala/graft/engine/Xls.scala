package graft.engine

import java.nio.charset.StandardCharsets
import scala.collection.mutable

/**
 * Legacy .xls (BIFF8) reader (reference nodes/source.py:250-263 dispatches
 * `.xls` to `pd.read_excel(engine="xlrd")`). The workbook lives in the
 * `Workbook` (or `Book`) stream of a CFB container (Cfb.scala); the stream
 * is a sequence of BIFF records — u16 id, u16 length, payload — publicly
 * specified in [MS-XLS]. Globals substream: SST shared strings (spanning
 * CONTINUE records, with a fresh high-byte flag wherever character data
 * crosses a record boundary), BOUNDSHEET name/offset per sheet; then one
 * substream per sheet holding the cell records.
 *
 * Cell semantics follow the engine's all-string contract: strings verbatim,
 * RK/NUMBER via the canonical shortest decimal form (Biff.numToString),
 * booleans True/False, error cells their Excel error text. Number-format-
 * driven date rendering is intentionally not applied — date cells surface
 * as their raw serial numbers, the same honest raw-value choice the xlsx
 * reader makes for untyped `<v>` text.
 */
object Xls {

  // record ids ([MS-XLS] §2.3)
  private val BOF = 0x0809
  private val EOF = 0x000A
  private val SST = 0x00FC
  private val CONTINUE = 0x003C
  private val BOUNDSHEET = 0x0085
  private val LABELSST = 0x00FD
  private val LABEL = 0x0204
  private val RSTRING = 0x00D6
  private val NUMBER = 0x0203
  private val RK = 0x027E
  private val MULRK = 0x00BD
  private val BOOLERR = 0x0205
  private val FORMULA = 0x0006
  private val STRING = 0x0207

  /** All rows of one sheet as strings, empty cells "". `sheet` selects by
    * name or 0-based index (pandas sheet_name parity); default first. */
  def readRows(path: String, sheet: Option[String]): Vector[Vector[String]] = {
    try readRows0(path, sheet)
    catch {
      // a truncated/corrupt stream surfaces as an out-of-bounds read inside
      // the record cursors — rethrow as a diagnosable format error
      case e @ (_: ArrayIndexOutOfBoundsException | _: IndexOutOfBoundsException |
                _: NegativeArraySizeException) =>
        throw new IllegalArgumentException(
          s"$path: truncated or corrupt .xls (BIFF8) stream", e)
    }
  }

  private def readRows0(path: String, sheet: Option[String]): Vector[Vector[String]] = {
    val wb = Cfb.readStream(path, Seq("Workbook", "Book"))
    val (sst, sheets) = parseGlobals(wb, path)
    val idx = sheet match {
      case None => 0
      case Some(s) if s.forall(_.isDigit) => s.toInt
      case Some(s) =>
        val i = sheets.indexWhere(_._1 == s)
        if (i < 0) throw new IllegalArgumentException(
          s"xls $path: no sheet named `$s` (sheets: ${sheets.map(_._1).mkString(", ")})")
        i
    }
    if (idx >= sheets.size) throw new IllegalArgumentException(
      s"xls $path: sheet index $idx out of range (${sheets.size} sheets)")
    parseSheetWith(wb, sheets(idx)._2, sst)
  }

  private def u16(d: Array[Byte], o: Int): Int = (d(o) & 0xFF) | ((d(o + 1) & 0xFF) << 8)
  private def u32(d: Array[Byte], o: Int): Long =
    (d(o) & 0xFFL) | ((d(o + 1) & 0xFFL) << 8) | ((d(o + 2) & 0xFFL) << 16) | ((d(o + 3) & 0xFFL) << 24)
  private def f64(d: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (d(o + i) & 0xFFL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Cursor over the payloads of a run of records (SST + its CONTINUEs).
    * Scalars read straight across segment boundaries; CHARACTER data that
    * crosses a boundary re-reads a fresh option-flags byte first (the BIFF8
    * continued-string rule, [MS-XLS] §2.5.293). */
  private final class Segs(d: Array[Byte], segs: Vector[(Int, Int)]) {
    private var seg = 0
    private var off = 0
    private def remainingInSeg: Int = segs(seg)._2 - off
    private def advance(): Unit = { seg += 1; off = 0 }
    def u8(): Int = {
      while (remainingInSeg == 0) advance()
      val v = d(segs(seg)._1 + off) & 0xFF
      off += 1
      v
    }
    def u16le(): Int = u8() | (u8() << 8)
    def u32le(): Long = u16le().toLong | (u16le().toLong << 16)
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        while (remainingInSeg == 0) advance()
        val take = math.min(left, remainingInSeg.toLong).toInt
        off += take
        left -= take
      }
    }
    /** Read `cch` characters starting in `highByte` width, switching width at
      * each segment boundary per the fresh flags byte found there. */
    def chars(cch: Int, highByte0: Boolean): String = {
      val sb = new StringBuilder(cch)
      var highByte = highByte0
      var left = cch
      while (left > 0) {
        if (remainingInSeg == 0) {
          advance()
          highByte = (u8() & 0x01) != 0 // continuation grbit
        }
        val avail = remainingInSeg
        val charBytes = if (highByte) 2 else 1
        val take = math.min(left, avail / charBytes)
        if (take == 0) {
          // a UTF-16 char split across segments cannot occur (writers align);
          // defend anyway by forcing a segment advance
          advance()
          highByte = (u8() & 0x01) != 0
        } else {
          val base = segs(seg)._1 + off
          if (highByte) sb.append(new String(d, base, take * 2, StandardCharsets.UTF_16LE))
          else {
            var i = 0
            while (i < take) { sb.append((d(base + i) & 0xFF).toChar); i += 1 }
          }
          off += take * charBytes
          left -= take
        }
      }
      sb.toString
    }
    /** XLUnicodeRichExtendedString ([MS-XLS] 2.5.293). */
    def richString(): String = {
      val cch = u16le()
      val flags = u8()
      val high = (flags & 0x01) != 0
      val rich = (flags & 0x08) != 0
      val ext = (flags & 0x04) != 0
      val cRun = if (rich) u16le() else 0
      val cbExt = if (ext) u32le() else 0L
      val s = chars(cch, high)
      skip(cRun.toLong * 4)
      skip(cbExt)
      s
    }
  }

  /** (shared strings, sheets as (name, substream offset)). */
  private def parseGlobals(wb: Array[Byte], path: String): (Vector[String], Vector[(String, Int)]) = {
    var pos = 0
    require(wb.length >= 4 && u16(wb, 0) == BOF,
      s"$path: Workbook stream does not start with a BIFF BOF record")
    val sst = Vector.newBuilder[String]
    val sheets = Vector.newBuilder[(String, Int)]
    var done = false
    while (!done && pos + 4 <= wb.length) {
      val id = u16(wb, pos)
      val len = u16(wb, pos + 2)
      val off = pos + 4
      id match {
        case SST =>
          // gather this record and its CONTINUE tail into one segment cursor
          val segs = Vector.newBuilder[(Int, Int)]
          segs += ((off, len))
          var p = off + len
          while (p + 4 <= wb.length && u16(wb, p) == CONTINUE) {
            val clen = u16(wb, p + 2)
            segs += ((p + 4, clen))
            p += 4 + clen
          }
          val cursor = new Segs(wb, segs.result())
          cursor.skip(4) // cstTotal
          val unique = cursor.u32le()
          var i = 0L
          while (i < unique) { sst += cursor.richString(); i += 1 }
          pos = p // resume after the last consumed CONTINUE
        case BOUNDSHEET =>
          val lbPlyPos = u32(wb, off).toInt
          // ShortXLUnicodeString: u8 cch, u8 flags, chars
          val cch = wb(off + 6) & 0xFF
          val high = (wb(off + 7) & 0x01) != 0
          val name =
            if (high) new String(wb, off + 8, cch * 2, StandardCharsets.UTF_16LE)
            else new String(wb, off + 8, cch, StandardCharsets.ISO_8859_1)
          sheets += ((name, lbPlyPos))
          pos += 4 + len
        case EOF =>
          done = true
        case _ =>
          pos += 4 + len
      }
    }
    (sst.result(), sheets.result())
  }

  private def parseSheetWith(wb: Array[Byte], start: Int, sst: Vector[String]): Vector[Vector[String]] = {
    val cells = mutable.Map.empty[(Int, Int), String]
    var maxRow = -1
    var maxCol = -1
    def put(row: Int, col: Int, v: String): Unit = {
      if (v.nonEmpty) {
        cells((row, col)) = v
        if (row > maxRow) maxRow = row
        if (col > maxCol) maxCol = col
      }
    }
    var pos = start
    var pendingStringCell: Option[(Int, Int)] = None // FORMULA with string result
    var sawBof = false
    var done = false
    while (!done && pos + 4 <= wb.length) {
      val id = u16(wb, pos)
      val len = u16(wb, pos + 2)
      val off = pos + 4
      id match {
        case BOF if !sawBof => sawBof = true
        case EOF => done = true
        case LABELSST =>
          val isst = u32(wb, off + 6).toInt
          put(u16(wb, off), u16(wb, off + 2), sst.lift(isst).getOrElse(""))
        case NUMBER =>
          put(u16(wb, off), u16(wb, off + 2), Biff.numToString(f64(wb, off + 6)))
        case RK =>
          put(u16(wb, off), u16(wb, off + 2), Biff.numToString(Biff.rkToDouble(u32(wb, off + 6).toInt)))
        case MULRK =>
          val row = u16(wb, off)
          val colFirst = u16(wb, off + 2)
          val n = (len - 6) / 6
          var i = 0
          while (i < n) {
            put(row, colFirst + i, Biff.numToString(Biff.rkToDouble(u32(wb, off + 4 + i * 6 + 2).toInt)))
            i += 1
          }
        case BOOLERR =>
          val v = wb(off + 6) & 0xFF
          val isErr = (wb(off + 7) & 0xFF) != 0
          put(u16(wb, off), u16(wb, off + 2),
            if (isErr) Biff.errorText(v) else if (v != 0) "True" else "False")
        case LABEL | RSTRING =>
          // in-record XLUnicodeString: u16 cch, u8 flags, chars
          val cch = u16(wb, off + 6)
          val high = (wb(off + 8) & 0x01) != 0
          val s =
            if (high) new String(wb, off + 9, cch * 2, StandardCharsets.UTF_16LE)
            else new String(wb, off + 9, cch, StandardCharsets.ISO_8859_1)
          put(u16(wb, off), u16(wb, off + 2), s)
        case FORMULA =>
          val row = u16(wb, off)
          val col = u16(wb, off + 2)
          // cached result: 8 bytes; fExprO tail 0xFFFF marks a non-number
          if ((wb(off + 12) & 0xFF) == 0xFF && (wb(off + 13) & 0xFF) == 0xFF) {
            (wb(off + 6) & 0xFF) match {
              case 0 => pendingStringCell = Some((row, col)) // value in next STRING
              case 1 => put(row, col, if (wb(off + 8) != 0) "True" else "False")
              case 2 => put(row, col, Biff.errorText(wb(off + 8) & 0xFF))
              case _ => // 3 = blank
            }
          } else put(row, col, Biff.numToString(f64(wb, off + 6)))
        case STRING =>
          pendingStringCell.foreach { case (row, col) =>
            val cch = u16(wb, off)
            val high = (wb(off + 2) & 0x01) != 0
            val s =
              if (high) new String(wb, off + 3, cch * 2, StandardCharsets.UTF_16LE)
              else new String(wb, off + 3, cch, StandardCharsets.ISO_8859_1)
            put(row, col, s)
          }
          pendingStringCell = None
        case _ => // ROW/DIMENSIONS/INDEX/format records: not cell values
      }
      if (!done) pos += 4 + len
    }
    if (maxRow < 0) Vector.empty
    else Vector.tabulate(maxRow + 1) { r =>
      Vector.tabulate(maxCol + 1)(c => cells.getOrElse((r, c), ""))
    }
  }
}

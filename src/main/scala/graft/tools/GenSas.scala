// scratch fixture generator: runMain graft.tools.GenSas <outDir>
package graft.tools

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/**
 * Minimal sas7bdat writer — exists ONLY to produce test fixtures for the
 * native reader (engine/Sas.scala) that an independent implementation
 * (pandas.read_sas, driver-side) is then used to cross-validate: if pandas
 * parses these files and returns the intended values, the layout conforms
 * to the publicly documented format (the community spec reverse-engineered
 * by M. Shotwell et al., also implemented by parso/ReadStat), and the
 * Scala reader is tested against real-format bytes rather than against
 * itself.
 *
 * Writes little-endian files in BOTH documented layouts:
 * 32-bit ("x86": 4-byte lengths, page bit offset 16, 12-byte subheader
 * pointers) and 64-bit ("u64": 8-byte lengths, bit offset 32, 24-byte
 * pointers). Uncompressed: one metadata page carries the row_size /
 * column_size / column_text / column_name / column_attributes / format
 * subheaders, then pure DATA pages with rows packed at bit_offset+8.
 * RLE ("SASYZCRL", COMPRESS=CHAR): the compression literal is embedded
 * in the first column-text block and every row becomes a data subheader
 * (pointer compression 4, type 1 — or 0/1 stored raw when compression
 * does not shrink the row) packed onto META pages. The encoder emits the
 * documented command subset: short/long literals (0x8-0xB / 0x0),
 * short/long space and zero runs (0xE/0xF / 0x6/0x7) and short byte runs
 * (0xC). Numerics are SAS doubles, optionally truncated to width w (the
 * stored bytes are the most-significant w bytes); NaN encodes SAS
 * missing. Strings are fixed-width, space-padded.
 */
object GenSas {

  private val Magic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  sealed trait Col { def name: String; def width: Int }
  final case class NumCol(name: String, values: Seq[Double], width: Int = 8) extends Col {
    require(width >= 3 && width <= 8)
  }
  final case class StrCol(name: String, width: Int, values: Seq[String]) extends Col

  def write(path: String, cols: Seq[Col], nrows: Int, u64: Boolean = false,
            compress: String = "", be: Boolean = false): Unit = { // "" | "rle" | "rdc"
    require(Set("", "rle", "rdc").contains(compress), s"compress=$compress")
    require(!(be && u64), "big-endian writer only supports the x86 layout")
    val rle = compress.nonEmpty
    val order = if (be) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val headerSize = 1024
    val pageSize = 4096
    val L = if (u64) 8 else 4
    val bitOffset = if (u64) 32 else 16
    val ptrLen = if (u64) 24 else 12

    // row layout: numerics first, then strings (real SAS packs doubles first)
    val ordered = cols.collect { case c: NumCol => c: Col } ++ cols.collect { case c: StrCol => c: Col }
    var off = 0
    val colOffset = ordered.map { c => val o = off; off += c.width; c -> o }.toMap
    val rowLength = off

    // ---- column text block: 2-byte size + 14 pad + names back to back
    val nameBytes = cols.map(_.name.getBytes("UTF-8"))
    val textBlockSize = 16 + nameBytes.map(_.length).sum
    val nameOffsets = nameBytes.scanLeft(16)(_ + _.length)

    def sub(len: Int)(fill: ByteBuffer => Unit): Array[Byte] = {
      val a = new Array[Byte](len)
      val b = ByteBuffer.wrap(a).order(order)
      fill(b); a
    }
    def sig(b: ByteBuffer, first4: Int): Unit = {
      b.putInt(0, first4)
      if (u64) b.putInt(4, first4 match {
        case 0xf7f7f7f7 | 0xf6f6f6f6 => 0x00000000 // value-style sigs pad with zeros
        case _ => 0xffffffff                        // pointer-style sigs pad with FF
      })
    }
    def putL(b: ByteBuffer, o: Int, v: Long): Unit =
      if (u64) b.putLong(o, v) else b.putInt(o, v.toInt)

    val rowSize = sub(if (u64) 808 else 480) { b =>
      sig(b, 0xf7f7f7f7)
      putL(b, 5 * L, rowLength)
      putL(b, 6 * L, nrows)
      putL(b, 9 * L, cols.size)  // col_count_p1
      putL(b, 10 * L, 0)         // col_count_p2
      putL(b, 15 * L, 0)         // mix_page_row_count
      // lcs / lcp u16 live at fixed offsets 354/378 (x86) or 682/706 (u64);
      // zero-filled already
    }
    val colSize = sub(3 * L) { b => sig(b, 0xf6f6f6f6); putL(b, L, cols.size) }
    val colText = sub(L + textBlockSize) { b =>
      sig(b, 0xfffffffd) // bytes FD FF FF FF
      b.putShort(L, textBlockSize.toShort)
      if (rle) { // compression literal lives in the pad before the names
        val lit = (if (compress == "rdc") "SASYZCR2" else "SASYZCRL").getBytes("ASCII")
        lit.indices.foreach(k => b.put(L + 8 + k, lit(k)))
      }
      var p = L + 16
      nameBytes.foreach { nb => nb.foreach { x => b.put(p, x); p += 1 } }
    }
    val colName = sub(2 * L + 12 + 8 * cols.size) { b =>
      sig(b, 0xffffffff)
      cols.indices.foreach { i =>
        val p = L + 8 * (i + 1)
        b.putShort(p, 0) // text subheader idx
        b.putShort(p + 2, nameOffsets(i).toShort)
        b.putShort(p + 4, nameBytes(i).length.toShort)
      }
    }
    val colAttrs = sub(2 * L + 12 + (L + 8) * cols.size) { b =>
      sig(b, 0xfffffffc) // FC FF FF FF
      // attribute vectors are per-column in NAME order (row offsets still
      // follow the numerics-first packing via colOffset)
      cols.indices.foreach { i =>
        val c = cols(i)
        putL(b, L + 8 + i * (L + 8), colOffset(c))
        b.putInt(2 * L + 8 + i * (L + 8), c.width)
        b.put(2 * L + 14 + i * (L + 8), (c match { case _: NumCol => 1; case _ => 2 }).toByte)
      }
    }
    val fmtSubs = cols.map { _ => sub(3 * L + 40) { b => sig(b, 0xfffffbfe) } } // FE FB FF FF

    // ---- subheaders: (payload, pointer compression, pointer type)
    val metaSubs: Seq[(Array[Byte], Int, Int)] =
      (Seq(rowSize, colSize, colText, colName, colAttrs) ++ fmtSubs).map(s => (s, 0, 0))

    def buildRow(r: Int): Array[Byte] = {
      val row = new Array[Byte](rowLength)
      ordered.foreach {
        case c @ NumCol(_, vs, w) =>
          // keep the w most-significant bytes of the double (they trail
          // the slot in LE files and lead it in BE files)
          val bits = java.lang.Double.doubleToRawLongBits(vs(r))
          (0 until w).foreach { k =>
            val shift = if (be) 8 * (7 - k) else 8 * (8 - w + k)
            row(colOffset(c) + k) = ((bits >>> shift) & 0xff).toByte
          }
        case c @ StrCol(_, w, vs) =>
          val raw = vs(r).getBytes("UTF-8")
          require(raw.length <= w, s"value wider than column: ${vs(r)}")
          System.arraycopy(raw ++ Array.fill(w - raw.length)(' '.toByte), 0,
            row, colOffset(c), w)
      }
      row
    }

    // pack subheaders onto META pages: pointers grow from bit_offset+8,
    // payloads from the page tail
    def packSubPages(all: Seq[(Array[Byte], Int, Int)]): Seq[Array[Byte]] = {
      val pages = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var pending = all
      while (pending.nonEmpty) {
        val page = ByteBuffer.wrap(new Array[Byte](pageSize)).order(order)
        page.putShort(bitOffset, 0x0000)
        var tail = pageSize
        val ptrBase = bitOffset + 8
        var i = 0
        while (pending.nonEmpty &&
            ptrBase + ptrLen * (i + 1) <= tail - pending.head._1.length) {
          val (s, comp, typ) = pending.head
          tail -= s.length
          System.arraycopy(s, 0, page.array(), tail, s.length)
          val p = ptrBase + ptrLen * i
          putL(page, p, tail)
          putL(page, p + L, s.length)
          page.put(p + 2 * L, comp.toByte)
          page.put(p + 2 * L + 1, typ.toByte)
          pending = pending.tail
          i += 1
        }
        require(i > 0, "subheader too large for one page")
        page.putShort(bitOffset + 2, i.toShort)
        page.putShort(bitOffset + 4, i.toShort)
        pages += page.array()
      }
      pages.toSeq
    }

    val allPages: Seq[Array[Byte]] =
      if (rle) {
        val rowSubs = (0 until nrows).map { r =>
          val raw = buildRow(r)
          val packed = if (compress == "rdc") rdcCompress(raw) else rleCompress(raw)
          if (packed.length < raw.length) (packed, 4, 1) else (raw, 0, 1)
        }
        packSubPages(metaSubs ++ rowSubs)
      } else {
        val metaPages = packSubPages(metaSubs)
        val rowsPerPage = (pageSize - (bitOffset + 8)) / rowLength
        val dataPages = (0 until nrows).grouped(rowsPerPage).map { rowIdx =>
          val page = ByteBuffer.wrap(new Array[Byte](pageSize)).order(order)
          page.putShort(bitOffset, 0x0100.toShort)
          page.putShort(bitOffset + 2, rowIdx.size.toShort)
          page.putShort(bitOffset + 4, 0)
          rowIdx.zipWithIndex.foreach { case (r, onPage) =>
            System.arraycopy(buildRow(r), 0, page.array(),
              bitOffset + 8 + onPage * rowLength, rowLength)
          }
          page.array()
        }.toSeq
        metaPages ++ dataPages
      }

    // ---- header
    val h = ByteBuffer.wrap(new Array[Byte](headerSize)).order(order)
    h.put(Magic)
    h.put(32, (if (u64) '3' else 0x22).toByte)
    h.put(35, 0x32.toByte) // not '3' → align1 = 0
    h.put(37, (if (be) 0x00 else 0x01).toByte) // endianness
    h.put(39, '1'.toByte)  // platform: unix
    h.put(70, 20.toByte)   // encoding: utf-8
    def putStr(off: Int, len: Int, s: String): Unit = {
      val b = s.getBytes("ASCII").take(len)
      System.arraycopy(b ++ Array.fill(len - b.length)(' '.toByte), 0, h.array(), off, len)
    }
    putStr(92, 64, "GRAFT")
    putStr(156, 8, "DATA")
    h.putDouble(164, 2.0e9) // fixed created/modified timestamps (secs since 1960)
    h.putDouble(172, 2.0e9)
    h.putInt(196, headerSize)
    h.putInt(200, pageSize)
    h.putInt(204, allPages.size)
    putStr(216, 8, "9.0401M2")
    putStr(224, 16, "X64_GRAFT")
    putStr(240, 16, "4.1")
    putStr(256, 16, "GRAFT")
    putStr(272, 16, "Linux")

    val out = new java.io.ByteArrayOutputStream()
    out.write(h.array()); allPages.foreach(out.write)
    Files.write(Paths.get(path), out.toByteArray)
  }

  /**
   * SASYZCRL encoder (the command subset with community-agreed constants:
   * literals, space/zero runs, short byte runs — long byte runs 0x4 and
   * the 0xD '@' run are decode-only in engine/Sas.scala and never
   * emitted here).
   */
  private[tools] def rleCompress(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val lit = new java.io.ByteArrayOutputStream()
    def flushLit(): Unit = {
      val b = lit.toByteArray
      var p = 0
      while (p < b.length) {
        val rem = b.length - p
        if (rem <= 64) { // short literal: n = efb + 1 + 16 * high-bits
          out.write(0x80 + ((rem - 1) / 16) * 16 + (rem - 1) % 16)
          out.write(b, p, rem); p += rem
        } else {
          val n = math.min(rem, 64 + 255 + 15 * 256)
          out.write(0x00 | ((n - 64) >> 8)); out.write((n - 64) & 0xff)
          out.write(b, p, n); p += n
        }
      }
      lit.reset()
    }
    var i = 0
    while (i < row.length) {
      val x = row(i)
      var j = i + 1
      while (j < row.length && row(j) == x) j += 1
      var run = j - i
      if ((x == 0x00 || x == 0x20) && run >= 2) {
        flushLit()
        while (run >= 2) {
          if (run <= 17) { out.write((if (x == 0) 0xf0 else 0xe0) | (run - 2)); run = 0 }
          else {
            val n = math.min(run, 17 + 255 + 15 * 256)
            out.write((if (x == 0) 0x70 else 0x60) | ((n - 17) >> 8))
            out.write((n - 17) & 0xff)
            run -= n
          }
        }
        if (run == 1) lit.write(x)
      } else if (run >= 4) {
        flushLit()
        while (run >= 4) { // 0xC short byte run, n = efb + 3
          val n = math.min(run, 18)
          out.write(0xc0 | (n - 3)); out.write(x)
          run -= n
        }
        (0 until run).foreach(_ => lit.write(x))
      } else {
        (0 until run).foreach(_ => lit.write(x))
      }
      i = j
    }
    flushLit()
    out.toByteArray
  }

  /**
   * SASYZCR2 (RDC) encoder subset: literal bits and the RLE commands
   * (short 0x0: cnt+3, long 0x1: cnt + next<<4 + 19). The back-reference
   * pattern commands (2-15) are decode-only in engine/Sas.scala.
   * Items are emitted in groups of 16 under one MSB-first control word.
   */
  private[tools] def rdcCompress(row: Array[Byte]): Array[Byte] = {
    val items = scala.collection.mutable.ArrayBuffer[(Boolean, Array[Byte])]()
    var i = 0
    while (i < row.length) {
      val x = row(i)
      var j = i + 1
      while (j < row.length && row(j) == x) j += 1
      var run = j - i
      if (run >= 3) {
        while (run >= 3) {
          if (run <= 18) { items += ((true, Array((run - 3).toByte, x))); run = 0 }
          else {
            val n = math.min(run, 15 + (255 << 4) + 19)
            val c = n - 19
            items += ((true, Array((0x10 | (c & 0x0f)).toByte, ((c >> 4) & 0xff).toByte, x)))
            run -= n
          }
        }
        (0 until run).foreach(_ => items += ((false, Array(x))))
      } else {
        (i until j).foreach(k => items += ((false, Array(row(k)))))
      }
      i = j
    }
    val out = new java.io.ByteArrayOutputStream()
    items.grouped(16).foreach { g =>
      var bits = 0
      g.zipWithIndex.foreach { case ((isCmd, _), k) => if (isCmd) bits |= (0x8000 >> k) }
      out.write((bits >> 8) & 0xff); out.write(bits & 0xff)
      g.foreach { case (_, payload) => out.write(payload) }
    }
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("src/test/resources")
    // x86 layout: full-width + truncated doubles, NaN missing, strings
    val sample = Seq(
      NumCol("id", Seq(1, 2, 3, 4, 5).map(_.toDouble)),
      NumCol("score", Seq(1.5, -2.25, Double.NaN, 1e10, 0.125)),
      NumCol("half", Seq(7.5, -0.5, 3.0, Double.NaN, 96.0), width = 4),
      StrCol("name", 8, Seq("alpha", "beta", "gamma", "delta", "eps")),
      StrCol("city", 12, Seq("tokyo", "nairobi", "", "oslo", "quito")))
    write(s"$dir/sample_x86.sas7bdat", sample, nrows = 5)
    // u64 layout, same logical content
    write(s"$dir/sample_u64.sas7bdat", sample, nrows = 5, u64 = true)
    // RLE (COMPRESS=CHAR) variants, same logical content
    write(s"$dir/sample_rle_x86.sas7bdat", sample, nrows = 5, compress = "rle")
    write(s"$dir/sample_rle_u64.sas7bdat", sample, nrows = 5, u64 = true, compress = "rle")
    // RDC (COMPRESS=BINARY) variant, same logical content
    write(s"$dir/sample_rdc_x86.sas7bdat", sample, nrows = 5, compress = "rdc")
    // big-endian (endianness byte 0x00) variant, same logical content
    write(s"$dir/sample_be_x86.sas7bdat", sample, nrows = 5, be = true)
    // multiple data pages + utf-8 content
    val n = 250
    write(s"$dir/multi_x86.sas7bdat",
      Seq(
        NumCol("k", (1 to n).map(_.toDouble)),
        StrCol("tag", 16, (1 to n).map(i => s"row-$i-é"))),
      nrows = n)
    // RLE with enough rows to spill row subheaders across multiple pages;
    // long space runs exercise the 0x6 long-run command
    write(s"$dir/multi_rle_x86.sas7bdat",
      Seq(
        NumCol("k", (1 to n).map(_.toDouble)),
        StrCol("tag", 64, (1 to n).map(i => s"row-$i-é"))),
      nrows = n, compress = "rle")
    println(s"wrote sample_x86 / sample_u64 / sample_rle_* / sample_rdc_x86 / multi_x86 / multi_rle_x86 .sas7bdat under $dir")
  }
}

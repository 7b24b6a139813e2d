package graft.tools

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/**
 * BIFF8 .xls fixture writer ([MS-XLS] + [MS-CFB] public layouts) — the
 * cross-validation counterpart to engine/Xls.scala, mirroring the
 * GenSas/GenSpss/GenStata pattern: a from-scratch writer whose output the
 * native reader must round-trip. Deliberately exercises the format's
 * awkward corners: an SST that splits a string's character data across a
 * CONTINUE boundary (with the fresh high-byte flag the continuation
 * carries), compressed AND UTF-16 strings, RK ints, ×100 RKs, MULRK runs,
 * NUMBER doubles, BOOLERR cells, and both CFB stream placements (mini
 * stream under 4096 bytes, regular FAT chain at or above it).
 */
object GenXls {

  // ------------------------------------------------------------- BIFF8
  private final class Buf {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u16(v.toInt); u16((v >> 16).toInt) }
    def f64(d: Double): Unit = {
      var bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { u8((bits & 0xFF).toInt); bits >>= 8; i += 1 }
    }
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def record(id: Int, payload: Array[Byte]): Unit = {
      u16(id); u16(payload.length); bytes(payload)
    }
    def toArray: Array[Byte] = out.toByteArray
    def size: Int = out.size()
  }

  private def payload(f: Buf => Unit): Array[Byte] = {
    val b = new Buf; f(b); b.toArray
  }

  private def isAscii(s: String): Boolean = s.forall(_ < 0x100)

  /** Cell grid → a complete Workbook stream. Strings dedupe into the SST.
    * `forceContinueSplit`: emit the SST so that the LAST string's character
    * data crosses into a CONTINUE record. */
  def workbookStream(sheets: Seq[(String, Seq[Seq[String]])],
                     forceContinueSplit: Boolean = false): Array[Byte] = {
    val numeric = "-?\\d+(\\.\\d+)?".r
    def isNum(s: String) = numeric.pattern.matcher(s).matches()
    def isBool(s: String) = s == "True" || s == "False"

    // SST: collect unique strings in first-use order
    val sst = mutable.LinkedHashMap.empty[String, Int]
    sheets.foreach(_._2.foreach(_.foreach { v =>
      if (v.nonEmpty && !isNum(v) && !isBool(v)) sst.getOrElseUpdate(v, sst.size)
    }))
    var total = 0
    sheets.foreach(_._2.foreach(_.foreach { v =>
      if (v.nonEmpty && !isNum(v) && !isBool(v)) total += 1
    }))

    // ---- globals
    val globals = new Buf
    globals.record(0x0809, payload { b => // BOF: vers, dt=globals, build, year, bfh, sfo
      b.u16(0x0600); b.u16(0x0005); b.u16(0x0DBB); b.u16(0x07CC); b.u32(0xC1L); b.u32(0x0406L)
    })
    globals.record(0x0042, payload(_.u16(1200)))      // CODEPAGE (UTF-16)
    globals.record(0x0022, payload(_.u16(0)))         // DATEMODE 1900

    // SST with optional forced CONTINUE split in the last string's chars
    val sstStrings = sst.keys.toVector
    if (forceContinueSplit && sstStrings.nonEmpty) {
      val head = sstStrings.dropRight(1)
      val last = sstStrings.last
      val sstPayload = new Buf
      sstPayload.u32(total.toLong); sstPayload.u32(sstStrings.size.toLong)
      head.foreach(s => writeUnicodeString(sstPayload, s))
      // last string: header + first half of chars in SST, rest in CONTINUE
      val high = !isAscii(last)
      val half = math.max(1, last.length / 2)
      sstPayload.u16(last.length); sstPayload.u8(if (high) 1 else 0)
      writeChars(sstPayload, last.substring(0, half), high)
      globals.record(0x00FC, sstPayload.toArray)
      val cont = new Buf
      cont.u8(if (high) 1 else 0) // fresh grbit at the continuation boundary
      writeChars(cont, last.substring(half), high)
      globals.record(0x003C, cont.toArray)
    } else {
      globals.record(0x00FC, payload { b =>
        b.u32(total.toLong); b.u32(sstStrings.size.toLong)
        sstStrings.foreach(s => writeUnicodeString(b, s))
      })
    }

    // BOUNDSHEETs — lbPlyPos patched after sheet layout
    val boundsheetAt = mutable.ArrayBuffer.empty[Int]
    sheets.foreach { case (name, _) =>
      boundsheetAt += globals.size + 4 // offset of lbPlyPos inside the stream
      globals.record(0x0085, payload { b =>
        b.u32(0L) // lbPlyPos placeholder
        b.u16(0)  // visible worksheet
        val high = !isAscii(name)
        b.u8(name.length); b.u8(if (high) 1 else 0)
        writeChars(b, name, high)
      })
    }
    globals.record(0x000A, Array.emptyByteArray) // EOF

    // ---- sheet substreams
    val sheetBlobs = sheets.map { case (_, rows) =>
      val s = new Buf
      s.record(0x0809, payload { b =>
        b.u16(0x0600); b.u16(0x0010); b.u16(0x0DBB); b.u16(0x07CC); b.u32(0xC1L); b.u32(0x0406L)
      })
      rows.zipWithIndex.foreach { case (cells, ri) =>
        // group consecutive integral RK-able cells into MULRK runs of ≥2
        var ci = 0
        while (ci < cells.length) {
          val v = cells(ci)
          def rkable(x: String) =
            isNum(x) && !x.contains('.') && { val l = x.toLong; l >= -(1L << 29) && l < (1L << 29) }
          if (rkable(v) && ci + 1 < cells.length && rkable(cells(ci + 1))) {
            var end = ci
            while (end + 1 < cells.length && rkable(cells(end + 1))) end += 1
            s.record(0x00BD, payload { b => // MULRK
              b.u16(ri); b.u16(ci)
              (ci to end).foreach { c =>
                b.u16(15) // ixfe
                b.u32(((cells(c).toLong << 2) | 0x2L) & 0xFFFFFFFFL)
              }
              b.u16(end)
            })
            ci = end + 1
          } else {
            if (v.isEmpty) s.record(0x0201, payload { b => b.u16(ri); b.u16(ci); b.u16(15) })
            else if (isBool(v)) s.record(0x0205, payload { b =>
              b.u16(ri); b.u16(ci); b.u16(15); b.u8(if (v == "True") 1 else 0); b.u8(0)
            })
            else if (isNum(v)) {
              if (rkable(v)) s.record(0x027E, payload { b =>
                b.u16(ri); b.u16(ci); b.u16(15)
                b.u32(((v.toLong << 2) | 0x2L) & 0xFFFFFFFFL)
              })
              else s.record(0x0203, payload { b => // NUMBER
                b.u16(ri); b.u16(ci); b.u16(15); b.f64(v.toDouble)
              })
            } else s.record(0x00FD, payload { b => // LABELSST
              b.u16(ri); b.u16(ci); b.u16(15); b.u32(sst(v).toLong)
            })
            ci += 1
          }
        }
      }
      s.record(0x000A, Array.emptyByteArray)
      s.toArray
    }

    // patch lbPlyPos now that offsets are known
    var offset = globals.size
    val all = globals.toArray
    val positions = sheetBlobs.map { blob => val p = offset; offset += blob.length; p }
    boundsheetAt.zip(positions).foreach { case (at, p) =>
      all(at) = (p & 0xFF).toByte
      all(at + 1) = ((p >> 8) & 0xFF).toByte
      all(at + 2) = ((p >> 16) & 0xFF).toByte
      all(at + 3) = ((p >> 24) & 0xFF).toByte
    }
    val outBuf = new ByteArrayOutputStream()
    outBuf.write(all)
    sheetBlobs.foreach(outBuf.write)
    outBuf.toByteArray
  }

  private def writeChars(b: Buf, s: String, high: Boolean): Unit =
    if (high) b.bytes(s.getBytes(StandardCharsets.UTF_16LE))
    else s.foreach(c => b.u8(c.toInt))

  private def writeUnicodeString(b: Buf, s: String): Unit = {
    val high = !isAscii(s)
    b.u16(s.length); b.u8(if (high) 1 else 0)
    writeChars(b, s, high)
  }

  // ------------------------------------------------------------- CFB
  private val EndOfChain = 0xFFFFFFFEL
  private val FatSect = 0xFFFFFFFDL
  private val FreeSect = 0xFFFFFFFFL

  /** Wrap a Workbook stream into a minimal valid CFB file. Streams under
    * 4096 bytes go through the mini stream + mini FAT (the [MS-CFB] rule),
    * larger ones straight into FAT-chained 512-byte sectors. */
  /** Multi-stream CFB writer (the .doc fixture shape: WordDocument +
    * 1Table). Every stream must be >= the 4096-byte mini cutoff so the
    * whole file lives in regular sectors; single FAT sector (~63 KB of
    * payload), plenty for fixtures. Directory sibling pointers stay
    * free — readers that walk the red-black tree strictly would need
    * them, but both our [[graft.engine.Cfb]] and the fixture consumers
    * scan entries linearly. */
  def writeCfbMulti(path: String, streams: Seq[(String, Array[Byte])]): Unit = {
    val sectorSize = 512
    require(streams.nonEmpty && streams.forall(_._2.length >= 4096),
      "writeCfbMulti: every stream must be >= 4096 bytes (mini cutoff)")
    def sectorsFor(n: Int) = (n + sectorSize - 1) / sectorSize
    val dirSectors = (1 + streams.length + 3) / 4
    val streamSectors = streams.map(s => sectorsFor(s._2.length))
    val totalSectors = 1 + dirSectors + streamSectors.sum
    require(totalSectors <= 128, "writeCfbMulti: fixture too large for one FAT sector")

    val fat = Array.fill[Long](128)(FreeSect)
    fat(0) = FatSect
    (1 to dirSectors).foreach(i => fat(i) = if (i == dirSectors) EndOfChain else i + 1L)
    var next = 1 + dirSectors
    val starts = streamSectors.map { nSec =>
      val start = next
      (0 until nSec).foreach(i =>
        fat(start + i) = if (i == nSec - 1) EndOfChain else start + i + 1L)
      next += nSec
      start.toLong
    }

    def dirEntry(name: String, objType: Int, startSector: Long, size: Long,
                 child: Long): Array[Byte] = {
      val e = new Array[Byte](128)
      val nb = name.getBytes(StandardCharsets.UTF_16LE)
      System.arraycopy(nb, 0, e, 0, nb.length)
      val nameLen = nb.length + 2
      e(64) = (nameLen & 0xFF).toByte; e(65) = ((nameLen >> 8) & 0xFF).toByte
      e(66) = objType.toByte
      e(67) = 1
      def put32(off: Int, v: Long): Unit = {
        e(off) = (v & 0xFF).toByte; e(off + 1) = ((v >> 8) & 0xFF).toByte
        e(off + 2) = ((v >> 16) & 0xFF).toByte; e(off + 3) = ((v >> 24) & 0xFF).toByte
      }
      put32(68, FreeSect); put32(72, FreeSect)
      put32(76, child)
      put32(116, startSector)
      put32(120, size)
      e
    }
    val dir = new ByteArrayOutputStream()
    dir.write(dirEntry("Root Entry", 5, EndOfChain, 0L, child = 1L))
    streams.zip(starts).foreach { case ((name, bytes), start) =>
      dir.write(dirEntry(name, 2, start, bytes.length.toLong, child = FreeSect))
    }
    val dirPad = dirSectors * 4 - 1 - streams.length
    dir.write(new Array[Byte](128 * dirPad))

    val header = new Array[Byte](512)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    System.arraycopy(magic, 0, header, 0, 8)
    def hput16(off: Int, v: Int): Unit = {
      header(off) = (v & 0xFF).toByte; header(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def hput32(off: Int, v: Long): Unit = {
      header(off) = (v & 0xFF).toByte; header(off + 1) = ((v >> 8) & 0xFF).toByte
      header(off + 2) = ((v >> 16) & 0xFF).toByte; header(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    hput16(24, 0x003E); hput16(26, 0x0003); hput16(28, 0xFFFE)
    hput16(30, 9); hput16(32, 6)
    hput32(44, 1L) // one FAT sector
    hput32(48, 1L) // directory starts at sector 1
    hput32(56, 4096L)
    hput32(60, EndOfChain); hput32(64, 0L) // no mini FAT
    hput32(68, EndOfChain); hput32(72, 0L)
    hput32(76, 0L)
    (1 until 109).foreach(i => hput32(76 + i * 4, FreeSect))

    val body = new ByteArrayOutputStream()
    body.write(header)
    fat.foreach { v =>
      body.write((v & 0xFF).toInt); body.write(((v >> 8) & 0xFF).toInt)
      body.write(((v >> 16) & 0xFF).toInt); body.write(((v >> 24) & 0xFF).toInt)
    }
    body.write(dir.toByteArray)
    streams.zip(streamSectors).foreach { case ((_, bytes), nSec) =>
      body.write(java.util.Arrays.copyOf(bytes, nSec * sectorSize))
    }
    Files.write(Paths.get(path), body.toByteArray)
  }

  def writeCfb(path: String, streamName: String, stream: Array[Byte]): Unit = {
    val sectorSize = 512
    def sectorsFor(n: Int, unit: Int) = (n + unit - 1) / unit

    val useMini = stream.length < 4096
    // sector plan (sector 0 is the first after the 512-byte header):
    //   [FAT][directory][miniFAT?][data...]
    val miniSectors = if (useMini) sectorsFor(stream.length, 64) else 0
    val miniStreamBytes = miniSectors * 64
    val dataSectors =
      if (useMini) sectorsFor(miniStreamBytes, sectorSize) else sectorsFor(stream.length, sectorSize)
    val miniFatSectors = if (useMini) 1 else 0
    val totalSectors = 1 /*FAT*/ + 1 /*dir*/ + miniFatSectors + dataSectors
    require(totalSectors <= 128, "fixture too large for a single-FAT-sector CFB")

    val fat = Array.fill[Long](128)(FreeSect)
    fat(0) = FatSect
    fat(1) = EndOfChain // directory
    val miniFatSector = if (useMini) 2 else -1
    if (useMini) fat(2) = EndOfChain
    val dataStart = 2 + miniFatSectors
    (0 until dataSectors).foreach { i =>
      fat(dataStart + i) = if (i == dataSectors - 1) EndOfChain else (dataStart + i + 1).toLong
    }

    val miniFat = Array.fill[Long](128)(FreeSect)
    if (useMini) (0 until miniSectors).foreach { i =>
      miniFat(i) = if (i == miniSectors - 1) EndOfChain else (i + 1).toLong
    }

    def dirEntry(name: String, objType: Int, startSector: Long, size: Long,
                 child: Long = FreeSect): Array[Byte] = {
      val e = new Array[Byte](128)
      val nb = name.getBytes(StandardCharsets.UTF_16LE)
      System.arraycopy(nb, 0, e, 0, nb.length)
      val nameLen = nb.length + 2
      e(64) = (nameLen & 0xFF).toByte; e(65) = ((nameLen >> 8) & 0xFF).toByte
      e(66) = objType.toByte
      e(67) = 1 // black
      def put32(off: Int, v: Long): Unit = {
        e(off) = (v & 0xFF).toByte; e(off + 1) = ((v >> 8) & 0xFF).toByte
        e(off + 2) = ((v >> 16) & 0xFF).toByte; e(off + 3) = ((v >> 24) & 0xFF).toByte
      }
      put32(68, FreeSect); put32(72, FreeSect) // siblings
      put32(76, child)
      put32(116, startSector)
      put32(120, size)
      e
    }

    val rootStart = if (useMini) dataStart.toLong else EndOfChain
    val rootSize = if (useMini) miniStreamBytes.toLong else 0L
    val streamStart = if (useMini) 0L else dataStart.toLong
    val dir = new ByteArrayOutputStream()
    dir.write(dirEntry("Root Entry", 5, rootStart, rootSize, child = 1L))
    dir.write(dirEntry(streamName, 2, streamStart, stream.length.toLong))
    dir.write(new Array[Byte](128 * 2)) // two unused entries pad the sector

    val header = new Array[Byte](512)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    System.arraycopy(magic, 0, header, 0, 8)
    def hput16(off: Int, v: Int): Unit = {
      header(off) = (v & 0xFF).toByte; header(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def hput32(off: Int, v: Long): Unit = {
      header(off) = (v & 0xFF).toByte; header(off + 1) = ((v >> 8) & 0xFF).toByte
      header(off + 2) = ((v >> 16) & 0xFF).toByte; header(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    hput16(24, 0x003E) // minor
    hput16(26, 0x0003) // major v3
    hput16(28, 0xFFFE) // little-endian
    hput16(30, 9)      // 512-byte sectors
    hput16(32, 6)      // 64-byte mini sectors
    hput32(44, 1L)     // one FAT sector
    hput32(48, 1L)     // directory starts at sector 1
    hput32(56, 4096L)  // mini cutoff
    hput32(60, if (useMini) miniFatSector.toLong else EndOfChain)
    hput32(64, if (useMini) 1L else 0L)
    hput32(68, EndOfChain) // no DIFAT chain
    hput32(72, 0L)
    hput32(76, 0L)     // DIFAT[0] = FAT sector 0
    (1 until 109).foreach(i => hput32(76 + i * 4, FreeSect))

    val body = new ByteArrayOutputStream()
    body.write(header)
    val fatSector = new ByteArrayOutputStream()
    fat.foreach { v =>
      fatSector.write((v & 0xFF).toInt); fatSector.write(((v >> 8) & 0xFF).toInt)
      fatSector.write(((v >> 16) & 0xFF).toInt); fatSector.write(((v >> 24) & 0xFF).toInt)
    }
    body.write(fatSector.toByteArray)
    body.write(dir.toByteArray)
    if (useMini) {
      val mf = new ByteArrayOutputStream()
      miniFat.foreach { v =>
        mf.write((v & 0xFF).toInt); mf.write(((v >> 8) & 0xFF).toInt)
        mf.write(((v >> 16) & 0xFF).toInt); mf.write(((v >> 24) & 0xFF).toInt)
      }
      body.write(mf.toByteArray)
      val mini = java.util.Arrays.copyOf(stream, miniStreamBytes)
      val padded = java.util.Arrays.copyOf(mini, dataSectors * sectorSize)
      body.write(padded)
    } else {
      body.write(java.util.Arrays.copyOf(stream, dataSectors * sectorSize))
    }
    Files.write(Paths.get(path), body.toByteArray)
  }

  /** One-call fixture writer. */
  def write(path: String, rows: Seq[Seq[String]], sheetName: String = "Sheet1",
            forceContinueSplit: Boolean = false): Unit =
    writeCfb(path, "Workbook", workbookStream(Seq(sheetName -> rows), forceContinueSplit))
}

package graft.engine

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/**
 * Compound File Binary (CFB / OLE2) container reader — the envelope around
 * pre-OOXML Office artifacts, publicly specified in [MS-CFB]. A CFB file is
 * a little FAT filesystem: 512-byte (v3) or 4096-byte (v4) sectors chained
 * through a FAT, a directory of named streams, and a "mini stream" of
 * 64-byte mini sectors (chained through a mini FAT) for streams under 4096
 * bytes. Xls.scala reads the `Workbook`/`Book` stream out of this.
 */
object Cfb {

  private val FreeSect = 0xFFFFFFFFL
  private val EndOfChain = 0xFFFFFFFEL

  final case class Entry(name: String, objectType: Int, startSector: Long, size: Long)

  /** The bytes of the first directory stream whose name matches one of
    * `names` (case-sensitive, in preference order). */
  def readStream(path: String, names: Seq[String]): Array[Byte] =
    readStreamBytes(Files.readAllBytes(Paths.get(path)), names, path)

  /** Bytes-based core of [[readStream]] — usable inside `binaryFiles`
    * partitions (the distributed .doc extraction path). */
  def readStreamBytes(data: Array[Byte], names: Seq[String],
                      path: String = "<bytes>"): Array[Byte] = {
    require(data.length >= 512 &&
      (data(0) & 0xFF) == 0xD0 && (data(1) & 0xFF) == 0xCF &&
      (data(2) & 0xFF) == 0x11 && (data(3) & 0xFF) == 0xE0 &&
      (data(4) & 0xFF) == 0xA1 && (data(5) & 0xFF) == 0xB1 &&
      (data(6) & 0xFF) == 0x1A && (data(7) & 0xFF) == 0xE1,
      s"$path: not a Compound File (bad OLE2 signature)")

    def u16(o: Int): Int = (data(o) & 0xFF) | ((data(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long =
      (data(o) & 0xFFL) | ((data(o + 1) & 0xFFL) << 8) |
        ((data(o + 2) & 0xFFL) << 16) | ((data(o + 3) & 0xFFL) << 24)

    val sectorShift = u16(30)
    require(sectorShift == 9 || sectorShift == 12, s"$path: bad CFB sector shift $sectorShift")
    val sectorSize = 1 << sectorShift
    val miniShift = u16(32) // 6 → 64-byte mini sectors
    val miniSize = 1 << miniShift
    val firstDirSector = u32(48)
    val miniCutoff = u32(56) // 4096
    val firstMiniFatSector = u32(60)
    val firstDifatSector = u32(68)

    def sectorOffset(sec: Long): Int = ((sec + 1) << sectorShift).toInt

    // ---- FAT: sector ids from the 109 header DIFAT slots + DIFAT chain
    val fatSectors = mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < 109) {
      val v = u32(76 + i * 4)
      if (v != FreeSect) fatSectors += v
      i += 1
    }
    var difat = firstDifatSector
    while (difat != EndOfChain && difat != FreeSect) {
      val base = sectorOffset(difat)
      val perSector = sectorSize / 4 - 1
      var j = 0
      while (j < perSector) {
        val v = u32(base + j * 4)
        if (v != FreeSect) fatSectors += v
        j += 1
      }
      difat = u32(base + perSector * 4)
    }
    val entriesPerFatSector = sectorSize / 4
    val fat = new Array[Long](fatSectors.length * entriesPerFatSector)
    fatSectors.zipWithIndex.foreach { case (sec, k) =>
      val base = sectorOffset(sec)
      var j = 0
      while (j < entriesPerFatSector) { fat(k * entriesPerFatSector + j) = u32(base + j * 4); j += 1 }
    }

    def chain(start: Long): Vector[Long] = {
      val out = Vector.newBuilder[Long]
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && guard < fat.length + 109) {
        out += s
        s = if (s < fat.length) fat(s.toInt) else EndOfChain
        guard += 1
      }
      out.result()
    }

    def readChain(start: Long, size: Long): Array[Byte] = {
      val secs = chain(start)
      val out = new Array[Byte](size.toInt)
      var written = 0
      secs.foreach { s =>
        val n = math.min(sectorSize, size.toInt - written)
        if (n > 0) { System.arraycopy(data, sectorOffset(s), out, written, n); written += n }
      }
      out
    }

    // ---- directory entries (128 bytes each) across the dir chain
    val dirBytes = {
      val secs = chain(firstDirSector)
      val out = new Array[Byte](secs.length * sectorSize)
      secs.zipWithIndex.foreach { case (s, k) =>
        System.arraycopy(data, sectorOffset(s), out, k * sectorSize, sectorSize)
      }
      out
    }
    def dirU16(o: Int): Int = (dirBytes(o) & 0xFF) | ((dirBytes(o + 1) & 0xFF) << 8)
    def dirU32(o: Int): Long =
      (dirBytes(o) & 0xFFL) | ((dirBytes(o + 1) & 0xFFL) << 8) |
        ((dirBytes(o + 2) & 0xFFL) << 16) | ((dirBytes(o + 3) & 0xFFL) << 24)
    val entries = (0 until dirBytes.length / 128).map { k =>
      val base = k * 128
      val nameLen = dirU16(base + 64) // bytes incl. UTF-16 terminator
      val name =
        if (nameLen >= 2) new String(dirBytes, base, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
      Entry(name, dirBytes(base + 66) & 0xFF, dirU32(base + 116), dirU32(base + 120))
    }

    val root = entries.find(_.objectType == 5).getOrElse(
      throw new IllegalArgumentException(s"$path: CFB has no root directory entry"))
    val target = names.flatMap(n => entries.find(e => e.objectType == 2 && e.name == n)).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"$path: no stream named ${names.mkString(" / ")} in CFB directory " +
          s"(streams: ${entries.filter(_.objectType == 2).map(_.name).mkString(", ")})"))

    require(target.size >= 0 && target.size <= data.length.toLong,
      s"$path: CFB stream `${target.name}` claims ${target.size} bytes in a ${data.length}-byte file")
    if (target.size >= miniCutoff) readChain(target.startSector, target.size)
    else {
      // mini stream: the root entry's chain holds the mini sectors back to
      // back; the mini FAT chains them per-stream
      val miniStream = readChain(root.startSector, root.size)
      val miniFatBytes = {
        val secs = chain(firstMiniFatSector)
        val out = new Array[Byte](secs.length * sectorSize)
        secs.zipWithIndex.foreach { case (s, k) =>
          System.arraycopy(data, sectorOffset(s), out, k * sectorSize, sectorSize)
        }
        out
      }
      def miniFat(idx: Long): Long = {
        val o = idx.toInt * 4
        (miniFatBytes(o) & 0xFFL) | ((miniFatBytes(o + 1) & 0xFFL) << 8) |
          ((miniFatBytes(o + 2) & 0xFFL) << 16) | ((miniFatBytes(o + 3) & 0xFFL) << 24)
      }
      val out = new Array[Byte](target.size.toInt)
      var written = 0
      var s = target.startSector
      var guard = 0
      while (s != EndOfChain && s != FreeSect && written < out.length && guard < miniFatBytes.length / 4 + 1) {
        val n = math.min(miniSize, out.length - written)
        System.arraycopy(miniStream, (s * miniSize).toInt, out, written, n)
        written += n
        s = miniFat(s)
        guard += 1
      }
      out
    }
  }
}

package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/**
 * Native SPSS `.sav` system-file reader — closes the reference's
 * `read_spss` dispatch (reference nodes/source.py:254-255) without
 * pyreadstat. The format is publicly documented in GNU PSPP's "System File
 * Format" appendix (the de-facto community spec, also implemented by
 * ReadStat); this parses that documented layout directly. Test fixtures
 * are produced by tools/GenSpss from the same public spec — unlike the
 * sas7bdat fixtures there is NO independent validator available offline
 * (pyreadstat is absent), which FIXTURES.md records honestly.
 *
 * Supported: files in either byte order (layout_code read both ways),
 * uncompressed
 * (compression 0), bytecode-compressed (compression 1, bias 100), and
 * zlib-wrapped `.zsav` (`$FL3`, compression 2 — the block-deflated
 * bytecode stream, any number of blocks) data; numeric variables and
 * strings up to 255 bytes (continuation slots), long variable names
 * (type-7 subtype-13 record). Values land in the engine's all-string
 * model: SYSMIS and the bytecode missing command render as "" (the
 * reference's NaN → NULL_REPR); numeric value labels (type-3/type-4
 * record pairs) apply like pd.read_spss's convert_categoricals — labeled
 * values render as the label, unlabeled stay numeric. Both byte orders are supported via the
 * documented layout_code self-detection.
 *
 * Driver-side parse like Stata/Sas — the single-file format is
 * non-splittable; rows are parallelized into a distributed frame after.
 */
object Spss {

  def read(spark: SparkSession, path: String): DataFrame = {
    val (names, rows) = parse(Files.readAllBytes(Paths.get(path)), path)
    val schema = StructType(names.map(n => StructField(n, StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_: _*)).toIndexedSeq),
      schema)
  }

  private val Sysmis = java.lang.Double.longBitsToDouble(0xffefffffffffffffL) // -DBL_MAX

  private final case class Var(shortName: String, width: Int) // width 0 = numeric

  private def parse(bytes: Array[Byte], path: String): (Seq[String], Seq[Seq[String]]) = {
    require(bytes.length >= 176, s"$path: not a .sav system file (too short)")
    val magic = new String(bytes, 0, 4, "ASCII")
    require(magic == "$FL2" || magic == "$FL3",
      s"$path: not a .sav system file (magic `$magic`)")
    // layout_code at 64 is 2 or 3 when read in the file's own byte order —
    // the documented endianness self-detection (PSPP "File Header Record")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (!Set(2, 3).contains(buf.getInt(64))) buf.order(ByteOrder.BIG_ENDIAN)
    val layout = buf.getInt(64)
    require(layout == 2 || layout == 3,
      s"$path: corrupt .sav header (layout_code $layout in either byte order)")
    val nominalSize = buf.getInt(68)
    val compression = buf.getInt(72)
    require(compression >= 0 && compression <= 2,
      s"$path: unsupported .sav compression code $compression (0=none, 1=bytecode, 2=zlib)")
    require((compression == 2) == (magic == "$FL3"),
      s"$path: magic `$magic` inconsistent with compression code $compression")
    val ncases = buf.getInt(80)
    val bias = buf.getDouble(84)

    // ---- dictionary records, until type 999
    var pos = 176
    val vars = scala.collection.mutable.ArrayBuffer[Var]()
    // 1-based dictionary slot index (continuation slots count) -> vars index
    val slotToVar = scala.collection.mutable.Map[Int, Int]()
    var slotCount = 0
    var longNames = Map.empty[String, String]
    // per-variable value labels (numeric vars: 8-byte double keys), applied
    // like the reference's pd.read_spss (pyreadstat convert_categoricals)
    val varValueLabels = scala.collection.mutable.Map[Int, Map[Double, String]]()
    var pendingLabels: Seq[(Double, String)] = Nil
    def i32(): Int = { val v = buf.getInt(pos); pos += 4; v }
    def skip(n: Int): Unit = pos += n
    var done = false
    while (!done) {
      i32() match {
        case 2 => // variable record
          val typ = i32()
          val hasLabel = i32()
          val nMissing = i32()
          skip(8) // print + write formats
          val name = new String(bytes, pos, 8, "ISO-8859-1").trim
          skip(8)
          if (hasLabel == 1) {
            val len = i32()
            skip((len + 3) / 4 * 4)
          }
          if (nMissing != 0) skip(math.abs(nMissing) * 8)
          slotCount += 1
          if (typ >= 0) { slotToVar(slotCount) = vars.length; vars += Var(name, typ) }
        case 3 => // value labels: count + (value, len-prefixed label) pairs
          val n = i32()
          pendingLabels = (0 until n).map { _ =>
            val value = buf.getDouble(pos); skip(8)
            val len = bytes(pos) & 0xff
            val label = new String(bytes, pos + 1, len, "ISO-8859-1")
            skip(1 + ((len + 8) / 8 * 8 - 1)) // label padded so value+label is 8-multiple
            value -> label
          }
        case 4 => // variable index record: binds the preceding type-3 table
          val n = i32()
          val idxs = (0 until n).map(_ => i32())
          val table = pendingLabels.toMap
          idxs.foreach { slot =>
            slotToVar.get(slot).foreach { vi =>
              if (vars(vi).width == 0) varValueLabels(vi) = table
            }
          }
          pendingLabels = Nil
        case 6 => // documents: n lines of 80 chars
          val n = i32(); skip(80 * n)
        case 7 => // info record: subtype, element size, count
          val subtype = i32(); val size = i32(); val count = i32()
          if (subtype == 13) { // long variable names: SHORT=Long pairs, tab-sep
            val s = new String(bytes, pos, size * count, "ISO-8859-1")
            longNames = s.split('\t').flatMap { p =>
              p.split("=", 2) match { case Array(a, b) => Some(a -> b); case _ => None }
            }.toMap
          }
          // Subtype 14 (very long strings, PSPP §"Very Long String Record")
          // re-segments >255-byte strings across multiple dictionary
          // variables — skipping it would silently mis-assemble the data
          // matrix, so reject loudly. Other subtypes (display params,
          // attributes, encoding, ...) are presentation metadata that does
          // not change the case layout and stays skippable.
          require(subtype != 14,
            s"$path: .sav very-long-string record (type 7 subtype 14) is not supported — " +
              "strings longer than 255 bytes would be mis-assembled; export without very long strings")
          skip(size * count)
        case 999 =>
          skip(4); done = true // terminator payload int 0
        case other =>
          throw new IllegalArgumentException(
            s"$path: unknown .sav dictionary record type $other at offset ${pos - 4}")
      }
    }

    val slotsPerVar = vars.map(v => if (v.width == 0) 1 else (v.width + 7) / 8)
    require(slotsPerVar.sum == nominalSize || nominalSize <= 0,
      s"$path: case size mismatch (${slotsPerVar.sum} slots from dictionary, header says $nominalSize)")
    val names = vars.map(v => longNames.getOrElse(v.shortName, v.shortName)).toSeq

    // ---- data: a flat sequence of 8-byte elements per case
    val totalSlots = slotsPerVar.sum
    val elems = scala.collection.mutable.ArrayBuffer[Array[Byte]]()

    // bytecode: groups of 8 command bytes; 253 pulls the next literal
    // 8-byte element; 1..251 encode (code - bias); 254 = 8 spaces;
    // 255 = SYSMIS; 0 = padding; 252 = end of data
    def decodeBytecode(data: Array[Byte], start: Int): Unit = {
      val spaces = Array.fill(8)(' '.toByte)
      val sysmisElem = { val a = new Array[Byte](8)
        ByteBuffer.wrap(a).order(buf.order()).putDouble(Sysmis); a }
      var p = start
      var eof = false
      while (!eof && p + 8 <= data.length) {
        val cmds = java.util.Arrays.copyOfRange(data, p, p + 8); p += 8
        var i = 0
        while (!eof && i < 8) {
          (cmds(i) & 0xff) match {
            case 0 => ()
            case 252 => eof = true
            case 253 =>
              require(p + 8 <= data.length, s"$path: truncated .sav literal element")
              elems += java.util.Arrays.copyOfRange(data, p, p + 8); p += 8
            case 254 => elems += spaces
            case 255 => elems += sysmisElem
            case code =>
              val a = new Array[Byte](8)
              ByteBuffer.wrap(a).order(buf.order()).putDouble(code - bias)
              elems += a
          }
          i += 1
        }
      }
    }

    if (compression == 0) {
      val need = (if (ncases >= 0) ncases else 0) * totalSlots
      var p = pos
      while (p + 8 <= bytes.length && (ncases < 0 || elems.size < need)) {
        elems += java.util.Arrays.copyOfRange(bytes, p, p + 8); p += 8
      }
    } else if (compression == 1) {
      decodeBytecode(bytes, pos)
    } else {
      // .zsav: zheader (three int64: own offset, trailer offset, trailer
      // length), then one zlib stream per block up to the trailer. The
      // inflated concatenation is exactly the compression-1 bytecode
      // stream (PSPP "ZLIB Data Header"). Block boundaries are recovered
      // from the streams themselves — each block is an independent
      // deflate stream, so we inflate sequentially and reset at
      // stream-end, which avoids trusting the trailer's descriptors.
      val zheaderOfs = buf.getLong(pos)
      val ztrailerOfs = buf.getLong(pos + 8)
      require(zheaderOfs == pos && ztrailerOfs > pos + 24 && ztrailerOfs <= bytes.length,
        s"$path: corrupt .zsav header (zheader_ofs=$zheaderOfs, ztrailer_ofs=$ztrailerOfs)")
      val inflated = new java.io.ByteArrayOutputStream()
      val inf = new java.util.zip.Inflater()
      inf.setInput(bytes, pos + 24, (ztrailerOfs - (pos + 24)).toInt)
      val chunk = new Array[Byte](1 << 16)
      while (!(inf.finished() && inf.getRemaining == 0)) {
        if (inf.finished()) { // block boundary: start the next zlib stream
          val rem = inf.getRemaining
          val nextOff = ztrailerOfs.toInt - rem
          inf.reset()
          inf.setInput(bytes, nextOff, rem)
        }
        val remBefore = inf.getRemaining
        val n = inf.inflate(chunk)
        if (n > 0) inflated.write(chunk, 0, n)
        else if (inf.needsInput() && !inf.finished())
          throw new IllegalArgumentException(s"$path: truncated .zsav zlib data")
        else if (!inf.finished() && inf.getRemaining == remBefore)
          // no output, no input consumed, not at stream end: the inflater
          // can make no progress (needsDictionary or corrupt stream) — fail
          // instead of spinning forever
          throw new IllegalArgumentException(s"$path: corrupt .zsav zlib stream (no inflate progress)")
      }
      inf.end()
      decodeBytecode(inflated.toByteArray, 0)
    }

    val nRows = if (ncases >= 0) math.min(ncases, if (totalSlots == 0) 0 else elems.size / totalSlots)
      else elems.size / math.max(totalSlots, 1)
    val rows = (0 until nRows).map { r =>
      var slot = r * totalSlots
      vars.indices.map { vi =>
        val v = vars(vi)
        if (v.width == 0) {
          val d = ByteBuffer.wrap(elems(slot)).order(buf.order()).getDouble
          slot += 1
          if (d.isNaN || d == Sysmis) ""
          else varValueLabels.get(vi).flatMap(_.get(d)).getOrElse(d.toString)
        } else {
          val n = (v.width + 7) / 8
          val raw = new Array[Byte]((8 * n).toInt)
          (0 until n).foreach { k => System.arraycopy(elems(slot + k), 0, raw, 8 * k, 8) }
          slot += n
          var end = math.min(v.width, raw.length)
          while (end > 0 && (raw(end - 1) == ' '.toByte || raw(end - 1) == 0)) end -= 1
          new String(raw, 0, end, "ISO-8859-1")
        }
      }.toSeq
    }
    (names, rows)
  }
}

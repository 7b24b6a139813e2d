package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/**
 * Stata `.dta` reader — closes the reference's `read_stata` dispatch
 * (reference nodes/source.py:415-417) without pandas: the dta format is
 * publicly documented by Stata (`help dta` / www.stata.com/help.cgi?dta),
 * and this parses it directly. Supported: classic binary formats 113/114/115
 * (Stata 8-12) and pseudo-XML formats 117/118 (Stata 13/14+), in both byte
 * orders (LSF little-endian and MSF big-endian — fixtures for the latter
 * written by pandas with byteorder='>'). Values land as the engine's
 * all-string model: numeric missing sentinels and NaN become "" (the
 * reference's NaN → NULL_REPR, destination.py:57).
 *
 * Driver-side parse, exactly the reference's shape (pandas also
 * materializes the whole frame on one machine) — these legacy single-file
 * formats are inherently non-splittable; rows are then parallelized into a
 * distributed frame. strL (long string) columns are supported for 117/118
 * via the `<strls>` GSO block. Value labels ARE applied to integer columns
 * (the reference's pd.read_stata defaults to convert_categoricals=True):
 * a labeled value renders as its label text, an unlabeled value keeps its
 * numeric rendering — exactly pandas' observed behavior (FIXTURES.md).
 */
object Stata {

  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val (names, rows) =
      if (bytes.length > 11 && new String(bytes, 0, 11, "ASCII") == "<stata_dta>") parseModern(bytes, path)
      else parseClassic(bytes, path)
    val schema = StructType(names.map(n => StructField(n, StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_: _*)).toIndexedSeq),
      schema)
  }

  // ------------------------------------------------------------- classic
  /** dta 113/114/115: fixed header + descriptor blocks + row-major data. */
  private def parseClassic(bytes: Array[Byte], path: String): (Seq[String], Seq[Seq[String]]) = {
    val release = bytes(0) & 0xff
    require(Set(113, 114, 115).contains(release),
      s"$path: unsupported classic dta release $release (supported: 113-115, 117, 118)")
    val byteorder = bytes(1) & 0xff // 1 = MSF (big-endian), 2 = LSF
    require(byteorder == 1 || byteorder == 2, s"$path: invalid dta byteorder flag $byteorder")
    val buf = ByteBuffer.wrap(bytes).order(
      if (byteorder == 1) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    buf.position(4)
    val nvar = buf.getShort & 0xffff
    val nobs = buf.getInt
    buf.position(buf.position() + 81 + 18) // data_label + timestamp
    val types = Array.fill(nvar)(buf.get() & 0xff)
    val names = (0 until nvar).map(_ => readCString(buf, 33, "ISO-8859-1"))
    buf.position(buf.position() + 2 * (nvar + 1)) // srtlist
    val fmtLen = if (release == 113) 12 else 49
    buf.position(buf.position() + fmtLen * nvar) // fmtlist
    val lblNames = (0 until nvar).map(_ => readCString(buf, 33, "ISO-8859-1")) // lbllist
    buf.position(buf.position() + 81 * nvar) // variable labels
    // expansion fields: (type byte, int32 len, payload) until a 5-byte zero
    var done = false
    while (!done) {
      val t = buf.get() & 0xff
      val len = buf.getInt
      if (t == 0 && len == 0) done = true else buf.position(buf.position() + len)
    }

    // value-label tables live AFTER the data; jump over the fixed-width
    // rows, parse them, then return for the rows with labels in hand
    // (the reference's pd.read_stata applies them by default —
    // convert_categoricals=True; unlabeled values stay numeric)
    val dataStart = buf.position()
    val rowWidth = types.map {
      case n if n <= 244 => n
      case 251 => 1; case 252 => 2; case 253 => 4; case 254 => 4; case 255 => 8
      case other => throw new IllegalArgumentException(
        s"$path: unsupported classic dta type code $other")
    }.sum
    buf.position(dataStart + nobs * rowWidth)
    val tables = scala.collection.mutable.Map[String, Map[Int, String]]()
    while (buf.remaining() >= 4 + 33 + 3 + 8) { // len + labname + pad + n + txtlen
      buf.getInt // table length
      val labname = readCString(buf, 33, "ISO-8859-1")
      buf.position(buf.position() + 3)
      tables(labname) = readLabelTable(buf, "ISO-8859-1")
    }
    val varLabels: Seq[Map[Int, String]] =
      lblNames.map(n => tables.getOrElse(n, Map.empty))

    buf.position(dataStart)
    val rows = (0 until nobs).map { _ =>
      types.indices.map(i => readClassicValue(buf, types(i), varLabels(i))).toSeq
    }
    (names, rows)
  }

  /** `n(int32), txtlen(int32), off[n], val[n], txt[txtlen]` — shared by the
    * classic trailing tables and the modern `<lbl>` records. */
  private def readLabelTable(buf: ByteBuffer, charset: String): Map[Int, String] = {
    val n = buf.getInt
    val txtlen = buf.getInt
    val offs = Array.fill(n)(buf.getInt)
    val vals = Array.fill(n)(buf.getInt)
    val txt = new Array[Byte](txtlen)
    buf.get(txt)
    (0 until n).map { k =>
      val start = offs(k)
      var end = start
      while (end < txtlen && txt(end) != 0) end += 1
      vals(k) -> new String(txt, start, end - start, charset)
    }.toMap
  }

  /** Classic type codes: 1-244 = str<n>, 251 byte, 252 int, 253 long,
    * 254 float, 255 double. Labeled integer values render as their label. */
  private def readClassicValue(buf: ByteBuffer, t: Int, labels: Map[Int, String]): String = t match {
    case n if n <= 244 => readCString(buf, n, "ISO-8859-1")
    case 251 => val v = buf.get().toInt
      if (v >= 101) "" else labels.getOrElse(v, v.toString)
    case 252 => val v = buf.getShort.toInt
      if (v >= 32741) "" else labels.getOrElse(v, v.toString)
    case 253 => val v = buf.getInt
      if (v >= 2147483621) "" else labels.getOrElse(v, v.toString)
    case 254 => fmtFloat(buf.getFloat)
    case 255 => fmtDouble(buf.getDouble)
    case other => throw new IllegalArgumentException(s"unsupported classic dta type code $other")
  }

  // -------------------------------------------------------------- modern
  /** dta 117/118: tagged sections; the `<map>` block carries the absolute
    * offset of every section, so parsing jumps straight to
    * `<variable_types>`, `<varnames>` and `<data>`. */
  private def parseModern(bytes: Array[Byte], path: String): (Seq[String], Seq[Seq[String]]) = {
    def after(tag: String, from: Int = 0): Int = {
      val i = indexOf(bytes, tag.getBytes("ASCII"), from)
      require(i >= 0, s"$path: malformed dta — missing $tag")
      i + tag.length
    }
    val release = {
      val p = after("<release>")
      new String(bytes, p, 3, "ASCII").toInt
    }
    require(release == 117 || release == 118,
      s"$path: unsupported modern dta release $release (supported: 117, 118)")
    val bo = new String(bytes, after("<byteorder>"), 3, "ASCII")
    require(bo == "LSF" || bo == "MSF", s"$path: invalid dta byteorder `$bo`")
    val buf = ByteBuffer.wrap(bytes).order(
      if (bo == "MSF") ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    buf.position(after("<K>"))
    val nvar = buf.getShort & 0xffff
    buf.position(after("<N>"))
    val nobs = (if (release == 118) buf.getLong else buf.getInt.toLong).toInt

    // map: 14 uint64 offsets; [2]=<variable_types>, [3]=<varnames>,
    // [9]=<data>, [10]=<strls>
    buf.position(after("<map>"))
    val offsets = Array.fill(14)(buf.getLong)
    buf.position(offsets(2).toInt + "<variable_types>".length)
    val types = Array.fill(nvar)(buf.getShort & 0xffff)
    val nameLen = if (release == 118) 129 else 33
    buf.position(offsets(3).toInt + "<varnames>".length)
    val names = (0 until nvar).map(_ => readCString(buf, nameLen, "UTF-8"))
    val strls =
      if (types.contains(32768)) parseStrls(bytes, buf, offsets(10).toInt, release)
      else java.util.Collections.emptyMap[(Long, Long), String]()

    // value labels (offsets[6] = per-var label-set names, offsets[11] =
    // `<lbl>` tables): applied like pd.read_stata's default
    // convert_categoricals — labeled values render as the label text
    val lblNameLen = if (release == 118) 129 else 33
    buf.position(offsets(6).toInt + "<value_label_names>".length)
    val lblNames = (0 until nvar).map(_ => readCString(buf, lblNameLen, "UTF-8"))
    val tables = scala.collection.mutable.Map[String, Map[Int, String]]()
    buf.position(offsets(11).toInt + "<value_labels>".length)
    while (buf.remaining() >= 5 &&
        new String(bytes, buf.position(), 5, "ASCII") == "<lbl>") {
      buf.position(buf.position() + 5)
      buf.getInt // table length
      val labname = readCString(buf, lblNameLen, "UTF-8")
      buf.position(buf.position() + 3)
      tables(labname) = readLabelTable(buf, "UTF-8")
      buf.position(buf.position() + "</lbl>".length)
    }
    val varLabels: Seq[Map[Int, String]] =
      lblNames.map(n => tables.getOrElse(n, Map.empty))

    buf.position(offsets(9).toInt + "<data>".length)
    val rows = (0 until nobs).map { _ =>
      types.indices.map(i =>
        readModernValue(buf, types(i), release, strls, varLabels(i), path)).toSeq
    }
    (names, rows)
  }

  /** `<strls>` block: a run of GSO records, each
    * "GSO" + v:uint32 + o:(uint32 for 117, uint64 for 118) + t:byte
    * (129 = binary, 130 = null-terminated string) + len:uint32 + payload.
    * Data cells of type strL reference records by the (v, o) key. */
  private def parseStrls(bytes: Array[Byte], buf: ByteBuffer, strlsOff: Int,
                         release: Int): java.util.Map[(Long, Long), String] = {
    val out = new java.util.HashMap[(Long, Long), String]()
    buf.position(strlsOff + "<strls>".length)
    while (buf.remaining() >= 3 && bytes(buf.position()) == 'G' &&
        bytes(buf.position() + 1) == 'S' && bytes(buf.position() + 2) == 'O') {
      buf.position(buf.position() + 3)
      val v = buf.getInt.toLong & 0xffffffffL
      val o = if (release == 117) buf.getInt.toLong & 0xffffffffL else buf.getLong
      val t = buf.get() & 0xff
      val len = buf.getInt
      val payload = new Array[Byte](len)
      buf.get(payload)
      val end = if (t == 130 && len > 0 && payload(len - 1) == 0) len - 1 else len
      out.put((v, o), new String(payload, 0, end, "UTF-8"))
    }
    out
  }

  /** Modern type codes: 1-2045 = str<n>, 32768 strL, 65526 double,
    * 65527 float, 65528 long, 65529 int, 65530 byte. strL cells hold a
    * (v, o) pointer into the `<strls>` GSO map — 4+4 bytes in 117,
    * 2+6 bytes in 118; (0, 0) is the empty/missing strL. */
  private def readModernValue(buf: ByteBuffer, t: Int, release: Int,
                              strls: java.util.Map[(Long, Long), String],
                              labels: Map[Int, String],
                              path: String): String = t match {
    case n if n <= 2045 => readCString(buf, n, "UTF-8")
    case 32768 =>
      val (v, o) =
        if (release == 117) (buf.getInt.toLong & 0xffffffffL, buf.getInt.toLong & 0xffffffffL)
        else {
          val vv = (buf.getShort & 0xffff).toLong
          var oo = 0L
          var i = 0
          if (buf.order() == ByteOrder.BIG_ENDIAN)
            while (i < 6) { oo = (oo << 8) | (buf.get().toLong & 0xffL); i += 1 }
          else
            while (i < 6) { oo |= (buf.get().toLong & 0xffL) << (8 * i); i += 1 }
          (vv, oo)
        }
      if (v == 0L && o == 0L) "" else strls.getOrDefault((v, o), "")
    case 65526 => fmtDouble(buf.getDouble)
    case 65527 => fmtFloat(buf.getFloat)
    case 65528 => val v = buf.getInt
      if (v >= 2147483621) "" else labels.getOrElse(v, v.toString)
    case 65529 => val v = buf.getShort.toInt
      if (v >= 32741) "" else labels.getOrElse(v, v.toString)
    case 65530 => val v = buf.get().toInt
      if (v >= 101) "" else labels.getOrElse(v, v.toString)
    case other => throw new IllegalArgumentException(s"unsupported modern dta type code $other")
  }

  // ------------------------------------------------------------- helpers
  /** Stata numeric missing sentinels (`.` through `.z`) sit above the
    * largest representable non-missing value; anything at or beyond the
    * base sentinel (and NaN) renders as the reference's "" null. The base
    * sentinels are exact bit patterns — float `.` = 0x7f000000, double `.` =
    * 0x7fe0000000000000 — so compare raw bits: a magnitude threshold rounds
    * to the largest NON-missing value (0x7effffff) and would swallow it. */
  private def fmtFloat(f: Float): String =
    if (f.isNaN || java.lang.Float.floatToIntBits(f) >= 0x7f000000) "" else f.toString
  private def fmtDouble(d: Double): String =
    if (d.isNaN || java.lang.Double.doubleToLongBits(d) >= 0x7fe0000000000000L) "" else d.toString

  private def readCString(buf: ByteBuffer, len: Int, charset: String): String = {
    val arr = new Array[Byte](len)
    buf.get(arr)
    val end = arr.indexOf(0: Byte)
    new String(arr, 0, if (end < 0) len else end, charset)
  }

  private def indexOf(haystack: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    while (i <= haystack.length - needle.length) {
      var j = 0
      while (j < needle.length && haystack(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}

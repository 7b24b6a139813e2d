// scratch fixture/gate-data generator for the native Stata reader
package graft.tools

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/**
 * Minimal Stata `.dta` writer (classic format 114, little-endian) — feeds
 * engine/Stata.scala's gate query with runtime data, complementing the
 * pandas-written spec fixtures (FIXTURES.md). Layout per Stata's public
 * dta documentation: fixed header, typlist/varlist/srtlist/fmtlist/
 * lbllist descriptors, empty expansion fields, then row-major data.
 * Supported column kinds: `long` (type 253, None → the 0x7fffffff missing
 * sentinel), `double` (type 255, None → Stata '.' = 0x7fe0000000000000)
 * and fixed-width strings (type = width, null-padded).
 */
object GenStata {

  sealed trait Col { def name: String }
  final case class LongCol(name: String, values: Seq[Option[Int]]) extends Col
  final case class DblCol(name: String, values: Seq[Option[Double]]) extends Col
  final case class StrCol(name: String, width: Int, values: Seq[String]) extends Col {
    require(width >= 1 && width <= 244)
  }

  def write(path: String, cols: Seq[Col], nrows: Int): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v)
    def i16(v: Int): Unit = { b(v & 0xff); b((v >> 8) & 0xff) }
    def i32(v: Int): Unit = {
      val a = new Array[Byte](4)
      ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN).putInt(v); out.write(a)
    }
    def f64(v: Double): Unit = {
      val a = new Array[Byte](8)
      ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN).putDouble(v); out.write(a)
    }
    def cstr(s: String, len: Int): Unit = { // null-terminated (descriptors)
      val raw = s.getBytes("ISO-8859-1").take(len - 1)
      out.write(raw); (raw.length until len).foreach(_ => b(0))
    }
    def fstr(s: String, len: Int): Unit = { // fixed-width data cell, 0-padded
      val raw = s.getBytes("ISO-8859-1").take(len)
      out.write(raw); (raw.length until len).foreach(_ => b(0))
    }

    b(114); b(2); b(1); b(0) // release, LSF, filetype, unused
    i16(cols.length); i32(nrows)
    cstr("graft fixture", 81)
    cstr("01 Jan 2026 00:00", 18)
    cols.foreach { // typlist
      case _: LongCol => b(253)
      case _: DblCol => b(255)
      case c: StrCol => b(c.width)
    }
    cols.foreach(c => cstr(c.name, 33)) // varlist
    (0 to cols.length).foreach(_ => i16(0)) // srtlist
    cols.foreach(_ => cstr("%9.0g", 49)) // fmtlist (49 bytes in 114+)
    cols.foreach(_ => cstr("", 33)) // lbllist
    cols.foreach(_ => cstr("", 81)) // variable labels
    b(0); i32(0) // expansion fields terminator
    (0 until nrows).foreach { r =>
      cols.foreach {
        case LongCol(_, vs) => i32(vs(r).getOrElse(0x7fffffff))
        case DblCol(_, vs) =>
          vs(r) match {
            case Some(v) => f64(v)
            case None => f64(java.lang.Double.longBitsToDouble(0x7fe0000000000000L))
          }
        case StrCol(_, w, vs) => fstr(vs(r), w)
      }
    }
    Files.write(Paths.get(path), out.toByteArray)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp")
    write(s"$dir/gen_sample.dta", Seq(
      LongCol("id", Seq(Some(1), Some(2), None)),
      DblCol("score", Seq(Some(1.5), None, Some(-2.25))),
      StrCol("name", 8, Seq("alpha", "beta", ""))), 3)
    println(s"wrote gen_sample.dta under $dir")
  }
}

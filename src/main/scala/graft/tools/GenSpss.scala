// scratch fixture generator: runMain graft.tools.GenSpss <outDir>
package graft.tools

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/**
 * Minimal SPSS `.sav` writer — exists ONLY to produce test fixtures for
 * the native reader (engine/Spss.scala), following GNU PSPP's public
 * "System File Format" documentation. NOTE (recorded in FIXTURES.md): no
 * independent .sav implementation is available offline (no pyreadstat, no
 * pspp, no R), so unlike the sas7bdat fixtures these are validated by the
 * spec + round-trip only.
 *
 * Writes little-endian files with: the 176-byte header, variable records
 * (numeric, and strings up to 255 bytes with type −1 continuation slots),
 * a type-7 subtype-13 long-variable-names record, the type-999
 * terminator, and data either uncompressed (compression 0),
 * bytecode-compressed (compression 1, bias 100: codes 1-251 = value−bias,
 * 253 = literal 8-byte element follows, 254 = eight spaces, 255 = SYSMIS),
 * or zlib-wrapped `.zsav` (compression 2, `$FL3`: the bytecode stream
 * split into `zsavBlockSize` chunks, each an independent deflate stream,
 * framed by the zheader and the descriptor trailer).
 */
object GenSpss {

  sealed trait Col { def short: String; def long: String }
  final case class NumCol(short: String, long: String, values: Seq[Option[Double]]) extends Col
  final case class StrCol(short: String, long: String, width: Int, values: Seq[String]) extends Col

  private val Sysmis = java.lang.Double.longBitsToDouble(0xffefffffffffffffL)

  def write(path: String, cols: Seq[Col], nrows: Int, compression: Int,
            zsavBlockSize: Int = 0x3ff000, be: Boolean = false,
            valueLabels: Map[String, Map[Double, String]] = Map.empty,
            extraInfoRecord: Option[(Int, Array[Byte])] = None): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    val order = if (be) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    def le(n: Int): Array[Byte] = {
      val a = new Array[Byte](4); ByteBuffer.wrap(a).order(order).putInt(n); a
    }
    def led(d: Double): Array[Byte] = {
      val a = new Array[Byte](8); ByteBuffer.wrap(a).order(order).putDouble(d); a
    }
    def pad(s: String, n: Int): Array[Byte] = {
      val b = s.getBytes("ISO-8859-1").take(n)
      b ++ Array.fill(n - b.length)(' '.toByte)
    }

    val slots = cols.map { case _: NumCol => 1; case c: StrCol => (c.width + 7) / 8 }

    // ---- header (176 bytes)
    out.write(pad(if (compression == 2) "$FL3" else "$FL2", 4))
    out.write(pad("@(#) SPSS DATA FILE graft test writer", 60))
    out.write(le(2))             // layout_code → little-endian marker
    out.write(le(slots.sum))     // nominal_case_size
    out.write(le(compression))
    out.write(le(0))             // weight_index
    out.write(le(nrows))         // ncases
    out.write(led(100.0))        // compression bias
    out.write(pad("01 Jan 26", 9))
    out.write(pad("00:00:00", 8))
    out.write(pad("graft fixture", 64))
    out.write(pad("", 3))

    // ---- variable records (type 2); long strings add type −1 continuations
    def varRecord(typ: Int, name: String): Unit = {
      out.write(le(2)); out.write(le(typ))
      out.write(le(0)) // has_var_label
      out.write(le(0)) // n_missing_values
      out.write(le(0)); out.write(le(0)) // print / write formats
      out.write(pad(name, 8))
    }
    cols.foreach {
      case c: NumCol => varRecord(0, c.short)
      case c: StrCol =>
        varRecord(c.width, c.short)
        (1 until (c.width + 7) / 8).foreach(_ => varRecord(-1, ""))
    }

    // ---- value labels: a type-3 value->label table followed by the
    // type-4 record naming the 1-based dictionary slot(s) it applies to
    if (valueLabels.nonEmpty) {
      val slotOf = scala.collection.mutable.Map[String, Int]()
      var slot = 0
      cols.foreach { c =>
        slot += 1; slotOf(c.short) = slot
        c match { case sc: StrCol => slot += (sc.width + 7) / 8 - 1; case _ => () }
      }
      valueLabels.foreach { case (short, table) =>
        out.write(le(3)); out.write(le(table.size))
        table.foreach { case (v, label) =>
          out.write(led(v))
          val lb = label.getBytes("ISO-8859-1")
          require(lb.length < 256, "label too long")
          out.write(lb.length)
          out.write(lb)
          val pad = (lb.length + 8) / 8 * 8 - 1 - lb.length
          (0 until pad).foreach(_ => out.write(' '.toInt))
        }
        out.write(le(4)); out.write(le(1)); out.write(le(slotOf(short)))
      }
    }

    // ---- type-7 subtype-13: long variable names
    val pairs = cols.map(c => s"${c.short}=${c.long}").mkString("\t").getBytes("ISO-8859-1")
    out.write(le(7)); out.write(le(13)); out.write(le(1)); out.write(le(pairs.length))
    out.write(pairs)

    // ---- optional arbitrary type-7 info record (tests inject unsupported
    // subtypes with it, e.g. subtype 14 very-long-strings)
    extraInfoRecord.foreach { case (subtype, payload) =>
      out.write(le(7)); out.write(le(subtype)); out.write(le(1)); out.write(le(payload.length))
      out.write(payload)
    }

    // ---- dictionary terminator
    out.write(le(999)); out.write(le(0))

    // ---- data
    val caseElems: Seq[Seq[Array[Byte]]] = (0 until nrows).map { r =>
      cols.flatMap {
        case NumCol(_, _, vs) => Seq(led(vs(r).getOrElse(Sysmis)))
        case StrCol(_, _, w, vs) =>
          val raw = pad(vs(r), (w + 7) / 8 * 8)
          raw.grouped(8).toSeq
      }
    }
    def bytecodeStream(): Array[Byte] = {
      val bc = new java.io.ByteArrayOutputStream()
      val cmds = scala.collection.mutable.ArrayBuffer[Int]()
      val lits = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      def flush(): Unit = if (cmds.nonEmpty) {
        while (cmds.size < 8) cmds += 0
        cmds.foreach(bc.write)
        lits.foreach(bc.write)
        cmds.clear(); lits.clear()
      }
      def emit(cmd: Int, lit: Option[Array[Byte]]): Unit = {
        cmds += cmd; lit.foreach(lits += _)
        if (cmds.size == 8) flush()
      }
      val spaces = Array.fill(8)(' '.toByte)
      val kinds = cols.flatMap {
        case _: NumCol => Seq('n')
        case c: StrCol => Seq.fill((c.width + 7) / 8)('s')
      }
      caseElems.foreach { elems =>
        elems.zip(kinds).foreach { case (e, kind) =>
          if (kind == 'n') {
            val d = ByteBuffer.wrap(e).order(order).getDouble
            if (d == Sysmis) emit(255, None)
            else if (d == math.rint(d) && d >= 1 - 100 && d <= 251 - 100)
              emit((d + 100).toInt, None)
            else emit(253, Some(e))
          } else {
            if (e.sameElements(spaces)) emit(254, None)
            else emit(253, Some(e))
          }
        }
      }
      emit(252, None) // end of data
      flush()
      bc.toByteArray
    }

    compression match {
      case 0 => caseElems.foreach(_.foreach(out.write))
      case 1 => out.write(bytecodeStream())
      case 2 =>
        // zheader (own offset, trailer offset, trailer length) + one
        // deflate stream per <=zsavBlockSize chunk + descriptor trailer
        def le8(n: Long): Array[Byte] = {
          val a = new Array[Byte](8)
          ByteBuffer.wrap(a).order(order).putLong(n); a
        }
        val raw = bytecodeStream()
        val blocks = raw.grouped(math.max(zsavBlockSize, 8)).toSeq
        val deflated = blocks.map { b =>
          val d = new java.util.zip.Deflater()
          d.setInput(b); d.finish()
          val outB = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](1 << 16)
          while (!d.finished()) { val n = d.deflate(tmp); outB.write(tmp, 0, n) }
          d.end(); outB.toByteArray
        }
        val zheaderOfs = out.size().toLong
        val ztrailerOfs = zheaderOfs + 24 + deflated.map(_.length.toLong).sum
        val ztrailerLen = 24L + 24L * blocks.size
        out.write(le8(zheaderOfs)); out.write(le8(ztrailerOfs)); out.write(le8(ztrailerLen))
        deflated.foreach(out.write)
        out.write(le8(-100L)); out.write(le8(0L)) // trailer: bias as negative, zero
        out.write(le(zsavBlockSize)); out.write(le(blocks.size))
        var uOfs = zheaderOfs; var cOfs = zheaderOfs + 24
        blocks.zip(deflated).foreach { case (u, c) =>
          out.write(le8(uOfs)); out.write(le8(cOfs))
          out.write(le(u.length)); out.write(le(c.length))
          uOfs += u.length; cOfs += c.length
        }
      case other => throw new IllegalArgumentException(s"compression $other")
    }

    Files.write(Paths.get(path), out.toByteArray)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("src/test/resources")
    val cols = Seq(
      NumCol("ID", "id", Seq(1, 2, 3, 4, 5).map(d => Some(d.toDouble))),
      NumCol("SCORE", "score", Seq(Some(1.5), Some(-2.25), None, Some(1e10), Some(42.0))),
      StrCol("NAME", "name", 8, Seq("alpha", "beta", "gamma", "delta", "eps")),
      StrCol("CITY", "city_name", 12, Seq("tokyo", "nairobi", "", "oslo", "quito")))
    write(s"$dir/sample_plain.sav", cols, 5, compression = 0)
    write(s"$dir/sample_comp.sav", cols, 5, compression = 1)
    // 48-byte blocks force multiple deflate streams in a tiny fixture,
    // exercising the reader's stream-reset block loop
    write(s"$dir/sample_multi.zsav", cols, 5, compression = 2, zsavBlockSize = 48)
    // big-endian bytecode-compressed variant (layout_code self-detection)
    write(s"$dir/sample_be.sav", cols, 5, compression = 1, be = true)
    // value-labeled numeric column: 9.0 stays unlabeled (pandas renders the
    // label for labeled values and the number otherwise)
    write(s"$dir/sample_labels.sav", Seq(
      NumCol("ID", "id", Seq(1, 2, 3, 4).map(d => Some(d.toDouble))),
      NumCol("GRADE", "grade", Seq(Some(1.0), Some(2.0), Some(3.0), Some(9.0))),
      StrCol("NAME", "name", 8, Seq("a", "b", "c", "d"))), 4, compression = 1,
      valueLabels = Map("GRADE" -> Map(1.0 -> "low", 2.0 -> "mid", 3.0 -> "high")))
    println(s"wrote sample_plain.sav, sample_comp.sav, sample_multi.zsav, sample_be.sav, sample_labels.sav under $dir")
  }
}

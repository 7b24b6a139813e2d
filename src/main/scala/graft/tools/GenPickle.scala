// scratch fixture/gate-data generator for the native pickle reader
package graft.tools

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/**
 * Minimal writer of pandas-DataFrame pickles (protocol 4) — exists to feed
 * engine/Pickle.scala's gate query with runtime data and its spec with
 * round-trip cases. Emits exactly the object graph `pd.to_pickle` writes
 * (PEP 3154 opcodes; DataFrame → BlockManager → `_unpickle_block` →
 * numpy `_frombuffer` / `_reconstruct`): one int64 block per NumCol and
 * one object-ndarray block per StrCol, a `_new_Index(Index, …)` column
 * axis and a `_new_Index(RangeIndex, …)` row axis. Output is valid for
 * CPython's own unpickler — cross-validated once with the container's
 * real pandas (`pd.read_pickle`), transcript in FIXTURES.md.
 */
object GenPickle {

  sealed trait Col { def name: String }
  final case class NumCol(name: String, values: Seq[Long]) extends Col
  final case class StrCol(name: String, values: Seq[String]) extends Col

  def write(path: String, cols: Seq[Col], nrows: Int): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    def op(b: Int): Unit = out.write(b)
    def str(s: String): Unit = { // SHORT_BINUNICODE / BINUNICODE
      val b = s.getBytes("UTF-8")
      if (b.length < 256) { op(0x8c); op(b.length) }
      else { op('X'); val a = new Array[Byte](4)
        ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN).putInt(b.length); out.write(a) }
      out.write(b)
    }
    def global(module: String, name: String): Unit = { str(module); str(name); op(0x93) }
    def int(v: Long): Unit = {
      if (v >= 0 && v < 256) { op('K'); op(v.toInt) }
      else if (v >= Int.MinValue && v <= Int.MaxValue) {
        op('J'); val a = new Array[Byte](4)
        ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt); out.write(a)
      } else { // LONG1, 8-byte two's complement
        op(0x8a); op(8); val a = new Array[Byte](8)
        ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN).putLong(v); out.write(a)
      }
    }
    def bytes(b: Array[Byte]): Unit = { // SHORT_BINBYTES / BINBYTES
      if (b.length < 256) { op('C'); op(b.length) }
      else { op('B'); val a = new Array[Byte](4)
        ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN).putInt(b.length); out.write(a) }
      out.write(b)
    }
    def none(): Unit = op('N')
    def tuple(n: Int): Unit = n match {
      case 0 => op(')'); case 1 => op(0x85); case 2 => op(0x86); case 3 => op(0x87)
      case _ => throw new IllegalArgumentException("use MARK for wide tuples")
    }
    def dtype(code: String): Unit = { // numpy.dtype(code, False, True) via REDUCE
      global("numpy", "dtype"); str(code); op(0x89); op(0x88); tuple(3); op('R')
    }
    def pySlice(a: Int, b: Int): Unit = {
      global("builtins", "slice"); int(a); int(b); int(1); tuple(3); op('R')
    }
    op(0x80); op(4) // PROTO 4
    global("pandas.core.frame", "DataFrame"); tuple(0); op(0x81) // NEWOBJ
    op('}') // state dict
    op('(') // MARK for SETITEMS
    str("_mgr")
    global("pandas.core.internals.managers", "BlockManager")
    // ---- blocks tuple
    op('(')
    cols.zipWithIndex.foreach { case (c, pos) =>
      global("pandas._libs.internals", "_unpickle_block")
      c match {
        case NumCol(_, vs) => // _frombuffer(data, dtype('i8'), (1, n), 'C')
          global("numpy.core.numeric", "_frombuffer")
          val data = new Array[Byte](8 * vs.length)
          val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
          vs.foreach(bb.putLong)
          op('('); bytes(data); dtype("i8"); int(1); int(vs.length); tuple(2)
          str("C"); op('t'); op('R')
        case StrCol(_, vs) => // _reconstruct + BUILD with a list payload
          global("numpy.core.multiarray", "_reconstruct")
          global("numpy", "ndarray"); int(0); tuple(1); bytes(Array('b'.toByte))
          tuple(3); op('R')
          op('('); int(1); int(1); int(vs.length); tuple(2); dtype("O8"); op(0x89)
          op(']'); op('('); vs.foreach(v => if (v == null) none() else str(v)); op('e')
          op('t'); op('b') // BUILD state (version, shape, dtype, fortran, data)
      }
      pySlice(pos, pos + 1)
      int(2)
      tuple(3); op('R') // _unpickle_block(values, placement, ndim=2)
    }
    op('t')
    // ---- axes list: [column Index, row RangeIndex]
    op(']'); op('(')
    global("pandas.core.indexes.base", "_new_Index")
    global("pandas.core.indexes.base", "Index")
    op('}'); op('(')
    str("data")
    global("numpy.core.multiarray", "_reconstruct")
    global("numpy", "ndarray"); int(0); tuple(1); bytes(Array('b'.toByte)); tuple(3); op('R')
    op('('); int(1); int(cols.length); tuple(1); dtype("O8"); op(0x89)
    op(']'); op('('); cols.foreach(c => str(c.name)); op('e')
    op('t'); op('b')
    str("name"); none()
    op('u')
    tuple(2); op('R')
    global("pandas.core.indexes.base", "_new_Index")
    global("pandas.core.indexes.range", "RangeIndex")
    op('}'); op('(')
    str("start"); int(0); str("stop"); int(nrows); str("step"); int(1)
    str("name"); none()
    op('u')
    tuple(2); op('R')
    op('e')
    tuple(2); op('R') // BlockManager((blocks), [axes])
    str("_typ"); str("dataframe")
    op('u') // SETITEMS
    op('b') // BUILD the DataFrame
    op('.') // STOP
    Files.write(Paths.get(path), out.toByteArray)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp")
    write(s"$dir/gen_frame.pkl", Seq(
      NumCol("id", Seq(1L, 2L, 3L)),
      StrCol("name", Seq("alpha", "béta", null))), 3)
    println(s"wrote gen_frame.pkl under $dir")
  }
}

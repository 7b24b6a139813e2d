package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/**
 * Native reader for pandas-pickled DataFrames — closes the reference's
 * pickle dispatch (reference nodes/source.py:254-255, `pd.read_pickle`)
 * without a Python runtime. The pickle wire format is publicly documented
 * (PEP 307, PEP 3154, CPython `pickletools`); this implements a
 * RESTRICTED unpickler: the full protocol 0-5 opcode set needed by
 * pandas (including the text protocols' INT/LONG/FLOAT/UNICODE/DICT/LIST
 * opcodes and the `copyreg._reconstructor` construction path that
 * replaces NEWOBJ below protocol 2), but construction is limited to an
 * allow-list of the globals a
 * pandas DataFrame pickle actually contains (DataFrame / BlockManager /
 * `_unpickle_block` / numpy `_frombuffer`-`_reconstruct` / Index /
 * RangeIndex / DatetimeArray). Anything outside the allow-list raises a
 * clear error instead of executing — by design this cannot run arbitrary
 * pickle payloads, which is also the safe behavior for untrusted files.
 *
 * Supported column dtypes, rendered into the engine's all-string model:
 * i1-i8 / u1-u8 (integers, u8 unsigned-rendered), f4/f8 (NaN → ""),
 * b1 ("True"/"False", pandas `str()` style), object (str elements pass
 * through; None/NaN → ""), and datetime64 in s/ms/us/ns units (NaT → "",
 * else "yyyy-MM-dd HH:mm:ss[.fraction]" with trailing zeros trimmed).
 * The row index is dropped (the engine's frames are positional, like the
 * reference's CSV-normalized model); column names come from the column
 * Index, including RangeIndex columns stringified. Fixtures are written
 * by the container's real pandas (protocols 0, 1, 2, 4 and 5) — see
 * FIXTURES.md.
 *
 * Driver-side parse like Stata/Sas/Spss — a pickle is one sequential
 * stream (non-splittable); rows are parallelized after.
 */
object Pickle {

  def read(spark: SparkSession, path: String): DataFrame = {
    val (names, rows) = parse(Files.readAllBytes(Paths.get(path)), path)
    val schema = StructType(names.map(n => StructField(n, StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_: _*)).toIndexedSeq),
      schema)
  }

  // ------------------------------------------------------------ model
  private final case class Global(module: String, name: String)
  private final class PyObj(val cls: Global) { var state: Any = null }
  private final class Dt(val code: String) {
    var byteorder: Char = '<'
    var unit: String = "ns"
  }
  private final class NdArr {
    var dtype: Dt = null
    var shape: Seq[Long] = Nil
    var data: Any = null // Array[Byte] | Seq[Any] (object arrays)
    var fortran: Boolean = false
  }
  private final case class PySlice(start: Long, stop: Long, step: Long)
  private final case class Block(values: Any, placement: Any)
  private final case class Manager(blocks: Seq[Any], axes: Seq[Any])
  private final class NdBacked { var state: Any = null } // DatetimeArray et al.
  private final case class RangeIdx(start: Long, stop: Long, step: Long)
  private final case class NamesIdx(values: Seq[Any])

  // ------------------------------------------------------------ the VM
  private def parse(bytes: Array[Byte], path: String): (Seq[String], Seq[Seq[String]]) = {
    import scala.collection.mutable
    val stack = mutable.ArrayBuffer[Any]()
    val marks = mutable.ArrayBuffer[Int]()
    val memo = mutable.HashMap[Int, Any]()
    var p = 0
    def fail(msg: String): Nothing = throw new IllegalArgumentException(s"$path: $msg")
    def u1(): Int = { val v = bytes(p) & 0xff; p += 1; v }
    def i4(): Int = {
      val v = ByteBuffer.wrap(bytes, p, 4).order(ByteOrder.LITTLE_ENDIAN).getInt; p += 4; v
    }
    def u8(): Long = {
      val v = ByteBuffer.wrap(bytes, p, 8).order(ByteOrder.LITTLE_ENDIAN).getLong; p += 8; v
    }
    def take(n: Int): Array[Byte] = {
      require(p + n <= bytes.length, s"$path: truncated pickle")
      val a = java.util.Arrays.copyOfRange(bytes, p, p + n); p += n; a
    }
    def popMark(): Seq[Any] = {
      val m = marks.remove(marks.length - 1)
      val items = stack.slice(m, stack.length).toVector
      stack.remove(m, stack.length - m)
      items
    }
    def pop(): Any = stack.remove(stack.length - 1)
    def lineBytes(): Array[Byte] = { // newline-terminated raw arg
      val start = p
      while (bytes(p) != '\n'.toByte) p += 1
      val b = java.util.Arrays.copyOfRange(bytes, start, p); p += 1; b
    }
    def line(): String = // newline-terminated ASCII arg (GLOBAL, INT, PUT…)
      new String(lineBytes(), "ASCII")

    // protocol 2+ opens with PROTO (0x80); text protocols 0/1 open with the
    // first real opcode — for any pandas DataFrame that is GLOBAL ('c'),
    // but accept the other container openers a generic frame could start on
    require(bytes.length >= 2 && ((bytes(0) & 0xff) == 0x80 ||
        "c(]}".contains(bytes(0).toChar)),
      s"$path: not a pickle stream (no pickle opcode at byte 0)")

    var running = true
    while (running) {
      val op = u1()
      op match {
        case 0x80 => val proto = u1() // PROTO
          if (proto > 5) fail(s"unsupported pickle protocol $proto")
        case 0x95 => p += 8 // FRAME: length hint, stream is contiguous
        case '.' => running = false // STOP
        case '(' => marks += stack.length // MARK
        case ')' => stack += Vector.empty // EMPTY_TUPLE
        case 't' => stack += popMark() // TUPLE
        case 0x85 => val a = pop(); stack += Vector(a) // TUPLE1
        case 0x86 => val b = pop(); val a = pop(); stack += Vector(a, b) // TUPLE2
        case 0x87 =>
          val c = pop(); val b = pop(); val a = pop(); stack += Vector(a, b, c) // TUPLE3
        case ']' => stack += mutable.ArrayBuffer[Any]() // EMPTY_LIST
        case 'a' => // APPEND
          val v = pop(); stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] += v
        case 'e' => // APPENDS
          val items = popMark(); stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] ++= items
        case '}' => stack += mutable.LinkedHashMap[Any, Any]() // EMPTY_DICT
        case 's' => // SETITEM
          val v = pop(); val k = pop()
          stack.last.asInstanceOf[mutable.LinkedHashMap[Any, Any]] += k -> v
        case 'u' => // SETITEMS
          val items = popMark()
          val d = stack.last.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
          items.grouped(2).foreach { case Seq(k, v) => d += k -> v }
        case 'N' => stack += null // NONE
        case 0x88 => stack += java.lang.Boolean.TRUE // NEWTRUE
        case 0x89 => stack += java.lang.Boolean.FALSE // NEWFALSE
        case 'K' => stack += u1().toLong // BININT1
        case 'M' => stack += (u1() | (u1() << 8)).toLong // BININT2
        case 'J' => stack += i4().toLong // BININT
        case 0x8a => // LONG1: n-byte little-endian two's complement
          val n = u1(); stack += decodeLong1(take(n), fail)
        case 'G' => // BINFLOAT: big-endian double
          stack += ByteBuffer.wrap(take(8)).order(ByteOrder.BIG_ENDIAN).getDouble
        case 0x8c => stack += new String(take(u1()), "UTF-8") // SHORT_BINUNICODE
        case 'X' => stack += new String(take(i4()), "UTF-8") // BINUNICODE
        case 0x8d => stack += new String(take(u8().toInt), "UTF-8") // BINUNICODE8
        case 'U' => stack += new String(take(u1()), "ISO-8859-1") // SHORT_BINSTRING
        case 'T' => stack += new String(take(i4()), "ISO-8859-1") // BINSTRING
        case 'C' => stack += take(u1()) // SHORT_BINBYTES
        case 'B' => stack += take(i4()) // BINBYTES
        case 0x8e => stack += take(u8().toInt) // BINBYTES8
        case 0x96 => stack += take(u8().toInt) // BYTEARRAY8
        case 0x94 => memo(memo.size) = stack.last // MEMOIZE
        case 'q' => memo(u1()) = stack.last // BINPUT
        case 'r' => memo(i4()) = stack.last // LONG_BINPUT
        case 'h' => stack += memo(u1()) // BINGET
        case 'j' => stack += memo(i4()) // LONG_BINGET
        // ---- text-protocol (0/1) opcodes: newline-terminated repr args ----
        case 'I' => line() match { // INT; I01/I00 spell bool below proto 2
          case "01" => stack += java.lang.Boolean.TRUE
          case "00" => stack += java.lang.Boolean.FALSE
          case s => stack += s.toLong
        }
        case 'L' => // LONG: decimal repr with an optional trailing 'L'
          val s = line().stripSuffix("L")
          val big = BigInt(s)
          if (!big.isValidLong) fail(s"LONG `$s` exceeds 64-bit signed range")
          stack += big.toLong
        case 'F' => stack += (line() match { // FLOAT: Python repr
          case "nan" => Double.NaN
          case "inf" => Double.PositiveInfinity
          case "-inf" => Double.NegativeInfinity
          case s => s.toDouble
        })
        case 'V' => stack += rawUnicodeEscape(lineBytes()) // UNICODE
        case 'S' => stack += stringEscapeDecode(line(), fail) // STRING (py2)
        case 'd' => // DICT: mark-delimited alternating key/value pairs
          val items = popMark()
          val m = mutable.LinkedHashMap[Any, Any]()
          items.grouped(2).foreach { case Seq(k, v) => m += k -> v }
          stack += m
        case 'l' => stack += mutable.ArrayBuffer[Any](popMark(): _*) // LIST
        case 'p' => memo(line().toInt) = stack.last // PUT
        case 'g' => stack += memo(line().toInt) // GET
        case '0' => pop() // POP
        case '1' => popMark() // POP_MARK
        case '2' => stack += stack.last // DUP
        case 'c' => stack += Global(line(), line()) // GLOBAL (proto <4)
        case 0x93 => // STACK_GLOBAL
          val name = pop().asInstanceOf[String]
          val module = pop().asInstanceOf[String]
          stack += Global(module, name)
        case 0x81 => // NEWOBJ
          val args = pop(); val cls = pop()
          stack += newobj(cls, args, fail)
        case 'R' => // REDUCE
          val args = pop().asInstanceOf[scala.collection.Seq[Any]]
          val fn = pop()
          stack += reduce(fn, args, fail)
        case 'b' => // BUILD
          val state = pop()
          build(stack.last, state, fail)
        case other =>
          fail(f"unsupported pickle opcode 0x$other%02x at offset ${p - 1} " +
            "(only the pandas DataFrame object graph is supported)")
      }
    }
    interpret(stack.last, fail)
  }

  // ---------------------------------------------- allow-listed constructors
  /** LONG1 payload → Long. Beyond 8 bytes only pure sign extension fits in
    * a Long — anything else (Python ints in [2^63, 2^64) pickle as 9 bytes)
    * must fail fast, not truncate to a wrong negative value. */
  private[engine] def decodeLong1(b: Array[Byte], fail: String => Nothing): Long = {
    val n = b.length
    if (n > 8) {
      val sign: Byte = if ((b(7) & 0x80) != 0) -1 else 0
      if ((8 until n).exists(b(_) != sign))
        fail(s"LONG1 of $n bytes exceeds 64-bit signed range")
    }
    var v = 0L
    var i = math.min(n, 8) - 1
    while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
    if (n > 0 && n < 8 && (b(n - 1) & 0x80) != 0) v -= (1L << (8 * n))
    v
  }

  /** Protocol-0 UNICODE payload: latin-1 bytes except `\\uXXXX`/`\\UXXXXXXXX`
    * escapes (the pickler pre-escapes backslash/newline/CR/NUL/0x1a the same
    * way, so a literal backslash always arrives as `\\u005c`). */
  private[engine] def rawUnicodeEscape(b: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    def hex(off: Int, n: Int): Int =
      Integer.parseInt(new String(b, off, n, "ASCII"), 16)
    while (i < b.length) {
      val c = (b(i) & 0xff).toChar
      if (c == '\\' && i + 5 < b.length && b(i + 1) == 'u') {
        sb.append(hex(i + 2, 4).toChar); i += 6
      } else if (c == '\\' && i + 9 < b.length && b(i + 1) == 'U') {
        sb.appendAll(Character.toChars(hex(i + 2, 8))); i += 10
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Protocol-0 STRING payload (Python 2 pickles only): repr-quoted with
    * backslash escapes, decoded to latin-1 like the binary string opcodes. */
  private def stringEscapeDecode(s: String, fail: String => Nothing): String = {
    if (s.length < 2 || s.charAt(0) != s.charAt(s.length - 1) ||
        (s.charAt(0) != '\'' && s.charAt(0) != '"'))
      fail(s"malformed STRING opcode payload $s")
    val body = s.substring(1, s.length - 1)
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) {
        body.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '"' => sb.append('"'); i += 2
          case 'x' if i + 3 < body.length =>
            sb.append(Integer.parseInt(body.substring(i + 2, i + 4), 16).toChar)
            i += 4
          case other => fail(s"unsupported STRING escape \\$other")
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def newobj(cls: Any, args: Any, fail: String => Nothing): Any = cls match {
    case g @ Global("pandas.core.frame", "DataFrame") => new PyObj(g)
    case g @ Global("pandas.core.series", "Series") =>
      fail("pickled pandas Series are not supported — pickle a DataFrame")
    case Global(m, n) => fail(s"NEWOBJ of unsupported class $m.$n")
    case other => fail(s"NEWOBJ of non-class $other")
  }

  private def reduce(fn: Any, args: scala.collection.Seq[Any], fail: String => Nothing): Any = fn match {
    // below protocol 2 there is no NEWOBJ: object.__reduce_ex__ routes
    // class construction through copyreg._reconstructor(cls, base, state)
    case Global("copyreg" | "copy_reg", "_reconstructor") => args.head match {
      case g @ Global("pandas.core.frame", "DataFrame") => new PyObj(g)
      case Global("pandas.core.series", "Series") =>
        fail("pickled pandas Series are not supported — pickle a DataFrame")
      case Global(m, n) => fail(s"_reconstructor of unsupported class $m.$n")
      case other => fail(s"_reconstructor of non-class $other")
    }
    case Global("numpy", "dtype") =>
      new Dt(args.head.asInstanceOf[String])
    case Global("numpy.core.numeric" | "numpy._core.numeric", "_frombuffer") =>
      val a = new NdArr
      a.data = args(0) match { case b: Array[Byte] => b; case o => o }
      a.dtype = args(1).asInstanceOf[Dt]
      a.shape = args(2).asInstanceOf[scala.collection.Seq[Any]].map(x => x.asInstanceOf[Long]).toSeq
      a.fortran = args.lift(3).contains("F")
      a
    case Global("numpy.core.multiarray" | "numpy._core.multiarray", "_reconstruct") =>
      new NdArr // filled by BUILD
    case Global("builtins" | "__builtin__", "slice") =>
      PySlice(args(0).asInstanceOf[Long], args(1).asInstanceOf[Long],
        args(2).asInstanceOf[Long])
    case Global("_codecs", "encode") => // proto-2 bytes spelled as latin-1 str
      args.head.asInstanceOf[String].getBytes("ISO-8859-1")
    case Global("pandas._libs.internals", "_unpickle_block") =>
      Block(args(0), args(1))
    case Global("pandas.core.internals.managers" | "pandas.core.internals",
        "BlockManager") =>
      Manager(args(0).asInstanceOf[scala.collection.Seq[Any]].toSeq, args(1).asInstanceOf[scala.collection.Seq[Any]].toVector)
    case Global("pandas.core.indexes.base", "_new_Index") =>
      val cls = args(0).asInstanceOf[Global]
      val d = args(1).asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]]
      if (cls.name == "RangeIndex")
        RangeIdx(d("start").asInstanceOf[Long], d("stop").asInstanceOf[Long],
          d("step").asInstanceOf[Long])
      else d.get("data") match {
        case Some(a: NdArr) => NamesIdx(a.data.asInstanceOf[scala.collection.Seq[Any]].toSeq)
        case other => fail(s"unsupported Index payload $other for ${cls.name}")
      }
    case Global("pandas._libs.arrays", "__pyx_unpickle_NDArrayBacked") =>
      new NdBacked // state via BUILD carries (ndarray, dtype)
    case Global(m, n) => fail(s"REDUCE of unsupported callable $m.$n " +
      "(only the pandas DataFrame object graph is allow-listed)")
    case other => fail(s"REDUCE of non-callable $other")
  }

  private def build(obj: Any, state: Any, fail: String => Nothing): Unit = obj match {
    case o: PyObj => o.state = state
    case a: NdArr => // _reconstruct state: (version, shape, dtype, fortran, data)
      val t = state.asInstanceOf[scala.collection.Seq[Any]]
      a.shape = t(1).asInstanceOf[scala.collection.Seq[Any]].map(_.asInstanceOf[Long]).toSeq
      a.dtype = t(2).asInstanceOf[Dt]
      a.fortran = t(3) == java.lang.Boolean.TRUE
      a.data = t(4) match { case b: Array[Byte] => b; case o => o }
    case d: Dt => // dtype state: (ver, byteorder, subdescr, names, fields, ...)
      state match {
        case t: scala.collection.Seq[Any] =>
          t.lift(1).collect { case s: String if s.nonEmpty => d.byteorder = s.charAt(0) }
          // datetime metadata carries the unit as bytes (e.g. b"ns")
          def findUnit(x: Any): Unit = x match {
            case b: Array[Byte] =>
              val s = new String(b, "ASCII")
              if (Set("s", "ms", "us", "ns").contains(s)) d.unit = s
            case seq: scala.collection.Seq[Any] => seq.foreach(findUnit)
            case m: scala.collection.Map[Any @unchecked, Any @unchecked] =>
              m.foreach { case (k, v) => findUnit(k); findUnit(v) }
            case _ => ()
          }
          if (d.code.startsWith("M8") || d.code.startsWith("<M8") ||
              d.code.startsWith(">M8")) findUnit(t)
        case _ => ()
      }
    case nb: NdBacked => nb.state = state
    case other => fail(s"BUILD on unsupported object $other")
  }

  // ------------------------------------------------------- interpretation
  private def interpret(top: Any, fail: String => Nothing): (Seq[String], Seq[Seq[String]]) = {
    val mgr = top match {
      case o: PyObj if o.cls.name == "DataFrame" =>
        o.state match {
          case d: scala.collection.mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
            d.get("_mgr").orElse(d.get("_data")) match {
              case Some(m: Manager) => m
              case other => fail(s"DataFrame state without a BlockManager: $other")
            }
          case other => fail(s"unsupported DataFrame state shape: $other")
        }
      case other => fail(s"pickle top-level object is not a pandas DataFrame: $other")
    }
    require(mgr.axes.length == 2, "expected a 2-axis BlockManager")
    val names = mgr.axes(0) match {
      case NamesIdx(vs) => vs.map(renderObj)
      case RangeIdx(start, stop, step) => (start until stop by step).map(_.toString)
      case other => fail(s"unsupported column index $other")
    }
    val nrows = mgr.axes(1) match {
      case RangeIdx(start, stop, step) =>
        (math.max(0L, (stop - start + step - (if (step > 0) 1 else -1)) / step)).toInt
      case NamesIdx(vs) => vs.length
      case other => fail(s"unsupported row index $other")
    }
    val cols = Array.fill[IndexedSeq[String]](names.length)(null)
    mgr.blocks.foreach {
      case Block(values, placement) =>
        val arr = resolveNd(values, fail)
        val k = if (arr.shape.length == 2) arr.shape.head.toInt else 1
        val n = arr.shape.last.toInt
        require(n == nrows, s"block row count $n != frame rows $nrows")
        val positions: Seq[Int] = placement match {
          case PySlice(a, b, s) => (a until b by s).map(_.toInt)
          case a: NdArr => a.data match {
            case bts: Array[Byte] => decodeLongs(bts, a.dtype).map(_.toInt)
            case seq: scala.collection.Seq[Any] => seq.map(_.asInstanceOf[Long].toInt).toSeq
          }
          case other => fail(s"unsupported block placement $other")
        }
        require(positions.length == k, "placement arity mismatch")
        (0 until k).foreach { i =>
          cols(positions(i)) = renderSlice(arr, i, n, fail)
        }
      case other => fail(s"unsupported block $other")
    }
    val missing = cols.indexOf(null)
    require(missing < 0, s"no block provided column ${if (missing >= 0) names(missing) else ""}")
    val rows = (0 until nrows).map(r => names.indices.map(c => cols(c)(r)))
    (names, rows)
  }

  /** DatetimeArray and friends wrap the ndarray in cython state. */
  private def resolveNd(values: Any, fail: String => Nothing): NdArr = values match {
    case a: NdArr => a
    case nb: NdBacked =>
      def find(x: Any): Option[NdArr] = x match {
        case a: NdArr => Some(a)
        case seq: scala.collection.Seq[Any] => seq.iterator.flatMap(find).nextOption()
        case _ => None
      }
      find(nb.state).getOrElse(fail("NDArrayBacked state without an ndarray"))
    case other => fail(s"unsupported block values $other " +
      "(extension dtypes like Categorical/ArrowDtype are not supported)")
  }

  // --------------------------------------------------------- rendering
  private def renderObj(v: Any): String = v match {
    case null => ""
    case s: String => s
    case d: java.lang.Double => if (d.isNaN) "" else d.toString
    case b: java.lang.Boolean => if (b) "True" else "False"
    case l: java.lang.Long => l.toString
    case other => other.toString
  }

  private def decodeLongs(data: Array[Byte], dt: Dt): Seq[Long] = {
    val order = if (dt.byteorder == '>') ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val buf = ByteBuffer.wrap(data).order(order)
    (0 until data.length / 8).map(i => buf.getLong(i * 8))
  }

  /** Render row i (of k) of a 2-D C-ordered block (or a 1-D array) to strings. */
  private def renderSlice(arr: NdArr, i: Int, n: Int, fail: String => Nothing): IndexedSeq[String] = {
    val code = arr.dtype match {
      case null => "O" // object _reconstruct without dtype never happens; guard
      case d => d.code.stripPrefix("<").stripPrefix(">").stripPrefix("|").stripPrefix("=")
    }
    val order = if (arr.dtype != null && arr.dtype.byteorder == '>')
      ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    def at(j: Int): Int = if (arr.fortran) j * arr.shape.head.toInt + i else i * n + j
    arr.data match {
      case seq: scala.collection.Seq[Any] => (0 until n).map(j => renderObj(seq(at(j))))
      case bts: Array[Byte] =>
        val buf = ByteBuffer.wrap(bts).order(order)
        val sz = code match {
          case "i1" | "u1" | "b1" => 1
          case "i2" | "u2" => 2
          case "i4" | "u4" | "f4" => 4
          case "i8" | "u8" | "f8" => 8
          case c if c.startsWith("M8") => 8
          case c => fail(s"unsupported numpy dtype `$c` " +
            "(supported: i/u ints, f4/f8, b1, O, M8 datetimes)")
        }
        (0 until n).map { j =>
          val o = at(j) * sz
          code match {
            case "i1" => bts(o).toString
            case "u1" => (bts(o) & 0xff).toString
            case "b1" => if (bts(o) == 0) "False" else "True"
            case "i2" => buf.getShort(o).toString
            case "u2" => (buf.getShort(o) & 0xffff).toString
            case "i4" => buf.getInt(o).toString
            case "u4" => (buf.getInt(o) & 0xffffffffL).toString
            case "i8" => buf.getLong(o).toString
            case "u8" => java.lang.Long.toUnsignedString(buf.getLong(o))
            case "f4" => val f = buf.getFloat(o); if (f.isNaN) "" else f.toString
            case "f8" => val d = buf.getDouble(o); if (d.isNaN) "" else d.toString
            case c if c.startsWith("M8") =>
              renderDatetime(buf.getLong(o), if (arr.dtype == null) "ns" else arr.dtype.unit)
          }
        }
    }
  }

  /** pandas-style "yyyy-MM-dd HH:mm:ss[.fraction]"; NaT (Long.MinValue) → "". */
  private def renderDatetime(v: Long, unit: String): String = {
    if (v == Long.MinValue) return ""
    val nanosPer = unit match {
      case "s" => 1000000000L; case "ms" => 1000000L; case "us" => 1000L; case _ => 1L
    }
    val totalNanos = v * nanosPer
    val secs = Math.floorDiv(totalNanos, 1000000000L)
    val frac = Math.floorMod(totalNanos, 1000000000L)
    val ldt = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
      f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    if (frac == 0) base
    else base + "." + f"$frac%09d".reverse.dropWhile(_ == '0').reverse
  }
}

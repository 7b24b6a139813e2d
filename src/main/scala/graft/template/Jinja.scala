package graft.template

import java.security.MessageDigest

/**
 * Mini-Jinja: a from-scratch, serializable interpreter for the Jinja2 subset
 * the reference uses at runtime (computed columns, expectations, destination
 * templates — reference operations/column.py:53-59,115-121, nodes/node.py:176-184,
 * nodes/destination.py:114-117). No JVM Jinja library resolves offline, so the
 * engine is implemented here against public Jinja2 semantics.
 *
 * Supported surface (bounded by the reference docs + test corpus,
 * SURVEY.md §2.8): `{{ expr }}`, `{% if/elif/else %}`, `{% for %}` with
 * `loop.index/index0/first/last`, `{% set %}`, `{% macro %}`, `{% raw %}`,
 * dotted/index/slice access, arithmetic, comparisons, and/or/not/in, ternary
 * `a if c else b`, `~` concat, common filters (int, float, trim, upper, lower,
 * reverse, tojson, length, replace, default, round, join, title, string, abs,
 * first, last, md5), globals `md5(x)` / `fromjson(x)`, method calls
 * (.items/.keys/.values/.pop/.get/.split/.strip/.upper/.lower/.replace/
 * .startswith/.endswith/.zfill).
 *
 * Values are plain Scala: String, Long, Double, Boolean, null, Seq[Any],
 * Map[String, Any]. Templates compile on the driver to a serializable AST and
 * render on executors.
 */
object Jinja {

  def compile(source: String): Template = new Template(Parser.parse(source))

  /** Convenience: compile + render once. */
  def render(source: String, ctx: Map[String, Any]): String =
    compile(source).render(ctx)

  // ===================================================================== AST
  sealed trait Node extends Serializable
  final case class Text(s: String) extends Node
  final case class Output(e: Expr) extends Node
  final case class If(branches: List[(Expr, List[Node])], orElse: List[Node]) extends Node
  final case class For(vars: List[String], iter: Expr, body: List[Node]) extends Node
  final case class Set(name: String, e: Expr) extends Node
  final case class MacroDef(name: String, params: List[(String, Option[Expr])], body: List[Node]) extends Node

  sealed trait Expr extends Serializable
  final case class Lit(v: Any) extends Expr
  final case class Ident(name: String) extends Expr
  final case class ListLit(items: List[Expr]) extends Expr
  final case class DictLit(items: List[(Expr, Expr)]) extends Expr
  final case class Attr(target: Expr, name: String) extends Expr
  final case class Index(target: Expr, idx: Expr) extends Expr
  final case class Slice(target: Expr, lo: Option[Expr], hi: Option[Expr]) extends Expr
  final case class Call(target: Expr, args: List[Expr]) extends Expr
  final case class Method(target: Expr, name: String, args: List[Expr]) extends Expr
  final case class Filter(target: Expr, name: String, args: List[Expr]) extends Expr
  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  final case class UnOp(op: String, e: Expr) extends Expr
  final case class Ternary(value: Expr, cond: Expr, orElse: Option[Expr]) extends Expr

  // =============================================================== template
  final class Template(val nodes: List[Node]) extends Serializable {
    def render(ctx: Map[String, Any]): String = {
      val sb = new StringBuilder
      val env = new Env(scala.collection.mutable.Map[String, Any](ctx.toSeq: _*))
      exec(nodes, env, sb)
      sb.toString
    }

    private[template] def exec(ns: List[Node], env: Env, sb: StringBuilder): Unit = ns.foreach {
      case Text(s) => sb.append(s)
      case Output(e) => sb.append(toStr(Eval.eval(e, env)))
      case If(branches, orElse) =>
        branches.find { case (c, _) => truthy(Eval.eval(c, env)) } match {
          case Some((_, body)) => exec(body, env, sb)
          case None => exec(orElse, env, sb)
        }
      case For(vars, iterE, body) =>
        val items: Seq[Any] = Eval.eval(iterE, env) match {
          case s: Seq[_] => s
          case m: Map[_, _] => m.keys.toSeq.asInstanceOf[Seq[Any]]
          case s: String => s.map(_.toString)
          case null => Nil
          case other => Seq(other)
        }
        val n = items.size
        items.zipWithIndex.foreach { case (item, i) =>
          vars match {
            case one :: Nil => env.set(one, item)
            case a :: b :: Nil => item match {
              case t: (_, _) => env.set(a, t._1); env.set(b, t._2)
              case s: Seq[_] if s.size >= 2 => env.set(a, s(0)); env.set(b, s(1))
              case other => env.set(a, other); env.set(b, null)
            }
            case _ => throw new IllegalArgumentException("for supports at most 2 loop vars")
          }
          env.set("loop", Map(
            "index" -> (i + 1).toLong, "index0" -> i.toLong,
            "first" -> (i == 0), "last" -> (i == n - 1), "length" -> n.toLong))
          exec(body, env, sb)
        }
      case Set(name, e) => env.set(name, Eval.eval(e, env))
      case m: MacroDef => env.set(m.name, m)
    }
  }

  private[template] final class Env(val vars: scala.collection.mutable.Map[String, Any]) {
    def get(name: String): Option[Any] = vars.get(name)
    def set(name: String, v: Any): Unit = vars(name) = v
  }

  // ============================================================== evaluation
  private[template] object Eval {
    def eval(e: Expr, env: Env): Any = e match {
      case Lit(v) => v
      case Ident(n) => env.get(n).getOrElse(null)
      case ListLit(items) => items.map(eval(_, env))
      case DictLit(items) => items.map { case (k, v) => toStr(eval(k, env)) -> eval(v, env) }.toMap
      case Attr(t, name) => eval(t, env) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].getOrElse(name, null)
        case null => null
        case other => throw new IllegalArgumentException(s"cannot access .$name on $other")
      }
      case Index(t, idxE) =>
        val tv = eval(t, env); val idx = eval(idxE, env)
        (tv, idx) match {
          case (s: String, i: Long) => val p = if (i < 0) s.length + i else i; if (p >= 0 && p < s.length) s.charAt(p.toInt).toString else ""
          case (s: Seq[_], i: Long) => val p = if (i < 0) s.size + i else i; if (p >= 0 && p < s.size) s(p.toInt) else null
          case (m: Map[_, _], k) => m.asInstanceOf[Map[String, Any]].getOrElse(toStr(k), null)
          case (null, _) => null
          case _ => throw new IllegalArgumentException(s"cannot index $tv with $idx")
        }
      case Slice(t, loE, hiE) =>
        def clamp(i: Long, n: Int): Int = { val p = if (i < 0) n + i else i; math.max(0, math.min(n, p)).toInt }
        eval(t, env) match {
          case s: String =>
            val lo = loE.map(e => clamp(asLong(eval(e, env)), s.length)).getOrElse(0)
            val hi = hiE.map(e => clamp(asLong(eval(e, env)), s.length)).getOrElse(s.length)
            if (lo < hi) s.substring(lo, hi) else ""
          case s: Seq[_] =>
            val lo = loE.map(e => clamp(asLong(eval(e, env)), s.size)).getOrElse(0)
            val hi = hiE.map(e => clamp(asLong(eval(e, env)), s.size)).getOrElse(s.size)
            if (lo < hi) s.slice(lo, hi) else Nil
          case null => null
          case other => throw new IllegalArgumentException(s"cannot slice $other")
        }
      case Call(Ident("md5"), args) => md5hex(toStr(eval(args.head, env)))
      case Call(Ident("fromjson"), args) => Json.parse(toStr(eval(args.head, env)))
      case Call(Ident("range"), args) =>
        val vs = args.map(a => asLong(eval(a, env)))
        val (lo, hi, st) = vs match {
          case h :: Nil => (0L, h, 1L)
          case l :: h :: Nil => (l, h, 1L)
          case l :: h :: s :: Nil => (l, h, s)
          case _ => throw new IllegalArgumentException("range takes 1-3 args")
        }
        (lo until hi by st).toList
      case Call(Ident(name), args) => env.get(name) match {
        case Some(m: MacroDef) => callMacro(m, args.map(eval(_, env)), env)
        case _ => throw new IllegalArgumentException(s"unknown function $name")
      }
      case Call(t, _) => throw new IllegalArgumentException(s"cannot call $t")
      case Method(t, name, args) => method(eval(t, env), name, args.map(eval(_, env)))
      case Filter(t, name, args) => filter(eval(t, env), name, args.map(eval(_, env)))
      case UnOp("not", e1) => !truthy(eval(e1, env))
      case UnOp("-", e1) => eval(e1, env) match {
        case l: Long => -l
        case d: Double => -d
        case v => -asDouble(v)
      }
      case UnOp(op, _) => throw new IllegalArgumentException(s"bad unary $op")
      case BinOp("and", l, r) => val lv = eval(l, env); if (!truthy(lv)) lv else eval(r, env)
      case BinOp("or", l, r) => val lv = eval(l, env); if (truthy(lv)) lv else eval(r, env)
      case BinOp("~", l, r) => toStr(eval(l, env)) + toStr(eval(r, env))
      case BinOp("in", l, r) =>
        val lv = eval(l, env)
        eval(r, env) match {
          case s: String => s.contains(toStr(lv))
          case s: Seq[_] => s.exists(x => jEq(x, lv))
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].contains(toStr(lv))
          case null => false
          case other => throw new IllegalArgumentException(s"'in' on $other")
        }
      case BinOp(op @ ("==" | "!="), l, r) =>
        val eq = jEq(eval(l, env), eval(r, env)); if (op == "==") eq else !eq
      case BinOp(op @ ("<" | "<=" | ">" | ">="), l, r) =>
        val (lv, rv) = (eval(l, env), eval(r, env))
        val c = (lv, rv) match {
          case (a: String, b: String) => a.compareTo(b)
          case (a, b) => java.lang.Double.compare(asDouble(a), asDouble(b))
        }
        op match { case "<" => c < 0; case "<=" => c <= 0; case ">" => c > 0; case _ => c >= 0 }
      case BinOp(op, l, r) =>
        val (lv, rv) = (eval(l, env), eval(r, env))
        (op, lv, rv) match {
          case ("+", a: String, b) => a + toStr(b)
          case ("+", a: Seq[_], b: Seq[_]) => a ++ b
          case ("+", a: Long, b: Long) => a + b
          case ("+", a, b) => asDouble(a) + asDouble(b)
          case ("-", a: Long, b: Long) => a - b
          case ("-", a, b) => asDouble(a) - asDouble(b)
          case ("*", a: String, b: Long) => a * b.toInt
          case ("*", a: Long, b: Long) => a * b
          case ("*", a, b) => asDouble(a) * asDouble(b)
          case ("/", a, b) => asDouble(a) / asDouble(b)
          case ("//", a, b) => math.floor(asDouble(a) / asDouble(b)).toLong
          case ("%", a: Long, b: Long) => java.lang.Math.floorMod(a, b)
          case ("%", a, b) => asDouble(a) % asDouble(b)
          case ("**", a, b) =>
            val d = math.pow(asDouble(a), asDouble(b))
            (lv, rv) match { case (_: Long, _: Long) if d.isWhole => d.toLong; case _ => d }
          case _ => throw new IllegalArgumentException(s"bad operator $op on $lv, $rv")
        }
      case Ternary(v, c, orElse) =>
        if (truthy(eval(c, env))) eval(v, env)
        else orElse.map(eval(_, env)).getOrElse("")
    }

    private def callMacro(m: MacroDef, args: List[Any], env: Env): Any = {
      val local = new Env(env.vars.clone())
      m.params.zipWithIndex.foreach { case ((p, dflt), i) =>
        val v = if (i < args.size) args(i) else dflt.map(eval(_, env)).getOrElse(null)
        local.set(p, v)
      }
      val sb = new StringBuilder
      val t = new Template(m.body)
      t.exec(t.nodes, local, sb)
      sb.toString
    }

    private def jEq(a: Any, b: Any): Boolean = (a, b) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case (x: Long, y: Double) => x.toDouble == y
      case (x: Double, y: Long) => x == y.toDouble
      case (x, y) => x == y
    }

    private def method(target: Any, name: String, args: List[Any]): Any = (target, name) match {
      case (m: Map[_, _], "items") => m.asInstanceOf[Map[String, Any]].toList.map { case (k, v) => List(k, v) }
      case (m: Map[_, _], "keys") => m.asInstanceOf[Map[String, Any]].keys.toList
      case (m: Map[_, _], "values") => m.asInstanceOf[Map[String, Any]].values.toList
      case (m: Map[_, _], "get") =>
        val mm = m.asInstanceOf[Map[String, Any]]
        mm.getOrElse(toStr(args.head), if (args.size > 1) args(1) else null)
      case (m: Map[_, _], "pop") =>
        // Jinja .pop(key) on an immutable view: returns the value (the
        // reference's DEFAULT_TEMPLATE uses row.pop to exclude a key while
        // iterating a copy — our renderer passes a fresh map per row).
        m.asInstanceOf[Map[String, Any]].getOrElse(toStr(args.head), if (args.size > 1) args(1) else null)
      case (s: String, "split") =>
        if (args.isEmpty) s.trim.split("\\s+").toList else s.split(java.util.regex.Pattern.quote(toStr(args.head)), -1).toList
      case (s: String, "strip") => s.trim
      case (s: String, "lstrip") => s.replaceAll("^\\s+", "")
      case (s: String, "rstrip") => s.replaceAll("\\s+$", "")
      case (s: String, "upper") => s.toUpperCase
      case (s: String, "lower") => s.toLowerCase
      case (s: String, "title") => s.split(" ").map(w => if (w.nonEmpty) s"${w.head.toUpper}${w.tail.toLowerCase}" else w).mkString(" ")
      case (s: String, "replace") => s.replace(toStr(args.head), toStr(args(1)))
      case (s: String, "startswith") => s.startsWith(toStr(args.head))
      case (s: String, "endswith") => s.endsWith(toStr(args.head))
      case (s: String, "zfill") => { val n = asLong(args.head).toInt; ("0" * math.max(0, n - s.length)) + s }
      case (s: String, "join") => args.head.asInstanceOf[Seq[Any]].map(toStr).mkString(s)
      case (s: String, "format") => formatStr(s, args)
      case (s: Seq[_], "index") => s.indexWhere(x => x == args.head).toLong
      case (null, _) => null
      case _ => throw new IllegalArgumentException(s"unsupported method .$name on $target")
    }

    private def formatStr(fmt: String, args: List[Any]): String = {
      val it = args.iterator
      "\\{\\}".r.replaceAllIn(fmt, _ => if (it.hasNext) java.util.regex.Matcher.quoteReplacement(toStr(it.next())) else "{}")
    }

    private def filter(v: Any, name: String, args: List[Any]): Any = name match {
      case "int" => v match {
        case l: Long => l
        case d: Double => d.toLong
        case b: Boolean => if (b) 1L else 0L
        case s: String => try s.trim.toLong catch {
          case _: NumberFormatException => try s.trim.toDouble.toLong catch { case _: NumberFormatException => if (args.nonEmpty) asLong(args.head) else 0L }
        }
        case null => if (args.nonEmpty) asLong(args.head) else 0L
        case _ => 0L
      }
      case "float" => v match {
        case d: Double => d
        case l: Long => l.toDouble
        case s: String => try s.trim.toDouble catch { case _: NumberFormatException => if (args.nonEmpty) asDouble(args.head) else 0.0 }
        case null => if (args.nonEmpty) asDouble(args.head) else 0.0
        case _ => 0.0
      }
      case "string" => toStr(v)
      case "trim" => toStr(v).trim
      case "upper" => toStr(v).toUpperCase
      case "lower" => toStr(v).toLowerCase
      case "title" => method(toStr(v), "title", Nil)
      case "reverse" => v match {
        case s: String => s.reverse
        case s: Seq[_] => s.reverse
        case other => toStr(other).reverse
      }
      case "length" | "count" => v match {
        case s: String => s.length.toLong
        case s: Seq[_] => s.size.toLong
        case m: Map[_, _] => m.size.toLong
        case null => 0L
        case other => toStr(other).length.toLong
      }
      case "abs" => v match { case l: Long => math.abs(l); case d: Double => math.abs(d); case x => math.abs(asDouble(x)) }
      case "round" =>
        val digits = if (args.nonEmpty) asLong(args.head).toInt else 0
        val d = asDouble(v)
        val scaled = BigDecimal(d).setScale(digits, BigDecimal.RoundingMode.HALF_EVEN)
        if (digits <= 0) scaled.toDouble else scaled.toDouble
      case "default" | "d" => if (v == null || (v == "" && args.size > 1 && truthy(args(1)))) args.headOption.getOrElse("") else v
      case "first" => v match { case s: Seq[_] => s.headOption.getOrElse(null); case s: String => s.headOption.map(_.toString).getOrElse(""); case _ => null }
      case "last" => v match { case s: Seq[_] => s.lastOption.getOrElse(null); case s: String => s.lastOption.map(_.toString).getOrElse(""); case _ => null }
      case "join" => v match {
        case s: Seq[_] => s.map(toStr).mkString(if (args.nonEmpty) toStr(args.head) else "")
        case other => toStr(other)
      }
      case "replace" => toStr(v).replace(toStr(args.head), toStr(args(1)))
      case "tojson" => Json.write(v)
      case "md5" => md5hex(toStr(v))
      case "list" => v match { case s: Seq[_] => s; case s: String => s.map(_.toString).toList; case m: Map[_, _] => m.keys.toList; case null => Nil; case o => List(o) }
      case "sort" => v match { case s: Seq[_] => s.map(toStr).sorted; case o => o }
      case "unique" => v match { case s: Seq[_] => s.distinct; case o => o }
      case "sum" => v match { case s: Seq[_] => s.map(asDouble).sum; case o => asDouble(o) }
      case "min" => v match { case s: Seq[_] if s.nonEmpty => s.minBy(asDouble); case _ => null }
      case "max" => v match { case s: Seq[_] if s.nonEmpty => s.maxBy(asDouble); case _ => null }
      case other => throw new IllegalArgumentException(s"unsupported filter |$other")
    }
  }

  // =============================================================== helpers
  def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case s: String => s.nonEmpty
    case l: Long => l != 0
    case d: Double => d != 0.0
    case s: Seq[_] => s.nonEmpty
    case m: Map[_, _] => m.nonEmpty
    case _ => true
  }

  def toStr(v: Any): String = v match {
    case null => ""
    case s: String => s
    case b: Boolean => if (b) "True" else "False"
    case l: Long => l.toString
    case d: Double => if (d.isWhole && math.abs(d) < 1e15) s"${d.toLong}.0" else d.toString
    case s: Seq[_] => s.map(repr).mkString("[", ", ", "]")
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].map { case (k, x) => s"'$k': ${repr(x)}" }.mkString("{", ", ", "}")
    case other => other.toString
  }

  private def repr(v: Any): String = v match {
    case s: String => s"'$s'"
    case other => toStr(other)
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case d: Double => d.toLong
    case s: String => s.trim.toLong
    case b: Boolean => if (b) 1L else 0L
    case null => 0L
    case _ => throw new IllegalArgumentException(s"not an int: $v")
  }

  private def asDouble(v: Any): Double = v match {
    case d: Double => d
    case l: Long => l.toDouble
    case s: String => s.trim.toDouble
    case b: Boolean => if (b) 1.0 else 0.0
    case null => 0.0
    case _ => throw new IllegalArgumentException(s"not a number: $v")
  }

  def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  // ================================================================= parser
  private object Parser {
    sealed trait Piece
    case class TextP(s: String) extends Piece
    case class ExprP(s: String) extends Piece
    case class StmtP(s: String) extends Piece

    def parse(src: String): List[Node] = {
      val pieces = split(src)
      val (nodes, rest) = parseBlock(pieces, Nil)
      require(rest.isEmpty, s"unexpected ${rest.headOption}")
      nodes
    }

    /** Split source into text / {{ }} / {% %} pieces, handling raw blocks
      * and trim markers {%- -%}. */
    private def split(src: String): List[Piece] = {
      val out = List.newBuilder[Piece]
      var i = 0
      val n = src.length
      val text = new StringBuilder
      var trimNext = false
      def flushText(trimEnd: Boolean): Unit = {
        var s = text.toString
        if (trimNext) s = s.replaceAll("^\\s+", "")
        if (trimEnd) s = s.replaceAll("\\s+$", "")
        trimNext = false
        if (s.nonEmpty) out += TextP(s)
        text.clear()
      }
      while (i < n) {
        if (i + 1 < n && src.charAt(i) == '{' &&
          (src.charAt(i + 1) == '{' || src.charAt(i + 1) == '%' || src.charAt(i + 1) == '#')) {
          val kind = src.charAt(i + 1)
          val isExpr = kind == '{'
          val close = if (isExpr) "}}" else if (kind == '#') "#}" else "%}"
          var j = i + 2
          val lTrim = j < n && src.charAt(j) == '-'
          if (lTrim) j += 1
          val end = src.indexOf(close, j)
          require(end >= 0, s"unterminated ${src.substring(i, math.min(n, i + 20))}")
          var bodyEnd = end
          val rTrim = bodyEnd > j && src.charAt(bodyEnd - 1) == '-'
          if (rTrim) bodyEnd -= 1
          val body = src.substring(j, bodyEnd).trim
          flushText(lTrim)
          if (kind == '#') {
            // {# comment #}: contributes nothing (Jinja strips comments);
            // trim markers {#- -#} behave like the statement forms
            i = end + 2
          } else if (!isExpr && body == "raw") {
            // consume until endraw verbatim
            val rawEndRe = "\\{%-?\\s*endraw\\s*-?%\\}".r
            rawEndRe.findFirstMatchIn(src.substring(end + 2)) match {
              case Some(m) =>
                out += TextP(src.substring(end + 2, end + 2 + m.start))
                i = end + 2 + m.end
              case None => throw new IllegalArgumentException("unterminated {% raw %}")
            }
          } else {
            if (isExpr) out += ExprP(body) else out += StmtP(body)
            i = end + 2
          }
          trimNext = rTrim
        } else { text.append(src.charAt(i)); i += 1 }
      }
      flushText(trimEnd = false)
      out.result()
    }

    /** Parse pieces until a terminator statement; returns (nodes, rest-with-terminator). */
    private def parseBlock(pieces: List[Piece], terms: List[String]): (List[Node], List[Piece]) = {
      val nodes = List.newBuilder[Node]
      var rest = pieces
      while (rest.nonEmpty) {
        rest.head match {
          case TextP(s) => nodes += Text(s); rest = rest.tail
          case ExprP(s) => nodes += Output(ExprParser.parse(s)); rest = rest.tail
          case StmtP(s) =>
            val kw = s.split("\\s+|\\(", 2).head
            if (terms.contains(kw)) return (nodes.result(), rest)
            kw match {
              case "if" =>
                var branches = List.newBuilder[(Expr, List[Node])]
                var cond = ExprParser.parse(s.stripPrefix("if").trim)
                var r = rest.tail
                var done = false
                while (!done) {
                  val (body, r2) = parseBlock(r, List("elif", "else", "endif"))
                  branches += ((cond, body))
                  r2.head match {
                    case StmtP(s2) if s2.startsWith("elif") =>
                      cond = ExprParser.parse(s2.stripPrefix("elif").trim); r = r2.tail
                    case StmtP(s2) if s2 == "else" || s2.startsWith("else") =>
                      val (ebody, r3) = parseBlock(r2.tail, List("endif"))
                      nodes += If(branches.result(), ebody)
                      r = r3.tail; done = true
                    case StmtP(s2) if s2 == "endif" =>
                      nodes += If(branches.result(), Nil)
                      r = r2.tail; done = true
                    case other => throw new IllegalArgumentException(s"bad if structure: $other")
                  }
                }
                rest = r
              case "for" =>
                val m = "(?s)^for\\s+(.+?)\\s+in\\s+(.+)$".r.findFirstMatchIn(s)
                  .getOrElse(throw new IllegalArgumentException(s"bad for: $s"))
                val vars = m.group(1).split(",").map(_.trim).toList
                val iter = ExprParser.parse(m.group(2))
                val (body, r2) = parseBlock(rest.tail, List("endfor"))
                nodes += For(vars, iter, body)
                rest = r2.tail
              case "set" =>
                val m = "(?s)^set\\s+(\\w+)\\s*=\\s*(.+)$".r.findFirstMatchIn(s)
                  .getOrElse(throw new IllegalArgumentException(s"bad set: $s"))
                nodes += Set(m.group(1), ExprParser.parse(m.group(2)))
                rest = rest.tail
              case "macro" =>
                val m = "^macro\\s+(\\w+)\\s*\\((.*)\\)\\s*$".r.findFirstMatchIn(s)
                  .getOrElse(throw new IllegalArgumentException(s"bad macro: $s"))
                val params = m.group(2).split(",").map(_.trim).filter(_.nonEmpty).toList.map { p =>
                  p.split("=", 2) match {
                    case Array(name) => (name.trim, None)
                    case Array(name, dflt) => (name.trim, Some(ExprParser.parse(dflt.trim)))
                  }
                }
                val (body, r2) = parseBlock(rest.tail, List("endmacro"))
                nodes += MacroDef(m.group(1), params, body)
                rest = r2.tail
              case other => throw new IllegalArgumentException(s"unsupported statement {% $other %}")
            }
        }
      }
      (nodes.result(), Nil)
    }
  }

  // ========================================================== expr parser
  private object ExprParser {
    def parse(src: String): Expr = {
      val p = new P(src)
      val e = p.ternary()
      p.expectEnd()
      e
    }

    private class P(src: String) {
      private var i = 0
      private def ws(): Unit = while (i < src.length && src.charAt(i).isWhitespace) i += 1
      private def peekCh: Char = if (i < src.length) src.charAt(i) else ' '
      def expectEnd(): Unit = { ws(); require(i >= src.length, s"trailing input in expr '$src' at $i") }
      private def fail(msg: String): Nothing = throw new IllegalArgumentException(s"jinja expr error in '$src': $msg")

      private def lookKeyword(kw: String): Boolean = {
        ws()
        if (src.startsWith(kw, i)) {
          val after = i + kw.length
          after >= src.length || !(src.charAt(after).isLetterOrDigit || src.charAt(after) == '_')
        } else false
      }
      private def eatKeyword(kw: String): Boolean =
        if (lookKeyword(kw)) { i += kw.length; true } else false
      private def eat(s: String): Boolean = { ws(); if (src.startsWith(s, i)) { i += s.length; true } else false }

      def ternary(): Expr = {
        val v = orE()
        if (eatKeyword("if")) {
          val c = orE()
          val e = if (eatKeyword("else")) Some(ternary()) else None
          Ternary(v, c, e)
        } else v
      }
      private def orE(): Expr = {
        var l = andE()
        while (eatKeyword("or")) l = BinOp("or", l, andE())
        l
      }
      private def andE(): Expr = {
        var l = notE()
        while (eatKeyword("and")) l = BinOp("and", l, notE())
        l
      }
      private def notE(): Expr =
        if (eatKeyword("not")) UnOp("not", notE()) else cmpE()
      private def cmpE(): Expr = {
        var l = concatE()
        var go = true
        while (go) {
          ws()
          if (eat("==")) l = BinOp("==", l, concatE())
          else if (eat("!=")) l = BinOp("!=", l, concatE())
          else if (eat("<=")) l = BinOp("<=", l, concatE())
          else if (eat(">=")) l = BinOp(">=", l, concatE())
          else if (peekCh == '<' && !src.startsWith("<>", i)) { i += 1; l = BinOp("<", l, concatE()) }
          else if (peekCh == '>') { i += 1; l = BinOp(">", l, concatE()) }
          else if (lookKeyword("not") && { val save = i; i += 3; val isIn = lookKeyword("in"); i = save; isIn }) {
            eatKeyword("not"); eatKeyword("in"); l = UnOp("not", BinOp("in", l, concatE()))
          }
          else if (lookKeyword("in")) { eatKeyword("in"); l = BinOp("in", l, concatE()) }
          else if (lookKeyword("is")) {
            eatKeyword("is")
            val neg = eatKeyword("not")
            val test =
              if (eatKeyword("none") || eatKeyword("None")) BinOp("==", l, Lit(null))
              else if (eatKeyword("defined")) BinOp("!=", l, Lit(null))
              else fail("unsupported 'is' test")
            l = if (neg) UnOp("not", test) else test
          }
          else go = false
        }
        l
      }
      private def concatE(): Expr = {
        var l = addE()
        while ({ ws(); peekCh == '~' }) { i += 1; l = BinOp("~", l, addE()) }
        l
      }
      private def addE(): Expr = {
        var l = mulE()
        var go = true
        while (go) {
          ws()
          if (peekCh == '+') { i += 1; l = BinOp("+", l, mulE()) }
          else if (peekCh == '-') { i += 1; l = BinOp("-", l, mulE()) }
          else go = false
        }
        l
      }
      private def mulE(): Expr = {
        var l = unaryE()
        var go = true
        while (go) {
          ws()
          if (src.startsWith("**", i)) { i += 2; l = BinOp("**", l, unaryE()) }
          else if (src.startsWith("//", i)) { i += 2; l = BinOp("//", l, unaryE()) }
          else if (peekCh == '*') { i += 1; l = BinOp("*", l, unaryE()) }
          else if (peekCh == '/') { i += 1; l = BinOp("/", l, unaryE()) }
          else if (peekCh == '%') { i += 1; l = BinOp("%", l, unaryE()) }
          else go = false
        }
        l
      }
      private def unaryE(): Expr = {
        ws()
        if (peekCh == '-') { i += 1; UnOp("-", unaryE()) } else postfixE()
      }

      private def postfixE(): Expr = {
        var base = primaryE()
        var go = true
        while (go) {
          ws()
          if (peekCh == '.') {
            i += 1; ws()
            val name = ident()
            ws()
            if (peekCh == '(') { i += 1; base = Method(base, name, callArgs()) }
            else base = Attr(base, name)
          } else if (peekCh == '[') {
            i += 1; ws()
            if (peekCh == ':') {
              i += 1
              val hi = if ({ ws(); peekCh == ']' }) None else Some(ternary())
              ws(); require(peekCh == ']', "expected ]"); i += 1
              base = Slice(base, None, hi)
            } else {
              val first = ternary()
              ws()
              if (peekCh == ':') {
                i += 1
                val hi = if ({ ws(); peekCh == ']' }) None else Some(ternary())
                ws(); require(peekCh == ']', "expected ]"); i += 1
                base = Slice(base, Some(first), hi)
              } else {
                require(peekCh == ']', "expected ]"); i += 1
                base = Index(base, first)
              }
            }
          } else if (peekCh == '|') {
            i += 1; ws()
            val name = ident()
            ws()
            val args = if (peekCh == '(') { i += 1; callArgs() } else Nil
            base = Filter(base, name, args)
          } else if (peekCh == '(') {
            i += 1; base = Call(base, callArgs())
          } else go = false
        }
        base
      }

      private def callArgs(): List[Expr] = {
        val args = List.newBuilder[Expr]
        ws()
        if (peekCh == ')') { i += 1; return args.result() }
        var go = true
        while (go) {
          args += ternary()
          ws()
          if (peekCh == ',') i += 1
          else if (peekCh == ')') { i += 1; go = false }
          else fail("expected , or ) in call")
        }
        args.result()
      }

      private def ident(): String = {
        ws()
        val j0 = i
        while (i < src.length && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        require(i > j0, s"expected identifier at $j0 in '$src'")
        src.substring(j0, i)
      }

      private def primaryE(): Expr = {
        ws()
        val c = peekCh
        if (c == '(') { i += 1; val e = ternary(); ws(); require(peekCh == ')', "expected )"); i += 1; e }
        else if (c == '[') {
          i += 1
          val items = List.newBuilder[Expr]
          ws()
          if (peekCh == ']') { i += 1 }
          else {
            var go = true
            while (go) {
              items += ternary(); ws()
              if (peekCh == ',') { i += 1; ws(); if (peekCh == ']') { i += 1; go = false } }
              else if (peekCh == ']') { i += 1; go = false }
              else fail("expected , or ] in list")
            }
          }
          ListLit(items.result())
        }
        else if (c == '{') {
          i += 1
          val items = List.newBuilder[(Expr, Expr)]
          ws()
          if (peekCh == '}') { i += 1 }
          else {
            var go = true
            while (go) {
              val k = ternary(); ws(); require(peekCh == ':', "expected : in dict"); i += 1
              val v = ternary()
              items += ((k, v)); ws()
              if (peekCh == ',') { i += 1 }
              else if (peekCh == '}') { i += 1; go = false }
              else fail("expected , or } in dict")
            }
          }
          DictLit(items.result())
        }
        else if (c == '\'' || c == '"') {
          i += 1
          val sb = new StringBuilder
          while (i < src.length && src.charAt(i) != c) {
            if (src.charAt(i) == '\\' && i + 1 < src.length) {
              src.charAt(i + 1) match {
                case 'n' => sb.append('\n'); case 't' => sb.append('\t')
                case 'r' => sb.append('\r'); case other => sb.append(other)
              }
              i += 2
            } else { sb.append(src.charAt(i)); i += 1 }
          }
          require(i < src.length, "unterminated string")
          i += 1
          Lit(sb.toString)
        }
        else if (c.isDigit) {
          val j0 = i
          while (i < src.length && (src.charAt(i).isDigit || src.charAt(i) == '.')) i += 1
          val s = src.substring(j0, i)
          if (s.contains('.')) Lit(s.toDouble) else Lit(s.toLong)
        }
        else if (c.isLetter || c == '_') {
          val name = ident()
          name match {
            case "True" | "true" => Lit(true)
            case "False" | "false" => Lit(false)
            case "None" | "none" | "null" => Lit(null)
            case other => Ident(other)
          }
        }
        else fail(s"unexpected char '$c'")
      }
    }
  }

  // ============================================================ tiny JSON
  /** Minimal JSON used by the `tojson` filter and `fromjson` global —
    * jackson would work but this keeps the value model exact. */
  object Json {
    def write(v: Any): String = v match {
      case null => "null"
      case b: Boolean => b.toString
      case l: Long => l.toString
      case i: Int => i.toString
      case d: Double => if (d.isWhole && math.abs(d) < 1e15) s"${d.toLong}.0" else d.toString
      case s: String => quote(s)
      case s: Seq[_] => s.map(write).mkString("[", ", ", "]")
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        .map { case (k, x) => s"${quote(k)}: ${write(x)}" }.mkString("{", ", ", "}")
      case other => quote(other.toString)
    }

    private def quote(s: String): String = {
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"').toString
    }

    def parse(s: String): Any = {
      val p = new JP(s)
      val v = p.value()
      p.ws()
      v
    }

    private class JP(s: String) {
      var i = 0
      def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
      def value(): Any = {
        ws()
        s.charAt(i) match {
          case '{' =>
            i += 1; ws()
            // VectorMap: keeps key insertion order (the reference's row dict
            // iterates columns in row order — plain Map scrambles >4 keys)
            val m = scala.collection.immutable.VectorMap.newBuilder[String, Any]
            if (s.charAt(i) == '}') { i += 1 }
            else {
              var go = true
              while (go) {
                ws()
                val k = value().asInstanceOf[String]
                ws(); require(s.charAt(i) == ':', "expected :"); i += 1
                m += (k -> value())
                ws()
                if (s.charAt(i) == ',') i += 1 else { require(s.charAt(i) == '}', "expected }"); i += 1; go = false }
              }
            }
            m.result()
          case '[' =>
            i += 1; ws()
            val b = List.newBuilder[Any]
            if (s.charAt(i) == ']') { i += 1 }
            else {
              var go = true
              while (go) {
                b += value()
                ws()
                if (s.charAt(i) == ',') i += 1 else { require(s.charAt(i) == ']', "expected ]"); i += 1; go = false }
              }
            }
            b.result()
          case '"' =>
            i += 1
            val sb = new StringBuilder
            while (s.charAt(i) != '"') {
              if (s.charAt(i) == '\\') {
                s.charAt(i + 1) match {
                  case 'n' => sb.append('\n'); case 't' => sb.append('\t')
                  case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
                  case 'f' => sb.append('\f')
                  case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 4
                  case other => sb.append(other)
                }
                i += 2
              } else { sb.append(s.charAt(i)); i += 1 }
            }
            i += 1
            sb.toString
          case 't' => require(s.startsWith("true", i)); i += 4; true
          case 'f' => require(s.startsWith("false", i)); i += 5; false
          case 'n' => require(s.startsWith("null", i)); i += 4; null
          case _ =>
            val j0 = i
            while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
            val tok = s.substring(j0, i)
            if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) tok.toDouble else tok.toLong
        }
      }
    }
  }
}

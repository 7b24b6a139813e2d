package graft.translate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Translates the pandas `DataFrame.query` predicate dialect (the language of
 * the reference's `filter_rows` operation, reference operations/row.py:52-96)
 * into a Spark `Column` predicate, so filters stay native Catalyst
 * expressions (pushdown-able, codegen'd) instead of opaque UDFs.
 *
 * Supported surface (bounded by the reference docs + test corpus):
 *   and / or / not  (also & | ~),   == != < <= > >=,   in / not in,
 *   arithmetic + - * / %,  parentheses,  string/number literals,
 *   `backtick quoted` column names,
 *   col.str.contains('x'), col.str.startswith/endswith, col.str.len(),
 *   col.str.lower()/upper(), col.isnull()/notnull(), col.isin([...]).
 */
object PandasQuery {

  def compile(query: String): Column = new Parser(query).parseAll()

  /** Compile for a KEEP-filter context. A query whose token stream has no
    * negation (`not` / `~` / `!=`) is MONOTONE: under a Filter, its raw
    * three-valued form keeps exactly the rows the pandas-null coalesced
    * form keeps (a null leaf collapses to "dropped" at every AND/OR
    * level on both sides — induction over the formula), and WITHOUT the
    * coalesce wrappers Catalyst pushes the comparisons into the parquet
    * scan (PushedFilters → row-group skipping), which the wrapped form
    * forfeits. Non-monotone queries fall back to the exact pandas-null
    * compile; `exclude` mode must always use [[compile]] (negation flips
    * null handling).
    *
    * The induction only covers predicates combined by and/or up to the
    * top: a predicate flowing into a COMPARISON or arithmetic operand
    * (e.g. `s.str.contains('x') == False`, `(a > 5) == (b > 3)`) breaks
    * it — there the pandas-mode INNER coalesce turns a null leaf into
    * false, which the outer operator can flip back to true, so raw mode
    * would drop rows [[compile]] keeps. The parser flags those shapes
    * ([[Parser.rawUnsafe]]) and this falls back to the exact compile. */
  def compileForKeepFilter(query: String): Column =
    if (monotone(query)) {
      val p = new Parser(query, raw = true)
      val c = p.parseAll()
      if (p.rawUnsafe) compile(query) else c
    } else compile(query)

  private def monotone(query: String): Boolean =
    !lex(query).exists {
      case TOp("~") | TOp("!=") => true
      case TIdent("not") => true
      case _ => false
    }

  // ---------------------------------------------------------------- lexer
  sealed trait Tok
  case class TIdent(s: String) extends Tok
  case class TNum(s: String) extends Tok
  case class TStr(s: String) extends Tok
  case class TOp(s: String) extends Tok
  case object TEnd extends Tok

  private def lex(in: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0
    val n = in.length
    while (i < n) {
      val c = in.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '`') {
        val j = in.indexOf('`', i + 1)
        require(j > 0, s"unterminated backtick in query: $in")
        toks += TIdent(in.substring(i + 1, j)); i = j + 1
      } else if (c == '\'' || c == '"') {
        val sb = new StringBuilder; var j = i + 1
        while (j < n && in.charAt(j) != c) {
          // Python string literals preserve unrecognized escapes, so only
          // unescape the active quote char and backslash-backslash; a regex
          // arg like '\d+' must keep its backslash (it reaches rlike intact).
          if (in.charAt(j) == '\\' && j + 1 < n &&
              (in.charAt(j + 1) == c || in.charAt(j + 1) == '\\')) {
            sb.append(in.charAt(j + 1)); j += 2
          } else { sb.append(in.charAt(j)); j += 1 }
        }
        require(j < n, s"unterminated string in query: $in")
        toks += TStr(sb.toString); i = j + 1
      } else if (c.isDigit || (c == '.' && i + 1 < n && in.charAt(i + 1).isDigit)) {
        val j0 = i
        while (i < n && (in.charAt(i).isDigit || in.charAt(i) == '.' ||
          in.charAt(i) == 'e' || in.charAt(i) == 'E' ||
          ((in.charAt(i) == '+' || in.charAt(i) == '-') && i > j0 &&
            (in.charAt(i - 1) == 'e' || in.charAt(i - 1) == 'E')))) i += 1
        toks += TNum(in.substring(j0, i))
      } else if (c.isLetter || c == '_') {
        val j0 = i
        while (i < n && (in.charAt(i).isLetterOrDigit || in.charAt(i) == '_')) i += 1
        toks += TIdent(in.substring(j0, i))
      } else {
        val two = if (i + 1 < n) in.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=", "//", "**").contains(two)) { toks += TOp(two); i += 2 }
        else { toks += TOp(c.toString); i += 1 }
      }
    }
    toks += TEnd
    toks.result()
  }

  // --------------------------------------------------------------- parser
  private class Parser(src: String, raw: Boolean = false) {
    private val toks = lex(src)
    /** fz call sites built so far — fz is the single point where raw and
      * pandas compilation diverge, so "operand contains a predicate" is
      * exactly "predSites increased while parsing it". */
    private var predSites = 0
    /** Set when a predicate subexpression feeds a NON-logical operator
      * (comparison/arithmetic/unary minus/method call/in-lhs): the elided
      * inner coalesce is not filter-equivalent there and the caller must
      * fall back to the exact pandas-null compile. */
    var rawUnsafe = false
    /** false-coalesce — identity in raw (monotone keep-filter) mode. */
    private def fz(c: Column): Column = {
      predSites += 1
      if (raw) c else coalesce(c, lit(false))
    }
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expectOp(s: String): Unit = next() match {
      case TOp(`s`) => ()
      case t => fail(s"expected '$s' but found $t")
    }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"pandas-query parse error in '$src': $msg")

    def parseAll(): Column = {
      val c = orExpr()
      if (peek != TEnd) fail(s"trailing tokens at $peek")
      c
    }

    private def orExpr(): Column = {
      var l = andExpr()
      var go = true
      while (go) peek match {
        case TIdent("or") | TOp("|") => next(); l = l || andExpr()
        case _ => go = false
      }
      l
    }

    private def andExpr(): Column = {
      var l = notExpr()
      var go = true
      while (go) peek match {
        case TIdent("and") | TOp("&") => next(); l = l && notExpr()
        case _ => go = false
      }
      l
    }

    private def notExpr(): Column = peek match {
      case TIdent("not") | TOp("~") => next(); !notExpr()
      case _ => cmpExpr()
    }

    // Null semantics (documented choice, matching the reference): pandas
    // query with engine='python' evaluates comparisons on missing values
    // two-valued — NaN == anything (including another NaN) → False,
    // NaN != anything → True, NaN < 5 → False — and the reference's
    // `exclude` wraps the predicate in not(...). SQL three-valued logic
    // would silently drop null rows from both the keep and the exclude
    // sets. We therefore compile every comparison to a non-null boolean:
    // coalesce(_, false) for == and ordering, coalesce(_, true) for !=,
    // so not(pred) keeps null rows exactly like pandas. (NOT null-safe
    // <=>: that would make a null-vs-null COLUMN comparison true, where
    // pandas' NaN == NaN is False.)
    private def cmpExpr(): Column = {
      val p0 = predSites
      val l = addExpr()
      val lHasPred = predSites > p0
      peek match {
        case TOp(op @ ("==" | "!=" | "<" | "<=" | ">" | ">=")) =>
          next()
          val r0 = predSites
          val r = addExpr()
          // a predicate OPERAND of a comparison (boolean-equality forms
          // like `s.str.contains('x') == False`) breaks raw/pandas
          // filter-equivalence — flag for the keep-filter fallback
          if (lHasPred || predSites > r0) rawUnsafe = true
          op match {
            case "==" => fz(l === r)
            case "!=" => if (raw) l =!= r else coalesce(l =!= r, lit(true))
            case "<"  => fz(l < r)
            case "<=" => fz(l <= r)
            case ">"  => fz(l > r)
            case ">=" => fz(l >= r)
          }
        case TIdent("in") =>
          next()
          if (lHasPred) rawUnsafe = true
          fz(l.isin(listLiteral(): _*))
        case TIdent("not") =>
          next()
          if (lHasPred) rawUnsafe = true
          next() match {
            case TIdent("in") => !fz(l.isin(listLiteral(): _*))
            case t => fail(s"expected 'in' after 'not', found $t")
          }
        case _ => l
      }
    }

    private def addExpr(): Column = {
      val p0 = predSites
      var l = mulExpr()
      var applied = false
      var go = true
      while (go) peek match {
        case TOp("+") => next(); applied = true; l = l + mulExpr()
        case TOp("-") => next(); applied = true; l = l - mulExpr()
        case _ => go = false
      }
      // arithmetic over a predicate operand (e.g. `(a>5) + (b>3) >= 1`)
      // also voids the raw/pandas filter-equivalence
      if (applied && predSites > p0) rawUnsafe = true
      l
    }

    private def mulExpr(): Column = {
      val p0 = predSites
      var l = unary()
      var applied = false
      var go = true
      while (go) peek match {
        case TOp("*") => next(); applied = true; l = l * unary()
        case TOp("/") => next(); applied = true; l = l / unary()
        case TOp("%") => next(); applied = true; l = l % unary()
        case _ => go = false
      }
      if (applied && predSites > p0) rawUnsafe = true
      l
    }

    private def unary(): Column = peek match {
      case TOp("-") =>
        next()
        val p0 = predSites
        val c = unary()
        if (predSites > p0) rawUnsafe = true
        negate(c)
      case _ => postfix()
    }

    private def negate(c: Column): Column = lit(0) - c

    private def postfix(): Column = {
      val p0 = predSites
      var base = primary()
      var go = true
      while (go) peek match {
        case TOp(".") =>
          // a method applied to a predicate-containing base (e.g.
          // `(a > 5).isnull()`) sees the elided coalesce — not raw-safe
          if (predSites > p0) rawUnsafe = true
          next()
          next() match {
            case TIdent("str") =>
              expectOp(".")
              val m = next() match {
                case TIdent(name) => name
                case t => fail(s"expected str method, found $t")
              }
              base = strMethod(base, m)
            case TIdent("isnull")  => expectOp("("); expectOp(")"); base = base.isNull
            case TIdent("notnull") => expectOp("("); expectOp(")"); base = base.isNotNull
            case TIdent("isna")    => expectOp("("); expectOp(")"); base = base.isNull
            case TIdent("notna")   => expectOp("("); expectOp(")"); base = base.isNotNull
            case TIdent("isin") =>
              expectOp("(")
              val vs = listLiteral()
              expectOp(")")
              base = base.isin(vs: _*)
            case t => fail(s"unsupported method $t")
          }
        case _ => go = false
      }
      base
    }

    private def strMethod(base: Column, m: String): Column = {
      expectOp("(")
      m match {
        case "contains" =>
          val arg = strArg()
          expectOp(")")
          // pandas default is regex=True; a NaN cell yields NaN which the
          // query treats as False — hence the (keep-mode-elided) coalesce.
          fz(base.rlike(arg))
        case "startswith" =>
          val a = strArg(); expectOp(")")
          fz(base.startsWith(a))
        case "endswith" =>
          val a = strArg(); expectOp(")")
          fz(base.endsWith(a))
        case "len"   => expectOp(")"); length(base)
        case "lower" => expectOp(")"); lower(base)
        case "upper" => expectOp(")"); upper(base)
        case "strip" => expectOp(")"); trim(base)
        case other => fail(s"unsupported .str.$other")
      }
    }

    private def strArg(): String = next() match {
      case TStr(s) => s
      case t => fail(s"expected string literal, found $t")
    }

    private def listLiteral(): Seq[Any] = {
      val open = next()
      val closer = open match {
        case TOp("[") => "]"
        case TOp("(") => ")"
        case t => fail(s"expected list literal, found $t")
      }
      val vs = Seq.newBuilder[Any]
      var go = true
      while (go) peek match {
        case TOp(`closer`) => next(); go = false
        case TOp(",") => next()
        case TStr(s) => next(); vs += s
        case TNum(s) => next(); vs += numValue(s)
        case t => fail(s"bad list element $t")
      }
      vs.result()
    }

    private def numValue(s: String): Any =
      if (s.contains('.') || s.contains('e') || s.contains('E')) s.toDouble else s.toLong

    private def primary(): Column = next() match {
      case TIdent("True")  => lit(true)
      case TIdent("False") => lit(false)
      case TIdent("None")  => lit(null)
      case TIdent(name)    => col(name)
      case TNum(s)         => lit(numValue(s))
      case TStr(s)         => lit(s)
      case TOp("(") =>
        val c = orExpr(); expectOp(")"); c
      case t => fail(s"unexpected token $t")
    }
  }
}

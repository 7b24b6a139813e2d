package graft.template

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Bridges the mini-Jinja engine to Spark columns.
 *
 * Fast path: a template made of literal text, bare `{{ column }}`
 * substitutions, and the common string methods / filters
 * (`.upper/.lower/.strip/.lstrip/.rstrip/.replace/.zfill`, `|int`,
 * `|float`, `|trim`, `|upper`, `|lower`, `|string`, `|replace`, `|round`)
 * compiles to a native Column expression — whole-stage codegen, no UDF, no
 * optimization barrier (SURVEY.md §4 "Jinja UDFs are optimization
 * barriers"). The compiler tracks the value kind (string / integral /
 * floating) through the chain so every native expression mirrors the
 * interpreter bit for bit, including `toStr`'s whole-double rendering
 * ("2.0", "123456789.0" — NOT Java's "1.23456789E8") and Python/Java
 * whitespace semantics (`strip` = chars ≤ 0x20, `lstrip/rstrip` = `\s`).
 * Anything else falls back to the interpreter.
 *
 * General path: rows are serialized with to_json(struct(*)) (codegen'd),
 * then a String=>String UDF parses the JSON into the engine's value model and
 * renders. Numbers stay Long/Double, nested structs become maps — matching
 * the reference's row-dict context (reference earthmover/util.py:82-85).
 */
object RowTemplates {

  /** A Column that renders `source` per row. `bindValue` additionally binds
    * the Jinja variable `value` to the named column (modify_columns
    * semantics, reference operations/column.py:99-104). */
  def templateColumn(df: DataFrame, source: String, bindValue: Option[String] = None,
                     extra: Map[String, Any] = Map.empty): Column = {
    val tpl = Jinja.compile(source)
    nativeColumn(tpl, df.schema, bindValue) match {
      case Some(c) => c
      case None =>
        val render = udf { json: String =>
          val base = Jinja.Json.parse(json).asInstanceOf[Map[String, Any]]
          // __row_data__: the row's self-reference, as the reference injects
          // for destination templates (util.py:82-85, destination.py:164-171).
          // The reference's dict is cyclic (row_data['__row_data__'] =
          // row_data); with immutable maps one level of self-nesting is
          // enough for the documented DEFAULT_TEMPLATE idiom
          // `__row_data__.pop('__row_data__').items()` — the pop returns the
          // inner map, whose items are exactly the row's fields.
          val ctx0 = base + ("__row_data__" -> (base + ("__row_data__" -> base)))
          val ctx = bindValue match {
            case Some(v) => ctx0 ++ extra + ("value" -> base.getOrElse(v, null))
            case None => ctx0 ++ extra
          }
          tpl.render(ctx)
        }
        render(to_json(struct(df.columns.map(col).toIndexedSeq: _*),
          Map("ignoreNullFields" -> "false")))
    }
  }

  /** Value kind tracked through native compilation — mirrors the dynamic
    * types the interpreter sees after the JSON round-trip (string columns →
    * String, integral → Long, floating → Double). */
  private sealed trait Kind
  private case object KStr extends Kind
  private case object KLong extends Kind
  private case object KDouble extends Kind
  // KOther: bare `{{ col }}` output only (legacy cast-to-string rendering,
  // e.g. dates/decimals/booleans/floats) — methods/filters fall back to the
  // interpreter because their dynamic types diverge from the JSON model
  private case object KOther extends Kind

  private def kindOf(dt: DataType): Kind = dt match {
    case StringType => KStr
    case ByteType | ShortType | IntegerType | LongType => KLong
    // NOT FloatType: cast(float→string) renders "0.1" but the JSON round
    // trip gives the widened double 0.10000000149…, so floats keep the
    // legacy bare-output rendering only
    case DoubleType => KDouble
    case _ => KOther
  }

  // Java String.trim strips chars ≤ U+0020 from both ends; Jinja's
  // lstrip/rstrip in the interpreter use regex \s. Mirror each exactly.
  private def javaTrim(c: Column): Column =
    regexp_replace(regexp_replace(c, "^[\\x00-\\x20]+", ""), "[\\x00-\\x20]+$", "")

  /** Scala's `Double#toLong` as a native expression: NaN → 0, saturates at
    * Long.{Min,Max}Value, truncates toward zero otherwise, null-safe. An
    * ANSI-mode plain cast would throw on overflow instead. */
  private def doubleToLongExpr(d: Column): Column =
    when(d.isNull, lit(null).cast(LongType))
      .when(isnan(d), lit(0L))
      .when(d >= lit(Long.MaxValue.toDouble), lit(Long.MaxValue))
      .when(d <= lit(Long.MinValue.toDouble), lit(Long.MinValue))
      .otherwise(d.cast(LongType))

  /** Interpreter `toStr` as a native expression: Long renders as digits,
    * whole doubles < 1e15 as "<long>.0", everything else via Java
    * Double.toString (which Spark's double→string cast matches). */
  private def toStrExpr(c: Column, kind: Kind): Column = kind match {
    case KStr => c
    case KLong => c.cast(StringType)
    case KOther => c.cast(StringType) // legacy bare-output rendering
    case KDouble =>
      val d = c.cast(DoubleType)
      when(d.isNotNull && d === floor(d) && abs(d) < lit(1e15),
        concat(d.cast(LongType).cast(StringType), lit(".0")))
        .otherwise(d.cast(StringType))
  }

  /** Compile an expression to a native (Column, Kind), or None when it
    * needs the interpreter. Only produces expressions whose results are
    * bit-identical to `Jinja.Template.render` (CompiledTemplateSpec pins
    * the parity on an adversarial value matrix). */
  private def nativeExpr(e: Jinja.Expr, schema: StructType,
                         bindValue: Option[String]): Option[(Column, Kind)] = {
    def recur(e: Jinja.Expr): Option[(Column, Kind)] = e match {
      case Jinja.Ident("value") if bindValue.isDefined =>
        schema.fields.find(_.name == bindValue.get)
          .map(f => (col(bindValue.get), kindOf(f.dataType)))
      case Jinja.Ident(name) =>
        schema.fields.find(_.name == name)
          .map(f => (col(name), kindOf(f.dataType)))

      case Jinja.Method(t, name, args) => recur(t).flatMap {
        case (c, KStr) => (name, args) match {
          case ("upper", Nil) => Some((upper(c), KStr))
          case ("lower", Nil) => Some((lower(c), KStr))
          case ("strip", Nil) => Some((javaTrim(c), KStr))
          case ("lstrip", Nil) => Some((regexp_replace(c, "^\\s+", ""), KStr))
          case ("rstrip", Nil) => Some((regexp_replace(c, "\\s+$", ""), KStr))
          case ("replace", List(Jinja.Lit(a: String), Jinja.Lit(b: String))) =>
            Some((replace(c, lit(a), lit(b)), KStr))
          case ("zfill", List(Jinja.Lit(n: Long))) =>
            // Python zfill never truncates (unlike lpad): prepend the deficit
            Some((concat(repeat(lit("0"),
              greatest(lit(n.toInt) - length(c), lit(0))), c), KStr))
          case _ => None
        }
        case _ => None // interpreter raises on non-string method targets
      }

      case Jinja.Filter(t, name, args) => recur(t).flatMap {
        case (_, KOther) => None // dynamic-type divergence: interpreter only
        case (c, k) =>
        // literal-arg guards are exact-shape: a string-literal default
        // (`|int('42')`) falls back to the interpreter rather than silently
        // using the wrong default
        def longArg: Option[Long] = args match {
          case Nil => Some(0L)
          case List(Jinja.Lit(l: Long)) => Some(l)
          case _ => None
        }
        (name, args) match {
          case ("int", _) if longArg.isDefined =>
            val d = longArg.get
            k match {
              case KLong => Some((coalesce(c, lit(d)), KLong))
              case KDouble => Some((coalesce(doubleToLongExpr(c), lit(d)), KLong))
              case KStr =>
                // interpreter: trim → toLong, else toDouble.toLong, else default
                val t0 = javaTrim(c)
                Some((coalesce(t0.try_cast(LongType),
                  doubleToLongExpr(t0.try_cast(DoubleType)), lit(d)), KLong))
            }
          case ("float", dflt) if dflt.isEmpty ||
              (dflt.sizeIs == 1 && dflt.head.isInstanceOf[Jinja.Lit] &&
                dflt.head.asInstanceOf[Jinja.Lit].v.isInstanceOf[Number]) =>
            val d = dflt.headOption.collect {
              case Jinja.Lit(x: Double) => x
              case Jinja.Lit(l: Long) => l.toDouble
            }.getOrElse(0.0)
            k match {
              case KDouble => Some((coalesce(c.cast(DoubleType), lit(d)), KDouble))
              case KLong => Some((coalesce(c.cast(DoubleType), lit(d)), KDouble))
              case KStr => Some((coalesce(javaTrim(c).try_cast(DoubleType), lit(d)), KDouble))
            }
          case ("round", _) if k != KStr && longArg.isDefined =>
            // numeric targets only: the interpreter's asDouble THROWS on a
            // bad string, which a null-producing cast can't mirror.
            // coalesce first: interpreter asDouble(null) = 0.0; HALF_EVEN
            // via bround, like the interpreter's BigDecimal setScale
            Some((bround(coalesce(c.cast(DoubleType), lit(0.0)), longArg.get.toInt), KDouble))
          case ("trim", Nil) => Some((javaTrim(toStrExpr(c, k)), KStr))
          case ("upper", Nil) => Some((upper(toStrExpr(c, k)), KStr))
          case ("lower", Nil) => Some((lower(toStrExpr(c, k)), KStr))
          case ("string", Nil) => Some((toStrExpr(c, k), KStr))
          case ("replace", List(Jinja.Lit(a: String), Jinja.Lit(b: String))) =>
            Some((replace(toStrExpr(c, k), lit(a), lit(b)), KStr))
          case _ => None
        }
      }
      case _ => None
    }
    recur(e)
  }

  /** Compile whole templates (text + compilable `{{ expr }}` outputs) to a
    * native concat. Returns None when any node needs the interpreter. */
  private[graft] def nativeColumn(tpl: Jinja.Template, schema: StructType,
                                  bindValue: Option[String]): Option[Column] = {
    val parts: List[Option[Column]] = tpl.nodes.map {
      case Jinja.Text(s) => Some(lit(s))
      case Jinja.Output(e) =>
        // null renders as "" (interpreter toStr(null)), applied at output so
        // chain-internal null semantics stay the interpreter's
        nativeExpr(e, schema, bindValue).map { case (c, k) => coalesce(toStrExpr(c, k), lit("")) }
      case _ => None
    }
    if (parts.forall(_.isDefined)) {
      parts.flatten match {
        case Nil => Some(lit(""))
        case one :: Nil => Some(one)
        case many => Some(concat(many: _*))
      }
    } else None
  }
}

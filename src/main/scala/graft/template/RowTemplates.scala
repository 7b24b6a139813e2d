package graft.template

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/**
 * Bridges the mini-Jinja engine to Spark columns.
 *
 * Fast path: a template that is only literal text and bare `{{ column }}`
 * substitutions compiles to a native concat() Column — whole-stage codegen,
 * no UDF, no optimization barrier (SURVEY.md §4 "Jinja UDFs are optimization
 * barriers").
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
    nativeColumn(tpl, df.columns.toSet, bindValue) match {
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

  /** Compile templates consisting solely of text + `{{ ident }}` to a native
    * concat of string-cast columns. Returns None when the template needs the
    * interpreter. */
  private[graft] def nativeColumn(tpl: Jinja.Template, columns: Set[String],
                                  bindValue: Option[String]): Option[Column] = {
    val parts: List[Option[Column]] = tpl.nodes.map {
      case Jinja.Text(s) => Some(lit(s))
      case Jinja.Output(Jinja.Ident("value")) if bindValue.isDefined =>
        Some(col(bindValue.get).cast(StringType))
      case Jinja.Output(Jinja.Ident(name)) if columns.contains(name) =>
        Some(col(name).cast(StringType))
      case _ => None
    }
    if (parts.forall(_.isDefined)) {
      parts.flatten match {
        case Nil => Some(lit(""))
        case one :: Nil => Some(coalesce(one, lit("")))
        case many => Some(concat(many.map(c => coalesce(c, lit(""))): _*))
      }
    } else None
  }
}

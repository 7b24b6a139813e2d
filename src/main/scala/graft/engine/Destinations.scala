package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import java.nio.file.{Files, Paths, Path}
import graft.template.{Jinja, RowTemplates}

/**
 * Destination writer (reference nodes/destination.py:47-182): render a Jinja
 * template once per row, write `{output_dir}/{name}.{extension}` with
 * optional header/footer (themselves Jinja, rendered against the first row)
 * and `linearize` (whitespace runs collapsed to single spaces).
 *
 * Two output modes:
 *  - single-file (reference parity): rendering is distributed; the final
 *    framing streams partition iterators through the driver
 *    (toLocalIterator — one partition in memory at a time, like the
 *    reference's partition loop);
 *  - partitioned (`partitioned: true`): df.write.text emits one part per
 *    partition — the only shape that makes sense at 100 TB, where a single
 *    output file is itself the bottleneck.
 */
object Destinations {

  def write(df: DataFrame, name: String, cfg: Map[String, Any], outputDir: Path, configDir: Path): Path = {
    val extension = Config.str(cfg, "extension").getOrElse("jsonl")
    val linearize = Config.bool(cfg, "linearize")
    val partitioned = Config.bool(cfg, "partitioned")

    val rendered = renderColumn(df, cfg, configDir, linearize)
    val out = df.select(rendered.as("value"))

    Files.createDirectories(outputDir)
    val target = outputDir.resolve(s"$name.$extension")

    val headerTpl = Config.str(cfg, "header")
    val footerTpl = Config.str(cfg, "footer")

    if (partitioned) {
      // scale path: spark-native multi-part text output; header/footer are
      // not supported here (they imply a single serial file)
      require(headerTpl.isEmpty && footerTpl.isEmpty,
        s"destination `$name`: header/footer require single-file mode")
      out.write.mode("overwrite").text(target.toString)
      target
    } else {
      val firstRow: Map[String, Any] = df.limit(1).toJSON.collect().headOption
        .map(j => Jinja.Json.parse(j).asInstanceOf[Map[String, Any]])
        .getOrElse(Map.empty)
      val writer = Files.newBufferedWriter(target)
      try {
        headerTpl.foreach { h => writer.write(Jinja.render(h, firstRow)); writer.write("\n") }
        val it = out.toLocalIterator()
        while (it.hasNext) {
          writer.write(it.next().getString(0))
          writer.write("\n")
        }
        footerTpl.foreach { f => writer.write(Jinja.render(f, firstRow)); writer.write("\n") }
      } finally writer.close()
      target
    }
  }

  /** The per-row rendered line: template file if given, else the default
    * row-as-JSON-object (destination.py:62 DEFAULT_TEMPLATE) — which we
    * compile to native to_json(struct(*)) instead of interpreting Jinja. */
  def renderColumn(df: DataFrame, cfg: Map[String, Any], configDir: Path, linearize: Boolean): Column = {
    val base = Config.str(cfg, "template") match {
      case Some(tplPath) =>
        val p = { val x = Paths.get(tplPath); if (x.isAbsolute) x else configDir.resolve(tplPath) }
        val source = Files.readString(p)
        RowTemplates.templateColumn(df, source)
      case None =>
        // NaN/None → "" and primitives stringified at the sink
        // (destination.py:21-58 cast_output_dtype)
        to_json(struct(df.columns.map(c => coalesce(col(c).cast(StringType), lit("")).as(c)).toIndexedSeq: _*))
    }
    if (linearize) trim(regexp_replace(base, "\\s+", " ")) else base
  }
}

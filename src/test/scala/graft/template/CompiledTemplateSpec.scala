package graft.template

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Parity pin for the native template fast path: every template the compiler
  * claims to handle must render BIT-IDENTICALLY to the Jinja interpreter
  * over an adversarial value matrix (nulls, empty, padded, unicode, numeric
  * edge cases, whole doubles in Java's scientific-notation range). A
  * divergence here means the fast path silently changes user output — the
  * worst failure mode a template engine can have. */
class CompiledTemplateSpec extends SparkSpec {

  private lazy val schema = StructType(Seq(
    StructField("s", StringType), StructField("l", LongType), StructField("d", DoubleType)))

  // (s, l, d) rows — each column carries its own edge cases
  private lazy val rows: Seq[(Any, Any, Any)] = Seq(
    ("hello World", 0L, 1.5),
    (" \tpadded \n", -5L, 2.0),
    ("", 123456789L, -3.25),
    (null, Long.MaxValue, 123456789.0), // whole double ≥ 1e7: Java toString is "1.23456789E8"
    ("ß", null, null),
    ("1.5", 7L, -0.0),
    (" -007 ", -1L, 1.0e16),
    ("99999999999999999999", 42L, 0.125),
    ("x{}y o", 1L, 9.999999999999e14),
    ("ünïcode lo", 2L, 1.0000000000001e15))

  private lazy val df = spark.createDataFrame(
    java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*), schema)

  private val templates = Seq(
    "{{s}}", "{{l}}", "{{d}}",
    "{{s.upper()}}", "{{s.lower()}}", "{{s.strip()}}",
    "{{s.lstrip()}}|{{s.rstrip()}}",
    "{{s.replace('l','L')}}", "{{s.replace('o','')}}",
    "{{s.zfill(8)}}",
    "{{s|int}}", "{{s|int(42)}}", "{{s|float}}",
    "{{l|int}}", "{{d|int}}", "{{l|float}}", "{{d|float}}",
    "{{d|round(1)}}", "{{d|round}}", "{{l|round}}",
    "{{s|trim}}", "{{s|upper}}", "{{s|lower}}",
    "{{l|string}}", "{{d|string}}",
    "{{s|replace('o','0')}}",
    "{{s.strip().upper()}}", "{{s|trim|lower}}", "{{s.strip()|int(9)}}",
    "a {{s.upper()}} b {{l}} c {{d}}")

  private def interpret(tpl: String, ctx: Map[String, Any]): String =
    Jinja.compile(tpl).render(ctx)

  test("native-compiled templates render identically to the interpreter") {
    for (t <- templates) {
      val compiled = RowTemplates.nativeColumn(Jinja.compile(t), schema, None)
      assert(compiled.isDefined, s"template `$t` should compile natively")
      val got = df.select(compiled.get.as("r")).collect().map(_.getString(0)).toSeq
      val want = rows.map { case (s, l, d) =>
        interpret(t, Map("s" -> s, "l" -> l, "d" -> d))
      }
      assert(got == want, s"template `$t`: native=$got interpreter=$want")
    }
  }

  test("bound `value` compiles natively with methods (modify_columns shape)") {
    for (t <- Seq("{{value.upper()}}", "{{value.strip()}}", "{{value|int}}",
        "{{value.zfill(6)}}", "pre-{{value|trim|upper}}-post")) {
      val compiled = RowTemplates.nativeColumn(Jinja.compile(t), schema, Some("s"))
      assert(compiled.isDefined, s"template `$t` should compile natively")
      val got = df.select(compiled.get.as("r")).collect().map(_.getString(0)).toSeq
      val want = rows.map { case (s, l, d) =>
        interpret(t, Map("s" -> s, "l" -> l, "d" -> d, "value" -> s))
      }
      assert(got == want, s"template `$t`: native=$got interpreter=$want")
    }
  }

  test("numeric value binding keeps long/double rendering parity") {
    for ((bind, t) <- Seq("l" -> "{{value}}", "d" -> "{{value}}", "l" -> "{{value|float}}",
        "d" -> "{{value|round(2)}}")) {
      val compiled = RowTemplates.nativeColumn(Jinja.compile(t), schema, Some(bind))
      assert(compiled.isDefined, s"template `$t` bound to $bind should compile natively")
      val got = df.select(compiled.get.as("r")).collect().map(_.getString(0)).toSeq
      val want = rows.map { case (s, l, d) =>
        val v = if (bind == "l") l else d
        interpret(t, Map("s" -> s, "l" -> l, "d" -> d, "value" -> v))
      }
      assert(got == want, s"template `$t` on $bind: native=$got interpreter=$want")
    }
  }

  test("templates beyond the native subset still fall back to the interpreter") {
    for (t <- Seq("{{s.split(' ')}}", "{{unknown_col}}", "{{s|md5}}",
        "{% if l %}y{% endif %}", "{{s.replace(l, 'x')}}", "{{d|round('2')}}")) {
      assert(RowTemplates.nativeColumn(Jinja.compile(t), schema, None).isEmpty,
        s"template `$t` must NOT claim native support")
    }
  }
}

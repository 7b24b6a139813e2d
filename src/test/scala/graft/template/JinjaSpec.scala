package graft.template

import org.scalatest.funsuite.AnyFunSuite

class JinjaSpec extends AnyFunSuite {

  private def r(tpl: String, ctx: Map[String, Any] = Map.empty): String =
    Jinja.render(tpl, ctx)

  test("plain text passes through") {
    assert(r("hello world") == "hello world")
  }

  test("variable substitution and missing vars render empty") {
    assert(r("{{name}}!", Map("name" -> "zoe")) == "zoe!")
    assert(r("[{{missing}}]") == "[]")
  }

  test("arithmetic keeps int/float distinction like Python") {
    assert(r("{{ 1 + 1 }}") == "2")
    assert(r("{{ 3 / 2 }}") == "1.5")
    assert(r("{{ 7 // 2 }}") == "3")
    assert(r("{{ 2 * 2.5 }}") == "5.0")
    assert(r("{{ 7 % 3 }}") == "1")
  }

  test("int/float filters coerce strings (reference corpus: {{value|int + 1000}})") {
    assert(r("{{ value|int + 1000 }}", Map("value" -> "42")) == "1042")
    assert(r("{{ value|float * 2 }}", Map("value" -> "1.5")) == "3.0")
  }

  test("string slicing (corpus: value[0:4])") {
    assert(r("{{ value[0:4] }}", Map("value" -> "20240115")) == "2024")
    assert(r("{{ value[-2:] }}", Map("value" -> "abcde")) == "de")
  }

  test("comparisons, and/or/not, ternary") {
    assert(r("{% if x > 3 and x < 10 %}mid{% else %}out{% endif %}", Map("x" -> 5L)) == "mid")
    assert(r("{{ 'yes' if flag else 'no' }}", Map("flag" -> false)) == "no")
    assert(r("{% if not missing %}none{% endif %}") == "none")
  }

  test("for loop with loop.index/first/last") {
    val out = r("{% for x in xs %}{{loop.index}}:{{x}}{% if not loop.last %},{% endif %}{% endfor %}",
      Map("xs" -> List("a", "b", "c")))
    assert(out == "1:a,2:b,3:c")
  }

  test("set statement and macro") {
    assert(r("{% set y = x * 2 %}{{y}}", Map("x" -> 21L)) == "42")
    assert(r("{% macro greet(n) %}hi {{n}}{% endmacro %}{{ greet('bob') }}") == "hi bob")
  }

  test("raw block is not evaluated") {
    assert(r("{% raw %}{{ not_evaluated }}{% endraw %}") == "{{ not_evaluated }}")
  }

  test("comments are stripped (reference studentSchoolAttendanceEvent.jsont shape)") {
    assert(r("a{# gone #}b") == "ab")
    assert(r("x {#- trims -#} y") == "xy")
    assert(r("{{ v }}{# {{ not_rendered }} expr inside comment #}", Map("v" -> 7L)) == "7")
    // a comment inside {% raw %} stays verbatim (Jinja2 parity)
    assert(r("{% raw %}{# kept #}{% endraw %}") == "{# kept #}")
    intercept[Exception] { r("oops {# unterminated") }
    // the reference benchmark template's trailing comment block renders away
    assert(r("\"x\": 1{# ,\n \"y\": {{ d }} #}\n", Map("d" -> 3L)) == "\"x\": 1\n")
  }

  test("dotted access into nested maps (jsonl sources)") {
    val ctx = Map("weather" -> Map("avg_days_of_rain" -> Map("January" -> 5L)))
    assert(r("{{weather.avg_days_of_rain.January}}", ctx) == "5")
  }

  test("md5 and fromjson globals (reference util.py:134-135)") {
    assert(r("{{ md5('abc') }}") == "900150983cd24fb0d6963f7d28e17f72")
    assert(r("{{ fromjson(s).k }}", Map("s" -> """{"k": "v"}""")) == "v")
  }

  test("tojson filter") {
    assert(r("{{ m | tojson }}", Map("m" -> Map("a" -> 1L))) == """{"a": 1}""")
    assert(r("{{ s | tojson }}", Map("s" -> "he said \"hi\"")) == "\"he said \\\"hi\\\"\"")
  }

  test("filters: trim, upper, lower, reverse, length, replace, default, join") {
    assert(r("{{ '  x  ' | trim }}") == "x")
    assert(r("{{ 'ab' | upper }}") == "AB")
    assert(r("{{ 'AB' | lower }}") == "ab")
    assert(r("{{ 'abc' | reverse }}") == "cba")
    assert(r("{{ 'abc' | length }}") == "3")
    assert(r("{{ 'a-b' | replace('-', '+') }}") == "a+b")
    assert(r("{{ missing | default('dflt') }}") == "dflt")
    assert(r("{{ xs | join(',') }}", Map("xs" -> List(1L, 2L))) == "1,2")
  }

  test("string methods") {
    assert(r("{{ s.upper() }}", Map("s" -> "ab")) == "AB")
    assert(r("{{ s.split(',')[1] }}", Map("s" -> "a,b,c")) == "b")
    assert(r("{{ s.replace('x', 'y') }}", Map("s" -> "xx")) == "yy")
    assert(r("{{ s.zfill(5) }}", Map("s" -> "42")) == "00042")
    assert(r("{{ s.startswith('ab') }}", Map("s" -> "abc")) == "True")
  }

  test("dict iteration via .items() (DEFAULT_TEMPLATE shape)") {
    val out = r(
      "{% for kv in row.items() %}{{kv[0]}}={{kv[1]}};{% endfor %}",
      Map("row" -> scala.collection.immutable.ListMap("a" -> "1", "b" -> "2")))
    assert(out == "a=1;b=2;")
  }

  test("in / not in") {
    assert(r("{% if 'a' in xs %}y{% endif %}", Map("xs" -> List("a"))) == "y")
    assert(r("{% if 'q' not in 'abc' %}absent{% endif %}") == "absent")
  }

  test("elif chain") {
    val t = "{% if x == 1 %}one{% elif x == 2 %}two{% else %}many{% endif %}"
    assert(r(t, Map("x" -> 2L)) == "two")
    assert(r(t, Map("x" -> 9L)) == "many")
  }

  test("whitespace trim markers") {
    assert(r("a {{- 'b' -}} c") == "abc")
  }

  test("unsupported statements fail loudly") {
    intercept[IllegalArgumentException](Jinja.compile("{% include 'x' %}"))
  }
}

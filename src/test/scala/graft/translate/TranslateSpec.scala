package graft.translate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StrftimeSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("common directives") {
    assert(Strftime.toJavaPattern("%Y-%m-%d") == "yyyy-MM-dd")
    assert(Strftime.toJavaPattern("%b %d %Y") == "MMM dd yyyy")
    assert(Strftime.toJavaPattern("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(Strftime.toJavaPattern("%d/%m/%Y") == "dd/MM/yyyy")
    assert(Strftime.toJavaPattern("%I:%M %p") == "hh:mm a")
  }

  test("literal letters are quoted; apostrophes escaped even letter-free") {
    assert(Strftime.toJavaPattern("%Yyr") == "yyyy'yr'")
    assert(Strftime.toJavaPattern("%d o'clock-ish") == "dd' o''clock-ish'")
    assert(Strftime.toJavaPattern("%d ' %m") == "dd' '' 'MM")
  }

  test("percent literal and errors") {
    assert(Strftime.toJavaPattern("%d%%") == "dd%")
    intercept[IllegalArgumentException](Strftime.toJavaPattern("%Q"))
    intercept[IllegalArgumentException](Strftime.toJavaPattern("%G-%V")) // week-based: unsupported in Spark 3+
    intercept[IllegalArgumentException](Strftime.toJavaPattern("bad%"))  // dangling %
  }
}

class PandasQuerySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("cheetah", Some(10.0), "cat"),
    ("lion", Some(50.0), "cat"),
    ("wolf", None, "dog"),
  ).toDF("name", "weight", "family")

  private def names(q: String, exclude: Boolean = false): Set[String] = {
    val pred = PandasQuery.compile(q)
    df.filter(if (exclude) !pred else pred).select("name").as[String].collect().toSet
  }

  test("comparisons and boolean operators") {
    assert(names("weight > 20") == Set("lion"))
    assert(names("weight > 5 and family == 'cat'") == Set("cheetah", "lion"))
    assert(names("family == 'dog' or weight >= 50") == Set("wolf", "lion"))
    assert(names("not (family == 'cat')") == Set("wolf"))
  }

  test("pandas two-valued null semantics: != keeps null rows, exclude keeps complement") {
    assert(names("weight != 10") == Set("lion", "wolf"))       // NaN != 10 → True in pandas
    assert(names("weight > 5", exclude = true) == Set("wolf")) // not(NaN > 5) → True
    assert(names("weight == 10", exclude = true) == Set("lion", "wolf"))
    // NaN never equals ANYTHING — including another NaN: a column-vs-
    // column self-comparison drops the null row (pandas' classic
    // `a == a` NaN filter), and != keeps it
    assert(names("weight == weight") == Set("cheetah", "lion"))
    assert(names("weight != weight") == Set("wolf"))
  }

  test("str methods") {
    assert(names("name.str.contains('chee')") == Set("cheetah"))
    assert(names("name.str.startswith('li')") == Set("lion"))
    assert(names("name.str.endswith('lf')") == Set("wolf"))
    assert(names("name.str.len() > 4") == Set("cheetah"))
  }

  test("regex escapes survive the lexer (ADVICE r2: backslash stripping)") {
    val d2 = Seq("a1", "bb").toDF("s")
    val got = d2.filter(PandasQuery.compile("s.str.contains('\\d')")).as[String].collect().toSet
    assert(got == Set("a1"))
  }

  test("in / not in lists") {
    assert(names("family in ['cat']") == Set("cheetah", "lion"))
    assert(names("name not in ['wolf', 'lion']") == Set("cheetah"))
  }

  test("arithmetic in predicates") {
    assert(names("weight * 2 >= 100") == Set("lion"))
  }

  test("backtick-quoted columns") {
    assert(names("`name` == 'wolf'") == Set("wolf"))
  }

  test("parse errors are loud") {
    intercept[IllegalArgumentException](PandasQuery.compile("name =="))
    intercept[IllegalArgumentException](PandasQuery.compile("name.str.explode('x')"))
  }
}

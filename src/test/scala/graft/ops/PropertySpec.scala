package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/**
 * Property-based operator laws (SURVEY §5 plan): random small all-string
 * tables driven through the real operators, checked against reference
 * semantics computed in plain Scala. Raw ScalaCheck (`Prop.forAll` +
 * `Test.check`) — the scalatest bridge artifact isn't on the offline
 * classpath.
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
  private def check(prop: Prop, name: String): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val word: Gen[String] = Gen.oneOf("a", "b", "cc", "dd", "e f", "", "NULL", "x")

  test("melt then pivot round-trips a keyed wide table") {
    val rows = Gen.nonEmptyListOf(Gen.zip(word, word)).map(_.zipWithIndex.map {
      case ((v1, v2), i) => (i.toString, v1, v2)
    })
    check(Prop.forAll(rows) { data =>
      val df = data.toDF("id", "c1", "c2")
      val melted = Ops.melt(df, idVars = Seq("id"))
      val back = Ops.pivot(melted, rowsBy = Seq("id"), colsBy = "melt_variable",
        values = "melt_value")
      val orig = data.map { case (id, v1, v2) => (id, v1, v2) }.toSet
      val round = back.select("id", "c1", "c2").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      round == orig
    }, "melt∘pivot")
  }

  test("union preserves row counts; fill_missing_columns nulls absent columns") {
    val lists = Gen.zip(Gen.listOf(word), Gen.listOf(word))
    check(Prop.forAll(lists) { case (xs, ys) =>
      val a = xs.zipWithIndex.map { case (v, i) => (i.toString, v) }.toDF("id", "v")
      val b = ys.zipWithIndex.map { case (v, i) => (i.toString, v) }.toDF("id", "w")
      val filled = Ops.union(a, Seq(b), fillMissingColumns = true)
      filled.count() == xs.size.toLong + ys.size.toLong &&
        filled.filter(org.apache.spark.sql.functions.col("w").isNull).count() == xs.size.toLong
    }, "union")
  }

  test("map_values maps exact matches and passes everything else through") {
    val mapping = Map("a" -> "A", "cc" -> "C")
    check(Prop.forAll(Gen.listOf(word)) { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toString, v) }.toDF("id", "v")
      val out = Ops.mapValues(df, Seq("v"), mapping)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      xs.zipWithIndex.forall { case (v, i) =>
        out(i.toString) == mapping.getOrElse(v, v)
      }
    }, "map_values")
  }

  test("sort_rows orders by string collation like the reference") {
    check(Prop.forAll(Gen.listOf(word)) { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (v, i.toString) }.toDF("v", "id")
      val sorted = Ops.sortRows(df, Seq("v")).select("v").as[String].collect().toSeq
      sorted == xs.sorted
    }, "sort_rows")
  }
}

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

  test("prefix-filtered jaccardPairs equals brute-force jaccard on random corpora") {
    // exactness law for the ppjoin prefix index: for random small documents
    // over a tight vocabulary (lots of shared shingles), the distributed
    // prefix-candidate + verify pipeline must return EXACTLY the pairs a
    // driver-side brute force finds — same ids, same rounded scores
    val vocab = Seq("red", "blue", "fox", "dog", "run", "sit")
    val doc: Gen[String] = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    check(Prop.forAll(Gen.chooseNum(2, 10).flatMap(Gen.listOfN(_, doc))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.functions.Dedup.jaccardPairs(df, "doc_id", "text", threshold = 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // independent re-implementation of the 3-word shingling (not the
      // production kernel) so the law checks the whole pipeline
      def shingles(t: String): Set[String] = {
        val ws = t.toLowerCase.split(" +").filter(_.nonEmpty)
        if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
        else Set(ws.mkString(" "))
      }
      val want = (for {
        (a, i) <- texts.zipWithIndex
        (b, j) <- texts.zipWithIndex if i < j
        sa = shingles(a); sb = shingles(b)
        inter = (sa & sb).size
        jac = inter.toDouble / (sa.size + sb.size - inter)
        if jac >= 0.6
      } yield (i.toLong, j.toLong,
        BigDecimal(jac).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
      got == want
    }, "jaccard_prefix_exact")
  }

  test("assignSplit laws: exhaustive, key-deterministic, band-monotone under any weights") {
    import graft.functions.Sampling
    val weightsGen = Gen.chooseNum(1, 4).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(1, 10)).map(_.zipWithIndex.map {
        case (w, i) => s"s$i" -> w.toDouble
      }))
    check(Prop.forAll(weightsGen) { weights =>
      val df = (0L until 200L).toDF("id")
      val labeled = Sampling.assignSplit(df, "id", weights)
        .collect().map(r => r.getLong(0) -> r.getString(1))
      val names = weights.map(_._1).toSet
      // every row gets exactly one label from the declared set
      val exhaustive = labeled.length == 200 && labeled.forall(kv => names(kv._2))
      // determinism: a second run (different partitioning) agrees exactly
      val again = Sampling.assignSplit(df.repartition(5), "id", weights)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      exhaustive && labeled.forall { case (k, v) => again(k) == v }
    }, "assign_split_laws")
  }
}

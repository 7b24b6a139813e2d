package graft.functions

import org.apache.spark.sql.functions._

class ZorderSpec extends graft.SparkSpec {
  import spark.implicits._

  /** BigInteger model of the unsigned bucket + interleave — independent
    * arithmetic the kernel must match across the full signed range. */
  private def modelKey(vals: Seq[Long], mins: Seq[Long], maxs: Seq[Long], bits: Int): Long = {
    import java.math.BigInteger
    val two64 = BigInteger.ONE.shiftLeft(64)
    def u(x: Long) = BigInteger.valueOf(x).mod(two64)
    var z = 0L
    val k = vals.size
    for (i <- 0 until k) {
      val range = u(maxs(i)).subtract(u(mins(i))).mod(two64)
      val step = range.shiftRight(bits).add(BigInteger.ONE)
      val bucket = u(vals(i)).subtract(u(mins(i))).mod(two64).divide(step).longValueExact()
      for (b <- 0 until bits) z |= ((bucket >>> b) & 1L) << (b * k + i)
    }
    z
  }

  test("kernel matches the BigInteger model across hostile ranges") {
    val cases = Seq(
      (Seq(5L, 7L), Seq(0L, 0L), Seq(255L, 255L)),
      (Seq(Long.MinValue, Long.MaxValue), Seq(Long.MinValue, -10L), Seq(Long.MaxValue, Long.MaxValue)),
      (Seq(-1L, 0L), Seq(-1000L, -5L), Seq(1000L, 5L)),
      (Seq(42L, 42L), Seq(42L, 42L), Seq(42L, 42L)) // zero range -> bucket 0
    )
    for ((vals, mins, maxs) <- cases; bits <- Seq(1, 8, 16)) {
      val steps = mins.indices.map(i => ZorderKernels.step(mins(i), maxs(i), bits)).toArray
      val got = ZorderKernels.zkey(vals.toArray, mins.toArray, steps, bits)
      assert(got == modelKey(vals, mins, maxs, bits), s"vals=$vals bits=$bits")
    }
  }

  test("interleave puts column i's bit b at position b*k+i") {
    // buckets 3 (011) and 5 (101), bits=3, k=2:
    // positions: a0->0, b0->1, a1->2, b1->3, a2->4, b2->5
    // a=011: bits 0,1 set -> positions 0,2; b=101: bits 0,2 -> positions 1,5
    val z = ZorderKernels.spread(3L, 3, 2, 0) | ZorderKernels.spread(5L, 3, 2, 1)
    assert(z == ((1L << 0) | (1L << 2) | (1L << 1) | (1L << 5)), z.toBinaryString)
  }

  test("withZorderKey: codegen'd expression agrees with the kernel and stays fused") {
    // range() (not a local Seq) so ConvertToLocalRelation can't pre-fold
    // the projection and the codegen-span assertion bites
    val df = spark.range(1000).selectExpr("id * 37 % 500 AS a", "id * 91 % 800 AS b")
    val keyed = Zorder.withZorderKey(df, Seq("a", "b"), bits = 8)
    val (mins, maxs) = Zorder.columnRanges(df, Seq("a", "b"))
    val steps = mins.indices.map(i => ZorderKernels.step(mins(i), maxs(i), 8)).toArray
    keyed.collect().foreach { r =>
      val expect = ZorderKernels.zkey(Array(r.getLong(0), r.getLong(1)), mins, steps, 8)
      assert(r.getLong(2) == expect, s"row $r")
    }
    val plan = keyed.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("zorder_key")),
      s"expected the zorder_key projection inside a codegen span:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.toLowerCase.contains("fallback"), plan)
  }

  test("null inputs bucket at the column minimum (key stays total)") {
    val df = Seq[(java.lang.Long, java.lang.Long)]((10L, 20L), (null, 20L))
      .toDF("a", "b")
    val got = Zorder.withZorderKey(df, Seq("a", "b"), bits = 4,
      ranges = Some((Array(10L, 20L), Array(100L, 100L)))).collect()
    // null a behaves as a=10 (the min): same key as the (10, 20) row
    assert(got(0).getLong(2) == got(1).getLong(2))
  }

  test("zorderBy preserves the multiset and sorts by key within partitions") {
    val df = (0L until 2000L).map(i => (i * 37 % 500, i * 91 % 800)).toDF("a", "b")
    val out = Zorder.zorderBy(df, Seq("a", "b"), bits = 8, numPartitions = Some(4), keepKey = true)
    assert(out.count() == 2000)
    assert(out.columns.contains("zkey"))
    // within each partition the key is non-decreasing
    val ok = out.select("zkey").rdd.mapPartitions { it =>
      val xs = it.map(_.getLong(0)).toSeq
      Iterator(xs == xs.sorted)
    }.collect()
    assert(ok.forall(identity))
    // multiset unchanged
    val back = Zorder.zorderBy(df, Seq("a", "b"), bits = 8).groupBy("a", "b").count()
      .join(df.groupBy("a", "b").count().withColumnRenamed("count", "c2"), Seq("a", "b"))
      .filter($"count" =!= $"c2").count()
    assert(back == 0)
  }

  test("locality: z-sorted blocks prune two-sided range queries, single-sort does not") {
    // 64x64 grid in 64-row blocks; a block is "read" when its (a, b)
    // bounding box intersects the query rectangle — exactly parquet
    // row-group min/max pruning. Sorting by `a` makes 1x64 strips (every
    // b-predicate is useless); z-order makes ~8x8 tiles, so an 8x8 query
    // touches a few tiles instead of a band of strips.
    val n = 16384 // 4 points per cell: blocks span ~4x4 cells, so the
    // z-advantage is decisive (strips stay 1x64 regardless of density)
    def mix(x: Long): Long = { // splitmix64 finalizer: a,b independent
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val pts = (0 until n).map { i => ((mix(i) >>> 5) & 63L, (mix(i + 70001) >>> 5) & 63L) }
    def rowsRead(sorted: Seq[(Long, Long)]): Long = {
      val boxes = sorted.grouped(64).map { g =>
        (g.map(_._1).min, g.map(_._1).max, g.map(_._2).min, g.map(_._2).max, g.size)
      }.toSeq
      val queries = (0 until 16).map(q => ((q * 7) % 56, (q * 13) % 56)) // 8x8 rects
      queries.map { case (qa, qb) =>
        boxes.collect { case (a0, a1, b0, b1, sz)
          if a1 >= qa && a0 <= qa + 7 && b1 >= qb && b0 <= qb + 7 => sz.toLong }.sum
      }.sum
    }
    val mins = Array(0L, 0L); val steps = Array(1L, 1L)
    val byZ = pts.sortBy(p => ZorderKernels.zkey(Array(p._1, p._2), mins, steps, 6))
    val byA = pts.sortBy(_._1)
    // ~4x4 z-tiles vs 1x64 a-strips: an 8x8 query reads ~9 tiles against
    // ~32 strip blocks — require at least a 2x read reduction
    assert(rowsRead(byZ) * 2 < rowsRead(byA),
      s"z=${rowsRead(byZ)} a=${rowsRead(byA)}")
  }

  test("YAML dispatch: zorder_by runs and validates bit budget") {
    val eng = new graft.engine.Engine(spark)
    val df = (0L until 100L).map(i => (i, 99 - i)).toDF("a", "b")
    val out = eng.applyOperation(df,
      Map("operation" -> "zorder_by", "columns" -> List("a", "b"),
        "bits" -> "8", "keep_key" -> "true"), Map.empty, "spec")
    assert(out.columns.toSeq == Seq("a", "b", "zkey") && out.count() == 100)
    val e = intercept[IllegalArgumentException] {
      Zorder.withZorderKey(df, Seq("a", "b"), bits = 40)
    }
    assert(e.getMessage.contains("63-bit"), e.getMessage)
  }
}

// scratch: scale probe for the mergeable sketch tier. For each documents
// dir it measures (a) HLL distinct vs exact count-distinct, (b) sketch-
// pruned heavy hitters over TEXT (the billions-of-distinct-keys shape)
// vs the plain groupBy+HAVING, (c) log-hist quantiles vs exact
// percentiles — wall seconds + agreement, so the "sketches trade a few %
// error for a collapsed shuffle" claim is measured, not argued. Numbers
// land in PLANS.md.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Sketches

object SketchProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/tmp/graft-scale500k", "/tmp/graft-scale5m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    dirs.foreach { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val n = docs.count()

      // --- distinct texts per lang: HLL p=12 vs exact countDistinct
      val (hll, tHll) = time(Sketches.approxDistinct(docs, Seq("lang"), "text", 12)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      spark.catalog.clearCache()
      val (exact, tExact) = time(docs.groupBy("lang").agg(countDistinct("text").as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      spark.catalog.clearCache()
      val worstErr = exact.map { case (k, e) =>
        math.abs(hll(k).toDouble - e) / math.max(1.0, e.toDouble) }.max
      println(f"SCALE-LEG $d hll=$tHll%.1fs exact_distinct=$tExact%.1fs worst_rel_err=$worstErr%.4f")

      // --- heavy hitters over a skewed high-cardinality key (the corpus
      // texts are all-unique, which degenerates the demo): ~5% of rows
      // share 20 hot keys, the rest are singletons — the realistic shape
      // where the CMS prune collapses the exact pass to the hot rows while
      // plain groupBy shuffles every distinct key
      val keyed = docs.select(when(col("doc_id") % 100 < 5,
          concat(lit("hot_"), col("doc_id") % 20))
        .otherwise(concat(lit("cold_"), col("doc_id"))).as("k"))
      val minCount = math.max(3L, n / 1000)
      // width sizing: collision noise ~ n/width per bucket (uniform tail),
      // so width only needs n/width << minCount — 2^17 puts noise at ~38
      // for 5M rows, 130x under the 5000 threshold, and keeps the partial
      // CMS buffers (depth*width*8 = 4 MB) cheap to merge
      val (hh, tHh) = time(Sketches.heavyHitters(keyed, "k", minCount,
        depth = 4, width = 1 << 17).count())
      spark.catalog.clearCache()
      val (hhPlain, tPlain) = time(keyed.groupBy("k").count()
        .filter(col("count") >= minCount).count())
      spark.catalog.clearCache()
      require(hh == hhPlain, s"sketch-pruned HH $hh != exact $hhPlain")
      println(f"SCALE-LEG $d heavy_hitters=$tHh%.1fs plain_groupby=$tPlain%.1fs (min_count=$minCount, hitters=$hh)")

      // --- seen-list filtering: Bloom drop (16 MB bits at log_bits=27,
      // broadcast once) vs the exact left_anti join (shuffles or builds a
      // full hash relation of the seen keys)
      val seen = docs.select(col("doc_id")).filter(col("doc_id") % 10 === 3)
      val (bloomKept, tBloom) = time(Sketches.bloomFilterRows(
        docs, "doc_id", seen, "doc_id", logBits = 27, k = 5).count())
      spark.catalog.clearCache()
      val (antiKept, tAnti) = time(docs.join(seen, Seq("doc_id"), "left_anti").count())
      spark.catalog.clearCache()
      require(bloomKept <= antiKept, "bloom drop must never leak a seen row")
      println(f"SCALE-LEG $d bloom_filter=$tBloom%.1fs left_anti=$tAnti%.1fs " +
        f"(kept $bloomKept vs exact $antiKept, over-dropped ${antiKept - bloomKept})")

      // --- set overlap without a join: KMV vs exact intersect counts
      val (kmvRow, tKmv) = time(Sketches.setOverlap(
        docs.filter(col("doc_id") % 3 =!= 0).select("doc_id"), "doc_id",
        docs.filter(col("doc_id") % 2 =!= 0).select("doc_id"), "doc_id", k = 4096)
        .collect().head)
      spark.catalog.clearCache()
      val (exactInt, tInt) = time(docs.filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 2 =!= 0)
        .select("doc_id").distinct().count())
      spark.catalog.clearCache()
      val ie = kmvRow.getLong(3)
      println(f"SCALE-LEG $d kmv_overlap=$tKmv%.1fs exact_intersect=$tInt%.1fs " +
        f"(est $ie vs exact $exactInt, rel err ${math.abs(ie - exactInt).toDouble / exactInt}%.4f)")

      // --- n_chars quantiles per lang: qhist s=5 vs exact percentile
      val (qh, tQh) = time(Sketches.quantileSketch(docs, Seq("lang"), "n_chars",
        Seq(0.5, 0.99), subBits = 5)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap)
      spark.catalog.clearCache()
      val (ex, tEx) = time(docs.groupBy("lang")
        .agg(percentile(col("n_chars"), lit(0.5)).as("m"), percentile(col("n_chars"), lit(0.99)).as("t"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap)
      spark.catalog.clearCache()
      val worstQ = ex.map { case (k, (m, t)) =>
        math.max(math.abs(qh(k)._1 - m) / m, math.abs(qh(k)._2 - t) / t) }.max
      println(f"SCALE-LEG $d qhist=$tQh%.1fs exact_percentile=$tEx%.1fs worst_rel_err=$worstQ%.4f")
    }
    spark.stop()
  }
}

// scratch: does the Morton layout actually prune parquet scans? Write
// the same synthetic 2-key corpus three ways (unsorted, single-key
// sorted, z-ordered), run selective two-predicate range scans against
// each, and report wall + the files Spark actually read. Numbers land
// in PLANS.md.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{SketchKernels, Zorder}

object ZorderProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dom = 1000000L
    val base = spark.range(n).map { i =>
      val a = (SketchKernels.splitmix64(i) & Long.MaxValue) % dom
      val b = (SketchKernels.splitmix64(i + 777777) & Long.MaxValue) % dom
      (a, b, i)
    }.toDF("a", "b", "payload")

    // small row groups (1 MB) over few files: the granularity model of a
    // real corpus, where a 100 TB table has ~10^6 row groups and pruning
    // ratio == scan-byte ratio
    val dir = "/tmp/graft-zorder-probe"
    def write(df: DataFrame, name: String): String = {
      val p = s"$dir/$name"
      df.write.option("parquet.block.size", 1024 * 1024)
        .mode("overwrite").parquet(p)
      p
    }
    val pUnsorted = write(base.repartition(8), "unsorted")
    val pByA = write(base.repartitionByRange(8, col("a")).sortWithinPartitions("a"), "by_a")
    val pZ = write(Zorder.zorderBy(base, Seq("a", "b"), bits = 8, numPartitions = Some(8)), "zorder")

    // 1%-per-dimension windows on BOTH keys -> 0.01% selectivity.
    // `scanned` = the scan node's numOutputRows: rows surviving
    // row-group + page (column index) pruning — the bytes-read proxy.
    def scan(path: String): (Double, Long, Long) = {
      val df = spark.read.parquet(path)
      val t0 = System.nanoTime()
      var rows = 0L
      var scanned = 0L
      (0 until 8).foreach { q =>
        val a0 = (q * 119231L) % (dom - dom / 100)
        val b0 = (q * 231119L) % (dom - dom / 100)
        val filtered = df.filter(col("a").between(a0, a0 + dom / 100) &&
          col("b").between(b0, b0 + dom / 100))
        // collect() runs THIS Dataset's queryExecution (count() would
        // build a new one and leave these metrics untouched)
        rows += filtered.collect().length
        val scans = filtered.queryExecution.executedPlan.collectLeaves()
        scanned += scans.map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
      }
      ((System.nanoTime() - t0) / 1e9, rows, scanned)
    }
    // b-only windows: the query shape a single-key sort cannot serve —
    // by_a must read everything, z-order still prunes on b's bit share
    def scanB(path: String): Long = {
      val df = spark.read.parquet(path)
      var scanned = 0L
      (0 until 8).foreach { q =>
        val b0 = (q * 231119L) % (dom - dom / 100)
        val filtered = df.filter(col("b").between(b0, b0 + dom / 100))
        filtered.collect()
        scanned += filtered.queryExecution.executedPlan.collectLeaves()
          .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
      }
      scanned
    }
    // warm the readers once so JIT/footer caching doesn't bias leg order
    scan(pUnsorted)
    for ((name, p) <- Seq(("unsorted", pUnsorted), ("by_a", pByA), ("zorder", pZ))) {
      val (dt, rows, scanned) = scan(p)
      println(f"SCALE-LEG zorder n=$n layout=$name wall=$dt%.2fs rows=$rows scanned=$scanned scanned_bonly=${scanB(p)}")
    }
    spark.stop()
  }
}

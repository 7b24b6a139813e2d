package graft.tools

/** Dev harness for the VP8 decoder: dumps header knobs + per-MB modes for
  * a fixture and localizes plane mismatches against the libwebp ground
  * truth to (macroblock, subblock) granularity. Usage:
  *   runMain graft.tools.Vp8Probe <fixture-name> [filtered]
  */
object Vp8Probe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "grad16"
    val filtered = args.length > 1 && args(1) == "filtered"
    val dir = "src/test/resources/vp8"
    if (name == "throughput") {
      // single-thread decode throughput on the 320x208 fixture — the
      // number that scales linearly with executor threads in the narrow
      // pHash sweep (no shuffle anywhere in the image tier)
      val webp = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/auto320x208.webp"))
      var p = 12; var o = -1; var l = -1
      while (p + 8 <= webp.length && o < 0) {
        val size = (webp(p + 4) & 0xFF) | ((webp(p + 5) & 0xFF) << 8) |
          ((webp(p + 6) & 0xFF) << 16) | ((webp(p + 7) & 0xFF) << 24)
        if (new String(webp, p, 4, "US-ASCII") == "VP8 ") { o = p + 8; l = size }
        p += 8 + size + (size & 1)
      }
      for (round <- 1 to 3) {
        val n = 200
        val t0 = System.nanoTime()
        var i = 0
        var sink = 0L
        while (i < n) {
          sink += graft.functions.Vp8.decode(webp, o, l).y(12345)
          i += 1
        }
        val dt = (System.nanoTime() - t0) / 1e9
        val mpps = n * 320L * 208L / dt / 1e6
        println(f"VP8-THROUGHPUT round$round: $n decodes of 320x208 in $dt%.2fs = ${n / dt}%.0f img/s, $mpps%.1f Mpx/s (sink=$sink)")
      }
      // the DISTRIBUTED face: the same decode through the image_phash
      // codegen expression over 20k rows on local[32] — the narrow-scan
      // shape a 100 TB crawl pass runs
      val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      graft.expressions.GraftFunctions.register(spark)
      import spark.implicits._
      val bytes = webp
      val rows = spark.range(20000).mapPartitions(_.map(_ => bytes)).toDF("content")
        .persist()
      rows.count()
      for (round <- 1 to 3) {
        val t0 = System.nanoTime()
        val distinct = rows.selectExpr("image_phash(content) AS ph")
          .agg(org.apache.spark.sql.functions.countDistinct("ph")).head().getLong(0)
        val dt = (System.nanoTime() - t0) / 1e9
        val mpps = 20000L * 320 * 208 / dt / 1e6
        println(f"VP8-THROUGHPUT-SPARK round$round: 20000 decodes via image_phash on local[32] in $dt%.2fs = $mpps%.0f Mpx/s (distinct=$distinct)")
      }
      spark.stop()
      return
    }
    val webp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/$name.webp"))
    val truth = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/$name.${if (filtered) "yuv" else "nf.yuv"}"))
    // locate VP8 chunk
    var p = 12; var o = -1; var l = -1
    while (p + 8 <= webp.length && o < 0) {
      val tag = new String(webp, p, 4, "US-ASCII")
      val size = (webp(p + 4) & 0xFF) | ((webp(p + 5) & 0xFF) << 8) |
        ((webp(p + 6) & 0xFF) << 16) | ((webp(p + 7) & 0xFF) << 24)
      if (tag == "VP8 ") { o = p + 8; l = size }
      p += 8 + size + (size & 1)
    }
    println(graft.functions.Vp8.debug(webp, o, l))
    val pl = graft.functions.Vp8.decode(webp, o, l, filter = filtered)
    val w = pl.w; val h = pl.h
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    def report(label: String, pw: Int, ph: Int, tOff: Int, get: (Int, Int) => Int): Unit = {
      // mismatch count per 4x4 subblock
      val counts = new Array[Int](((ph + 3) / 4) * ((pw + 3) / 4))
      var bad = 0
      for (y <- 0 until ph; x <- 0 until pw) {
        if (get(x, y) != (truth(tOff + y * pw + x) & 0xFF)) {
          counts((y / 4) * ((pw + 3) / 4) + x / 4) += 1; bad += 1
        }
      }
      println(s"$label: $bad/${pw * ph} mismatched")
      if (bad > 0) {
        for (sy <- 0 until (ph + 3) / 4) {
          println((0 until (pw + 3) / 4)
            .map(sx => f"${counts(sy * ((pw + 3) / 4) + sx)}%2d").mkString(" "))
        }
        // first bad row detail
        val fy = (0 until ph).find(y => (0 until pw).exists(x =>
          get(x, y) != (truth(tOff + y * pw + x) & 0xFF))).get
        val fx = (0 until pw).find(x => get(x, fy) != (truth(tOff + fy * pw + x) & 0xFF)).get
        val lo = math.max(0, fx - 4); val hi = math.min(pw, fx + 12)
        println(s"first at ($fx,$fy): got=" +
          (lo until hi).map(x => get(x, fy)).mkString(",") + " exp=" +
          (lo until hi).map(x => truth(tOff + fy * pw + x) & 0xFF).mkString(","))
      }
    }
    report("Y", w, h, 0, pl.yAt)
    report("U", cw, ch, w * h, pl.uAt)
    report("V", cw, ch, w * h + cw * ch, pl.vAt)
  }
}

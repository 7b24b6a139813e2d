// scratch: decade legs for the VIDEO tier (r15 VERDICT #5). The image,
// graph and stream tiers all carry decade evidence; this adds it for
// video_frames (bounded frame-explode fanout — wall must track video
// count, the decode being a narrow per-row kernel) and video_dedup
// (banded frame-pHash equi-join + both-sides vote + CC — candidate pairs
// grow with true near-dup density, never all-pairs over videos or
// frames, so 10x videos must cost ~10x wall, not ~100x). Fixtures are
// the gate's 4-container rotation (MJPEG AVI / JPEG MP4 / animated GIF /
// animated WebP) with UNIQUE pattern bases per pair — ids i and i+n/2
// carry the same content in different containers, everything else is
// distinct, so the group structure stays pairs at every scale (the
// honest shape: near-dup density constant, corpus growing). ~6 KB/video
// generated on executors; nothing is collected. Numbers land in PLANS.md
// ("scale smoke").
package graft.tools

import graft.functions.{ImageKernels, MediaKernels, Webp}
import org.apache.spark.sql.functions._

object MediaProbe {
  /** One video: 4 frames of pattern bases `base*16+k`, container by arm. */
  def fixture(base: Long, arm: Long): Array[Byte] = (arm % 4 + 4) % 4 match {
    case 0 => MediaKernels.encodeMjpegAvi(48, 48, 40000L,
      (0 until 4).map(k => GenMedia.videoFrameJpeg(base, k)))
    case 1 => MediaKernels.encodeJpegMp4(48, 48,
      (0 until 4).map(k => GenMedia.videoFrameJpeg(base, k)))
    case 2 => ImageKernels.encodeGifAnimated(48, 48,
      (0 until 4).map(k =>
        (0, 0, 48, 48, 0, -1, GenImages.pattern(base * 16 + k, 48, 48))))
    case _ => Webp.encodeAnimatedGray(48, 48,
      (0 until 4).map(k => GenImages.pattern(base * 16 + k, 48, 48)))
  }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val legFilter: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_LEGS").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def leg(name: String)(f: => Long): Unit = {
      if (legFilter.forall(_.contains(name))) {
        val t0 = System.nanoTime()
        val n = f
        println(f"SCALE-LEG media $name=${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n")
        spark.catalog.clearCache()
      } else println(s"SCALE-LEG media $name=SKIPPED")
    }
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    graft.expressions.GraftFunctions.register(spark)

    // ids i and i+n/2 share content (base = id % (n/2)) across containers
    def media(n: Long) = spark.range(n)
      .repartition(32)
      .mapPartitions(_.map { id =>
        (id, fixture(id % (n / 2), id % 4 + (if (id >= n / 2) 1 else 0)))
      })
      .toDF("media_id", "content")

    def frames(n: Long): Long = media(n)
      .select(posexplode(call_function("video_frames", col("content"), lit(4)))
        .as(Seq("fidx", "frame")))
      .select(call_function("image_phash", col("frame")).as("sig"))
      .filter(col("sig").isNotNull).count()

    leg("frames_10k")(frames(10000L))
    leg("frames_100k")(frames(100000L))

    def dedup(n: Long): Long = graft.functions.Images.videoDedupGroups(
      media(n), "media_id", "content", maxHamming = 3, maxFrames = 4,
      minMatches = 2).filter(col("n_group") > 1).count()

    leg("dedup_10k")(dedup(10000L))
    leg("dedup_100k")(dedup(100000L))

    spark.stop()
  }
}

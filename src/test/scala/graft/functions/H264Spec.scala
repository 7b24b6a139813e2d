package graft.functions

import graft.SparkSpec
import graft.tools.H264Fixtures

/** Native H.264 baseline I-frame decoder: every fixture must reproduce
  * the INDEPENDENT Python spec implementation's decode bit-exactly
  * (tools/h264_codec.py emits the expected plane hashes), plus the
  * VP8-style anchors — content pHash vs the unrelated JPEG path, and
  * totality over hostile bytes. */
class H264Spec extends SparkSpec {

  private def fnv(plane: Array[Int]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < plane.length) { h = (h ^ plane(i)) * 0x100000001b3L; i += 1 }
    h
  }

  test("all fixtures decode bit-exactly to the Python implementation's planes") {
    // 0-15: core matrix; 16-19: POC-0, POC-0 + pic_order_present,
    // right/bottom crop to odd-MB 44x36, left/top crop to 46x44
    for (i <- 0 until H264Fixtures.extCount) {
      val f = H264.decodeAnnexB(H264Fixtures.streamAt(i))
      assert(f != null, s"fixture $i failed to decode")
      assert(f.w == H264Fixtures.expW(i) && f.h == H264Fixtures.expH(i),
        s"fixture $i dims ${f.w}x${f.h}")
      assert(fnv(f.y) == H264Fixtures.expY(i), s"fixture $i: Y plane differs")
      assert(fnv(f.u) == H264Fixtures.expU(i), s"fixture $i: U plane differs")
      assert(fnv(f.v) == H264Fixtures.expV(i), s"fixture $i: V plane differs")
    }
  }

  test("decoded frames are perceptual near-dups of JPEG frames of the same pattern") {
    // the cross-codec anchor INDEPENDENT of the shared tables: the same
    // GenImages.pattern content through the unrelated JPEG path must
    // land within a few pHash bits; distinct patterns stay far apart
    def grayPng(f: H264.Frame): Array[Byte] =
      ImageKernels.encodePng(f.w, f.h, f.y)
    for (base <- 1 to 4; k <- 0 until 4) {
      val h264 = ImageKernels.phash(grayPng(H264.decodeAnnexB(
        H264Fixtures.stream(base, k))))
      val jpeg = ImageKernels.phash(graft.tools.GenMedia.videoFrameJpeg(base.toLong, k))
      val d = java.lang.Long.bitCount(h264 ^ jpeg)
      assert(d <= 3, s"base=$base k=$k: H264-vs-JPEG pHash distance $d > 3")
    }
    val a = ImageKernels.phash(grayPng(H264.decodeAnnexB(H264Fixtures.stream(1, 0))))
    val b = ImageKernels.phash(grayPng(H264.decodeAnnexB(H264Fixtures.stream(3, 2))))
    assert(java.lang.Long.bitCount(a ^ b) > 10, "cross-pattern pair too close")
  }

  test("avc1 MP4: container walk feeds the native decoder; snapshots match direct decode") {
    for (base <- 1 to 4) {
      val mp4 = graft.tools.GenMedia.h264VideoFixture(base - 1L)
      val got = MediaKernels.videoFrames(mp4, 16)
      assert(got.length == 4, s"base=$base: expected 4 frames, got ${got.length}")
      for (k <- 0 until 4) {
        val direct = H264.decodeAnnexB(H264Fixtures.stream(base, k))
        val png = ImageKernels.encodePng(direct.w, direct.h, direct.y)
        assert(java.util.Arrays.equals(got(k), png),
          s"base=$base k=$k: container frame differs from direct decode")
      }
      // sampling applies; video_meta reports profile+entropy WITH frames
      assert(MediaKernels.videoFrames(mp4, 2).length == 2)
      val m = MediaKernels.videoMetaRow(mp4)
      assert(m.getString(0) == "mp4" && m.getString(4) == "avc1/baseline-cavlc")
      assert(m.getInt(1) == 48 && m.getInt(2) == 48)
    }
  }

  test("cross-codec video_dedup: avc1 MP4 groups with MJPEG AVI of the same content") {
    import spark.implicits._
    // ids i and i+4 carry the SAME pattern content, avc1-MP4 vs MJPEG-AVI
    val media = (0L until 8L).map { i =>
      val base = i % 4
      if (i < 4) (i, graft.tools.GenMedia.h264VideoFixture(base))
      else (i, MediaKernels.encodeMjpegAvi(48, 48, 40000L,
        (0 until 4).map(k => graft.tools.GenMedia.videoFrameJpeg(base + 1, k))))
    }.toDF("media_id", "content")
    val groups = Images.videoDedupGroups(media, "media_id", "content",
      maxHamming = 3, maxFrames = 4, minMatches = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (i <- 0L until 4L)
      assert(groups(i) == (i, 2L) && groups(i + 4) == (i, 2L),
        s"pair $i: ${groups(i)} / ${groups(i + 4)} — avc1 and MJPEG did not group")
  }

  test("hostile SPS dimensions cannot force frame-context allocation (4KB bomb)") {
    // hand-write an SPS declaring 512x512 MBs (8192x8192 px, ~440 MB of
    // frame context) followed by a tiny "IDR": the allocation guard must
    // reject BEFORE building planes — and fast
    val bits = new scala.collection.mutable.ArrayBuffer[Int]
    def u(v: Int, n: Int): Unit = (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1))
    def ue(v: Int): Unit = {
      val x = v + 1
      val n = 32 - Integer.numberOfLeadingZeros(x)
      u(0, n - 1); u(x, n)
    }
    u(66, 8); u(0xC0, 8); u(10, 8) // profile/constraints/level
    ue(0); ue(0); ue(2); ue(1)     // sps_id, log2mfn, poc=2, refs
    u(0, 1)
    ue(511); ue(511)               // 512 x 512 MBs
    u(1, 1); u(0, 1); u(0, 1); u(0, 1)
    u(1, 1) // rbsp stop
    while (bits.length % 8 != 0) bits += 0
    val sps = bits.grouped(8).map(_.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    // a KNOWN-GOOD PPS lifted from a real fixture stream (raw NAL incl.
    // header) — so the rejection is the allocation guard, not PPS junk
    val fix = H264Fixtures.stream(1, 0)
    val ppsAt = (0 until fix.length - 5).find(i =>
      fix(i) == 0 && fix(i + 1) == 0 && fix(i + 2) == 0 && fix(i + 3) == 1 &&
        (fix(i + 4) & 0x1F) == 8).get
    val ppsEnd = (ppsAt + 4 until fix.length - 3).find(i =>
      fix(i) == 0 && fix(i + 1) == 0 && fix(i + 2) == 0 && fix(i + 3) == 1).get
    val ppsNal = java.util.Arrays.copyOfRange(fix, ppsAt + 4, ppsEnd)
    def nal(t: Int, p: Array[Byte]) =
      Array[Byte](0, 0, 0, 1, (0x60 | t).toByte) ++ p
    val bomb = nal(7, sps) ++ Array[Byte](0, 0, 0, 1) ++ ppsNal ++
      nal(5, Array[Byte](0x08.toByte, 0x80.toByte, 0, 0, 0, 0, 0, 0))
    assert(bomb.length < 128)
    val t0 = System.nanoTime()
    assert(H264.decodeAnnexB(bomb) == null)
    assert((System.nanoTime() - t0) / 1e6 < 200, "bomb rejection too slow")
    // same guard on the avcC path
    assert(H264.decodeAvcc(nal(7, sps).drop(4), ppsNal,
      Seq(Array[Byte](0x25, 0x08.toByte, 0x80.toByte, 0, 0))) == null)
  }

  test("hostile: truncations and corruption never throw; CABAC and junk are null") {
    for (i <- 0 until H264Fixtures.extCount) {
      val good = H264Fixtures.streamAt(i)
      for (cut <- Seq(0, 3, 7, 20, good.length / 3, good.length / 2, good.length - 1))
        H264.decodeAnnexB(java.util.Arrays.copyOf(good, cut)) // no throw
      val rnd = new scala.util.Random(11 + i)
      for (_ <- 0 until 200) {
        val c = good.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        H264.decodeAnnexB(c) // no throw on corruption
      }
    }
    assert(H264.decodeAnnexB("definitely not a NAL stream at all".getBytes) == null)
    assert(H264.decodeAnnexB(Array.emptyByteArray) == null)
    assert(H264.decodeAnnexB(null) == null)
    // CAVLC slice bits MISDECLARED as CABAC (entropy flag flipped in the
    // PPS) must come back null, never a garbage frame: the arithmetic
    // decode of VLC bits runs out of macroblock budget or trips an
    // invalid-syntax abort long before a full picture "succeeds"
    val cabac = H264Fixtures.stream(1, 0).clone()
    // pps starts 0,0,0,1,0x68, payload begins "101" (ue(0),ue(0)) then the
    // entropy bit — flipping bit 2 of the first payload byte sets it
    val idx = (0 until cabac.length - 5).find(j =>
      cabac(j) == 0 && cabac(j + 1) == 0 && cabac(j + 2) == 0 &&
        cabac(j + 3) == 1 && (cabac(j + 4) & 0x1F) == 8).get
    cabac(idx + 5) = (cabac(idx + 5) | 0x20).toByte
    assert(H264.decodeAnnexB(cabac) == null)
  }

  // ------------------------------------------------- CABAC entropy layer

  test("CABAC fixtures decode bit-exactly to the Python implementation's planes") {
    for (i <- 0 until H264Fixtures.cabacCount) {
      val f = H264.decodeAnnexB(H264Fixtures.cabacStreamAt(i))
      assert(f != null, s"cabac fixture $i failed to decode")
      assert(f.w == 48 && f.h == 48, s"cabac fixture $i dims ${f.w}x${f.h}")
      assert(fnv(f.y) == H264Fixtures.cabacExpY(i), s"cabac fixture $i: Y differs")
      assert(fnv(f.u) == H264Fixtures.cabacExpU(i), s"cabac fixture $i: U differs")
      assert(fnv(f.v) == H264Fixtures.cabacExpV(i), s"cabac fixture $i: V differs")
    }
  }

  test("CABAC decodes are perceptual dups of the CAVLC and JPEG paths (same content)") {
    // cross-ENTROPY anchor: fixture (base, k) carries the same pattern
    // content in both layers; and the cross-CODEC anchor independent of
    // every shared table: the unrelated JPEG path of the same pattern
    def ph(f: H264.Frame): Long =
      ImageKernels.phash(ImageKernels.encodePng(f.w, f.h, f.y))
    for (base <- 1 to 4; k <- 0 until 2) {
      val cb = ph(H264.decodeAnnexB(H264Fixtures.cabacStream(base, k)))
      val cv = ph(H264.decodeAnnexB(H264Fixtures.stream(base, k)))
      val jp = ImageKernels.phash(graft.tools.GenMedia.videoFrameJpeg(base.toLong, k))
      assert(java.lang.Long.bitCount(cb ^ cv) <= 3,
        s"base=$base k=$k: CABAC-vs-CAVLC pHash ${java.lang.Long.bitCount(cb ^ cv)} > 3")
      assert(java.lang.Long.bitCount(cb ^ jp) <= 3,
        s"base=$base k=$k: CABAC-vs-JPEG pHash ${java.lang.Long.bitCount(cb ^ jp)} > 3")
    }
    val a = ph(H264.decodeAnnexB(H264Fixtures.cabacStream(1, 0)))
    val b = ph(H264.decodeAnnexB(H264Fixtures.cabacStream(3, 1)))
    assert(java.lang.Long.bitCount(a ^ b) > 10, "cross-pattern CABAC pair too close")
  }

  test("avc1 MP4 with Main-CABAC samples: container walk decodes; codec column says so") {
    for (base <- 1 to 4) {
      val mp4 = graft.tools.GenMedia.h264CabacVideoFixture(base - 1L)
      val got = MediaKernels.videoFrames(mp4, 16)
      assert(got.length == 2, s"base=$base: expected 2 frames, got ${got.length}")
      for (k <- 0 until 2) {
        val direct = H264.decodeAnnexB(H264Fixtures.cabacStream(base, k))
        val png = ImageKernels.encodePng(direct.w, direct.h, direct.y)
        assert(java.util.Arrays.equals(got(k), png),
          s"base=$base k=$k: container frame differs from direct decode")
      }
      val m = MediaKernels.videoMetaRow(mp4)
      assert(m.getString(0) == "mp4" && m.getString(4) == "avc1/main-cabac")
      assert(m.getInt(1) == 48 && m.getInt(2) == 48)
    }
  }

  test("cross-codec video_dedup: Main-CABAC MP4 groups with MJPEG AVI of the same content") {
    import spark.implicits._
    // ids i and i+4 carry the SAME pattern content: avc1 Main-CABAC MP4
    // vs MJPEG-AVI (frames 0..1 of each base on both sides)
    val media = (0L until 8L).map { i =>
      val base = i % 4
      if (i < 4) (i, graft.tools.GenMedia.h264CabacVideoFixture(base))
      else (i, MediaKernels.encodeMjpegAvi(48, 48, 40000L,
        (0 until 2).map(k => graft.tools.GenMedia.videoFrameJpeg(base + 1, k))))
    }.toDF("media_id", "content")
    val groups = Images.videoDedupGroups(media, "media_id", "content",
      maxHamming = 3, maxFrames = 4, minMatches = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (i <- 0L until 4L)
      assert(groups(i) == (i, 2L) && groups(i + 4) == (i, 2L),
        s"pair $i: ${groups(i)} / ${groups(i + 4)} — CABAC MP4 and MJPEG did not group")
  }

  // --------------------------------------------------- fragmented MP4

  test("fragmented MP4 (moof/tfhd/trun): sample walk matches the classic container") {
    for (base <- 1 to 4) {
      // even vid: 4 baseline samples (size per-sample in the trun /
      // inherited from tfhd, alternating); must equal the classic
      // container's decodes frame for frame
      val frag = graft.tools.GenMedia.h264FragVideoFixture((base - 1) * 2L)
      val classic = graft.tools.GenMedia.h264VideoFixture(base - 1L)
      val a = MediaKernels.videoFrames(frag, 16)
      val b = MediaKernels.videoFrames(classic, 16)
      assert(a.length == 4, s"base=$base: frag walk found ${a.length} samples")
      for (k <- 0 until 4)
        assert(java.util.Arrays.equals(a(k), b(k)),
          s"base=$base k=$k: fragmented decode differs from classic")
      // sampling applies to fragment-resolved samples too
      assert(MediaKernels.videoFrames(frag, 2).length == 2)
      // odd vid: CABAC samples through the fragment walk
      val fragCabac = graft.tools.GenMedia.h264FragVideoFixture((base - 1) * 2L + 1)
      val c = MediaKernels.videoFrames(fragCabac, 16)
      assert(c.length == 2, s"base=$base: cabac frag walk found ${c.length}")
      for (k <- 0 until 2) {
        val direct = H264.decodeAnnexB(H264Fixtures.cabacStream(base, k))
        assert(java.util.Arrays.equals(c(k),
          ImageKernels.encodePng(direct.w, direct.h, direct.y)))
      }
      // moov-declared metadata still resolves (codec column included);
      // duration comes from mvex/mehd — the fixture's mvhd declares 0,
      // the authentic fragmented shape
      val m = MediaKernels.videoMetaRow(frag)
      assert(m.getString(0) == "mp4" && m.getString(4) == "avc1/baseline-cavlc")
      assert(m.getInt(1) == 48 && m.getInt(2) == 48)
      assert(m.getLong(3) == 4000L, s"mehd duration: ${m.getLong(3)}")
    }
  }

  test("cross-container video_dedup: fragmented MP4 groups with classic MP4") {
    import spark.implicits._
    val media = (0L until 8L).map { i =>
      val base = i % 4
      if (i < 4) (i, graft.tools.GenMedia.h264FragVideoFixture(base * 2)) // CAVLC arm of base+1
      else (i, graft.tools.GenMedia.h264VideoFixture(base))               // classic of base+1
    }.toDF("media_id", "content")
    val groups = Images.videoDedupGroups(media, "media_id", "content",
      maxHamming = 3, maxFrames = 4, minMatches = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (i <- 0L until 4L)
      assert(groups(i) == (i, 2L) && groups(i + 4) == (i, 2L),
        s"pair $i: fragmented and classic MP4 did not group")
  }

  test("Matroska H.264 (V_MPEG4/ISO/AVC): blocks feed the native decoder") {
    for (base <- 1 to 4) {
      // CAVLC arm: MKV frames must equal the classic MP4 container's
      val mkv = graft.tools.GenMedia.mkvAvcVideoFixture((base - 1) * 2L)
      val mp4 = graft.tools.GenMedia.h264VideoFixture(base - 1L)
      val a = MediaKernels.videoFrames(mkv, 16)
      val b = MediaKernels.videoFrames(mp4, 16)
      assert(a.length == 4, s"base=$base: MKV walk found ${a.length} blocks")
      for (k <- 0 until 4)
        assert(java.util.Arrays.equals(a(k), b(k)),
          s"base=$base k=$k: MKV decode differs from MP4")
      // CABAC arm through the Matroska path
      val mkvC = graft.tools.GenMedia.mkvAvcVideoFixture((base - 1) * 2L + 1)
      val c = MediaKernels.videoFrames(mkvC, 16)
      assert(c.length == 2)
      for (k <- 0 until 2) {
        val direct = H264.decodeAnnexB(H264Fixtures.cabacStream(base, k))
        assert(java.util.Arrays.equals(c(k),
          ImageKernels.encodePng(direct.w, direct.h, direct.y)))
      }
      // codec column surfaces the Matroska CodecID verbatim
      val m = MediaKernels.videoMetaRow(mkv)
      assert(m.getString(0) == "webm" && m.getString(4) == "V_MPEG4/ISO/AVC")
      assert(m.getInt(1) == 48 && m.getInt(2) == 48)
    }
  }

  test("cross-container video_dedup: MKV H.264 groups with fragmented MP4") {
    import spark.implicits._
    val media = (0L until 8L).map { i =>
      val base = i % 4
      if (i < 4) (i, graft.tools.GenMedia.mkvAvcVideoFixture(base * 2))
      else (i, graft.tools.GenMedia.h264FragVideoFixture(base * 2))
    }.toDF("media_id", "content")
    val groups = Images.videoDedupGroups(media, "media_id", "content",
      maxHamming = 3, maxFrames = 4, minMatches = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (i <- 0L until 4L)
      assert(groups(i) == (i, 2L) && groups(i + 4) == (i, 2L),
        s"pair $i: MKV and fragmented MP4 did not group")
  }

  test("MPEG-TS (HLS segment shape): PAT/PMT/PES walk feeds the native decoder") {
    for (base <- 1 to 4) {
      val ts = graft.tools.GenMedia.tsAvcVideoFixture((base - 1) * 2L)
      val mp4 = graft.tools.GenMedia.h264VideoFixture(base - 1L)
      val a = MediaKernels.videoFrames(ts, 16)
      val b = MediaKernels.videoFrames(mp4, 16)
      assert(a.length == 4, s"base=$base: TS walk found ${a.length} pictures")
      for (k <- 0 until 4)
        assert(java.util.Arrays.equals(a(k), b(k)),
          s"base=$base k=$k: TS decode differs from MP4")
      assert(MediaKernels.videoFrames(ts, 2).length == 2) // sample-then-decode
      // CABAC arm through the TS path
      val tsC = graft.tools.GenMedia.tsAvcVideoFixture((base - 1) * 2L + 1)
      assert(MediaKernels.videoFrames(tsC, 16).length == 2)
      // meta: dims from the SPS (the container declares none), duration
      // from the PES PTS span, codec from the PMT stream_type
      val m = MediaKernels.videoMetaRow(ts)
      assert(m.getString(0) == "mpegts" && m.getString(4) == "h264")
      assert(m.getInt(1) == 48 && m.getInt(2) == 48)
      assert(m.getLong(3) == 3L * 9000 / 90, s"PTS-span duration: ${m.getLong(3)}")
    }
    // hostile: truncation/corruption never throw
    val good = graft.tools.GenMedia.tsAvcVideoFixture(0)
    for (cut <- Seq(0, 100, 188, 189, 376, good.length / 2, good.length - 7))
      MediaKernels.videoFrames(java.util.Arrays.copyOf(good, cut), 8)
    val rnd = new scala.util.Random(71)
    for (_ <- 0 until 150) {
      val c = good.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      MediaKernels.videoFrames(c, 8)
    }
  }

  test("cross-container video_dedup: MPEG-TS groups with AVI-held H.264") {
    import spark.implicits._
    val media = (0L until 8L).map { i =>
      val base = i % 4
      if (i < 4) (i, graft.tools.GenMedia.tsAvcVideoFixture(base * 2))
      else (i, graft.tools.GenMedia.aviAvcVideoFixture(base * 2))
    }.toDF("media_id", "content")
    val groups = Images.videoDedupGroups(media, "media_id", "content",
      maxHamming = 3, maxFrames = 4, minMatches = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (i <- 0L until 4L)
      assert(groups(i) == (i, 2L) && groups(i + 4) == (i, 2L),
        s"pair $i: TS and AVI H.264 did not group")
  }

  test("raw Annex-B .h264 elementary-stream files decode through videoFrames") {
    for (base <- 1 to 4) {
      // a multi-picture raw dump = the 4 fixture streams concatenated
      val es = (0 until 4).map(k => H264Fixtures.stream(base, k))
        .reduce(_ ++ _)
      val mp4 = graft.tools.GenMedia.h264VideoFixture(base - 1L)
      val a = MediaKernels.videoFrames(es, 16)
      val b = MediaKernels.videoFrames(mp4, 16)
      assert(a.length == 4, s"base=$base: ES walk found ${a.length} pictures")
      for (k <- 0 until 4)
        assert(java.util.Arrays.equals(a(k), b(k)),
          s"base=$base k=$k: raw-ES decode differs from MP4")
      assert(MediaKernels.videoFrames(es, 2).length == 2) // sample-then-decode
      // CABAC raw dumps too
      val esC = (0 until 2).map(k => H264Fixtures.cabacStream(base, k)).reduce(_ ++ _)
      assert(MediaKernels.videoFrames(esC, 16).length == 2)
      // meta: dims from the SPS; an elementary stream carries no timing
      val m = MediaKernels.videoMetaRow(es)
      assert(m.getString(0) == "h264-es" && m.getString(4) == "h264")
      assert(m.getInt(1) == 48 && m.getInt(2) == 48 && m.getLong(3) == 0L)
    }
    // strictness: arbitrary zero-prefixed binaries must NOT detour here
    assert(MediaKernels.videoFrames(Array[Byte](0, 0, 1, 0x41, 9, 9, 9, 9), 4).isEmpty)
    assert(MediaKernels.videoMetaRow(Array[Byte](0, 0, 0, 1, 0x67, 0, 0, 0)).isNullAt(0))
  }

  test("AVI-held H.264 (H264 fourcc, Annex-B chunks): decodes and samples") {
    for (base <- 1 to 4) {
      val avi = graft.tools.GenMedia.aviAvcVideoFixture((base - 1) * 2L)
      val mp4 = graft.tools.GenMedia.h264VideoFixture(base - 1L)
      val a = MediaKernels.videoFrames(avi, 16)
      val b = MediaKernels.videoFrames(mp4, 16)
      assert(a.length == 4, s"base=$base: AVI walk found ${a.length} chunks")
      for (k <- 0 until 4)
        assert(java.util.Arrays.equals(a(k), b(k)),
          s"base=$base k=$k: AVI decode differs from MP4")
      // sample-then-decode: only the selected chunks decode
      assert(MediaKernels.videoFrames(avi, 2).length == 2)
      // CABAC arm
      val aviC = graft.tools.GenMedia.aviAvcVideoFixture((base - 1) * 2L + 1)
      assert(MediaKernels.videoFrames(aviC, 16).length == 2)
      // codec column reads the strh fourcc
      val m = MediaKernels.videoMetaRow(avi)
      assert(m.getString(0) == "avi" && m.getString(4) == "H264")
    }
    // hostile: truncation/corruption never throw
    val good = graft.tools.GenMedia.aviAvcVideoFixture(0)
    for (cut <- Seq(0, 11, 40, good.length / 2, good.length - 2))
      MediaKernels.videoFrames(java.util.Arrays.copyOf(good, cut), 8)
    val rnd = new scala.util.Random(67)
    for (_ <- 0 until 150) {
      val c = good.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      MediaKernels.videoFrames(c, 8)
    }
  }

  test("hostile MKV-AVC: truncation/corruption never throw") {
    for (vid <- 0L until 4L) {
      val good = graft.tools.GenMedia.mkvAvcVideoFixture(vid)
      for (cut <- Seq(0, 5, 30, good.length / 3, good.length - 2))
        MediaKernels.videoFrames(java.util.Arrays.copyOf(good, cut), 8)
      val rnd = new scala.util.Random(51 + vid.toInt)
      for (_ <- 0 until 150) {
        val c = good.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        MediaKernels.videoFrames(c, 8) // no throw on corruption
      }
    }
  }

  test("hostile fragmented MP4: truncation/corruption never throw, bounded walks") {
    for (vid <- 0L until 4L) {
      val good = graft.tools.GenMedia.h264FragVideoFixture(vid)
      for (cut <- Seq(0, 8, 40, good.length / 4, good.length / 2, good.length - 3))
        MediaKernels.videoFrames(java.util.Arrays.copyOf(good, cut), 8) // no throw
      val rnd = new scala.util.Random(37 + vid.toInt)
      for (_ <- 0 until 150) {
        val c = good.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        MediaKernels.videoFrames(c, 8) // no throw on corruption
      }
    }
    // a trun declaring 2^31-ish samples must not allocate: the per-trun
    // cap and the global loc cap bound the walk
    val bomb = graft.tools.GenMedia.h264FragVideoFixture(0).clone()
    // locate the first trun and patch its sample_count to 0x7FFFFFFF
    val at = (0 until bomb.length - 8).find(j =>
      bomb(j + 4) == 't' && bomb(j + 5) == 'r' && bomb(j + 6) == 'u' &&
        bomb(j + 7) == 'n').get
    bomb(at + 12) = 0x7F.toByte; bomb(at + 13) = 0xFF.toByte
    bomb(at + 14) = 0xFF.toByte; bomb(at + 15) = 0xFF.toByte
    val t0 = System.nanoTime()
    MediaKernels.videoFrames(bomb, 8) // no throw, no runaway
    assert((System.nanoTime() - t0) / 1e6 < 500, "trun bomb walk too slow")
  }

  test("hostile CABAC: truncations and corruption never throw, bombs stay null") {
    for (i <- 0 until H264Fixtures.cabacCount) {
      val good = H264Fixtures.cabacStreamAt(i)
      for (cut <- Seq(0, 3, 7, 20, good.length / 3, good.length / 2, good.length - 1))
        H264.decodeAnnexB(java.util.Arrays.copyOf(good, cut)) // no throw
      val rnd = new scala.util.Random(23 + i)
      for (_ <- 0 until 200) {
        val c = good.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        val f = H264.decodeAnnexB(c) // no throw on corruption
        if (f != null) // a survivable flip still yields sane dimensions
          assert(f.w == 48 && f.h == 48)
      }
    }
    // CABAC slice bits misdeclared as CAVLC: null, not garbage
    val cavlc = H264Fixtures.cabacStream(1, 0).clone()
    val idx = (0 until cavlc.length - 5).find(j =>
      cavlc(j) == 0 && cavlc(j + 1) == 0 && cavlc(j + 2) == 0 &&
        cavlc(j + 3) == 1 && (cavlc(j + 4) & 0x1F) == 8).get
    cavlc(idx + 5) = (cavlc(idx + 5) & ~0x20).toByte
    assert(H264.decodeAnnexB(cavlc) == null)
  }
}

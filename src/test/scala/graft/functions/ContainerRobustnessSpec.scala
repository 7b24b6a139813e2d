package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.H264Fixtures

/** Container-walk robustness cases the happy-path fixtures don't reach:
  * multiplexed Ogg (audio BOS not first), multi-packet PSI sections in
  * MPEG-TS, mid-stream SPS/PPS changes in elementary streams, and
  * multi-track fragmented MP4 where the video traf is not the moof's
  * first traf (clause-8.8.7 default base chaining). */
class ContainerRobustnessSpec extends AnyFunSuite {

  private def pngDims(png: Array[Byte]): (Int, Int) = {
    val m = ImageKernels.imageMeta(png)
    assert(m != null && m._1 == "png")
    (m._2, m._3)
  }

  test("Ogg: audio BOS on a later page identifies (multiplexed / skeleton-bearing)") {
    // page 0: an unrecognized BOS (a Theora-like video stream), page 1:
    // the Vorbis BOS, then Vorbis data pages carry the granules
    def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xFF).toByte)
    val theoraBos = Array[Byte](0x80.toByte) ++
      "theora".getBytes("ISO-8859-1") ++ new Array[Byte](40)
    val vorbisIdent = Array[Byte](1) ++ "vorbis".getBytes("ISO-8859-1") ++
      le(0, 4) ++ Array(2.toByte) ++ le(44100L, 4) ++ le(0, 12) ++
      Array(0xB8.toByte, 0x01.toByte)
    val mux =
      Ogg.page(111L, 0, -1L, 2, theoraBos) ++
        Ogg.page(222L, 0, -1L, 2, vorbisIdent) ++
        Ogg.page(111L, 1, 999999L, 0, Array[Byte](0)) ++ // video granules must NOT count
        Ogg.page(222L, 1, 88200L, 4, Array[Byte](0))
    val r = MediaKernels.audioMetaRow(mux)
    assert(r.getString(0) == "ogg" && r.getString(6) == "vorbis")
    assert(r.getInt(1) == 2 && r.getLong(2) == 44100L)
    assert(r.getLong(4) == 88200L && r.getLong(5) == 2000L)
    // all-unrecognized BOS pages stay null (no codec claimed)
    val noAudio = Ogg.page(111L, 0, -1L, 2, theoraBos) ++
      Ogg.page(111L, 1, 4242L, 4, Array[Byte](0))
    assert(Ogg.audioInfo(noAudio) == null)
  }

  test("MPEG-TS: a PMT section spanning multiple packets reassembles") {
    val streams = (0 until 2).map(k => H264Fixtures.stream(1, k))
    val ts = MpegTs.encodeH264Ts(streams, pmtPad = 300)
    val (m, codec) = MpegTs.tsMeta(ts)
    assert(codec == "h264" && m(0) == 48 && m(1) == 48)
    val frames = MpegTs.tsFrames(ts, 8)
    assert(frames != null && frames.length == 2)
    frames.foreach(f => assert(pngDims(f) == ((48, 48))))
    // audio PMT reassembly rides the same path: single-packet control
    val tsControl = MpegTs.encodeH264Ts(streams)
    assert(MpegTs.tsFrames(tsControl, 8).length == 2)
  }

  test("MPEG-TS: back-to-back section packing (tail shares a PUSI=1 packet) reassembles") {
    // legal clause-2.4.4.2 mux shape: the PMT's tail rides in a packet
    // that ALSO starts the next section (PUSI=1, pointer_field > 0) —
    // a reader that only appends PUSI=0 continuations never completes
    // the section and silently drops the program map
    val streams = (0 until 2).map(k => H264Fixtures.stream(1, k))
    val ts = MpegTs.encodeH264Ts(streams, pmtPad = 250, backToBack = true)
    val (m, codec) = MpegTs.tsMeta(ts)
    assert(codec == "h264" && m(0) == 48 && m(1) == 48)
    val frames = MpegTs.tsFrames(ts, 8)
    assert(frames != null && frames.length == 2)
    frames.foreach(f => assert(pngDims(f) == ((48, 48))))
  }

  test("Ogg-Speex: out-of-range le32 rate/channels leave the stream unidentified") {
    // rate/channels are raw le32 fields — a hostile BOS page must not
    // surface negative or multi-billion values into audio_meta
    def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xFF).toByte)
    def spx(rate: Long, ch: Long): Array[Byte] = {
      val ident = "Speex   ".getBytes("ISO-8859-1") ++ new Array[Byte](28) ++
        le(rate, 4) ++ le(0, 8) ++ le(ch, 4) ++ new Array[Byte](28)
      Ogg.page(777L, 0, -1L, 2, ident) ++
        Ogg.page(777L, 1, 16000L, 4, Array[Byte](0))
    }
    for ((r, c) <- Seq((0xFFFFFFFFL, 1L), (0L, 1L), (3000000000L, 2L),
                       (8000L, 0L), (8000L, 0x80000000L), (8000L, 4096L)))
      assert(Ogg.audioInfo(spx(r, c)) == null, s"rate=$r ch=$c must not identify")
    // the in-range shape still identifies (control)
    val ok = Ogg.audioInfo(spx(8000L, 1L))
    assert(ok != null && ok._2 == "speex" && ok._1(0) == 1L && ok._1(1) == 8000L)
  }

  test("MPEG-TS: mid-stream SPS/PPS change decodes each IDR with its active sets") {
    // stream 0 is 48x48; fixture 18 is the 44x36 right/bottom-crop SPS —
    // concatenated in one program, the first picture must decode with
    // the FIRST parameter sets, not whichever came last
    val ts = MpegTs.encodeH264Ts(Seq(H264Fixtures.stream(1, 0), H264Fixtures.streamAt(18)))
    val frames = MpegTs.tsFrames(ts, 8)
    assert(frames != null && frames.length == 2)
    assert(pngDims(frames(0)) == ((48, 48)))
    assert(pngDims(frames(1)) == ((44, 36)))
  }

  test("AVI: mid-stream SPS/PPS change decodes each chunk with its active sets") {
    val avi = MediaKernels.encodeMjpegAvi(48, 48, 40000L,
      Seq(H264Fixtures.stream(1, 0), H264Fixtures.streamAt(18)), fourcc = "H264")
    val frames = MediaKernels.videoFrames(avi, 8)
    assert(frames != null && frames.length == 2)
    assert(pngDims(frames(0)) == ((48, 48)))
    assert(pngDims(frames(1)) == ((44, 36)))
  }

  test("Ogg-Theora video_meta and Speex audio_meta surface dims/codec (decode non-goals)") {
    val ogv = Ogg.encodeOggTheora(320, 240, 30L, 1L, 6, 45L)
    val m = MediaKernels.videoMetaRow(ogv)
    assert(m.getString(0) == "ogg" && m.getString(4) == "theora")
    assert(m.getInt(1) == 320 && m.getInt(2) == 240 && m.getLong(3) == 1500L)
    // a Speex BOS identifies with rate + channels (metadata only)
    def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xFF).toByte)
    val speexIdent = "Speex   ".getBytes("ISO-8859-1") ++ new Array[Byte](28) ++
      le(8000L, 4) ++ le(0, 8) ++ le(1L, 4) ++ new Array[Byte](28)
    val spx = Ogg.page(777L, 0, -1L, 2, speexIdent) ++
      Ogg.page(777L, 1, 16000L, 4, Array[Byte](0))
    val a = MediaKernels.audioMetaRow(spx)
    assert(a.getString(0) == "ogg" && a.getString(6) == "speex")
    assert(a.getInt(1) == 1 && a.getLong(2) == 8000L && a.getLong(5) == 2000L)
  }

  test("AVIF/HEIC: primary-item ispe wins over the thumbnail's; codec box names the format") {
    val avif = ImageKernels.imageMeta(ImageKernels.encodeHeifHeader("av01", 320, 240, 80, 60))
    assert(avif == (("avif", 320, 240, 0)))
    val heic = ImageKernels.imageMeta(ImageKernels.encodeHeifHeader("hvc1", 112, 80, 28, 20))
    assert(heic == (("heic", 112, 80, 0)))
    // a plain MP4 VIDEO (isom brand) must NOT be claimed by the image face
    val mp4 = MediaKernels.encodeAvc1Mp4(48, 48,
      Seq(H264Fixtures.stream(1, 0)))
    assert(ImageKernels.imageMeta(mp4) == null)
    // truncated/hostile shells return null, never throw
    val good = ImageKernels.encodeHeifHeader("av01", 320, 240, 80, 60)
    (1 until good.length by 7).foreach { n =>
      ImageKernels.imageMeta(java.util.Arrays.copyOf(good, n))
    }
  }

  test("fMP4: a video traf that is not the moof's first traf anchors at the previous traf's data end") {
    val streams = (0 until 4).map(k => H264Fixtures.stream(1, k))
    val multi = MediaKernels.encodeAvc1FragMp4(48, 48, streams, leadJunk = 37)
    val frames = MediaKernels.videoFrames(multi, 8)
    assert(frames != null && frames.length == 4)
    frames.foreach(f => assert(pngDims(f) == ((48, 48))))
    // pins the SAME decode as the single-track fragmented shape
    val single = MediaKernels.encodeAvc1FragMp4(48, 48, streams)
    val sf = MediaKernels.videoFrames(single, 8)
    assert(sf.length == 4)
    assert(frames.map(_.toSeq).toSeq == sf.map(_.toSeq).toSeq)
  }
}

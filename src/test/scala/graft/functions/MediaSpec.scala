package graft.functions

import graft.SparkSpec
import graft.tools.{GenImages, GenMedia}
import org.apache.spark.sql.functions._

/** WAV/MP4 media tier: header parses, exact PCM decode, integer feature
  * laws, chunk-skip robustness, YAML ops, SQL registry. */
class MediaSpec extends SparkSpec {

  test("WAV meta parses rate/bits/samples and computes duration") {
    val wav = MediaKernels.encodeWav(16000, Array.tabulate(800)(i => i % 100))
    val row = MediaKernels.audioMetaRow(wav)
    assert(row.getString(0) == "wav")
    assert(row.getInt(1) == 1 && row.getLong(2) == 16000L && row.getInt(3) == 16)
    assert(row.getLong(4) == 800L && row.getLong(5) == 50L) // 800/16000 s = 50ms
    assert(MediaKernels.audioMetaRow("RIFFjunk".getBytes).isNullAt(0))
  }

  test("PCM16 decode round-trips the full signed range exactly") {
    val samples = Array(-32768, -1, 0, 1, 32767, 12345, -12345)
    val back = MediaKernels.wavSamples(MediaKernels.encodeWav(8000, samples))
    assert(back.toSeq == samples.toSeq)
  }

  test("audio features match hand computation and skip unknown chunks") {
    val samples = Array(3, -4, 0, 5, -2) // zc: 3→-4, -4→0, 5→-2 = 3 crossings
    val wav = MediaKernels.encodeWav(8000, samples)
    val f = MediaKernels.audioFeaturesRow(wav)
    assert(f.getLong(0) == 5L)
    assert(f.getLong(1) == (9 + 16 + 0 + 25 + 4).toLong)
    assert(f.getLong(2) == 3L)
    assert(f.getLong(3) == 5L)
    // splice a LIST chunk between fmt and data — parser must walk past it
    val withList = {
      val head = java.util.Arrays.copyOfRange(wav, 0, 36)
      val tail = java.util.Arrays.copyOfRange(wav, 36, wav.length)
      val list = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
      head ++ list ++ tail
    }
    val f2 = MediaKernels.audioFeaturesRow(withList)
    assert(f2 != null && f2.getLong(1) == f.getLong(1))
    assert(MediaKernels.audioFeaturesRow("not audio".getBytes) == null)
  }

  test("MP4 meta walks moov/trak for mvhd duration and tkhd dimensions") {
    val mp4 = MediaKernels.encodeMp4Header(640, 360, 12345L)
    val row = MediaKernels.videoMetaRow(mp4)
    assert(row.getString(0) == "mp4")
    assert(row.getInt(1) == 640 && row.getInt(2) == 360 && row.getLong(3) == 12345L)
    assert(MediaKernels.videoMetaRow("plainly not a video".getBytes).isNullAt(0))
    // truncated box tree must fail cleanly to "unrecognized", never throw
    assert(MediaKernels.videoMetaRow(
      java.util.Arrays.copyOfRange(mp4, 0, 30)).isNullAt(0))
  }

  test("FLAC STREAMINFO and MP3 frame-walk metadata parse exactly") {
    val flac = MediaKernels.encodeFlacHeader(2, 44100L, 24, 441000L)
    val fr = MediaKernels.audioMetaRow(flac)
    assert(fr.getString(0) == "flac" && fr.getInt(1) == 2 &&
      fr.getLong(2) == 44100L && fr.getInt(3) == 24 && fr.getLong(4) == 441000L)
    assert(fr.getLong(5) == 10000L) // 441000/44100 s
    val mp3 = MediaKernels.encodeMp3Header(48000L, 10)
    val mr = MediaKernels.audioMetaRow(mp3)
    assert(mr.getString(0) == "mp3" && mr.getInt(1) == 2 &&
      mr.getLong(2) == 48000L && mr.getLong(4) == 10L * 1152L)
    // a leading ID3v2 tag must be skipped (syncsafe size)
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 5) ++ new Array[Byte](5)
    val tagged = MediaKernels.audioMetaRow(id3 ++ mp3)
    assert(tagged.getString(0) == "mp3" && tagged.getLong(4) == 10L * 1152L)
    // LSF variants: MPEG-2 (half rates) and MPEG-2.5 (quarter rates)
    // carry 576 samples per frame over 72*br/sr-byte frames
    for (sr <- Seq(22050L, 16000L, 11025L, 8000L)) {
      val lsf = MediaKernels.audioMetaRow(MediaKernels.encodeMp3Header(sr, 7))
      assert(lsf.getString(0) == "mp3" && lsf.getLong(2) == sr &&
        lsf.getLong(4) == 7L * 576L, s"LSF rate $sr")
      assert(lsf.getLong(5) == 7L * 576L * 1000L / sr, s"LSF duration $sr")
    }
  }

  test("Matroska subtitle tracks feed doc_text (S_TEXT/UTF8 + ASS dialogue)") {
    val mkv = Webm.encodeMkvSubtitles(Seq("Hello there", "General text"))
    assert(DocKernels.docText(mkv, "auto") == "Hello there\nGeneral text")
    assert(DocKernels.docText(mkv, "mkv") == "Hello there\nGeneral text")
    // ASS: the cue rides the 9th comma-separated dialogue field
    val ass = Webm.encodeMkvSubtitles(
      Seq("0,0,Default,,0,0,0,,Actual dialogue text"), codecId = "S_TEXT/ASS")
    assert(DocKernels.docText(ass, "auto") == "Actual dialogue text")
    // a video-only Matroska has no subtitle track -> null, not empty
    val video = graft.tools.GenMedia.mkvAvcVideoFixture(0)
    assert(DocKernels.docText(video, "mkv") == null)
    // hostile: truncation/corruption never throw
    for (cut <- Seq(0, 4, 9, mkv.length / 2, mkv.length - 2))
      DocKernels.docText(java.util.Arrays.copyOf(mkv, cut), "auto")
    val rnd = new scala.util.Random(91)
    for (_ <- 0 until 100) {
      val c = mkv.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      DocKernels.docText(c, "auto")
    }
  }

  test("stream-container audio: TS elementary streams and Ogg headers parse exactly") {
    // MP3 inside MPEG-TS: the ES walk reuses the Layer-III frame walk
    val tsMp3 = MpegTs.encodeAudioTs(0x03,
      Seq(MediaKernels.encodeMp3Header(44100L, 6)))
    val tm = MediaKernels.audioMetaRow(tsMp3)
    assert(tm.getString(0) == "mpegts" && tm.getString(6) == "mp3")
    assert(tm.getInt(1) == 2 && tm.getLong(2) == 44100L && tm.getLong(4) == 6L * 1152L)
    // ADTS AAC inside MPEG-TS
    val tsAac = MpegTs.encodeAudioTs(0x0F,
      Seq(MediaKernels.encodeAdtsHeader(48000L, 2, 9)))
    val ta = MediaKernels.audioMetaRow(tsAac)
    assert(ta.getString(0) == "mpegts" && ta.getString(6) == "aac")
    assert(ta.getInt(1) == 2 && ta.getLong(2) == 48000L && ta.getLong(4) == 9L * 1024L)
    // Ogg Vorbis: identification header + final-granule duration
    val ogv = Ogg.encodeOggAudio("vorbis", 2, 44100L, 88200L)
    val ov = MediaKernels.audioMetaRow(ogv)
    assert(ov.getString(0) == "ogg" && ov.getString(6) == "vorbis")
    assert(ov.getInt(1) == 2 && ov.getLong(2) == 44100L &&
      ov.getLong(4) == 88200L && ov.getLong(5) == 2000L)
    // Ogg Opus: granules live in the 48 kHz domain
    val ogo = Ogg.encodeOggAudio("opus", 1, 48000L, 144000L)
    val oo = MediaKernels.audioMetaRow(ogo)
    assert(oo.getString(0) == "ogg" && oo.getString(6) == "opus")
    assert(oo.getInt(1) == 1 && oo.getLong(5) == 3000L)
    // raw ADTS .aac files (ADTS is its own file format, not only a TS
    // payload): sync pattern disjoint from MP3's (layer bits 00)
    val rawAac = MediaKernels.encodeAdtsHeader(44100L, 2, 5)
    val ra = MediaKernels.audioMetaRow(rawAac)
    assert(ra.getString(0) == "aac" && ra.getString(6) == "aac")
    assert(ra.getInt(1) == 2 && ra.getLong(2) == 44100L && ra.getLong(4) == 5L * 1024L)
    // Ogg-FLAC is pure carriage: the same recording yields IDENTICAL
    // PCM (and therefore fingerprints) from WAV, native FLAC and
    // Ogg-FLAC; audio_meta reports the exact STREAMINFO fields
    val samples = Array.tabulate(256)(i => ((i * 37) % 4001) - 2000)
    val native = Flac.encodeMono16(16000, samples)
    val oggFlac = Ogg.encodeOggFlac(native, 256L)
    val wav = MediaKernels.encodeWav(16000, samples)
    assert(java.util.Arrays.equals(MediaKernels.pcmSamples(oggFlac),
      MediaKernels.pcmSamples(native)))
    assert(java.util.Arrays.equals(MediaKernels.pcmSamples(oggFlac),
      MediaKernels.pcmSamples(wav)))
    val of = MediaKernels.audioMetaRow(oggFlac)
    assert(of.getString(0) == "ogg" && of.getString(6) == "flac")
    assert(of.getInt(1) == 1 && of.getLong(2) == 16000L &&
      of.getInt(3) == 16 && of.getLong(4) == 256L)
    // hostile: truncation and corruption never throw
    for (good <- Seq(tsMp3, tsAac, ogv, ogo, oggFlac)) {
      for (cut <- Seq(0, 5, 27, 100, good.length / 2, good.length - 3))
        MediaKernels.audioMetaRow(java.util.Arrays.copyOf(good, cut))
      val rnd = new scala.util.Random(83)
      for (_ <- 0 until 100) {
        val c = good.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        MediaKernels.audioMetaRow(c)
      }
    }
  }

  test("AVI avih metadata: dims and usPerFrame x frames duration") {
    val avi = MediaKernels.encodeAviHeader(720, 480, 33333L, 300L)
    val r = MediaKernels.videoMetaRow(avi)
    assert(r.getString(0) == "avi" && r.getInt(1) == 720 && r.getInt(2) == 480)
    assert(r.getLong(3) == 33333L * 300L / 1000L)
  }

  test("video_meta codec column makes unsupported-codec zero-frame drops diagnosable") {
    // supported codecs report their identifier AND yield frames
    val frames = (0 until 4).map(k => GenMedia.videoFrameJpeg(3L, k))
    val mjpg = MediaKernels.encodeMjpegAvi(48, 48, 40000L, frames)
    assert(MediaKernels.videoMetaRow(mjpg).getString(4) == "MJPG")
    assert(MediaKernels.videoFrames(mjpg, 8).nonEmpty)
    val jmp4 = MediaKernels.encodeJpegMp4(48, 48, frames)
    assert(MediaKernels.videoMetaRow(jmp4).getString(4) == "jpeg")
    assert(MediaKernels.videoFrames(jmp4, 8).nonEmpty)
    // the dominant-crawl shapes that yield ZERO frames must say WHY:
    // an avc1 MP4, an XVID AVI, a VP9 WebM, an AV1 IVF
    val avc1 = MediaKernels.encodeMp4Header(640, 360, 5000L, codec = "avc1")
    val avc1Row = MediaKernels.videoMetaRow(avc1)
    assert(avc1Row.getString(0) == "mp4" && avc1Row.getString(4) == "avc1")
    assert(MediaKernels.videoFrames(avc1, 8).isEmpty)
    val xvid = MediaKernels.encodeAviHeader(720, 480, 40000L, 25L, codec = "XVID")
    assert(MediaKernels.videoMetaRow(xvid).getString(4) == "XVID")
    assert(MediaKernels.videoFrames(xvid, 8).isEmpty)
    val vp8 = (0 until 2).map(k => graft.tools.Vp8VideoFixtures.frame(1, k))
    val vp9 = Webm.encodeWebm(48, 48, vp8).clone()
    locally { // V_VP8 -> V_VP9 CodecID byte flip (same length)
      val needle = "V_VP8".getBytes("US-ASCII")
      val i = (0 until vp9.length - 5).find(i =>
        needle.indices.forall(j => vp9(i + j) == needle(j))).get
      vp9(i + 4) = '9'
    }
    val vp9Row = MediaKernels.videoMetaRow(vp9)
    assert(vp9Row.getString(0) == "webm" && vp9Row.getString(4) == "V_VP9")
    assert(MediaKernels.videoFrames(vp9, 8).isEmpty)
    val av01 = Webm.encodeIvf(48, 48, vp8).clone()
    av01(8) = 'A'; av01(9) = 'V'; av01(10) = '0'; av01(11) = '1'
    val av01Row = MediaKernels.videoMetaRow(av01)
    assert(av01Row.getString(0) == "ivf" && av01Row.getString(4) == "AV01")
    assert(MediaKernels.videoFrames(av01, 8).isEmpty)
    // supported VP8 containers report V_VP8 / VP80
    assert(MediaKernels.videoMetaRow(Webm.encodeWebm(48, 48, vp8)).getString(4) == "V_VP8")
    assert(MediaKernels.videoMetaRow(Webm.encodeIvf(48, 48, vp8)).getString(4) == "VP80")
  }

  test("avc1 codec column carries profile+entropy; CABAC files say why they drop frames") {
    // decodable native baseline stream: profile+entropy suffix, frames flow
    val ok = GenMedia.h264VideoFixture(2L)
    assert(MediaKernels.videoMetaRow(ok).getString(4) == "avc1/baseline-cavlc")
    assert(MediaKernels.videoFrames(ok, 8).length == 4)
    // the x264-default shape (High-profile CABAC declared in avcC):
    // ZERO frames, and the codec column says exactly why
    val cabac = GenMedia.h264UndecodableFixture(3L)
    assert(MediaKernels.videoMetaRow(cabac).getString(4) == "avc1/high-cabac")
    assert(MediaKernels.videoFrames(cabac, 8).isEmpty)
    // header-only declaration (no avcC record): bare fourcc, no guess
    val bare = MediaKernels.encodeMp4Header(640, 360, 5000L, codec = "avc1")
    assert(MediaKernels.videoMetaRow(bare).getString(4) == "avc1")
  }

  test("jpeg MP4: invalid samples don't occupy even-spaced selection slots") {
    // 4 decodable JPEGs interleaved with 2 junk samples: asking for 4
    // frames must return ALL 4 valid ones (non-SOI samples are dropped
    // BEFORE the even-spaced selection, not after)
    val good = (0 until 4).map(k => GenMedia.videoFrameJpeg(5L, k))
    val junk = Array.fill(64)(0x41.toByte)
    val mixed = Seq(good(0), junk, good(1), junk, good(2), good(3))
    val mp4 = MediaKernels.encodeJpegMp4(48, 48, mixed)
    val got = MediaKernels.videoFrames(mp4, 4)
    assert(got.length == 4, s"expected all 4 valid frames, got ${got.length}")
    assert(got.zip(good).forall { case (a, b) => java.util.Arrays.equals(a, b) })
  }

  test("animated WebP surfaces through video_meta (canvas, summed durations, VP8L codec)") {
    val px = (0 until 3).map(k => GenImages.pattern(9L * 8 + k, 24, 16))
    val webp = Webp.encodeAnimatedGray(24, 16, px, delayMs = 50)
    val r = MediaKernels.videoMetaRow(webp)
    assert(r.getString(0) == "webp", s"format ${r.getString(0)}")
    assert(r.getInt(1) == 24 && r.getInt(2) == 16)
    assert(r.getLong(3) == 150L, s"duration ${r.getLong(3)}") // 3 x 50 ms
    assert(r.getString(4) == "VP8L")
    // a STILL WebP stays image_meta's face (no animation flag)
    assert(MediaKernels.videoMetaRow(
      Webp.encodeGray(24, 16, px(0))).isNullAt(0))
  }

  test("container-held audio tracks surface through audio_meta (Opus/Vorbis/AAC)") {
    // WebM with an Opus audio track: declared metadata, n_samples 0
    val opus = Webm.encodeWebmAudio("A_OPUS", 2, 48000.0, 0, 2500L)
    val or = MediaKernels.audioMetaRow(opus)
    assert(or.getString(0) == "webm" && or.getString(6) == "A_OPUS")
    assert(or.getInt(1) == 2 && or.getLong(2) == 48000L && or.getLong(5) == 2500L)
    assert(or.getLong(4) == 0L) // no sample decode, by design
    // MP4 with an AAC (mp4a) soun trak
    val aac = MediaKernels.encodeMp4Audio("mp4a", 1, 44100, 16, 3000L)
    val ar = MediaKernels.audioMetaRow(aac)
    assert(ar.getString(0) == "mp4" && ar.getString(6) == "mp4a")
    assert(ar.getInt(1) == 1 && ar.getLong(2) == 44100L &&
      ar.getInt(3) == 16 && ar.getLong(5) == 3000L)
    // AVI-held audio: strh auds + strf WAVEFORMATEX (the third container)
    val aviMp3 = MediaKernels.encodeAviAudio(0x55, 2, 44100, 0, 40000L, 250L)
    val vr = MediaKernels.audioMetaRow(aviMp3)
    assert(vr.getString(0) == "avi" && vr.getString(6) == "mp3")
    assert(vr.getInt(1) == 2 && vr.getLong(2) == 44100L)
    assert(vr.getLong(5) == 40000L * 250L / 1000L) // avih duration
    val aviPcm = MediaKernels.encodeAviAudio(1, 1, 8000, 16, 0L, 0L)
    val pr = MediaKernels.audioMetaRow(aviPcm)
    assert(pr.getString(6) == "pcm" && pr.getInt(3) == 16)
    // a VIDEO-only AVI (vids strh) has no phantom audio track
    val vidAvi = MediaKernels.encodeAviHeader(320, 240, 40000L, 25L, codec = "MJPG")
    assert(MediaKernels.audioMetaRow(vidAvi).isNullAt(0))
    for (cut <- 0 to aviMp3.length by 5) // hostile: truncations total
      MediaKernels.audioMetaRow(java.util.Arrays.copyOf(aviMp3, cut))
    // file-level faces carry their codec too
    assert(MediaKernels.audioMetaRow(GenMedia.wavFixture(3L)).getString(6) == "pcm")
    // a VIDEO-only MP4 has no soun trak: null-format row, not a phantom track
    val vid = MediaKernels.encodeMp4Header(640, 360, 5000L, codec = "avc1")
    assert(MediaKernels.audioMetaRow(vid).isNullAt(0))
    // a video WebM (V_VP8 track only) likewise
    val v = (0 until 2).map(k => graft.tools.Vp8VideoFixtures.frame(1, k))
    assert(MediaKernels.audioMetaRow(Webm.encodeWebm(48, 48, v)).isNullAt(0))
    // hostile: truncations never throw
    for (good <- Seq(opus, aac); cut <- 0 to good.length by 7)
      MediaKernels.audioMetaRow(java.util.Arrays.copyOf(good, cut))
  }

  test("TIFF (both byte orders) and WebP (VP8X/VP8L) metadata parse") {
    assert(ImageKernels.imageMeta(ImageKernels.encodeTiffHeader(800, 600)) ==
      ("tiff", 800, 600, 0))
    // big-endian TIFF, SHORT-typed dims
    val be = Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8, // IFD0 at 8
      0, 2, // 2 entries
      0x01, 0x00, 0, 3, 0, 0, 0, 1, 0, 100, 0, 0, // width SHORT 100
      0x01, 0x01, 0, 3, 0, 0, 0, 1, 0, 50, 0, 0, // height SHORT 50
      0, 0, 0, 0)
    assert(ImageKernels.imageMeta(be) == ("tiff", 100, 50, 0))
    assert(ImageKernels.imageMeta(ImageKernels.encodeWebpHeader(1920, 1080)) ==
      ("webp", 1920, 1080, 0))
    // VP8L lossless signature with packed 14-bit dims
    val w = 33; val h = 17
    val bits = ((w - 1) | ((h - 1) << 14)).toLong
    val vp8l = "RIFF".getBytes ++ Array[Byte](13, 0, 0, 0) ++ "WEBP".getBytes ++
      "VP8L".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      Array(0x2F.toByte, bits.toByte, (bits >> 8).toByte, (bits >> 16).toByte,
        (bits >> 24).toByte)
    assert(ImageKernels.imageMeta(vp8l) == ("webp", w, h, 0))
  }

  test("media expressions are SQL-registered and null-safe") {
    graft.expressions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, GenMedia.wavFixture(7L)), (2L, "junk".getBytes))
      .toDF("id", "content").createOrReplaceTempView("media")
    val rows = spark.sql(
      """SELECT id, audio_meta(content).sample_rate AS r,
                audio_features(content).sq_sum AS sq,
                video_meta(content).format AS vf FROM media""")
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getLong(1) == GenMedia.wavRate(7L).toLong && !rows(0).isNullAt(2))
    assert(rows(1).getLong(1) == 0L && rows(1).isNullAt(2) && rows(1).isNullAt(3))
  }

  test("audio fingerprint: amplitude-invariant, seed-distinct, short/junk-null") {
    val base = Array.tabulate(256)(i =>
      ((Dedup.mix64(i * 77L) & 0x3FFF) - 8192).toInt)
    val doubled = base.map(_ * 2)
    val f1 = MediaKernels.audioFingerprint(MediaKernels.encodeWav(8000, base))
    val f2 = MediaKernels.audioFingerprint(MediaKernels.encodeWav(8000, doubled))
    assert(f1 != null && f1 == f2, "doubling amplitude must not move the fingerprint")
    val other = Array.tabulate(256)(i =>
      ((Dedup.mix64(i * 77L + 5L) & 0x3FFF) - 8192).toInt)
    val f3 = MediaKernels.audioFingerprint(MediaKernels.encodeWav(8000, other))
    assert(java.lang.Long.bitCount(f1 ^ f3) > 8, "distinct signals must differ")
    assert(MediaKernels.audioFingerprint(MediaKernels.encodeWav(8000, Array(1, 2, 3))) == null)
    assert(MediaKernels.audioFingerprint("junk".getBytes) == null)
  }

  test("audioDedupGroups recovers amplitude-scaled copies across the banded join") {
    import spark.implicits._
    val media = ((0L until 12L).map(i =>
      (i, GenMedia.audioDedupFixture(i % 6 + (i / 6) * 250))) :+
      ((12L, "noise".getBytes))).toDF("media_id", "content")
    val groups = Images.audioDedupGroups(media, "media_id", "content", maxHamming = 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (i <- 0L until 6L) {
      assert(groups(i) == (i, 2L) && groups(i + 6) == (i, 2L), s"$i: ${groups(i)}")
    }
    assert(groups(12L) == (12L, 1L))
  }

  test("meta parsers never throw on truncated or byte-corrupted payloads") {
    // crawl payloads are hostile: every parser must degrade to
    // null-format/null rows, never an executor exception
    val fixtures: Seq[Array[Byte]] = Seq(
      graft.tools.GenMedia.wavFixture(5L),
      MediaKernels.encodeFlacHeader(2, 44100L, 16, 1000L),
      MediaKernels.encodeMp3Header(44100L, 3),
      graft.tools.GenMedia.mp4Fixture(3L),
      MediaKernels.encodeAviHeader(320, 240, 40000L, 25L),
      ImageKernels.encodeBmp(16, 12, GenImages.pattern(1, 16, 12)),
      ImageKernels.encodePng(16, 12, GenImages.pattern(1, 16, 12)),
      ImageKernels.encodeGifHeader(16, 12),
      ImageKernels.encodeJpegHeader(16, 12, 3),
      ImageKernels.encodeTiffHeader(16, 12),
      ImageKernels.encodeWebpHeader(16, 12))
    val rnd = new scala.util.Random(42)
    fixtures.foreach { f =>
      // truncations at every length
      (0 to f.length).foreach { cut =>
        val t = java.util.Arrays.copyOf(f, cut)
        ImageKernels.imageMetaRow(t); MediaKernels.audioMetaRow(t)
        MediaKernels.videoMetaRow(t); MediaKernels.audioFeaturesRow(t)
        MediaKernels.audioFingerprint(t); ImageKernels.thumbnail(t, 4, 4)
      }
      // random single-byte corruptions (incl. length fields)
      (1 to 200).foreach { _ =>
        val c = f.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        ImageKernels.imageMetaRow(c); MediaKernels.audioMetaRow(c)
        MediaKernels.videoMetaRow(c); MediaKernels.audioFeaturesRow(c)
        MediaKernels.audioFingerprint(c); ImageKernels.thumbnail(c, 4, 4)
      }
    }
  }

  test("audio/video YAML ops append prefixed metadata columns") {
    import spark.implicits._
    val media = Seq((0L, GenMedia.mp4Fixture(0L))).toDF("media_id", "content")
    val out = new graft.engine.Engine(spark).applyOperation(media,
      Map("operation" -> "video_meta", "column" -> "content"), Map.empty, "spec")
      .head()
    assert(out.getString(2) == "mp4")
    assert(out.getInt(3) == GenMedia.mp4Width(0) && out.getInt(4) == GenMedia.mp4Height(0))
    assert(out.getLong(5) == GenMedia.mp4DurationMs(0))
  }

  test("videoFrames: AVI and MP4 frames round-trip byte-exactly; sampling is even") {
    val frames = (0 until 10).map(k => GenMedia.videoFrameJpeg(7L, k))
    val avi = MediaKernels.encodeMjpegAvi(48, 48, 40000L, frames)
    val mp4 = MediaKernels.encodeJpegMp4(48, 48, frames)
    for (container <- Seq(avi, mp4)) {
      val all = MediaKernels.videoFrames(container, 16)
      assert(all.length == 10)
      assert(all.zip(frames).forall { case (a, b) => a.sameElements(b) },
        "container extraction must be byte-exact")
      // even sampling: floor(i*10/4) = 0,2,5,7
      val sampled = MediaKernels.videoFrames(container, 4)
      assert(sampled.length == 4)
      for ((want, got) <- Seq(0, 2, 5, 7).zip(sampled))
        assert(got.sameElements(frames(want)))
    }
    // the MP4 writer's 2-sample chunks really exercise stsc run mapping:
    // an odd frame count leaves a short tail chunk
    val odd = MediaKernels.encodeJpegMp4(48, 48, frames.take(5))
    assert(MediaKernels.videoFrames(odd, 16).length == 5)
  }

  test("videoFrames: hostile inputs are empty, never throw; meta fixtures have no frames") {
    assert(MediaKernels.videoFrames(null, 4).isEmpty)
    assert(MediaKernels.videoFrames(Array[Byte](1, 2, 3), 4).isEmpty)
    assert(MediaKernels.videoFrames(GenMedia.videoMetaFixture(3), 4).isEmpty)
    assert(MediaKernels.videoFrames(GenMedia.wavFixture(3), 4).isEmpty)
    val good = GenMedia.videoFramesFixture(2)
    val rnd = new scala.util.Random(11)
    for (cut <- Seq(3, 12, 40, good.length / 2, good.length - 1)) {
      MediaKernels.videoFrames(java.util.Arrays.copyOf(good, cut), 4) // no throw
    }
    for (_ <- 0 until 300) {
      val c = good.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      MediaKernels.videoFrames(c, 4) // no throw on corruption
    }
  }

  test("animated GIF frames: disposal model, transparency, sampling — closed form") {
    import ImageKernels.{encodeGifAnimated, decodeGrayPublic}
    def full(v: Int) = Array.fill(8 * 6)(v)
    // 1) two full frames, disposal 0: snapshots are the frames themselves
    //    (gray palette index i decodes to luma exactly i)
    val twoFull = encodeGifAnimated(8, 6, Seq(
      (0, 0, 8, 6, 0, -1, full(40)), (0, 0, 8, 6, 0, -1, full(200))))
    val f2 = MediaKernels.videoFrames(twoFull, 16)
    assert(f2.length == 2)
    assert(decodeGrayPublic(f2(0)).px.forall(_ == 40))
    assert(decodeGrayPublic(f2(1)).px.forall(_ == 200))
    // 2) patch + transparency: frame 2 overlays a 3x2 rect at (2,1) where
    //    one index is transparent — those pixels keep the base
    val patch = Array(7, 255, 7, 7, 255, 7) // 255 = transparent below
    val overlay = encodeGifAnimated(8, 6, Seq(
      (0, 0, 8, 6, 0, -1, full(40)), (2, 1, 3, 2, 0, 255, patch)))
    val o2 = decodeGrayPublic(MediaKernels.videoFrames(overlay, 16)(1))
    assert(o2.px(1 * 8 + 2) == 7 && o2.px(1 * 8 + 3) == 40 && o2.px(1 * 8 + 4) == 7)
    assert(o2.px(0) == 40 && o2.px(2 * 8 + 3) == 40)
    // 3) disposal 2 (restore-to-background, bg index 40 via palette): a
    //    middle patch disposes to bg before frame 3 paints its own pixel
    val d2 = encodeGifAnimated(8, 6, Seq(
      (0, 0, 8, 6, 0, -1, full(90)),
      (2, 1, 3, 2, 2, -1, Array.fill(6)(7)),
      (0, 0, 1, 1, 0, -1, Array(200))), bgIndex = 40)
    val d2f = MediaKernels.videoFrames(d2, 16).map(decodeGrayPublic)
    assert(d2f(1).px(1 * 8 + 2) == 7, "frame 2 shows its patch")
    assert(d2f(2).px(1 * 8 + 2) == 40, "frame 3 shows the rect restored to background")
    assert(d2f(2).px(0) == 200 && d2f(2).px(5) == 90)
    // 4) disposal 3 (restore-to-previous): the patch vanishes entirely
    val d3 = encodeGifAnimated(8, 6, Seq(
      (0, 0, 8, 6, 0, -1, full(90)),
      (2, 1, 3, 2, 3, -1, Array.fill(6)(7)),
      (0, 0, 1, 1, 0, -1, Array(200))))
    val d3f = MediaKernels.videoFrames(d3, 16).map(decodeGrayPublic)
    assert(d3f(2).px(1 * 8 + 2) == 90, "frame 3 shows the pre-patch canvas")
    // 5) even sampling applies to GIF too
    val many = encodeGifAnimated(8, 6, (0 until 10).map(i => (0, 0, 8, 6, 0, -1, full(i * 20))))
    val sampled = MediaKernels.videoFrames(many, 4).map(decodeGrayPublic)
    assert(sampled.map(_.px(0)).toSeq == Seq(0, 40, 100, 140)) // frames 0,2,5,7
    // 6) hostile: truncations never throw; a still GIF header has no frames
    for (cut <- Seq(5, 14, 30, twoFull.length / 2))
      MediaKernels.videoFrames(java.util.Arrays.copyOf(twoFull, cut), 4)
    assert(MediaKernels.videoFrames(ImageKernels.encodeGifHeader(8, 6), 4).isEmpty)
  }

  test("video_frames YAML op explodes frames that feed image_dedup (video near-dup)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // videos 1 and 2 share identical frame content (near-dup pair); video
    // 3 is unrelated
    val f = (0 until 4).map(k => GenMedia.videoFrameJpeg(100L, k))
    val other = (0 until 4).map(k => GenMedia.videoFrameJpeg(999L, k))
    val media = Seq(
      (1L, MediaKernels.encodeMjpegAvi(48, 48, 40000L, f)),
      (2L, MediaKernels.encodeJpegMp4(48, 48, f)),
      (3L, MediaKernels.encodeJpegMp4(48, 48, other))
    ).toDF("media_id", "content")
    val frames = new graft.engine.Engine(spark).applyOperation(media,
      Map("operation" -> "video_frames", "column" -> "content",
        "max_frames" -> 2, "frame_column" -> "img", "index_column" -> "k"),
      Map.empty, "spec")
    assert(frames.columns.toSeq == Seq("media_id", "k", "img"))
    assert(frames.count() == 6)
    // compose with the image tier: same-content videos collapse per-frame
    val groups = new graft.engine.Engine(spark).applyOperation(
      frames.withColumn("fid", col("media_id") * 10 + col("k")),
      Map("operation" -> "image_dedup", "id_column" -> "fid",
        "column" -> "img", "max_hamming" -> 2), Map.empty, "spec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // frames of videos 1 and 2 pair up (10~20, 11~21); video 3 stays alone
    assert(groups(10L) == groups(20L) && groups(11L) == groups(21L))
    assert(groups(30L) != groups(10L) && groups(31L) != groups(11L))
  }

  test("animated WebP writer: frames snapshot back bit-exactly through videoFrames") {
    val frames = (0 until 3).map(k => GenImages.pattern(70L * 16 + k, 48, 48))
    val anim = Webp.encodeAnimatedGray(48, 48, frames)
    val got = MediaKernels.videoFrames(anim, 16)
    assert(got.length == 3, s"expected 3 frames, got ${got.length}")
    for (k <- 0 until 3) {
      val g = ImageKernels.decodeGrayPublic(got(k))
      assert(g.w == 48 && g.h == 48)
      assert(g.px.sameElements(frames(k)), s"frame $k not lossless")
    }
    // the dedup fixture's 4th arm is this writer
    val fx = GenMedia.videoDedupFixture(3L) // id%4 == 3 -> animated WebP
    assert(MediaKernels.videoFrames(fx, 8).length == 4)
  }

  test("video_dedup: a static video sharing ONE frame does not merge; two shared frames do") {
    import spark.implicits._
    val x = GenMedia.videoFrameJpeg(5L, 0)  // frame X
    val y = GenMedia.videoFrameJpeg(5L, 1)  // frame Y
    def u(k: Int) = GenMedia.videoFrameJpeg(777L, k) // unrelated frames
    def w(k: Int) = GenMedia.videoFrameJpeg(888L, k)
    def avi(fs: Seq[Array[Byte]]) = MediaKernels.encodeMjpegAvi(48, 48, 40000L, fs)
    val media = Seq(
      (1L, avi(Seq(x, x, x, x))),          // static animation: 4 identical frames
      (2L, avi(Seq(x, u(1), u(2), u(3)))), // shares only X with 1 — must NOT merge
      (3L, avi(Seq(x, y, w(1), w(2)))),    // shares X and Y with 4 — must merge
      (4L, avi(Seq(x, y, u(5), w(6))))
    ).toDF("media_id", "content")
    val g = Images.videoDedupGroups(media, "media_id", "content",
      maxHamming = 3, maxFrames = 8, minMatches = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the one-sided vote would count video 1's four identical frames as 4
    // distinct matches against video 2's single X — both-sides-distinct
    // keeps them apart
    assert(g(1L) != g(2L), s"static video falsely merged: $g")
    assert(g(3L) == g(4L), s"genuine two-frame dup failed to merge: $g")
    assert(g(1L) != g(3L) && g(2L) != g(3L), g.toString)
  }
}

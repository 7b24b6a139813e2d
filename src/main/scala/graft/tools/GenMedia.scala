package graft.tools

import graft.functions.MediaKernels

/** Deterministic audio/video fixtures for the oracle gate — every byte
  * derivable from doc_id alone (the GenImages pattern), so the DuckDB
  * oracle states expected metadata AND decoded-sample features in closed
  * form. */
object GenMedia {

  def wavRate(id: Long): Int = 8000 + (id % 4).toInt * 4000
  def wavSamples(id: Long): Int = 64 + (id % 32).toInt * 4

  /** PCM16 sample i of doc id — positive-modulus arithmetic the oracle
    * reproduces verbatim: ((i·2654435761 + id·40503) mod 65536) − 32768. */
  def sample(id: Long, i: Int): Int =
    (((i.toLong * 2654435761L + id * 40503L) % 65536L) - 32768L).toInt

  /** Mono PCM16 WAV with id-derived rate, length, and samples. */
  def wavFixture(id: Long): Array[Byte] =
    MediaKernels.encodeWav(wavRate(id),
      Array.tabulate(wavSamples(id))(i => sample(id, i)))

  /** Audio-dedup fixture: ids i and i+250 carry the SAME signal, the copy
    * at exactly double amplitude — different bytes, identical energy-delta
    * fingerprint (sign of window-energy deltas is scale-invariant); 256
    * samples = 64 exact 4-sample windows. Samples come from mix64 (a
    * modular LCG ramp gives near-flat window energies whose delta signs
    * collide across seeds — measured); the dedup oracle is closed-form in
    * doc_id, so sample SQL-expressibility is not needed here. Base range
    * ±8191 so the ×2 copy never clips. */
  def audioDedupSample(id: Long, i: Int): Int = {
    val base = ((graft.functions.Dedup.mix64(
      i.toLong * 1000003L + (id % 250) * 7919L + 17L) & 0x3FFFL) - 8192L).toInt
    if (id >= 250) base * 2 else base
  }

  /** Lossy-dedup fixture signal: a 3-sinusoid mix whose per-segment
    * amplitude envelopes derive from the base via mix64 — strong
    * time x band structure (the spectral fingerprint's 16 segments x
    * 4 Haar octaves), so distinct bases differ in ~30 of 60 bits while
    * Vorbis quantization noise perturbs band energies fractionally
    * (zero-to-few bit flips). 2048 samples at 16 kHz. */
  def lossyAudioSample(base: Long, i: Int): Int = {
    val seg = i / 128 // 16 segments of 128
    var v = 0.0
    var h = 0
    val freqs = Array(0.031, 0.117, 0.342) // low / mid / high octaves
    while (h < 3) {
      val amp = 500 + (graft.functions.Dedup.mix64(
        base * 7919L + seg * 131L + h * 17L + 5L) & 0x1FFFL).toDouble // 500..8691
      v += amp * math.sin(2 * math.Pi * freqs(h) * i)
      h += 1
    }
    math.max(-30000, math.min(30000, v.toInt))
  }

  /** q_audio_dedup_lossy payload: pairs (i, i+250) are the SAME
    * recording — the copy at HALF amplitude (scale invariance) — with
    * the container rotating WAV / FLAC / Ogg-VORBIS / MATROSKA-VORBIS /
    * G.711-mu-law-.au / Ogg-VORBIS-FLOOR-0 on (id%250 + id/250) mod 6,
    * so every pair crosses containers and the lossy codecs appear on
    * both sides. The Vorbis arms are the native encoder's single-pass
    * (~45 dB) mode: genuinely lossy, so the gate's hamming tolerance is
    * actually exercised; the Matroska arm wraps the SAME packet sequence
    * in A_VORBIS blocks (Xiph-laced + unlaced); the sixth arm carries the
    * legacy LSP floor (decode exercised from YAML, not just specs). */
  def lossyAudioDedupFixture(id: Long): Array[Byte] = {
    val base = id % 250
    val raw = Array.tabulate(2048)(i => lossyAudioSample(base, i))
    val samples = if (id >= 250) raw.map(_ / 2) else raw
    (id % 250 + id / 250) % 6 match {
      case 0 => MediaKernels.encodeWav(16000, samples)
      case 1 => graft.functions.Flac.encodeMono16(16000, samples)
      case 2 => graft.functions.Vorbis.encode(16000, samples, twoPass = false)
      case 3 => graft.functions.Webm.encodeMkvVorbis(
        graft.functions.Vorbis.encodePacketSeq(16000, samples, twoPass = false)._1)
      case 4 => MediaKernels.encodeAu(1, 16000, samples) // G.711 mu-law
      case _ => graft.functions.Vorbis.encode(16000, samples,
        twoPass = false, floor0 = true) // legacy LSP floor
    }
  }

  /** Container rotates WAV / FLAC / Ogg-FLAC / AIFF / .au-PCM16 on
    * (id%250 + id/250) mod 5, so EVERY constructed near-dup pair
    * (i, i+250) crosses containers and all five appear on both sides;
    * every arm is lossless with identical normalization, so
    * fingerprints are bit-identical in all five. */
  def audioDedupFixture(id: Long): Array[Byte] = {
    val samples = Array.tabulate(256)(i => audioDedupSample(id, i))
    (id % 250 + id / 250) % 5 match {
      case 0 => MediaKernels.encodeWav(16000, samples)
      case 1 => graft.functions.Flac.encodeMono16(16000, samples)
      case 2 => graft.functions.Ogg.encodeOggFlac(
        graft.functions.Flac.encodeMono16(16000, samples), 256L)
      case 3 => MediaKernels.encodeAiff(16000, samples, sowt = id % 2 == 0)
      case _ => MediaKernels.encodeAu(3, 16000, samples)
    }
  }

  /** q_audio_meta_legacy payload: the Mac/Sun-era lossless formats —
    * id%5 rotates AIFF / AIFC-sowt / .au PCM16 / .au G.711 mu-law /
    * .au A-law; all fields id-derived so the oracle is closed-form. */
  def legacyAudioFixture(id: Long): Array[Byte] = {
    val rate = Seq(8000, 16000, 22050)((id % 3).toInt)
    val n = 200 + (id % 7).toInt * 50
    val samples = Array.tabulate(n)(i => lossyAudioSample(id % 100, i))
    (id % 5) match {
      case 0 => MediaKernels.encodeAiff(rate, samples)
      case 1 => MediaKernels.encodeAiff(rate, samples, sowt = true)
      case 2 => MediaKernels.encodeAu(3, rate, samples)
      case 3 => MediaKernels.encodeAu(1, rate, samples)
      case _ => MediaKernels.encodeAu(27, rate, samples)
    }
  }

  /** q_video_meta_theora payload: .ogv identification headers with
    * id-derived picture dims, frame rate and granule-split frame count
    * (keyframe<<kfgshift | delta) — closed-form oracle. */
  def theoraFixture(id: Long): Array[Byte] = {
    val picw = 160 + (id % 9).toInt * 16
    val pich = 120 + (id % 5).toInt * 16
    val frn = Seq(30L, 25L, 24L)((id % 3).toInt)
    val frames = 10 + (id % 40)
    graft.functions.Ogg.encodeOggTheora(picw, pich, frn, 1L, 6, frames)
  }

  def flacRate(id: Long): Long = 16000L + (id % 5) * 4000L
  def flacSamples(id: Long): Long = 10000L + id * 7L
  /** Rotates all three MPEG generations: MPEG-1 full rates, MPEG-2 half
    * rates, MPEG-2.5 quarter rates (LSF frames carry 576 samples). */
  def mp3Rate(id: Long): Long = Seq(44100L, 48000L, 32000L,
    22050L, 16000L, 11025L, 8000L)(((id / 3) % 7).toInt)
  def mp3Frames(id: Long): Int = 4 + (id % 7).toInt

  /** q_audio_meta payload: format rotates wav/flac/mp3 by id%3. */
  def audioMetaFixture(id: Long): Array[Byte] = (id % 3) match {
    case 0 => wavFixture(id)
    case 1 => MediaKernels.encodeFlacHeader(2, flacRate(id), 16, flacSamples(id))
    case _ => MediaKernels.encodeMp3Header(mp3Rate(id), mp3Frames(id))
  }

  /** q_audio_meta_container payload: WebM-held Opus/Vorbis for even ids,
    * MP4-AAC (mp4a) for odd — channels/rate/duration id-derived so the
    * oracle is closed-form. Compressed container tracks carry no sample
    * data; the gate pins that their DECLARED metadata surfaces. */
  def containerAudioFixture(id: Long): Array[Byte] = {
    val ch = 1 + ((id / 2) % 2).toInt
    val rate = ((id / 4) % 3) match {
      case 0 => 22050; case 1 => 44100; case _ => 48000
    }
    val durMs = 500L + (id % 50) * 100L
    if (id % 2 == 0)
      graft.functions.Webm.encodeWebmAudio(
        if (id % 4 == 0) "A_OPUS" else "A_VORBIS", ch, rate.toDouble, 0, durMs)
    else MediaKernels.encodeMp4Audio("mp4a", ch, rate, 16, durMs)
  }

  def aviUsPerFrame: Long = 40000L // 25 fps
  def aviFrames(id: Long): Long = 25L + id % 100L

  /** q_video_meta payload: mp4 for even ids, RIFF AVI for odd — each
    * declaring an id-derived codec (mp4 stsd fourcc avc1/jpeg, AVI strh
    * handler MJPG/XVID) so the diagnosability column is closed-form:
    * the avc1/XVID arms are exactly the "declared but zero frames"
    * shapes a real crawl corpus hits. */
  def videoMetaFixture(id: Long): Array[Byte] =
    if (id % 2 == 0)
      MediaKernels.encodeMp4Header(mp4Width(id), mp4Height(id),
        mp4DurationMs(id), codec = if (id % 4 == 0) "avc1" else "jpeg")
    else MediaKernels.encodeAviHeader(mp4Width(id), mp4Height(id),
      aviUsPerFrame, aviFrames(id),
      codec = if (id % 4 == 1) "MJPG" else "XVID")

  def mp4Width(id: Long): Int = 320 + (id % 8).toInt * 16
  def mp4Height(id: Long): Int = 240 + (id % 5).toInt * 16
  def mp4DurationMs(id: Long): Long = 1000L + (id % 97) * 250L

  /** ftyp+moov(mvhd+trak(tkhd)) metadata fixture. */
  def mp4Fixture(id: Long): Array[Byte] =
    MediaKernels.encodeMp4Header(mp4Width(id), mp4Height(id), mp4DurationMs(id))

  /** One JPEG frame of the q_video_frames fixture: a 48x48 id+index-seeded
    * pattern through the native baseline encoder — byte-identical to what
    * the gate regenerates as the bare-JPEG expectation. */
  def videoFrameJpeg(id: Long, idx: Int): Array[Byte] = {
    val w = 48; val h = 48
    graft.functions.Jpeg.encodeYcc420(w, h, GenImages.pattern(id * 16 + idx, w, h))
  }

  /** q_video_frames payload: 4 JPEG frames in an MJPEG AVI for even ids,
    * a JPEG-sample MP4 (2-sample chunks through stsc/stco) for odd. */
  def videoFramesFixture(id: Long): Array[Byte] = {
    val frames = (0 until 4).map(k => videoFrameJpeg(id, k))
    if (id % 2 == 0) MediaKernels.encodeMjpegAvi(48, 48, aviUsPerFrame, frames)
    else MediaKernels.encodeJpegMp4(48, 48, frames)
  }

  /** q_video_meta_gif payload: an animated GIF with id-derived frame
    * count and per-frame delay, so duration is closed-form id arithmetic:
    * frames = 2 + id%5, delay = (3 + id%7) cs each. */
  def gifVideoFixture(id: Long): Array[Byte] = {
    val n = 2 + (id % 5).toInt
    graft.functions.ImageKernels.encodeGifAnimated(24, 16,
      (0 until n).map(k => (0, 0, 24, 16, 0, -1,
        GenImages.pattern(id * 8 + k, 24, 16))),
      delayCs = 3 + (id % 7).toInt)
  }

  /** Real VP8 video: 4 embedded libwebp keyframes of pattern(base*16+k)
    * content (tools/Vp8VideoFixtures, bases 1..4) in a WebM container for
    * even vids, IVF for odd — the same frame content the JPEG-framed
    * AVI/MP4 fixtures carry, so VP8 video near-dups them cross-codec. */
  def vp8VideoFixture(vid: Long): Array[Byte] = {
    val base = (vid % 4).toInt + 1
    val frames = (0 until 4).map(k => Vp8VideoFixtures.frame(base, k))
    if (vid % 2 == 0) graft.functions.Webm.encodeWebm(48, 48, frames)
    else graft.functions.Webm.encodeIvf(48, 48, frames)
  }

  /** Real H.264 video: 4 native-encoded baseline IDR frames of
    * pattern(base*16+k) content (tools/H264Fixtures, bases 1..4) in an
    * avc1 MP4 — the SAME frame content the JPEG/VP8 video fixtures
    * carry, so avc1 video near-dups them cross-codec. */
  def h264VideoFixture(vid: Long): Array[Byte] = {
    val base = (vid % 4).toInt + 1
    MediaKernels.encodeAvc1Mp4(48, 48,
      (0 until 4).map(k => H264Fixtures.stream(base, k)))
  }

  /** avc1 MP4 whose samples are Main-profile CABAC IDR streams (the
    * x264-default entropy mode) — 2 frames per video, same pattern
    * content as [[h264VideoFixture]]'s first two frames of the same
    * base, so the two entropy layers are cross-dup anchors of each
    * other. video_meta reads "avc1/main-cabac" from the avcC. */
  def h264CabacVideoFixture(vid: Long): Array[Byte] = {
    val base = (vid % 4).toInt + 1
    MediaKernels.encodeAvc1Mp4(48, 48,
      (0 until 2).map(k => H264Fixtures.cabacStream(base, k)))
  }

  /** FRAGMENTED avc1 MP4 (moof/tfhd/trun, empty moov stbl — the DASH/
    * streaming-origin shape): the SAME four baseline streams per base
    * as [[h264VideoFixture]], so its decode pins the identical pHashes
    * and classic-vs-fragmented containers are cross-dups. Odd vids mix
    * in CABAC samples so the fragment walk feeds both entropy layers. */
  /** q_audio_meta_stream payload — the stream-container audio shapes:
    * id%4 = 0: MP3 elementary stream in MPEG-TS (stream_type 0x03);
    * 1: ADTS AAC in MPEG-TS (0x0F); 2: Ogg Vorbis; 3: Ogg Opus. All
    * fields id-derived so the oracle is closed-form. */
  def streamAudioFixture(id: Long): Array[Byte] = {
    val frames = 4 + (id % 6).toInt
    (id % 4) match {
      case 0 =>
        graft.functions.MpegTs.encodeAudioTs(0x03,
          Seq(MediaKernels.encodeMp3Header(44100L, frames)))
      case 1 =>
        val ch = 1 + ((id / 4) % 2).toInt
        graft.functions.MpegTs.encodeAudioTs(0x0F,
          Seq(MediaKernels.encodeAdtsHeader(48000L, ch, frames)))
      case 2 =>
        val ch = 1 + ((id / 4) % 2).toInt
        val rate = Seq(22050L, 44100L, 48000L)(((id / 8) % 3).toInt)
        graft.functions.Ogg.encodeOggAudio("vorbis", ch, rate,
          rate * (1 + id % 5))
      case _ =>
        val ch = 1 + ((id / 4) % 2).toInt
        graft.functions.Ogg.encodeOggAudio("opus", ch, 48000L,
          48000L * (1 + id % 5))
    }
  }

  /** MPEG transport stream (the HLS segment shape): PAT + PMT
    * (stream_type 0x1B) + one PES per H.264 IDR picture, 90 kHz PTS.
    * Same base/arm rotation as the other H.264 containers. */
  def tsAvcVideoFixture(vid: Long): Array[Byte] = {
    val base = ((vid / 2) % 4).toInt + 1
    val streams =
      if (vid % 2 == 0) (0 until 4).map(k => H264Fixtures.stream(base, k))
      else (0 until 2).map(k => H264Fixtures.cabacStream(base, k))
    graft.functions.MpegTs.encodeH264Ts(streams)
  }

  /** AVI-held H.264 ("H264" strh fourcc, Annex-B byte streams in the
    * movi chunks — SPS/PPS in-band ahead of each IDR): same base/arm
    * rotation as the other H.264 containers. base = vid/2 + 1. */
  def aviAvcVideoFixture(vid: Long): Array[Byte] = {
    val base = ((vid / 2) % 4).toInt + 1
    val streams =
      if (vid % 2 == 0) (0 until 4).map(k => H264Fixtures.stream(base, k))
      else (0 until 2).map(k => H264Fixtures.cabacStream(base, k))
    MediaKernels.encodeMjpegAvi(48, 48, 40000L, streams, fourcc = "H264")
  }

  /** Matroska-held H.264 (V_MPEG4/ISO/AVC + avcC CodecPrivate): the
    * same streams per base as the MP4 fixtures — even vids CAVLC x4,
    * odd vids CABAC x2 — so MKV, classic MP4 and fragmented MP4 of the
    * same base are mutual cross-container dups. base = vid/2 + 1. */
  def mkvAvcVideoFixture(vid: Long): Array[Byte] = {
    val base = ((vid / 2) % 4).toInt + 1
    val streams =
      if (vid % 2 == 0) (0 until 4).map(k => H264Fixtures.stream(base, k))
      else (0 until 2).map(k => H264Fixtures.cabacStream(base, k))
    MediaKernels.encodeMkvAvc(48, 48, streams)
  }

  def h264FragVideoFixture(vid: Long): Array[Byte] = {
    // vid 0..7 covers bases 1..4 x {CAVLC, CABAC}: base from vid/2,
    // entropy arm from vid%2
    val base = ((vid / 2) % 4).toInt + 1
    val streams =
      if (vid % 2 == 0) (0 until 4).map(k => H264Fixtures.stream(base, k))
      else (0 until 2).map(k => H264Fixtures.cabacStream(base, k))
    MediaKernels.encodeAvc1FragMp4(48, 48, streams)
  }

  /** An avc1 MP4 DECLARING High-profile CABAC (SPS profile_idc byte →
    * 100, PPS entropy_coding_mode_flag → 1) over baseline slice bytes:
    * guaranteed to decode ZERO frames (parseSps expects High-profile
    * extension fields that are not present, so every slice aborts)
    * while video_meta's codec column reads "avc1/high-cabac" from the
    * declared avcC bits — the diagnosable undecodable arm of
    * q_video_meta_avc, the real-world x264-default shape. */
  def h264UndecodableFixture(vid: Long): Array[Byte] = {
    val base = (vid % 4).toInt + 1
    val streams = (0 until 4).map { k =>
      val s = H264Fixtures.stream(base, k).clone()
      var i = 0
      while (i + 5 < s.length) {
        if (s(i) == 0 && s(i + 1) == 0 && s(i + 2) == 0 && s(i + 3) == 1) {
          val t = s(i + 4) & 0x1F
          if (t == 7) s(i + 5) = 100.toByte // SPS profile_idc
          // PPS payload opens ue(0) ue(0) = "11", entropy flag is bit 2
          if (t == 8) s(i + 5) = (s(i + 5) | 0x20).toByte
        }
        i += 1
      }
      s
    }
    MediaKernels.encodeAvc1Mp4(48, 48, streams)
  }

  /** q_video_meta_webm payload: WebM for even ids / IVF for odd, with
    * id-derived frame count n = 2 + id%3, so dims and duration are
    * closed-form: WebM writes Duration = n*33 ms (timecode scale 1 ms);
    * IVF derives n*1000/30 ms from its 30 fps timebase header. */
  def vp8MetaFixture(id: Long): Array[Byte] = {
    val n = 2 + (id % 3).toInt
    val frames = (0 until n).map(k => Vp8VideoFixtures.frame((id % 4).toInt + 1, k))
    if (id % 2 == 0) graft.functions.Webm.encodeWebm(48, 48, frames)
    else graft.functions.Webm.encodeIvf(48, 48, frames)
  }

  /** q_video_dedup payload: ids i and i+100 carry the SAME frame content
    * in DIFFERENT containers — the rotation (id%4 below, shifted by one
    * above) guarantees every pair crosses containers and all four
    * (MJPEG AVI, JPEG MP4, animated GIF, animated WebP) appear on both
    * sides. GIF and WebP frames are lossless gray (GIF palette index =
    * luma; WebP VP8L literal = luma) while AVI/MP4 frames ride the
    * near-lossless JPEG encoder, so the match also crosses CODECS (the
    * q_image_phash_dedup JPEG-vs-PNG margin family); distinct base seeds
    * stay far apart in pHash. */
  /** q_video_frames_apng payload: 4 full-canvas grayscale frames
    * (GenImages.pattern), dispose 0 / blend 0 — every composited
    * snapshot must equal the still-PNG encode of the same plane,
    * byte-for-byte. */
  def apngVideoFixture(vid: Long): Array[Byte] =
    graft.functions.ImageKernels.encodeApng(48, 48,
      (0 until 4).map(k => graft.functions.ImageKernels.ApngFrame(
        0, 0, 48, 48, 0, 0, GenImages.pattern(vid * 16 + k, 48, 48))))

  /** q_video_dedup_apng payload: even ids an animated GIF, odd ids an
    * APNG of the SAME four planes (base = id / 2) — the banded pHash
    * join must group each cross-container pair. */
  def apngGifDedupFixture(id: Long): Array[Byte] = {
    val base = id / 2
    if (id % 2 == 0)
      graft.functions.ImageKernels.encodeGifAnimated(48, 48,
        (0 until 4).map(k =>
          (0, 0, 48, 48, 0, -1, GenImages.pattern(base * 16 + k, 48, 48))))
    else apngVideoFixture(base)
  }

  def videoDedupFixture(id: Long): Array[Byte] = {
    val base = id % 100
    val container = if (id < 100) id % 4 else (id % 4 + 1) % 4
    container match {
      case 0 =>
        MediaKernels.encodeMjpegAvi(48, 48, aviUsPerFrame,
          (0 until 4).map(k => videoFrameJpeg(base, k)))
      case 1 =>
        MediaKernels.encodeJpegMp4(48, 48,
          (0 until 4).map(k => videoFrameJpeg(base, k)))
      case 2 =>
        graft.functions.ImageKernels.encodeGifAnimated(48, 48,
          (0 until 4).map(k =>
            (0, 0, 48, 48, 0, -1, GenImages.pattern(base * 16 + k, 48, 48))))
      case _ =>
        graft.functions.Webp.encodeAnimatedGray(48, 48,
          (0 until 4).map(k => GenImages.pattern(base * 16 + k, 48, 48)))
    }
  }
}

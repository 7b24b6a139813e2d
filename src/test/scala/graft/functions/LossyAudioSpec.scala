package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.GenMedia

/** The lossy-tolerant audio tier: spectral-fingerprint laws (lossless
  * bit-identity, amplitude-scale invariance, Vorbis hamming-nearness,
  * cross-base separation) and the native Vorbis encoder's quality
  * contract. */
class LossyAudioSpec extends AnyFunSuite {

  private def sig(base: Long): Array[Int] =
    Array.tabulate(2048)(i => GenMedia.lossyAudioSample(base, i))

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("spectral fingerprint is bit-identical across lossless containers") {
    val s = sig(7)
    val w = MediaKernels.audioFingerprintSpectral(MediaKernels.encodeWav(16000, s))
    val f = MediaKernels.audioFingerprintSpectral(Flac.encodeMono16(16000, s))
    val of = MediaKernels.audioFingerprintSpectral(
      Ogg.encodeOggFlac(Flac.encodeMono16(16000, s), s.length.toLong))
    assert(w != null && w == f && f == of)
  }

  test("spectral fingerprint is invariant under amplitude scaling") {
    val s = sig(11)
    val w1 = MediaKernels.audioFingerprintSpectral(MediaKernels.encodeWav(16000, s))
    val w2 = MediaKernels.audioFingerprintSpectral(
      MediaKernels.encodeWav(16000, s.map(_ / 2)))
    val w3 = MediaKernels.audioFingerprintSpectral(
      MediaKernels.encodeWav(16000, s.map(v => -v)))
    assert(w1 == w2 && w1 == w3) // energies are squares: sign flip too
  }

  test("Vorbis copy is genuinely lossy yet hamming-near; distinct bases stay far") {
    var worstPair = 0
    var bestCross = Int.MaxValue
    for (base <- 0 until 24) {
      val s = sig(base)
      val wav = MediaKernels.encodeWav(16000, s)
      val ogg = Vorbis.encode(16000, s, twoPass = false)
      val d = Vorbis.decode(ogg)
      assert(d != null && d.pcm.length == s.length)
      assert(!d.pcm.sameElements(s), s"base $base: single-pass decode must be lossy")
      val fw = MediaKernels.audioFingerprintSpectral(wav)
      val fo = MediaKernels.audioFingerprintSpectral(ogg)
      assert(fw != null && fo != null)
      val h = hamming(fw, fo)
      worstPair = math.max(worstPair, h)
      assert(h <= 3, s"base $base: lossy pair hamming $h")
      if (base > 0) {
        val prev = MediaKernels.audioFingerprintSpectral(
          MediaKernels.encodeWav(16000, sig(base - 1)))
        val cross = hamming(fw, prev)
        bestCross = math.min(bestCross, cross)
        assert(cross >= 16, s"bases ${base - 1}/$base too close: $cross")
      }
    }
    info(s"worst lossy-pair hamming $worstPair, closest cross-base $bestCross")
  }

  test("native Vorbis encoder quality: single-pass > 38 dB, two-pass > 60 dB") {
    val s = sig(3)
    def snr(got: Array[Int]): Double = {
      var e = 0.0
      var p = 0.0
      val m = math.min(s.length, got.length)
      (0 until m).foreach { i =>
        val d = (s(i) - got(i)).toDouble
        e += d * d
        p += s(i).toDouble * s(i)
      }
      if (e == 0) 999.0 else 10 * math.log10(p / e)
    }
    val one = Vorbis.decode(Vorbis.encode(16000, s, twoPass = false))
    val two = Vorbis.decode(Vorbis.encode(16000, s))
    assert(one != null && two != null)
    assert(snr(one.pcm) > 38, s"single-pass snr ${snr(one.pcm)}")
    assert(snr(two.pcm) > 60, s"two-pass snr ${snr(two.pcm)}")
    // floor-0 arm: the residue carries spec/curve with the EXACT
    // decode-side LSP curve, so fidelity matches the floor-1 shape; the
    // stream exercises the legacy floor decode end-to-end from the
    // Scala encoder (cross-checked against the Python mirror decoder —
    // tools/vorbis_codec.py decodes this exact shape, see FIXTURES.md)
    val f0one = Vorbis.decode(Vorbis.encode(16000, s, twoPass = false, floor0 = true))
    val f0two = Vorbis.decode(Vorbis.encode(16000, s, floor0 = true))
    assert(f0one != null && f0two != null)
    assert(snr(f0one.pcm) > 38, s"floor0 single-pass snr ${snr(f0one.pcm)}")
    assert(snr(f0two.pcm) > 60, s"floor0 two-pass snr ${snr(f0two.pcm)}")
    // fingerprints must group the floor-0 and floor-1 encodes of the
    // same recording (the property the lossy-dedup rotation arm needs)
    val fpF1 = MediaKernels.audioFingerprintSpectral(Vorbis.encode(16000, s, twoPass = false))
    val fpF0 = MediaKernels.audioFingerprintSpectral(Vorbis.encode(16000, s, twoPass = false, floor0 = true))
    assert(fpF1 != null && fpF0 != null)
    assert(java.lang.Long.bitCount(fpF1 ^ fpF0) <= 3,
      s"floor0/floor1 fingerprint hamming ${java.lang.Long.bitCount(fpF1 ^ fpF0)}")
  }

  test("audio_meta sees the native-encoded Vorbis stream with exact fields") {
    val s = sig(5)
    val m = MediaKernels.audioMetaRow(Vorbis.encode(16000, s))
    assert(m.getString(0) == "ogg" && m.getString(6) == "vorbis")
    assert(m.getInt(1) == 1 && m.getLong(2) == 16000L)
    assert(m.getLong(4) == s.length.toLong) // granule-trimmed sample count
  }

  test("Matroska A_VORBIS decodes to the SAME PCM as the Ogg carriage of the same packets") {
    val s = sig(13)
    val (pkts, _) = Vorbis.encodePacketSeq(16000, s, twoPass = false)
    val mkv = Webm.encodeMkvVorbis(pkts)
    val ogg = Vorbis.encode(16000, s, twoPass = false)
    val viaMkv = MediaKernels.pcmSamplesAny(mkv)
    val viaOgg = MediaKernels.pcmSamplesAny(ogg)
    assert(viaMkv != null && viaOgg != null)
    // Ogg trims to the final granule; Matroska has none — the MKV route
    // keeps the full overlap-add tail, whose prefix must match exactly
    assert(viaMkv.length >= viaOgg.length)
    assert(java.util.Arrays.equals(viaMkv.take(viaOgg.length), viaOgg))
    // fingerprints agree across the two carriages of the same encode
    val fm = MediaKernels.audioFingerprintSpectral(mkv)
    val fo = MediaKernels.audioFingerprintSpectral(ogg)
    assert(fm != null && fo != null && hamming(fm, fo) <= 2)
    // hostile: truncations and flips never throw
    (1 until mkv.length by 131).foreach { n =>
      MediaKernels.pcmSamplesAny(java.util.Arrays.copyOf(mkv, n))
    }
    val rnd = new scala.util.Random(99L)
    (0 until 200).foreach { _ =>
      val c = mkv.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      MediaKernels.audioFingerprintSpectral(c)
    }
  }

  test("audio_transcode: stereo downmixes, transparent mode round-trips near-losslessly") {
    val s0 = sig(17)
    // interleave a fake stereo WAV (L = s, R = s/2) by hand
    val inter = new Array[Int](s0.length * 2)
    (0 until s0.length).foreach { i =>
      inter(2 * i) = s0(i)
      inter(2 * i + 1) = s0(i) / 2
    }
    val stereo = {
      val mono = MediaKernels.encodeWav(16000, inter)
      // patch channels=2 and byte-rate/block-align in the fmt chunk
      mono(22) = 2
      mono(32) = 4
      mono
    }
    val ogg = MediaKernels.audioTranscodeVorbis(stereo, transparent = true)
    assert(ogg != null)
    val d = Vorbis.decode(ogg)
    assert(d != null && d.channels == 1)
    assert(d.pcm.length == s0.length) // frames, not interleaved samples
    // downmix = per-frame average, transparent grid -> exact expected mono
    var i = 0
    while (i < s0.length) {
      val want = (s0(i).toLong + s0(i) / 2) / 2
      assert(math.abs(d.pcm(i) - want) <= 1, s"frame $i")
      i += 1
    }
    // undecodable payloads stay null
    assert(MediaKernels.audioTranscodeVorbis("junk".getBytes, transparent = false) == null)
  }

  test("audio features flow through the lossy decode path") {
    val s = sig(9)
    val ogg = Vorbis.encode(16000, s, twoPass = false)
    // the EXACT tier must NOT claim a lossy payload
    assert(MediaKernels.audioFingerprint(ogg) == null)
    // ... while the spectral tier decodes it
    assert(MediaKernels.audioFingerprintSpectral(ogg) != null)
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** AIFF / AIFC / Sun .au (the Mac/Sun-era crawl formats): exact-tier
  * PCM equality across containers, G.711 expansion anchors (formula-
  * derived, checked against the published extrema), meta fields,
  * hostile totality. */
class LegacyAudioSpec extends AnyFunSuite {

  private val samples = Array.tabulate(512)(i =>
    (7000 * math.sin(2 * math.Pi * 0.043 * i) +
      2000 * math.sin(2 * math.Pi * 0.19 * i)).toInt)

  test("AIFF (BE), AIFC (sowt) and .au PCM16 decode bit-identical to WAV") {
    val viaWav = MediaKernels.pcmSamples(MediaKernels.encodeWav(16000, samples))
    val viaAiff = MediaKernels.pcmSamples(MediaKernels.encodeAiff(16000, samples))
    val viaSowt = MediaKernels.pcmSamples(
      MediaKernels.encodeAiff(16000, samples, sowt = true))
    val viaAu = MediaKernels.pcmSamples(MediaKernels.encodeAu(3, 16000, samples))
    assert(viaWav != null && viaAiff != null && viaSowt != null && viaAu != null)
    assert(java.util.Arrays.equals(viaWav, viaAiff))
    assert(java.util.Arrays.equals(viaWav, viaSowt))
    assert(java.util.Arrays.equals(viaWav, viaAu))
    // and therefore the exact fingerprints collide across all four
    val fp = MediaKernels.audioFingerprint(MediaKernels.encodeWav(16000, samples))
    assert(fp == MediaKernels.audioFingerprint(MediaKernels.encodeAiff(16000, samples)))
    assert(fp == MediaKernels.audioFingerprint(MediaKernels.encodeAu(3, 16000, samples)))
  }

  test("G.711 mu-law round-trips every code and hits the published extrema") {
    // decode(encode(decode(c))) == decode(c) for all 256 codes, and the
    // expansion extrema match the published table bounds (+-32124)
    var maxMag = 0
    (0 until 256).foreach { c =>
      val au = MediaKernels.encodeAu(1, 8000, Array(0))
      au(24) = c.toByte
      val pcm = MediaKernels.auSamples(au)(0)
      maxMag = math.max(maxMag, math.abs(pcm))
      val re = MediaKernels.encodeAu(1, 8000, Array(pcm))
      val back = MediaKernels.auSamples(re)(0)
      assert(back == pcm, s"code $c: $pcm -> $back")
    }
    assert(maxMag == 32124)
    // A-law extrema: +-32256; quietest codes +-8
    var maxA = 0
    var minA = Int.MaxValue
    (0 until 256).foreach { c =>
      val au = MediaKernels.encodeAu(27, 8000, Array(c))
      val pcm = MediaKernels.auSamples(au)(0)
      maxA = math.max(maxA, math.abs(pcm))
      minA = math.min(minA, math.abs(pcm))
    }
    assert(maxA == 32256 && minA == 8)
  }

  test("audio_meta reads AIFF extended-float rates and .au codec fields") {
    val m1 = MediaKernels.audioMetaRow(MediaKernels.encodeAiff(22050, samples))
    assert(m1.getString(0) == "aiff" && m1.getLong(2) == 22050L &&
      m1.getInt(3) == 16 && m1.getLong(4) == samples.length.toLong &&
      m1.getString(6) == "pcm")
    val m2 = MediaKernels.audioMetaRow(
      MediaKernels.encodeAiff(44100, samples, sowt = true))
    assert(m2.getString(0) == "aiff" && m2.getString(6) == "sowt" &&
      m2.getLong(2) == 44100L)
    val m3 = MediaKernels.audioMetaRow(MediaKernels.encodeAu(1, 8000, samples))
    assert(m3.getString(0) == "au" && m3.getString(6) == "ulaw" &&
      m3.getInt(3) == 8 && m3.getLong(4) == samples.length.toLong)
    val m4 = MediaKernels.audioMetaRow(MediaKernels.encodeAu(27, 8000, samples))
    assert(m4.getString(6) == "alaw")
  }

  test("mu-law copy groups with its source through the spectral tier only") {
    val big = Array.tabulate(2048)(i => graft.tools.GenMedia.lossyAudioSample(42, i))
    val wav = MediaKernels.encodeWav(16000, big)
    val au = MediaKernels.encodeAu(1, 16000, big)
    // exact tier: different PCM, different fingerprints
    assert(MediaKernels.audioFingerprint(wav) != MediaKernels.audioFingerprint(au))
    // spectral tier: hamming-near
    val h = java.lang.Long.bitCount(
      MediaKernels.audioFingerprintSpectral(wav) ^
        MediaKernels.audioFingerprintSpectral(au))
    assert(h <= 3, s"mu-law spectral hamming $h")
  }

  test("truncations and flips never throw") {
    val fixtures = Seq(
      MediaKernels.encodeAiff(16000, samples),
      MediaKernels.encodeAiff(16000, samples, sowt = true),
      MediaKernels.encodeAu(1, 8000, samples),
      MediaKernels.encodeAu(3, 16000, samples))
    val rnd = new scala.util.Random(5L)
    fixtures.foreach { good =>
      (1 until good.length by 53).foreach { n =>
        val t = java.util.Arrays.copyOf(good, n)
        MediaKernels.audioMetaRow(t)
        MediaKernels.audioFingerprintSpectral(t)
      }
      (0 until 300).foreach { _ =>
        val c = good.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        MediaKernels.audioMetaRow(c)
        MediaKernels.audioFingerprintSpectral(c)
      }
    }
  }
}

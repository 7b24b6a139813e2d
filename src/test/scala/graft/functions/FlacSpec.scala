package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Native FLAC codec: lossless round-trips across every encoder path,
  * cross-container fingerprint equality, and hostile-input behavior. */
class FlacSpec extends AnyFunSuite {

  private def signal(seed: Long, n: Int): Array[Int] =
    Array.tabulate(n) { i =>
      ((Dedup.mix64(seed * 7919L + i) % 8192L).toInt)
    }

  test("mono16 round-trip is bit-exact (FIXED predictors + rice)") {
    for ((seed, n) <- Seq((1L, 256), (2L, 4096), (3L, 5000), (4L, 10000))) {
      val s = signal(seed, n)
      val dec = Flac.decode(Flac.encodeMono16(16000, s))
      assert(dec != null, s"seed $seed n $n")
      assert(dec.toSeq == s.toSeq, s"seed $seed n $n lossless")
    }
  }

  test("smooth and constant signals round-trip (order selection + constant-ish residuals)") {
    val ramp = Array.tabulate(3000)(i => i % 1024)       // order-1/2 friendly
    val const = Array.fill(2000)(-1234)                   // constant residual
    val spiky = Array.tabulate(2000)(i => if (i % 97 == 0) 30000 else 0)
    for (s <- Seq(ramp, const, spiky))
      assert(Flac.decode(Flac.encodeMono16(8000, s)).toSeq == s.toSeq)
  }

  test("full-range extremes round-trip without overflow") {
    val s = Array.tabulate(1000)(i => if (i % 2 == 0) 32767 else -32768)
    assert(Flac.decode(Flac.encodeMono16(8000, s)).toSeq == s.toSeq)
  }

  test("fingerprints are identical across WAV and FLAC containers") {
    val s = Array.tabulate(256)(i => graft.tools.GenMedia.audioDedupSample(5L, i))
    val wav = MediaKernels.encodeWav(16000, s)
    val flac = Flac.encodeMono16(16000, s)
    val fpW = MediaKernels.audioFingerprint(wav)
    val fpF = MediaKernels.audioFingerprint(flac)
    assert(fpW != null && fpF != null && fpW == fpF)
    // features too
    val a = MediaKernels.audioFeaturesRow(wav)
    val b = MediaKernels.audioFeaturesRow(flac)
    assert(a != null && b != null)
    (0 until 4).foreach(i => assert(a.get(i, null) == b.get(i, null)))
  }

  test("audio dedup fixture: every (i, i+250) pair crosses containers with equal fingerprints") {
    (0L until 10L).foreach { i =>
      val a = graft.tools.GenMedia.audioDedupFixture(i)
      val b = graft.tools.GenMedia.audioDedupFixture(i + 250)
      val aWav = a(0) == 'R'
      val bWav = b(0) == 'R'
      assert(aWav != bWav, s"pair ($i, ${i + 250}) must cross WAV/FLAC")
      assert(MediaKernels.audioFingerprint(a) == MediaKernels.audioFingerprint(b))
    }
  }

  test("stereo round-trips through every channel assignment, bit-exact") {
    val n = 5000
    val left = signal(31L, n)
    val right = Array.tabulate(n)(i => signal(37L, n)(i) / 2 + (if (i % 3 == 0) 11 else -4))
    for (asgn <- Seq(1, 8, 9, 10)) { // independent, L/S, R/S, M/S
      val dec = Flac.decode(Flac.encodeStereo16(44100, left, right, asgn))
      assert(dec != null, s"assignment $asgn")
      assert(dec.length == 2 * n)
      val gotL = Array.tabulate(n)(i => dec(2 * i))
      val gotR = Array.tabulate(n)(i => dec(2 * i + 1))
      assert(gotL.toSeq == left.toSeq, s"left channel, assignment $asgn")
      assert(gotR.toSeq == right.toSeq, s"right channel, assignment $asgn")
    }
    // full-range extremes through the side channel (17-bit values)
    val lx = Array.tabulate(600)(i => if (i % 2 == 0) 32767 else -32768)
    val rx = Array.tabulate(600)(i => if (i % 2 == 0) -32768 else 32767)
    for (asgn <- Seq(8, 9, 10)) {
      val dec = Flac.decode(Flac.encodeStereo16(8000, lx, rx, asgn))
      assert(dec != null && Array.tabulate(600)(i => dec(2 * i)).toSeq == lx.toSeq &&
        Array.tabulate(600)(i => dec(2 * i + 1)).toSeq == rx.toSeq, s"extremes asgn $asgn")
    }
  }

  test("corrupt payloads return null, never throw") {
    val good = Flac.encodeMono16(16000, signal(9L, 4000))
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val c = good.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Flac.decode(c) // null or garbage-but-bounded; must not throw
    }
    (0 until good.length by 13).foreach { cut =>
      Flac.decode(java.util.Arrays.copyOf(good, cut))
    }
    assert(Flac.decode("not flac at all".getBytes) == null)
    assert(Flac.decode(null) == null)
  }

  test("audio_meta still reports FLAC header metadata (unchanged surface)") {
    val flac = Flac.encodeMono16(22050, signal(2L, 500))
    val row = MediaKernels.audioMetaRow(flac)
    assert(row.getUTF8String(0).toString == "flac")
    assert(row.getInt(1) == 1)      // channels
    assert(row.getLong(2) == 22050) // rate
    assert(row.getInt(3) == 16)     // bits
    assert(row.getLong(4) == 500)   // samples
  }
}

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
    def kind(x: Array[Byte]): Char = x(0) match {
      case 'R' => 'w' // RIFF WAV
      case 'f' => 'f' // native fLaC
      case 'O' => 'o' // Ogg-FLAC
      case 'F' => 'a' // FORM AIFF/AIFC
      case '.' => 'u' // Sun .au
      case other => fail(s"unknown container byte $other")
    }
    val seen = scala.collection.mutable.Set.empty[Char]
    (0L until 10L).foreach { i =>
      val a = graft.tools.GenMedia.audioDedupFixture(i)
      val b = graft.tools.GenMedia.audioDedupFixture(i + 250)
      assert(kind(a) != kind(b), s"pair ($i, ${i + 250}) must cross containers")
      seen += kind(a); seen += kind(b)
      assert(MediaKernels.audioFingerprint(a) == MediaKernels.audioFingerprint(b))
    }
    assert(seen == Set('w', 'f', 'o', 'a', 'u'),
      s"rotation must cover all five lossless containers: $seen")
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

  test("WAV 8/24/32-bit PCM decode to the 16-bit range (8-bit via javax.sound)") {
    // 8-bit: EXTERNAL bytes from the platform's javax.sound writer
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false) // unsigned 8
    val raw = Array.tabulate(64)(i => (i * 4).toByte) // unsigned 0..252
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, raw.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val dec8 = MediaKernels.audioFeaturesRow(bos.toByteArray)
    assert(dec8 != null && dec8.getLong(0) == 64L)
    // hand check the normalization on one hand-built 8-bit file
    val direct = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(bos.toByteArray)
      out.toByteArray
    }
    val sEight = {
      val m = MediaKernels.getClass.getDeclaredMethods
        .find(_.getName == "wavSamples").get
      m.setAccessible(true)
      m.invoke(MediaKernels, direct).asInstanceOf[Array[Int]]
    }
    assert(sEight.take(4).toSeq == Seq((0 - 128) * 257, (4 - 128) * 257,
      (8 - 128) * 257, (12 - 128) * 257))

    // 24-bit and 32-bit: hand-built single-chunk WAVs; expectation = the
    // high 16 bits of the signed sample
    def wav(bits: Int, data: Array[Byte], channels: Int = 1, rate: Int = 8000): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
      out.write("RIFF".getBytes); w32(36 + data.length); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); w32(16); w16(1); w16(channels); w32(rate)
      w32(rate * channels * bits / 8); w16(channels * bits / 8); w16(bits)
      out.write("data".getBytes); w32(data.length); out.write(data, 0, data.length)
      out.toByteArray
    }
    val vals24 = Seq(0x123456, -0x123456, 0x7FFFFF, -0x800000)
    val d24 = vals24.flatMap(v => Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte)).toArray
    val f24 = MediaKernels.audioFingerprint(wav(24, d24 ++ Array.fill(186)(0.toByte)))
    assert(f24 != null) // decodes; exact values checked via features below
    val feat24 = MediaKernels.audioFeaturesRow(wav(24, d24))
    val expect24 = vals24.map(v => (v >> 8).toLong)
    assert(feat24.getLong(0) == 4L)
    assert(feat24.getLong(3) == expect24.map(math.abs).max) // peak = |high 16 bits|
    val vals32 = Seq(0x12345678, -0x12345678)
    val d32 = vals32.flatMap(v => Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)).toArray
    val feat32 = MediaKernels.audioFeaturesRow(wav(32, d32))
    // arithmetic >> floors, so the negative sample's magnitude is one larger
    assert(feat32.getLong(0) == 2L &&
      feat32.getLong(3) == math.abs((-0x12345678) >> 16).toLong)
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

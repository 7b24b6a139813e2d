package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation check of the native Vorbis decoder: the
  * committed corpus (src/test/resources/vorbis/corpus.txt) holds 24
  * Ogg-Vorbis streams generated AND decoded by the independent Python
  * codec (tools/vorbis_codec.py) — mono/stereo, square-polar coupling,
  * residue types 0/1/2 with multi-pass cascades, codebook lookup types
  * 0/1/2, single and mixed blocksizes (window switching), multi-packet
  * pages and page-spanning packets. The Scala decode must match the
  * Python PCM within +-2 LSB everywhere (both implementations use IEEE
  * binary64; the tolerance absorbs libm cos/sin ULP differences across
  * runtimes). Plus hostile-totality sweeps. */
class VorbisSpec extends AnyFunSuite {

  private def corpus(): Seq[(Array[Byte], Int, Int, Array[Int])] = {
    val in = getClass.getResourceAsStream("/vorbis/corpus.txt")
    assert(in != null, "committed vorbis corpus missing")
    scala.io.Source.fromInputStream(in).getLines().toSeq.map { line =>
      val p = line.split(" ")
      val ogg = java.util.Base64.getDecoder.decode(p(0))
      val pcmBytes = java.util.Base64.getDecoder.decode(p(3))
      val pcm = Array.tabulate(pcmBytes.length / 2)(i =>
        ((pcmBytes(2 * i) & 0xFF) | (pcmBytes(2 * i + 1) << 8)).toShort.toInt)
      (ogg, p(1).toInt, p(2).toInt, pcm)
    }
  }

  test("corpus decodes within +-2 LSB of the independent Python decoder") {
    var maxDiff = 0
    for (((ogg, ch, rate, expected), idx) <- corpus().zipWithIndex) {
      val d = Vorbis.decode(ogg)
      assert(d != null, s"[$idx] null decode")
      assert(d.channels == ch && d.rate == rate, s"[$idx] ident fields")
      assert(d.pcm.length == expected.length,
        s"[$idx] length ${d.pcm.length} != ${expected.length}")
      var i = 0
      while (i < expected.length) {
        val diff = math.abs(d.pcm(i) - expected(i))
        assert(diff <= 2, s"[$idx] sample $i: ${d.pcm(i)} vs ${expected(i)}")
        if (diff > maxDiff) maxDiff = diff
        i += 1
      }
    }
    info(s"${corpus().size} streams, max deviation $maxDiff LSB")
  }

  test("deep randomized sweep decodes bit-near (auto-cancels when absent)") {
    // the H.264 two-layer pattern: tools/vorbis_codec.py sweep writes
    // 200 randomized-config streams to /tmp — regenerate with
    // `python3 tools/vorbis_codec.py sweep` to arm this layer
    val f = new java.io.File("/tmp/vorbis_sweep.txt")
    assume(f.exists, "/tmp/vorbis_sweep.txt absent — run tools/vorbis_codec.py sweep")
    var n = 0
    scala.io.Source.fromFile(f).getLines().zipWithIndex.foreach { case (line, idx) =>
      val p = line.split(" ")
      val ogg = java.util.Base64.getDecoder.decode(p(0))
      val pcmBytes = java.util.Base64.getDecoder.decode(p(3))
      val d = Vorbis.decode(ogg)
      assert(d != null, s"[$idx] null decode")
      assert(d.pcm.length == pcmBytes.length / 2, s"[$idx] length")
      var i = 0
      while (i < d.pcm.length) {
        val exp = ((pcmBytes(2 * i) & 0xFF) | (pcmBytes(2 * i + 1) << 8)).toShort.toInt
        assert(math.abs(d.pcm(i) - exp) <= 2, s"[$idx] sample $i")
        i += 1
      }
      n += 1
    }
    info(s"$n randomized streams within 2 LSB")
  }

  test("info reads channels/rate/granule without sample decode") {
    val (ogg, ch, rate, pcm) = corpus().head
    val m = Vorbis.info(ogg)
    assert(m != null && m(0) == ch && m(1) == rate)
    assert(m(2) == pcm.length / ch) // final granule = trimmed sample count
  }

  test("hostile bytes: truncations and flips never throw, return null or degrade") {
    val (ogg, _, _, _) = corpus().head
    (1 until ogg.length by 97).foreach { n =>
      Vorbis.decode(java.util.Arrays.copyOf(ogg, n))
      Vorbis.info(java.util.Arrays.copyOf(ogg, n))
    }
    val rnd = new scala.util.Random(42L)
    (0 until 400).foreach { _ =>
      val c = ogg.clone()
      var k = 0
      while (k < 3) { c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte; k += 1 }
      Vorbis.decode(c)
    }
    assert(Vorbis.decode(null) == null)
    assert(Vorbis.decode(Array[Byte](1, 2, 3)) == null)
    assert(Vorbis.decode("OggS".getBytes ++ new Array[Byte](100)) == null)
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.H264Fixtures

/** Randomized cross-implementation sweep: decodes the corpora
  * tools/gen_h264_sweep.py writes to /tmp (random dims, MB mixes,
  * full-range QPs, slices, deltas; mirror-verified at generation time)
  * and requires bit-exact planes from the Scala decoder. Auto-cancels
  * when the corpus files are absent — regenerate with
  * `python3 tools/gen_h264_sweep.py` to arm it. The qp-edge fixture
  * check below always runs (the bug class the sweep caught). */
class H264SweepSpec extends AnyFunSuite {

  private def fnv(a: Array[Int]): Long = {
    var h = -3750763034362895579L
    var i = 0
    while (i < a.length) { h = (h ^ a(i)) * 1099511628211L; i += 1 }
    h
  }

  private def sweep(path: String): Unit = {
    assume(new java.io.File(path).exists,
      s"$path absent — run tools/gen_h264_sweep.py")
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    for ((line, idx) <- lines.zipWithIndex) {
      val p = line.split(" ")
      val f = H264.decodeAnnexB(java.util.Base64.getDecoder.decode(p(0)))
      assert(f != null, s"[$idx] null decode")
      assert(f.w == p(1).toInt && f.h == p(2).toInt, s"[$idx] dims")
      assert(fnv(f.y) == p(3).toLong && fnv(f.u) == p(4).toLong &&
        fnv(f.v) == p(5).toLong, s"[$idx] planes differ from Python")
    }
    info(s"${lines.size} streams bit-exact")
  }

  test("randomized CABAC corpus decodes bit-exactly") {
    sweep("/tmp/cabac_sweep.txt")
  }

  test("randomized CAVLC corpus decodes bit-exactly") {
    sweep("/tmp/cavlc_sweep.txt")
  }

  test("qp-edge fixtures (mod-52 QP arithmetic at 0 and 51) stay pinned") {
    // CAVLC edges ride the extras tail; CABAC edges the cabac tail —
    // the generic bit-exactness loops in H264Spec cover them too, but
    // this pin names the bug class (spec 7.4.5: signaled mb_qp_delta is
    // the effective mod-52 change, not a clipped request)
    assert(H264Fixtures.extCount >= 22 && H264Fixtures.cabacCount >= 10)
    for (i <- Seq(H264Fixtures.extCount - 2, H264Fixtures.extCount - 1)) {
      val f = H264.decodeAnnexB(H264Fixtures.streamAt(i))
      assert(f != null && fnv(f.y) == H264Fixtures.expY(i), s"cavlc edge $i")
    }
    for (i <- Seq(H264Fixtures.cabacCount - 2, H264Fixtures.cabacCount - 1)) {
      val f = H264.decodeAnnexB(H264Fixtures.cabacStreamAt(i))
      assert(f != null && fnv(f.y) == H264Fixtures.cabacExpY(i), s"cabac edge $i")
    }
  }
}

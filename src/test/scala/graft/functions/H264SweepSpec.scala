package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.H264Fixtures

/** Randomized cross-implementation sweep against the Python mirror
  * codec, two layers:
  *
  *  - a COMMITTED compact corpus (src/test/resources/h264_sweep,
  *    24 streams/entropy layer, distinct seeds) that ALWAYS runs —
  *    a fresh clone keeps this assurance with no pre-step;
  *  - the deep /tmp corpora tools/gen_h264_sweep.py writes (default
  *    120, up to 500/layer: random dims, MB mixes, full-range QPs,
  *    slices, deltas; mirror-verified at generation time), which
  *    auto-cancel when absent — regenerate with
  *    `python3 tools/gen_h264_sweep.py` to arm them.
  *
  * Every stream must decode bit-exactly. The qp-edge fixture check
  * below always runs (the bug class the sweep caught). */
class H264SweepSpec extends AnyFunSuite {

  private def fnv(a: Array[Int]): Long = {
    var h = -3750763034362895579L
    var i = 0
    while (i < a.length) { h = (h ^ a(i)) * 1099511628211L; i += 1 }
    h
  }

  private def check(lines: Seq[String]): Unit = {
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

  private def sweep(path: String): Unit = {
    assume(new java.io.File(path).exists,
      s"$path absent — run tools/gen_h264_sweep.py")
    check(scala.io.Source.fromFile(path).getLines().toSeq)
  }

  private def resource(name: String): Unit = {
    val in = getClass.getResourceAsStream(s"/h264_sweep/$name")
    assert(in != null, s"committed corpus /h264_sweep/$name missing")
    check(scala.io.Source.fromInputStream(in).getLines().toSeq)
  }

  test("committed CABAC corpus decodes bit-exactly (always runs)") {
    resource("cabac_sweep.txt")
  }

  test("committed CAVLC corpus decodes bit-exactly (always runs)") {
    resource("cavlc_sweep.txt")
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

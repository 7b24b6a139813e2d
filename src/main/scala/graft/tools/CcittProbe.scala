// scratch: CCITT decode throughput at realistic fax-page geometry
// (1728x1100, the T.4 standard width) — pages/sec per thread for G4 and
// G3-2D, recorded in PLANS.md so the scanned-archive tier has a measured
// per-row cost alongside the JPEG/WebP numbers.
package graft.tools

import graft.functions.Ccitt

object CcittProbe {
  def main(args: Array[String]): Unit = {
    val w = 1728; val h = 1100
    // text-ish page: dense change structure, the realistic worst half
    val bits = Array.tabulate[Byte](w * h) { i =>
      val x = i % w; val y = i / w
      if ((y % 11) < 7 && (x * 31 + y * 17) % 13 < 5) 1 else 0
    }
    val g4 = Ccitt.encodeG4(bits, w, h)
    val g3 = Ccitt.encodeG3(bits, w, h, twoDim = true)
    println(f"page ${w}x$h g4=${g4.length}%d bytes g3_2d=${g3.length}%d bytes (raw ${w * h / 8})")
    def bench(name: String, f: () => Array[Byte]): Unit = {
      (1 to 3).foreach(_ => f()) // warm
      val n = 20
      val t0 = System.nanoTime()
      (1 to n).foreach { _ => require(f() != null) }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name: ${n / dt}%.1f pages/sec/thread (${dt / n * 1000}%.1f ms/page)")
    }
    bench("g4_decode", () => Ccitt.decodeG4(g4, w, h))
    bench("g3_2d_decode", () => Ccitt.decodeG3(g3, w, h, twoDim = true))
    require(java.util.Arrays.equals(Ccitt.decodeG4(g4, w, h), bits))
  }
}

package graft.tools

/** Single-thread Vorbis decode throughput probe (scratch). */
object VorbisPerfProbe {
  def main(args: Array[String]): Unit = {
    val n = 65536
    val sig = Array.tabulate(n)(i =>
      (6000 * math.sin(2 * math.Pi * 0.021 * i) +
        3000 * math.sin(2 * math.Pi * 0.13 * i)).toInt)
    val ogg = graft.functions.Vorbis.encode(16000, sig, twoPass = false)
    // warmup
    (0 until 3).foreach(_ => graft.functions.Vorbis.decode(ogg))
    val reps = 20
    val t0 = System.nanoTime()
    var sink = 0L
    (0 until reps).foreach { _ =>
      sink += graft.functions.Vorbis.decode(ogg).pcm.length
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val samplesPerSec = n.toLong * reps / secs
    val mbPerSec = ogg.length.toLong * reps / secs / 1e6
    println(f"decode: ${samplesPerSec / 1e6}%.2f Msamples/s, $mbPerSec%.1f MB-ogg/s (${ogg.length} bytes, sink $sink)")
  }
}

package graft.functions
import org.scalatest.funsuite.AnyFunSuite

class MediaHostilitySpec extends AnyFunSuite {
  test("multi-flip corruptions across every media reader surface: no throws, bounded time") {
    val fixtures: Seq[(String, Array[Byte])] = Seq(
      "cabac-mp4" -> graft.tools.GenMedia.h264CabacVideoFixture(1),
      "fmp4" -> graft.tools.GenMedia.h264FragVideoFixture(3),
      "mkv-avc" -> graft.tools.GenMedia.mkvAvcVideoFixture(5),
      "avi-avc" -> graft.tools.GenMedia.aviAvcVideoFixture(2),
      "ts-avc" -> graft.tools.GenMedia.tsAvcVideoFixture(4),
      "ts-mp3" -> MpegTs.encodeAudioTs(0x03, Seq(MediaKernels.encodeMp3Header(44100L, 6))),
      "ts-aac" -> MpegTs.encodeAudioTs(0x0F, Seq(MediaKernels.encodeAdtsHeader(48000L, 2, 9))),
      "ogg-vorbis" -> Ogg.encodeOggAudio("vorbis", 2, 44100L, 88200L),
      "ogg-flac" -> Ogg.encodeOggFlac(Flac.encodeMono16(16000,
        Array.tabulate(256)(i => ((i * 37) % 4001) - 2000)), 256L),
      "mkv-subs" -> Webm.encodeMkvSubtitles(Seq("alpha", "beta", "gamma")),
      "adts" -> MediaKernels.encodeAdtsHeader(22050L, 1, 4),
      "avif" -> ImageKernels.encodeHeifHeader("av01", 128, 96, 32, 24),
      "heic" -> ImageKernels.encodeHeifHeader("hvc1", 200, 150, 50, 37),
      "apng" -> graft.tools.GenMedia.apngVideoFixture(2),
      "ogg-vorbis-real" -> Vorbis.encode(16000,
        Array.tabulate(2048)(i => graft.tools.GenMedia.lossyAudioSample(1, i)),
        twoPass = false),
      "mkv-vorbis" -> graft.tools.GenMedia.lossyAudioDedupFixture(3),
      "aiff" -> graft.tools.GenMedia.legacyAudioFixture(1),
      "au-ulaw" -> graft.tools.GenMedia.legacyAudioFixture(3),
      "ogv-theora" -> graft.tools.GenMedia.theoraFixture(7)
    )
    val rnd = new scala.util.Random(20260816L)
    val t0 = System.nanoTime()
    var total = 0
    for ((name, good) <- fixtures) {
      var i = 0
      while (i < 1500) {
        val c = good.clone()
        // 1-4 byte flips per trial, occasionally a truncation too
        var k = 0
        val flips = 1 + rnd.nextInt(4)
        while (k < flips) { c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte; k += 1 }
        val buf = if (i % 7 == 0) java.util.Arrays.copyOf(c, 1 + rnd.nextInt(c.length)) else c
        // every reader that could see crawl bytes
        MediaKernels.videoFrames(buf, 4)
        MediaKernels.videoMetaRow(buf)
        MediaKernels.audioMetaRow(buf)
        MediaKernels.audioFingerprintSpectral(buf)
        ImageKernels.imageMetaRow(buf)
        DocKernels.docText(buf, "auto")
        i += 1
      }
      total += 1500
      info(s"$name: 1500 trials clean")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"$total trials in $secs%.1f s")
    assert(secs < 600, "hostility sweep too slow")
  }
}

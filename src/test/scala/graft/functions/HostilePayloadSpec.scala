package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Cross-codec hostile-payload sweep: every binary decode entry point must
  * return null/empty on garbage, on TRUNCATIONS of valid payloads, and on
  * FORMAT-CONFUSED payloads (one format's magic grafted onto another's
  * body) — never throw, hang, or over-allocate. The per-codec suites fuzz
  * within their own format; this one fuzzes the DISPATCH seams, where a
  * 100 TB crawl's mislabeled payloads actually land. */
class HostilePayloadSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(101)

  // representative valid payloads, one per family
  private def valids: Seq[(String, Array[Byte])] = Seq(
    "png" -> ImageKernels.encodePng(24, 16, graft.tools.GenImages.pattern(1, 24, 16)),
    "bmp" -> ImageKernels.encodeBmp(24, 16, graft.tools.GenImages.pattern(2, 24, 16)),
    "jpeg" -> Jpeg.encodeYcc420(24, 16, graft.tools.GenImages.pattern(3, 24, 16)),
    "tiff" -> ImageKernels.encodeTiffGray(24, 16, graft.tools.GenImages.pattern(4, 24, 16)),
    "webp" -> Webp.encodeGray(24, 16, graft.tools.GenImages.pattern(5, 24, 16)),
    "wav" -> MediaKernels.encodeWav(16000, Array.tabulate(256)(i => (i % 251) - 125)),
    "flac" -> Flac.encodeMono16(16000, Array.tabulate(256)(i => (i % 251) - 125)),
    "mp4" -> MediaKernels.encodeMp4Header(320, 240, 1000),
    "avi" -> MediaKernels.encodeAviHeader(320, 240, 33333, 30))

  private def probeAll(b: Array[Byte]): Unit = {
    ImageKernels.imageMeta(b)
    ImageKernels.decodeGrayPublic(b)
    ImageKernels.phash(b)
    MediaKernels.audioMetaRow(b)
    MediaKernels.audioFeaturesRow(b)
    MediaKernels.audioFingerprint(b)
    MediaKernels.videoMetaRow(b)
    Flac.decode(b)
    Jpeg.decode(b)
    try graft.engine.Pdf.extractText(b)
    catch { case _: IllegalArgumentException => () } // diagnosable reject ok
  }

  test("pure random bytes never throw in any decoder") {
    (1 to 60).foreach { _ =>
      probeAll(Array.fill(1 + rnd.nextInt(4096))(rnd.nextInt(256).toByte))
    }
    probeAll(Array.empty[Byte])
  }

  test("truncations of every valid payload never throw in any decoder") {
    valids.foreach { case (name, full) =>
      (0 until full.length by math.max(1, full.length / 40)).foreach { n =>
        probeAll(java.util.Arrays.copyOf(full, n))
      }
    }
  }

  test("format-confused payloads (magic A, body B) never throw") {
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A),
      Array[Byte]('B', 'M'),
      Array[Byte](0xFF.toByte, 0xD8.toByte),
      Array[Byte]('I', 'I', 42, 0),
      Array[Byte]('M', 'M', 0, 42),
      "RIFF1234WAVE".getBytes,
      "RIFF1234AVI ".getBytes,
      "RIFF1234WEBPVP8L".getBytes,
      "fLaC".getBytes,
      "%PDF-1.4\n".getBytes,
      "GIF89a".getBytes)
    for ((_, body) <- valids; magic <- magics) {
      val confused = magic ++ body
      probeAll(confused)
      // and the magic alone, plus magic + random tail
      probeAll(magic)
      probeAll(magic ++ Array.fill(64)(rnd.nextInt(256).toByte))
    }
  }

  test("hostile dimension/length fields cannot force large allocations") {
    // claimed-huge dims across headers: decode must refuse fast, not OOM.
    // (bounds: jpeg 64Mpx / progressive 16Mpx, png via rawLen, flac 2^28
    // samples, tiff 64Mpx)
    val hugePng = ImageKernels.encodePng(4, 4, Array.fill(16)(7))
    // overwrite IHDR width with 2^30 (big-endian at offset 16)
    val pp = hugePng.clone()
    pp(16) = 0x40; pp(17) = 0; pp(18) = 0; pp(19) = 0
    val t0 = System.nanoTime()
    probeAll(pp)
    val hugeTiff = ImageKernels.encodeTiffGray(4, 4, Array.fill(16)(7))
    // ImageWidth tag value at a fixed offset: tags start at 10, value at +8
    val tt = hugeTiff.clone()
    tt(10 + 8) = 0xFF.toByte; tt(10 + 9) = 0xFF.toByte; tt(10 + 10) = 0xFF.toByte
    probeAll(tt)
    assert((System.nanoTime() - t0) / 1e9 < 10.0, "hostile dims must refuse fast")
  }

  // Sketch deserializers face PIPELINE-INTERNAL bytes (a corrupt sketch
  // column is data corruption, not crawl input), so their contract differs
  // from the crawl-facing decoders above: they may throw, but ONLY
  // IllegalArgumentException with a message, and never before validating
  // lengths — a hostile header must not provoke a large allocation. This
  // sweep drives the whole hostile corpus through all five families.
  test("sketch deserializers reject hostile bytes diagnosably, bounded allocation") {
    def probeSketches(b: Array[Byte]): Unit = {
      for (f <- Seq[Array[Byte] => Any](
        SketchKernels.hllDeserialize _, SketchKernels.cmsDeserialize _,
        SketchKernels.logHistDeserialize _, SketchKernels.bloomDeserialize _,
        SketchKernels.kmvDeserialize _)) {
        try { f(b); () } catch {
          case e: IllegalArgumentException => assert(e.getMessage != null)
        }
      }
    }
    (1 to 60).foreach { _ =>
      probeSketches(Array.fill(1 + rnd.nextInt(4096))(rnd.nextInt(256).toByte))
    }
    probeSketches(Array.empty[Byte])
    // magic-correct headers with hostile shape fields: the length check
    // must fire before any shape-derived allocation
    for (magic <- Seq('H', 'C', 'Q', 'B', 'K'); b1 <- Seq(0, 24, 30, 127, -1);
         b2 <- Seq(0, 16, 127, -1)) {
      probeSketches(Array[Byte](magic.toByte, b1.toByte, b2.toByte))
      probeSketches(Array[Byte](magic.toByte, b1.toByte, b2.toByte) ++
        Array.fill(64)(0x5A.toByte))
    }
    // truncations of valid sketches from every family
    val regs = SketchKernels.hllCreate(8)
    SketchKernels.hllUpdate(regs, 8, 12345L)
    val cms = SketchKernels.cmsCreate(2, 64)
    val qh = new Array[Long](SketchKernels.logHistNumBuckets(4))
    val bloom = SketchKernels.bloomCreate(10)
    val kmv = new Array[Long](16)
    val fulls = Seq(
      SketchKernels.hllSerialize(regs, 8),
      SketchKernels.cmsSerialize(cms, 2, 64),
      SketchKernels.logHistSerialize(qh, 4),
      SketchKernels.bloomSerialize(bloom, 10, 5),
      SketchKernels.kmvSerialize(kmv, 3, 16))
    fulls.foreach { full =>
      (0 until full.length by math.max(1, full.length / 25)).foreach { n =>
        probeSketches(java.util.Arrays.copyOf(full, n))
      }
    }
  }
}

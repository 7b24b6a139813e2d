package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-payload sweep for the document/mail tier — the same discipline
  * the image/audio codecs get in HostilePayloadSpec, applied to every
  * text-container parser: on garbage, truncations, single-byte flips,
  * format-confused payloads, and decompression bombs, each entry point
  * must either return a result or throw the diagnosable
  * IllegalArgumentException — never a raw ZipException /
  * XMLStreamException / ArrayIndexOutOfBounds, never a hang, never an
  * unbounded allocation. */
class DocumentHostileSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(401)

  private def tmp(ext: String): java.nio.file.Path =
    java.nio.file.Files.createTempFile("graft-hostile", ext)

  private def bytesOf(write: java.nio.file.Path => Unit, ext: String): Array[Byte] = {
    val f = tmp(ext)
    write(f)
    java.nio.file.Files.readAllBytes(f)
  }

  // every parser entry point under the uniform reject contract
  private val parsers: Seq[(String, Array[Byte] => Any)] = Seq(
    "rtf" -> Rtf.extractParagraphs,
    "doc" -> Doc.extractParagraphs,
    "docx" -> Docx.extractParagraphs,
    "pptx" -> Docx.extractSlides,
    "epub" -> Epub.extractChapters,
    "srt" -> Subtitles.parseSrt,
    "vtt" -> Subtitles.parseVtt,
    "eml" -> (b => Eml.parseEml(b)),
    "mbox" -> (b => Eml.parseMbox(b)))

  private val texts = Seq("alpha paragraph one", "beta — with dash\ttab", "gamma café")

  private def valids: Seq[(String, Array[Byte])] = Seq(
    "rtf" -> bytesOf(Rtf.write(_, texts), ".rtf"),
    "doc" -> bytesOf(Doc.write(_, texts), ".doc"),
    "docx" -> bytesOf(Docx.writeDocx(_, texts), ".docx"),
    "pptx" -> bytesOf(Docx.writePptx(_, texts), ".pptx"),
    "epub" -> bytesOf(Epub.write(_, texts), ".epub"),
    "srt" -> bytesOf(Subtitles.writeSrt(_, Seq((0L, 900L, "a"), (1000L, 1900L, "b"))), ".srt"),
    "vtt" -> bytesOf(Subtitles.writeVtt(_, Seq((0L, 900L, "a"), (1000L, 1900L, "b"))), ".vtt"),
    "eml" -> Eml.writeEml("s", "f@x", "d", "body text", "quoted-printable", multipart = true).getBytes("UTF-8"),
    "mbox" -> bytesOf(Eml.writeMbox(_, Seq(Eml.writeEml("s", "f@x", "d", "b"))), ".mbox"))

  /** result or IllegalArgumentException; anything else is a failure. */
  private def probe(name: String, p: Array[Byte] => Any, b: Array[Byte]): Unit =
    try { p(b); () } catch {
      case _: IllegalArgumentException => ()
      case e: Throwable =>
        fail(s"$name leaked ${e.getClass.getName}: ${e.getMessage}")
    }

  /** The binary-COLUMN kernels must never throw at all (NULL is their
    * reject contract — one hostile row must not kill a job). */
  private def probeColumnKernels(b: Array[Byte]): Unit = {
    graft.functions.DocKernels.docText(b, "auto")
    graft.functions.CharsetKernels.detect(b)
    graft.functions.CharsetKernels.decode(b, "auto")
  }

  test("pure random bytes reject diagnosably in every document parser") {
    (1 to 40).foreach { _ =>
      val b = Array.fill(1 + rnd.nextInt(2048))(rnd.nextInt(256).toByte)
      parsers.foreach { case (n, p) => probe(n, p, b) }
      probeColumnKernels(b)
    }
    parsers.foreach { case (n, p) => probe(n, p, Array.empty[Byte]) }
    probeColumnKernels(Array.empty[Byte])
    probeColumnKernels(null)
  }

  test("truncations of every valid payload reject or partial-parse, never leak") {
    valids.foreach { case (name, full) =>
      val p = parsers.toMap.apply(name)
      (0 until full.length by math.max(1, full.length / 60)).foreach { cut =>
        val t = java.util.Arrays.copyOf(full, cut)
        probe(name, p, t)
        probeColumnKernels(t)
      }
    }
  }

  test("single-byte flips of every valid payload never leak") {
    valids.foreach { case (name, full) =>
      val p = parsers.toMap.apply(name)
      (1 to 60).foreach { _ =>
        val mutated = full.clone()
        val at = rnd.nextInt(mutated.length)
        mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
        probe(name, p, mutated)
      }
    }
  }

  test("format-confused payloads (magic A, body B) never leak") {
    val magics = Seq("{\\rtf1".getBytes, "PK".getBytes,
      "WEBVTT\n\n".getBytes, "From x\n".getBytes,
      Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte))
    for ((_, body) <- valids; magic <- magics; (name, p) <- parsers) {
      probe(name, p, magic ++ body)
      probe(name, p, magic ++ Array.fill(64)(rnd.nextInt(256).toByte))
    }
  }

  test("zip bombs: over-cap part and over-cap total reject fast, bounded") {
    val t0 = System.nanoTime()
    // one entry expanding past the 64 MiB per-part cap (tiny on disk)
    def zipWith(entries: Seq[(String, Long)]): Array[Byte] = {
      val bout = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bout)
      val zeros = new Array[Byte](1 << 16)
      entries.foreach { case (entry, size) =>
        z.putNextEntry(new java.util.zip.ZipEntry(entry))
        var left = size
        while (left > 0) {
          val n = math.min(left, zeros.length).toInt
          z.write(zeros, 0, n); left -= n
        }
        z.closeEntry()
      }
      z.close()
      bout.toByteArray
    }
    val partBomb = zipWith(Seq("word/document.xml" -> (100L << 20)))
    val e1 = intercept[IllegalArgumentException](Docx.extractParagraphs(partBomb))
    assert(e1.getMessage.contains("64 MiB"), e1.getMessage)
    // many under-cap entries expanding past the 256 MiB total cap — the
    // epub walk keeps EVERY entry, so the total cap is the defense
    val totalBomb = zipWith(
      Seq("META-INF/container.xml" -> 100L) ++
        (1 to 10).map(i => s"ch$i.xhtml" -> (60L << 20)))
    val e2 = intercept[IllegalArgumentException](Epub.extractChapters(totalBomb))
    assert(e2.getMessage.contains("256 MiB"), e2.getMessage)
    // EPUB enforces the SAME 64 MiB per-part bound as docx (r14 VERDICT
    // #8 parity check): one oversized chapter rejects before allocation
    val epubPartBomb = zipWith(Seq(
      "META-INF/container.xml" -> 100L, "big.xhtml" -> (100L << 20)))
    val e3 = intercept[IllegalArgumentException](Epub.extractChapters(epubPartBomb))
    assert(e3.getMessage.contains("64 MiB"), e3.getMessage)
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "bombs must reject bounded")
  }
}

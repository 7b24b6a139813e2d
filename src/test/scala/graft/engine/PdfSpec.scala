package graft.engine

import graft.SparkSpec
import java.nio.file.Files

/** Native PDF text extraction: round-trips (raw + Flate), page order,
  * string escapes, operator coverage, hostile-input behavior, and the
  * distributed Sources face. */
class PdfSpec extends SparkSpec {

  private def roundTrip(pages: Seq[String], compress: Boolean): Vector[String] = {
    val f = Files.createTempFile("graft-pdf", ".pdf")
    Pdf.write(f, pages, compress)
    Pdf.extractText(Files.readAllBytes(f))
  }

  test("multi-page round-trip preserves page order and line structure") {
    val pages = Seq("first page\nline two", "second page", "third\na\nb\nc")
    assert(roundTrip(pages, compress = false) == pages.toVector)
    assert(roundTrip(pages, compress = true) == pages.toVector)
  }

  test("string escapes round-trip: parens, backslash, nested") {
    val tricky = Seq("parens (nested (deep)) and \\ backslash", "tab\tand (odd")
    assert(roundTrip(tricky, compress = true) == tricky.toVector)
  }

  test("extractShownText handles Tj, quote, TJ arrays, octal, comments") {
    val cs = "BT (Hello) Tj ( world) Tj T* (line2) Tj " +
      "[(kern) -120 (ed)] TJ % comment (ignored) \n T* (after) Tj ET"
    assert(Pdf.extractShownText(cs) == "Hello world\nline2kerned\nafter")
    // octal escape: \101 = 'A'
    assert(Pdf.extractShownText("(\\101\\102) Tj") == "AB")
    // quote operator shows on the NEXT line
    assert(Pdf.extractShownText("(a) Tj (b) '") == "a\nb")
  }

  test("non-PDF raises diagnosably; unsupported filters skip, not crash") {
    val e = intercept[IllegalArgumentException](Pdf.extractText("not a pdf".getBytes))
    assert(e.getMessage.contains("%PDF-"))
    // a content stream with an unsupported filter yields empty text
    val f = Files.createTempFile("graft-pdf", ".pdf")
    Pdf.write(f, Seq("visible"), compress = false)
    val doctored = new String(Files.readAllBytes(f), "ISO-8859-1")
      .replace("<< /Length", "<< /Filter /DCTDecode /Length")
    assert(Pdf.extractText(doctored.getBytes("ISO-8859-1")) == Vector(""))
  }

  test("corrupt payloads never hang or throw unexpectedly") {
    val f = Files.createTempFile("graft-pdf", ".pdf")
    Pdf.write(f, Seq("page one text", "page two"), compress = true)
    val full = Files.readAllBytes(f)
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val c = full.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      try Pdf.extractText(c)
      catch { case _: IllegalArgumentException => () } // diagnosable rejects ok
    }
    (0 until full.length by 37).foreach { cut =>
      try Pdf.extractText(java.util.Arrays.copyOf(full, cut))
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("Sources reads .pdf distributed: one row per page with file/page/text") {
    val dir = Files.createTempDirectory("graft-pdfsrc")
    Pdf.write(dir.resolve("a.pdf"), Seq("alpha", "beta"), compress = true)
    Pdf.write(dir.resolve("b.pdf"), Seq("gamma"), compress = false)
    val df = Sources.read(spark, "docs",
      Map("file" -> s"$dir/*.pdf"), dir)
    val rows = df.collect().map(r =>
      (r.getString(0).split("/").last, r.getLong(1), r.getString(2))).sorted.toSeq
    assert(rows == Seq(("a.pdf", 1L, "alpha"), ("a.pdf", 2L, "beta"),
      ("b.pdf", 1L, "gamma")))
  }
}

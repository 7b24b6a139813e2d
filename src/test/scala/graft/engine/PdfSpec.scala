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

  test("ToUnicode CMap round-trip: composite-font hex-string pages extract real text") {
    // the subset-font shape: 2-byte glyph codes + generated CMap with both
    // bfrange runs (consecutive chars) and bfchar singles
    val pages = Seq("abcdef ghij", "Zyx Q\nsecond line 0129")
    val f = Files.createTempFile("graft-cmap", ".pdf")
    Pdf.writeCMap(f, pages)
    assert(Pdf.extractText(Files.readAllBytes(f)) == pages.toVector)
    // without CMap support this file MUST extract garbage, not the text —
    // prove the codes are not identity (the old pre-CMap reader's view)
    val raw = new String(Files.readAllBytes(f), "ISO-8859-1")
    assert(!raw.contains("abcdef"), "text must be glyph-coded in the file")
  }

  test("LZWDecode streams round-trip, including past the 9->10 bit widening") {
    // enough distinct digraphs to push the LZW dictionary past 512 entries
    val rnd = new scala.util.Random(3)
    val big = (1 to 3000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val data = big.getBytes("ISO-8859-1")
    assert(Pdf.lzwDecode(Pdf.lzwEncode(data), 1).toSeq == data.toSeq)
    // full PDF with LZW content + CMap streams
    val pages = Seq(big.take(200), "lzw page two")
    val f = Files.createTempFile("graft-lzw", ".pdf")
    Pdf.writeCMap(f, pages, lzw = true)
    assert(Pdf.extractText(Files.readAllBytes(f)) == pages.toVector)
  }

  test("lzwDecode matches the ISO 32000 §7.4.4 worked example byte-for-byte") {
    // the spec's own encoded stream for sample values (decimal)
    // 45 45 45 45 45 65 45 45 45 66 — external ground truth for the
    // code-width and dictionary conventions, not a self-round-trip
    val enc = Array(0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01).map(_.toByte)
    val expect = Array(45, 45, 45, 45, 45, 65, 45, 45, 45, 66).map(_.toByte)
    assert(Pdf.lzwDecode(enc, 1).toSeq == expect.toSeq)
  }

  test("parseCMap: bfchar, contiguous bfrange, and array-form bfrange") {
    val cmap = Pdf.parseCMap(
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0003> <0041>
        |<0007> <00E9>
        |endbfchar
        |2 beginbfrange
        |<0010> <0013> <0061>
        |<0020> <0022> [<0058> <0059> <005A>]
        |endbfrange
        |endcmap""".stripMargin)
    assert(cmap.codeLen == 2)
    assert(cmap.map(3) == "A" && cmap.map(7) == "é")
    assert((0x10 to 0x13).map(cmap.map) == Seq("a", "b", "c", "d"))
    assert((0x20 to 0x22).map(cmap.map) == Seq("X", "Y", "Z"))
    // the array entries must NOT have been re-read as a contiguous range
    assert(!cmap.map.contains(0x58))
  }

  test("/Length slices streams whose bytes contain endstream/endobj text") {
    // hand-build a PDF whose Flate content stream's compressed bytes are
    // REPLACED by a raw stream containing the ASCII killers; /Length is
    // what must win
    val killer = "fake endstream fake endobj (real) Tj"
    val doc =
      s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>
         |endobj
         |4 0 obj
         |<< /Length ${killer.length} >>
         |stream
         |$killer
         |endstream
         |endobj
         |trailer
         |<< /Size 5 /Root 1 0 R >>
         |""".stripMargin
    assert(Pdf.extractText(doc.getBytes("ISO-8859-1")) == Vector("real"))
    // indirect /Length resolves through the integer object
    val indirect = doc
      .replace(s"/Length ${killer.length} >>", "/Length 9 0 R >>")
      .replace("trailer", s"9 0 obj ${killer.length} endobj\ntrailer")
    assert(Pdf.extractText(indirect.getBytes("ISO-8859-1")) == Vector("real"))
  }

  test("object streams (/ObjStm): page dicts compressed inside a container still extract") {
    // modern (PDF 1.5+) files put page/font dictionaries inside object
    // streams; only the dict layer needs expanding (content streams are
    // regular objects by spec). Container carried as ASCIIHex to also
    // exercise that filter.
    val pages = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    val page = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val pairTable = s"2 0 3 ${pages.length + 1} "
    val first = pairTable.length
    val objstmBody = pairTable + pages + " " + page
    val hex = objstmBody.getBytes("ISO-8859-1").map(b => f"$b%02x").mkString + ">"
    val content = "(objstm works) Tj"
    val doc =
      s"""%PDF-1.5
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |5 0 obj
         |<< /Type /ObjStm /N 2 /First $first /Filter /ASCIIHexDecode /Length ${hex.length} >>
         |stream
         |$hex
         |endstream
         |endobj
         |4 0 obj
         |<< /Length ${content.length} >>
         |stream
         |$content
         |endstream
         |endobj
         |trailer
         |<< /Size 6 /Root 1 0 R >>
         |""".stripMargin
    assert(Pdf.extractText(doc.getBytes("ISO-8859-1")) == Vector("objstm works"))
  }

  test("ASCIIHex and ASCII85 filters decode per spec") {
    assert(Pdf.asciiHexDecode("48 65 6C6c 6F>".getBytes("ISO-8859-1")).toSeq ==
      "Hello".getBytes.toSeq)
    assert(Pdf.asciiHexDecode("48656C6C6F7>".getBytes).toSeq == // odd digit pads 0
      ("Hello".getBytes.toSeq :+ 0x70.toByte))
    // a85 reference vector: "Man " encodes to "9jqo^" ... use round logic:
    // 'z' shorthand and partial group
    assert(Pdf.ascii85Decode("z~>".getBytes).toSeq == Seq[Byte](0, 0, 0, 0))
    assert(Pdf.ascii85Decode("9jqo^~>".getBytes).map(_.toChar).mkString == "Man ")
    assert(Pdf.ascii85Decode("9jqo~>".getBytes).map(_.toChar).mkString == "Man")
    intercept[IllegalArgumentException](Pdf.ascii85Decode("9~>".getBytes))
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

package graft.engine



class DocxSpec extends graft.SparkSpec {

  private def tmp(suffix: String) =
    java.nio.file.Files.createTempFile("graft-docx-spec", suffix)

  test("docx round-trips paragraphs incl. tabs, breaks, and preserved spaces") {
    val paras = Seq(
      "plain paragraph",
      "col1\tcol2\tcol3",
      "line one\nline two",
      "  leading and trailing  ",
      "mixed\tcell\nnext line",
      "amp & lt < gt > quote \" done")
    val f = tmp(".docx")
    Docx.writeDocx(f, paras)
    val got = Docx.extractParagraphs(java.nio.file.Files.readAllBytes(f))
    assert(got == paras.toVector)
  }

  test("hand-written WordprocessingML: tables surface as paragraphs; delText/instrText excluded") {
    // a document.xml exercising what our writer never emits: table cells,
    // tracked deletions, field instruction text, multiple runs per
    // paragraph, empty paragraphs (skipped)
    val doc =
      """<?xml version="1.0"?>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>
        |<w:p><w:r><w:t>run one </w:t></w:r><w:r><w:t>run two</w:t></w:r></w:p>
        |<w:p/>
        |<w:p><w:r><w:delText>DELETED</w:delText><w:t>kept</w:t></w:r></w:p>
        |<w:p><w:r><w:instrText>PAGEREF _Toc1</w:instrText><w:t>shown</w:t></w:r></w:p>
        |<w:tbl><w:tr>
        |<w:tc><w:p><w:r><w:t>cell A</w:t></w:r></w:p></w:tc>
        |<w:tc><w:p><w:r><w:t>cell B</w:t></w:r></w:p></w:tc>
        |</w:tr></w:tbl>
        |</w:body></w:document>""".stripMargin
    val f = tmp(".docx")
    val zout = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(f))
    zout.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    zout.write(doc.getBytes("UTF-8")); zout.closeEntry(); zout.close()
    val got = Docx.extractParagraphs(java.nio.file.Files.readAllBytes(f))
    assert(got == Vector("run one run two", "kept", "shown", "cell A", "cell B"))
  }

  test("pptx slides come back in slide-number order, not ZIP order") {
    val slides = Seq("slide one", "second\nwith two paragraphs", "third")
    val f = tmp(".pptx")
    Docx.writePptx(f, slides)
    assert(Docx.extractSlides(java.nio.file.Files.readAllBytes(f)) == slides.toVector)
    // 10+ slides: numeric (not lexicographic) part ordering is load-bearing
    val many = (1 to 12).map(i => s"slide number $i")
    val f2 = tmp(".pptx")
    Docx.writePptx(f2, many)
    assert(Docx.extractSlides(java.nio.file.Files.readAllBytes(f2)) == many.toVector)
  }

  test("sources dispatch: docx and pptx read distributed with (file, unit, text) schema") {
    val f = tmp(".docx")
    Docx.writeDocx(f, Seq("alpha", "beta"))
    val df = Sources.read(spark, "spec_docx", Map("file" -> f.toString), f.getParent)
    assert(df.columns.toSeq == Seq("file", "paragraph", "text"))
    assert(df.orderBy("paragraph").collect().map(_.getString(2)).toSeq == Seq("alpha", "beta"))
    val p = tmp(".pptx")
    Docx.writePptx(p, Seq("s1", "s2", "s3"))
    val pf = Sources.read(spark, "spec_pptx", Map("file" -> p.toString), p.getParent)
    assert(pf.columns.toSeq == Seq("file", "slide", "text"))
    assert(pf.count() == 3)
  }

  test("hostile payloads: garbage, truncations, and oversized parts reject diagnosably") {
    intercept[IllegalArgumentException](Docx.extractParagraphs("not a zip".getBytes))
    intercept[IllegalArgumentException](Docx.extractSlides(Array[Byte](0x50, 0x4B, 3, 4)))
    val f = tmp(".docx")
    Docx.writeDocx(f, Seq("payload"))
    val full = java.nio.file.Files.readAllBytes(f)
    for (cut <- Seq(1, 10, full.length / 2, full.length - 3))
      try Docx.extractParagraphs(java.util.Arrays.copyOf(full, cut))
      catch { case _: Exception => () } // reject, never hang/OOM
  }
}

package graft.engine

class EpubSpec extends graft.SparkSpec {

  private def tmp() = java.nio.file.Files.createTempFile("graft-epub-spec", ".epub")

  test("chapters come back in SPINE order with markup intact") {
    val f = tmp()
    Epub.write(f, Seq("first chapter", "second & chapter", "third <b> chapter"))
    val got = Epub.extractChapters(java.nio.file.Files.readAllBytes(f))
    assert(got.size == 3)
    assert(got(0).contains("<p>first chapter</p>"))
    assert(got(1).contains("second &amp; chapter"))
    assert(got(2).contains("third &lt;b&gt; chapter"))
  }

  test("spine order wins over ZIP entry order") {
    // hand-built package whose spine reverses the manifest/zip order
    val f = tmp()
    val zout = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(f))
    def part(name: String, content: String): Unit = {
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(content.getBytes("UTF-8")); zout.closeEntry()
    }
    part("META-INF/container.xml",
      """<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        |<rootfiles><rootfile full-path="book/pkg.opf"/></rootfiles></container>""".stripMargin)
    part("book/a.xhtml", "<html><body>AAA</body></html>")
    part("book/b.xhtml", "<html><body>BBB</body></html>")
    part("book/pkg.opf",
      """<package xmlns="http://www.idpf.org/2007/opf">
        |<manifest>
        |<item id="a" href="a.xhtml" media-type="application/xhtml+xml"/>
        |<item id="b" href="b.xhtml" media-type="application/xhtml+xml"/>
        |</manifest>
        |<spine><itemref idref="b"/><itemref idref="a"/></spine>
        |</package>""".stripMargin)
    zout.close()
    val got = Epub.extractChapters(java.nio.file.Files.readAllBytes(f))
    assert(got.map(_.contains("BBB")) == Vector(true, false), "spine order must win")
  }

  test("sources dispatch + html_to_text composition recovers the text") {
    val f = tmp()
    Epub.write(f, Seq("alpha text", "beta & gamma"))
    val df = Sources.read(spark, "spec_epub", Map("file" -> f.toString), f.getParent)
    assert(df.columns.toSeq == Seq("file", "chapter", "html"))
    val text = new Engine(spark).applyOperation(df,
      Map("operation" -> "html_to_text", "column" -> "html"), Map.empty, "spec")
      .orderBy("chapter").collect().map(_.getAs[String]("html")).toSeq
    assert(text == Seq("alpha text", "beta & gamma"))
  }

  test("hostile payloads reject diagnosably") {
    intercept[IllegalArgumentException](Epub.extractChapters("not a zip".getBytes))
    // zip without container.xml
    val f = tmp()
    val zout = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(f))
    zout.putNextEntry(new java.util.zip.ZipEntry("mimetype"))
    zout.write("application/epub+zip".getBytes); zout.closeEntry(); zout.close()
    intercept[IllegalArgumentException](
      Epub.extractChapters(java.nio.file.Files.readAllBytes(f)))
    val g = tmp()
    Epub.write(g, Seq("payload"))
    val full = java.nio.file.Files.readAllBytes(g)
    for (cut <- 4 until full.length by 53)
      try Epub.extractChapters(java.util.Arrays.copyOf(full, cut))
      catch { case _: Exception => () }
  }
}

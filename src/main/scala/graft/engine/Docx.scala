package graft.engine

import java.io.ByteArrayInputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/**
 * Dependency-free OOXML text extraction: `.docx` (WordprocessingML,
 * ECMA-376 Part 1 §17) and `.pptx` (PresentationML, §19) — the Office
 * share of a document crawl the PDF source doesn't cover. Same
 * hardened-StAX discipline as [[Xlsx]] (DTDs and external entities
 * disabled), but over a byte array (`ZipInputStream`) so extraction
 * runs inside `binaryFiles` partitions — one task per document, the
 * same distribution shape as the PDF source.
 *
 * DOCX: one row per non-empty paragraph (`<w:p>`), concatenating its
 * runs' `<w:t>` text with `<w:tab/>` → TAB and `<w:br/>`/`<w:cr/>` →
 * newline; table cells are paragraphs and surface naturally. Tracked
 * deletions (`<w:delText>`) and field instructions (`<w:instrText>`)
 * are distinct element names and therefore excluded — only shown text
 * lands in the corpus.
 *
 * PPTX: one row per slide (`ppt/slides/slideN.xml`, numeric order —
 * ZIP entry order is not presentation order), paragraphs (`<a:p>`)
 * joined with newlines, runs' `<a:t>` concatenated.
 *
 * The writers emit minimal VALID packages ([Content_Types].xml +
 * package/part rels) for fixtures and the oracle round-trip gates.
 *
 * Reference semantics: earthmover reads spreadsheets via pandas but has
 * no Word/PowerPoint source (beyond-reference tier, like WARC and PDF).
 */
object Docx {

  private def xmlReader(in: java.io.InputStream) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** All ZIP entries matching `want`, as (name, bytes) — streamed, so a
    * hostile entry can't allocate past the 64 MiB per-part cap, and the
    * kept total is capped at 256 MiB so a many-entry bomb (thousands of
    * under-cap parts from a tiny deflate stream) can't allocate
    * unbounded either. Shared with [[Epub]]. */
  private[engine] def zipEntries(bytes: Array[Byte], want: String => Boolean): Vector[(String, Array[Byte])] = {
    val out = Vector.newBuilder[(String, Array[Byte])]
    var total = 0L
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && want(e.getName)) {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n > 0) {
            buf.write(chunk, 0, n)
            if (buf.size > (1 << 26)) throw new IllegalArgumentException(
              s"ooxml part ${e.getName} exceeds 64 MiB")
            n = zin.read(chunk)
          }
          total += buf.size
          if (total > (1L << 28)) throw new IllegalArgumentException(
            "zip container expands past 256 MiB total")
          out += e.getName -> buf.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Paragraph texts of a WordprocessingML part (shared by docx body and
    * pptx slides — pptx paragraphs are `<a:p>`/`<a:t>`, same local
    * names). */
  private def paragraphTexts(xml: Array[Byte]): Vector[String] = {
    val r = xmlReader(new ByteArrayInputStream(xml))
    val paras = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inT = false
    var inP = false
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        r.getLocalName match {
          case "p" => inP = true; cur.clear()
          case "t" if inP => inT = true
          case "tab" if inP => cur.append('\t')
          case "br" | "cr" if inP => cur.append('\n')
          case _ =>
        }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
        cur.append(r.getText)
      case XMLStreamConstants.END_ELEMENT =>
        r.getLocalName match {
          case "t" => inT = false
          case "p" if inP =>
            inP = false
            if (cur.nonEmpty) paras += cur.toString
          case _ =>
        }
      case _ =>
    } finally r.close()
    paras.result()
  }

  /** Truncated/bit-flipped containers surface ZipException and
    * XMLStreamException from the JDK layers — normalize every parse
    * failure to the engine-wide diagnosable IllegalArgumentException so
    * hostile crawl payloads reject uniformly (the contract
    * HostilePayloadSpec pins across the document tier). */
  private[engine] def diagnosable[A](what: String)(body: => A): A =
    try body catch {
      case e: IllegalArgumentException => throw e
      case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(s"$what parse failed: ${e.getMessage}", e)
    }

  /** Non-empty paragraphs of a .docx, document order. */
  def extractParagraphs(bytes: Array[Byte]): Vector[String] = diagnosable("docx") {
    val parts = zipEntries(bytes, _ == "word/document.xml")
    if (parts.isEmpty) throw new IllegalArgumentException(
      "not a docx: missing word/document.xml")
    paragraphTexts(parts.head._2)
  }

  /** One string per slide (paragraphs newline-joined), slide-number
    * order. */
  def extractSlides(bytes: Array[Byte]): Vector[String] = diagnosable("pptx") {
    val SlideName = """ppt/slides/slide(\d+)\.xml""".r
    val parts = zipEntries(bytes, n => SlideName.pattern.matcher(n).matches())
    if (parts.isEmpty) throw new IllegalArgumentException(
      "not a pptx: no ppt/slides/slideN.xml parts")
    parts
      .map { case (name, b) =>
        val n = name match { case SlideName(d) => d.toInt }
        (n, paragraphTexts(b).mkString("\n"))
      }
      .sortBy(_._1)
      .map(_._2)
  }

  // ----------------------------------------------------------- writers

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  private def zipWrite(path: java.nio.file.Path, parts: Seq[(String, String)]): Unit = {
    val zout = new ZipOutputStream(java.nio.file.Files.newOutputStream(path))
    try parts.foreach { case (name, content) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    } finally zout.close()
  }

  private val PackageRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="%s"/>
      |</Relationships>""".stripMargin

  /** Minimal valid .docx: one `<w:p>` per paragraph, TAB and newline
    * round-tripped through `<w:tab/>` / `<w:br/>`, `xml:space="preserve"`
    * so leading/trailing spaces survive. */
  def writeDocx(path: java.nio.file.Path, paragraphs: Seq[String]): Unit = {
    val w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    val body = paragraphs.map { p =>
      val runs = p.split("\n", -1).map { line =>
        line.split("\t", -1).map(seg =>
          s"""<w:t xml:space="preserve">${xmlEscape(seg)}</w:t>""")
          .mkString("<w:tab/>")
      }.mkString("<w:br/>")
      s"<w:p><w:r>$runs</w:r></w:p>"
    }.mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="$w"><w:body>$body</w:body></w:document>""".stripMargin
    zipWrite(path, Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" -> PackageRels.format("word/document.xml"),
      "word/document.xml" -> doc))
  }

  /** Minimal valid .pptx: one slide per string, one `<a:p>` per line. */
  def writePptx(path: java.nio.file.Path, slides: Seq[String]): Unit = {
    val a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    val p = "http://schemas.openxmlformats.org/presentationml/2006/main"
    val r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    def slideXml(text: String): String = {
      val paras = text.split("\n", -1).map(line =>
        s"""<a:p><a:r><a:t>${xmlEscape(line)}</a:t></a:r></a:p>""").mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<p:sld xmlns:p="$p" xmlns:a="$a"><p:cSld><p:spTree>
         |<p:sp><p:txBody><a:bodyPr/>$paras</p:txBody></p:sp>
         |</p:spTree></p:cSld></p:sld>""".stripMargin
    }
    val slideRels = slides.indices.map(i =>
      s"""<Relationship Id="rId${i + 1}" Type="$r/slide" Target="slides/slide${i + 1}.xml"/>""").mkString
    val slideLst = slides.indices.map(i =>
      s"""<p:sldId id="${256 + i}" r:id="rId${i + 1}"/>""").mkString
    val overrides = slides.indices.map(i =>
      s"""<Override PartName="/ppt/slides/slide${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>""").mkString
    zipWrite(path, Seq(
      "[Content_Types].xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
           |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
           |<Default Extension="xml" ContentType="application/xml"/>
           |<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>
           |$overrides
           |</Types>""".stripMargin,
      "_rels/.rels" -> PackageRels.format("ppt/presentation.xml"),
      "ppt/presentation.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<p:presentation xmlns:p="$p" xmlns:r="$r"><p:sldIdLst>$slideLst</p:sldIdLst></p:presentation>""".stripMargin,
      "ppt/_rels/presentation.xml.rels" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$slideRels</Relationships>""".stripMargin)
      ++ slides.zipWithIndex.map { case (s, i) => s"ppt/slides/slide${i + 1}.xml" -> slideXml(s) })
  }
}

package graft.engine

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/**
 * EPUB chapter extraction (the public EPUB/OCF + OPF specs) — the
 * ebook/books-corpus share of a document crawl. Proper package walk,
 * not a ZIP glob:
 *
 *  1. `META-INF/container.xml` → the OPF rootfile path;
 *  2. the OPF manifest (id → href, hrefs relative to the OPF directory)
 *     and spine (idref reading order);
 *  3. one row per spine item: the chapter's raw (X)HTML markup, IN SPINE
 *     ORDER — ZIP entry order is not reading order.
 *
 * The source deliberately emits MARKUP, not stripped text: the engine's
 * `html_to_text` op is the extraction step (same Column chain the WARC
 * pipeline uses), so epub → text composes as
 * `source type epub` → `html_to_text` and the quality/dedup tiers see
 * exactly what they see for crawl HTML.
 *
 * Same hardened-StAX discipline as [[Xlsx]]/[[Docx]] (DTDs and external
 * entities disabled — EPUB xhtml routinely declares DTDs, which is
 * precisely why resolution must be off). The writer emits a minimal
 * valid package (stored mimetype first, per OCF) for fixtures/oracles.
 *
 * Reference semantics: earthmover has no ebook source (beyond-reference
 * tier, like PDF/WARC/OOXML/RTF/DOC).
 */
object Epub {

  private def xmlReader(in: java.io.InputStream) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** Raw chapter markup in spine order; throws when not an EPUB. */
  def extractChapters(bytes: Array[Byte]): Vector[String] = Docx.diagnosable("epub") {
    val byName = Docx.zipEntries(bytes, _ => true).toMap
    val container = byName.getOrElse("META-INF/container.xml",
      throw new IllegalArgumentException("not an epub: missing META-INF/container.xml"))
    // rootfile full-path attribute
    var opfPath: String = null
    val cr = xmlReader(new java.io.ByteArrayInputStream(container))
    try while (cr.hasNext && opfPath == null) {
      if (cr.next() == XMLStreamConstants.START_ELEMENT && cr.getLocalName == "rootfile")
        opfPath = cr.getAttributeValue(null, "full-path")
    } finally cr.close()
    if (opfPath == null)
      throw new IllegalArgumentException("epub: container.xml has no rootfile")
    val opf = byName.getOrElse(opfPath,
      throw new IllegalArgumentException(s"epub: missing OPF $opfPath"))
    val opfDir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i => opfPath.substring(0, i + 1)
    }
    // manifest id -> href; spine = ordered idrefs
    val hrefs = scala.collection.mutable.Map.empty[String, String]
    val spine = Vector.newBuilder[String]
    val or = xmlReader(new java.io.ByteArrayInputStream(opf))
    try while (or.hasNext) {
      if (or.next() == XMLStreamConstants.START_ELEMENT) or.getLocalName match {
        case "item" =>
          val id = or.getAttributeValue(null, "id")
          val href = or.getAttributeValue(null, "href")
          if (id != null && href != null) hrefs(id) = href
        case "itemref" =>
          val idref = or.getAttributeValue(null, "idref")
          if (idref != null) spine += idref
        case _ =>
      }
    } finally or.close()
    val chapters = spine.result().flatMap(id => hrefs.get(id)).flatMap { href =>
      byName.get(opfDir + href).orElse(byName.get(href))
        .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
    }
    if (chapters.isEmpty)
      throw new IllegalArgumentException("epub: spine resolves to no readable chapters")
    chapters
  }

  // ------------------------------------------------------------ writer

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Minimal valid EPUB: stored (uncompressed) `mimetype` first per OCF,
    * container → OPF → one xhtml chapter per entry, each paragraph
    * wrapped in `<p>`. */
  def write(path: java.nio.file.Path, chapters: Seq[String]): Unit = {
    val zout = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(path))
    try {
      val mime = "application/epub+zip".getBytes("US-ASCII")
      val me = new java.util.zip.ZipEntry("mimetype")
      me.setMethod(java.util.zip.ZipOutputStream.STORED)
      me.setSize(mime.length)
      val crc = new java.util.zip.CRC32(); crc.update(mime)
      me.setCrc(crc.getValue)
      zout.putNextEntry(me); zout.write(mime); zout.closeEntry()
      def part(name: String, content: String): Unit = {
        zout.putNextEntry(new java.util.zip.ZipEntry(name))
        zout.write(content.getBytes("UTF-8")); zout.closeEntry()
      }
      part("META-INF/container.xml",
        """<?xml version="1.0"?>
          |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
          |<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles>
          |</container>""".stripMargin)
      val items = chapters.indices.map(i =>
        s"""<item id="ch${i + 1}" href="ch${i + 1}.xhtml" media-type="application/xhtml+xml"/>""").mkString
      val refs = chapters.indices.map(i => s"""<itemref idref="ch${i + 1}"/>""").mkString
      part("OEBPS/content.opf",
        s"""<?xml version="1.0"?>
           |<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">
           |<metadata xmlns:dc="http://purl.org/dc/elements/1.1/"><dc:identifier id="uid">graft-fixture</dc:identifier><dc:title>fixture</dc:title></metadata>
           |<manifest>$items</manifest>
           |<spine>$refs</spine>
           |</package>""".stripMargin)
      chapters.zipWithIndex.foreach { case (text, i) =>
        val paras = text.split("\n", -1)
          .map(p => s"<p>${xmlEscape(p)}</p>").mkString
        part(s"OEBPS/ch${i + 1}.xhtml",
          s"""<html xmlns="http://www.w3.org/1999/xhtml"><head><title>ch${i + 1}</title></head><body>$paras</body></html>""")
      }
    } finally zout.close()
  }
}

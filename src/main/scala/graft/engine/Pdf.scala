package graft.engine

import java.nio.charset.StandardCharsets

/**
 * PDF text extraction — PDFs are a major real-corpus source (crawl
 * pipelines extract them alongside HTML), so the engine reads them
 * natively: a from-scratch parser over the public PDF 1.4+ byte layout
 * (ISO 32000 / the Adobe PDF Reference): object scan, page tree order
 * from /Kids, content streams (raw or /FlateDecode via the JDK
 * Inflater), and the standard text-showing operators (Tj, ', TJ arrays)
 * with full string-escape handling. Distributed at the Sources layer via
 * `binaryFiles` (one task per document — the WARC pattern; PDFs in a
 * corpus are many small files).
 *
 * Honest scope: digitally-born text PDFs. Scanned/image-only pages yield
 * empty text (OCR is out of scope — no model ships here), encrypted
 * documents and exotic filters (DCT, JBIG2, LZW) are skipped per-stream
 * rather than failing the document, and ToUnicode CMap remapping is not
 * applied (fixture and typical Latin-text PDFs show literal strings).
 *
 * A minimal deterministic WRITER (Helvetica, one content stream per
 * page, optional Flate) backs the oracle gate and round-trip specs.
 */
object Pdf {

  // ================================================================ read

  /** Text per page, in /Kids page-tree order. Throws IllegalArgumentException
    * when the payload is not a PDF. */
  def extractText(bytes: Array[Byte]): Vector[String] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1) // byte-faithful
    if (!s.startsWith("%PDF-"))
      throw new IllegalArgumentException("not a PDF (missing %PDF- header)")
    // object number -> (dict+stream slice start, end)
    val objRe = """(?s)(\d+)\s+0\s+obj\b""".r
    val objStarts = objRe.findAllMatchIn(s).map(m => (m.group(1).toInt, m.start, m.end)).toVector
    val objs: Map[Int, String] = objStarts.zipWithIndex.map { case ((num, st, bodyStart), i) =>
      val end = {
        val e = s.indexOf("endobj", bodyStart)
        if (e >= 0) e else if (i + 1 < objStarts.length) objStarts(i + 1)._2 else s.length
      }
      num -> s.substring(bodyStart, end)
    }.toMap

    def refsIn(src: String): Seq[Int] =
      """(\d+)\s+0\s+R""".r.findAllMatchIn(src).map(_.group(1).toInt).toSeq

    // page order: the Pages node's /Kids; fall back to document order of
    // /Type /Page objects when the tree is unparseable
    val pagesNode = objs.values.find(o => o.contains("/Type") && o.contains("/Pages"))
    val kidOrder: Seq[Int] = pagesNode
      .flatMap(o => """(?s)/Kids\s*\[(.*?)\]""".r.findFirstMatchIn(o).map(m => refsIn(m.group(1))))
      .getOrElse(Nil)
    val pageObjs: Seq[Int] = {
      val isPage = (n: Int) => objs.get(n).exists(o =>
        """(?s)/Type\s*/Page\b(?!s)""".r.findFirstIn(o).isDefined)
      val ordered = kidOrder.filter(isPage)
      if (ordered.nonEmpty) ordered
      else objs.toSeq.sortBy(_._1).collect { case (n, _) if isPage(n) => n }
    }

    pageObjs.map { pn =>
      val page = objs(pn)
      val contentRefs = """(?s)/Contents\s*(?:\[(.*?)\]|(\d+)\s+0\s+R)""".r
        .findFirstMatchIn(page)
        .map(m => if (m.group(1) != null) refsIn(m.group(1)) else Seq(m.group(2).toInt))
        .getOrElse(Nil)
      contentRefs.flatMap(objs.get).map(streamText).mkString("\n")
    }.toVector
  }

  /** Decode one content object's stream and extract its shown text. */
  private def streamText(obj: String): String = {
    val si = obj.indexOf("stream")
    if (si < 0) return ""
    var ds = si + "stream".length
    if (ds < obj.length && obj.charAt(ds) == '\r') ds += 1
    if (ds < obj.length && obj.charAt(ds) == '\n') ds += 1
    val de = obj.indexOf("endstream", ds)
    if (de < 0) return ""
    val raw = obj.substring(ds, de).getBytes(StandardCharsets.ISO_8859_1)
    val dict = obj.substring(0, si)
    val data =
      if (dict.contains("/FlateDecode")) {
        try {
          val inf = new java.util.zip.Inflater()
          inf.setInput(raw)
          val out = new java.io.ByteArrayOutputStream(raw.length * 4)
          val buf = new Array[Byte](8192)
          var stalled = false
          while (!inf.finished() && !stalled) {
            val n = inf.inflate(buf)
            if (n > 0) out.write(buf, 0, n)
            else if (inf.needsInput() || inf.needsDictionary()) stalled = true
          }
          inf.end()
          out.toByteArray
        } catch { case _: Exception => return "" } // exotic/corrupt: skip stream
      } else if (dict.contains("/Filter")) return "" // unsupported filter
      else raw
    extractShownText(new String(data, StandardCharsets.ISO_8859_1))
  }

  /** Walk a content stream for the Tj / quote / TJ show operators; a
    * text-positioning op (Td, TD, T-star, quote) between shows
    * contributes a newline. */
  private[engine] def extractShownText(cs: String): String = {
    val sb = new StringBuilder
    var i = 0
    var pendingBreak = false
    var shown = false
    def appendShow(str: String): Unit = {
      if (shown && pendingBreak) sb.append('\n')
      sb.append(str)
      shown = true
      pendingBreak = false
    }
    while (i < cs.length) {
      cs.charAt(i) match {
        case '(' =>
          val (str, next) = parseString(cs, i)
          i = next
          // the operator after the string decides: Tj, ', or part of TJ
          val rest = cs.substring(i, math.min(cs.length, i + 8))
          if (rest.trim.startsWith("'")) { pendingBreak = true; appendShow(str) }
          else appendShow(str)
        case '%' => // comment to end of line
          while (i < cs.length && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
        case 'T' if i + 1 < cs.length &&
          (cs.charAt(i + 1) == 'd' || cs.charAt(i + 1) == 'D' || cs.charAt(i + 1) == '*') =>
          pendingBreak = true; i += 2
        case _ => i += 1
      }
    }
    sb.toString
  }

  /** Parse a PDF literal string starting at `(`; returns (text, index past
    * the closing paren). Handles nested parens, escapes, octal, and
    * line-continuation per the spec. */
  private def parseString(cs: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    var depth = 1
    while (i < cs.length && depth > 0) {
      cs.charAt(i) match {
        case '\\' if i + 1 < cs.length =>
          cs.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' => i += (if (i + 2 < cs.length && cs.charAt(i + 2) == '\n') 3 else 2)
            case d if d >= '0' && d <= '7' =>
              var oct = 0; var k = 0; i += 1
              while (k < 3 && i < cs.length && cs.charAt(i) >= '0' && cs.charAt(i) <= '7') {
                oct = oct * 8 + (cs.charAt(i) - '0'); i += 1; k += 1
              }
              sb.append((oct & 0xFF).toChar)
            case other => sb.append(other); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }

  // =============================================================== write

  /** Minimal deterministic text PDF: one Helvetica content stream per
    * page (one `Tj` per line, `T*`-advanced), optional Flate. */
  def write(path: java.nio.file.Path, pages: Seq[String],
            compress: Boolean = false): Unit = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    def beginObj(n: Int): Unit = { offsets += out.size().toLong; w(s"$n 0 obj\n") }

    val nPages = pages.length
    val fontObj = 3 + 2 * nPages
    w("%PDF-1.4\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\nendobj\n")
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 3 + 2 * i
      val contentNum = pageNum + 1
      beginObj(pageNum)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents $contentNum 0 R /Resources << /Font << /F1 $fontObj 0 R >> >> >>\nendobj\n")
      val lines = text.split("\n", -1)
      val body = "BT /F1 12 Tf 72 720 Td 14 TL " +
        lines.map(l => s"(${esc(l)}) Tj").mkString(" T* ") + " ET"
      val payload = body.getBytes(StandardCharsets.ISO_8859_1)
      val streamBytes =
        if (compress) {
          val d = new java.util.zip.Deflater()
          d.setInput(payload); d.finish()
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end()
          bos.toByteArray
        } else payload
      beginObj(contentNum)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${streamBytes.length}$filter >>\nstream\n")
      out.write(streamBytes)
      w("\nendstream\nendobj\n")
    }
    beginObj(fontObj)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xrefAt = out.size()
    val total = fontObj + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    java.nio.file.Files.write(path, out.toByteArray)
  }
}

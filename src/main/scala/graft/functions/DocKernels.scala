package graft.functions

/**
 * Document-text extraction kernel for BINARY COLUMNS — the document
 * tier's analogue of [[ImageKernels]]/[[MediaKernels]]. The source
 * readers (engine/Sources) cover the files-on-disk shape; this kernel
 * serves the other real pipeline shape: document bytes already sitting
 * in a parquet binary column (a crawl staged as `(doc_id, content)`),
 * where extraction must fuse into the scan projection instead of
 * detouring through temp files.
 *
 * Wraps the same from-scratch parsers the sources use (engine/Rtf, Doc,
 * Docx, Epub, Pdf, Subtitles, Eml — all already bytes-based precisely
 * because binaryFiles distribution needed them to be). Extraction
 * failures return NULL, never throw: one hostile payload must not kill
 * a 100 TB job (the per-file sources keep their diagnosable-throw
 * contract; a column op's unit of failure is the row).
 *
 * Formats: `rtf`, `doc`, `docx`, `pptx`, `epub`, `pdf`, `srt`, `vtt`,
 * `eml`, or `auto` (default) which sniffs the binary containers by
 * magic — `{\rtf`, `%PDF-`, OLE2 D0CF11E0, and ZIP by entry names
 * (word/document.xml → docx, ppt/slides/ → pptx, META-INF/container.xml
 * → epub) — plus `WEBVTT`. The text formats srt/eml have no reliable
 * magic and need the explicit format argument.
 *
 * Paragraph/page/slide/cue units are newline-joined into one string —
 * the shape the quality/dedup tier consumes. EPUB yields chapter MARKUP
 * (same deliberate contract as the epub source): `html_to_text` is the
 * extraction step, so `doc_text` → `html_to_text` composes exactly like
 * the crawl path.
 */
object DocKernels {

  private def hasPrefix(b: Array[Byte], p: String): Boolean =
    b.length >= p.length && p.indices.forall(i => b(i) == p.charAt(i).toByte)

  /** Sniff a binary container format from magic bytes; null if unknown. */
  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length < 4) null
    else if (hasPrefix(b, "{\\rtf")) "rtf"
    else if (hasPrefix(b, "%PDF-")) "pdf"
    else if ((b(0) & 0xFF) == 0xD0 && (b(1) & 0xFF) == 0xCF &&
      (b(2) & 0xFF) == 0x11 && (b(3) & 0xFF) == 0xE0) "doc"
    else if (hasPrefix(b, "WEBVTT") ||
      (b.length >= 9 && (b(0) & 0xFF) == 0xEF && hasPrefix(java.util.Arrays.copyOfRange(b, 3, 9), "WEBVTT"))) "vtt"
    else if ((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3) "mkv"
    else if (b(0) == 'P' && b(1) == 'K') {
      // ZIP: walk entry NAMES only (no payload reads) to tell the OOXML
      // family members apart
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(b))
      try {
        var e = zin.getNextEntry
        var found: String = null
        var n = 0
        while (e != null && found == null && n < 4096) {
          val name = e.getName
          if (name == "word/document.xml") found = "docx"
          else if (name.startsWith("ppt/slides/slide")) found = "pptx"
          else if (name == "META-INF/container.xml") found = "epub"
          n += 1
          e = zin.getNextEntry
        }
        found
      } catch { case scala.util.control.NonFatal(_) => null }
      finally zin.close()
    } else null
  }

  /** Extracted text (units newline-joined), or null when the payload
    * doesn't parse as `fmt` ("auto" = sniff binary containers). */
  def docText(bytes: Array[Byte], fmt: String): String = {
    if (bytes == null) return null
    val f = if (fmt == "auto") sniff(bytes) else fmt
    if (f == null) return null
    try f match {
      case "rtf" => graft.engine.Rtf.extractParagraphs(bytes).mkString("\n")
      case "doc" => graft.engine.Doc.extractParagraphs(bytes).mkString("\n")
      case "docx" => graft.engine.Docx.extractParagraphs(bytes).mkString("\n")
      case "pptx" => graft.engine.Docx.extractSlides(bytes).mkString("\n")
      case "epub" => graft.engine.Epub.extractChapters(bytes).mkString("\n")
      case "pdf" => graft.engine.Pdf.extractText(bytes).mkString("\n")
      case "srt" => graft.engine.Subtitles.parseSrt(bytes).map(_._3).mkString("\n")
      case "vtt" => graft.engine.Subtitles.parseVtt(bytes).map(_._3).mkString("\n")
      case "mkv" => Webm.subtitleText(bytes) // S_TEXT tracks: text FROM video
      case "eml" => graft.engine.Eml.parseEml(bytes).text
      case other =>
        throw new IllegalArgumentException(s"doc_text: unsupported format `$other`")
    } catch {
      // unsupported-format is a CONFIG error and must surface; payload
      // parse failures are data and become null
      case e: IllegalArgumentException if e.getMessage != null &&
        e.getMessage.startsWith("doc_text:") => throw e
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** Unit-level extraction: one entry per paragraph (rtf/doc/docx) /
    * slide (pptx) / chapter markup (epub) / page (pdf) / cue (srt/vtt);
    * eml yields the single body. Null on failure, like [[docText]] —
    * the array face for pipelines that chunk or filter per unit. */
  def docUnits(bytes: Array[Byte], fmt: String): Array[String] = {
    if (bytes == null) return null
    val f = if (fmt == "auto") sniff(bytes) else fmt
    if (f == null) return null
    try f match {
      case "rtf" => graft.engine.Rtf.extractParagraphs(bytes).toArray
      case "doc" => graft.engine.Doc.extractParagraphs(bytes).toArray
      case "docx" => graft.engine.Docx.extractParagraphs(bytes).toArray
      case "pptx" => graft.engine.Docx.extractSlides(bytes).toArray
      case "epub" => graft.engine.Epub.extractChapters(bytes).toArray
      case "pdf" => graft.engine.Pdf.extractText(bytes).toArray
      case "srt" => graft.engine.Subtitles.parseSrt(bytes).map(_._3).toArray
      case "vtt" => graft.engine.Subtitles.parseVtt(bytes).map(_._3).toArray
      case "eml" => Array(graft.engine.Eml.parseEml(bytes).text)
      case other =>
        throw new IllegalArgumentException(s"doc_units: unsupported format `$other`")
    } catch {
      case e: IllegalArgumentException if e.getMessage != null &&
        e.getMessage.startsWith("doc_units:") => throw e
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** UTF8String face for codegen call sites. */
  def docTextUtf8(bytes: Array[Byte], fmt: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = docText(bytes, fmt.toString)
    if (s == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(s)
  }
}

package graft.engine

/**
 * RTF text extraction (the public Rich Text Format spec, v1.9.1) — the
 * legacy-document share of a crawl the OOXML and PDF sources don't
 * cover. Plain recursive-group walk:
 *
 *  - groups `{...}` carry state (skip flag, `\ucN` fallback count) on a
 *    stack;
 *  - known non-text destinations (`\fonttbl`, `\colortbl`,
 *    `\stylesheet`, `\info`, `\pict`, `\header`, `\footer`, ...) and
 *    ALL starred destinations (`{\*\...}`, the spec's
 *    ignore-if-unknown rule) are skipped;
 *  - `\par`/`\line`/`\sect`/`\row` → newline, `\tab`/`\cell` → tab,
 *    `\~` → space, `\{ \} \\` → literals;
 *  - `\'hh` bytes decode through Windows-1252 (the `\ansi` default);
 *    `\uN` emits the code point (negative N + 65536, surrogate-safe)
 *    and skips the `\ucN` fallback characters that follow.
 *
 * Output mirrors [[Docx.extractParagraphs]]: non-empty paragraphs in
 * document order (split on paragraph marks). The writer emits a
 * minimal valid document for fixtures/oracles, `\uN`-escaping
 * everything outside printable ASCII.
 *
 * Reference semantics: earthmover has no RTF source (beyond-reference
 * tier, like PDF/WARC/OOXML).
 */
object Rtf {

  private val SkipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf", "footerl",
    "footerr", "footerf", "footnote", "xe", "tc", "field" /* keep fldrslt */,
    "themedata", "colorschememapping", "datastore", "latentstyles",
    "listtable", "listoverridetable", "revtbl", "rsidtbl", "generator",
    "filetbl", "operator", "creatim", "revtim", "printim", "buptim")

  private final case class GState(var skip: Boolean, var uc: Int)

  /** Non-empty paragraph texts, document order; throws
    * IllegalArgumentException when not RTF. */
  def extractParagraphs(bytes: Array[Byte]): Vector[String] = {
    if (bytes == null || bytes.length < 5 ||
      !(bytes(0) == '{' && bytes(1) == '\\' && bytes(2) == 'r' &&
        bytes(3) == 't' && bytes(4) == 'f'))
      throw new IllegalArgumentException("not an rtf document (missing {\\rtf header)")
    val out = new StringBuilder
    val stack = scala.collection.mutable.Stack[GState]()
    var cur = GState(skip = false, uc = 1)
    var i = 0
    var pendingSkip = 0 // \uN fallback characters still to swallow
    // \uN fallback swallowing applies only to LITERAL text (and \'hh
    // bytes): a control word after \uN ends the fallback run, so its
    // output (\par, \tab, ...) must never be counted against it.
    def emit(c: Char): Unit =
      if (!cur.skip) { if (pendingSkip > 0) pendingSkip -= 1 else out.append(c) }
    def emitCtl(c: Char): Unit =
      if (!cur.skip) { pendingSkip = 0; out.append(c) }
    def emitCp(cp: Int): Unit =
      if (!cur.skip) out.appendAll(Character.toChars(if (cp < 0) cp + 65536 else cp))
    while (i < bytes.length) {
      (bytes(i) & 0xFF).toChar match {
        case '{' =>
          stack.push(cur)
          cur = GState(cur.skip, cur.uc)
          pendingSkip = 0
          i += 1
        case '}' =>
          if (stack.nonEmpty) cur = stack.pop()
          pendingSkip = 0
          i += 1
        case '\\' if i + 1 < bytes.length =>
          val c1 = (bytes(i + 1) & 0xFF).toChar
          if (c1 == '\'') { // \'hh codepage byte
            if (i + 3 < bytes.length) {
              val hex = Integer.parseInt(
                new String(bytes, i + 2, 2, java.nio.charset.StandardCharsets.US_ASCII), 16)
              if (!cur.skip) {
                if (pendingSkip > 0) pendingSkip -= 1
                else out.append(new String(Array(hex.toByte), java.nio.charset.Charset.forName("windows-1252")))
              }
            }
            i += 4
          } else if (!Character.isLetter(c1)) { // control symbol
            c1 match {
              case '{' | '}' | '\\' => emit(c1)
              case '~' => emit(' ')
              case '-' => () // optional hyphen: invisible unless broken
              case '_' => emit('-') // non-breaking hyphen
              case '*' =>
                // starred destination: unknown-safe skip of the group
                cur.skip = true
              case _ => ()
            }
            i += 2
          } else { // control word
            var j = i + 1
            while (j < bytes.length && Character.isLetter((bytes(j) & 0xFF).toChar)) j += 1
            val word = new String(bytes, i + 1, j - i - 1, java.nio.charset.StandardCharsets.US_ASCII)
            var k = j
            var neg = false
            if (k < bytes.length && (bytes(k) & 0xFF).toChar == '-') { neg = true; k += 1 }
            var num = 0L
            var hasNum = false
            while (k < bytes.length && Character.isDigit((bytes(k) & 0xFF).toChar)) {
              num = math.min(num * 10 + (bytes(k) - '0'), 1000000L); hasNum = true; k += 1
            }
            val value = if (neg) -num else num
            // one space after a control word belongs to it
            if (k < bytes.length && (bytes(k) & 0xFF).toChar == ' ') k += 1
            word match {
              // \par/\sect/\row END a paragraph; \line is a break WITHIN
              // one (internal separator char keeps them distinct so a
              // paragraph containing line breaks round-trips as ONE row)
              case "par" | "sect" | "row" => emitCtl(' ')
              case "line" => emitCtl('\n')
              case "tab" | "cell" => emitCtl('\t')
              case "emdash" | "endash" => emitCtl('-')
              case "lquote" | "rquote" => emitCtl('\'')
              case "ldblquote" | "rdblquote" => emitCtl('"')
              case "bullet" => emitCtl('*')
              case "uc" => cur.uc = math.max(0, math.min(10, value.toInt))
              case "u" =>
                emitCp(value.toInt)
                if (!cur.skip) pendingSkip = cur.uc
              case "bin" =>
                // raw binary payload: skip exactly N bytes
                k += math.max(0L, value).toInt
              case w if SkipDestinations(w) => cur.skip = true
              case "fldrslt" => cur.skip = false // field RESULT is shown text
              case _ => () // formatting word: ignore
            }
            i = k
          }
        case '\r' | '\n' => i += 1 // raw newlines are not text in RTF
        case c =>
          emit(c)
          i += 1
      }
    }
    out.toString.split(' ').toVector.filter(_.exists(!_.isWhitespace))
  }

  // ------------------------------------------------------------ writer

  private def escape(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '\\' => b.append("\\\\")
      case '{' => b.append("\\{")
      case '}' => b.append("\\}")
      case '\t' => b.append("\\tab ")
      case '\n' => b.append("\\line ")
      case c if c >= 0x20 && c < 0x7F => b.append(c)
      case c => b.append("\\u").append(c.toInt).append("?") // uc1 fallback
    }
    b.toString
  }

  /** Minimal valid RTF: one `\par`-terminated paragraph per entry. */
  def write(path: java.nio.file.Path, paragraphs: Seq[String]): Unit = {
    val body = paragraphs.map(p => escape(p) + "\\par\n").mkString
    val doc = "{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1" +
      "{\\fonttbl{\\f0\\fswiss Helvetica;}}\n" + body + "}"
    java.nio.file.Files.write(path, doc.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  }
}

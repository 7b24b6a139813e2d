package graft.functions

/**
 * Charset detection + decoding for raw crawl bytes — the step between a
 * WARC/disk payload and the text tier. Web-scale corpora arrive with
 * missing or lying charset labels; the standard treatment (what
 * browsers and the major crawl pipelines converge on) is:
 *
 *  1. BOMs win: EF BB BF → UTF-8, FF FE → UTF-16LE, FE FF → UTF-16BE
 *     (stripped from the decoded text);
 *  2. else STRICT UTF-8 validation (overlongs, surrogates, > U+10FFFF
 *     rejected) — valid UTF-8 is essentially never anything else;
 *  3. else a zero-byte parity heuristic for BOM-less UTF-16 (ASCII-heavy
 *     text puts the zero in a fixed parity position);
 *  4. else Windows-1252, the de-facto legacy web encoding (a superset
 *     of ISO-8859-1 in the 0x80-0x9F range, which is why chardet-family
 *     tools default to it);
 *  5. unless the result is control-character-dense — then the payload is
 *     BINARY, not mislabeled text, and decoding returns null.
 *
 * Deterministic, byte-exact, no statistical models — the right trade at
 * 100 TB where reproducibility beats the last percent of exotic-codepage
 * recall (those are better routed by explicit per-source charsets).
 */
object CharsetKernels {

  /** Detected label: "utf-8" | "utf-16le" | "utf-16be" | "windows-1252"
    * | "binary" | "empty". */
  def detect(b: Array[Byte]): String = {
    if (b == null || b.length == 0) return "empty"
    if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
      (b(2) & 0xFF) == 0xBF) return "utf-8"
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE) return "utf-16le"
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF) return "utf-16be"
    // NUL bytes never occur in real text, but every other byte of
    // ASCII-heavy UTF-16 is one — so the zero census comes FIRST: a
    // NUL-free valid-UTF-8 stream is UTF-8; zeros concentrated at one
    // parity are BOM-less UTF-16; scattered zeros fall through to the
    // binary/control check.
    var zeroEven = 0; var zeroOdd = 0
    var i = 0
    while (i < b.length) {
      if (b(i) == 0) { if ((i & 1) == 0) zeroEven += 1 else zeroOdd += 1 }
      i += 1
    }
    val zeros = zeroEven + zeroOdd
    if (zeros == 0 && isValidUtf8(b)) return "utf-8"
    if (b.length >= 8 && zeros * 10 >= b.length * 3) {
      if (zeroOdd * 10 >= zeros * 9) return "utf-16le"
      if (zeroEven * 10 >= zeros * 9) return "utf-16be"
    }
    // Windows-1252 vs binary: density of C0 controls (excluding \t\n\r\f)
    var ctl = 0
    i = 0
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c < 0x20 && c != '\t' && c != '\n' && c != '\r' && c != '\f') ctl += 1
      i += 1
    }
    if (ctl * 10 > b.length) "binary" else "windows-1252"
  }

  /** Strict UTF-8 validation: overlong forms, UTF-16 surrogates, and
    * code points past U+10FFFF all reject (RFC 3629). */
  def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    var sawMulti = false
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if ((c & 0xE0) == 0xC0) {
        if (c < 0xC2) return false // overlong 2-byte
        if (i + 1 >= b.length || (b(i + 1) & 0xC0) != 0x80) return false
        sawMulti = true; i += 2
      } else if ((c & 0xF0) == 0xE0) {
        if (i + 2 >= b.length || (b(i + 1) & 0xC0) != 0x80 || (b(i + 2) & 0xC0) != 0x80) return false
        val cp = ((c & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
        if (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)) return false
        sawMulti = true; i += 3
      } else if ((c & 0xF8) == 0xF0) {
        if (i + 3 >= b.length || (b(i + 1) & 0xC0) != 0x80 ||
          (b(i + 2) & 0xC0) != 0x80 || (b(i + 3) & 0xC0) != 0x80) return false
        val cp = ((c & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
        if (cp < 0x10000 || cp > 0x10FFFF) return false
        sawMulti = true; i += 4
      } else return false
    }
    val _ = sawMulti // pure-ASCII is valid UTF-8; no distinction needed
    true
  }

  /** Decoded text, or null for binary payloads / unsupported labels.
    * `cs` = "auto" (detect) or an explicit label/charset name. */
  def decode(b: Array[Byte], cs: String): String = {
    if (b == null) return null
    val label = if (cs == "auto") detect(b) else cs.toLowerCase
    label match {
      case "empty" => ""
      case "binary" => null
      case "utf-8" | "utf8" =>
        val skip = if (b.length >= 3 && (b(0) & 0xFF) == 0xEF &&
          (b(1) & 0xFF) == 0xBB && (b(2) & 0xFF) == 0xBF) 3 else 0
        new String(b, skip, b.length - skip, java.nio.charset.StandardCharsets.UTF_8)
      case "utf-16le" | "utf-16be" =>
        val be = label.endsWith("be")
        val hasBom = b.length >= 2 &&
          ((!be && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE) ||
            (be && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF))
        val skip = if (hasBom) 2 else 0
        new String(b, skip, b.length - skip,
          if (be) java.nio.charset.StandardCharsets.UTF_16BE
          else java.nio.charset.StandardCharsets.UTF_16LE)
      case other =>
        try new String(b, java.nio.charset.Charset.forName(other))
        catch { case _: Exception => null }
    }
  }
}

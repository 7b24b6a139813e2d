package graft.engine

import java.nio.charset.StandardCharsets

/**
 * PDF text extraction — PDFs are a major real-corpus source (crawl
 * pipelines extract them alongside HTML), so the engine reads them
 * natively: a from-scratch parser over the public PDF 1.4+ byte layout
 * (ISO 32000 / the Adobe PDF Reference): sequential object scan with
 * stream bodies sliced by /Length (direct or indirect — binary stream
 * data containing the ASCII sequences "endobj"/"endstream" cannot
 * truncate an object), page tree order from /Kids, content streams (raw,
 * /FlateDecode via the JDK Inflater, or /LZWDecode per §7.4.4 with
 * EarlyChange), the standard text-showing operators (Tj, ', TJ arrays)
 * over literal AND hex strings, Tf font tracking, and /ToUnicode CMap
 * remapping (bfchar + bfrange, 1- and 2-byte codes) so subset-font /
 * composite-font digitally-born PDFs extract real text instead of
 * glyph-code garbage. Distributed at the Sources layer via `binaryFiles`
 * (one task per document — the WARC pattern; PDFs in a corpus are many
 * small files).
 *
 * Encrypted documents with the standard security handler and an EMPTY
 * user password — the common "protected" shape — decrypt transparently
 * ([[PdfCrypt]]: RC4 R2-R4, AES-128 /AESV2, AES-256 /AESV3 R5/R6).
 *
 * Honest scope: digitally-born text PDFs. Scanned/image-only pages yield
 * empty text (OCR is out of scope — no model ships here); genuinely
 * password-protected documents refuse cleanly (empty pages, never
 * garbled bytes), and remaining exotic filters (DCT, JBIG2, CCITT) are
 * skipped per-stream rather than failing the document.
 *
 * A minimal deterministic WRITER backs the oracle gate and round-trip
 * specs: simple Helvetica pages (optional Flate), or composite-font
 * pages shown as 2-byte hex strings with a generated ToUnicode CMap
 * (optional LZW) — the subset-font shape real generators emit.
 */
object Pdf {

  // ================================================================ read

  /** Text per page, in /Kids page-tree order. Throws IllegalArgumentException
    * when the payload is not a PDF. */
  def extractText(bytes: Array[Byte]): Vector[String] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1) // byte-faithful
    if (!s.startsWith("%PDF-"))
      throw new IllegalArgumentException("not a PDF (missing %PDF- header)")

    val objs0 = scanObjects(s)

    // Standard security handler: the trailer's /Encrypt dictionary (take
    // the LAST occurrence — incremental updates append) + first /ID
    // element derive the file key for the EMPTY user password; a
    // genuinely password-protected document yields no decryptor and its
    // streams are skipped rather than garbled.
    val dec: Option[PdfCrypt.Decryptor] = {
      val encRef = """(?s)/Encrypt\s+(\d+)\s+0\s+R""".r.findAllMatchIn(s)
        .toSeq.lastOption.map(_.group(1).toInt)
      encRef.flatMap(objs0.get).flatMap { encDict =>
        val id0 = """(?s)/ID\s*\[\s*<([0-9A-Fa-f\s]*)>""".r.findFirstMatchIn(s)
          .map(_.group(1).filterNot(_.isWhitespace).sliding(2, 2)
            .map(h => Integer.parseInt(h, 16).toByte).toArray)
          .getOrElse(Array.empty[Byte])
        PdfCrypt.decryptor(encDict, id0)
      }
    }

    // PDF 1.5+ object streams: page/font/catalog dictionaries routinely
    // live COMPRESSED inside /Type /ObjStm containers (content streams
    // cannot, so text extraction only needs the dict layer expanded).
    // Each ObjStm: N pairs of "objnum offset" then concatenated bodies
    // at /First. Objects INSIDE a container are not re-encrypted — the
    // container stream is.
    val objs: Map[Int, String] = {
      val expanded = scala.collection.mutable.Map[Int, String]()
      objs0.foreach { case (containerNum, o) =>
        if (o.contains("/ObjStm")) {
          for {
            data <- decodeStream(o, containerNum, dec)
            n <- """(?s)/N\s+(\d+)""".r.findFirstMatchIn(o).map(_.group(1).toInt)
            first <- """(?s)/First\s+(\d+)""".r.findFirstMatchIn(o).map(_.group(1).toInt)
          } {
            val body = new String(data, StandardCharsets.ISO_8859_1)
            val nums = """(\d+)\s+(\d+)""".r.findAllMatchIn(body.take(first))
              .map(m => (m.group(1).toInt, m.group(2).toInt)).take(n).toVector
            nums.zipWithIndex.foreach { case ((num, off), i) =>
              val end = if (i + 1 < nums.length) first + nums(i + 1)._2 else body.length
              if (first + off <= end && end <= body.length)
                expanded(num) = body.substring(first + off, end)
            }
          }
        }
      }
      // a directly-stored object wins over an ObjStm copy of the same id
      expanded.toMap ++ objs0
    }

    def refsIn(src: String): Seq[Int] =
      """(\d+)\s+0\s+R""".r.findAllMatchIn(src).map(_.group(1).toInt).toSeq

    // one-level indirection: dictionaries like /Resources or /Font may be
    // an inline << >> or an `N 0 R` reference to an object holding one
    def resolve(src: String, key: String): Option[String] = {
      val keyRe = ("""(?s)""" + java.util.regex.Pattern.quote(key) +
        """\s*(?:(\d+)\s+0\s+R|(<<.*))""").r
      keyRe.findFirstMatchIn(src).flatMap { m =>
        if (m.group(1) != null) objs.get(m.group(1).toInt)
        else Some(balancedDict(m.group(2)))
      }
    }

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
      // per-page ToUnicode CMaps, keyed by the resource font name (/F1 ...)
      val fonts: Map[String, CMap] = (for {
        resources <- resolve(page, "/Resources").toSeq
        fontDict <- resolve(resources, "/Font").toSeq
        m <- """/([A-Za-z0-9._+-]+)\s+(\d+)\s+0\s+R""".r.findAllMatchIn(fontDict)
        fontObj <- objs.get(m.group(2).toInt)
        tuRef <- """(?s)/ToUnicode\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(fontObj)
        tuNum = tuRef.group(1).toInt
        tuObj <- objs.get(tuNum)
        data <- decodeStream(tuObj, tuNum, dec)
      } yield m.group(1) -> parseCMap(new String(data, StandardCharsets.ISO_8859_1))).toMap

      val contentRefs = """(?s)/Contents\s*(?:\[(.*?)\]|(\d+)\s+0\s+R)""".r
        .findFirstMatchIn(page)
        .map(m => if (m.group(1) != null) refsIn(m.group(1)) else Seq(m.group(2).toInt))
        .getOrElse(Nil)
      contentRefs.flatMap(cn => objs.get(cn).map(cn -> _)).map { case (cn, obj) =>
        decodeStream(obj, cn, dec)
          .map(d => extractShownText(new String(d, StandardCharsets.ISO_8859_1), fonts))
          .getOrElse("")
      }.mkString("\n")
    }.toVector
  }

  /** The balanced `<< ... >>` prefix of `src` (which starts with `<<`). */
  private def balancedDict(src: String): String = {
    var depth = 0
    var i = 0
    while (i + 1 < src.length) {
      if (src.charAt(i) == '<' && src.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (src.charAt(i) == '>' && src.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return src.substring(0, i)
      } else i += 1
    }
    src
  }

  /** Sequential object scan: object number -> body (dict + stream). Stream
    * bodies are skipped via /Length where available (resolving one level
    * of indirect length), so binary data containing "endobj" or
    * "endstream" cannot desync the scan; only a missing/garbled /Length
    * falls back to the endstream text search. */
  private def scanObjects(s: String): Map[Int, String] = {
    val objs = scala.collection.mutable.Map[Int, String]()
    val objPat = java.util.regex.Pattern.compile("""(\d+)\s+0\s+obj\b""")
    val m = objPat.matcher(s)
    // indirect /Length targets are plain integer objects; resolve lazily
    def indirectInt(ref: Int): Option[Long] =
      ("""(?s)\b""" + ref + """\s+0\s+obj\s*(\d+)\s*endobj""").r
        .findFirstMatchIn(s).map(_.group(1).toLong)
    var pos = 0
    while (pos < s.length && m.find(pos)) {
      val num = m.group(1).toInt
      val bodyStart = m.end
      val streamIdx = s.indexOf("stream", bodyStart)
      val endobjIdx = s.indexOf("endobj", bodyStart)
      val end =
        if (streamIdx >= 0 && (endobjIdx < 0 || streamIdx < endobjIdx)) {
          // stream object: slice the data by /Length, then find the real
          // endstream/endobj AFTER it
          var ds = streamIdx + "stream".length
          if (ds < s.length && s.charAt(ds) == '\r') ds += 1
          if (ds < s.length && s.charAt(ds) == '\n') ds += 1
          val dict = s.substring(bodyStart, streamIdx)
          val len: Option[Long] =
            """(?s)/Length\s+(\d+)(\s+0\s+R)?""".r.findFirstMatchIn(dict).flatMap { lm =>
              if (lm.group(2) != null) indirectInt(lm.group(1).toInt)
              else Some(lm.group(1).toLong)
            }
          val afterData = len match {
            case Some(l) if ds + l <= s.length => ds + l.toInt
            case _ => ds // unknown length: search from the data start
          }
          val es = s.indexOf("endstream", afterData)
          val eo = s.indexOf("endobj", if (es >= 0) es else afterData)
          if (eo >= 0) eo + "endobj".length
          else s.length
        } else if (endobjIdx >= 0) endobjIdx + "endobj".length
        else s.length
      objs(num) = s.substring(bodyStart,
        math.max(bodyStart, end - "endobj".length))
      pos = end
    }
    objs.toMap
  }

  /** [[parseString]] face for PdfCrypt's literal-string /O //U parsing. */
  private[engine] def parseStringPublic(cs: String, start: Int): (String, Int) =
    parseString(cs, start)

  /** Decode an object's stream payload (decrypt first when a document
    * decryptor applies — decryption wraps OUTSIDE the filters — then
    * raw / Flate / LZW / ASCIIHex / ASCII85); None when the object has no
    * stream or carries an unsupported filter. */
  private def decodeStream(obj: String, num: Int = 0,
                           dec: Option[PdfCrypt.Decryptor] = None): Option[Array[Byte]] = {
    val si = obj.indexOf("stream")
    if (si < 0) return None
    var ds = si + "stream".length
    if (ds < obj.length && obj.charAt(ds) == '\r') ds += 1
    if (ds < obj.length && obj.charAt(ds) == '\n') ds += 1
    val dict = obj.substring(0, si)
    // slice the data by a direct /Length when present (binary data that
    // happens to contain "endstream" cannot truncate the stream); an
    // indirect /Length was already honored by scanObjects' body slicing,
    // so the LAST endstream occurrence is the real terminator there
    val directLen = """(?s)/Length\s+(\d+)(?!\d)(?!\s+0\s+R)""".r
      .findFirstMatchIn(dict).map(_.group(1).toLong)
    val re = directLen match {
      case Some(l) if ds + l <= obj.length => ds + l.toInt
      case _ =>
        val de = obj.lastIndexOf("endstream")
        val rawEnd = if (de > ds) de else obj.length
        // strip the EOL that precedes endstream when present
        var r = rawEnd
        if (r > ds && obj.charAt(r - 1) == '\n') r -= 1
        if (r > ds && obj.charAt(r - 1) == '\r') r -= 1
        r
    }
    val raw0 = obj.substring(ds, re).getBytes(StandardCharsets.ISO_8859_1)
    val raw = dec match {
      case Some(d) => d.decrypt(num, 0, raw0)
      case None => raw0
    }
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
        Some(out.toByteArray)
      } catch { case _: Exception => None } // exotic/corrupt: skip stream
    } else if (dict.contains("/LZWDecode")) {
      val earlyChange =
        """(?s)/EarlyChange\s+(\d+)""".r.findFirstMatchIn(dict)
          .map(_.group(1).toInt).getOrElse(1)
      // Bound expansion to a generous multiple of the input (capped 64 MB):
      // real PDF content streams stay far below; hostile ones abort early.
      val bound = math.min(raw.length.toLong * 512 + 65536, 1L << 26).toInt
      try Some(lzwDecode(raw, earlyChange, bound))
      catch { case _: Exception => None }
    } else if (dict.contains("/ASCIIHexDecode")) {
      try Some(asciiHexDecode(raw)) catch { case _: Exception => None }
    } else if (dict.contains("/ASCII85Decode")) {
      try Some(ascii85Decode(raw)) catch { case _: Exception => None }
    } else if (dict.contains("/Filter")) None // unsupported filter
    else Some(raw)
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, `>` EOD,
    * odd final digit padded with 0. */
  private[engine] def asciiHexDecode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2)
    var hi = -1
    var i = 0
    var done = false
    while (i < in.length && !done) {
      val c = in(i).toChar
      if (c == '>') done = true
      else if (!c.isWhitespace) {
        val d = Character.digit(c, 16)
        if (d < 0) throw new IllegalArgumentException(s"bad hex char $c")
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** ASCII85Decode (§7.4.3): base-85 groups, `z` shorthand for four zero
    * bytes, `~>` EOD, partial final group. */
  private[engine] def ascii85Decode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 4 / 5)
    val group = new Array[Int](5)
    var g = 0
    var i = 0
    var done = false
    def flush(count: Int): Unit = {
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < count) group(k) else 84); k += 1 }
      var shift = 24
      var emitted = 0
      while (emitted < count - 1) {
        out.write(((v >> shift) & 0xFF).toInt)
        shift -= 8
        emitted += 1
      }
    }
    while (i < in.length && !done) {
      val c = in(i).toChar
      if (c == '~') done = true
      else if (c == 'z' && g == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (!c.isWhitespace) {
        if (c < '!' || c > 'u') throw new IllegalArgumentException(s"bad a85 char $c")
        group(g) = c - '!'
        g += 1
        if (g == 5) { flush(5); g = 0 }
      }
      i += 1
    }
    if (g == 1) throw new IllegalArgumentException("a85: lone trailing digit")
    if (g > 1) flush(g)
    out.toByteArray
  }

  // ======================================================== LZW (§7.4.4)

  /** LZW decode per ISO 32000-1 §7.4.4 (TIFF-convention LZW): 8-bit
    * symbols, variable 9-12 bit codes, 256 = clear table, 257 = EOD;
    * `earlyChange` widens the code one entry early (the spec default 1).
    * `maxOutput` bounds expansion: dictionary entries grow to ~4 KB each,
    * so a tiny crafted stream can expand thousands-fold — callers pass
    * the expected plane size (TIFF strips) or a multiple of the input
    * (PDF streams) and the decode aborts past the bound. */
  private[graft] def lzwDecode(in: Array[Byte], earlyChange: Int,
                               maxOutput: Int = Int.MaxValue): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(in.length * 3L, 1L << 16).toInt)
    val dict = new Array[Array[Byte]](4096)
    var dictSize = 0
    def resetDict(): Unit = {
      var i = 0
      while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
      dictSize = 258
    }
    resetDict()
    var width = 9
    var acc = 0L
    var nBits = 0
    var pos = 0
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      while (nBits < width && pos < in.length) {
        acc = (acc << 8) | (in(pos) & 0xFF); nBits += 8; pos += 1
      }
      if (nBits < width) done = true
      else {
        nBits -= width
        val code = ((acc >>> nBits) & ((1L << width) - 1)).toInt
        if (code == 257) done = true // EOD
        else if (code == 256) { resetDict(); width = 9; prev = null }
        else {
          val entry: Array[Byte] =
            if (code < dictSize && dict(code) != null) dict(code)
            else if (code == dictSize && prev != null) prev :+ prev(0) // KwKwK
            else throw new IllegalArgumentException(s"bad LZW code $code")
          if (out.size().toLong + entry.length > maxOutput)
            throw new IllegalArgumentException(s"LZW output exceeds bound $maxOutput")
          out.write(entry, 0, entry.length)
          if (prev != null && dictSize < 4096) {
            dict(dictSize) = prev :+ entry(0)
            dictSize += 1
          }
          if (dictSize + earlyChange >= (1 << width) && width < 12) width += 1
          prev = entry
        }
      }
    }
    out.toByteArray
  }

  /** LZW encode (fixtures/specs), mirror conventions of [[lzwDecode]]. */
  private[engine] def lzwEncode(in: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length)
    var acc = 0L
    var nBits = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code; nBits += width
      while (nBits >= 8) {
        nBits -= 8
        out.write(((acc >>> nBits) & 0xFF).toInt)
      }
    }
    val dict = new java.util.HashMap[String, Int]()
    var dictSize = 258
    def key(bytes: collection.Seq[Byte]): String =
      new String(bytes.toArray, StandardCharsets.ISO_8859_1)
    put(256) // initial clear, as most writers emit
    var cur = scala.collection.mutable.ArrayBuffer[Byte]()
    def codeOf(k: collection.Seq[Byte]): Int =
      if (k.length == 1) k.head & 0xFF else dict.get(key(k))
    var i = 0
    while (i < in.length) {
      val next = cur :+ in(i)
      if (next.length == 1 || dict.containsKey(key(next))) cur = next
      else {
        put(codeOf(cur))
        if (dictSize < 4096) {
          dict.put(key(next), dictSize)
          dictSize += 1
          // the encoder's dictionary runs ONE entry ahead of the
          // decoder's (the decoder can only add prev+entry after reading
          // the next code), so its widening trigger is one later than the
          // decoder's `dictSize + earlyChange >= (1 << width)` rule
          if (dictSize + earlyChange > (1 << width) && width < 12) width += 1
        } else { put(256); dict.clear(); dictSize = 258; width = 9 }
        cur = scala.collection.mutable.ArrayBuffer(in(i))
      }
      i += 1
    }
    if (cur.nonEmpty) put(codeOf(cur))
    put(257) // EOD
    if (nBits > 0) { // flush: pad with zeros
      out.write(((acc << (8 - nBits)) & 0xFF).toInt)
    }
    out.toByteArray
  }

  // ================================================== ToUnicode (§9.10.3)

  /** A font's code → text map. `codeLen` is the source code width in
    * bytes (1 for simple fonts, 2 for the usual Identity-H subsets). */
  private[engine] final case class CMap(codeLen: Int, map: Map[Int, String])

  /** Parse a ToUnicode CMap stream: bfchar pairs and bfrange spans
    * (contiguous-destination and array forms), destinations decoded as
    * UTF-16BE. */
  private[engine] def parseCMap(src: String): CMap = {
    val out = scala.collection.mutable.Map[Int, String]()
    var codeLen = 1
    def hexStr(h: String): String =
      new String(h.sliding(2, 2).map(b => Integer.parseInt(b, 16).toByte).toArray,
        StandardCharsets.UTF_16BE)
    def noteLen(h: String): Unit = codeLen = math.max(codeLen, h.length / 2)
    val hex = """<([0-9A-Fa-f]+)>"""
    """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(src).foreach { block =>
      (hex + """\s*""" + hex).r.findAllMatchIn(block.group(1)).foreach { m =>
        noteLen(m.group(1))
        out(Integer.parseInt(m.group(1), 16)) = hexStr(m.group(2))
      }
    }
    """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(src).foreach { block =>
      // array form FIRST: <lo> <hi> [ <d1> <d2> ... ] — then blank those
      // spans out so the contiguous-form regex cannot misread a run of
      // hexes inside a destination array as <lo> <hi> <dst>
      val arrayRe = (hex + """\s*""" + hex + """\s*\[((?:\s*""" + hex + """\s*)+)\]""").r
      val body0 = block.group(1)
      arrayRe.findAllMatchIn(body0).foreach { m =>
        noteLen(m.group(1))
        val lo = Integer.parseInt(m.group(1), 16)
        val dsts = hex.r.findAllMatchIn(m.group(3)).map(_.group(1)).toSeq
        dsts.zipWithIndex.foreach { case (d, i) => out(lo + i) = hexStr(d) }
      }
      val body = arrayRe.replaceAllIn(body0, " ")
      // contiguous form: <lo> <hi> <dstStart>
      (hex + """\s*""" + hex + """\s*""" + hex).r.findAllMatchIn(body).foreach { m =>
        noteLen(m.group(1))
        val lo = Integer.parseInt(m.group(1), 16)
        val hi = Integer.parseInt(m.group(2), 16)
        val d0 = Integer.parseInt(m.group(3), 16)
        var c = lo
        while (c <= hi && c - lo <= 0xFFFF) { // range bound sanity
          out(c) = new String(Character.toChars(d0 + (c - lo)))
          c += 1
        }
      }
    }
    CMap(codeLen, out.toMap)
  }

  /** Remap a shown string's raw bytes through the current font's CMap;
    * identity when no CMap applies (simple Latin-text PDFs). */
  private def mapShown(raw: String, cmap: CMap): String = {
    if (cmap == null) return raw
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      var code = 0
      var k = 0
      while (k < cmap.codeLen && i < raw.length) {
        code = (code << 8) | (raw.charAt(i) & 0xFF); i += 1; k += 1
      }
      cmap.map.get(code) match {
        case Some(t) => sb.append(t)
        case None => if (cmap.codeLen == 1) sb.append(code.toChar) // raw byte
      }
    }
    sb.toString
  }

  /** PDF token delimiter per ISO 32000-1 §7.2: whitespace or one of the
    * structural delimiters. */
  private def pdfDelim(c: Char): Boolean =
    c.isWhitespace || "()<>[]{}/%".indexOf(c) >= 0

  /** Walk a content stream for the Tj / quote / TJ show operators over
    * literal and hex strings, tracking the current font via Tf so
    * ToUnicode CMaps apply; a text-positioning op (Td, TD, T-star, quote)
    * between shows contributes a newline. */
  private[engine] def extractShownText(cs: String,
                                       fonts: Map[String, CMap] = Map.empty): String = {
    val sb = new StringBuilder
    var i = 0
    var pendingBreak = false
    var shown = false
    var pendingName: String = null
    var cmap: CMap = null
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
          if (rest.trim.startsWith("'")) { pendingBreak = true; appendShow(mapShown(str, cmap)) }
          else appendShow(mapShown(str, cmap))
        case '<' if i + 1 < cs.length && cs.charAt(i + 1) == '<' =>
          i += 2 // inline dictionary (BDC property lists etc.)
        case '<' =>
          val end = cs.indexOf('>', i + 1)
          if (end < 0) i = cs.length
          else {
            val digits = cs.substring(i + 1, end).filterNot(_.isWhitespace)
            val padded = if (digits.length % 2 == 1) digits + "0" else digits
            if (padded.forall(c => Character.digit(c, 16) >= 0)) {
              val raw = new String(
                padded.sliding(2, 2).map(b => Integer.parseInt(b, 16).toByte).toArray,
                StandardCharsets.ISO_8859_1)
              appendShow(mapShown(raw, cmap))
            }
            i = end + 1
          }
        case '/' =>
          val st = i + 1
          var e = st
          while (e < cs.length && (cs.charAt(e).isLetterOrDigit ||
            "._+-".indexOf(cs.charAt(e)) >= 0)) e += 1
          pendingName = cs.substring(st, e)
          i = e
        case '%' => // comment to end of line
          while (i < cs.length && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
        case 'B' if i + 1 < cs.length && cs.charAt(i + 1) == 'I' &&
          (i == 0 || pdfDelim(cs.charAt(i - 1))) &&
          (i + 2 >= cs.length || pdfDelim(cs.charAt(i + 2))) =>
          // Inline image (ISO 32000-1 §8.9.7): BI <dict> ID <binary> EI.
          // The binary payload can contain '(' or '<' bytes that would be
          // parsed as show strings or desync the walker — skip the dict to
          // the ID token, then the data to a whitespace-preceded EI token.
          var j = i + 2
          var idAt = -1
          while (idAt < 0 && j + 1 < cs.length) {
            if (cs.charAt(j) == 'I' && cs.charAt(j + 1) == 'D' &&
              pdfDelim(cs.charAt(j - 1)) &&
              (j + 2 >= cs.length || pdfDelim(cs.charAt(j + 2)))) idAt = j
            j += 1
          }
          if (idAt < 0) i = cs.length
          else {
            var k = idAt + 3 // past "ID" and the single whitespace byte
            var eiAt = -1
            while (eiAt < 0 && k + 1 < cs.length) {
              if (cs.charAt(k) == 'E' && cs.charAt(k + 1) == 'I' &&
                cs.charAt(k - 1).isWhitespace &&
                (k + 2 >= cs.length || pdfDelim(cs.charAt(k + 2)))) eiAt = k
              k += 1
            }
            i = if (eiAt < 0) cs.length else eiAt + 2
          }
        case 'T' if i + 1 < cs.length && cs.charAt(i + 1) == 'f' =>
          if (pendingName != null) cmap = fonts.getOrElse(pendingName, null)
          i += 2
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
            compress: Boolean = false): Unit =
    writeDoc(path, pages, cmapFont = false, filter =
      if (compress) "flate" else "none")

  /** Composite-font variant: text shown as 2-byte hex-string glyph codes
    * with a generated /ToUnicode CMap (bfrange runs + bfchar singles) —
    * the subset-font shape real PDF generators emit, where extraction
    * without CMap support yields garbage. `lzw` switches the content and
    * CMap streams to /LZWDecode. */
  def writeCMap(path: java.nio.file.Path, pages: Seq[String],
                lzw: Boolean = false): Unit =
    writeDoc(path, pages, cmapFont = true, filter = if (lzw) "lzw" else "flate")

  /** Encrypted variant (standard security handler, EMPTY user and owner
    * passwords — the "protected" shape any conforming reader opens
    * without prompting). `mode`: "rc4" (R3), "aes" (R4 /AESV2), "aes256"
    * (R6 /AESV3). */
  def writeEncrypted(path: java.nio.file.Path, pages: Seq[String],
                     mode: String = "rc4"): Unit =
    writeDoc(path, pages, cmapFont = false, filter = "flate", encrypt = Some(mode))

  private def encodeFilter(payload: Array[Byte], filter: String): (Array[Byte], String) =
    filter match {
      case "flate" =>
        val d = new java.util.zip.Deflater()
        d.setInput(payload); d.finish()
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
        d.end()
        (bos.toByteArray, " /Filter /FlateDecode")
      case "lzw" => (lzwEncode(payload), " /Filter /LZWDecode")
      case _ => (payload, "")
    }

  private def writeDoc(path: java.nio.file.Path, pages: Seq[String],
                       cmapFont: Boolean, filter: String,
                       encrypt: Option[String] = None): Unit = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    def beginObj(n: Int): Unit = { offsets += out.size().toLong; w(s"$n 0 obj\n") }
    // deterministic document ID: derived from the page content
    val id0: Array[Byte] = java.security.MessageDigest.getInstance("MD5")
      .digest(pages.mkString("\u0000").getBytes(StandardCharsets.UTF_8))
    val crypt: Option[(String, (Int, Int, Array[Byte]) => Array[Byte])] =
      encrypt.map(PdfCrypt.writerFor(_, id0))
    def streamObj(n: Int, payload: Array[Byte], extraDict: String = ""): Unit = {
      val (encoded, f) = encodeFilter(payload, filter)
      // the cipher wraps OUTSIDE the filters (readers decrypt, then decode)
      val bytes = crypt match {
        case Some((_, fn)) => fn(n, 0, encoded)
        case None => encoded
      }
      beginObj(n)
      w(s"<< /Length ${bytes.length}$f$extraDict >>\nstream\n")
      out.write(bytes)
      w("\nendstream\nendobj\n")
    }

    // glyph-code assignment for the cmap font: distinct chars in char
    // order, codes from 1 — consecutive chars form bfrange runs, so both
    // CMap entry forms are exercised by any real text
    val charToCode: Map[Char, Int] =
      if (!cmapFont) Map.empty
      else pages.flatMap(_.toSeq).filter(_ != '\n').distinct.sorted.zipWithIndex
        .map { case (c, i) => c -> (i + 1) }.toMap

    val nPages = pages.length
    val fontObj = 3 + 2 * nPages
    val cmapObj = fontObj + 1
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
      val body =
        if (cmapFont) {
          def hexOf(l: String): String =
            l.map(c => f"${charToCode(c)}%04X").mkString
          "BT /F1 12 Tf 72 720 Td 14 TL " +
            lines.map(l => s"<${hexOf(l)}> Tj").mkString(" T* ") + " ET"
        } else {
          "BT /F1 12 Tf 72 720 Td 14 TL " +
            lines.map(l => s"(${esc(l)}) Tj").mkString(" T* ") + " ET"
        }
      streamObj(contentNum, body.getBytes(StandardCharsets.ISO_8859_1))
    }
    beginObj(fontObj)
    if (cmapFont)
      w(s"<< /Type /Font /Subtype /Type0 /BaseFont /GraftSubset " +
        s"/Encoding /Identity-H /ToUnicode $cmapObj 0 R >>\nendobj\n")
    else
      w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    if (cmapFont) {
      // bfrange runs over consecutive (code, char) progressions + bfchar
      // singles; 100-entry block limit per §9.10.3
      val byCode = charToCode.toSeq.map(_.swap).sortBy(_._1)
      val runs = scala.collection.mutable.ArrayBuffer[(Int, Int, Char)]() // lo, hi, char0
      byCode.foreach { case (code, ch) =>
        runs.lastOption match {
          case Some((lo, hi, c0)) if code == hi + 1 && ch == c0 + (hi - lo) + 1 =>
            runs(runs.length - 1) = (lo, code, c0)
          case _ => runs += ((code, code, ch))
        }
      }
      val (ranges, singles) = runs.partition { case (lo, hi, _) => hi > lo }
      val sb = new StringBuilder
      sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
      sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
      ranges.grouped(100).foreach { g =>
        sb.append(s"${g.length} beginbfrange\n")
        g.foreach { case (lo, hi, c0) =>
          sb.append(f"<$lo%04X> <$hi%04X> <${c0.toInt}%04X>\n")
        }
        sb.append("endbfrange\n")
      }
      singles.grouped(100).foreach { g =>
        sb.append(s"${g.length} beginbfchar\n")
        g.foreach { case (lo, _, c0) => sb.append(f"<$lo%04X> <${c0.toInt}%04X>\n") }
        sb.append("endbfchar\n")
      }
      sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
      streamObj(cmapObj, sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    }
    var total = (if (cmapFont) cmapObj else fontObj) + 1
    val encTrailer = crypt match {
      case Some((dict, _)) =>
        val encObj = total
        beginObj(encObj)
        w(s"<< $dict >>\nendobj\n")
        total += 1
        val idHex = id0.map(b => f"$b%02X").mkString
        s" /Encrypt $encObj 0 R /ID [<$idHex> <$idHex>]"
      case None => ""
    }
    val xrefAt = out.size()
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $total /Root 1 0 R$encTrailer >>\nstartxref\n$xrefAt\n%%EOF\n")
    java.nio.file.Files.write(path, out.toByteArray)
  }
}

package graft.engine

/**
 * Legacy Word binary (.doc, the public [MS-DOC] spec) text extraction —
 * the last big legacy-document crawl format after PDF/OOXML/RTF. Built
 * on the same from-scratch OLE2 container parser the spreadsheet tier
 * uses ([[Cfb]], bytes-based so extraction runs inside `binaryFiles`
 * partitions).
 *
 * Path: FIB in the `WordDocument` stream (wIdent 0xA5EC; the
 * fWhichTblStm bit at offset 0x0A picks `1Table`/`0Table`; ccpText at
 * 0x4C bounds the MAIN document range, excluding footnote/header
 * subdocuments; fcClx/lcbClx at 0x1A2/0x1A6) → Clx in the table stream
 * (Prc property chunks skipped, Pcdt piece table parsed) → pieces read
 * from `WordDocument` at their fc offsets, 8-bit Windows-1252 when the
 * PCD's fCompressed bit is set (fc/2 addressing) or UTF-16LE otherwise.
 *
 * Control characters map like the RTF walker: 0x0D (paragraph mark) and
 * 0x07 (cell/row mark) end a row unit, 0x0B line break stays inside
 * one, 0x09 tab kept, field instructions (0x13..0x14) dropped with the
 * field RESULT (0x14..0x15) kept, object markers and the rest of the
 * C0 range dropped.
 *
 * The writer emits a minimal two-stream package (FIB + one UTF-16 and
 * optionally one compressed piece) for fixtures and the oracle gate.
 *
 * Reference semantics: earthmover reads legacy spreadsheets via pandas
 * but has no Word source (beyond-reference tier).
 */
object Doc {

  private def u16(b: Array[Byte], o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  /** Non-empty paragraph texts of the MAIN document, document order.
    * Wrapped diagnosable: hostile offsets surface as bounds errors deep
    * in the CFB/piece walk and must reject as IllegalArgumentException,
    * never raw ArrayIndexOutOfBounds. */
  def extractParagraphs(bytes: Array[Byte]): Vector[String] = Docx.diagnosable("doc") {
    val word = Cfb.readStreamBytes(bytes, Seq("WordDocument"), "doc")
    require(word.length >= 0x200, "doc: WordDocument stream too short for a FIB")
    require(u16(word, 0) == 0xA5EC, "doc: bad FIB wIdent (not a Word binary file)")
    val flags = u16(word, 0x0A)
    require((flags & 0x0100) == 0, "doc: encrypted document (fEncrypted) — refusing")
    val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
    val table = Cfb.readStreamBytes(bytes, Seq(tableName), "doc")
    val ccpText = u32(word, 0x4C)
    val fcClx = u32(word, 0x1A2)
    val lcbClx = u32(word, 0x1A6)
    require(lcbClx > 0 && fcClx >= 0 && fcClx + lcbClx <= table.length,
      s"doc: Clx [$fcClx, +$lcbClx) outside the $tableName stream (${table.length} bytes)")
    require(ccpText >= 0 && ccpText <= (1L << 24), s"doc: implausible ccpText $ccpText")

    // Clx: Prc chunks (0x01, cb u16, grpprl) then the Pcdt (0x02, lcb u32,
    // PlcPcd)
    var p = fcClx.toInt
    val clxEnd = (fcClx + lcbClx).toInt
    while (p < clxEnd && (table(p) & 0xFF) == 0x01) {
      p += 3 + u16(table, p + 1)
    }
    require(p < clxEnd && (table(p) & 0xFF) == 0x02, "doc: Clx has no Pcdt")
    val lcbPlc = u32(table, p + 1)
    val plc = p + 5
    require(plc + lcbPlc <= clxEnd, "doc: PlcPcd overruns the Clx")
    // PlcPcd with n pieces: (n+1) CPs (4 bytes) + n PCDs (8 bytes)
    val n = ((lcbPlc - 4) / 12).toInt
    require(n >= 1 && (n + 1) * 4L + n * 8L == lcbPlc, s"doc: bad PlcPcd size $lcbPlc")
    val cps = Array.tabulate(n + 1)(i => u32(table, plc + i * 4))
    val pcdBase = plc + (n + 1) * 4

    val out = new StringBuilder
    var i = 0
    while (i < n) {
      val fcField = u32(table, pcdBase + i * 8 + 2)
      val compressed = (fcField & 0x40000000L) != 0
      val fc = (fcField & 0x3FFFFFFFL).toInt
      // clamp the piece to the main-document range
      val cpLen = (math.min(cps(i + 1), ccpText) - math.min(cps(i), ccpText)).toInt
      if (cpLen > 0) {
        if (compressed) {
          val off = fc / 2
          require(off >= 0 && off + cpLen <= word.length, "doc: compressed piece out of range")
          out.append(new String(word, off, cpLen,
            java.nio.charset.Charset.forName("windows-1252")))
        } else {
          require(fc >= 0 && fc + cpLen * 2 <= word.length, "doc: unicode piece out of range")
          out.append(new String(word, fc, cpLen * 2,
            java.nio.charset.StandardCharsets.UTF_16LE))
        }
      }
      i += 1
    }

    // control-character walk: paragraphs on 0x0D/0x07, field instr dropped
    val paras = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inFieldInstr = false
    def endPara(): Unit = {
      if (cur.exists(!_.isWhitespace)) paras += cur.toString
      cur.clear()
    }
    out.foreach {
      case '\r' | '\u0007' => endPara() // paragraph mark / cell-row mark
      case '\u000B' | '\u000C' => if (!inFieldInstr) cur.append('\n') // line/page break
      case '\u0013' => inFieldInstr = true // field begin: instruction text
      case '\u0014' => inFieldInstr = false // field separator: result shown
      case '\u0015' => () // field end
      case '\t' => if (!inFieldInstr) cur.append('\t')
      case c if c >= 0x20 => if (!inFieldInstr) cur.append(c)
      case _ => () // object markers / remaining C0 controls
    }
    endPara()
    paras.result()
  }

  // ------------------------------------------------------------ writer

  /** Minimal valid .doc: paragraphs joined with 0x0D into ONE UTF-16LE
    * piece at offset 0x400 of a padded WordDocument stream, Clx in
    * `1Table`. `asciiPiece` (specs) prepends a Windows-1252 compressed
    * piece to exercise both PCD encodings. */
  def write(path: java.nio.file.Path, paragraphs: Seq[String],
            asciiPiece: Option[String] = None): Unit = {
    // Word's text stream has no 0x0A: an in-paragraph line break is the
    // 0x0B VT control (the reader maps it back to '\n')
    val uniText = paragraphs.map(_.replace('\n', '\u000B') + "\r").mkString
    val ascii = asciiPiece.getOrElse("")
    require(ascii.forall(c => c >= 0x20 && c < 0x7F || c == '\r' || c == '\t'),
      "asciiPiece must be printable ASCII")

    val word = new java.io.ByteArrayOutputStream()
    val fib = new Array[Byte](0x400)
    def put16(o: Int, v: Int): Unit = { fib(o) = v.toByte; fib(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Long): Unit = {
      put16(o, (v & 0xFFFF).toInt); put16(o + 2, ((v >> 16) & 0xFFFF).toInt)
    }
    put16(0, 0xA5EC) // wIdent
    put16(2, 0x00C1) // nFib: Word 97
    put16(0x0A, 0x0200) // fWhichTblStm -> 1Table
    put16(0x20, 0x000E) // csw
    put16(0x3E, 0x0016) // cslw
    put16(0x98, 0x005D) // cbRgFcLcb (Word 97)
    put32(0x4C, ascii.length.toLong + uniText.length.toLong) // ccpText
    // fcClx/lcbClx written below once the Clx is built

    val asciiFc = 0x400 // byte offset right after the FIB block
    val uniFc = 0x400 + ascii.length + (ascii.length & 1) // align for UTF-16
    val clx = new java.io.ByteArrayOutputStream()
    clx.write(0x02)
    // a compressed PCD stores fc = byte_offset * 2 (the reader halves it)
    val pieces =
      (if (ascii.nonEmpty) Seq((ascii.length.toLong, (asciiFc.toLong * 2) | 0x40000000L))
       else Nil) :+ ((uniText.length.toLong, uniFc.toLong))
    val lcb = (pieces.length + 1) * 4 + pieces.length * 8
    def w32(v: Long): Unit = {
      clx.write((v & 0xFF).toInt); clx.write(((v >> 8) & 0xFF).toInt)
      clx.write(((v >> 16) & 0xFF).toInt); clx.write(((v >> 24) & 0xFF).toInt)
    }
    w32(lcb.toLong)
    var cp = 0L
    w32(cp)
    pieces.foreach { case (len, _) => cp += len; w32(cp) }
    pieces.foreach { case (_, fcField) =>
      clx.write(0); clx.write(0) // PCD flags
      w32(fcField)
      clx.write(0); clx.write(0) // prm
    }
    val clxBytes = clx.toByteArray
    put32(0x1A2, 0L) // fcClx: Clx at offset 0 of the table stream
    put32(0x1A6, clxBytes.length.toLong)

    word.write(fib)
    if (ascii.nonEmpty) {
      word.write(ascii.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      if ((ascii.length & 1) == 1) word.write(0)
    }
    word.write(uniText.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    while (word.size() < 4096) word.write(0) // stay out of the mini stream
    val tableStream = java.util.Arrays.copyOf(clxBytes, math.max(clxBytes.length, 4096))

    graft.tools.GenXls.writeCfbMulti(path.toString,
      Seq("WordDocument" -> word.toByteArray, "1Table" -> tableStream))
  }
}

package graft.engine

/**
 * Email sources: `.eml` (RFC 5322 + MIME, RFCs 2045-2047) and `.mbox`
 * (the classic `From ` separator convention) — mailing-list archives
 * are a long-standing public text-corpus source.
 *
 * One row per message: (subject, mail_from, date, text) where
 *
 *  - headers are unfolded and RFC 2047 encoded-words decoded (B and Q
 *    forms, any JVM charset, `_` → space in Q);
 *  - the body walk recurses into multipart subtrees by boundary, picking the
 *    FIRST text/plain leaf (the de-facto archive convention); a
 *    single-part non-multipart body is taken as-is;
 *  - Content-Transfer-Encoding quoted-printable and base64 are decoded
 *    (soft line breaks, `=HH` escapes), then bytes decode through the
 *    Content-Type charset parameter (default UTF-8 — a superset of the
 *    us-ascii default that also survives real-world mislabeling);
 *  - mbox splitting honors the `>From ` quoting convention.
 *
 * Reference semantics: earthmover has no mail source (beyond-reference
 * tier, like WARC/PDF/OOXML).
 */
object Eml {

  final case class Message(subject: String, from: String, date: String, text: String)

  // ------------------------------------------------------------ parsing

  /** Split raw bytes into (headerMap, bodyBytes); headers unfolded. */
  private def splitHeaders(bytes: Array[Byte]): (Map[String, String], Array[Byte]) = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sep = {
      val a = s.indexOf("\r\n\r\n")
      val b = s.indexOf("\n\n")
      if (a < 0 && b < 0) s.length
      else if (a < 0) b else if (b < 0) a else math.min(a, b)
    }
    val headerText = s.substring(0, sep)
    val bodyStart = if (sep == s.length) s.length
      else if (s.startsWith("\r\n\r\n", sep)) sep + 4 else sep + 2
    val unfolded = headerText.replaceAll("\r?\n[ \t]+", " ")
    val headers = unfolded.split("\r?\n").toSeq.flatMap { line =>
      val i = line.indexOf(':')
      if (i <= 0) None
      else Some(line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
    }.toMap
    (headers, java.util.Arrays.copyOfRange(bytes, bodyStart, bytes.length))
  }

  /** RFC 2047 encoded-word decoding: =?charset?B|Q?payload?=. Linear
    * whitespace BETWEEN two adjacent encoded-words is ignored per
    * §6.2 (folded multi-word subjects must concatenate seamlessly). */
  private[engine] def decodeHeader(h0: String): String = {
    val h = h0.replaceAll("(\\?=)[ \t\r\n]+(=\\?)", "$1$2")
    val Word = """=\?([^?]+)\?([bBqQ])\?([^?]*)\?=""".r
    Word.replaceAllIn(h, m => {
      val cs = try java.nio.charset.Charset.forName(m.group(1))
      catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
      val raw = m.group(2).toLowerCase match {
        case "b" => java.util.Base64.getMimeDecoder.decode(m.group(3))
        case _ =>
          val q = m.group(3).replace('_', ' ')
          decodeQp(q.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      }
      java.util.regex.Matcher.quoteReplacement(new String(raw, cs))
    })
  }

  /** Quoted-printable decode: =HH escapes and soft line breaks. */
  private def decodeQp(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length)
    var i = 0
    while (i < in.length) {
      val c = in(i) & 0xFF
      if (c == '=' && i + 1 < in.length) {
        if (in(i + 1) == '\r' && i + 2 < in.length && in(i + 2) == '\n') i += 3 // soft break
        else if (in(i + 1) == '\n') i += 2
        else if (i + 2 < in.length) {
          val h = Character.digit(in(i + 1).toChar, 16)
          val l = Character.digit(in(i + 2).toChar, 16)
          if (h >= 0 && l >= 0) { out.write((h << 4) | l); i += 3 }
          else { out.write(c); i += 1 }
        } else { out.write(c); i += 1 }
      } else { out.write(c); i += 1 }
    }
    out.toByteArray
  }

  private def param(headerValue: String, name: String): Option[String] = {
    val P = ("""(?i)""" + name + """\s*=\s*"?([^";\s]+)"?""").r
    P.findFirstMatchIn(headerValue).map(_.group(1))
  }

  /** Decode one (non-multipart) body per its encoding + charset. */
  private def decodeBody(body: Array[Byte], contentType: String, cte: String): String = {
    val raw = cte.trim.toLowerCase match {
      case "base64" =>
        val cleaned = new String(body, java.nio.charset.StandardCharsets.ISO_8859_1)
          .replaceAll("[^A-Za-z0-9+/=]", "")
        try java.util.Base64.getDecoder.decode(cleaned)
        catch { case _: Exception => body }
      case "quoted-printable" => decodeQp(body)
      case _ => body
    }
    val cs = param(contentType, "charset")
      .flatMap(n => try Some(java.nio.charset.Charset.forName(n)) catch { case _: Exception => None })
      .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
    new String(raw, cs).replace("\r\n", "\n")
  }

  /** First leaf of the wanted media type in a MIME tree (depth-bounded).
    * `want` matches the media type; "" stands in for a missing
    * Content-Type (implicitly text/plain per RFC 2045 §5.2). */
  private def leafOf(headers: Map[String, String], body: Array[Byte], depth: Int,
                     want: String => Boolean): Option[String] = {
    if (depth > 8) return None
    val ct = headers.getOrElse("content-type", "text/plain")
    val cte = headers.getOrElse("content-transfer-encoding", "7bit")
    val mediaType = ct.takeWhile(_ != ';').trim.toLowerCase
    if (mediaType.startsWith("multipart/")) {
      val boundary = param(ct, "boundary").getOrElse(return None)
      val marker = "--" + boundary
      val s = new String(body, java.nio.charset.StandardCharsets.ISO_8859_1)
      val chunks = s.split(java.util.regex.Pattern.quote(marker)).toSeq
        .drop(1) // preamble
        .takeWhile(c => !c.startsWith("--")) // epilogue after the final --
      chunks.view.flatMap { chunk =>
        val trimmed = chunk.dropWhile(c => c == '\r' || c == '\n')
        val (ph, pb) = splitHeaders(trimmed.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        leafOf(ph, pb, depth + 1, want)
      }.headOption
    } else if (want(mediaType)) {
      Some(decodeBody(body, ct, cte).replaceAll("\\s+$", ""))
    } else None
  }

  /** Message text: the first text/plain leaf (the archive convention);
    * an HTML-ONLY message — common in real mail — falls back to its
    * first text/html leaf stripped through the same heuristic extraction
    * the crawl pipeline uses (html_to_text's string twin). */
  private def textOf(headers: Map[String, String], body: Array[Byte], depth: Int): Option[String] =
    leafOf(headers, body, depth, mt => mt == "text/plain" || mt.isEmpty)
      .orElse(leafOf(headers, body, depth, _ == "text/html")
        .map(graft.functions.TextFunctions.htmlToTextString))

  /** Parse one RFC 5322 message. */
  def parseEml(bytes: Array[Byte]): Message = {
    val (headers, body) = splitHeaders(bytes)
    if (!headers.contains("from") && !headers.contains("subject") && !headers.contains("date"))
      throw new IllegalArgumentException("eml: no From/Subject/Date headers — not a message")
    Message(
      decodeHeader(headers.getOrElse("subject", "")),
      decodeHeader(headers.getOrElse("from", "")),
      headers.getOrElse("date", ""),
      textOf(headers, body, 0).getOrElse(""))
  }

  /** Split an mbox into messages (`From ` separator lines, `>From `
    * unquoting inside bodies). */
  private val HeaderLine =
    java.util.regex.Pattern.compile("[\\x21-\\x39\\x3B-\\x7E]+:.*")

  /** mboxo tolerance: true when the text at `from` (what follows a
    * candidate `From ` separator line) opens like a message — an RFC 5322
    * `name:` header line within the first lines, before any blank line.
    * An UNQUOTED body line starting `From ` (legal in mboxo; mboxrd
    * quotes it `>From `, which is why that convention exists) is followed
    * by more body, not headers, so it fails the check and the false split
    * merges back into its owner. (A body that places header-shaped text
    * immediately after an unquoted `From ` line can still false-split —
    * inherent to the mboxo format.) */
  private[engine] def looksLikeMessage(s: String, from: Int): Boolean = {
    var p = from
    var line = 0
    while (p < s.length && line < 10) {
      val e0 = s.indexOf('\n', p)
      val eRaw = if (e0 < 0) s.length else e0
      // CRLF tolerance: the trailing \r is line-ending, not content
      val e = if (eRaw > p && s.charAt(eRaw - 1) == '\r') eRaw - 1 else eRaw
      if (e == p) return false
      if (HeaderLine.matcher(s.subSequence(p, e)).matches()) return true
      if (e0 < 0) return false
      p = eRaw + 1
      line += 1
    }
    false
  }

  def parseMbox(bytes: Array[Byte]): Vector[Message] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("From "))
      throw new IllegalArgumentException("mbox: does not start with a `From ` separator")
    // cut only at GENUINE separators (offset 0, or header-shaped content
    // following) — a false separator's `From ` line stays in the body
    val sep = java.util.regex.Pattern.compile("(?m)^From [^\n]*\n").matcher(s)
    val cuts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    while (sep.find()) {
      if (sep.start == 0 || looksLikeMessage(s, sep.end)) cuts += ((sep.start, sep.end))
    }
    if (cuts.isEmpty) throw new IllegalArgumentException("mbox: no messages")
    val messages = cuts.indices.toVector.map { i =>
      val end = if (i + 1 < cuts.length) cuts(i + 1)._1 else s.length
      s.substring(cuts(i)._2, end)
    }.filter(_.nonEmpty)
    if (messages.isEmpty) throw new IllegalArgumentException("mbox: no messages")
    messages.map { m =>
      val unquoted = m.replaceAll("(?m)^>(>*From )", "$1")
      parseEml(unquoted.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    }
  }

  // ------------------------------------------------------------ writers

  /** Minimal single-part or multipart message; `encoding` is one of
    * "7bit", "quoted-printable", "base64". Non-ASCII subjects emit RFC
    * 2047 B-words. */
  def writeEml(subject: String, from: String, date: String, text: String,
               encoding: String = "7bit", multipart: Boolean = false): String = {
    def encWord(s: String): String =
      if (s.forall(c => c >= 0x20 && c < 0x7F)) s
      else "=?UTF-8?B?" + java.util.Base64.getEncoder.encodeToString(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) + "?="
    val bodyBytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val encoded = encoding match {
      case "base64" =>
        java.util.Base64.getMimeEncoder(72, "\n".getBytes).encodeToString(bodyBytes)
      case "quoted-printable" =>
        val sb = new StringBuilder
        bodyBytes.foreach { b =>
          val c = b & 0xFF
          if (c == '\n') sb.append('\n')
          else if (c >= 0x20 && c < 0x7F && c != '=') sb.append(c.toChar)
          else sb.append(f"=$c%02X")
        }
        sb.toString
      case _ => text
    }
    val part = s"Content-Type: text/plain; charset=UTF-8\n" +
      s"Content-Transfer-Encoding: $encoding\n\n$encoded\n"
    val headers = s"From: $from\nSubject: ${encWord(subject)}\nDate: $date\n"
    if (multipart) {
      val b = "graftboundary42"
      headers + s"MIME-Version: 1.0\nContent-Type: multipart/mixed; boundary=$b\n\n" +
        s"preamble is ignored\n--$b\n" +
        "Content-Type: application/octet-stream\n" +
        "Content-Transfer-Encoding: base64\n\nAAAA\n" +
        s"--$b\n$part--$b--\nepilogue\n"
    } else headers + part
  }

  def writeMbox(path: java.nio.file.Path, messages: Seq[String]): Unit = {
    val body = messages.map { m =>
      "From graft@fixture Thu Jan  1 00:00:00 1970\n" +
        m.replaceAll("(?m)^(>*From )", ">$1") + "\n"
    }.mkString
    java.nio.file.Files.write(path, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

package graft.engine

/**
 * Subtitle/transcript sources: SubRip `.srt` and WebVTT `.vtt` — the
 * transcript side of a speech/video training corpus (cue-level rows
 * align with the audio/video tiers' timestamp-keyed features; the
 * integer millisecond bounds make budget/windowing ops exact).
 *
 * One row per cue: (file, cue, start_ms, end_ms, text), cue 1-based in
 * file order, multi-line cue text newline-joined. SRT cue indices in
 * the file are IGNORED (real-world files renumber arbitrarily); VTT
 * NOTE/STYLE/REGION blocks and cue settings after the timestamp are
 * dropped, and inline voice/class tags (`<v Name>`, `<i>`, ...) are
 * stripped.
 *
 * Formats are public (SubRip convention; WebVTT is a W3C spec).
 * Reference semantics: earthmover has no subtitle source
 * (beyond-reference tier).
 */
object Subtitles {

  // Hours are optional: WebVTT permits mm:ss.ttt (W3C §6.2) and such
  // cues are common in real files; SRT always carries hours but accepts
  // the same shape harmlessly.
  private val SrtTime = """(?:(\d+):)?(\d{1,2}):(\d{1,2})[,.](\d{1,3})""".r

  private def ms(m: scala.util.matching.Regex.Match): Long = {
    val h = Option(m.group(1)).fold(0L)(_.toLong)
    h * 3600000L + m.group(2).toLong * 60000L +
      m.group(3).toLong * 1000L + m.group(4).padTo(3, '0').toLong
  }

  /** Shared cue parse: blocks separated by blank lines; a block yields a
    * cue when some line is `start --> end`. Lines before it that are a
    * bare integer (SRT index) or a VTT cue id are dropped; lines after
    * are the text. */
  private def parse(content: String, vtt: Boolean): Vector[(Long, Long, String)] = {
    val blocks = content.replace("\r\n", "\n").replace('\r', '\n')
      .split("\n{2,}").toVector
    blocks.flatMap { block =>
      val lines = block.split("\n").toVector.dropWhile(_.trim.isEmpty)
      if (lines.isEmpty) None
      else if (vtt && (lines.head.startsWith("WEBVTT") || lines.head.startsWith("NOTE") ||
        lines.head.startsWith("STYLE") || lines.head.startsWith("REGION"))) None
      else {
        val ti = lines.indexWhere(_.contains("-->"))
        if (ti < 0) None
        else {
          val times = SrtTime.findAllMatchIn(lines(ti)).toSeq
          if (times.size < 2) None
          else {
            val text = lines.drop(ti + 1)
              .map(l => if (vtt) stripTags(l) else l)
              .mkString("\n").trim
            if (text.isEmpty) None
            else Some((ms(times.head), ms(times(1)), text))
          }
        }
      }
    }
  }

  private def stripTags(s: String): String =
    s.replaceAll("<[^>]*>", "")

  def parseSrt(bytes: Array[Byte]): Vector[(Long, Long, String)] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val cues = parse(s, vtt = false)
    if (cues.isEmpty) throw new IllegalArgumentException("srt: no parseable cues")
    cues
  }

  def parseVtt(bytes: Array[Byte]): Vector[(Long, Long, String)] = {
    val s0 = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val s = if (s0.nonEmpty && s0.charAt(0) == '\uFEFF') s0.substring(1) else s0
    if (!s.startsWith("WEBVTT"))
      throw new IllegalArgumentException("vtt: missing WEBVTT header")
    val cues = parse(s, vtt = true)
    if (cues.isEmpty) throw new IllegalArgumentException("vtt: no parseable cues")
    cues
  }

  // ----------------------------------------------------------- writers

  private def stamp(t: Long, srt: Boolean): String = {
    val sep = if (srt) "," else "."
    f"${t / 3600000}%02d:${t / 60000 % 60}%02d:${t / 1000 % 60}%02d$sep${t % 1000}%03d"
  }

  def writeSrt(path: java.nio.file.Path, cues: Seq[(Long, Long, String)]): Unit = {
    val body = cues.zipWithIndex.map { case ((s, e, text), i) =>
      s"${i + 1}\n${stamp(s, srt = true)} --> ${stamp(e, srt = true)}\n$text\n"
    }.mkString("\n")
    java.nio.file.Files.write(path, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def writeVtt(path: java.nio.file.Path, cues: Seq[(Long, Long, String)]): Unit = {
    val body = "WEBVTT\n\n" + cues.map { case (s, e, text) =>
      s"${stamp(s, srt = false)} --> ${stamp(e, srt = false)}\n$text\n"
    }.mkString("\n")
    java.nio.file.Files.write(path, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

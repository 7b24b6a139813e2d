package graft.translate

/**
 * Translates Python strftime/strptime patterns (the dialect used by the
 * reference's `date_format` operation, reference operations/column.py:411-414)
 * into Java `DateTimeFormatter` patterns usable by Spark's
 * `to_timestamp`/`date_format` functions.
 *
 * Only directives that appear in public strftime docs are mapped; unknown
 * directives raise so config errors surface at compile time rather than as
 * silently-wrong data.
 */
object Strftime {

  private val mapping: Map[Char, String] = Map(
    'Y' -> "yyyy", // 4-digit year
    'y' -> "yy",   // 2-digit year
    'm' -> "MM",   // zero-padded month
    'd' -> "dd",   // zero-padded day
    'H' -> "HH",   // 24h hour
    'I' -> "hh",   // 12h hour
    'M' -> "mm",   // minute
    'S' -> "ss",   // second
    'f' -> "SSSSSS", // microsecond
    'j' -> "DDD",  // day of year
    'a' -> "EEE",  // abbreviated weekday
    'A' -> "EEEE", // full weekday
    'b' -> "MMM",  // abbreviated month name
    'B' -> "MMMM", // full month name
    'p' -> "a",    // AM/PM
    'z' -> "xx",   // UTC offset
    'Z' -> "zz",   // timezone name
    // %G/%u/%V (ISO week-date fields) intentionally unmapped: Spark 3.0+
    // rejects week-based pattern letters at runtime, and the locale-week
    // Java letters are semantically wrong anyway. They fall through to the
    // unsupported-directive error below.
    '%' -> "%"     // literal percent
  )

  /** Parse-side directive overrides: Python strptime accepts unpadded
    * numeric fields ("Jan 1 1875" parses under %d), so the parse pattern
    * uses single-letter numeric fields, which java.time parses at 1-2
    * digits (padded or not). Output formatting keeps the zero-padded forms. */
  private val parseOverrides: Map[Char, String] = Map(
    'm' -> "M", 'd' -> "d", 'H' -> "H", 'I' -> "h", 'M' -> "m",
    'S' -> "s", 'j' -> "D")

  /** Convert a strftime pattern to a java.time pattern for PARSING:
    * numeric fields lenient about zero-padding, strptime-style. */
  def toJavaParsePattern(fmt: String): String =
    translate(fmt, mapping ++ parseOverrides)

  /** Convert a strftime pattern like "%b %d %Y" to "MMM dd yyyy". */
  def toJavaPattern(fmt: String): String = translate(fmt, mapping)

  private def translate(fmt: String, mapping: Map[Char, String]): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = {
      if (lit.nonEmpty) {
        val s = lit.toString
        // Quote literal runs containing letters OR apostrophes so
        // DateTimeFormatter neither interprets letters as pattern chars nor
        // sees a bare ' as the start of an unterminated quoted section.
        if (s.exists(c => c.isLetter || c == '\''))
          out.append('\'').append(s.replace("'", "''")).append('\'')
        else out.append(s)
        lit.clear()
      }
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 >= fmt.length)
        throw new IllegalArgumentException(
          s"dangling % at end of strftime pattern '$fmt'")
      if (c == '%' && i + 1 < fmt.length) {
        val d = fmt.charAt(i + 1)
        mapping.get(d) match {
          case Some(j) => flushLit(); out.append(j)
          case None =>
            throw new IllegalArgumentException(
              s"unsupported strftime directive %$d in pattern '$fmt'")
        }
        i += 2
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    out.toString
  }
}

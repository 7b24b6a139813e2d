package graft.engine

/**
 * Helpers shared by the BIFF-family spreadsheet readers (Xls.scala BIFF8,
 * Xlsb.scala BIFF12): the RK packed-number decode, Excel error-code text,
 * and the all-string engine's canonical number rendering.
 */
object Biff {

  /** RK number ([MS-XLS] 2.5.217 / [MS-XLSB] 2.5.122): 30-bit payload plus
    * two low flag bits — bit0 fX100 (value is 100× the stored one), bit1
    * fInt (payload is a signed int, else the high 30 bits of a double). */
  def rkToDouble(rk: Int): Double = {
    val x100 = (rk & 0x1) != 0
    val isInt = (rk & 0x2) != 0
    val v =
      if (isInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if (x100) v / 100.0 else v
  }

  /** Number → string under the all-string contract: integral doubles render
    * without ".0" (pandas-str parity for int-valued cells), everything else
    * as the shortest round-trip decimal Java produces. */
  def numToString(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
    else {
      val s = d.toString
      // Java flips to scientific notation at 1e7; re-expand to the plain
      // decimal form of the same shortest-round-trip digits
      if (s.indexOf('E') >= 0) new java.math.BigDecimal(s).toPlainString else s
    }

  /** BErr error codes ([MS-XLS] 2.5.97.2). */
  def errorText(code: Int): String = code match {
    case 0x00 => "#NULL!"
    case 0x07 => "#DIV/0!"
    case 0x0F => "#VALUE!"
    case 0x17 => "#REF!"
    case 0x1D => "#NAME?"
    case 0x24 => "#NUM!"
    case 0x2A => "#N/A"
    case _ => s"#ERR$code"
  }
}

package graft.engine

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/**
 * Property laws for the spreadsheet codec family: any small all-string
 * table drawn from a representative alphabet (specials, unicode, canonical
 * numbers, booleans, empties) must round-trip bit-exactly through each
 * writer/reader pair — xlsx (ZIP+XML), ods (ODF content.xml), xlsb
 * (BIFF12), xls (BIFF8-in-CFB, via tools/GenXls). One generator, four
 * codecs: a divergence in any one parser shows up as a cross-format
 * inconsistency even when both sides of a single pair share a bug-shaped
 * assumption.
 *
 * Alphabet constraints mirror the formats' value models, not parser
 * weaknesses: numeric-looking strings must be canonical (no leading
 * zeros — binary formats store them as numbers and re-render), and each
 * row keeps a non-empty first cell (a fully-empty trailing row is
 * legitimately trimmed by the ODS repeat model and has no cell records at
 * all in the BIFF formats).
 */
class SpreadsheetPropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(12)
  private def check(prop: Prop, name: String): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val cell: Gen[String] = Gen.oneOf(
    "x", "hello world", "<&>\"quoted'", "é☃末尾", "42", "-7", "0", "3.5",
    "-0.25", "True", "False", "a,b\tc", "", "trailing space ", " leading")
  private val nonEmptyCell: Gen[String] = cell.suchThat(_.nonEmpty)

  private val table: Gen[Vector[Vector[String]]] = for {
    width <- Gen.chooseNum(1, 4)
    nRows <- Gen.chooseNum(1, 5)
    header = Vector.tabulate(width)(i => s"hdr$i")
    rows <- Gen.listOfN(nRows, for {
      first <- nonEmptyCell
      rest <- Gen.listOfN(width - 1, cell)
    } yield first +: rest.toVector)
  } yield header +: rows.toVector

  test("every spreadsheet codec round-trips arbitrary small tables bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prop")
    var n = 0
    check(Prop.forAll(table) { rows =>
      n += 1
      val xlsx = dir.resolve(s"t$n.xlsx"); Xlsx.write(xlsx, rows)
      val ods = dir.resolve(s"t$n.ods"); Ods.write(ods, rows)
      val xlsb = dir.resolve(s"t$n.xlsb"); Xlsb.write(xlsb, rows)
      val xls = dir.resolve(s"t$n.xls"); graft.tools.GenXls.write(xls.toString, rows)
      val got = Map(
        "xlsx" -> Xlsx.readRows(xlsx.toString, None),
        "ods" -> Ods.readRows(ods.toString, None),
        "xlsb" -> Xlsb.readRows(xlsb.toString, None),
        "xls" -> Xls.readRows(xls.toString, None))
      got.forall { case (fmt, back) =>
        val ok = back == rows
        if (!ok) System.err.println(s"[prop] $fmt mismatch: wrote=$rows read=$back")
        ok
      }
    }, "spreadsheet_roundtrip")
  }

  test("truncated binary spreadsheets fail diagnosably at every cut point, never hang") {
    val dir = java.nio.file.Files.createTempDirectory("graft-trunc")
    val rows = Vector(Vector("id", "name"), Vector("1", "ann"), Vector("2", "bob"))
    val xls = dir.resolve("t.xls"); graft.tools.GenXls.write(xls.toString, rows)
    val xlsb = dir.resolve("t.xlsb"); Xlsb.write(xlsb, rows)
    for (p <- Seq(xls, xlsb)) {
      val full = java.nio.file.Files.readAllBytes(p)
      // cut at a spread of interior offsets; each must throw a diagnosable
      // exception (or, for generous cuts, still parse) within bounded time
      for (cut <- Seq(4, 64, 200, full.length / 2, full.length - 3)) {
        val t = dir.resolve(s"cut$cut-${p.getFileName}")
        java.nio.file.Files.write(t, java.util.Arrays.copyOf(full, cut))
        try {
          val r =
            if (t.toString.endsWith("xls")) Xls.readRows(t.toString, None)
            else Xlsb.readRows(t.toString, None)
          assert(r.size <= rows.size) // parsed a prefix — acceptable
        } catch {
          case e: IllegalArgumentException => assert(e.getMessage.contains(t.toString) ||
            e.getMessage.nonEmpty)
        }
      }
    }
  }

  test("xlsb resolves worksheet parts through workbook rels, not part naming") {
    // Excel workbooks whose part names don't track bundle order (sheet
    // deletion / reorder) must still read the right sheet: rename the part
    // to a non-convention name and point the rels target at it.
    val dir = java.nio.file.Files.createTempDirectory("graft-rels")
    val rows = Vector(Vector("id", "name"), Vector("1", "ann"), Vector("2", "bob"))
    val orig = dir.resolve("orig.xlsb"); Xlsb.write(orig, rows)
    val moved = dir.resolve("moved.xlsb")
    val zin = new java.util.zip.ZipFile(orig.toFile)
    val zos = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(moved))
    try {
      val en = zin.entries()
      while (en.hasMoreElements) {
        val e = en.nextElement()
        val bytes = {
          val in = zin.getInputStream(e)
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          out.toByteArray
        }
        val (name, content) = e.getName match {
          case "xl/worksheets/sheet1.bin" => ("xl/worksheets/sheet7.bin", bytes)
          case "xl/_rels/workbook.bin.rels" =>
            (e.getName, new String(bytes, "UTF-8")
              .replace("worksheets/sheet1.bin", "worksheets/sheet7.bin").getBytes("UTF-8"))
          case other => (other, bytes)
        }
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(content)
        zos.closeEntry()
      }
    } finally { zos.close(); zin.close() }
    assert(Xlsb.readRows(moved.toString, None) == rows)
  }

  test("normalizeUrl anchors tracking params to their separator") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val cases = Seq(
      // unrelated param merely ENDING in a tracked name must survive
      "http://a.com/p?xgclid=2" -> "http://a.com/p?xgclid=2",
      // tracked-name text inside a path segment must survive
      "http://a.com/utm_source=feed/x" -> "http://a.com/utm_source=feed/x",
      // genuine tracking params still stripped, separators repaired
      "http://a.com/p?utm_source=f&x=1&gclid=g" -> "http://a.com/p?x=1",
      "http://a.com/p?gclid=g" -> "http://a.com/p")
    val got = cases.map(_._1).toDF("u")
      .select(graft.functions.Corpus.normalizeUrl(col("u")).as("n"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("normalizeUrl is idempotent over messy URLs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val messy: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
      host <- Gen.oneOf("WWW.Example.COM", "sub.Site.org", "plain.net")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/A/b/")
      query <- Gen.oneOf("", "?a=1", "?utm_source=x", "?utm_source=x&a=1",
        "?a=1&gclid=g&b=2", "?fbclid=f")
      frag <- Gen.oneOf("", "#sec", "#a#b")
    } yield s"$scheme://$host$port$path$query$frag"
    check(Prop.forAll(Gen.listOfN(8, messy)) { urls =>
      val once = urls.toDF("u")
        .select(graft.functions.Corpus.normalizeUrl(col("u")).as("n"))
        .as[String].collect().toSeq
      val twice = once.toDF("u")
        .select(graft.functions.Corpus.normalizeUrl(col("u")).as("n"))
        .as[String].collect().toSeq
      val ok = once == twice
      if (!ok) System.err.println(s"[prop] not idempotent: $urls -> $once -> $twice")
      ok
    }, "url_normalize_idempotent")
  }
}

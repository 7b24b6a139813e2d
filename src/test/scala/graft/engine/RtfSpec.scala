package graft.engine

class RtfSpec extends graft.SparkSpec {

  private def parse(s: String): Vector[String] =
    Rtf.extractParagraphs(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  test("writer round-trips paragraphs incl. tabs, line breaks, braces, and unicode") {
    val paras = Seq(
      "plain text paragraph",
      "tab\there and {braces} and back\\slash",
      "line one\nline two",
      "café résumé 中文",
      "quote ' double \" dash -")
    val f = java.nio.file.Files.createTempFile("graft-rtf", ".rtf")
    Rtf.write(f, paras)
    assert(Rtf.extractParagraphs(java.nio.file.Files.readAllBytes(f)) == paras.toVector)
  }

  test("hand-written RTF: destinations skipped, fldrslt shown, hex and uc handled") {
    val doc = """{\rtf1\ansi\deff0
      |{\fonttbl{\f0\froman Times New Roman;}}
      |{\colortbl;\red255\green0\blue0;}
      |{\info{\title secret title}{\author nobody}}
      |{\stylesheet{\s0 Normal;}}
      |First \b bold\b0  paragraph.\par
      |Caf\'e9 costs \'a35.\par
      |{\field{\*\fldinst PAGE}{\fldrslt 42}} pages.\par
      |{\*\mysterydest hidden stuff}Shown after.\par
      |#Uc1#U20013?#U25991?ok\par
      |}""".stripMargin.replace("#U", "\\u")
    val got = parse(doc)
    assert(got == Vector(
      "First bold paragraph.",
      "Café costs £5.",
      "42 pages.",
      "Shown after.",
      "中文ok"), got.toString)
  }

  test("pict/bin payloads and headers never leak into text; garbage rejects") {
    val doc = """{\rtf1\ansi{\pict\wmetafile8 0102030405}visible\par}"""
    assert(parse(doc) == Vector("visible"))
    intercept[IllegalArgumentException](Rtf.extractParagraphs("plain text".getBytes))
    intercept[IllegalArgumentException](Rtf.extractParagraphs(Array.empty[Byte]))
    // truncations never throw anything but the diagnosable reject or
    // return partial text — no hangs, no unbounded allocation
    val f = java.nio.file.Files.createTempFile("graft-rtf", ".rtf")
    Rtf.write(f, Seq("some body text that will be truncated"))
    val full = java.nio.file.Files.readAllBytes(f)
    for (cut <- 5 until full.length by 7)
      try Rtf.extractParagraphs(java.util.Arrays.copyOf(full, cut))
      catch { case _: IllegalArgumentException => () }
  }

  test("sources dispatch: rtf reads with (file, paragraph, text) schema") {
    val f = java.nio.file.Files.createTempFile("graft-rtf", ".rtf")
    Rtf.write(f, Seq("alpha", "beta", "gamma"))
    val df = Sources.read(spark, "spec_rtf", Map("file" -> f.toString), f.getParent)
    assert(df.columns.toSeq == Seq("file", "paragraph", "text"))
    assert(df.orderBy("paragraph").collect().map(_.getString(2)).toSeq ==
      Seq("alpha", "beta", "gamma"))
  }
}

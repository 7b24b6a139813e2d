package graft.engine

class DocSpec extends graft.SparkSpec {

  private def tmp() = java.nio.file.Files.createTempFile("graft-doc-spec", ".doc")

  test("round-trips unicode paragraphs through the piece table") {
    val paras = Seq(
      "plain paragraph",
      "tabbed\tcolumns here",
      "café résumé 中文 text",
      "final one")
    val f = tmp()
    Doc.write(f, paras)
    val got = Doc.extractParagraphs(java.nio.file.Files.readAllBytes(f))
    assert(got == paras.toVector)
  }

  test("mixed compressed (cp1252) + unicode pieces concatenate in CP order") {
    val f = tmp()
    Doc.write(f, Seq("unicode tail 中文"), asciiPiece = Some("ascii head\r"))
    val got = Doc.extractParagraphs(java.nio.file.Files.readAllBytes(f))
    assert(got == Vector("ascii head", "unicode tail 中文"), got.toString)
  }

  test("field instructions dropped, results kept; cell marks split rows") {
    // text with Word control characters straight in the piece: a field
    // { instr PAGE | result 42 } and a table row "a<cell>b<cell><row>"
    val text = "before \u0013PAGEREF x\u001442\u0015 after"
    val cells = "a\u0007b\u0007\u0007"
    val f = tmp()
    Doc.write(f, Seq(text, cells))
    val got = Doc.extractParagraphs(java.nio.file.Files.readAllBytes(f))
    assert(got == Vector("before 42 after", "a", "b"), got.toString)
  }

  test("sources dispatch: doc reads with (file, paragraph, text) schema") {
    val f = tmp()
    Doc.write(f, Seq("alpha", "beta"))
    val df = Sources.read(spark, "spec_doc", Map("file" -> f.toString), f.getParent)
    assert(df.columns.toSeq == Seq("file", "paragraph", "text"))
    assert(df.orderBy("paragraph").collect().map(_.getString(2)).toSeq == Seq("alpha", "beta"))
  }

  test("hostile payloads reject diagnosably: garbage, wrong streams, truncations, encrypted flag") {
    intercept[Exception](Doc.extractParagraphs("not ole2 at all".getBytes))
    val f = tmp()
    Doc.write(f, Seq("victim text"))
    val full = java.nio.file.Files.readAllBytes(f)
    for (cut <- 8 until full.length by 97)
      try Doc.extractParagraphs(java.util.Arrays.copyOf(full, cut))
      catch { case _: Exception => () } // reject, never hang or over-allocate
    // flip the fEncrypted bit: must refuse, not emit ciphertext
    val enc = full.clone()
    // WordDocument stream starts at some sector; find the FIB by wIdent
    var fib = -1
    var i = 512
    while (fib < 0 && i + 1 < enc.length) {
      if ((enc(i) & 0xFF) == 0xEC && (enc(i + 1) & 0xFF) == 0xA5) fib = i
      i += 512
    }
    assert(fib >= 0, "fixture FIB not found")
    enc(fib + 0x0B) = (enc(fib + 0x0B) | 0x01).toByte // fEncrypted (bit 8 of the flags word)
    val e = intercept[IllegalArgumentException](Doc.extractParagraphs(enc))
    assert(e.getMessage.contains("encrypted"))
  }
}

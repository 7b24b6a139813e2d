package graft.engine

class EmlSpec extends graft.SparkSpec {

  test("single-part 7bit/qp/base64 bodies round-trip; multipart picks the text/plain leaf") {
    for (enc <- Seq("7bit", "quoted-printable", "base64"); mp <- Seq(false, true)) {
      val text = "Hello mailing list,\nthis is café UTF-8 text = with equals.\nBye"
      val raw = Eml.writeEml("A subject", "alice@example.com",
        "Thu, 1 Jan 1970 00:00:00 +0000", text, enc, multipart = mp)
      val m = Eml.parseEml(raw.getBytes("UTF-8"))
      assert(m.subject == "A subject" && m.from == "alice@example.com")
      assert(m.text == text, s"enc=$enc mp=$mp: ${m.text}")
    }
  }

  test("RFC 2047 encoded-word subjects decode (B and Q forms, folded headers)") {
    val raw = "From: bob@example.com\n" +
      "Subject: =?UTF-8?B?Y2Fmw6k=?=\n =?ISO-8859-1?Q?r=E9sum=E9_time?=\n" +
      "Date: x\n\nbody\n"
    val m = Eml.parseEml(raw.getBytes("UTF-8"))
    // folded continuation unfolds with a space; Q '_' is a space
    assert(m.subject == "café résumé time", m.subject)
    assert(m.text == "body")
  }

  test("mbox splits on From separators and unquotes >From lines") {
    val f = java.nio.file.Files.createTempFile("graft-mbox", ".mbox")
    val m1 = Eml.writeEml("first", "a@x", "d1", "body one\nFrom the start it was good")
    val m2 = Eml.writeEml("second", "b@y", "d2", "body two", "base64")
    Eml.writeMbox(f, Seq(m1, m2))
    val got = Eml.parseMbox(java.nio.file.Files.readAllBytes(f))
    assert(got.size == 2)
    assert(got(0).subject == "first" &&
      got(0).text == "body one\nFrom the start it was good", got(0).text)
    assert(got(1).subject == "second" && got(1).text == "body two")
  }

  test("sources dispatch: mbox reads one row per message with decoded columns") {
    val f = java.nio.file.Files.createTempFile("graft-mbox", ".mbox")
    Eml.writeMbox(f, Seq(
      Eml.writeEml("s1", "a@x", "d", "alpha"),
      Eml.writeEml("s2", "b@y", "d", "beta", "quoted-printable", multipart = true)))
    val df = Sources.read(spark, "spec_mbox", Map("file" -> f.toString), f.getParent)
    assert(df.columns.toSeq ==
      Seq("file", "message", "subject", "mail_from", "date", "text"))
    val rows = df.orderBy("message").collect()
    assert(rows.map(_.getString(5)).toSeq == Seq("alpha", "beta"))
  }

  test("garbage rejects diagnosably") {
    intercept[IllegalArgumentException](Eml.parseMbox("no separator".getBytes))
    intercept[IllegalArgumentException](Eml.parseEml("just some text with no headers".getBytes))
  }
}

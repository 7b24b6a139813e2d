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
    // §6.2: whitespace BETWEEN adjacent encoded-words is ignored (folding
    // splits one logical word across lines), so the words concatenate
    // seamlessly; Q '_' is a space. Python email agrees: 'caférésumé time'.
    assert(m.subject == "caférésumé time", m.subject)
    assert(m.text == "body")
  }

  test("RFC 2047: space between an encoded-word and PLAIN text is kept") {
    val raw = "From: b@x\nSubject: =?UTF-8?B?Y2Fmw6k=?= plain tail\nDate: x\n\nb\n"
    assert(Eml.parseEml(raw.getBytes("UTF-8")).subject == "café plain tail")
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

  test("HTML-only messages fall back to the stripped text/html leaf") {
    val raw = "From: h@x\nSubject: html only\nDate: d\n" +
      "Content-Type: text/html; charset=UTF-8\n\n" +
      "<html><head><style>p{}</style></head><body>" +
      "<p>First para</p><p>Second &amp; last</p></body></html>\n"
    val m = Eml.parseEml(raw.getBytes("UTF-8"))
    assert(m.text == "First para\nSecond & last", m.text)
    // multipart/alternative with BOTH: text/plain still wins
    val alt = "From: a@x\nSubject: s\nDate: d\nMIME-Version: 1.0\n" +
      "Content-Type: multipart/alternative; boundary=bb\n\n" +
      "--bb\nContent-Type: text/html\n\n<p>html version</p>\n" +
      "--bb\nContent-Type: text/plain\n\nplain version\n--bb--\n"
    assert(Eml.parseEml(alt.getBytes("UTF-8")).text == "plain version")
  }

  test("garbage rejects diagnosably") {
    intercept[IllegalArgumentException](Eml.parseMbox("no separator".getBytes))
    intercept[IllegalArgumentException](Eml.parseEml("just some text with no headers".getBytes))
  }

  test("splittable mbox: one archive over many input splits keeps dense file-order numbering") {
    val f = java.nio.file.Files.createTempFile("graft-mbox-split", ".mbox")
    val n = 60
    Eml.writeMbox(f, (1 to n).map(i =>
      Eml.writeEml(s"s$i", s"u$i@x", "d", s"msg $i body with some padding to grow the file " + ("x" * 50))))
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setLong("mapreduce.input.fileinputformat.split.maxsize", 2048)
    try {
      val df = Sources.read(spark, "spec_mbox_split", Map("file" -> f.toString), f.getParent)
      assert(df.rdd.getNumPartitions > 1, s"expected multiple splits, got ${df.rdd.getNumPartitions}")
      val rows = df.orderBy("message").collect()
      assert(rows.length == n)
      // the two-phase prefix sums must reproduce exact file order: message
      // k is the k-th message written, with no gaps or duplicates
      assert(rows.map(_.getLong(1)).toSeq == (1L to n.toLong),
        rows.map(_.getLong(1)).mkString(","))
      assert(rows.map(_.getString(2)).toSeq == (1 to n).map(i => s"s$i"),
        rows.take(5).map(_.getString(2)).mkString(","))
    } finally hc.unset("mapreduce.input.fileinputformat.split.maxsize")
  }

  test("mboxo: unquoted `From ` body lines merge back instead of false-splitting") {
    // hand-written mboxo: the body line `From the depths...` is NOT quoted
    val raw =
      "From a@x Thu Jan  1 00:00:00 1970\n" +
        "From: a@x\nSubject: s1\nDate: d\n\n" +
        "line one\nFrom the depths of the sea\nmore after\n\n" +
        "From b@y Thu Jan  1 00:00:00 1970\n" +
        "From: b@y\nSubject: s2\nDate: d\n\n" +
        "beta body\n"
    // whole-file parse path
    val got = Eml.parseMbox(raw.getBytes("ISO-8859-1"))
    assert(got.size == 2, s"mboxo false split: got ${got.size} messages")
    assert(got(0).text == "line one\nFrom the depths of the sea\nmore after",
      got(0).text)
    assert(got(1).text == "beta body")
    // splittable reader path (single split)
    val f = java.nio.file.Files.createTempFile("graft-mboxo", ".mbox")
    java.nio.file.Files.write(f, raw.getBytes("ISO-8859-1"))
    val rows = Sources.read(spark, "spec_mboxo", Map("file" -> f.toString), f.getParent)
      .orderBy("message").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(5) == "line one\nFrom the depths of the sea\nmore after",
      rows(0).getString(5))
    assert(rows(1).getString(5) == "beta body")
  }

  test("mbox: CRLF line endings still split at genuine `From ` separators") {
    // every header line ends \r\n — looksLikeMessage must tolerate the \r
    // (an earlier regression collapsed CRLF archives into one message)
    val raw =
      "From a@x Thu Jan  1 00:00:00 1970\r\n" +
        "From: a@x\r\nSubject: c1\r\nDate: d\r\n\r\n" +
        "alpha body\r\nFrom the unquoted depths\r\n\r\n" +
        "From b@y Thu Jan  1 00:00:00 1970\r\n" +
        "From: b@y\r\nSubject: c2\r\nDate: d\r\n\r\n" +
        "beta body\r\n"
    val got = Eml.parseMbox(raw.getBytes("ISO-8859-1"))
    assert(got.size == 2, s"CRLF mbox: got ${got.size} messages")
    assert(got(0).subject == "c1" && got(1).subject == "c2")
    // the unquoted body `From ` line still merges back (mboxo tolerance)
    assert(got(0).text.contains("From the unquoted depths"), got(0).text)
    // splittable reader path agrees
    val f = java.nio.file.Files.createTempFile("graft-mbox-crlf", ".mbox")
    java.nio.file.Files.write(f, raw.getBytes("ISO-8859-1"))
    val rows = Sources.read(spark, "spec_mbox_crlf", Map("file" -> f.toString), f.getParent)
      .orderBy("message").collect()
    assert(rows.length == 2, s"CRLF splittable path: got ${rows.length}")
  }

  test("mboxo: a continuation that crosses an input-split boundary rejoins its owner") {
    // message 1's body is long enough that the unquoted `From ` line near
    // its end lands in a LATER input split (maxsize 2048): the split's
    // leading continuation blob must chain back to message 1
    val pad = (1 to 60).map(i => s"padding line $i " + ("y" * 30)).mkString("\n")
    val raw = new StringBuilder
    raw.append("From a@x Thu Jan  1 00:00:00 1970\n")
      .append("From: a@x\nSubject: big\nDate: d\n\n")
      .append(pad).append("\nFrom deep inside the padding comes a line\ntail line\n\n")
    for (i <- 2 to 8)
      raw.append(s"From u$i@x Thu Jan  1 00:00:00 1970\n")
        .append(s"From: u$i@x\nSubject: s$i\nDate: d\n\nbody $i\n\n")
    val f = java.nio.file.Files.createTempFile("graft-mboxo-split", ".mbox")
    java.nio.file.Files.write(f, raw.toString.getBytes("ISO-8859-1"))
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setLong("mapreduce.input.fileinputformat.split.maxsize", 2048)
    try {
      val df = Sources.read(spark, "spec_mboxo_x", Map("file" -> f.toString), f.getParent)
      assert(df.rdd.getNumPartitions > 1)
      val rows = df.orderBy("message").collect()
      assert(rows.length == 8, s"got ${rows.length} messages")
      assert(rows.map(_.getLong(1)).toSeq == (1L to 8L))
      val big = rows(0).getString(5)
      assert(big.contains("From deep inside the padding comes a line") &&
        big.endsWith("tail line"), big.takeRight(120))
      assert(rows(1).getString(2) == "s2")
    } finally hc.unset("mapreduce.input.fileinputformat.split.maxsize")
  }

  test("mboxo: many pure-continuation splits hit the total driver cap diagnosably") {
    // one owner message whose body is a long run of unquoted `From ` lines
    // with fat bodies: at maxsize 2048 most splits are PURE continuation,
    // so their leading blobs all ship to the driver — a tiny total cap
    // must reject with the re-quote guidance, and the default cap parses
    val raw = new StringBuilder
    raw.append("From a@x Thu Jan  1 00:00:00 1970\n")
      .append("From: a@x\nSubject: flood\nDate: d\n\n")
    for (i <- 1 to 40)
      raw.append(s"From the flood, wave $i\n").append("z" * 400).append("\n")
    raw.append("\n")
    val f = java.nio.file.Files.createTempFile("graft-mboxo-flood", ".mbox")
    java.nio.file.Files.write(f, raw.toString.getBytes("ISO-8859-1"))
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setLong("mapreduce.input.fileinputformat.split.maxsize", 2048)
    spark.conf.set("spark.graft.mbox.maxLeadBytes", "64")
    try {
      val e = intercept[IllegalArgumentException] {
        Sources.read(spark, "spec_mbox_cap", Map("file" -> f.toString), f.getParent).collect()
      }
      assert(e.getMessage.contains("driver bound") && e.getMessage.contains("mboxrd"),
        e.getMessage.take(300))
      // with the default cap the same archive parses back to one message
      spark.conf.unset("spark.graft.mbox.maxLeadBytes")
      val rows = Sources.read(spark, "spec_mbox_cap2",
        Map("file" -> f.toString), f.getParent).collect()
      assert(rows.length == 1 && rows(0).getString(5).contains("wave 40"),
        s"got ${rows.length}")
    } finally {
      hc.unset("mapreduce.input.fileinputformat.split.maxsize")
      spark.conf.unset("spark.graft.mbox.maxLeadBytes")
    }
  }

  test("splittable mbox: garbage archive rejects diagnosably through the split path") {
    val f = java.nio.file.Files.createTempFile("graft-mbox-bad", ".mbox")
    java.nio.file.Files.write(f, "this is not an mbox at all\n".getBytes)
    val e = intercept[org.apache.spark.SparkException] {
      Sources.read(spark, "spec_mbox_bad", Map("file" -> f.toString), f.getParent).collect()
    }
    assert(e.getMessage.contains("From") || (e.getCause != null &&
      e.getCause.getMessage.contains("From")), e.getMessage.take(300))
  }
}

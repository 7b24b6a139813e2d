package graft.expressions

class DocExpressionsSpec extends graft.SparkSpec {

  import org.apache.spark.sql.functions.col

  private def bytesOf(write: java.nio.file.Path => Unit, ext: String): Array[Byte] = {
    val f = java.nio.file.Files.createTempFile("graft-dx", ext)
    write(f)
    java.nio.file.Files.readAllBytes(f)
  }

  private def one(bin: Array[Byte], fmtArg: String = null): String = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Tuple1(bin)).toDF("content")
    val expr = if (fmtArg == null) "doc_text(content)" else s"doc_text(content, '$fmtArg')"
    df.selectExpr(s"$expr AS t").collect()(0).getString(0)
  }

  test("auto-sniff extracts rtf/doc/docx/pptx through the binary-column expression") {
    val text = "alpha paragraph\nbeta — tab\there"
    assert(one(bytesOf(graft.engine.Rtf.write(_, Seq(text)), ".rtf")) == text)
    assert(one(bytesOf(graft.engine.Doc.write(_, Seq(text)), ".doc")) == text)
    assert(one(bytesOf(graft.engine.Docx.writeDocx(_, Seq(text)), ".docx")) == text)
    assert(one(bytesOf(graft.engine.Docx.writePptx(_, Seq(text)), ".pptx")) == text)
  }

  test("pdf auto-sniffs: pages newline-joined through the native parser") {
    val f = java.nio.file.Files.createTempFile("graft-dx", ".pdf")
    graft.engine.Pdf.write(f, Seq("page one text", "page two text"), compress = true)
    assert(one(java.nio.file.Files.readAllBytes(f)) == "page one text\npage two text")
  }

  test("epub auto-sniffs to chapter markup (html_to_text is the compose step)") {
    val markup = one(bytesOf(graft.engine.Epub.write(_, Seq("chapter body")), ".epub"))
    assert(markup.contains("<") && markup.contains("chapter body"), markup)
  }

  test("explicit formats: srt/vtt cues and eml body need no magic") {
    val srt = bytesOf(graft.engine.Subtitles.writeSrt(_, Seq((0L, 900L, "a cue"), (1000L, 1900L, "b cue"))), ".srt")
    assert(one(srt, "srt") == "a cue\nb cue")
    val vtt = bytesOf(graft.engine.Subtitles.writeVtt(_, Seq((0L, 900L, "only"))), ".vtt")
    assert(one(vtt) == "only") // WEBVTT magic sniffs
    val eml = graft.engine.Eml.writeEml("s", "f@x", "d", "mail body", "base64").getBytes("UTF-8")
    assert(one(eml, "eml") == "mail body")
  }

  test("doc_units: per-unit array face (pages/slides/cues), explode-ready, NULL on garbage") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val f = java.nio.file.Files.createTempFile("graft-du", ".pdf")
    graft.engine.Pdf.write(f, Seq("page one", "page two", "page three"), compress = true)
    val pdf = java.nio.file.Files.readAllBytes(f)
    val srt = bytesOf(graft.engine.Subtitles.writeSrt(_, Seq((0L, 900L, "cue a"), (1000L, 1900L, "cue b"))), ".srt")
    val df = Seq((1L, pdf), (2L, "junk".getBytes)).toDF("id", "content")
    val rows = df.selectExpr("id", "doc_units(content) AS u").orderBy("id").collect()
    assert(rows(0).getSeq[String](1) == Seq("page one", "page two", "page three"))
    assert(rows(1).isNullAt(1))
    // explode composes: per-unit rows for a chunking pipeline
    val exploded = df.filter($"id" === 1L)
      .selectExpr("id", "posexplode(doc_units(content)) AS (page, text)").collect()
    assert(exploded.map(_.getString(2)).toSeq == Seq("page one", "page two", "page three"))
    val cues = Seq(Tuple1(srt)).toDF("content")
      .selectExpr("doc_units(content, 'srt') AS u").collect()(0).getSeq[String](0)
    assert(cues == Seq("cue a", "cue b"))
  }

  test("garbage, empty, and format-mismatched payloads yield NULL, not failure") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rtf = bytesOf(graft.engine.Rtf.write(_, Seq("x")), ".rtf")
    val rows = Seq(
      ("garbage", "pure garbage bytes".getBytes),
      ("empty", Array.empty[Byte]),
      ("mismatch", rtf)) // rtf bytes forced through the docx parser
      .toDF("k", "content")
    val got = rows.selectExpr("k",
      "doc_text(content, 'docx') AS t").orderBy("k").collect()
    assert(got.forall(_.isNullAt(1)), got.mkString(","))
    // null payload → null out
    val n = Seq(Tuple1(null: Array[Byte])).toDF("content")
      .selectExpr("doc_text(content) AS t").collect()(0)
    assert(n.isNullAt(0))
  }

  test("bad format literal fails at analysis, not per-row") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Tuple1("x".getBytes)).toDF("content")
    val e = intercept[Exception](df.selectExpr("doc_text(content, 'exe')").collect())
    assert(e.getMessage.contains("format must be one of"), e.getMessage)
  }

  test("doc_text YAML op appends the extracted column via the engine dispatch") {
    import spark.implicits._
    val docx = bytesOf(graft.engine.Docx.writeDocx(_, Seq("op text")), ".docx")
    val df = Seq((1L, docx)).toDF("id", "content")
    val out = new graft.engine.Engine(spark).applyOperation(df,
      Map("operation" -> "doc_text", "column" -> "content",
        "new_column" -> "body"), Map.empty, "spec")
    assert(out.columns.toSeq == Seq("id", "content", "body"))
    assert(out.select("body").collect()(0).getString(0) == "op text")
  }

  test("plan shape: doc_text is a narrow projection over the scan, no exchange, no UDF") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // through parquet: a LocalRelation would be PRE-EVALUATED by Catalyst
    // (ConvertToLocalRelation), making the assertions vacuous
    val dir = java.nio.file.Files.createTempDirectory("graft-dx-plan").toString
    Seq((1L, bytesOf(graft.engine.Rtf.write(_, Seq("x")), ".rtf")))
      .toDF("id", "content").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).selectExpr("id", "doc_text(content) AS t")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("doc_text"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"), plan)
    assert(df.collect()(0).getString(1) == "x")
  }
}

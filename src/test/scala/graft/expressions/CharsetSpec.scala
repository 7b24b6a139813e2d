package graft.expressions

import graft.functions.CharsetKernels

class CharsetSpec extends graft.SparkSpec {

  test("detection: BOMs, strict UTF-8, BOM-less UTF-16 parity, legacy default, binary") {
    val text = "Hello, crawl — café 你好\n"
    assert(CharsetKernels.detect(text.getBytes("UTF-8")) == "utf-8")
    assert(CharsetKernels.detect(
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ text.getBytes("UTF-8")) == "utf-8")
    assert(CharsetKernels.detect(
      Array[Byte](0xFF.toByte, 0xFE.toByte) ++ text.getBytes("UTF-16LE")) == "utf-16le")
    assert(CharsetKernels.detect(
      Array[Byte](0xFE.toByte, 0xFF.toByte) ++ text.getBytes("UTF-16BE")) == "utf-16be")
    // BOM-less UTF-16 of ASCII-heavy text: zero-parity heuristic
    assert(CharsetKernels.detect("plain ascii text body".getBytes("UTF-16LE")) == "utf-16le")
    assert(CharsetKernels.detect("plain ascii text body".getBytes("UTF-16BE")) == "utf-16be")
    // high-byte single-byte text that is NOT valid UTF-8 -> cp1252
    assert(CharsetKernels.detect("café résumé".getBytes("windows-1252")) == "windows-1252")
    // control-dense payload is binary, not text
    assert(CharsetKernels.detect(Array.tabulate[Byte](64)(i => (i % 8).toByte)) == "binary")
    assert(CharsetKernels.detect(Array.empty[Byte]) == "empty")
  }

  test("strict UTF-8 validation rejects overlongs, surrogates, out-of-range") {
    assert(CharsetKernels.isValidUtf8("héllo ✓ 𐍈".getBytes("UTF-8")))
    assert(!CharsetKernels.isValidUtf8(Array[Byte](0xC0.toByte, 0xAF.toByte))) // overlong '/'
    assert(!CharsetKernels.isValidUtf8(Array[Byte](0xED.toByte, 0xA0.toByte, 0x80.toByte))) // D800
    assert(!CharsetKernels.isValidUtf8(Array[Byte](0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte))) // >10FFFF
    assert(!CharsetKernels.isValidUtf8(Array[Byte](0x80.toByte))) // bare continuation
  }

  test("decode round-trips every arm and strips BOMs; binary decodes null") {
    val text = "mixed — ascii + café + 漢字"
    assert(CharsetKernels.decode(text.getBytes("UTF-8"), "auto") == text)
    assert(CharsetKernels.decode(
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ text.getBytes("UTF-8"), "auto") == text)
    assert(CharsetKernels.decode(
      Array[Byte](0xFF.toByte, 0xFE.toByte) ++ text.getBytes("UTF-16LE"), "auto") == text)
    assert(CharsetKernels.decode(
      Array[Byte](0xFE.toByte, 0xFF.toByte) ++ text.getBytes("UTF-16BE"), "auto") == text)
    assert(CharsetKernels.decode("café".getBytes("windows-1252"), "auto") == "café")
    assert(CharsetKernels.decode(Array.tabulate[Byte](64)(i => (i % 8).toByte), "auto") == null)
    // explicit charset overrides detection
    assert(CharsetKernels.decode("café".getBytes("ISO-8859-1"), "iso-8859-1") == "café")
    assert(CharsetKernels.decode("x".getBytes, "no-such-charset") == null)
  }

  test("expressions + YAML op: fused, no UDF, null for binary rows") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, "utf8 text".getBytes("UTF-8")),
      (2L, Array[Byte](0xFF.toByte, 0xFE.toByte) ++ "wide".getBytes("UTF-16LE")),
      (3L, Array.tabulate[Byte](64)(i => (i % 8).toByte)))
      .toDF("id", "content")
    val out = new graft.engine.Engine(spark).applyOperation(rows,
      Map("operation" -> "decode_text", "column" -> "content"), Map.empty, "spec")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("charset") == "utf-8" && out(0).getAs[String]("text") == "utf8 text")
    assert(out(1).getAs[String]("charset") == "utf-16le" && out(1).getAs[String]("text") == "wide")
    assert(out(2).getAs[String]("charset") == "binary" && out(2).isNullAt(out(2).fieldIndex("text")))
    // plan pin through parquet (LocalRelation would be pre-evaluated)
    val dir = java.nio.file.Files.createTempDirectory("graft-cs-plan").toString
    rows.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .selectExpr("decode_text(content) AS t", "detect_charset(content) AS c")
      .queryExecution.executedPlan.toString
    assert(plan.contains("decode_text") && plan.contains("detect_charset"), plan)
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }
}

package graft.engine

import graft.SparkSpec
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  private def tmpDir = Files.createTempDirectory("graft-src")

  test("csv: all-string schema, empty cells stay empty strings") {
    val dir = tmpDir
    val f = dir.resolve("d.csv")
    Files.writeString(f, "a,b\n1,\n,x\n")
    val df = Sources.read(spark, "d", Map("file" -> "d.csv"), dir)
    assert(df.schema.fields.forall(_.dataType == org.apache.spark.sql.types.StringType))
    val rows = df.orderBy("a").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("", "x"), ("1", "")))
  }

  test("headerless csv requires and applies `columns`") {
    val dir = tmpDir
    Files.writeString(dir.resolve("d.csv"), "1,x\n2,y\n")
    val df = Sources.read(spark, "d",
      Map("file" -> "d.csv", "header_rows" -> 0, "columns" -> List("id", "val")), dir)
    assert(df.columns.toSeq == Seq("id", "val"))
    assert(df.count() == 2)
    intercept[IllegalArgumentException](
      Sources.read(spark, "d", Map("file" -> "d.csv", "header_rows" -> 0), dir))
  }

  test("multi-line sparse headers flatten and body parses distributed") {
    val dir = tmpDir
    Files.writeString(dir.resolve("m.csv"),
      "Student,,School\nid,name,year\n1,ann,2024\n2,bob,2025\n")
    val df = Sources.read(spark, "m", Map("file" -> "m.csv", "header_rows" -> 2), dir)
    assert(df.columns.toSeq == Seq("Student__id", "Student__name", "School__year"))
    assert(df.count() == 2)
  }

  test("tsv via extension; columns rename positionally on headered files") {
    val dir = tmpDir
    Files.writeString(dir.resolve("d.tsv"), "x\ty\n1\t2\n")
    val df = Sources.read(spark, "d",
      Map("file" -> "d.tsv", "columns" -> List("a", "b")), dir)
    assert(df.columns.toSeq == Seq("a", "b"))
  }

  test("fixedwidth with widths + names") {
    val dir = tmpDir
    Files.writeString(dir.resolve("f.txt"), "ann  12\nbo   34\n")
    val df = Sources.read(spark, "f", Map(
      "file" -> "f.txt", "type" -> "fixedwidth",
      "widths" -> List(5, 2), "names" -> List("name", "num")), dir)
    val rows = df.orderBy("name").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("ann", "12"), ("bo", "34")))
  }

  test("optional missing file yields empty typed frame; optional_fields fill") {
    val dir = tmpDir
    val df = Sources.read(spark, "gone", Map(
      "file" -> "missing.csv", "optional" -> true,
      "columns" -> List("a", "b"), "optional_fields" -> List("c")), dir)
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 0)
    intercept[IllegalArgumentException](
      Sources.read(spark, "gone", Map("file" -> "missing.csv"), dir))
  }

  test("jsonl and parquet readers with column subset") {
    val dir = tmpDir
    Files.writeString(dir.resolve("d.jsonl"), """{"a": 1, "b": "x"}""" + "\n")
    val dj = Sources.read(spark, "d", Map("file" -> "d.jsonl", "columns" -> List("b")), dir)
    assert(dj.columns.toSeq == Seq("b"))
    spark.range(3).toDF("id").write.parquet(dir.resolve("p.parquet").toString)
    val dp = Sources.read(spark, "p", Map("file" -> "p.parquet"), dir)
    assert(dp.count() == 3)
  }

  test("remote connection source fetches via URL then reads (FtpSource shape)") {
    val dir = tmpDir
    val f = dir.resolve("remote.csv")
    Files.writeString(f, "a,b\n1,2\n")
    val df = Sources.read(spark, "r",
      Map("connection" -> f.toUri.toString), dir)
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.head.getString(1) == "2")
  }

  test("unsupported type errors clearly") {
    val dir = tmpDir
    Files.writeString(dir.resolve("d.xlsx"), "not really excel")
    val e = intercept[IllegalArgumentException](
      Sources.read(spark, "d", Map("file" -> "d.xlsx"), dir))
    assert(e.getMessage.contains("unsupported source file type"))
  }
}

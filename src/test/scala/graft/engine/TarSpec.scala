package graft.engine

import java.io.ByteArrayInputStream

class TarSpec extends graft.SparkSpec {

  private def roundTrip(entries: Seq[(String, Array[Byte])]): Seq[Tar.Entry] = {
    val out = new java.io.ByteArrayOutputStream()
    Tar.write(out, entries)
    Tar.tarEntries(new ByteArrayInputStream(out.toByteArray)).toSeq
  }

  test("tar round-trip: names, byte-exact payloads, order preserved") {
    val entries = Seq(
      "0001.txt" -> "hello café".getBytes("UTF-8"),
      "0001.json" -> """{"a":1}""".getBytes("UTF-8"),
      "sub/0002.bin" -> Array.tabulate(1000)(i => (i * 7).toByte),
      "empty.txt" -> Array.empty[Byte])
    val got = roundTrip(entries)
    assert(got.map(_.name) == entries.map(_._1))
    got.zip(entries).foreach { case (g, (_, b)) =>
      assert(java.util.Arrays.equals(g.bytes, b), g.name)
    }
  }

  test("GNU long names (>100 chars) survive via the L record") {
    val long = ("d" * 60) + "/" + ("n" * 60) + ".txt"
    val got = roundTrip(Seq(long -> "x".getBytes))
    assert(got.map(_.name) == Seq(long))
  }

  test("PAX extended headers override path and size") {
    // hand-build: x record with path override ahead of a plain member
    val out = new java.io.ByteArrayOutputStream()
    Tar.write(out, Seq("placeholder.txt" -> "abc".getBytes))
    val plain = out.toByteArray
    // craft a pax 'x' record: one `len path=...\n` record
    val paxBody = {
      val kv = "path=override/0009.txt\n"
      val len = kv.length + 3 // "NN " prefix; lengths <100 here
      s"$len $kv".getBytes("UTF-8")
    }
    val paxOut = new java.io.ByteArrayOutputStream()
    Tar.write(paxOut, Seq("ignored" -> paxBody))
    val paxRecord = paxOut.toByteArray.slice(0, 512 + 512) // header+payload block
    paxRecord(156) = 'x'.toByte
    // re-checksum after the typeflag edit
    java.util.Arrays.fill(paxRecord, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += (paxRecord(i) & 0xff))
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes("ISO-8859-1"), 0, paxRecord, 148, 6)
    paxRecord(154) = 0; paxRecord(155) = ' '.toByte
    val full = paxRecord ++ plain
    val got = Tar.tarEntries(new ByteArrayInputStream(full)).toSeq
    assert(got.map(_.name) == Seq("override/0009.txt"))
    assert(new String(got.head.bytes, "UTF-8") == "abc")
  }

  test("checksum mismatch rejects diagnosably") {
    val out = new java.io.ByteArrayOutputStream()
    Tar.write(out, Seq("a.txt" -> "abc".getBytes))
    val bytes = out.toByteArray
    bytes(0) = (bytes(0) ^ 0x01).toByte // flip a name bit, checksum now stale
    val e = intercept[IllegalArgumentException] {
      Tar.tarEntries(new ByteArrayInputStream(bytes)).toSeq
    }
    assert(e.getMessage.contains("checksum"), e.getMessage)
  }

  test("truncated payload and hostile size field reject before allocation") {
    val out = new java.io.ByteArrayOutputStream()
    Tar.write(out, Seq("a.txt" -> ("x" * 600).getBytes))
    val bytes = out.toByteArray
    val cut = bytes.slice(0, 512 + 100) // header + partial payload
    val e1 = intercept[IllegalArgumentException] {
      Tar.tarEntries(new ByteArrayInputStream(cut)).toSeq
    }
    assert(e1.getMessage.contains("truncated"), e1.getMessage)

    // size field claiming > memberCap must reject without allocating
    val big = out.toByteArray
    val sz = java.lang.Long.toOctalString(Tar.memberCap + 1)
    val padded = ("0" * (11 - sz.length)) + sz
    System.arraycopy(padded.getBytes("ISO-8859-1"), 0, big, 124, 11)
    java.util.Arrays.fill(big, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += (big(i) & 0xff))
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes("ISO-8859-1"), 0, big, 148, 6)
    big(154) = 0; big(155) = ' '.toByte
    val e2 = intercept[IllegalArgumentException] {
      Tar.tarEntries(new ByteArrayInputStream(big)).toSeq
    }
    assert(e2.getMessage.contains("member cap"), e2.getMessage)
  }

  test("zip round-trip streams members and skips directories") {
    val f = java.nio.file.Files.createTempFile("graft-tar", ".zip")
    Tar.writeZip(f, Seq("0001.txt" -> "alpha".getBytes, "0002.txt" -> "beta".getBytes))
    val got = Tar.zipEntries(java.nio.file.Files.newInputStream(f)).toSeq
    assert(got.map(_.name) == Seq("0001.txt", "0002.txt"))
    assert(new String(got(1).bytes, "UTF-8") == "beta")
  }

  test("WebDataset key/ext split at the FIRST dot of the basename") {
    assert(Tar.splitKeyExt("a/0001.seg.png") == ("a/0001", "seg.png"))
    assert(Tar.splitKeyExt("0001.txt") == ("0001", "txt"))
    assert(Tar.splitKeyExt("a.b/noext") == ("a.b/noext", ""))
  }

  test("sources dispatch: mixed tar + tar.gz + zip shards in one glob read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards")
    Tar.writeFile(dir.resolve("shard-000.tar"),
      Seq("s0/0.txt" -> "t0".getBytes, "s0/0.json" -> "{}".getBytes))
    Tar.writeFile(dir.resolve("shard-001.tar.gz"),
      Seq("s1/1.txt" -> "t1".getBytes), gzip = true)
    Tar.writeZip(dir.resolve("shard-002.zip"), Seq("s2/2.txt" -> "t2".getBytes))
    val df = Sources.read(spark, "shards", Map("file" -> s"$dir/shard-*", "type" -> "tar"), dir)
    assert(df.columns.toSeq == Seq("shard", "entry", "key", "ext", "n_bytes", "content"))
    graft.expressions.GraftFunctions.register(spark)
    val rows = df.selectExpr("key", "ext", "decode_text(content) AS text")
      .orderBy("key", "ext").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq == Seq(
      ("s0/0", "json", "{}"), ("s0/0", "txt", "t0"),
      ("s1/1", "txt", "t1"), ("s2/2", "txt", "t2")))
  }

  test("writeShards: distributed sink round-trips through the source, incl. gzip") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sink")
    val df = (0L until 50L).map(i => (s"k$i", "txt", s"payload $i".getBytes("UTF-8")))
      .toDF("key", "ext", "content")
    for ((gz, sub) <- Seq((false, "plain"), (true, "gz"))) {
      Tar.writeShards(df.repartition(3), s"$dir/$sub", gzip = gz)
      val back = Sources.read(spark, "back",
        Map("file" -> s"$dir/$sub/shard-*", "type" -> "tar"), dir)
      assert(back.count() == 50)
      assert(back.select("shard").distinct().count() == 3) // one tar per partition
      graft.expressions.GraftFunctions.register(spark)
      val texts = back.selectExpr("key", "decode_text(content) AS t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(texts("k7") == "payload 7" && texts.size == 50)
    }
    // co-location: repartitioning by key puts a sample's members together
    val multi = (0L until 20L).flatMap(i =>
      Seq((s"s$i", "txt", "t".getBytes), (s"s$i", "json", "{}".getBytes)))
      .toDF("key", "ext", "content")
    Tar.writeShards(multi.repartition(4, col("key")), s"$dir/coloc")
    val shardsPerKey = Sources.read(spark, "coloc",
      Map("file" -> s"$dir/coloc/shard-*", "type" -> "tar"), dir)
      .groupBy("key").agg(countDistinct("shard").as("n"))
      .agg(max("n")).collect().head.getLong(0)
    assert(shardsPerKey == 1L, "a sample's members must land in one shard")
    // destination dispatch: format tar
    val out = Destinations.write(df, "wds_out",
      Map("format" -> "tar", "partitions" -> "2"), dir, dir)
    assert(Sources.read(spark, "dback",
      Map("file" -> s"$out/shard-*", "type" -> "tar"), dir).count() == 50)
    // missing columns reject
    val e = intercept[IllegalArgumentException] {
      Tar.writeShards(df.drop("ext"), s"$dir/bad")
    }
    assert(e.getMessage.contains("missing columns"), e.getMessage)
  }

  test("writeShards: .tar.zst shards round-trip through the source") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-zst")
    val df = (0L until 30L).map(i => (s"k$i", "txt", s"z$i".getBytes("UTF-8")))
      .toDF("key", "ext", "content")
    Tar.writeShards(df.repartition(2), s"$dir/z", zstd = true)
    val files = new java.io.File(s"$dir/z").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted // Hadoop local FS writes .crc siblings
    assert(files.nonEmpty && files.forall(_.endsWith(".tar.zst")), files.mkString(","))
    val back = Sources.read(spark, "zback",
      Map("file" -> s"$dir/z/shard-*", "type" -> "tar"), dir)
    assert(back.count() == 30)
    // destination dispatch: compression zst
    val out = Destinations.write(df, "wds_zst",
      Map("format" -> "tar", "partitions" -> "2", "compression" -> "zst"), dir, dir)
    assert(Sources.read(spark, "dzback",
      Map("file" -> s"$out/shard-*", "type" -> "tar"), dir).count() == 30)
    intercept[IllegalArgumentException](
      Tar.writeShards(df, s"$dir/both", gzip = true, zstd = true))
  }

  test("writeShards: overwrite clears stale shards from a wider prior run") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-ow")
    val df = (0L until 40L).map(i => (s"k$i", "txt", s"p$i".getBytes("UTF-8")))
      .toDF("key", "ext", "content")
    Tar.writeShards(df.repartition(6), s"$dir/t") // wide first run
    Tar.writeShards(df.repartition(2), s"$dir/t") // narrower re-run
    val back = Sources.read(spark, "ow",
      Map("file" -> s"$dir/t/shard-*", "type" -> "tar"), dir)
    assert(back.count() == 40, "stale shard-00002..5 files must not survive the re-run")
    assert(back.select("shard").distinct().count() == 2)
  }

  test("corrupt shard rejects with the shard path in the message") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards-bad")
    java.nio.file.Files.write(dir.resolve("bad.tar"), ("x" * 2000).getBytes)
    val e = intercept[Exception] {
      Sources.read(spark, "bad", Map("file" -> s"$dir/bad.tar"), dir)
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("bad.tar")), chain(e).mkString(" | "))
  }
}

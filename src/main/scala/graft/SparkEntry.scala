package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.ops.Ops
import graft.functions.{Dedup, Similarity, TextFunctions => TF}
import graft.template.RowTemplates

/**
 * Driver contract: one `queries` entry per implemented operator from
 * SURVEY.md §2 (+ the training-pipeline operators: dedup, similarity
 * search, text analysis), each exercised on the driver's parquet testdata
 * and mirrored by equivalent DuckDB SQL in `oracleSql`. Queries call the
 * real operator implementations in graft.ops / graft.functions — these are
 * the library's public surface, not inline reimplementations.
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS) which Spark only reads as long
    // (spark.sql.legacy.parquet.nanosAsLong=true, set by Verify/Bench);
    // nanos are microsecond-aligned in the testdata, so this is lossless.
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast(LongType)))
    else df
  }

  /** Fan a tiny id frame out to the session's parallelism before payload
    * synthesis. The multimodal gates derive their media payloads from
    * `documents.doc_id` via mapPartitions, and a sub-128MB parquet scans
    * as ONE partition — without this, fixture encode AND the downstream
    * codec decode (which fuses into the same stage up to the first
    * exchange) run single-task while the other cores idle. The exchange
    * moves 8-byte ids; the heavy bytes are synthesized AFTER it (the
    * optimization guide's "decide with small rows, move big rows once"
    * discipline — §2.5 repartition-after-unsplittable-read). Row-wise
    * payload synthesis is partitioning-independent, so results are
    * byte-identical.
    *
    * GATED on actual scan parallelism (r22, VERDICT r21 #6): when the
    * input already plans to at least the session's parallelism — the
    * 100 TB regime, where scans arrive in many splits — the exchange buys
    * nothing and costs a full extra pass over the rows, so it is skipped
    * outright. The probe reads the planned partition count (driver-side
    * planning only, no job); at sf scale every input is one row group, so
    * the sf0.1 plans are identical to r21's (PlanSpec pins both sides). */
  private[graft] def fanout(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Flagship query (TPC-H Q1 shape) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ===================================================== scans / sources
    "q_source_parquet" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") < 5)
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    // xlsx round-trip: region written to a spreadsheet on the driver, read
    // back through the Sources xlsx reader (all-string contract); the
    // oracle reads the same rows straight from parquet
    "q_source_xlsx" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
        .map(r => Seq(r.get(0).toString, r.getString(1))).toSeq
      val f = java.nio.file.Files.createTempFile("graft-region", ".xlsx")
      graft.engine.Xlsx.write(f, Seq("r_regionkey", "r_name") +: rows)
      graft.engine.Sources.read(s, "region_xlsx",
        Map("file" -> f.toString), f.getParent)
    }),

    // docx round-trip: document texts written as Word paragraphs (tabs,
    // line breaks, and leading/trailing spaces surviving through
    // w:tab/w:br/xml:space), extracted back through the native OOXML
    // StAX parser — one row per paragraph, document order
    "q_source_docx" -> ((s, d) => {
      val texts = t(s, d, "documents").filter(col("doc_id") < 40)
        .select("doc_id", "text").orderBy("doc_id").collect()
        .map(_.getString(1)).toSeq
      val f = java.nio.file.Files.createTempFile("graft-docs", ".docx")
      graft.engine.Docx.writeDocx(f, texts)
      graft.engine.Sources.read(s, "docs_docx",
        Map("file" -> f.toString), f.getParent)
        .select("paragraph", "text")
    }),

    // srt round-trip: documents become cues with id-derived millisecond
    // bounds (integer-exact, so the oracle is closed-form); SRT's own cue
    // numbering is deliberately ignored by the reader
    "q_source_srt" -> ((s, d) => {
      val rows = t(s, d, "documents").filter(col("doc_id") < 40)
        .select("doc_id", "text").orderBy("doc_id").collect()
      val cues = rows.map { r =>
        val id = r.getLong(0)
        (id * 2000L, id * 2000L + 1500L, r.getString(1))
      }.toSeq
      val f = java.nio.file.Files.createTempFile("graft-cues", ".srt")
      graft.engine.Subtitles.writeSrt(f, cues)
      graft.engine.Sources.read(s, "cues_srt",
        Map("file" -> f.toString), f.getParent)
        .select("cue", "start_ms", "end_ms", "text")
    }),

    "q_source_vtt" -> ((s, d) => {
      val rows = t(s, d, "documents").filter(col("doc_id") < 40)
        .select("doc_id", "text").orderBy("doc_id").collect()
      val cues = rows.map { r =>
        val id = r.getLong(0)
        (id * 2000L, id * 2000L + 1500L, r.getString(1))
      }.toSeq
      val f = java.nio.file.Files.createTempFile("graft-cues", ".vtt")
      graft.engine.Subtitles.writeVtt(f, cues)
      graft.engine.Sources.read(s, "cues_vtt",
        Map("file" -> f.toString), f.getParent)
        .select("cue", "start_ms", "end_ms", "text")
    }),

    // doc_text EXPRESSION over a binary column (the staged-crawl shape:
    // bytes already in parquet, no temp-file detour): each document
    // rendered into a format rotated by id (rtf/doc/docx/pptx), extracted
    // back by the auto-sniffing fused expression — identity round-trip
    // subtitle text FROM video containers: Matroska S_TEXT/UTF8 tracks
    // feed doc_text like any document format (auto-sniffed by the EBML
    // magic) — the crawl shape where a video file's only usable text is
    // its subtitle track
    "q_doc_text_mkv" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 300).transform(fanout).as[Long]
        .mapPartitions(_.map { id =>
          val cues = (0 until 2 + (id % 3).toInt).map(k => s"cue $id line $k")
          (id, graft.functions.Webm.encodeMkvSubtitles(cues))
        })
        .toDF("doc_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "doc_text", "column" -> "content",
          "format" -> "auto"), Map.empty, "gate")
        .select("doc_id", "text")
    }),

    "q_doc_text" -> ((s, d) => {
      val rows = t(s, d, "documents").filter(col("doc_id") < 40)
        .select("doc_id", "text").orderBy("doc_id").collect()
      val payload = rows.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val fmt = Seq("rtf", "doc", "docx", "pptx")((id % 4).toInt)
        val f = java.nio.file.Files.createTempFile("graft-dt", "." + fmt)
        fmt match {
          case "rtf" => graft.engine.Rtf.write(f, Seq(text))
          case "doc" => graft.engine.Doc.write(f, Seq(text))
          case "docx" => graft.engine.Docx.writeDocx(f, Seq(text))
          case "pptx" => graft.engine.Docx.writePptx(f, Seq(text))
        }
        (id, java.nio.file.Files.readAllBytes(f))
      }.toSeq
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      payload.toDF("doc_id", "content")
        .selectExpr("doc_id", "doc_text(content) AS text")
    }),

    // charset detection + decode over raw bytes: each document's text
    // serialized in an id-rotated encoding (plain UTF-8, BOM'd UTF-8,
    // BOM'd UTF-16LE/BE); detect_charset must label it and decode_text
    // must reproduce the text exactly — labels are closed-form
    "q_decode_text" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val payload = t(s, d, "documents").filter(col("doc_id") < 200)
        .select("doc_id", "text").orderBy("doc_id").collect()
        .map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val bytes = (id % 4) match {
            case 0 => text.getBytes("UTF-8")
            case 1 => Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ text.getBytes("UTF-8")
            case 2 => Array[Byte](0xFF.toByte, 0xFE.toByte) ++ text.getBytes("UTF-16LE")
            case _ => Array[Byte](0xFE.toByte, 0xFF.toByte) ++ text.getBytes("UTF-16BE")
          }
          (id, bytes)
        }.toSeq
      payload.toDF("doc_id", "content")
        .selectExpr("doc_id", "detect_charset(content) AS charset",
          "decode_text(content) AS text")
    }),

    // eml round-trip: one RFC 5322 message per file in a temp dir (glob
    // read), cycling transfer-encodings (7bit/qp/base64) and multipart
    // framing by doc id; subjects carry non-ASCII so RFC 2047 B-words are
    // exercised. textOf strips trailing whitespace, mirrored in the oracle.
    "q_source_eml" -> ((s, d) => {
      val rows = t(s, d, "documents").filter(col("doc_id") < 40)
        .select("doc_id", "text").orderBy("doc_id").collect()
      val dir = java.nio.file.Files.createTempDirectory("graft-mail")
      rows.foreach { r =>
        val id = r.getLong(0)
        val enc = Seq("7bit", "quoted-printable", "base64")(((id % 3)).toInt)
        val raw = graft.engine.Eml.writeEml(s"Doc $id café", s"sender$id@example.org",
          "Thu, 1 Jan 1970 00:00:00 +0000", r.getString(1), enc, multipart = id % 2 == 0)
        java.nio.file.Files.write(dir.resolve(f"m$id%03d.eml"),
          raw.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      graft.engine.Sources.read(s, "mail_eml",
        Map("file" -> s"$dir/*.eml"), dir)
        .select("subject", "mail_from", "date", "text")
    }),

    // mbox round-trip: the same 40 messages concatenated into ONE archive
    // (`From ` separators, `>From ` quoting) and read back through the
    // SPLITTABLE record-delimiter path — message numbering must come out
    // dense and file-ordered from the two-phase split prefix sums
    "q_source_mbox" -> ((s, d) => {
      val rows = t(s, d, "documents").filter(col("doc_id") < 40)
        .select("doc_id", "text").orderBy("doc_id").collect()
      val msgs = rows.map { r =>
        val id = r.getLong(0)
        val enc = Seq("7bit", "quoted-printable", "base64")(((id % 3)).toInt)
        graft.engine.Eml.writeEml(s"Doc $id café", s"sender$id@example.org",
          "Thu, 1 Jan 1970 00:00:00 +0000", r.getString(1), enc, multipart = id % 2 == 1)
      }.toSeq
      val f = java.nio.file.Files.createTempFile("graft-mail", ".mbox")
      graft.engine.Eml.writeMbox(f, msgs)
      graft.engine.Sources.read(s, "mail_mbox",
        Map("file" -> f.toString), f.getParent)
        .select("message", "subject", "mail_from", "date", "text")
    }),

    // WebDataset shard round-trip: 60 documents written as key.ext members
    // (each sample = a .txt payload + a .meta.json sidecar, the LAION
    // shape) across THREE shard containers — plain tar, tar.gz, zip —
    // read back through one glob with per-file container sniffing, then
    // decoded off the binary column by the fused decode_text expression
    "q_source_tar" -> ((s, d) => {
      val rows = t(s, d, "documents").filter(col("doc_id") < 60)
        .select("doc_id", "text").orderBy("doc_id").collect()
      val dir = java.nio.file.Files.createTempDirectory("graft-shards")
      rows.groupBy(r => (r.getLong(0) % 3).toInt).foreach { case (shard, rs) =>
        val entries = rs.sortBy(_.getLong(0)).flatMap { r =>
          val id = r.getLong(0)
          val name = f"samples/d$id%03d"
          Seq(s"$name.txt" -> r.getString(1).getBytes("UTF-8"),
            s"$name.meta.json" -> s"""{"id":$id}""".getBytes("UTF-8"))
        }.toSeq
        shard match {
          case 0 => graft.engine.Tar.writeFile(dir.resolve("shard-000.tar"), entries)
          case 1 => graft.engine.Tar.writeFile(dir.resolve("shard-001.tar.gz"), entries, gzip = true)
          case _ => graft.engine.Tar.writeZip(dir.resolve("shard-002.zip"), entries)
        }
      }
      graft.expressions.GraftFunctions.register(s)
      graft.engine.Sources.read(s, "wds",
        Map("file" -> s"$dir/shard-*", "type" -> "tar"), dir)
        .selectExpr("key", "ext", "n_bytes", "decode_text(content) AS text")
    }),

    // CDC merge: customer snapshot + a synthetic changeset (two stacked
    // upserts for %5 keys — latest seq must win; deletes for %7 keys —
    // beaten by the later upsert on %35 keys; inserts under new keys).
    // One map-side-combinable latest-per-key agg + one co-partitioned
    // full-outer join; the oracle rebuilds the merge with window+FULL JOIN
    "q_apply_changes" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val snap = cust.select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      def upd(tag: String, seq: Long) = cust.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"), concat(lit(s"$tag "), col("c_name")).as("c_name"),
          lit(s"SEG$tag").as("c_mktsegment"), lit(seq).as("seq"), lit("u").as("op"))
      val chg = upd("U1", 1L)
        .unionAll(upd("U3", 3L))
        .unionAll(cust.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), lit("").as("c_name"), lit("").as("c_mktsegment"),
            lit(2L).as("seq"), lit("D").as("op")))
        .unionAll(cust
          .select((col("c_custkey") + 10000000L).as("c_custkey"),
            concat(lit("NEW "), col("c_custkey").cast("string")).as("c_name"),
            lit("SEGN").as("c_mktsegment"), lit(1L).as("seq"), lit("u").as("op")))
      graft.functions.Cdc.applyChanges(snap, chg, Seq("c_custkey"), "seq", "op")
    }),

    // Morton clustering key: unsigned fixed-point buckets + bit
    // interleave, all integer-exact, so the oracle reproduces every key
    // in SQL. The layout pass itself (range partition + local sort) is
    // row-preserving; the gate checks the key arithmetic.
    "q_zorder" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      graft.functions.Zorder.withZorderKey(li, Seq("l_orderkey", "l_partkey"), bits = 8)
    }),

    // cross-corpus fuzzy join: even-id documents matched against odd-id
    // documents by word-shingle Jaccard — the record-linkage shape; the
    // oracle recomputes every cross-parity pair exactly
    "q_similarity_join" -> ((s, d) => {
      val docs = fanout(t(s, d, "documents")).select("doc_id", "text")
      graft.functions.Dedup.similarityJoin(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", "doc_id", "text",
        threshold = 0.7, maxDocFreq = Some(1000L))
    }),

    // shard SINK round-trip: documents packaged into 4 tar shards by the
    // distributed per-partition writer, read back through the tar source
    // — write + read must invert exactly (identity oracle)
    // avro sink round trip: typed events (long / timestamp-micros / string
    // / long) through the distributed container writer, read back via the
    // avro source's all-string model — longs and epoch micros stringify
    // identically in both engines (doubles would not; the double face is
    // spec-covered with exact equality through our own reader)
    "q_avro_sink" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-avro-sink")
      val ev = t(s, d, "events").filter(col("event_id") < 500)
        .select(col("event_id"), col("ts"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.engine.Avro.write(ev.repartition(4), s"$dir/out")
      graft.engine.Sources.read(s, "avro_back",
        Map("file" -> s"$dir/out", "type" -> "avro"), dir)
    }),

    // the same WebDataset round trip over .tar.zst shards (zstd-jni both
    // directions: ZstdOutputStream in the sink, ZstdInputStream in the
    // source's container sniff)
    "q_tar_sink_zst" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-shard-zst")
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(concat(lit("d"), col("doc_id")).as("key"), lit("txt").as("ext"),
          encode(col("text"), "UTF-8").as("content"))
      graft.engine.Tar.writeShards(docs.repartition(4), s"$dir/shards", zstd = true)
      graft.expressions.GraftFunctions.register(s)
      graft.engine.Sources.read(s, "wds_zst_back",
        Map("file" -> s"$dir/shards/shard-*", "type" -> "tar"), dir)
        .selectExpr("key", "decode_text(content) AS text")
    }),

    // text-DESTINATION zst round trip: a json destination with
    // `compression: zst` (the Hadoop-codec class-name reroute — Spark's
    // "zstd" short name would demand libhadoop) written distributed,
    // read back through the transparent .zst source path — write + read
    // must invert exactly, and jsonl inference keeps integers integral
    "q_dest_zst" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-dest-zst")
      val docs = t(s, d, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.engine.Destinations.write(docs.repartition(3), "zstout",
        Map("format" -> "json", "compression" -> "zst"), dir, dir)
      graft.engine.Sources.read(s, "zst_back",
        Map("file" -> s"$dir/zstout.json/part-*.zst", "type" -> "jsonl"), dir)
        .select("doc_id", "lang", "n_chars")
    }),

    "q_tar_sink" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-shard-sink")
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(concat(lit("d"), col("doc_id")).as("key"), lit("txt").as("ext"),
          encode(col("text"), "UTF-8").as("content"))
      graft.engine.Tar.writeShards(docs.repartition(4), s"$dir/shards")
      graft.expressions.GraftFunctions.register(s)
      graft.engine.Sources.read(s, "wds_back",
        Map("file" -> s"$dir/shards/shard-*", "type" -> "tar"), dir)
        .selectExpr("key", "decode_text(content) AS text")
    }),

    // streaming CDC ingest (6th ingest face): two real micro-batches of
    // (op, seq)-stamped changes replay through foreachBatch — batch 1
    // carries upserts + deletes, batch 2 later upserts + inserts — each
    // compacted and batch-stamp-overwritten; the materialized current
    // table must equal the pure-batch merge of the concatenated feed
    "q_stream_cdc" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-cdc")
      val cust = t(s, d, "customer").filter(col("c_custkey") < 2000)
      val snap = cust.select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      def upd(tag: String, seq: Long) = cust.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"), concat(lit(s"$tag "), col("c_name")).as("c_name"),
          lit(s"SEG$tag").as("c_mktsegment"), lit(seq).as("seq"), lit("u").as("op"))
      val delta1 = upd("U1", 1L)
        .unionAll(cust.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), lit("").as("c_name"), lit("").as("c_mktsegment"),
            lit(2L).as("seq"), lit("D").as("op")))
      val delta2 = upd("U3", 3L)
        .unionAll(cust
          .select((col("c_custkey") + 10000000L).as("c_custkey"),
            concat(lit("NEW "), col("c_custkey").cast("string")).as("c_name"),
            lit("SEGN").as("c_mktsegment"), lit(4L).as("seq"), lit("u").as("op")))
      delta1.write.parquet(s"$dir/src")
      val src = s.readStream.schema(delta1.schema).parquet(s"$dir/src")
      val q = graft.streaming.Streams.cdcIngest(src, Seq("c_custkey"), "seq", "op",
        s"$dir/changes", s"$dir/ckpt")
      try {
        q.processAllAvailable()
        // single-file append: atomic rename, so the trigger can't split
        // the delta across micro-batches (the q_stream_ingest lesson)
        delta2.coalesce(1).write.mode("append").parquet(s"$dir/src")
        q.processAllAvailable()
      } finally q.stop()
      graft.streaming.Streams.cdcCurrent(snap, s"$dir/changes",
        Seq("c_custkey"), "seq", "op")
    }),

    // quality-weighted sampling: per-row keep probability = weight_ppm /
    // 10^6 (here derived from text length), decided by pure integer
    // threshold arithmetic over the row's md5 draw — the oracle replays
    // every keep/drop decision exactly
    "q_weighted_sample" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        .withColumn("w", least(lit(1000000L), length(col("text")).cast("long") * 1500))
      graft.functions.Sampling.weightedHashSample(docs, "doc_id", "w")
        .select("doc_id", "w")
    }),

    // seeded ±1 random projection (JL): integer-exact by construction
    // (fixed-point quantize, sign bits from splitmix64, Long sums), so
    // the oracle rebuilds every projected value in HUGEINT SQL
    "q_dim_reduce" -> ((s, d) => {
      val emb = t(s, d, "embeddings").filter(col("vec_id") < 50)
      graft.functions.DimReduce.withProjection(emb, "embedding", "yq",
        k = 8, seed = 42, sBits = 10, asFloat = false)
        .select(col("vec_id"), posexplode(col("yq")))
        .select(col("vec_id"), col("pos").cast("long").as("j"), col("col").as("y"))
    }),

    // SCD2 historization: per-customer order-status stream becomes
    // validity intervals; change_only collapses repeated states so
    // intervals chain across re-statements. Exact window oracle.
    "q_scd2" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey").as("seq"), col("o_orderstatus"))
      graft.functions.Cdc.scd2(ord, Seq("o_custkey"), "seq", changeOnly = true)
        .select(col("o_custkey"), col("seq"), col("o_orderstatus"),
          col("valid_from"), col("valid_to"),
          col("is_current").cast("string").as("is_current"))
    }),

    // epub round-trip: texts packaged as OCF/OPF chapters (stored
    // mimetype, container → rootfile → manifest+spine), read back in
    // SPINE order as markup, then the engine's html_to_text op extracts —
    // the exact `source type epub` → `html_to_text` composition a books
    // pipeline runs
    "q_source_epub" -> ((s, d) => {
      val texts = t(s, d, "documents").filter(col("doc_id") < 40)
        .select("doc_id", "text").orderBy("doc_id").collect()
        .map(_.getString(1)).toSeq
      val f = java.nio.file.Files.createTempFile("graft-docs", ".epub")
      graft.engine.Epub.write(f, texts)
      val src = graft.engine.Sources.read(s, "docs_epub",
        Map("file" -> f.toString), f.getParent)
      new graft.engine.Engine(s).applyOperation(src,
        Map("operation" -> "html_to_text", "column" -> "html"), Map.empty, "gate")
        .select(col("chapter"), col("html").as("text"))
    }),

    // legacy .doc round-trip: document texts in a UTF-16 piece behind a
    // real FIB + Clx piece table in an OLE2 container, extracted back
    // through the native [MS-DOC] parser over the from-scratch CFB reader
    "q_source_doc" -> ((s, d) => {
      val texts = t(s, d, "documents").filter(col("doc_id") < 40)
        .select("doc_id", "text").orderBy("doc_id").collect()
        .map(_.getString(1)).toSeq
      val f = java.nio.file.Files.createTempFile("graft-docs", ".doc")
      graft.engine.Doc.write(f, texts)
      graft.engine.Sources.read(s, "docs_doc",
        Map("file" -> f.toString), f.getParent)
        .select("paragraph", "text")
    }),

    // rtf round-trip: document texts written as \par-terminated RTF
    // paragraphs (specials escaped, non-ASCII as \uN), extracted back
    // through the native group-walking parser
    "q_source_rtf" -> ((s, d) => {
      val texts = t(s, d, "documents").filter(col("doc_id") < 40)
        .select("doc_id", "text").orderBy("doc_id").collect()
        .map(_.getString(1)).toSeq
      val f = java.nio.file.Files.createTempFile("graft-docs", ".rtf")
      graft.engine.Rtf.write(f, texts)
      graft.engine.Sources.read(s, "docs_rtf",
        Map("file" -> f.toString), f.getParent)
        .select("paragraph", "text")
    }),

    // pptx round-trip: one slide per document, slide-number order (ZIP
    // entry order is deliberately not trusted by the reader)
    "q_source_pptx" -> ((s, d) => {
      val texts = t(s, d, "documents").filter(col("doc_id") < 40)
        .select("doc_id", "text").orderBy("doc_id").collect()
        .map(_.getString(1)).toSeq
      val f = java.nio.file.Files.createTempFile("graft-docs", ".pptx")
      graft.engine.Docx.writePptx(f, texts)
      graft.engine.Sources.read(s, "docs_pptx",
        Map("file" -> f.toString), f.getParent)
        .select("slide", "text")
    }),

    // ods round-trip: region written as an OpenDocument spreadsheet (typed
    // float cells + LibreOffice-style trailing repeat trailers), read back
    // through the native ODF content.xml parser; oracle reads parquet
    "q_source_ods" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
        .map(r => Seq(r.get(0).toString, r.getString(1))).toSeq
      val f = java.nio.file.Files.createTempFile("graft-region", ".ods")
      graft.engine.Ods.write(f, Seq("r_regionkey", "r_name") +: rows)
      graft.engine.Sources.read(s, "region_ods",
        Map("file" -> f.toString), f.getParent)
    }),

    // xlsb round-trip: region written as BIFF12 binary records (RK-packed
    // key, shared-string name), read back through the native Xlsb parser
    "q_source_xlsb" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
        .map(r => Seq(r.get(0).toString, r.getString(1))).toSeq
      val f = java.nio.file.Files.createTempFile("graft-region", ".xlsb")
      graft.engine.Xlsb.write(f, Seq("r_regionkey", "r_name") +: rows)
      graft.engine.Sources.read(s, "region_xlsb",
        Map("file" -> f.toString), f.getParent)
    }),

    // xls round-trip: region written as BIFF8 records in a CFB container
    // (tools/GenXls — SST strings, RK-packed keys), read back through the
    // native Cfb+Xls parsers
    "q_source_xls" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
        .map(r => Seq(r.get(0).toString, r.getString(1))).toSeq
      val f = java.nio.file.Files.createTempFile("graft-region", ".xls")
      graft.tools.GenXls.write(f.toString, Seq("r_regionkey", "r_name") +: rows)
      graft.engine.Sources.read(s, "region_xls",
        Map("file" -> f.toString), f.getParent)
    }),

    // pdf round-trip: region written as a multi-page Flate-compressed text
    // PDF (native writer), read back through the distributed PDF page
    // extractor; key/name recovered from the page text lines
    "q_source_pdf" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".pdf")
      graft.engine.Pdf.write(f,
        rows.map(r => s"${r.get(0)}\n${r.getString(1)}").toSeq, compress = true)
      graft.engine.Sources.read(s, "region_pdf",
        Map("file" -> f.toString), f.getParent)
        .select(
          element_at(split(col("text"), "\n"), 1).as("r_regionkey"),
          element_at(split(col("text"), "\n"), 2).as("r_name"))
    }),

    // pdf with a composite font: text shown as 2-byte glyph codes remapped
    // through a /ToUnicode CMap (bfrange runs + bfchar singles), content
    // and CMap streams /LZWDecode-compressed — the subset-font shape real
    // generators emit, where extraction without CMap support yields glyph
    // garbage instead of text
    "q_source_pdf_cmap" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region-cmap", ".pdf")
      graft.engine.Pdf.writeCMap(f,
        rows.map(r => s"${r.get(0)}\n${r.getString(1)}").toSeq, lzw = true)
      graft.engine.Sources.read(s, "region_pdf_cmap",
        Map("file" -> f.toString), f.getParent)
        .select(
          element_at(split(col("text"), "\n"), 1).as("r_regionkey"),
          element_at(split(col("text"), "\n"), 2).as("r_name"))
    }),

    // encrypted pdf (standard security handler, AES-128 /AESV2, empty
    // user password — the "protected" shape): content streams decrypt
    // transparently through PdfCrypt before the Flate decode
    "q_source_pdf_enc" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region-enc", ".pdf")
      graft.engine.Pdf.writeEncrypted(f,
        rows.map(r => s"${r.get(0)}\n${r.getString(1)}").toSeq, mode = "aes")
      graft.engine.Sources.read(s, "region_pdf_enc",
        Map("file" -> f.toString), f.getParent)
        .select(
          element_at(split(col("text"), "\n"), 1).as("r_regionkey"),
          element_at(split(col("text"), "\n"), 2).as("r_name"))
    }),

    // region → sas7bdat (tools/GenSas, the pandas-cross-validated writer) →
    // native Sas reader; numeric key exercises the SAS-double decode path
    "q_source_sas" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".sas7bdat")
      graft.tools.GenSas.write(f.toString, Seq(
        graft.tools.GenSas.NumCol("r_regionkey",
          rows.map(_.get(0).toString.toDouble).toSeq),
        graft.tools.GenSas.StrCol("r_name", 32,
          rows.map(_.getString(1)).toSeq)), rows.length)
      graft.engine.Sources.read(s, "region_sas",
        Map("file" -> f.toString), f.getParent)
    }),

    // region → .sav (tools/GenSpss, bytecode-compressed) → native Spss
    // reader; numeric key exercises bias/literal decode, names the
    // subtype-13 long-name path
    "q_source_spss" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".sav")
      graft.tools.GenSpss.write(f.toString, Seq(
        graft.tools.GenSpss.NumCol("RKEY", "r_regionkey",
          rows.map(r => Some(r.get(0).toString.toDouble)).toSeq),
        graft.tools.GenSpss.StrCol("RNAME", "r_name", 32,
          rows.map(_.getString(1)).toSeq)), rows.length, compression = 1)
      graft.engine.Sources.read(s, "region_sav",
        Map("file" -> f.toString), f.getParent)
    }),

    // region → .dta (tools/GenStata, classic format 114, cross-validated
    // with pd.read_stata — FIXTURES.md) → native Stata reader; `long`
    // typed key renders as an integer string, no double cast
    "q_source_stata" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".dta")
      graft.tools.GenStata.write(f.toString, Seq(
        graft.tools.GenStata.LongCol("r_regionkey",
          rows.map(r => Some(r.get(0).toString.toInt)).toSeq),
        graft.tools.GenStata.StrCol("r_name", 32, rows.map(_.getString(1)).toSeq)),
        rows.length)
      graft.engine.Sources.read(s, "region_dta",
        Map("file" -> f.toString), f.getParent)
    }),

    // documents → .wet.gz (GenWarc, one gzip member per record — the
    // Common Crawl layout) → distributed Warc reader; text round-trips
    // byte-exactly including embedded newlines
    "q_source_wet" -> ((s, d) => {
      val rows = t(s, d, "documents").select("doc_id", "text")
        .orderBy(col("doc_id").cast("long")).collect()
      val f = java.nio.file.Files.createTempFile("graft-docs", ".wet.gz")
      graft.tools.GenWarc.write(f.toString,
        rows.map(r => (s"http://doc.example/${r.get(0)}", r.getString(1))).toSeq,
        gzip = true)
      graft.engine.Sources.read(s, "docs_wet", Map("file" -> f.toString), f.getParent)
        .select(col("url"), col("text"))
    }),

    // region → .avro (tools/GenAvro via the canonical avro-java library,
    // deflate codec) → Avro source; long key renders as an integer string
    "q_source_avro" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".avro")
      graft.tools.GenAvro.write(f.toString, Seq(
        graft.tools.GenAvro.LongCol("r_regionkey",
          rows.map(_.get(0).toString.toLong).toSeq),
        graft.tools.GenAvro.StrCol("r_name", rows.map(_.getString(1)).toSeq)),
        rows.length)
      graft.engine.Sources.read(s, "region_avro",
        Map("file" -> f.toString), f.getParent)
    }),

    // region → .pkl (tools/GenPickle emits the pandas object graph,
    // cross-validated with pd.read_pickle — FIXTURES.md) → native
    // restricted unpickler; int64 block + object block + slice placements
    "q_source_pickle" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".pkl")
      graft.tools.GenPickle.write(f.toString, Seq(
        graft.tools.GenPickle.NumCol("r_regionkey",
          rows.map(_.get(0).toString.toLong).toSeq),
        graft.tools.GenPickle.StrCol("r_name", rows.map(_.getString(1)).toSeq)),
        rows.length)
      graft.engine.Sources.read(s, "region_pkl",
        Map("file" -> f.toString), f.getParent)
    }),

    // region → .zsav (compression 2: multi-block zlib over the bytecode
    // stream — 64-byte blocks force several deflate frames even at 5 rows)
    "q_source_zsav" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".zsav")
      graft.tools.GenSpss.write(f.toString, Seq(
        graft.tools.GenSpss.NumCol("RKEY", "r_regionkey",
          rows.map(r => Some(r.get(0).toString.toDouble)).toSeq),
        graft.tools.GenSpss.StrCol("RNAME", "r_name", 32,
          rows.map(_.getString(1)).toSeq)), rows.length, compression = 2,
        zsavBlockSize = 64)
      graft.engine.Sources.read(s, "region_zsav",
        Map("file" -> f.toString), f.getParent)
    }),

    // region → headered CSV (all-string contract, ""-preserve) — the most
    // common reference source shape, previously spec-only
    "q_source_csv" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".csv")
      val body = "r_regionkey,r_name\n" +
        rows.map(r => s"${r.get(0)},${r.getString(1)}").mkString("\n") + "\n"
      java.nio.file.Files.writeString(f, body)
      graft.engine.Sources.read(s, "region_csv", Map("file" -> f.toString), f.getParent)
    }),

    // optional-source machinery: columns SUBSET selection tolerating a
    // listed-but-absent optional field (which materializes as ""), plus a
    // MISSING `optional: true` source contributing an empty frame whose
    // all-string schema must union cleanly with the real read
    "q_source_optional" -> ((s, d) => {
      val rows = t(s, d, "nation").select("n_nationkey", "n_name")
        .orderBy("n_nationkey").collect()
      val dir = java.nio.file.Files.createTempDirectory("graft-opt")
      val f = dir.resolve("nation.csv")
      java.nio.file.Files.writeString(f, "n_nationkey,n_name\n" +
        rows.map(r => s"${r.get(0)},${r.getString(1)}").mkString("\n") + "\n")
      val cols = List("n_nationkey", "n_name", "n_ghost")
      val present = graft.engine.Sources.read(s, "nat_opt",
        Map("file" -> f.toString, "columns" -> cols,
          "optional_fields" -> List("n_ghost")), dir)
      val absent = graft.engine.Sources.read(s, "nat_missing",
        Map("file" -> s"$dir/no-such-file.csv", "optional" -> true,
          "columns" -> cols, "optional_fields" -> List("n_ghost")), dir)
      present.unionByName(absent)
    }),

    // sink null/type coercion through the DEFAULT jsonl render
    // (destination.py:21-58 cast_output_dtype parity): every value
    // stringifies, None/null renders as "" — the written rows read back
    // must state those coercions exactly
    "q_sink_nulls" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-sink-nulls")
      val src = t(s, d, "customer").filter(col("c_custkey") < 1000)
        .select(col("c_custkey"),
          when(col("c_custkey") % 3 === 0, lit(null)).otherwise(col("c_name")).as("c_name"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
      graft.engine.Destinations.write(src, "cust", Map.empty, dir, dir)
      graft.engine.Sources.read(s, "cust_back",
        Map("file" -> s"$dir/cust.jsonl", "type" -> "jsonl"), dir)
    }),

    // headerless csv (header_rows: 0 engine extension): `columns` becomes
    // the schema; the body parses distributed with no header inference
    "q_headerless_csv" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region-nh", ".csv")
      val body = rows.map(r => s"${r.get(0)},${r.getString(1)}").mkString("\n") + "\n"
      java.nio.file.Files.writeString(f, body)
      graft.engine.Sources.read(s, "region_nh",
        Map("file" -> f.toString, "header_rows" -> 0,
          "columns" -> List("r_regionkey", "r_name")), f.getParent)
    }),

    // multi-line sparse header (header_rows as a 0-based row list +
    // fill_sparse_headers): upper rows forward-fill, per-column pieces
    // join with "__" — names are closed-form
    "q_multiline_header" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region-mh", ".csv")
      val body = "Region,,Detail\nKey,Name,Comment\n" +
        rows.map(r => s"${r.get(0)},${r.getString(1)},d${r.get(0)}").mkString("\n") + "\n"
      java.nio.file.Files.writeString(f, body)
      graft.engine.Sources.read(s, "region_mh",
        Map("file" -> f.toString, "header_rows" -> List(0, 1),
          "fill_sparse_headers" -> true), f.getParent)
    }),

    // the same CSV zstd-compressed: the registered ZstdCodec makes every
    // Hadoop text reader handle *.zst transparently (crawl corpora ship
    // zstd; Hadoop's own codec needs native libhadoop, absent here)
    "q_source_csv_zst" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".csv.zst")
      val body = "r_regionkey,r_name\n" +
        rows.map(r => s"${r.get(0)},${r.getString(1)}").mkString("\n") + "\n"
      java.nio.file.Files.write(f,
        graft.engine.ZstdCodec.compress(body.getBytes("UTF-8")))
      graft.engine.Sources.read(s, "region_csv_zst", Map("file" -> f.toString), f.getParent)
    }),

    // jsonl.zst through Spark's json reader + the codec layer
    "q_source_jsonl_zst" -> ((s, d) => {
      val rows = t(s, d, "nation").select("n_nationkey", "n_name")
        .orderBy("n_nationkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-nation", ".jsonl.zst")
      val body = rows.map(r =>
        s"""{"n_nationkey": ${r.get(0)}, "n_name": "${r.getString(1)}"}""").mkString("\n") + "\n"
      java.nio.file.Files.write(f,
        graft.engine.ZstdCodec.compress(body.getBytes("UTF-8")))
      graft.engine.Sources.read(s, "nation_jsonl_zst", Map("file" -> f.toString), f.getParent)
    }),

    // nation → TSV (tab separator through the same delimited reader)
    "q_source_tsv" -> ((s, d) => {
      val rows = t(s, d, "nation").select("n_nationkey", "n_name")
        .orderBy("n_nationkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-nation", ".tsv")
      val body = "n_nationkey\tn_name\n" +
        rows.map(r => s"${r.get(0)}\t${r.getString(1)}").mkString("\n") + "\n"
      java.nio.file.Files.writeString(f, body)
      graft.engine.Sources.read(s, "nation_tsv", Map("file" -> f.toString), f.getParent)
    }),

    // nation → JSONL/ndjson (schema inference: long + string survive)
    "q_source_jsonl" -> ((s, d) => {
      val rows = t(s, d, "nation").select("n_nationkey", "n_name")
        .orderBy("n_nationkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-nation", ".jsonl")
      val body = rows.map(r =>
        s"""{"n_nationkey":${r.get(0)},"n_name":"${r.getString(1)}"}""").mkString("\n") + "\n"
      java.nio.file.Files.writeString(f, body)
      graft.engine.Sources.read(s, "nation_jsonl", Map("file" -> f.toString), f.getParent)
    }),

    // region → whole-document JSON records array (multiLine distributed parse)
    "q_source_json" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".json")
      val body = rows.map(r =>
        s"""  {"r_regionkey": ${r.get(0)}, "r_name": "${r.getString(1)}"}""")
        .mkString("[\n", ",\n", "\n]\n")
      java.nio.file.Files.writeString(f, body)
      graft.engine.Sources.read(s, "region_json", Map("file" -> f.toString), f.getParent)
    }),

    // region → XML (spark-xml rowTag path; long + string inference)
    "q_source_xml" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".xml")
      val body = rows.map(r =>
        s"  <row><r_regionkey>${r.get(0)}</r_regionkey><r_name>${r.getString(1)}</r_name></row>")
        .mkString("<rows>\n", "\n", "\n</rows>\n")
      java.nio.file.Files.writeString(f, body)
      graft.engine.Sources.read(s, "region_xml", Map("file" -> f.toString), f.getParent)
    }),

    // region → HTML <table> scrape (th header, all-string cells)
    "q_source_html" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".html")
      val body = "<html><body><table>\n" +
        "<tr><th>r_regionkey</th><th>r_name</th></tr>\n" +
        rows.map(r => s"<tr><td>${r.get(0)}</td><td>${r.getString(1)}</td></tr>")
          .mkString("\n") + "\n</table></body></html>\n"
      java.nio.file.Files.writeString(f, body)
      graft.engine.Sources.read(s, "region_html", Map("file" -> f.toString), f.getParent)
    }),

    // region → fixed-width text (substring projections over spark.read.text)
    "q_source_fixedwidth" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".txt")
      val body = rows.map(r => s"%-4s%-16s".format(r.get(0).toString, r.getString(1)))
        .mkString("", "\n", "\n")
      java.nio.file.Files.writeString(f, body)
      graft.engine.Sources.read(s, "region_fw", Map(
        "file" -> f.toString, "type" -> "fixedwidth",
        "columns" -> List("r_regionkey", "r_name"),
        "widths" -> List(4, 16)), f.getParent)
    }),

    // region → ORC (columnar round-trip through Spark's native ORC writer;
    // types preserved end to end)
    "q_source_orc" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-region-orc")
      t(s, d, "region").select("r_regionkey", "r_name")
        .write.mode("overwrite").orc(dir.resolve("region.orc").toString)
      graft.engine.Sources.read(s, "region_orc",
        Map("file" -> dir.resolve("region.orc").toString, "type" -> "orc"), dir)
    }),

    // region → feather / Arrow IPC (tools/GenArrow via arrow-vector; long
    // key survives natively, no string cast)
    "q_source_feather" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val f = java.nio.file.Files.createTempFile("graft-region", ".feather")
      graft.tools.GenArrow.write(f.toString, Seq(
        graft.tools.GenArrow.LongCol("r_regionkey",
          rows.map(_.get(0).toString.toLong).toSeq),
        graft.tools.GenArrow.StrCol("r_name", rows.map(_.getString(1)).toSeq)),
        rows.length)
      graft.engine.Sources.read(s, "region_feather",
        Map("file" -> f.toString), f.getParent)
    }),

    // region → embedded-Derby table → SqlSource JDBC read (quoted aliases
    // keep lowercase names through Derby's case folding)
    "q_source_jdbc" -> ((s, d) => {
      val rows = t(s, d, "region").select("r_regionkey", "r_name")
        .orderBy("r_regionkey").collect()
      val dir = java.nio.file.Files.createTempDirectory("graft-derby")
      val url = s"jdbc:derby:${dir.resolve("db")};create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        st.execute("CREATE TABLE region_t (rk INT, rn VARCHAR(32))")
        val ps = conn.prepareStatement("INSERT INTO region_t VALUES (?, ?)")
        rows.foreach { r =>
          ps.setInt(1, r.get(0).toString.toInt); ps.setString(2, r.getString(1))
          ps.addBatch()
        }
        ps.executeBatch(); ps.close(); st.close()
      } finally conn.close()
      graft.engine.Sources.read(s, "region_jdbc", Map(
        "connection" -> url,
        "query" -> """SELECT rk AS "r_regionkey", rn AS "r_name" FROM region_t"""), dir)
    }),

    // ==================================================== column operators
    "q_add_columns" -> ((s, d) =>
      Ops.addColumns(t(s, d, "nation"),
        Seq("tag" -> "static", "combo" -> "{{n_name}}-{{n_regionkey}}"))
        .select("n_nationkey", "n_name", "tag", "combo")),

    "q_modify_columns" -> ((s, d) =>
      Ops.modifyColumns(t(s, d, "customer").select("c_custkey", "c_name"),
        Seq("c_name" -> "{{value.upper()}}"))),

    "q_duplicate_columns" -> ((s, d) =>
      Ops.duplicateColumns(t(s, d, "nation"), Seq("n_name" -> "nation_name"))
        .select("n_nationkey", "n_name", "nation_name")),

    "q_rename_columns" -> ((s, d) =>
      Ops.renameColumns(t(s, d, "region"), Map("r_name" -> "region_name"))),

    "q_drop_columns" -> ((s, d) =>
      Ops.dropColumns(t(s, d, "part"), Seq("p_retailprice", "p_size"))),

    "q_keep_columns" -> ((s, d) =>
      Ops.keepColumns(t(s, d, "supplier"), Seq("s_suppkey", "s_name"))),

    "q_combine_columns" -> ((s, d) =>
      Ops.combineColumns(t(s, d, "part"), "brand_type", Seq("p_brand", "p_type"), "|")
        .select("p_partkey", "brand_type")),

    "q_map_values" -> ((s, d) =>
      Ops.mapValues(t(s, d, "orders").select("o_orderkey", "o_orderstatus"),
        Seq("o_orderstatus"), Map("O" -> "OPEN", "F" -> "FULFILLED", "P" -> "PENDING"))),

    "q_date_format" -> ((s, d) =>
      Ops.dateFormat(
        t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate").cast("string").as("od")),
        Seq("od"), "%Y-%m-%d %H:%M:%S", "%d/%m/%Y")),

    "q_snake_case_columns" -> ((s, d) =>
      Ops.snakeCaseColumns(
        t(s, d, "region").withColumnsRenamed(Map("r_regionkey" -> "regionKey", "r_name" -> "regionName")))),

    // node-level features end-to-end through the REAL project lifecycle
    // (Engine.run over a YAML plan): `expect` Jinja assertions,
    // `require_rows`, `repartition`, `debug` on both a source and a
    // transformation, default-jsonl destination — the written rows read
    // back must be the identity over region (all-string render)
    "q_node_features" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-nodef")
      val yaml =
        s"""version: 2
           |config:
           |  output_dir: $dir/unused
           |sources:
           |  region:
           |    file: $d/region.parquet
           |    expect:
           |      - r_regionkey >= 0
           |    require_rows: 1
           |    repartition: 2
           |transformations:
           |  shaped:
           |    source: $$sources.region
           |    operations:
           |      - operation: keep_columns
           |        columns: [r_regionkey, r_name]
           |    require_rows: 1
           |    debug: True
           |destinations:
           |  region_out:
           |    source: $$transformations.shaped
           |""".stripMargin
      val f = dir.resolve("p.yaml")
      java.nio.file.Files.writeString(f, yaml)
      new graft.engine.Engine(s).run(f.toString, outputDir = Some(dir.resolve("o")))
      graft.engine.Sources.read(s, "node_back",
        Map("file" -> s"$dir/o/region_out.jsonl", "type" -> "jsonl"), dir)
    }),

    // casing chain through the YAML dispatch: snake -> UPPER -> lower;
    // the upper/lower legs are pure renames the oracle states directly
    "q_case_columns" -> ((s, d) => {
      val eng = new graft.engine.Engine(s)
      val base = t(s, d, "region")
        .withColumnsRenamed(Map("r_regionkey" -> "RegionKey", "r_name" -> "RegionName"))
      val snake = eng.applyOperation(base,
        Map("operation" -> "snake_case_columns"), Map.empty, "gate")
      val upper = eng.applyOperation(snake,
        Map("operation" -> "uppercase_columns"), Map.empty, "gate")
      eng.applyOperation(upper,
        Map("operation" -> "lowercase_columns"), Map.empty, "gate")
        .select("region_key", "region_name")
    }),

    // ======================================================= row operators
    "q_distinct_rows" -> ((s, d) =>
      Ops.distinctRows(t(s, d, "lineitem").select("l_returnflag", "l_linestatus"))),

    "q_filter_rows" -> ((s, d) =>
      Ops.filterRows(t(s, d, "lineitem"), "l_quantity > 45 and l_returnflag == 'R'")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")),

    "q_filter_rows_exclude" -> ((s, d) =>
      Ops.filterRows(t(s, d, "events"), "event_type == 'click' or value > 100", "exclude")
        .select("event_id", "event_type", "value")),

    "q_filter_rows_str" -> ((s, d) =>
      Ops.filterRows(t(s, d, "part"), "p_type.str.contains('MED')")
        .select("p_partkey", "p_type")),

    "q_sort_rows" -> ((s, d) =>
      Ops.limitRows(
        Ops.sortRows(t(s, d, "customer").select("c_custkey", "c_name", "c_acctbal"),
          Seq("-c_acctbal", "+c_custkey")), 20)),

    "q_limit_rows" -> ((s, d) =>
      Ops.limitRows(
        Ops.sortRows(t(s, d, "orders").select("o_orderkey", "o_totalprice"), Seq("o_orderkey")),
        5, offset = 10)),

    "q_flatten" -> ((s, d) =>
      Ops.flatten(t(s, d, "part").select("p_partkey", "p_type"),
        flattenColumn = "p_type", valueColumn = "type_word", separator = " ")),

    // ============================================== join / union / reshape
    "q_join_inner" -> ((s, d) =>
      Ops.join(t(s, d, "orders"), Seq(t(s, d, "customer")), "inner",
        leftKeys = Seq("o_custkey"), rightKeys = Seq("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")),

    "q_join_suffix" -> ((s, d) => {
      val left = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"), col("c_name").as("name"))
      val right = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"), col("s_name").as("name"))
      Ops.join(left, Seq(right), "inner", Seq("c_nationkey"), Seq("s_nationkey"))
        .select("c_custkey", "name_x", "s_suppkey", "name_y")
    }),

    "q_join_merge_key" -> ((s, d) => {
      val left = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey").as("nationkey"))
      val right = t(s, d, "nation").select(col("n_nationkey").as("nationkey"), col("n_name"))
      Ops.join(left, Seq(right), "inner", Seq("nationkey"), Seq("nationkey"))
    }),

    "q_union" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_name").as("name"), col("c_acctbal").as("acctbal"))
      val sup = t(s, d, "supplier").select(col("s_name").as("name"), col("s_acctbal").as("acctbal"))
      Ops.union(c, Seq(sup))
    }),

    // pandas fillna/dropna through the YAML ops over deterministic
    // synthesized nulls (typed constant replacement; any-null row drops)
    "q_fill_na" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"),
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")).as("value"))
      val e = new graft.engine.Engine(s)
      e.applyOperation(ev, Map("operation" -> "fill_na",
        "columns" -> Map("value" -> "-1.5")), Map.empty, "gate")
        .select(col("event_id"), round(col("value"), 4).as("value"))
    }),

    "q_drop_na" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"),
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")).as("value"),
        when(col("event_id") % 11 === 0, lit(null)).otherwise(col("event_type")).as("event_type"))
      val e = new graft.engine.Engine(s)
      e.applyOperation(ev, Map("operation" -> "drop_na",
        "columns" -> List("value", "event_type")), Map.empty, "gate")
        .select("event_id", "event_type")
    }),

    // array explode with element ordinals through the YAML op (the typed
    // sibling of flatten): word arrays from the proven split/string_split
    // parity, one row per word with its 0-based position
    "q_explode_column" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), split(col("text"), " ").as("words"))
      val e = new graft.engine.Engine(s)
      e.applyOperation(docs, Map("operation" -> "explode_column",
        "column" -> "words", "new_column" -> "word", "position_column" -> "pos"),
        Map.empty, "gate")
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
    }),

    // typed casts over stringified inputs — the schema gate does the real
    // verification (the oracle emits bigint/double/timestamp; an uncast
    // string column would fail schema_match even with equal values)
    "q_cast_columns" -> ((s, d) => {
      val strs = t(s, d, "lineitem")
        .select(col("l_orderkey").cast("string").as("okey"),
          col("l_quantity").cast("string").as("qty"),
          date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("ship"))
      val e = new graft.engine.Engine(s)
      e.applyOperation(strs, Map("operation" -> "cast_columns",
        "columns" -> Map("okey" -> "bigint", "qty" -> "double", "ship" -> "timestamp")),
        Map.empty, "gate")
        .select(col("okey"), col("qty"), unix_micros(col("ship")).as("ship_us"))
    }),

    // keyed subtraction = blocklist LEFT ANTI (duplicates on the left
    // survive — NOT the dedup EXCEPT does); source read only for its key
    "q_subtract_rows" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
      val block = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey"))
      Ops.subtractRows(li, Seq(block), Seq("l_orderkey"))
    }),

    // keyless INTERSECT ALL: multiset semantics over a projected column —
    // per-value counts are min(left, right), which a semi-join can't say
    "q_intersect_rows" -> ((s, d) => {
      val all = t(s, d, "customer").select("c_mktsegment")
      val evens = t(s, d, "customer").filter(col("c_custkey") % 2 === 0)
        .select("c_mktsegment")
      Ops.intersectRows(all, Seq(evens), Nil)
    }),

    "q_union_fill" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_name").as("name"), col("c_acctbal").as("acctbal"))
      val sup = t(s, d, "supplier").select(col("s_name").as("name"))
      Ops.union(c, Seq(sup), fillMissingColumns = true)
    }),

    "q_melt" -> ((s, d) =>
      Ops.melt(t(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment"),
        idVars = Seq("c_custkey"), varName = "melt_variable", valueName = "melt_value")),

    "q_pivot" -> ((s, d) => {
      val joined = Ops.join(t(s, d, "nation"), Seq(t(s, d, "region")), "inner",
        Seq("n_regionkey"), Seq("r_regionkey"))
      Ops.pivot(joined, rowsBy = Seq("n_name"), colsBy = "r_name", values = "n_nationkey")
    }),

    // ========================================================= aggregation
    "q_group_by" -> ((s, d) => {
      val g = Ops.groupBy(t(s, d, "lineitem"),
        Seq("l_returnflag", "l_linestatus"),
        Seq(
          "n_rows" -> "count()",
          "sum_qty" -> "sum(l_quantity)",
          "mean_qty" -> "mean(l_quantity)",
          "min_disc" -> "min(l_discount)",
          "max_tax" -> "max(l_tax)",
          "std_price" -> "std(l_extendedprice)",
          "var_price" -> "var(l_extendedprice)",
          "max_flag" -> "str_max(l_linestatus)",
        ))
      g.select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
        round(col("sum_qty"), 2).as("sum_qty"),
        round(col("mean_qty"), 4).as("mean_qty"),
        round(col("min_disc"), 2).as("min_disc"),
        round(col("max_tax"), 2).as("max_tax"),
        round(col("std_price"), 2).as("std_price"),
        round(col("var_price"), 0).as("var_price"),
        col("max_flag"))
    }),

    // agg()/json_array_agg() string concats — order made deterministic by
    // sorting the collected values (the reference relies on encounter order;
    // its own harness sorts output lines before comparing, SURVEY.md §5)
    "q_group_agg" -> ((s, d) =>
      t(s, d, "nation").groupBy(col("n_regionkey"))
        .agg(
          concat_ws(";", sort_array(collect_list(col("n_name")))).as("names"),
          concat(lit("["), concat_ws(",",
            sort_array(collect_list(col("n_nationkey").cast("string")))), lit("]")).as("keys_json"))),

    // beyond-reference EXACT quantile aggregations through the real
    // group_by `func(col,sep)` grammar (percentile_cont interpolation —
    // DuckDB quantile_cont matches bit-for-bit after rounding)
    "q_group_median" -> ((s, d) =>
      Ops.groupBy(t(s, d, "lineitem").select("l_returnflag", "l_quantity", "l_extendedprice"),
        groupByColumns = Seq("l_returnflag"),
        createColumns = Seq(
          "median_qty" -> "median(l_quantity)",
          "p90_price" -> "percentile(l_extendedprice,0.9)"))
        .select(col("l_returnflag"),
          round(col("median_qty"), 4).as("median_qty"),
          round(col("p90_price"), 4).as("p90_price"))),

    "q_group_by_with_rank" -> ((s, d) =>
      Ops.groupByWithRank(
        t(s, d, "orders").select("o_orderkey", "o_custkey"),
        groupByColumns = Seq("o_custkey"), rankColumn = "rank", orderBy = Seq("o_orderkey"))
        .withColumn("rank", col("rank").cast(LongType))),

    "q1_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))),

    // as-of join: every event enriched with the user's latest
    // at-or-before purchase — the point-in-time join Spark lacks,
    // expressed as union + per-key carry (ONE shuffle); the oracle is
    // DuckDB's NATIVE ASOF LEFT JOIN, a fully independent implementation
    "q_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      graft.functions.Joins.asofJoin(
        ev.select("event_id", "user_id", "ts"), purchases, "user_id", "ts", Seq("value"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          unix_micros(col("ts_asof").cast("timestamp")).as("purchase_ts_us"),
          round(col("value_asof"), 2).as("purchase_value"))
    }),

    // the skew-proof two-phase carry (per-(key, 6h-bucket) partial lasts,
    // per-key window over bucket ordinals only, bucket-local seeded
    // windows) must produce the IDENTICAL result to the plain per-key
    // window — the oracle is the same DuckDB native ASOF join
    "q_asof_bucketed" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      graft.functions.Joins.asofJoin(
        ev.select("event_id", "user_id", "ts"), purchases, "user_id", "ts",
        Seq("value"), bucketSecs = Some(21600.0))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          unix_micros(col("ts_asof").cast("timestamp")).as("purchase_ts_us"),
          round(col("value_asof"), 2).as("purchase_value"))
    }),

    // range join: events against per-user [early, late) halves of their
    // activity span — the interval join Spark lacks, expressed as the
    // binned equi-join rewrite (hash join on (user, bin) + exact
    // post-filter, never a nested-loop); oracle is DuckDB's plain
    // non-equi join over identical integer-arithmetic intervals
    "q_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      val bounds = ev.groupBy("user_id")
        .agg(min("ts_us").as("lo"), max("ts_us").as("hi"))
        .withColumn("mid", expr("lo + ((hi - lo) div 2)"))
      val intervals = bounds.select(col("user_id"), col("lo").as("s"),
          col("mid").as("e"), lit("early").as("phase"))
        .unionByName(bounds.select(col("user_id"), col("mid").as("s"),
          (col("hi") + 1).as("e"), lit("late").as("phase")))
      graft.functions.Joins.rangeJoin(ev, intervals,
          keys = Seq("user_id"), "ts_us", "s", "e", binWidth = 86400000000L)
        .select("event_id", "user_id", "ts_us", "phase")
    }),

    // generic per-key ordered windows through the YAML op: 4-row trailing
    // sum, previous-event value, and per-user ordinal in one pass (unique
    // (ts, event_id) order keys make every function deterministic)
    "q_window_agg" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      val e = new graft.engine.Engine(s)
      val step1 = e.applyOperation(ev, Map("operation" -> "window_agg",
        "partition_by" -> List("user_id"), "order_by" -> List("ts_us", "event_id"),
        "function" -> "sum", "column" -> "value", "new_column" -> "roll_sum",
        "rows_preceding" -> 3, "rows_following" -> 0), Map.empty, "gate")
      val step2 = e.applyOperation(step1, Map("operation" -> "window_agg",
        "partition_by" -> List("user_id"), "order_by" -> List("ts_us", "event_id"),
        "function" -> "lag", "column" -> "value", "new_column" -> "prev_value"),
        Map.empty, "gate")
      e.applyOperation(step2, Map("operation" -> "window_agg",
        "partition_by" -> List("user_id"), "order_by" -> List("ts_us", "event_id"),
        "function" -> "row_number", "new_column" -> "seq"), Map.empty, "gate")
        .select(col("event_id"), col("user_id"),
          round(col("roll_sum"), 4).as("roll_sum"),
          round(col("prev_value"), 4).as("prev_value"), col("seq"))
    }),

    // ======================================================== time / window
    "q_window_hourly" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))),

    "q_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      // ts arrives as TIMESTAMP_NTZ from parquet; NTZ has no direct cast to
      // double in Spark 4, so hop through timestamp (identity under the
      // session's UTC zone — matches the oracle's epoch(ts))
      val sec = col("ts").cast("timestamp").cast("double")
      t(s, d, "events")
        .withColumn("gap", sec - lag(sec, 1).over(w))
        .withColumn("new_session", when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // JSONPath extraction over a JSON-string column: nested object, array
    // index, and a missing path (null both sides); the JSON is synthesized
    // with identical concat in both engines so the extraction itself is
    // what's compared
    "q_json_extract" -> ((s, d) => {
      // NOTE r21: fanout here measured 0.78->0.42 s (single-row-group scan
      // serializes the 3 JSONPath parses locally) but was deliberately
      // FORGONE: PlanSpec pins this gate zero-exchange — the scale-correct
      // shape (at 100 TB the scan has many splits and an added full-row
      // exchange is pure overhead), same call as q_quality_filter /
      // q_html_to_text in the r21 text-tier fanout matrix.
      val ev = t(s, d, "events").select(col("event_id"),
        concat(lit("{\"a\": {\"b\": "), col("event_id") % 7,
          lit("}, \"tags\": [\""), col("event_type"), lit("\"]}")).as("js"))
      val e = new graft.engine.Engine(s)
      e.applyOperation(ev, Map("operation" -> "json_extract", "column" -> "js",
        "fields" -> Map("ab" -> "$.a.b", "tag0" -> "$.tags[0]", "miss" -> "$.nope")),
        Map.empty, "gate")
        .select("event_id", "ab", "tag0", "miss")
    }),

    // the all-top-level fast path: the SAME op compiles to ONE json_tuple
    // (single parse per document) instead of a get_json_object per field
    "q_json_extract_top" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"),
        concat(lit("{\"k\": "), col("event_id") % 7,
          lit(", \"tag\": \""), col("event_type"), lit("\"}")).as("js"))
      val e = new graft.engine.Engine(s)
      e.applyOperation(ev, Map("operation" -> "json_extract", "column" -> "js",
        "fields" -> Map("k" -> "$.k", "tag" -> "$.tag", "miss" -> "$.nope")),
        Map.empty, "gate")
        .select("event_id", "k", "tag", "miss")
    }),

    // grouping-set aggregation through the YAML op: ROLLUP emits the
    // (flag,status) groups plus per-flag subtotals plus the grand total
    // with NULL keys — still ONE shuffle (grouping sets expand map-side)
    "q_group_rollup" -> ((s, d) => {
      val e = new graft.engine.Engine(s)
      e.applyOperation(
        t(s, d, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity"),
        Map("operation" -> "group_by",
          "group_by_columns" -> List("l_returnflag", "l_linestatus"),
          "create_columns" -> Map("n" -> "count()", "sum_qty" -> "sum(l_quantity)"),
          "grouping" -> "rollup"), Map.empty, "gate")
    }),

    // CUBE adds the per-status margin the rollup lacks
    "q_group_cube" -> ((s, d) => {
      val e = new graft.engine.Engine(s)
      e.applyOperation(
        t(s, d, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity"),
        Map("operation" -> "group_by",
          "group_by_columns" -> List("l_returnflag", "l_linestatus"),
          "create_columns" -> Map("n" -> "count()", "sum_qty" -> "sum(l_quantity)"),
          "grouping" -> "cube"), Map.empty, "gate")
    }),

    // ranking / distribution window functions through the YAML op: rank and
    // dense_rank (= row_number under the unique order key, but exercised as
    // their own code paths), quartile ntile, percent_rank (exact small-int
    // ratio), framed first/last value
    "q_window_rank" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      val e = new graft.engine.Engine(s)
      def w(df: DataFrame, fn: String, c: String, out: String, off: Int = 1) =
        e.applyOperation(df, Map("operation" -> "window_agg",
          "partition_by" -> List("user_id"), "order_by" -> List("ts_us", "event_id"),
          "function" -> fn, "column" -> c, "new_column" -> out, "offset" -> off),
          Map.empty, "gate")
      val out = Seq[(String, String, String, Int)](
        ("rank", "", "rnk", 1), ("dense_rank", "", "drnk", 1),
        ("ntile", "", "quartile", 4), ("percent_rank", "", "prank", 1),
        ("first_value", "value", "first_v", 1), ("last_value", "value", "last_v", 1))
        .foldLeft(ev) { case (df, (fn, c, o, off)) => w(df, fn, c, o, off) }
      out.select(col("event_id"), col("user_id"), col("rnk"), col("drnk"),
        col("quartile"), round(col("prank"), 6).as("prank"),
        round(col("first_v"), 4).as("first_v"), round(col("last_v"), 4).as("last_v"))
    }),

    // fixed-interval resampling with gap fill through the YAML op: per-user
    // 1-hour buckets, grid generated per key with sequence() on the
    // executors, empty buckets appear with count 0 / null sum
    "q_resample" -> ((s, d) => {
      val e = new graft.engine.Engine(s)
      e.applyOperation(t(s, d, "events").select("user_id", "ts", "value"),
        Map("operation" -> "resample", "time_column" -> "ts",
          "partition_by" -> List("user_id"), "interval" -> "1 hour",
          "aggregations" -> Map("n" -> "count()", "sv" -> "sum(value)")),
        Map.empty, "gate")
        .select(col("user_id"), unix_micros(col("bucket")).as("bucket_us"),
          col("n"), round(col("sv"), 2).as("sum_value"))
    }),

    // per-key forward fill in event order (pandas groupby().ffill());
    // nulls synthesized deterministically on event_id%7, leading nulls stay
    "q_fill_forward" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")).as("value"))
      val e = new graft.engine.Engine(s)
      e.applyOperation(ev, Map("operation" -> "fill_forward",
        "columns" -> List("value"), "partition_by" -> List("user_id"),
        "order_by" -> List("ts_us", "event_id")), Map.empty, "gate")
        .select(col("event_id"), col("user_id"),
          round(col("value"), 4).as("value_filled"))
    }),

    // trailing TIME-range window (the "sum of the last hour" feature a
    // ROWS frame cannot express): RANGE frame over epoch micros, SQL peer
    // semantics on ties — exactly DuckDB's RANGE BETWEEN
    "q_time_window_agg" -> ((s, d) => {
      val e = new graft.engine.Engine(s)
      e.applyOperation(t(s, d, "events").select("event_id", "user_id", "ts", "value"),
        Map("operation" -> "time_window_agg", "partition_by" -> List("user_id"),
          "time_column" -> "ts", "function" -> "sum", "column" -> "value",
          "new_column" -> "hr_sum", "trailing" -> "1 hour"), Map.empty, "gate")
        .select(col("event_id"), col("user_id"), round(col("hr_sum"), 2).as("hr_sum"))
    }),

    // linear time-interpolation of nulls per key (pandas interpolate
    // method='time'): nulls synthesized on event_id%5; edge nulls stay null;
    // the arithmetic is fixed-shape IEEE double ops so Spark and DuckDB
    // produce bit-identical values (rounded to 4 anyway)
    "q_interpolate" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")).as("value"))
      val e = new graft.engine.Engine(s)
      e.applyOperation(ev, Map("operation" -> "interpolate", "column" -> "value",
        "time_column" -> "ts", "partition_by" -> List("user_id"),
        "tie_break" -> List("event_id"), "new_column" -> "value_interp"),
        Map.empty, "gate")
        .select(col("event_id"), col("user_id"),
          round(col("value_interp"), 4).as("value_interp"))
    }),

    // ======================================================== text analysis
    // word stats come from one kernel pass; token count and fingerprint
    // stay native codegen'd expressions
    "q_text_stats" -> ((s, d) =>
      TF.withWordStats(t(s, d, "documents").select("doc_id", "text"), "text",
          Seq("the", "a", "of", "and", "to"))
        .select(
          col("doc_id"),
          col("n_words"),
          col("n_tokens"),
          round(col("avg_word_len"), 4).as("avg_word_len"),
          round(col("stopword_ratio"), 4).as("stopword_ratio"),
          TF.fingerprint(col("text")).as("fingerprint"))),

    "q_lang_id" -> ((s, d) =>
      TF.withLangId(t(s, d, "documents").select("doc_id", "text"), "text")
        .select("doc_id", "lang_pred")),

    // corpus-TRAINED language ID (rank-profile n-gram classifier,
    // Cavnar-Trenkle-style, all-integer): language markers are appended
    // deterministically per the stored label (the raw synthetic text
    // carries no real language signal — the same synthesize-the-signal
    // construction as q_pii_redact), profiles train on the doc_id%5==0
    // seed slice, and EVERY row is scored by the fused LangScore
    // expression; the oracle rebuilds training AND scoring in SQL
    // trained Naive Bayes classification (integer-quantized — bitLength
    // weights over md5-hex3 token buckets): seed = docs with doc_id%5==0
    // labeled by lang (marker words appended so the signal exists), every
    // doc predicted; the oracle rebuilds TRAINING AND SCORING in SQL
    // (floor(log2(x))+1 = bitLength, substr(md5(tok),1,3) = the bucket)
    "q_nb_classify" -> ((s, d) => {
      val marker = when(col("lang") === "en", lit(" the and of to is it"))
        .when(col("lang") === "fr", lit(" le la et les des une est"))
        .when(col("lang") === "es", lit(" el los las una es y"))
        .when(col("lang") === "de", lit(" der die das und ist ein"))
        .otherwise(lit(" 的 是 了 在 和 有"))
      val built = t(s, d, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0, col("lang")).as("label"),
        concat(col("text"), marker, marker, marker).as("text"))
      new graft.engine.Engine(s).applyOperation(built,
        Map("operation" -> "nb_classify", "column" -> "text",
          "label_column" -> "label"), Map.empty, "gate")
        .select("doc_id", "label_pred")
    }),

    // router-quality measurement: NB trained on the doc_id%5==0 seed band,
    // evaluated on the HELD-OUT band (truth = lang) — per-label confusion
    // counts + ppm precision/recall, all-integer so the oracle is exact
    "q_model_eval" -> ((s, d) => {
      val marker = when(col("lang") === "en", lit(" the and of to is it"))
        .when(col("lang") === "fr", lit(" le la et les des une est"))
        .when(col("lang") === "es", lit(" el los las una es y"))
        .when(col("lang") === "de", lit(" der die das und ist ein"))
        .otherwise(lit(" 的 是 了 在 和 有"))
      val built = t(s, d, "documents").select(col("doc_id"), col("lang"),
        when(col("doc_id") % 5 === 0, col("lang")).as("label"),
        concat(col("text"), marker, marker, marker).as("text"))
      val eng = new graft.engine.Engine(s)
      val scored = eng.applyOperation(built,
        Map("operation" -> "nb_classify", "column" -> "text",
          "label_column" -> "label"), Map.empty, "gate")
      eng.applyOperation(scored.filter(col("doc_id") % 5 =!= 0),
        Map("operation" -> "model_eval", "label_column" -> "lang",
          "predicted_column" -> "label_pred"), Map.empty, "gate")
    }),

    "q_lang_id_trained" -> ((s, d) => {
      val marker = when(col("lang") === "en", lit(" the and of to is it"))
        .when(col("lang") === "fr", lit(" le la et les des une est"))
        .when(col("lang") === "es", lit(" el los las una es y"))
        .when(col("lang") === "de", lit(" der die das und ist ein"))
        .otherwise(lit(" 的 是 了 在 和 有"))
      val built = fanout(t(s, d, "documents")).select(col("doc_id"), col("lang"),
        concat(col("text"), marker, marker, marker).as("text"))
      val profiles = graft.functions.LangId.trainProfiles(
        built.filter(col("doc_id") % 5 === 0), "lang", "text", topK = 300)
      graft.functions.LangId.withPrediction(built, "text", profiles, topK = 300)
        .select("doc_id", "lang_pred")
    }),

    "q_quality" -> ((s, d) =>
      fanout(t(s, d, "documents")).select(
        col("doc_id"),
        TF.qualityScore(col("text"), Seq("the", "a", "of", "and", "to")).as("quality"),
        round(TF.punctRatio(col("text")), 4).as("punct_ratio"))),

    // crawl extraction: wrap each doc in synthetic HTML (both sides build
    // the identical page) then strip it back to text — byte-exact oracle
    "q_html_to_text" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TF.htmlToText(concat(
          lit("<html><head><title>t</title><script>var x=1;</script></head><body><p>"),
          col("text"),
          lit("</p><!-- c --><div>footer&amp;end</div></body></html>")))
          .as("text"))),

    // C4-rule line cleaning: exact string/integer predicates, so the
    // oracle reproduces clean_text byte-for-byte (min_line_words lowered
    // so the synthetic docs split across the gates)
    "q_c4_clean" -> ((s, d) =>
      TF.withC4Clean(t(s, d, "documents").select("doc_id", "text"),
          "text", minLineWords = 3, minLines = 1)
        .select("doc_id", "clean_text", "n_kept_lines", "c4_keep")),

    // Gopher-rule stats + keep flag; every threshold is integer-math so
    // the oracle reproduces the booleans exactly (min_words lowered to 10
    // so the synthetic docs split across the gates)
    "q_quality_filter" -> ((s, d) =>
      TF.withGopherQuality(t(s, d, "documents").select("doc_id", "text"),
          "text", minWords = 10)
        .select("doc_id", "n_words", "total_word_len", "n_alpha_words",
          "n_symbols", "n_lines", "n_bullet_lines", "n_ellipsis_lines",
          "stop_hits", "gopher_keep")),

    // ========================================================== dedup ops
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(t(s, d, "documents"), "doc_id", "text")),

    // exact substring dedup (Lee et al. 2021): flagged duplicate 10-token
    // window occurrences — every occurrence whose window content appeared
    // earlier in the corpus under (doc_id, pos) order
    "q_dedup_spans" -> ((s, d) =>
      Dedup.duplicateSpans(t(s, d, "documents"), "doc_id", "text", windowTokens = 10)
        .select(col("id").as("doc_id"), col("pos"))),

    // the removal pass over the same flags: repeated spans deleted, first
    // occurrence kept verbatim, untouched docs ride through byte-identical
    "q_dedup_substring" -> ((s, d) =>
      Dedup.stripDuplicateSpans(t(s, d, "documents"), "doc_id", "text", windowTokens = 10)
        .select("doc_id", "text")),

    // exact paragraph dedup (Gopher/MassiveText): flagged occurrences of
    // paragraphs whose content appeared earlier in (doc_id, position)
    // order; whitespace-only paragraphs never flag. The testdata documents
    // are single-paragraph with no exact text dups (zero natural flags),
    // so the gate appends a shared footer paragraph to every doc — the
    // cross-document boilerplate shape the op exists for — and expects the
    // footer flagged everywhere but its first (smallest-doc_id) occurrence.
    "q_dedup_paragraphs" -> ((s, d) =>
      Dedup.duplicateParagraphs(
        t(s, d, "documents")
          .withColumn("text", concat_ws("\n", col("text"), lit("subscribe to our newsletter"))),
        "doc_id", "text")
        .select(col("id").as("doc_id"), col("pos"))),

    // the removal pass over the same footer-augmented frame: every doc but
    // the first drops the footer and returns to its original body
    "q_dedup_par_strip" -> ((s, d) =>
      Dedup.stripDuplicateParagraphs(
        t(s, d, "documents")
          .withColumn("text", concat_ws("\n", col("text"), lit("subscribe to our newsletter"))),
        "doc_id", "text")
        .select("doc_id", "text")),

    // maxDocFreq exercises the stop-token skew guard on the gate path (the
    // oracle applies the same document-frequency cap)
    "q_dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text", threshold = 0.7,
        maxDocFreq = Some(1000L))),

    // oracle = the exact ≥0.7 Jaccard pair set (LSH recall is 1.0 here and
    // the verify step is exact — see the oracleSql comment); the signature
    // internals stay spec-checked in FunctionsSpec
    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashLshPairs(fanout(t(s, d, "documents")), "doc_id", "text", threshold = 0.7)),

    // oracle: signatures dumped as literals (SimhashSigs) + brute-force
    // hamming in DuckDB — verifies the band join found EVERY hamming≤3 pair
    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(fanout(t(s, d, "documents")), "doc_id", "text", maxHamming = 3)),

    "q_dedup_embedding" -> ((s, d) =>
      Similarity.cosinePairsBlocked(t(s, d, "embeddings"), "vec_id", "embedding", threshold = 0.42)),

    // SemDeDup: 16 deterministic seed cells (iters=0 — the oracle
    // recomputes the identical assignment in SQL, the q_ann_ivf pattern),
    // within-cell upper-triangular cosine prune. The k-means-refined path
    // (iters ≥ 2) is spec-checked in FunctionsSpec.
    // k-means cell assignment through the YAML op at iters=0 (seed
    // centroids = smallest-id vectors — the SQL-replicable configuration;
    // Lloyd refinement is spec-covered: objective strictly decreases)
    "q_cluster_assign" -> ((s, d) => {
      val e = new graft.engine.Engine(s)
      e.applyOperation(t(s, d, "embeddings").select("vec_id", "embedding"),
        Map("operation" -> "cluster_assign", "id_column" -> "vec_id",
          "column" -> "embedding", "nlist" -> 16, "iters" -> 0),
        Map.empty, "gate")
        .select(col("vec_id").as("id"), col("cell"))
    }),

    "q_semantic_dedup" -> ((s, d) =>
      Similarity.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.42, nlist = 16, iters = 0)),

    // pairs → canonical duplicate groups (hash-min connected components)
    "q_dedup_groups" -> ((s, d) => {
      val docs = fanout(t(s, d, "documents"))
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.7,
        maxDocFreq = Some(1000L))
      Dedup.connectedComponents(docs.select("doc_id"), "doc_id", pairs)
    }),

    // END-TO-END near-dup removal through the YAML `dedup_near` operation
    // dispatch itself (Engine.applyOperation) — the keep-set a declared
    // pipeline produces, oracle-checked: pairs → CC → representatives
    // incremental (daily-ingest) dedup: batch = doc_id % 5 == 0, corpus =
    // the rest; a batch doc survives unless it near-matches any corpus doc
    // or an earlier batch doc — one delta pass, no corpus self-pairing
    "q_dedup_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.dedupNearIncremental(
        docs.filter(col("doc_id") % 5 === 0),
        docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", threshold = 0.7, maxDocFreq = Some(1000L))
        .select("doc_id")
    }),

    // same keep set via the precomputed shingleIndex path (corpus shingled
    // once — the production daily-ingest shape); oracle identical by design
    "q_dedup_incr_indexed" -> ((s, d) => {
      val docs = fanout(t(s, d, "documents"))
      val index = Dedup.shingleIndex(docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
      Dedup.dedupNearIncrementalIndexed(
        docs.filter(col("doc_id") % 5 === 0), index,
        "doc_id", "text", threshold = 0.7, maxDocFreq = Some(1000L))
        .select("doc_id")
    }),

    // the streaming incremental-ingest face END-TO-END: two real
    // micro-batches (a parquet file source appended between
    // processAllAvailable calls) through foreachBatch against the
    // persisted shingle index; the final keep-set across both batch
    // partitions must equal the two-stage batch semantics the oracle
    // rebuilds in SQL (stage 1 dedups delta1 within itself; stage 2
    // dedups delta2 against stage 1's SURVIVOR index and within itself)
    "q_stream_ingest_text" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-si-text")
      // capped at 2000 docs: this gate exercises the STREAMING machinery
      // (batch stamping, index exclusion, replay discipline) end-to-end;
      // the near-dedup data path itself is separately gated AND benched at
      // full scale by q_dedup_incremental / q_dedup_incr_indexed
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 2000)
      // delta-1 fans out to one file per core: all files exist before the
      // stream starts (batch stamping unchanged) and micro-batch 1's
      // shingle pass parallelizes instead of inheriting 1 scan partition
      docs.filter(col("doc_id") % 5 =!= 0).transform(fanout).write.parquet(s"$dir/src")
      val src = s.readStream.schema(docs.schema).parquet(s"$dir/src")
      // delta 2 lands as ONE file (coalesce(1)): a trigger firing
      // mid-append would otherwise split the delta across two
      // micro-batches (the file listing races a multi-part write),
      // shifting batch stamps and the within-delta dedup scope — a single
      // task commit renames one file into place atomically. The
      // restart-on-checkpoint recovery path is gate-exercised by
      // q_stream_ingest_doc and spec-exercised in StreamsSpec.
      val q = graft.streaming.Streams.incrementalDedupIngest(src, "doc_id", "text",
        s"$dir/index", s"$dir/out", threshold = 0.7, checkpointDir = s"$dir/ckpt")
      try {
        q.processAllAvailable()
        docs.filter(col("doc_id") % 5 === 0).coalesce(1)
          .write.mode("append").parquet(s"$dir/src")
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(s"$dir/out")
        .select(col("doc_id"), col("batch").cast("long").as("batch"))
    }),

    // DOCUMENT face: the same two text deltas as q_stream_ingest_text but
    // arriving as document BYTES — delta 1 rendered as RTF, delta 2 as
    // DOCX. doc_text extraction canonicalizes across formats, so the
    // survivor sets must equal the pure-text face's exactly (the text
    // oracle re-bounded to this gate's slice): a docx re-render of an
    // rtf-ingested document near-dedups. 1000 docs — the streaming and
    // extraction machinery is what this gate exercises; the dedup data
    // path is benched at full scale by the text face and q_dedup_incr_*
    "q_stream_ingest_doc" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-si-doc")
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 1000)
      // render ON EXECUTORS, fanned out: the former driver loop serialized
      // 800 RTF + 200 DOCX renders (collect + one temp file each) on one
      // core; per-row rendering is pure, so distributing it is
      // byte-identical and ~core-count faster
      import s.implicits._
      def render(df: DataFrame, fmt: String): DataFrame = df.transform(fanout)
        .as[(Long, String)].mapPartitions(_.map { case (id, text) =>
          val f = java.nio.file.Files.createTempFile("graft-sid", "." + fmt)
          if (fmt == "rtf") graft.engine.Rtf.write(f, Seq(text))
          else graft.engine.Docx.writeDocx(f, Seq(text))
          val b = java.nio.file.Files.readAllBytes(f)
          java.nio.file.Files.delete(f)
          (id, b)
        }).toDF("doc_id", "content")
      render(docs.filter(col("doc_id") % 5 =!= 0), "rtf")
        .write.parquet(s"$dir/src")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType)))
      val src = s.readStream.schema(schema).parquet(s"$dir/src")
      // THIS gate keeps one query run per delta, restarting on the same
      // checkpoint: recovery stays exercised end-to-end in a gate (the
      // sibling ingest gates use atomic single-file appends instead — see
      // q_stream_ingest_text — to keep their wall time at one startup)
      def run() = graft.streaming.Streams.incrementalDocDedupIngest(src, "doc_id", "content",
        s"$dir/index", s"$dir/out", threshold = 0.7, checkpointDir = s"$dir/ckpt")
      val q = run()
      try q.processAllAvailable() finally q.stop()
      render(docs.filter(col("doc_id") % 5 === 0), "docx")
        .write.mode("append").parquet(s"$dir/src")
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()
      s.read.parquet(s"$dir/out")
        .select(col("doc_id"), col("batch").cast("long").as("batch"))
    }),

    // IMAGE face: delta 1 = 200 distinct pHash groups; delta 2 = 10 novel
    // groups (kept) + 40 perturbed near-dups of delta-1 groups (dropped
    // via the persisted signature index) — keep-set closed-form in doc_id
    "q_stream_ingest_image" -> ((s, d) => {
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-si-img")
      val ids = t(s, d, "documents").select(col("doc_id"))
      def fx(df: DataFrame) = df.transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenImages.dedupFixture(id))))
        .toDF("media_id", "content")
      fx(ids.filter(col("doc_id") < 200)).write.parquet(s"$dir/src")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType)))
      val src = s.readStream.schema(schema).parquet(s"$dir/src")
      // single-file delta-2 append: atomic to the poller's listing (see
      // q_stream_ingest_text). repartition(1), NOT coalesce(1): coalesce
      // propagates up through the synthesis mapPartitions and serializes
      // the fixture encode onto one task — repartition keeps the encode on
      // the fanned-out stage and only moves the finished bytes (a few MB)
      // to the single writer task (guide §8: decide/move small, synthesize
      // heavy bytes in parallel). Same one-file atomic-rename commit.
      val q = graft.streaming.Streams.incrementalImageDedupIngest(src,
        "media_id", "content", s"$dir/index", s"$dir/out", maxHamming = 3,
        checkpointDir = s"$dir/ckpt")
      try {
        q.processAllAvailable()
        fx(ids.filter(col("doc_id") >= 240 && col("doc_id") < 290)).repartition(1)
          .write.mode("append").parquet(s"$dir/src")
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(s"$dir/out")
        .select(col("media_id"), col("batch").cast("long").as("batch"))
    }),

    // VIDEO face (9th ingest face): the persisted index is MULTI-ROW
    // (id, fidx, sig) and the match is the both-sides distinct-frame
    // VOTE. Delta 1 = 100 distinct bases across the 4-container rotation
    // (all kept); delta 2 = 50 cross-container re-encodes of indexed
    // bases (dropped via the frame index), 10 novel videos (kept), and
    // 10 same-content container twins of the novel ones (dropped
    // within-batch, min id wins) — keep-set closed-form in doc_id
    "q_stream_ingest_video" -> ((s, d) => {
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-si-vid")
      val ids = t(s, d, "documents").select(col("doc_id"))
      def payload(id: Long): Array[Byte] =
        if (id < 200) graft.tools.GenMedia.videoDedupFixture(id)
        else if (id < 300) graft.functions.MediaKernels.encodeMjpegAvi(48, 48, 40000L,
          (0 until 4).map(k => graft.tools.GenMedia.videoFrameJpeg(id, k)))
        else graft.functions.MediaKernels.encodeJpegMp4(48, 48,
          (0 until 4).map(k => graft.tools.GenMedia.videoFrameJpeg(id - 100, k)))
      def fx(df: DataFrame) = df.transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, payload(id))))
        .toDF("media_id", "content")
      fx(ids.filter(col("doc_id") < 100)).write.parquet(s"$dir/src")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType)))
      val src = s.readStream.schema(schema).parquet(s"$dir/src")
      val q = graft.streaming.Streams.incrementalVideoDedupIngest(src,
        "media_id", "content", s"$dir/index", s"$dir/out", maxHamming = 3,
        maxFrames = 4, minMatches = 2, checkpointDir = s"$dir/ckpt")
      try {
        q.processAllAvailable()
        // single-file delta-2 append: atomic to the poller's listing
        fx(ids.filter(
          (col("doc_id") >= 100 && col("doc_id") < 150) ||
            (col("doc_id") >= 200 && col("doc_id") < 210) ||
            (col("doc_id") >= 300 && col("doc_id") < 310))).repartition(1)
          .write.mode("append").parquet(s"$dir/src")
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(s"$dir/out")
        .select(col("media_id"), col("batch").cast("long").as("batch"))
    }),

    // AUDIO face: same delta shape over the WAV/FLAC cross-container
    // fingerprint fixtures (id%250 keys the recording; ids >= 250 are the
    // double-amplitude re-encodes whose fingerprints collide exactly)
    "q_stream_ingest_audio" -> ((s, d) => {
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-si-aud")
      val ids = t(s, d, "documents").select(col("doc_id"))
      def fx(df: DataFrame) = df.transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.audioDedupFixture(id))))
        .toDF("media_id", "content")
      fx(ids.filter(col("doc_id") < 200)).write.parquet(s"$dir/src")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType)))
      val src = s.readStream.schema(schema).parquet(s"$dir/src")
      // single-file delta-2 append: atomic to the poller's listing (see
      // q_stream_ingest_text)
      val q = graft.streaming.Streams.incrementalAudioDedupIngest(src,
        "media_id", "content", s"$dir/index", s"$dir/out", maxHamming = 0,
        checkpointDir = s"$dir/ckpt")
      try {
        q.processAllAvailable()
        fx(ids.filter(col("doc_id") >= 240 && col("doc_id") < 290)).repartition(1)
          .write.mode("append").parquet(s"$dir/src")
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(s"$dir/out")
        .select(col("media_id"), col("batch").cast("long").as("batch"))
    }),

    // the LOSSY streaming face: the same delta-vs-index discipline over
    // the spectral fingerprint — batch 1's ids >= 250 are lossy Vorbis /
    // half-amplitude copies of indexed recordings (6-container rotation:
    // WAV/FLAC/Ogg-Vorbis/MKV-Vorbis/G.711-.au/Ogg-Vorbis-floor-0) and
    // must drop within hamming 7; 240..249 are new bases and survive
    "q_stream_ingest_audio_lossy" -> ((s, d) => {
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-si-audl")
      val ids = t(s, d, "documents").select(col("doc_id"))
      def fx(df: DataFrame) = df.transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.lossyAudioDedupFixture(id))))
        .toDF("media_id", "content")
      fx(ids.filter(col("doc_id") < 200)).write.parquet(s"$dir/src")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType)))
      val src = s.readStream.schema(schema).parquet(s"$dir/src")
      val q = graft.streaming.Streams.incrementalAudioDedupIngest(src,
        "media_id", "content", s"$dir/index", s"$dir/out", maxHamming = 7,
        checkpointDir = s"$dir/ckpt",
        fingerprint = "audio_fingerprint_spectral")
      try {
        q.processAllAvailable()
        fx(ids.filter(col("doc_id") >= 240 && col("doc_id") < 290)).repartition(1)
          .write.mode("append").parquet(s"$dir/src")
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(s"$dir/out")
        .select(col("media_id"), col("batch").cast("long").as("batch"))
    }),

    "q_dedup_near" -> ((s, d) => {
      val docs = t(s, d, "documents")
      new graft.engine.Engine(s).applyOperation(docs,
        Map("operation" -> "dedup_near", "id_column" -> "doc_id", "column" -> "text",
          "method" -> "jaccard", "threshold" -> "0.7", "max_doc_freq" -> "1000"),
        Map.empty, "gate").select("doc_id")
    }),

    // deterministic content-hash sampling (reproducible corpus slicing)
    "q_sample" -> ((s, d) =>
      graft.functions.Sampling.hashSample(
        t(s, d, "documents").select("doc_id", "text"), "text", 0.2)),

    // exact-size deterministic uniform sample through the YAML op:
    // the 120 smallest md5 draws, TakeOrderedAndProject (never a global
    // sort); composes with hash_sample (same draw)
    "q_sample_exact" -> ((s, d) => {
      val e = new graft.engine.Engine(s)
      e.applyOperation(t(s, d, "documents").select("doc_id", "source"),
        Map("operation" -> "sample_rows", "column" -> "doc_id", "count" -> 120),
        Map.empty, "gate")
    }),

    "q_sample_stratified" -> ((s, d) => {
      val docs = TF.withLangId(t(s, d, "documents").select("doc_id", "text"), "text")
      graft.functions.Sampling.stratifiedHashSample(docs, "text", "lang_pred",
        Map("en" -> 0.5), defaultRate = 0.1)
    }),

    // per-domain cap: ≤10 docs per source in deterministic md5(id) order —
    // two-stage salted top-k, no single-task giant-domain window
    "q_domain_cap" -> ((s, d) =>
      graft.functions.Sampling.capPerGroup(
        t(s, d, "documents").select("doc_id", "source"), "source", "doc_id", k = 10)),

    // mixture rebalance: largest subset matching 0.5/0.3/0.2 over three
    // sources without upsampling (binding stratum kept whole — the rate-1.0
    // "g" threshold edge is live here)
    "q_rebalance" -> ((s, d) =>
      graft.functions.Sampling.rebalanceToMixture(
        t(s, d, "documents").select("doc_id", "text", "source"), "source", "text",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .select("doc_id", "source")),

    // token-budget cut: docs admitted in md5(doc_id) order until the
    // cumulative token count reaches the budget — bucketed two-phase prefix
    // sum, never a global single-partition window (oracle mirrors the
    // cumulative window in one pass, same (md5, id) order)
    "q_token_budget" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
        .withColumn("n_tokens", TF.tokenCount(col("text")))
      graft.functions.Sampling.tokenBudgetSample(docs, "doc_id", "n_tokens", budget = 20000L)
        .select("doc_id", "n_tokens")
    }),

    // trained-BPE token counts through the YAML op (merges induced inline
    // from the corpus — Sennrich 2016); the oracle re-implements the
    // greedy encode as a recursive CTE over the gate-scale merge table
    "q_bpe_count" -> ((s, d) =>
      new graft.engine.Engine(s).applyOperation(
        t(s, d, "documents").select("doc_id", "text"),
        Map("operation" -> "bpe_token_count", "column" -> "text",
          "num_merges" -> 60, "max_word_types" -> 10000),
        Map.empty, "gate")
        .select("doc_id", "bpe_tokens")),

    // token-budget cut re-gated on EXACT trained-BPE counts (not the
    // regex heuristic): same bucketed two-phase prefix sum, the budget
    // now counts model tokens
    "q_bpe_budget" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val merges = graft.functions.Bpe.train(docs, "text", numMerges = 60,
        maxWordTypes = 10000)
      val counted = graft.functions.Bpe.withTokenCount(docs, "text", merges)
      graft.functions.Sampling.tokenBudgetSample(counted, "doc_id", "bpe_tokens",
        budget = 10000L)
        .select("doc_id", "bpe_tokens")
    }),

    // FIXED-vocab token accounting: production pipelines budget tokens
    // against a FROZEN tokenizer model file, not a corpus-trained one.
    // The gate writes a fixed 60-merge model (the same table the
    // q_bpe_count oracle embeds) in the community merges.txt shape
    // (#version header + space-separated pairs), loads it through the
    // YAML op's merges_file path at BYTE level (== char level on this
    // ASCII corpus; multibyte semantics are BpeSpec-pinned), and composes
    // token_budget on the resulting counts
    "q_token_count_vocab" -> ((s, d) => {
      val merges: Seq[(String, String)] = Seq(
        ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
        ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
        ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
        ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
        ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
        ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
        ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
        ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
        ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"),
        ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
        ("e", "ctor"), ("or", "der"), ("v", "ector"), ("in", "e"),
        ("l", "ine"), ("a", "b"), ("ab", "l"), ("abl", "e"), ("at", "a"),
        ("d", "ata"), ("t", "able"), ("u", "p"), ("a", "g"), ("ag", "g"),
        ("a", "lu"))
      val f = java.nio.file.Files.createTempDirectory("graft-vocab")
        .resolve("merges.txt")
      java.nio.file.Files.write(f, ("#version: fixed-0.1\n" +
        merges.map { case (l, r) => s"$l $r" }.mkString("\n") + "\n")
        .getBytes("UTF-8"))
      val counted = new graft.engine.Engine(s).applyOperation(
        t(s, d, "documents").select("doc_id", "text"),
        Map("operation" -> "bpe_token_count", "column" -> "text",
          "merges_file" -> f.toString, "byte_level" -> true),
        Map.empty, "gate")
      graft.functions.Sampling.tokenBudgetSample(counted, "doc_id", "bpe_tokens",
        budget = 15000L)
        .select("doc_id", "bpe_tokens")
    }),

    // URL canonicalization: messy synthesized URLs (uppercase authority,
    // default port, tracking params, fragments, trailing slashes) through
    // normalizeUrl + urlDomain; the oracle applies the identical documented
    // rule chain in RE2
    "q_url_normalize" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "source")
      val url = concat(
        lit("HTTP://WWW."), upper(col("source")), lit(".Example.COM:80/Docs/"),
        col("doc_id").cast("string"), lit("/"),
        when(col("doc_id") % 3 === 0,
          concat(lit("?utm_source=feed&page="), (col("doc_id") % 7).cast("string"),
            lit("&gclid=XYZ#sec"))).otherwise(lit("")))
      docs.withColumn("url", url)
        .select(col("doc_id"),
          graft.functions.Corpus.normalizeUrl(col("url")).as("url_norm"),
          graft.functions.Corpus.urlDomain(col("url")).as("domain"))
    }),

    // leakage-safe split labeling through the real YAML-op dispatch:
    // md5-band assignment over doc_id (binary-exact 0.25/0.5/0.25 weights
    // so both engines compute identical thresholds)
    "q_assign_split" -> ((s, d) =>
      new graft.engine.Engine(s).applyOperation(
        t(s, d, "documents").select("doc_id"),
        Map("operation" -> "assign_split", "key_column" -> "doc_id",
          "weights" -> Map("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)),
        Map.empty, "gate")),

    // LM-rarity quality signal: corpus-induced trigram model, integer-exact
    // mean inverse frequency — the CCNet perplexity screening role without
    // a shipped model; oracle rebuilds the identical LM in SQL
    "q_trigram_rarity" -> ((s, d) =>
      graft.functions.Corpus.withTrigramRarity(
        t(s, d, "documents").select("doc_id", "text"), "doc_id", "text")
        .select("doc_id", "rarity_sum", "n_trigrams", "rarity")),

    // Unicode normalization: decomposed accents + fullwidth digits +
    // control chars synthesized per row; NFC + control-strip + whitespace
    // collapse must match DuckDB's nfc_normalize + the same regex chain
    "q_text_normalize" -> ((s, d) => {
      val messy = concat(col("text"),
        lit("  cafe"), lit("\u0301"), lit(" "), col("doc_id").cast("string"),
        lit("\tx"), lit("\u0007"), lit("  end"))
      val built = t(s, d, "documents").select(col("doc_id"), messy.as("text"))
      new graft.engine.Engine(s).applyOperation(built,
        Map("operation" -> "text_normalize", "column" -> "text"),
        Map.empty, "gate")
        .select("doc_id", "text")
    }),

    // rule-based sentence splitting (RE2-subset rule both sides): terminal
    // punctuation synthesized per row, dense 0-based ordinals
    "q_sentence_split" -> ((s, d) => {
      val built = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"), lit(". second part! third? trailing fragment"))
          .as("text"))
      new graft.engine.Engine(s).applyOperation(built,
        Map("operation" -> "sentence_split", "id_column" -> "doc_id",
          "column" -> "text"), Map.empty, "gate")
    }),

    // blocklist curation through the real YAML-op dispatch: drop documents
    // whose registrable domain (or any parent) is listed — UT1-style
    // domain filtering, the standard crawl exclusion pass
    "q_domain_filter" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "source")
        .withColumn("url", concat(lit("http://www."), col("source"),
          lit(".example.com/p/"), col("doc_id").cast("string")))
      new graft.engine.Engine(s).applyOperation(docs,
        Map("operation" -> "domain_filter", "column" -> "url",
          "domains" -> List("src0.example.com", "src3.example.com")),
        Map.empty, "gate")
        .select("doc_id")
    }),

    // URL-dedup composite: canonicalize then keep the smallest doc_id per
    // canonical URL — the first dedup stage of a crawl pipeline (different
    // tracking params / ports / case map to one fetch). Synthesis folds
    // doc_id pairs onto the same canonical URL so real collapses occur.
    "q_dedup_url" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "source")
      val url = concat(
        lit("HTTP://WWW."), upper(col("source")), lit(".Example.COM:80/Docs/"),
        (col("doc_id") / 2).cast("long").cast("string"),
        when(col("doc_id") % 2 === 0, lit("?utm_source=feed")).otherwise(lit("")))
      docs.withColumn("url_norm", graft.functions.Corpus.normalizeUrl(url))
        .groupBy("url_norm")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_fetches"))
    }),

    // sequence packing: documents → ≈4k-token training contexts in
    // deterministic md5(doc_id) stream order; split-free greedy (context
    // may overflow by its last doc), context_id verifiable by the oracle's
    // window cumsum
    "q_pack_contexts" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
        .withColumn("n_tokens", TF.tokenCount(col("text")))
      graft.functions.Sampling.packContexts(docs, "doc_id", "n_tokens", contextTokens = 4096L)
        .select("doc_id", "n_tokens", "context_id")
    }),

    // grouped packing: contexts never cross a language boundary — the
    // multilingual pipeline rule; context_id is group-local, verified by a
    // PARTITION BY window oracle
    "q_pack_by_lang" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "lang", "text")
        .withColumn("n_tokens", TF.tokenCount(col("text")))
      graft.functions.Sampling.packContextsBy(
        docs, "lang", "doc_id", "n_tokens", contextTokens = 4096L)
        .select("doc_id", "lang", "n_tokens", "context_id")
    }),

    // materialized packing: the concatenated per-context training samples,
    // members joined in stream order — the hash compare verifies the exact
    // concatenation order, not just membership
    "q_pack_text" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
        .withColumn("n_tokens", TF.tokenCount(col("text")))
      graft.functions.Sampling.packContextsText(
        docs, "doc_id", "text", "n_tokens", contextTokens = 4096L)
        .select("context_id", "text", "n_tokens", "n_docs")
    }),

    // deterministic corpus shuffle: stable global permutation ordinal in
    // md5(doc_id) order — the ordinal makes the ORDER verifiable by the
    // hash compare, not just the membership
    "q_shuffle" -> ((s, d) =>
      graft.functions.Sampling.hashShuffle(
        t(s, d, "documents").select("doc_id"), "doc_id")),

    // ==================================================== similarity search
    "q_ann_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Similarity.bruteForceTopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, 10)
    }),

    // int8 symmetric quantization (4× less scan bandwidth at 100 TB) +
    // exact rerank of the top-50 approximate candidates; all candidate
    // arithmetic is integer-valued doubles so the oracle reproduces the
    // candidate set bit-for-bit
    "q_ann_quantized" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Similarity.quantizedTopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        q, 10, rerank = 50)
    }),

    "q_ann_lsh" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Similarity.lshTopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, 10, numPlanes = 4)
    }),

    // product quantization (32x less scan bandwidth at 100 TB: 64-dim float
    // -> 8 one-byte codes) with ADC scoring fused into one codegen
    // expression + exact rerank; normalize-quantize-argmin is all
    // IEEE-correctly-rounded + integer arithmetic, so the oracle rebuilds
    // the exact candidate set. iters=0 seed codebook (the q_ann_ivf
    // pattern); Lloyd-refined codebooks are spec-covered in PqSpec.
    "q_ann_pq" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      graft.functions.Pq.pqTopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        q, k = 10, m = 8, ksub = 16, rerank = 100, iters = 0)
    }),

    // IVF-PQ composition: the coarse quantizer prunes to 8 of 16 cells
    // (the fraction of the corpus actually scanned), then PQ-ADC scores
    // the ~260 survivors — both stages deterministically seeded, so the
    // full composition is SQL-reproducible end-to-end
    "q_ann_ivfpq" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      graft.functions.Pq.ivfPqTopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        q, k = 10, nlist = 16, nprobe = 8, m = 8, ksub = 16, rerank = 100, iters = 0)
    }),

    // OR-amplified (multi-table) ANN: at numPlanes=8 a single probe finds 1
    // of the top-10 on this corpus; the union over 8 independent tables
    // finds all 10 (recall assertion at numPlanes=12 lives in FunctionsSpec
    // on a clustered corpus). Oracle mirrors the deterministic sign matrix.
    "q_ann_multitable" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Similarity.lshTopKMultiTable(e.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, 10,
        numPlanes = 8, numTables = 8)
    }),

    // IVF ANN: nlist=16 cells seeded from the 16 smallest corpus ids
    // (iters=0 — deterministic, so the oracle recomputes the identical
    // assignment in SQL), probe the 4 cells nearest the query, exact
    // rerank. k-means-refined cells (iters ≥ 2) are spec-checked in
    // FunctionsSpec (recall vs brute force); the partition-pruning build
    // path (ivfAssign → partitionBy cell) is asserted in PlanSpec.
    "q_ann_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Similarity.ivfTopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, 10,
        nlist = 16, nprobe = 4, iters = 0)
    }),

    // batch ANN JOIN: queries (vec_id 0-4) each retrieve their top-3 from
    // the corpus (vec_id ≥ 5) through the multi-table bucket equi-join —
    // the embedding-retrieval shape; oracle mirrors planes + window rank
    "q_ann_join" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.annJoin(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", k = 3, numPlanes = 8, numTables = 8)
    }),

    // streaming operator exercised in batch mode (same code path runs on
    // readStream; see StreamsSpec for the live-stream drive)
    "q_stream_sessions" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.Streams.Event]
      graft.streaming.Streams.sessionize(ev)
        .select(col("user_id"),
          date_format(col("start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"),
          round(col("total_value"), 2).as("total_value"))
    }),

    // multimodal plumbing: text payloads as opaque binary content
    // (deterministic stub decode — rows-only check, see MultimodalSpec)
    "q_multimodal_features" -> ((s, d) => {
      val media = t(s, d, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("content"))
      // n_bytes flows through the same mapPartitions kernel as the FNV
      // hash/features (those stay spec-checked: not expressible in DuckDB)
      graft.functions.Multimodal.extractFeatures(media, dim = 8)
        .select("media_id", "n_bytes")
    }),

    // exact payload dedup over binary content (md5 hash-groupBy)
    "q_multimodal_dedup" -> ((s, d) => {
      val media = t(s, d, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("content"))
      graft.functions.Multimodal.exactPayloadGroups(media)
    }),

    // real image codecs: per-row deterministic fixtures (format rotating
    // bmp/png/gif/jpeg by doc_id, dims by id arithmetic — tools/GenImages)
    // parsed back by the NATIVE header parsers via the image_meta YAML op;
    // the oracle states the expected metadata in closed form
    "q_image_meta" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id")).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenImages.metaFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "image_meta", "column" -> "content"), Map.empty, "gate")
        .select("media_id", "image_format", "image_width", "image_height",
          "image_orientation")
    }),

    // AVIF/HEIC visibility (ISO-BMFF meta/pitm/iprp walk, 23008-12):
    // codec-bearing format + PRIMARY-item dimensions — the fixture's
    // thumbnail ispe rides first in ipco, so these rows are wrong
    // unless pitm -> ipma property association resolves. Decode stays
    // a documented non-goal (AV1/HEVC tables have no validation path
    // here); this is the q_video_meta_avc diagnosability pattern
    // applied to images.
    "q_image_meta_avif" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id")).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenImages.heifFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "image_meta", "column" -> "content"), Map.empty, "gate")
        .select("media_id", "image_format", "image_width", "image_height")
    }),

    // perceptual image near-dedup: ids i and i+250 share a base pattern
    // (the copy carries a faint low-frequency gradient AND a different
    // container format — id%5 rotates PNG / BMP / baseline JPEG / TIFF /
    // WebP-VP8L, through the native bit-stable T.81, strip, and VP8L
    // decoders
    // paths), unrelated patterns are ≥16 pHash bits apart; pHash →
    // 4×16-bit band join → hamming ≤ 3 → connected components must
    // recover exactly the constructed pairing
    "q_image_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 500).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenImages.dedupFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "image_dedup", "id_column" -> "media_id",
          "column" -> "content", "max_hamming" -> 3), Map.empty, "gate")
    }),

    // CCITT fax-family decode correctness, distributed: the SAME bilevel
    // pattern packaged as TIFF comp 1 (packed) / 2 (T.4 MH) / 3 (G3) /
    // 4 (G4 MMR) must decode pixel-identical through the native codecs,
    // observed as pHash equality vs the uncompressed container — a
    // closed-form all-true oracle over the scanned-document tier
    "q_image_ccitt" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 200).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id,
          graft.tools.GenImages.bilevelFixture(id, 1),
          graft.tools.GenImages.bilevelFixture(id, 2),
          graft.tools.GenImages.bilevelFixture(id, 3),
          graft.tools.GenImages.bilevelFixture(id, 4))))
        .toDF("media_id", "raw", "mh", "g3", "g4")
      media.selectExpr("media_id",
        "image_phash(mh) = image_phash(raw) AS mh_exact",
        "image_phash(g3) = image_phash(raw) AS g3_exact",
        "image_phash(g4) = image_phash(raw) AS g4_exact")
    }),

    // lossy VP8 through the perceptual-hash tier: six real libwebp-encoded
    // stills (3 patterns x 2 qualities, tools/Vp8GateFixtures) fan out over
    // 300 rows; every executor must produce the IDENTICAL pHash per fixture
    // (n_hashes=1 — RFC 6386 exact-integer decode is what makes lossy WebP
    // signatures cluster-stable), quality twins must hash strictly closer
    // than any cross-pattern pair; hash values pinned in the oracle
    "q_image_vp8" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 300).transform(fanout).as[Long]
        .mapPartitions(_.map(id =>
          (id % 6, graft.tools.Vp8GateFixtures.fixture((id % 6).toInt))))
        .toDF("fixture_id", "content")
      val h = media
        .groupBy("fixture_id")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(expr("image_phash(content)")).as("n_hashes"),
          min(expr("image_phash(content)")).as("phash"))
      val twin = h.select(col("fixture_id").as("tid"), col("phash").as("tph"))
      val cross = h.select(col("fixture_id").as("cid"), col("phash").as("cph"))
      h.join(twin, col("fixture_id").bitwiseXOR(lit(1)) === col("tid"))
        .withColumn("twin_dist", expr("bit_count(phash ^ tph)"))
        .join(cross, expr("fixture_id div 2 != cid div 2"))
        .groupBy("fixture_id", "n_rows", "n_hashes", "phash", "twin_dist")
        .agg(min(expr("bit_count(phash ^ cph)")).as("min_cross"))
    }),

    // WAV metadata through the audio_meta YAML op: id-derived rate/length
    // fixtures (tools/GenMedia), native RIFF/WAVE header parse, closed-form
    // oracle
    "q_audio_meta" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id")).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.audioMetaFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "audio_meta", "column" -> "content"), Map.empty, "gate")
        .select("media_id", "audio_format", "audio_channels", "audio_sample_rate",
          "audio_bits", "audio_n_samples", "audio_duration_ms", "audio_codec")
    }),

    // storage normalization: every lossless/lossy arm of the 6-container
    // rotation re-encodes to mono Ogg-Vorbis ON EXECUTORS via the native
    // encoder; correctness observed through the TRANSCODED payload's
    // audio_meta (exact closed-form fields: the encoder's granule trim
    // preserves the sample count) and a spectral-fingerprint proximity
    // bit (the transcode must still sound like the source)
    "q_audio_transcode" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 500).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.lossyAudioDedupFixture(id))))
        .toDF("media_id", "content")
      val out = new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "audio_transcode", "column" -> "content"),
        Map.empty, "gate")
      val meta = new graft.engine.Engine(s).applyOperation(
        out.select(col("media_id"), col("content"), col("audio_ogg")),
        Map("operation" -> "audio_meta", "column" -> "audio_ogg"), Map.empty, "gate")
      meta.select(col("media_id"), col("audio_format"), col("audio_channels"),
        col("audio_sample_rate"), col("audio_n_samples"), col("audio_codec"),
        (expr("abs(bit_count(audio_fingerprint_spectral(content) ^ " +
          "audio_fingerprint_spectral(audio_ogg)))") <= 7).as("fp_near"))
    }),

    // Ogg-Theora (.ogv): picture dims, fps and granule-split frame
    // count from the identification header — the last silently-null
    // video container; decode stays a documented non-goal (VP3-family
    // tables, the High-8x8 validation-path class)
    "q_video_meta_theora" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id")).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.theoraFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_meta", "column" -> "content"), Map.empty, "gate")
        .select("media_id", "video_format", "video_width", "video_height",
          "video_duration_ms", "video_codec")
    }),

    // the Mac/Sun-era lossless formats: AIFF (80-bit extended-float
    // rate), AIFC sowt, and Sun .au at PCM16 / G.711 mu-law / A-law —
    // all fields closed-form in doc_id, G.711 expansions formula-derived
    "q_audio_meta_legacy" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id")).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.legacyAudioFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "audio_meta", "column" -> "content"), Map.empty, "gate")
        .select("media_id", "audio_format", "audio_channels", "audio_sample_rate",
          "audio_bits", "audio_n_samples", "audio_duration_ms", "audio_codec")
    }),

    // compressed audio INSIDE containers is visible to the audio tier:
    // WebM-Opus/Vorbis (even ids) and MP4-AAC (odd) report their track's
    // declared codec/channels/rate/duration — previously these payloads
    // fell through to a null-format row and silently vanished
    "q_audio_meta_container" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 400).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.containerAudioFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "audio_meta", "column" -> "content"), Map.empty, "gate")
        .select("media_id", "audio_format", "audio_channels", "audio_sample_rate",
          "audio_bits", "audio_n_samples", "audio_duration_ms", "audio_codec")
    }),

    // STREAM-container audio (previously null rows): MP3 and ADTS-AAC
    // elementary streams inside MPEG-TS (PAT->PMT audio stream_type ->
    // PES-stripped ES walk), and Ogg-held Vorbis/Opus identification
    // headers with last-granule durations — all fields id-derived
    "q_audio_meta_stream" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 400).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.streamAudioFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "audio_meta", "column" -> "content"), Map.empty, "gate")
        .select("media_id", "audio_format", "audio_channels", "audio_sample_rate",
          "audio_bits", "audio_n_samples", "audio_duration_ms", "audio_codec")
    }),

    // REAL PCM decode: integer signal features (energy, zero crossings,
    // peak) over samples the oracle regenerates from the fixture formula —
    // a wrong byte anywhere in encode OR decode breaks the hash match
    "q_audio_features" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id")).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.wavFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "audio_features", "column" -> "content"), Map.empty, "gate")
        .select("media_id", "audio_n_samples", "audio_sq_sum",
          "audio_zero_crossings", "audio_peak")
    }),

    // 63-bit energy-delta fingerprint over decoded PCM — the oracle
    // regenerates the samples, windows them with the same exact integer
    // division, and reassembles the bit pattern with SQL shifts
    "q_audio_fingerprint" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id")).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.wavFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "audio_fingerprint", "column" -> "content"),
        Map.empty, "gate")
        .select("media_id", "audio_fp")
    }),

    // audio near-dedup: ids i and i+250 carry the same signal at double
    // amplitude — different bytes, identical fingerprint (sign-of-delta is
    // amplitude-invariant); banding + CC must recover exactly the pairing
    "q_audio_dedup" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 500).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.audioDedupFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "audio_dedup", "id_column" -> "media_id",
          "column" -> "content", "max_hamming" -> 0), Map.empty, "gate")
    }),

    // LOSSY cross-codec audio dedup (the audio analogue of the video
    // tier's cross-container gates): pairs (i, i+250) are the same
    // recording — the copy at half amplitude — rotating WAV / FLAC /
    // Ogg-VORBIS / MATROSKA-VORBIS / G.711-mu-law-.au / Ogg-VORBIS-FLOOR-0
    // containers, the Vorbis arms decoded by the NATIVE floor/residue/
    // IMDCT decoder (Ogg page demux and A_VORBIS block walk respectively)
    // and genuinely lossy (~45 dB) — the sixth arm carries the legacy LSP
    // floor, so floor-0 decode is oracle-gated from YAML, not just
    // spec-pinned; the mu-law arm is lossy by companding. The
    // 60-bit spectral fingerprint (Haar band-energy delta signs) is
    // bit-identical for the lossless pair members and hamming-near for
    // the lossy ones; the banded join + CC must recover exactly the
    // constructed pairing.
    "q_audio_dedup_lossy" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 500).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.lossyAudioDedupFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "audio_dedup_lossy", "id_column" -> "media_id",
          "column" -> "content", "max_hamming" -> 7), Map.empty, "gate")
    }),

    // resize: grayscale PNG thumbnails of the image fixtures; correctness
    // checked through the metadata of the RE-DECODED thumbnail payload
    "q_image_thumbnail" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id")).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenImages.dedupFixture(id % 250))))
        .toDF("media_id", "content")
      val thumbed = new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "image_thumbnail", "column" -> "content",
          "width" -> 16, "height" -> 12), Map.empty, "gate")
      graft.functions.Images.withImageMeta(thumbed, "thumbnail", "thumb_")
        .select("media_id", "thumb_format", "thumb_width", "thumb_height")
    }),

    // MP4 container metadata (ISO BMFF box walk: mvhd duration, tkhd
    // dimensions) over generated ftyp+moov fixtures
    "q_video_meta" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id")).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.videoMetaFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_meta", "column" -> "content"), Map.empty, "gate")
        .select("media_id", "video_format", "video_width", "video_height",
          "video_duration_ms", "video_codec")
    }),

    // REAL frame content from video containers: 4 id-derived JPEG frames
    // packaged as MJPEG AVI (even ids) / JPEG-sample MP4 with 2-sample
    // stsc chunks (odd ids); the video_frames op explodes them back out
    // and every frame must round-trip BYTE-identical to the bare JPEG the
    // oracle construction regenerates — and hash-identical through the
    // image tier, which is what gives video content signatures for dedup
    "q_video_frames" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val ids = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 200).transform(fanout).as[Long]
      val media = ids
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.videoFramesFixture(id))))
        .toDF("media_id", "content")
      val frames = new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_frames", "column" -> "content",
          "max_frames" -> 4), Map.empty, "gate")
      val expected = ids.flatMap(id => (0 until 4).map(k =>
        (id, k, graft.tools.GenMedia.videoFrameJpeg(id, k))))
        .toDF("media_id", "frame_index", "bare")
      frames.join(expected, Seq("media_id", "frame_index"))
        .selectExpr("media_id", "frame_index",
          "frame = bare AS byte_exact",
          "image_phash(frame) = image_phash(bare) AS phash_exact")
    }),

    // animated GIF through the video_meta face: duration = frames x GCE
    // delay, both id-derived, so the oracle states it in closed form
    // (stills stay image_meta's business — gifMeta requires >= 2 frames)
    "q_video_meta_gif" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 300).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.gifVideoFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_meta", "column" -> "content"), Map.empty, "gate")
        .select("media_id", "video_format", "video_width", "video_height",
          "video_duration_ms", "video_codec")
    }),

    // video near-dedup as ONE op: ids i and i+100 carry identical frame
    // content in different containers (MJPEG AVI / JPEG MP4 / animated
    // GIF / animated WebP, rotation guaranteeing every pair crosses
    // containers AND the GIF/WebP sides cross codecs — lossless gray vs
    // near-lossless JPEG); frame pHash matches vote per video pair (>= 2
    // distinct frames on BOTH sides), connected components label the
    // groups — grouping is id arithmetic
    "q_video_dedup" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 200).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.videoDedupFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_dedup", "id_column" -> "media_id",
          "column" -> "content", "max_hamming" -> 3, "max_frames" -> 4,
          "min_matches" -> 2), Map.empty, "gate")
    }),

    // APNG joins the animated tier: 4 full-canvas frames through the
    // acTL/fcTL/fdAT walk + compositor; every snapshot must come back
    // BYTE-identical to the still-PNG encode of the same plane (the
    // strongest possible frames contract), hash-identical on every
    // executor
    "q_video_frames_apng" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 240).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id % 12,
          graft.tools.GenMedia.apngVideoFixture(id % 12))))
        .toDF("vid", "content")
      val frames = new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_frames", "column" -> "content",
          "max_frames" -> 8), Map.empty, "gate")
      // the still route: the same planes encoded directly (48 tiny
      // driver-built rows, the bounded gate-fixture shape)
      val stills = s.createDataFrame((0 until 12).flatMap(v =>
        (0 until 4).map(k => (v.toLong, k,
          graft.functions.ImageKernels.encodePng(48, 48,
            graft.tools.GenImages.pattern(v * 16L + k, 48, 48))))))
        .toDF("vid", "frame_index", "still")
      frames.join(stills, Seq("vid", "frame_index"))
        .groupBy("vid", "frame_index")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(expr("image_phash(frame)")).as("n_hashes"),
          min(col("frame") === col("still")).as("still_exact"))
    }),

    // cross-container ANIMATED dedup: the same four planes as GIF (even
    // ids) and APNG (odd ids) must group pairwise through the banded
    // pHash join — GIF's luma-palette snapshots and APNG's composited
    // snapshots hash identically
    "q_video_dedup_apng" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 120).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.apngGifDedupFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_dedup", "id_column" -> "media_id",
          "column" -> "content", "max_hamming" -> 3, "max_frames" -> 4,
          "min_matches" -> 2), Map.empty, "gate")
    }),

    // WebM/IVF through the video_meta face: Matroska Info Duration x
    // TimecodeScale + Video PixelWidth/Height, and the IVF header's
    // timebase arithmetic — frame count id-derived, oracle closed-form
    "q_video_meta_webm" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 300).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id, graft.tools.GenMedia.vp8MetaFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_meta", "column" -> "content"), Map.empty, "gate")
        .select("media_id", "video_format", "video_width", "video_height",
          "video_duration_ms", "video_codec")
    }),

    // real VP8 VIDEO: WebM (Matroska SimpleBlock walk) for even vids, IVF
    // for odd, each wrapping 4 libwebp-encoded VP8 keyframes
    // (tools/Vp8VideoFixtures); every frame decodes through the native
    // RFC 6386 path on executors, snapshots as a gray PNG, and must both
    // pin to the oracle's pHash constants AND hash identically on every
    // executor (n_hashes=1 — container walk + decode determinism)
    "q_video_frames_vp8" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 240).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id % 12,
          graft.tools.GenMedia.vp8VideoFixture(id % 12))))
        .toDF("vid", "content")
      val frames = new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_frames", "column" -> "content",
          "max_frames" -> 8), Map.empty, "gate")
      frames.groupBy("vid", "frame_index")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(expr("image_phash(frame)")).as("n_hashes"),
          min(expr("image_phash(frame)")).as("phash"))
    }),

    // real H.264 VIDEO: avc1 MP4s (avcC + length-prefixed IDR samples
    // through stsz/stsc/stco) wrapping 4 native baseline CAVLC keyframes
    // each (tools/H264Fixtures — I_PCM/I_16x16/I_4x4 families, varying
    // QP/modes/deblock); every frame decodes through the native ITU-T
    // H.264 path on executors, snapshots as a gray PNG, and must both
    // pin to the oracle's pHash constants AND hash identically on every
    // executor (n_hashes=1 — container walk + decode determinism)
    "q_video_frames_h264" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 240).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id % 12,
          graft.tools.GenMedia.h264VideoFixture(id % 12))))
        .toDF("vid", "content")
      val frames = new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_frames", "column" -> "content",
          "max_frames" -> 8), Map.empty, "gate")
      frames.groupBy("vid", "frame_index")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(expr("image_phash(frame)")).as("n_hashes"),
          min(expr("image_phash(frame)")).as("phash"))
    }),

    // Main-profile CABAC avc1 (the x264-default entropy mode): 8 videos
    // x 2 embedded CABAC IDR keyframes through the arithmetic entropy
    // layer; pinned pHashes catch a regression anywhere in the CABAC
    // engine, context modeling, or the shared reconstruction stack
    "q_video_frames_h264_cabac" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 160).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id % 8,
          graft.tools.GenMedia.h264CabacVideoFixture(id % 8))))
        .toDF("vid", "content")
      val frames = new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_frames", "column" -> "content",
          "max_frames" -> 4), Map.empty, "gate")
      frames.groupBy("vid", "frame_index")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(expr("image_phash(frame)")).as("n_hashes"),
          min(expr("image_phash(frame)")).as("phash"))
    }),

    // Fragmented MP4 (moof/tfhd/trun, empty moov stbl — the DASH/
    // streaming-origin shape that previously yielded ZERO samples
    // silently): 8 videos covering bases 1..4 x {CAVLC 4-frame, CABAC
    // 2-frame} arms, sample sizes alternating per-sample-in-trun vs
    // tfhd-default inheritance; pinned pHashes must equal the classic
    // container's (same embedded streams)
    "q_video_frames_fmp4" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 160).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id % 8,
          graft.tools.GenMedia.h264FragVideoFixture(id % 8))))
        .toDF("vid", "content")
      val frames = new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_frames", "column" -> "content",
          "max_frames" -> 4), Map.empty, "gate")
      frames.groupBy("vid", "frame_index")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(expr("image_phash(frame)")).as("n_hashes"),
          min(expr("image_phash(frame)")).as("phash"))
    }),

    // MPEG-TS metadata: the container declares neither dimensions nor
    // duration — dims come from the first SPS in the elementary stream,
    // duration from the PES PTS span (90 kHz), codec from the PMT
    // stream_type; frame count differs per entropy arm (4 CAVLC / 2
    // CABAC), so the PTS-span duration is parity-derived
    "q_video_meta_ts" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 320).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id,
          graft.tools.GenMedia.tsAvcVideoFixture(id % 8))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_meta", "column" -> "content"), Map.empty, "gate")
        .selectExpr("media_id", "video_format", "video_width", "video_height",
          "video_duration_ms", "video_codec")
    }),

    // MPEG transport stream (the HLS segment shape): PAT -> PMT ->
    // H.264 PES walk; same 8-video rotation, dims read from the SPS
    // and duration from the PES PTS span since the container declares
    // neither
    "q_video_frames_ts" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 160).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id % 8,
          graft.tools.GenMedia.tsAvcVideoFixture(id % 8))))
        .toDF("vid", "content")
      val frames = new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_frames", "column" -> "content",
          "max_frames" -> 4), Map.empty, "gate")
      frames.groupBy("vid", "frame_index")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(expr("image_phash(frame)")).as("n_hashes"),
          min(expr("image_phash(frame)")).as("phash"))
    }),

    // Matroska-held H.264 (V_MPEG4/ISO/AVC + avcC CodecPrivate — the
    // other container real crawl H.264 ships in): same 8-video rotation
    // as the fMP4 gate; block payloads are length-prefixed NALs whose
    // IDR samples feed the native decoder through the EBML walk
    "q_video_frames_mkv_avc" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 160).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id % 8,
          graft.tools.GenMedia.mkvAvcVideoFixture(id % 8))))
        .toDF("vid", "content")
      val frames = new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_frames", "column" -> "content",
          "max_frames" -> 4), Map.empty, "gate")
      frames.groupBy("vid", "frame_index")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(expr("image_phash(frame)")).as("n_hashes"),
          min(expr("image_phash(frame)")).as("phash"))
    }),

    // avc1 profile/entropy diagnosability: the codec column must make an
    // UNDECODABLE avc1 file distinguishable from a decodable one — bare
    // "avc1" recreated the silent zero-frame drop the column exists to
    // solve. Even ids: native baseline streams (4 frames,
    // avc1/baseline-cavlc); odd ids: the same bytes DECLARING high+cabac
    // (0 frames — the SPS misparses under the declared profile, and
    // since r18 the declared entropy mode alone no longer implies
    // undecodable: Main/High CABAC I-slices decode natively)
    "q_video_meta_avc" -> ((s, d) => {
      import s.implicits._
      graft.expressions.GraftFunctions.register(s)
      val media = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 200).transform(fanout).as[Long]
        .mapPartitions(_.map(id => (id,
          if (id % 2 == 0) graft.tools.GenMedia.h264VideoFixture(id)
          else graft.tools.GenMedia.h264UndecodableFixture(id))))
        .toDF("media_id", "content")
      new graft.engine.Engine(s).applyOperation(media,
        Map("operation" -> "video_meta", "column" -> "content"), Map.empty, "gate")
        .selectExpr("media_id", "video_codec",
          "size(video_frames(content, 4)) AS n_frames")
    }),

    // ================================================ corpus cleaning ops
    // PII redaction over text with synthesized email/IP/phone per row (the
    // raw corpus contains none — the construction makes the regexes fire)
    "q_pii_redact" -> ((s, d) =>
      fanout(t(s, d, "documents")).select(col("doc_id"),
        graft.functions.Corpus.redactPii(concat(
          col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com ip 10.0."), col("doc_id") % 256,
          lit(".7 tel +155500"), col("doc_id"), lit("9"))).as("text"))),

    // word-level repetition signals on the raw corpus
    "q_rep_words" -> ((s, d) =>
      graft.functions.Corpus.withRepetitionStats(
          fanout(t(s, d, "documents")).select("doc_id", "text"), "text")
        .select(col("doc_id"),
          round(col("word_rep_ratio"), 4).as("word_rep_ratio"),
          round(col("top_ngram_char_ratio"), 4).as("top_ngram_char_ratio"))),

    // line-level repetition signals on a constructed multi-line document
    // (the raw corpus is single-line; the data-dependent prefix line makes
    // some documents self-duplicate)
    "q_rep_lines" -> ((s, d) => {
      val built = fanout(t(s, d, "documents")).select(col("doc_id"),
        concat_ws("\n", col("text"),
          substr(col("text"), lit(1), col("doc_id") % 300 + 1),
          lit("shared footer line")).as("text"))
      graft.functions.Corpus.withRepetitionStats(built, "text")
        .select(col("doc_id"), col("n_lines"),
          round(col("dup_line_ratio"), 4).as("dup_line_ratio"),
          round(col("dup_line_char_ratio"), 4).as("dup_line_char_ratio"))
    }),

    // C4-style boilerplate removal: two injected footers (one universal,
    // one on 2/3 of documents) must be removed, the per-document signature
    // line must survive
    "q_boilerplate" -> ((s, d) => {
      val built = t(s, d, "documents").select(col("doc_id"),
        concat_ws("\n", col("text"),
          lit("subscribe to our newsletter"),
          when(col("doc_id") % 3 =!= 0, lit("copyright 2026 example corp")),
          concat(lit("sig "), md5(col("text")))).as("text"))
      graft.functions.Corpus.removeBoilerplate(built, "doc_id", "text", minDocs = 100L)
        .select("doc_id", "text")
    }),

    // context-window chunking: 30-word windows, 10-word overlap
    "q_chunk" -> ((s, d) =>
      graft.functions.Corpus.chunk(
        t(s, d, "documents").select("doc_id", "text"), "doc_id", "text",
        chunkWords = 30, overlapWords = 10)),

    // TF-IDF keyword extraction: top-5 characteristic terms per document
    // (float-free ranking; the tf·ln(N/df) score is a payload column)
    "q_tfidf" -> ((s, d) =>
      graft.functions.Corpus.tfidfTopTerms(
        t(s, d, "documents").select("doc_id", "text"), "doc_id", "text", k = 5)),

    // corpus vocabulary statistics: the 20 most frequent word 3-grams
    "q_top_ngrams" -> ((s, d) =>
      graft.functions.Corpus.ngramCounts(t(s, d, "documents"), "text", n = 3)
        .orderBy(col("n_occurrences").desc, col("gram").asc)
        .limit(20)),

    // benchmark decontamination: the deterministic 20% hash sample is the
    // "eval set"; the rest of the corpus is checked for 5-gram overlap
    "q_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val bench = graft.functions.Sampling.hashSample(docs, "text", 0.2)
      val corpus = docs.join(bench.select("doc_id"), Seq("doc_id"), "left_anti")
      graft.functions.Corpus.contamination(corpus, bench, "doc_id", "text", shingleSize = 5)
    }),

    // ====================================================== sketch tier
    // mergeable sketches (functions/Sketches.scala): every estimate below
    // is deterministic integer arithmetic on splitmix64, so the oracles
    // rebuild the EXACT estimates in DuckDB SQL (SketchSql.sm64 is the
    // bit-validated HUGEINT reproduction of the kernel hash)

    // per-group HLL distinct estimate (p=8 -> 256 registers, ~6.5% rel err;
    // 2000 true distinct per group sits in the raw-estimator regime)
    "q_sketch_hll" -> ((s, d) =>
      graft.functions.Sketches.approxDistinct(
        t(s, d, "lineitem"), Seq("l_returnflag"), "l_partkey", precision = 8)),

    // the day-merge contract: sketches built per (flag, status), PERSISTED
    // as a binary column, then hll_merge'd up to flag — register-wise max
    // is associative, so the estimates must equal q_sketch_hll's exactly
    "q_sketch_hll_merge" -> ((s, d) => {
      val fine = graft.functions.Sketches.approxDistinct(
        t(s, d, "lineitem"), Seq("l_returnflag", "l_linestatus"), "l_partkey",
        precision = 8, sketchCol = Some("sk"))
      graft.functions.Sketches.mergeDistinct(fine, Seq("l_returnflag"), "sk")
    }),

    // Count-Min point estimates: one sketch over all of lineitem (the
    // bounded ~32 KB driver artifact), probed for partkeys 0..24 — the
    // oracle rebuilds every row-bucket collision sum and takes the same min
    "q_sketch_cms" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val li = t(s, d, "lineitem")
      val sk = li.agg(call_function("cms_sketch", col("l_partkey"), lit(4), lit(1024)))
        .head().getAs[Array[Byte]](0)
      li.select("l_partkey").where(col("l_partkey") < 25).distinct()
        .select(col("l_partkey").as("key"),
          call_function("cms_query", lit(sk), col("l_partkey")).as("est_count"))
    }),

    // sketch-pruned exact heavy hitters: CMS (width 64 -> real collisions
    // among the 150 user_ids) prunes to candidates, exact count + HAVING
    // makes the output exactly `count(*) >= 70` — if the sketch ever
    // under-counted, rows would go missing here
    "q_heavy_hitters" -> ((s, d) =>
      graft.functions.Sketches.heavyHitters(
        t(s, d, "events").select("user_id"), "user_id", minCount = 70,
        depth = 4, width = 64)),

    // Bloom membership: filter built over partkeys < 1000 at log_bits=12
    // (deliberately tight: ~71% fill -> ~18% false-positive rate, so the
    // gate output EXERCISES false positives rather than dodging them);
    // probe every distinct partkey — the oracle rebuilds the exact bit set
    "q_sketch_bloom" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val li = t(s, d, "lineitem")
      val sk = li.filter(col("l_partkey") < 1000)
        .agg(call_function("bloom_sketch", col("l_partkey"), lit(12), lit(5)))
        .head().getAs[Array[Byte]](0)
      li.select("l_partkey").distinct()
        .select(col("l_partkey").as("key"),
          call_function("bloom_contains", lit(sk), col("l_partkey")).as("maybe_present"))
    }),

    // KMV set algebra: R-flag vs N-flag orderkey sets (truth 11058/11062,
    // union 13982, intersection 8138) estimated from two 256-hash sketches
    // — integer-exact estimates the oracle reproduces from the same k-min
    // hash sets
    "q_sketch_kmv" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      graft.functions.Sketches.setOverlap(
        li.filter(col("l_returnflag") === "R").select("l_orderkey"), "l_orderkey",
        li.filter(col("l_returnflag") === "N").select("l_orderkey"), "l_orderkey",
        k = 256)
    }),

    // per-group quantile-threshold row filter: keep lineitem rows at or
    // above the per-flag p50 of extendedprice cents — the Gopher-style
    // per-domain quality cut as one YAML op; the threshold is the exact
    // loghist bucket bound the q_sketch_quantile oracle rebuilds
    "q_quantile_filter" -> ((s, d) => {
      val e = new graft.engine.Engine(s)
      e.applyOperation(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber",
          "l_returnflag", "l_extendedprice"),
        Map("operation" -> "quantile_filter",
          "group_by_columns" -> List("l_returnflag"), "column" -> "l_extendedprice",
          "fraction" -> 0.5, "mode" -> "keep_above", "scale" -> 100),
        Map.empty, "gate")
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    }),

    // per-group log-histogram quantiles over integer cents (sub_bits=5 ->
    // rel err < 1/32); the oracle reproduces the exact bit-bucketing
    "q_sketch_quantile" -> ((s, d) =>
      graft.functions.Sketches.quantileSketch(
        t(s, d, "lineitem")
          .withColumn("price_cents", round(col("l_extendedprice") * 100).cast("long")),
        Seq("l_returnflag"), "price_cents", fractions = Seq(0.5, 0.95, 0.99))),

    // STREAMING sketch face: two deltas of lineitem land as micro-batches,
    // each collapsing to per-group HLL sketches in batch-stamped
    // partitions; the merged running totals must equal the direct build
    // over ALL of lineitem — the q_sketch_hll oracle verbatim (register
    // max is associative across any delta split)
    "q_stream_sketch" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-si-sketch")
      val rows = t(s, d, "lineitem").select(col("l_returnflag"), col("l_partkey"))
      rows.filter(col("l_partkey") % 5 =!= 0).write.parquet(s"$dir/src")
      val src = s.readStream.schema(rows.schema).parquet(s"$dir/src")
      // single-file delta-2 append: atomic to the poller's listing (see
      // q_stream_ingest_text)
      val q = graft.streaming.Streams.sketchDistinctIngest(src,
        Seq("l_returnflag"), "l_partkey", precision = 8,
        s"$dir/sketches", checkpointDir = s"$dir/ckpt")
      try {
        q.processAllAvailable()
        rows.filter(col("l_partkey") % 5 === 0).coalesce(1)
          .write.mode("append").parquet(s"$dir/src")
        q.processAllAvailable()
      } finally q.stop()
      graft.streaming.Streams.sketchDistinctTotals(s, s"$dir/sketches", Seq("l_returnflag"))
    }),

    // STREAMING embedding face (8th): batch 1 ingests the %5!=0 vectors;
    // batch 2 carries the novel %5==0 vectors (kept) plus byte-identical
    // copies of batch-1 survivors at +10000 (condemned by the PERSISTED
    // index) and of its own novel rows at +20000 (condemned within-batch,
    // smaller id wins). Identical vectors collide in EVERY LSH table, so
    // the keep-set is closed-form; max natural pairwise cosine in the
    // fixture is 0.513, far under the 0.9 threshold
    "q_stream_ingest_embedding" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-si-emb")
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val d1 = emb.filter(col("vec_id") % 5 =!= 0)
      d1.write.parquet(s"$dir/src")
      val src = s.readStream.schema(d1.schema).parquet(s"$dir/src")
      val q = graft.streaming.Streams.incrementalEmbeddingDedupIngest(src,
        "vec_id", "embedding", s"$dir/index", s"$dir/out",
        threshold = 0.9, checkpointDir = s"$dir/ckpt")
      try {
        q.processAllAvailable()
        val novel = emb.filter(col("vec_id") % 5 === 0)
        val dupOfKept = emb.filter(col("vec_id") % 5 === 1)
          .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
        val dupInBatch = novel
          .select((col("vec_id") + 20000L).as("vec_id"), col("embedding"))
        novel.unionAll(dupOfKept).unionAll(dupInBatch).coalesce(1)
          .write.mode("append").parquet(s"$dir/src")
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(s"$dir/out")
        .select(col("vec_id").as("id"), col("batch").cast("long").as("batch"))
    }),

    // STREAMING resample face: two event deltas land as micro-batches, each
    // collapsing to partial per-(user, hour-bucket) count/sum/min/max in
    // batch-stamped partitions; merged totals must equal the one-shot SQL
    // build over ALL events — exact because the value is integer cents
    // (sum/min/max of longs are associative and commutative)
    "q_stream_resample" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-si-resample")
      val rows = t(s, d, "events").select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      rows.filter(col("event_id") % 3 =!= 0).write.parquet(s"$dir/src")
      val src = s.readStream.schema(rows.schema).parquet(s"$dir/src")
      val q = graft.streaming.Streams.resampleIngest(src, "ts", Seq("user_id"),
        3600000000L, "cents", s"$dir/aggs", checkpointDir = s"$dir/ckpt")
      try {
        q.processAllAvailable()
        // single-file delta-2 append: atomic to the poller's listing
        rows.filter(col("event_id") % 3 === 0).coalesce(1)
          .write.mode("append").parquet(s"$dir/src")
        q.processAllAvailable()
      } finally q.stop()
      graft.streaming.Streams.resampleTotals(s, s"$dir/aggs", Seq("user_id"))
        .select(col("user_id"), unix_micros(col("bucket")).as("bucket_us"),
          col("n"), col("s").as("sum_cents"), col("mn").as("min_cents"),
          col("mx").as("max_cents"))
    }),

    // (compression_ratio has no gate entry: zlib is not SQL-expressible,
    // and a rows-only row would dilute the all-hash-verified suite — its
    // value-level coverage lives in SketchesSpec: ordering, determinism,
    // null/empty edges, YAML dispatch)

    // fixed-point integer PageRank over the supplier->part link graph
    // (~45k distinct edges): integer sums commute, so the ranks are
    // independent of partitioning/join order and the oracle's unrolled
    // iteration layers reproduce them EXACTLY
    "q_pagerank" -> ((s, d) =>
      graft.functions.Graph.pageRank(
        t(s, d, "lineitem").select(col("l_suppkey"), col("l_partkey")),
        "l_suppkey", "l_partkey", iters = 3)),

    // canonical-parity variant: every part node is dangling in this graph
    // (parts have no outlinks), so redistribution moves real mass — the
    // oracle adds a per-layer dangling-sum CTE with the same double floor
    // division, validated against a Python model before landing
    "q_pagerank_dangling" -> ((s, d) =>
      graft.functions.Graph.pageRank(
        t(s, d, "lineitem").select(col("l_suppkey"), col("l_partkey")),
        "l_suppkey", "l_partkey", iters = 3, dangling = "redistribute")),

    // HITS over the same supplier->part graph: hubs and authorities in
    // integer micro-units with exact integer L1 normalization — two
    // unrolled iteration rounds rebuilt layer-by-layer in the oracle
    "q_hits" -> ((s, d) =>
      graft.functions.Graph.hits(
        t(s, d, "lineitem").select(col("l_suppkey"), col("l_partkey")),
        "l_suppkey", "l_partkey", iters = 2)),

    // ========================================================== destination
    "q_render_template" -> ((s, d) => {
      val n = t(s, d, "nation")
      n.select(col("n_nationkey"),
        RowTemplates.templateColumn(n,
          """{"name": "{{n_name}}", "region": {{n_regionkey}}}""").as("rendered"))
    }),
  )

    /** Survivor-set oracle shared by the text and document streaming
    * ingest faces (the doc face extracts back to identical text). */
  private val StreamIngestTextSql: String =
    """WITH ws AS (
           SELECT doc_id AS id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS w
           FROM documents WHERE doc_id < 2000),
         idx AS (
           SELECT id, w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i FROM ws),
         toks AS (
           SELECT DISTINCT id,
             CASE WHEN len(w) >= 3 THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS tok
           FROM idx),
         counts AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
         t1 AS (SELECT * FROM toks WHERE id % 5 <> 0),
         i1 AS (
           SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
           FROM t1 a JOIN t1 b ON a.tok = b.tok AND a.id < b.id
           GROUP BY 1, 2),
         p1 AS (
           SELECT a_id, b_id FROM i1
           JOIN counts ca ON ca.id = a_id
           JOIN counts cb ON cb.id = b_id
           WHERE n_common::DOUBLE / (ca.n + cb.n - n_common) >= 0.7),
         kept1 AS (
           SELECT DISTINCT id FROM t1
           WHERE NOT EXISTS (SELECT 1 FROM p1 WHERE p1.b_id = t1.id)),
         t2 AS (SELECT * FROM toks WHERE id % 5 = 0),
         u2 AS (
           SELECT * FROM t2
           UNION ALL
           SELECT t.* FROM toks t JOIN kept1 k ON t.id = k.id),
         i2 AS (
           SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
           FROM t2 a JOIN u2 b
             ON a.tok = b.tok AND a.id <> b.id
              AND (b.id % 5 <> 0 OR a.id < b.id)
           GROUP BY 1, 2),
         p2 AS (
           SELECT a_id, b_id FROM i2
           JOIN counts ca ON ca.id = a_id
           JOIN counts cb ON cb.id = b_id
           WHERE n_common::DOUBLE / (ca.n + cb.n - n_common) >= 0.7),
         kept2 AS (
           SELECT DISTINCT id FROM t2
           WHERE NOT EXISTS (SELECT 1 FROM p2
             WHERE p2.b_id = t2.id
                OR (p2.a_id = t2.id AND p2.b_id % 5 <> 0)))
         SELECT id AS doc_id, 0::BIGINT AS batch FROM kept1
         UNION ALL
         SELECT id AS doc_id, 1::BIGINT AS batch FROM kept2"""

  /** DuckDB reproduction of the sketch-tier arithmetic. splitmix64 runs in
    * HUGEINT mod 2^64 with 32-bit-split multiplies (HUGEINT can't hold a
    * full 64x64 product); xor/shift hop through UBIGINT. Bit-validated
    * against SketchKernels over [-5, 3000) and on every gate fixture. Big
    * literals carry ::HUGEINT casts (DuckDB parses them as DECIMAL
    * otherwise) and float literals ::DOUBLE (same trap: DECIMAL(18,16)
    * arithmetic overflows and rounds differently). */
  private object SketchSql {
    private val M64 = "18446744073709551616::HUGEINT"
    private def mulmod(a: String, c: BigInt): String = {
      val lo = c & 0xFFFFFFFFL
      val hi = c >> 32
      s"((($a) * $lo::HUGEINT + ((($a) * $hi::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % $M64)"
    }
    private def xorshr(a: String, sh: Int): String =
      s"CAST(xor(CAST(($a) AS UBIGINT), CAST((($a) // ${1L << sh}) AS UBIGINT)) AS HUGEINT)"
    def xor(a: String, b: String): String =
      s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"
    def sm64(x: String): String = {
      val z0 = s"((($x)::HUGEINT % $M64 + $M64 + 11400714819323198485::HUGEINT) % $M64)"
      val z1 = mulmod(xorshr(z0, 30), BigInt("BF58476D1CE4E5B9", 16))
      val z2 = mulmod(xorshr(z1, 27), BigInt("94D049BB133111EB", 16))
      xorshr(z2, 31)
    }
    /** splitmix64(r+1) as unsigned literals — SketchKernels.cmsSeed. */
    val cmsSeeds: Seq[BigInt] = (0 until 4).map { r =>
      val s = graft.functions.SketchKernels.cmsSeed(r)
      (BigInt(s) + (BigInt(1) << 64)) % (BigInt(1) << 64)
    }

    /** Shared HLL oracle (p=8) over l_partkey grouped by l_returnflag —
      * used verbatim by q_sketch_hll and q_sketch_hll_merge (register max
      * is associative, so merged fine sketches equal the direct build).
      * Mirrors hllEstimate exactly: exact-integer harmonic sum, the same
      * double formula, and the linear-counting CASE (not taken on this
      * fixture: raw 2060 > 2.5*256). */
    val hllSql: String = {
      val alpha = "(0.7213::DOUBLE / (1::DOUBLE + 1.079::DOUBLE / 256::DOUBLE))"
      s"""WITH h AS (
           SELECT l_returnflag AS g, ${sm64("l_partkey")} AS hv FROM lineitem),
         r AS (
           SELECT g, hv // 72057594037927936 AS idx,
                  CASE WHEN hv % 72057594037927936 = 0 THEN 57
                       ELSE 57 - length(bin(CAST(hv % 72057594037927936 AS UBIGINT))) END AS rank
           FROM h),
         regs AS (SELECT g, idx, max(rank) AS mr FROM r GROUP BY g, idx),
         full_regs AS (
           SELECT gg.g, s.i AS idx, coalesce(regs.mr, 0) AS mr
           FROM (SELECT DISTINCT g FROM r) gg
           CROSS JOIN (SELECT unnest(range(0, 256)) AS i) s
           LEFT JOIN regs ON regs.g = gg.g AND regs.idx = s.i),
         nsum AS (
           SELECT g, sum(CAST(power(2, 57 - mr) AS HUGEINT)) AS n,
                  sum(CASE WHEN mr = 0 THEN 1 ELSE 0 END) AS zeros
           FROM full_regs GROUP BY g),
         est AS (
           SELECT g, zeros,
                  $alpha * 256 * 256 * power(2, 57) / CAST(n AS DOUBLE) AS raw
           FROM nsum)
         SELECT g AS l_returnflag,
                CAST(round(CASE WHEN raw <= 2.5::DOUBLE * 256 AND zeros > 0
                                THEN 256 * ln(256::DOUBLE / zeros)
                                ELSE raw END) AS BIGINT) AS approx_distinct
         FROM est ORDER BY g"""
    }
  }

  /** Unrolled fixed-point PageRank layers — one CTE pair per iteration,
    * mirroring Graph.pageRank's integer arithmetic exactly (BIGINT `//`
    * floor division; sums exact in HUGEINT, cast back per layer). */
  private def pageRankSql(iters: Int, redistribute: Boolean = false): String = {
    val mass = graft.functions.Graph.Mass
    val head =
      s"""WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         nn AS (SELECT count(*) AS n FROM nodes),
         r0 AS (SELECT node, CAST($mass // (SELECT n FROM nn) AS BIGINT) AS rank FROM nodes)"""
    val layers = (1 to iters).map { i =>
      val dLayer =
        if (!redistribute) ""
        else s""",
         d$i AS (
           SELECT coalesce(sum(r.rank), 0) AS dm
           FROM r${i - 1} r LEFT JOIN deg ON deg.src = r.node
           WHERE deg.src IS NULL)"""
      val dShare =
        if (!redistribute) ""
        else s""" + ((SELECT dm FROM d$i) * 850000 // 1000000) // (SELECT n FROM nn)"""
      s"""$dLayer,
         c$i AS (
           SELECT e.dst AS node, sum((r.rank * 850000) // (1000000 * deg.d)) AS m
           FROM r${i - 1} r JOIN e ON e.src = r.node JOIN deg ON deg.src = e.src
           GROUP BY e.dst),
         r$i AS (
           SELECT nodes.node,
                  CAST((($mass * 150000) // 1000000) // (SELECT n FROM nn)
                       + coalesce(c$i.m, 0)$dShare AS BIGINT) AS rank
           FROM nodes LEFT JOIN c$i ON c$i.node = nodes.node)"""
    }.mkString
    s"$head$layers SELECT node, rank FROM r$iters ORDER BY node"
  }

  /** HITS rebuilt layer-by-layer: each iteration is two LEFT-joined
    * propagation sums with the integer L1 normalization (`raw // (Σraw //
    * 10^9 + 1)`) applied via a scalar subquery — validated against an
    * independent Python model before landing. */
  private def hitsSql(iters: Int): String = {
    val m = 1000000000L
    val head =
      s"""WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         h0 AS (SELECT node, $m::BIGINT AS h FROM nodes)"""
    val layers = (1 to iters).map { i =>
      s""",
         araw$i AS (SELECT nodes.node, coalesce(s.m, 0) AS raw FROM nodes LEFT JOIN
           (SELECT e.dst AS node, sum(h.h) AS m FROM h${i - 1} h JOIN e ON e.src = h.node
            GROUP BY e.dst) s ON s.node = nodes.node),
         a$i AS (SELECT node,
                   CAST(raw // (SELECT sum(raw) // $m + 1 FROM araw$i) AS BIGINT) AS a
                 FROM araw$i),
         hraw$i AS (SELECT nodes.node, coalesce(s.m, 0) AS raw FROM nodes LEFT JOIN
           (SELECT e.src AS node, sum(a.a) AS m FROM a$i a JOIN e ON e.dst = a.node
            GROUP BY e.src) s ON s.node = nodes.node),
         h$i AS (SELECT node,
                   CAST(raw // (SELECT sum(raw) // $m + 1 FROM hraw$i) AS BIGINT) AS h
                 FROM hraw$i)"""
    }.mkString
    s"""$head$layers
       SELECT hh.node AS node, hh.h AS hub, aa.a AS authority
       FROM h$iters hh JOIN a$iters aa ON aa.node = hh.node"""
  }

  /** q_zorder's interleave rebuilt as explicit per-bit SQL terms: bit b
    * of bucket a lands at position 2b, of bucket b at 2b+1 (k=2, bits=8 —
    * terms stay far inside BIGINT). */
  private val zorderInterleaveSql: String = (0 until 8).map(b =>
    s"(((ba >> $b) & 1) * ${1L << (2 * b)} + ((bb >> $b) & 1) * ${1L << (2 * b + 1)})")
    .mkString(" + ")

  def oracleSql: Map[String, String] = Map(
    "q_pagerank" -> pageRankSql(3),
    "q_pagerank_dangling" -> pageRankSql(3, redistribute = true),
    "q_hits" -> hitsSql(2),
    "q_sketch_hll" -> SketchSql.hllSql,
    "q_sketch_hll_merge" -> SketchSql.hllSql,
    "q_stream_sketch" -> SketchSql.hllSql,

    "q_stream_ingest_embedding" ->
      """SELECT vec_id AS id, 0::BIGINT AS batch FROM embeddings WHERE vec_id % 5 <> 0
         UNION ALL
         SELECT vec_id AS id, 1::BIGINT AS batch FROM embeddings WHERE vec_id % 5 = 0""",

    "q_stream_resample" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us,
                CAST(round(value * 100) AS BIGINT) AS c FROM events)
         SELECT user_id, us - us % 3600000000 AS bucket_us,
           count(*)::BIGINT AS n, sum(c)::BIGINT AS sum_cents,
           min(c) AS min_cents, max(c) AS max_cents
         FROM ev GROUP BY 1, 2""",

    // every (row, bucket) collision sum, then the same min over 4 rows
    "q_sketch_cms" -> {
      val seedVals = SketchSql.cmsSeeds.zipWithIndex
        .map { case (s, r) => s"($r, $s::HUGEINT)" }.mkString(", ")
      s"""WITH cnts AS (SELECT l_partkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1),
         g AS (SELECT k, cnt, ${SketchSql.sm64("k")} AS gh FROM cnts),
         seeds AS (SELECT * FROM (VALUES $seedVals) s(r, seed)),
         buckets AS (
           SELECT g.k, g.cnt, s.r,
                  CAST(${SketchSql.sm64(SketchSql.xor("g.gh", "s.seed"))} % 1024 AS BIGINT) AS b
           FROM g CROSS JOIN seeds s),
         rowsum AS (SELECT r, b, sum(cnt) AS tot FROM buckets GROUP BY r, b),
         probes AS (SELECT k, r, b FROM buckets WHERE k < 25)
         SELECT p.k AS key, CAST(min(rs.tot) AS BIGINT) AS est_count
         FROM probes p JOIN rowsum rs ON rs.r = p.r AND rs.b = p.b
         GROUP BY p.k ORDER BY p.k"""
    },

    // exact bit-set reproduction: double hashing bit_i = (h1 + i*h2) mod
    // 2^64 masked to 12 bits, membership = all 5 probe bits present
    "q_sketch_bloom" -> {
      val seed = "7184368381975216025::HUGEINT" // splitmix64(0x626C6F6F) unsigned
      s"""WITH ins AS (SELECT DISTINCT l_partkey AS key FROM lineitem WHERE l_partkey < 1000),
         ih AS (SELECT key, ${SketchSql.sm64("key")} AS h1 FROM ins),
         ih2 AS (SELECT key, h1, ${SketchSql.sm64(SketchSql.xor("h1", seed))} AS h2 FROM ih),
         setbits AS (
           SELECT DISTINCT CAST((h1 + i.i * h2) % 18446744073709551616::HUGEINT % 4096 AS BIGINT) AS bit
           FROM ih2 CROSS JOIN (SELECT unnest(range(0, 5)) AS i) i),
         probes AS (SELECT DISTINCT l_partkey AS key FROM lineitem),
         ph AS (SELECT key, ${SketchSql.sm64("key")} AS h1 FROM probes),
         ph2 AS (SELECT key, h1, ${SketchSql.sm64(SketchSql.xor("h1", seed))} AS h2 FROM ph),
         pb AS (
           SELECT key, i.i, CAST((h1 + i.i * h2) % 18446744073709551616::HUGEINT % 4096 AS BIGINT) AS bit
           FROM ph2 CROSS JOIN (SELECT unnest(range(0, 5)) AS i) i)
         SELECT pb.key, bool_and(sb.bit IS NOT NULL) AS maybe_present
         FROM pb LEFT JOIN setbits sb ON sb.bit = pb.bit
         GROUP BY pb.key ORDER BY pb.key"""
    },

    // same k-min hash sets, same integer estimators: est = floor((k-1)*2^64
    // / h_k) (exact count below k), intersection = floor(c*unionEst/nu)
    "q_sketch_kmv" -> {
      val m64 = "18446744073709551616::HUGEINT"
      s"""WITH a_keys AS (SELECT DISTINCT l_orderkey AS key FROM lineitem WHERE l_returnflag = 'R'),
         b_keys AS (SELECT DISTINCT l_orderkey AS key FROM lineitem WHERE l_returnflag = 'N'),
         ka AS (SELECT ${SketchSql.sm64("key")} AS h FROM a_keys ORDER BY 1 LIMIT 256),
         kb AS (SELECT ${SketchSql.sm64("key")} AS h FROM b_keys ORDER BY 1 LIMIT 256),
         ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT 256),
         ea AS (SELECT CASE WHEN count(*) < 256 THEN count(*)
                        ELSE CAST((255::HUGEINT * $m64) // max(h) AS BIGINT) END AS v FROM ka),
         eb AS (SELECT CASE WHEN count(*) < 256 THEN count(*)
                        ELSE CAST((255::HUGEINT * $m64) // max(h) AS BIGINT) END AS v FROM kb),
         eu AS (SELECT count(*) AS nu,
                       CASE WHEN count(*) < 256 THEN count(*)
                            ELSE CAST((255::HUGEINT * $m64) // max(h) AS BIGINT) END AS v FROM ku),
         c AS (SELECT count(*) AS c FROM ka JOIN kb ON ka.h = kb.h JOIN ku ON ku.h = ka.h)
         SELECT ea.v AS est_a, eb.v AS est_b, eu.v AS est_union,
                CAST(c.c::HUGEINT * eu.v // eu.nu AS BIGINT) AS est_intersect
         FROM ea, eb, eu, c"""
    },

    // the sketch prunes, the exact pass decides: output is exactly HAVING
    "q_heavy_hitters" ->
      """SELECT user_id, count(*) AS frequency FROM events
         GROUP BY user_id HAVING count(*) >= 70""",

    // exact bit-bucketing (sub_bits=5): e = bitlen-6, bucket = (v>>e)+e*32,
    // report the lower bound of the first bucket with cum >= ceil(q*n)
    "q_quantile_filter" ->
      """WITH vals AS (
           SELECT l_orderkey, l_linenumber, l_returnflag AS g,
                  CAST(round(l_extendedprice*100) AS BIGINT) AS v
           FROM lineitem),
         bk AS (
           SELECT g, CASE WHEN v < 64 THEN v
                          ELSE (v >> (length(bin(v)) - 6)) + (length(bin(v)) - 6)::BIGINT * 32 END AS b
           FROM vals),
         hist AS (SELECT g, b, count(*) AS cnt FROM bk GROUP BY g, b),
         cum AS (
           SELECT g, b, sum(cnt) OVER (PARTITION BY g ORDER BY b) AS cum,
                  sum(cnt) OVER (PARTITION BY g) AS n
           FROM hist),
         pick AS (
           SELECT g, min(b) AS qb FROM cum
           WHERE cum >= greatest(1, ceil(0.5 * n)) GROUP BY g),
         thr AS (
           SELECT g, CASE WHEN qb < 64 THEN qb
                          ELSE (qb - (qb//32 - 1)*32) << (qb//32 - 1) END AS t
           FROM pick)
         SELECT v.l_orderkey, v.l_linenumber, v.g AS l_returnflag
         FROM vals v JOIN thr t ON v.g = t.g WHERE v.v >= t.t""",

    "q_sketch_quantile" ->
      """WITH vals AS (
           SELECT l_returnflag AS g, CAST(round(l_extendedprice*100) AS BIGINT) AS v
           FROM lineitem),
         bk AS (
           SELECT g, CASE WHEN v < 64 THEN v
                          ELSE (v >> (length(bin(v)) - 6)) + (length(bin(v)) - 6)::BIGINT * 32 END AS b
           FROM vals),
         hist AS (SELECT g, b, count(*) AS cnt FROM bk GROUP BY g, b),
         cum AS (
           SELECT g, b, sum(cnt) OVER (PARTITION BY g ORDER BY b) AS cum,
                  sum(cnt) OVER (PARTITION BY g) AS n
           FROM hist),
         pick AS (
           SELECT q.q, c.g, min(c.b) AS qb
           FROM cum c CROSS JOIN (SELECT unnest([0.5, 0.95, 0.99]) AS q) q
           WHERE c.cum >= greatest(1, ceil(q.q * c.n))
           GROUP BY q.q, c.g)
         SELECT g AS l_returnflag,
           max(CASE WHEN q=0.5  THEN CASE WHEN qb < 64 THEN qb ELSE (qb - (qb//32 - 1)*32) << (qb//32 - 1) END END) AS q5,
           max(CASE WHEN q=0.95 THEN CASE WHEN qb < 64 THEN qb ELSE (qb - (qb//32 - 1)*32) << (qb//32 - 1) END END) AS q95,
           max(CASE WHEN q=0.99 THEN CASE WHEN qb < 64 THEN qb ELSE (qb - (qb//32 - 1)*32) << (qb//32 - 1) END END) AS q99
         FROM pick GROUP BY g ORDER BY g""",

    "q_source_parquet" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 5",

    "q_source_xlsx" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    "q_source_ods" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    "q_source_docx" ->
      """SELECT (row_number() OVER (ORDER BY doc_id))::BIGINT AS paragraph, text
         FROM documents WHERE doc_id < 40""",

    "q_source_pptx" ->
      """SELECT (row_number() OVER (ORDER BY doc_id))::BIGINT AS slide, text
         FROM documents WHERE doc_id < 40""",

    "q_source_rtf" ->
      """SELECT (row_number() OVER (ORDER BY doc_id))::BIGINT AS paragraph, text
         FROM documents WHERE doc_id < 40""",

    "q_source_doc" ->
      """SELECT (row_number() OVER (ORDER BY doc_id))::BIGINT AS paragraph, text
         FROM documents WHERE doc_id < 40""",

    "q_source_srt" ->
      """SELECT (row_number() OVER (ORDER BY doc_id))::BIGINT AS cue,
           (doc_id * 2000)::BIGINT AS start_ms,
           (doc_id * 2000 + 1500)::BIGINT AS end_ms, text
         FROM documents WHERE doc_id < 40""",

    "q_source_vtt" ->
      """SELECT (row_number() OVER (ORDER BY doc_id))::BIGINT AS cue,
           (doc_id * 2000)::BIGINT AS start_ms,
           (doc_id * 2000 + 1500)::BIGINT AS end_ms, text
         FROM documents WHERE doc_id < 40""",

    // binary-column extraction inverts the per-format writers exactly,
    // so the oracle is the identity round-trip
    // cue text rebuilt with the same id-derived strings
    "q_doc_text_mkv" ->
      """SELECT doc_id,
           list_aggregate(list_transform(generate_series(0, 1 + doc_id % 3),
             k -> 'cue ' || doc_id || ' line ' || k), 'string_agg', chr(10))
             AS text
         FROM documents WHERE doc_id < 300""",

    "q_doc_text" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 40",

    // BOMs strip, labels follow the id rotation, text is identity
    "q_decode_text" ->
      """SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-8'
                           WHEN 2 THEN 'utf-16le' ELSE 'utf-16be' END AS charset,
           text
         FROM documents WHERE doc_id < 200""",

    // the MIME body walk strips trailing whitespace from the text/plain
    // leaf, so the oracle mirrors it; subject/from/date are closed-form
    "q_source_eml" ->
      """SELECT 'Doc ' || doc_id || ' café' AS subject,
           'sender' || doc_id || '@example.org' AS mail_from,
           'Thu, 1 Jan 1970 00:00:00 +0000' AS "date",
           regexp_replace(text, '\s+$', '') AS text
         FROM documents WHERE doc_id < 40""",

    "q_source_mbox" ->
      """SELECT (row_number() OVER (ORDER BY doc_id))::BIGINT AS message,
           'Doc ' || doc_id || ' café' AS subject,
           'sender' || doc_id || '@example.org' AS mail_from,
           'Thu, 1 Jan 1970 00:00:00 +0000' AS "date",
           regexp_replace(text, '\s+$', '') AS text
         FROM documents WHERE doc_id < 40""",

    // member payloads are byte-exact, so key/ext/size/text are all
    // closed-form; ext splits at the FIRST dot (meta.json, not json)
    "q_source_tar" ->
      """SELECT key, ext, n_bytes, text FROM (
           SELECT 'samples/d' || lpad(doc_id::VARCHAR, 3, '0') AS key,
                  'txt' AS ext,
                  octet_length(encode(text))::BIGINT AS n_bytes, text
           FROM documents WHERE doc_id < 60
           UNION ALL
           SELECT 'samples/d' || lpad(doc_id::VARCHAR, 3, '0'),
                  'meta.json',
                  octet_length(encode('{"id":' || doc_id || '}'))::BIGINT,
                  '{"id":' || doc_id || '}'
           FROM documents WHERE doc_id < 60)""",

    // the CDC merge rebuilt independently: latest change per key via a
    // descending-seq window rank, then FULL JOIN + delete filter
    "q_apply_changes" ->
      """WITH snap AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
         chg AS (
           SELECT c_custkey, 'U1 ' || c_name AS c_name, 'SEGU1' AS c_mktsegment,
                  1 AS seq, 'u' AS op FROM customer WHERE c_custkey % 5 = 0
           UNION ALL
           SELECT c_custkey, 'U3 ' || c_name, 'SEGU3', 3, 'u'
           FROM customer WHERE c_custkey % 5 = 0
           UNION ALL
           SELECT c_custkey, '', '', 2, 'D' FROM customer WHERE c_custkey % 7 = 0
           UNION ALL
           SELECT c_custkey + 10000000, 'NEW ' || c_custkey, 'SEGN', 1, 'u'
           FROM customer),
         latest AS (
           SELECT c_custkey, c_name, c_mktsegment, op FROM (
             SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
             FROM chg)
           WHERE rn = 1)
         SELECT coalesce(s.c_custkey, l.c_custkey) AS c_custkey,
                CASE WHEN l.op IS NOT NULL THEN l.c_name ELSE s.c_name END AS c_name,
                CASE WHEN l.op IS NOT NULL THEN l.c_mktsegment ELSE s.c_mktsegment END AS c_mktsegment
         FROM snap s FULL OUTER JOIN latest l ON s.c_custkey = l.c_custkey
         WHERE l.op IS NULL OR lower(l.op) NOT IN ('d', 'delete')""",

    // Morton keys rebuilt in SQL: fixed-point buckets (integer floor
    // division — values are non-negative here, so signed == unsigned)
    // plus the explicit per-bit interleave terms
    "q_zorder" ->
      s"""WITH mm AS (SELECT min(l_orderkey) AS amin, max(l_orderkey) AS amax,
                             min(l_partkey) AS bmin, max(l_partkey) AS bmax FROM lineitem),
          b AS (SELECT l_orderkey, l_partkey,
                  (l_orderkey - amin) // (((amax - amin) >> 8) + 1) AS ba,
                  (l_partkey - bmin) // (((bmax - bmin) >> 8) + 1) AS bb
                FROM lineitem, mm)
          SELECT l_orderkey, l_partkey, ($zorderInterleaveSql)::BIGINT AS zkey FROM b""",

    // cross-parity fuzzy pairs: the q_dedup_jaccard token model with the
    // even->odd side split instead of the a_id < b_id triangle
    "q_similarity_join" ->
      """WITH ws AS (
           SELECT doc_id AS id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS w
           FROM documents),
         idx AS (
           SELECT id, w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i FROM ws),
         toks AS (
           SELECT DISTINCT id,
             CASE WHEN len(w) >= 3 THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS tok
           FROM idx),
         counts AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
         kept AS (
           SELECT toks.* FROM toks
           JOIN (SELECT tok FROM toks GROUP BY tok HAVING count(*) <= 1000) f USING (tok)),
         inter AS (
           SELECT a.id AS left_id, b.id AS right_id, count(*) AS n_common
           FROM kept a JOIN kept b ON a.tok = b.tok
           WHERE a.id % 2 = 0 AND b.id % 2 = 1
           GROUP BY 1, 2)
         SELECT left_id, right_id,
                round(n_common::DOUBLE / (ca.n + cb.n - n_common), 4) AS jaccard
         FROM inter
         JOIN counts ca ON ca.id = left_id
         JOIN counts cb ON cb.id = right_id
         WHERE n_common::DOUBLE / (ca.n + cb.n - n_common) >= 0.7""",

    // shard write + read invert exactly
    "q_tar_sink" ->
      "SELECT 'd' || doc_id AS key, text FROM documents WHERE doc_id < 200",
    "q_tar_sink_zst" ->
      "SELECT 'd' || doc_id AS key, text FROM documents WHERE doc_id < 200",
    "q_dest_zst" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 300",

    // WebM Duration x TimecodeScale; IVF frames x timebase — both
    // closed-form in doc_id (n = 2 + id%3 frames, 48x48)
    "q_video_meta_webm" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'webm' ELSE 'ivf' END AS video_format,
           48 AS video_width, 48 AS video_height,
           (CASE WHEN doc_id % 2 = 0 THEN (2 + doc_id % 3) * 33
                 ELSE (2 + doc_id % 3) * 1000 // 30 END)::BIGINT
             AS video_duration_ms,
           CASE WHEN doc_id % 2 = 0 THEN 'V_VP8' ELSE 'VP80' END AS video_codec
         FROM documents WHERE doc_id < 300""",

    "q_avro_sink" ->
      """SELECT event_id::VARCHAR AS event_id, epoch_us(ts)::VARCHAR AS ts,
           event_type, CAST(round(value * 100) AS BIGINT)::VARCHAR AS cents
         FROM events WHERE event_id < 500""",

    // the streamed merge rebuilt as one batch merge over the
    // concatenated change feed (seqs 1/2 in delta 1, 3/4 in delta 2)
    "q_stream_cdc" ->
      """WITH snap AS (SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey < 2000),
         base AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 2000),
         chg AS (
           SELECT c_custkey, 'U1 ' || c_name AS c_name, 'SEGU1' AS c_mktsegment,
                  1 AS seq, 'u' AS op FROM base WHERE c_custkey % 5 = 0
           UNION ALL
           SELECT c_custkey, '', '', 2, 'D' FROM base WHERE c_custkey % 7 = 0
           UNION ALL
           SELECT c_custkey, 'U3 ' || c_name, 'SEGU3', 3, 'u'
           FROM base WHERE c_custkey % 5 = 0
           UNION ALL
           SELECT c_custkey + 10000000, 'NEW ' || c_custkey, 'SEGN', 4, 'u' FROM base),
         latest AS (
           SELECT c_custkey, c_name, c_mktsegment, op FROM (
             SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
             FROM chg)
           WHERE rn = 1)
         SELECT coalesce(s.c_custkey, l.c_custkey) AS c_custkey,
                CASE WHEN l.op IS NOT NULL THEN l.c_name ELSE s.c_name END AS c_name,
                CASE WHEN l.op IS NOT NULL THEN l.c_mktsegment ELSE s.c_mktsegment END AS c_mktsegment
         FROM snap s FULL OUTER JOIN latest l ON s.c_custkey = l.c_custkey
         WHERE l.op IS NULL OR lower(l.op) NOT IN ('d', 'delete')""",

    // every per-row keep decision replayed: same md5 draw, same integer
    // threshold (w * 2^32) // 10^6
    "q_weighted_sample" ->
      """WITH d AS (
           SELECT doc_id, least(1000000, length(text) * 1500)::BIGINT AS w
           FROM documents WHERE doc_id < 500)
         SELECT doc_id, w FROM d
         WHERE CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8)) AS UBIGINT)
               < (w * 4294967296) // 1000000""",

    // the JL projection rebuilt value-by-value: fixed-point quantize,
    // splitmix64 sign bits in HUGEINT, exact integer sums (validated
    // against an independent Python model before landing)
    "q_dim_reduce" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
          q AS (
            SELECT vec_id, ix.i,
                   CAST(floor(CAST(embedding[ix.i + 1] AS DOUBLE) * 1024) AS BIGINT) AS qv
            FROM e, (SELECT unnest(range(0, 64)) AS i) ix),
          terms AS (
            SELECT vec_id, j.j,
                   CASE WHEN ${SketchSql.sm64("42 + j.j * 1048573 + i")} >= 9223372036854775808::HUGEINT
                        THEN -qv ELSE qv END AS t
            FROM q, (SELECT unnest(range(0, 8)) AS j) j)
          SELECT vec_id, j, CAST(sum(t) AS BIGINT) AS y
          FROM terms GROUP BY vec_id, j""",

    // SCD2 intervals rebuilt with lag (change-only collapse) + lead
    "q_scd2" ->
      """WITH src AS (SELECT o_custkey, o_orderkey AS seq, o_orderstatus FROM orders),
         dedup AS (
           SELECT o_custkey, seq, o_orderstatus FROM (
             SELECT *, lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY seq) AS prev
             FROM src)
           WHERE prev IS NULL OR prev <> o_orderstatus)
         SELECT o_custkey, seq, o_orderstatus, seq AS valid_from,
                lead(seq) OVER (PARTITION BY o_custkey ORDER BY seq) AS valid_to,
                CASE WHEN lead(seq) OVER (PARTITION BY o_custkey ORDER BY seq) IS NULL
                     THEN 'true' ELSE 'false' END AS is_current
         FROM dedup""",

    // markup generation + html_to_text extraction invert exactly for
    // clean single-spaced text, so the oracle is the identity round-trip
    "q_source_epub" ->
      """SELECT (row_number() OVER (ORDER BY doc_id))::BIGINT AS chapter, text
         FROM documents WHERE doc_id < 40""",

    "q_source_xlsb" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    "q_source_xls" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    // SAS stores numerics as doubles; the all-string model renders them with
    // the double's decimal form, so the oracle casts through DOUBLE first
    "q_source_sas" ->
      "SELECT cast(cast(r_regionkey AS DOUBLE) AS VARCHAR) AS r_regionkey, r_name FROM region",

    "q_source_pdf" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    "q_source_pdf_cmap" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    "q_source_pdf_enc" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    "q_source_wet" ->
      "SELECT 'http://doc.example/' || doc_id AS url, text FROM documents",

    // avro `long` preserves integers, so the key renders without a double cast
    "q_source_avro" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    // dta `long` preserves integers, so the key renders without a double cast
    "q_source_stata" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    // pickle preserves int64, so the key renders without a double cast
    "q_source_pickle" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    // same double-rendering contract for SPSS numerics, zlib variant
    "q_source_zsav" ->
      "SELECT cast(cast(r_regionkey AS DOUBLE) AS VARCHAR) AS r_regionkey, r_name FROM region",

    // same double-rendering contract for SPSS numerics
    "q_source_spss" ->
      "SELECT cast(cast(r_regionkey AS DOUBLE) AS VARCHAR) AS r_regionkey, r_name FROM region",

    // delimited readers are all-string by contract; the zst variants must
    // read identically through the codec layer
    "q_source_csv" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",
    "q_headerless_csv" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",
    "q_source_optional" ->
      """SELECT cast(n_nationkey AS VARCHAR) AS n_nationkey, n_name,
           '' AS n_ghost FROM nation""",
    "q_sink_nulls" ->
      """SELECT cast(c_custkey AS VARCHAR) AS c_custkey,
           CASE WHEN c_custkey % 3 = 0 THEN '' ELSE c_name END AS c_name,
           cast(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS cents
         FROM customer WHERE c_custkey < 1000""",
    "q_multiline_header" ->
      """SELECT cast(r_regionkey AS VARCHAR) AS "Region__Key",
           r_name AS "Region__Name",
           'd' || r_regionkey AS "Detail__Comment" FROM region""",
    "q_source_csv_zst" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",
    "q_source_jsonl_zst" -> "SELECT n_nationkey, n_name FROM nation",
    "q_source_tsv" ->
      "SELECT cast(n_nationkey AS VARCHAR) AS n_nationkey, n_name FROM nation",

    // JSON/XML schema inference keeps integers integral
    "q_source_jsonl" -> "SELECT n_nationkey, n_name FROM nation",
    "q_source_json" -> "SELECT r_regionkey, r_name FROM region",
    "q_source_xml" -> "SELECT r_regionkey, r_name FROM region",

    // html table cells are all-string
    "q_source_html" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    // fixed-width substrings are all-string
    "q_source_fixedwidth" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    // orc/feather/jdbc preserve native types end to end
    "q_source_orc" -> "SELECT r_regionkey, r_name FROM region",
    "q_source_feather" -> "SELECT r_regionkey, r_name FROM region",
    "q_source_jdbc" -> "SELECT r_regionkey, r_name FROM region",

    "q_add_columns" ->
      "SELECT n_nationkey, n_name, 'static' AS tag, n_name || '-' || n_regionkey AS combo FROM nation",

    "q_modify_columns" ->
      "SELECT c_custkey, upper(c_name) AS c_name FROM customer",

    "q_duplicate_columns" ->
      "SELECT n_nationkey, n_name, n_name AS nation_name FROM nation",

    "q_rename_columns" ->
      "SELECT r_regionkey, r_name AS region_name FROM region",

    "q_drop_columns" ->
      "SELECT p_partkey, p_name, p_brand, p_type FROM part",

    "q_keep_columns" ->
      "SELECT s_suppkey, s_name FROM supplier",

    "q_combine_columns" ->
      "SELECT p_partkey, p_brand || '|' || p_type AS brand_type FROM part",

    "q_map_values" ->
      """SELECT o_orderkey, CASE o_orderstatus WHEN 'O' THEN 'OPEN' WHEN 'F' THEN 'FULFILLED' WHEN 'P' THEN 'PENDING' ELSE o_orderstatus END AS o_orderstatus FROM orders""",

    "q_date_format" ->
      "SELECT o_orderkey, strftime(o_orderdate, '%d/%m/%Y') AS od FROM orders",

    "q_snake_case_columns" ->
      "SELECT r_regionkey AS region_key, r_name AS region_name FROM region",
    // snake -> UPPER -> lower ends where snake left it
    "q_case_columns" ->
      "SELECT r_regionkey AS region_key, r_name AS region_name FROM region",
    // the lifecycle is row-preserving; the default jsonl render is
    // all-string
    "q_node_features" ->
      "SELECT cast(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",

    "q_distinct_rows" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q_filter_rows" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'",

    "q_filter_rows_exclude" ->
      "SELECT event_id, event_type, value FROM events WHERE NOT (event_type = 'click' OR value > 100)",

    "q_filter_rows_str" ->
      "SELECT p_partkey, p_type FROM part WHERE regexp_matches(p_type, 'MED')",

    "q_sort_rows" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 20",

    "q_limit_rows" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 5 OFFSET 10",

    "q_flatten" ->
      "SELECT p_partkey, unnest(string_split(p_type, ' ')) AS type_word FROM part",

    "q_join_inner" ->
      "SELECT o_orderkey, o_custkey, c_name, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey",

    "q_join_suffix" ->
      "SELECT c_custkey, c_name AS name_x, s_suppkey, s_name AS name_y FROM customer JOIN supplier ON c_nationkey = s_nationkey",

    "q_join_merge_key" ->
      "SELECT c_custkey, c_nationkey AS nationkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey",

    "q_fill_na" ->
      """SELECT event_id,
           round(coalesce(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END,
                          -1.5), 4) AS value
         FROM events""",

    "q_drop_na" ->
      """SELECT event_id, event_type FROM events
         WHERE event_id % 7 <> 0 AND event_id % 11 <> 0""",

    "q_explode_column" ->
      """SELECT doc_id,
           unnest(generate_series(0, len(string_split(text, ' ')) - 1))::BIGINT AS pos,
           unnest(string_split(text, ' ')) AS word
         FROM documents WHERE doc_id < 50""",

    "q_cast_columns" ->
      """SELECT l_orderkey AS okey, l_quantity AS qty,
           epoch_us(l_shipdate) AS ship_us
         FROM lineitem""",

    "q_subtract_rows" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_orderkey NOT IN
           (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')""",

    "q_intersect_rows" ->
      """SELECT c_mktsegment FROM customer
         INTERSECT ALL
         SELECT c_mktsegment FROM customer WHERE c_custkey % 2 = 0""",

    "q_union" ->
      "SELECT c_name AS name, c_acctbal AS acctbal FROM customer UNION ALL SELECT s_name, s_acctbal FROM supplier",

    "q_union_fill" ->
      "SELECT c_name AS name, c_acctbal AS acctbal FROM customer UNION ALL SELECT s_name, NULL FROM supplier",

    "q_melt" ->
      """SELECT c_custkey, 'c_name' AS melt_variable, c_name AS melt_value FROM customer UNION ALL SELECT c_custkey, 'c_mktsegment', c_mktsegment FROM customer""",

    "q_pivot" ->
      """SELECT n_name,
           max(CASE WHEN r_name = 'AFRICA' THEN n_nationkey END) AS "AFRICA",
           max(CASE WHEN r_name = 'AMERICA' THEN n_nationkey END) AS "AMERICA",
           max(CASE WHEN r_name = 'ASIA' THEN n_nationkey END) AS "ASIA",
           max(CASE WHEN r_name = 'EUROPE' THEN n_nationkey END) AS "EUROPE",
           max(CASE WHEN r_name = 'MIDDLE EAST' THEN n_nationkey END) AS "MIDDLE EAST"
         FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY n_name""",

    "q_group_by" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_quantity) / count(*), 4) AS mean_qty,
           round(min(l_discount), 2) AS min_disc,
           round(max(l_tax), 2) AS max_tax,
           round(stddev_samp(l_extendedprice), 2) AS std_price,
           round(var_samp(l_extendedprice), 0) AS var_price,
           max(l_linestatus) AS max_flag
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q_group_median" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
         FROM lineitem GROUP BY l_returnflag""",

    "q_group_agg" ->
      """SELECT n_regionkey,
           string_agg(n_name, ';' ORDER BY n_name) AS names,
           '[' || string_agg(n_nationkey::VARCHAR, ',' ORDER BY n_nationkey::VARCHAR) || ']' AS keys_json
         FROM nation GROUP BY n_regionkey""",

    "q_group_by_with_rank" ->
      """SELECT o_orderkey, o_custkey,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS rank
         FROM orders""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q_range_join" ->
      """WITH ev AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
         b AS (
           SELECT user_id, min(ts_us) AS lo, max(ts_us) AS hi,
             min(ts_us) + ((max(ts_us) - min(ts_us)) // 2) AS mid
           FROM ev GROUP BY user_id),
         iv AS (
           SELECT user_id, lo AS s, mid AS e, 'early' AS phase FROM b
           UNION ALL
           SELECT user_id, mid AS s, hi + 1 AS e, 'late' AS phase FROM b)
         SELECT e.event_id, e.user_id, e.ts_us, i.phase
         FROM ev e JOIN iv i
           ON e.user_id = i.user_id AND e.ts_us >= i.s AND e.ts_us < i.e""",

    "q_asof_join" ->
      """WITH b AS (
           SELECT user_id, ts, max(value) AS value
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           epoch_us(b.ts) AS purchase_ts_us, round(b.value, 2) AS purchase_value
         FROM events e ASOF LEFT JOIN b
           ON e.user_id = b.user_id AND e.ts >= b.ts""",

    // identical semantics to q_asof_join — the bucketed two-phase carry
    // must be indistinguishable from the plain window to the oracle
    "q_asof_bucketed" ->
      """WITH b AS (
           SELECT user_id, ts, max(value) AS value
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           epoch_us(b.ts) AS purchase_ts_us, round(b.value, 2) AS purchase_value
         FROM events e ASOF LEFT JOIN b
           ON e.user_id = b.user_id AND e.ts >= b.ts""",

    "q_window_agg" ->
      """SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS roll_sum,
           round(lag(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 4)
             AS prev_value,
           row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)::BIGINT
             AS seq
         FROM events""",

    "q_window_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1""",

    "q_sessionize" ->
      """WITH gaps AS (
           SELECT user_id,
             epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap
           FROM events)
         SELECT user_id,
           sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
           count(*) AS n_events
         FROM gaps GROUP BY user_id""",

    "q_json_extract" ->
      """WITH ev AS (SELECT event_id,
                '{"a": {"b": ' || (event_id % 7) || '}, "tags": ["' || event_type || '"]}' AS js
              FROM events)
         SELECT event_id,
           json_extract_string(js, '$.a.b') AS ab,
           json_extract_string(js, '$.tags[0]') AS tag0,
           json_extract_string(js, '$.nope') AS miss
         FROM ev""",

    "q_json_extract_top" ->
      """WITH ev AS (SELECT event_id,
                '{"k": ' || (event_id % 7) || ', "tag": "' || event_type || '"}' AS js
              FROM events)
         SELECT event_id,
           json_extract_string(js, '$.k') AS k,
           json_extract_string(js, '$.tag') AS tag,
           json_extract_string(js, '$.nope') AS miss
         FROM ev""",

    "q_group_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n,
           sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "q_group_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n,
           sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",

    "q_window_rank" ->
      """SELECT event_id, user_id,
           rank() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)::BIGINT
             AS rnk,
           dense_rank() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)::BIGINT
             AS drnk,
           ntile(4) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)::BIGINT
             AS quartile,
           round(percent_rank() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 6)
             AS prank,
           round(first_value(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS first_v,
           round(last_value(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS last_v
         FROM events""",

    "q_resample" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
         agg AS (SELECT user_id, us - us % 3600000000 AS b,
                   count(*) AS n, sum(value) AS sv
                 FROM ev GROUP BY 1, 2),
         grid AS (SELECT user_id,
                    unnest(generate_series(min(b), max(b), 3600000000)) AS b
                  FROM agg GROUP BY user_id)
         SELECT g.user_id, g.b AS bucket_us, coalesce(a.n, 0)::BIGINT AS n,
           round(a.sv, 2) AS sum_value
         FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.b = a.b""",

    "q_fill_forward" ->
      """SELECT event_id, user_id,
           round(last_value(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
               IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS value_filled
         FROM events""",

    "q_time_window_agg" ->
      """SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS hr_sum
         FROM events""",

    "q_interpolate" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t,
                CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
              FROM events),
         w AS (SELECT event_id, user_id, t, v,
            last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wp AS pt,
            last_value(v IGNORE NULLS) OVER wp AS pv,
            first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wn AS nt,
            first_value(v IGNORE NULLS) OVER wn AS nv
          FROM ev
          WINDOW wp AS (PARTITION BY user_id ORDER BY t, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 wn AS (PARTITION BY user_id ORDER BY t, event_id
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         SELECT event_id, user_id,
           round(CASE WHEN v IS NOT NULL THEN v
                 WHEN pt IS NULL OR nt IS NULL THEN NULL
                 ELSE pv + (nv - pv) * ((t - pt)::DOUBLE / (nt - pt)::DOUBLE)
                 END, 4) AS value_interp
         FROM w""",

    "q_text_stats" ->
      """SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]')) AS n_tokens,
           round(list_sum(list_transform(string_split(text, ' '), w -> len(w)))::DOUBLE
                 / len(string_split(text, ' ')), 4) AS avg_word_len,
           round(len(list_filter(string_split(text, ' '),
                 w -> w IN ('the','a','of','and','to')))::DOUBLE
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
         FROM documents""",


    // training AND scoring rebuilt in SQL: same markers, same seed slice,
    // same (count desc, tri asc) rank profiles, same OOV = topK+1 sum,
    // same (score asc, lang asc) arg-min
    // integer-quantized NB rebuilt end-to-end: training counts, bitLength
    // quantization (floor(log2(x))+1), md5-hex3 buckets, per-occurrence
    // scoring, argmax with label-asc ties
    "q_nb_classify" ->
      """WITH built AS (
           SELECT doc_id, lang,
             lower(text || repeat(CASE lang
               WHEN 'en' THEN ' the and of to is it'
               WHEN 'fr' THEN ' le la et les des une est'
               WHEN 'es' THEN ' el los las una es y'
               WHEN 'de' THEN ' der die das und ist ein'
               ELSE ' 的 是 了 在 和 有' END, 3)) AS t
           FROM documents),
         toksf AS (
           SELECT doc_id, lang, tok
           FROM (SELECT doc_id, lang,
                   unnest(string_split_regex(t, '\s+')) AS tok FROM built)
           WHERE tok <> ''),
         counts AS (
           SELECT lang AS label, substr(md5(tok), 1, 3) AS b, count(*) AS cnt
           FROM toksf WHERE doc_id % 5 = 0 GROUP BY 1, 2),
         docs AS (
           SELECT lang AS label, count(*) AS docs
           FROM built WHERE doc_id % 5 = 0 GROUP BY 1),
         norms AS (
           SELECT label, cast(floor(log2(sum(cnt) + 4096)) AS BIGINT) + 1 AS norm
           FROM counts GROUP BY 1),
         priors AS (
           SELECT label, cast(floor(log2(docs)) AS BIGINT) + 1 AS prior FROM docs),
         doctoks AS (
           SELECT doc_id, substr(md5(tok), 1, 3) AS b FROM toksf),
         scored AS (
           SELECT dt.doc_id, l.label,
             sum(coalesce(cast(floor(log2(c.cnt + 1)) AS BIGINT) + 1, 1) - n.norm)
               AS tokscore
           FROM doctoks dt
           CROSS JOIN (SELECT label FROM docs) l
           LEFT JOIN counts c ON c.label = l.label AND c.b = dt.b
           JOIN norms n ON n.label = l.label
           GROUP BY 1, 2)
         SELECT doc_id, label AS label_pred
         FROM (SELECT s.doc_id, s.label,
                 row_number() OVER (PARTITION BY s.doc_id
                   ORDER BY s.tokscore + p.prior DESC, s.label ASC) AS rn
               FROM scored s JOIN priors p ON p.label = s.label)
         WHERE rn = 1""",

    "q_model_eval" ->
      """WITH built AS (
           SELECT doc_id, lang,
             lower(text || repeat(CASE lang
               WHEN 'en' THEN ' the and of to is it'
               WHEN 'fr' THEN ' le la et les des une est'
               WHEN 'es' THEN ' el los las una es y'
               WHEN 'de' THEN ' der die das und ist ein'
               ELSE ' 的 是 了 在 和 有' END, 3)) AS t
           FROM documents),
         toksf AS (
           SELECT doc_id, lang, tok
           FROM (SELECT doc_id, lang,
                   unnest(string_split_regex(t, '\s+')) AS tok FROM built)
           WHERE tok <> ''),
         counts AS (
           SELECT lang AS label, substr(md5(tok), 1, 3) AS b, count(*) AS cnt
           FROM toksf WHERE doc_id % 5 = 0 GROUP BY 1, 2),
         docs AS (
           SELECT lang AS label, count(*) AS docs
           FROM built WHERE doc_id % 5 = 0 GROUP BY 1),
         norms AS (
           SELECT label, cast(floor(log2(sum(cnt) + 4096)) AS BIGINT) + 1 AS norm
           FROM counts GROUP BY 1),
         priors AS (
           SELECT label, cast(floor(log2(docs)) AS BIGINT) + 1 AS prior FROM docs),
         doctoks AS (
           SELECT doc_id, substr(md5(tok), 1, 3) AS b FROM toksf),
         scored AS (
           SELECT dt.doc_id, l.label,
             sum(coalesce(cast(floor(log2(c.cnt + 1)) AS BIGINT) + 1, 1) - n.norm)
               AS tokscore
           FROM doctoks dt
           CROSS JOIN (SELECT label FROM docs) l
           LEFT JOIN counts c ON c.label = l.label AND c.b = dt.b
           JOIN norms n ON n.label = l.label
           GROUP BY 1, 2),
         preds AS (
           SELECT doc_id, label AS label_pred
           FROM (SELECT s.doc_id, s.label,
                   row_number() OVER (PARTITION BY s.doc_id
                     ORDER BY s.tokscore + p.prior DESC, s.label ASC) AS rn
                 FROM scored s JOIN priors p ON p.label = s.label)
           WHERE rn = 1),
         held AS (
           SELECT d.lang AS label, p.label_pred AS pred
           FROM preds p JOIN documents d USING (doc_id)
           WHERE d.doc_id % 5 <> 0),
         truth AS (
           SELECT label, count(*)::BIGINT AS support,
             sum(CASE WHEN label = pred THEN 1 ELSE 0 END)::BIGINT AS tp
           FROM held GROUP BY 1),
         predside AS (
           SELECT pred AS label, count(*)::BIGINT AS predicted
           FROM held WHERE pred IS NOT NULL GROUP BY 1)
         SELECT coalesce(t.label, p.label) AS label,
           coalesce(t.support, 0)::BIGINT AS support,
           coalesce(t.tp, 0)::BIGINT AS tp,
           (coalesce(p.predicted, 0) - coalesce(t.tp, 0))::BIGINT AS fp,
           (coalesce(t.support, 0) - coalesce(t.tp, 0))::BIGINT AS fn,
           CASE WHEN coalesce(p.predicted, 0) > 0
                THEN ((coalesce(t.tp, 0) * 1000000) // p.predicted)::BIGINT END
             AS precision_ppm,
           CASE WHEN coalesce(t.support, 0) > 0
                THEN ((coalesce(t.tp, 0) * 1000000) // t.support)::BIGINT END
             AS recall_ppm
         FROM truth t FULL OUTER JOIN predside p ON t.label = p.label""",

    "q_lang_id_trained" ->
      """WITH built AS (
           SELECT doc_id, lang,
             lower(text || repeat(CASE lang
               WHEN 'en' THEN ' the and of to is it'
               WHEN 'fr' THEN ' le la et les des une est'
               WHEN 'es' THEN ' el los las una es y'
               WHEN 'de' THEN ' der die das und ist ein'
               ELSE ' 的 是 了 在 和 有' END, 3)) AS t
           FROM documents),
         seedtris AS (
           SELECT lang, substr(t, i, 3) AS tri
           FROM built, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
           WHERE doc_id % 5 = 0),
         prof AS (
           SELECT lang, tri,
             row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, tri ASC) AS rank
           FROM seedtris GROUP BY lang, tri
           QUALIFY rank <= 300),
         langs AS (SELECT DISTINCT lang FROM built WHERE doc_id % 5 = 0),
         doctris AS (
           SELECT doc_id, substr(t, i, 3) AS tri
           FROM built, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)),
         scores AS (
           SELECT d.doc_id, l.lang, sum(coalesce(p.rank, 301))::BIGINT AS score
           FROM doctris d CROSS JOIN langs l
           LEFT JOIN prof p ON p.lang = l.lang AND p.tri = d.tri
           GROUP BY d.doc_id, l.lang),
         best AS (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY doc_id ORDER BY score ASC, lang ASC) AS rk
           FROM scores)
         SELECT doc_id, lang AS lang_pred FROM best WHERE rk = 1""",

    "q_lang_id" ->
      """WITH scores AS (
           SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '), w -> w IN ('the','a','of','and','to','in','is','it'))) AS s_en,
             len(list_filter(string_split(lower(text), ' '), w -> w IN ('le','la','et','les','des','un','une','est'))) AS s_fr,
             len(list_filter(string_split(lower(text), ' '), w -> w IN ('el','de','y','los','las','un','una','es'))) AS s_es,
             len(list_filter(string_split(lower(text), ' '), w -> w IN ('der','die','das','und','ist','ein','eine','nicht'))) AS s_de,
             len(list_filter(string_split(lower(text), ' '), w -> w IN ('的','是','了','在','和','有','我','不'))) AS s_zh
           FROM documents)
         SELECT doc_id, CASE
           WHEN s_en = greatest(s_en, s_fr, s_es, s_de, s_zh) AND s_en > 0 THEN 'en'
           WHEN s_fr = greatest(s_en, s_fr, s_es, s_de, s_zh) AND s_fr > 0 THEN 'fr'
           WHEN s_es = greatest(s_en, s_fr, s_es, s_de, s_zh) AND s_es > 0 THEN 'es'
           WHEN s_de = greatest(s_en, s_fr, s_es, s_de, s_zh) AND s_de > 0 THEN 'de'
           WHEN s_zh = greatest(s_en, s_fr, s_es, s_de, s_zh) AND s_zh > 0 THEN 'zh'
           ELSE 'und' END AS lang_pred
         FROM scores""",

    "q_quality" ->
      """SELECT doc_id,
           round((
             (CASE WHEN len(text) BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.0 END) +
             (CASE WHEN coalesce(len(list_filter(string_split(text, ' '),
                   w -> w IN ('the','a','of','and','to')))::DOUBLE
                   / len(string_split(text, ' ')), 0) > 0.01 THEN 1.0 ELSE 0.0 END) +
             (CASE WHEN coalesce((len(text) - len(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE
                   / len(text), 0) < 0.3 THEN 1.0 ELSE 0.0 END)
           ) / 3.0, 4) AS quality,
           round((len(text) - len(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE / len(text), 4) AS punct_ratio
         FROM documents""",

    // mirrors htmlToText replace-for-replace (RE2-safe patterns, 'g' flag)
    "q_html_to_text" ->
      """SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace('<html><head><title>t</title><script>var x=1;</script></head><body><p>'
                 || text ||
               '</p><!-- c --><div>footer&amp;end</div></body></html>',
               '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?is)<head[^>]*>.*?</head>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g'),
               '(?i)<(br|/p|/div|/h[1-6]|/li|/tr)[^>]*>', chr(10), 'g'),
               '(?s)<[^>]*>', ' ', 'g'),
               '&nbsp;', ' ', 'g'),
               '&lt;', '<', 'g'),
               '&gt;', '>', 'g'),
               '&quot;', '"', 'g'),
               '&#39;', '''', 'g'),
               '&amp;', '&', 'g'),
               '[ \t]+', ' ', 'g'),
               ' ?\n ?', chr(10), 'g'),
               '\n{2,}', chr(10), 'g'), ' ' || chr(10) || chr(9)) AS text
         FROM documents""",

    // mirrors withC4Clean term by term: same line predicate, same join
    "q_c4_clean" ->
      """WITH base AS (
           SELECT doc_id, text,
             list_filter(string_split(text, chr(10)), l ->
               regexp_matches(rtrim(l), '[.!?"]$')
               AND len(list_filter(regexp_split_to_array(l, '\s+'), w -> w <> '')) >= 3
               AND NOT contains(lower(l), 'javascript')) AS kept
           FROM documents)
         SELECT doc_id,
           coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
           len(kept)::BIGINT AS n_kept_lines,
           (len(kept) >= 1 AND NOT contains(lower(text), 'lorem ipsum')
             AND NOT contains(text, '{')) AS c4_keep
         FROM base""",

    // mirrors withGopherQuality's integer-math thresholds term by term
    "q_quality_filter" ->
      """WITH base AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS words,
             string_split(text, chr(10)) AS lines,
             len(text) - len(replace(text, '#', ''))
               + (len(text) - len(replace(text, '...', ''))) // 3 AS n_symbols
           FROM documents),
         stats AS (
           SELECT doc_id,
             len(words)::BIGINT AS n_words,
             coalesce(list_aggregate(list_transform(words, x -> len(x)), 'sum'), 0)::BIGINT AS total_word_len,
             len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha_words,
             n_symbols::BIGINT AS n_symbols,
             len(lines)::BIGINT AS n_lines,
             len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]')))::BIGINT AS n_bullet_lines,
             len(list_filter(lines, l -> ends_with(rtrim(l), '...')))::BIGINT AS n_ellipsis_lines,
             len(list_filter(['the','be','to','of','and','that','have','with'],
                 s -> list_contains(list_transform(words, w -> lower(w)), s)))::BIGINT AS stop_hits
           FROM base)
         SELECT *,
           (n_words BETWEEN 10 AND 100000
             AND total_word_len >= 3 * n_words AND total_word_len <= 10 * n_words
             AND 10 * n_symbols <= n_words
             AND 10 * n_bullet_lines <= 9 * n_lines
             AND 10 * n_ellipsis_lines <= 3 * n_lines
             AND 5 * n_alpha_words >= 4 * n_words
             AND stop_hits >= 2) AS gopher_keep
         FROM stats""",

    "q_dedup_exact" ->
      "SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_count FROM documents GROUP BY 1",

    // exact substring dedup: windows keyed by CONTENT here (the engine
    // folds them to xxhash64 before its shuffle — same grouping modulo a
    // 64-bit collision); an occurrence is flagged iff an earlier (doc_id,
    // pos) occurrence of the same 10-token window exists
    "q_dedup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         wins AS (SELECT doc_id, i AS pos, array_to_string(w[i:i+9], ' ') AS win
                  FROM toks, unnest(generate_series(1, len(w) - 9)) t(i)),
         r AS (SELECT doc_id, pos,
                      row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
               FROM wins)
         SELECT doc_id, pos FROM r WHERE rn > 1""",

    // the removal pass: a token is deleted iff covered by any flagged
    // window of its document; single-space rejoin of the survivors (empty
    // tokens preserved, so unflagged docs reproduce their text exactly)
    "q_dedup_substring" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         wins AS (SELECT doc_id, i AS pos, array_to_string(w[i:i+9], ' ') AS win
                  FROM toks, unnest(generate_series(1, len(w) - 9)) t(i)),
         r AS (SELECT doc_id, pos,
                      row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
               FROM wins),
         flag AS (SELECT doc_id, pos FROM r WHERE rn > 1),
         tok AS (SELECT doc_id, i, w[i] AS tk
                 FROM toks, unnest(generate_series(1, len(w))) t(i)),
         kept AS (SELECT t.doc_id, t.i, t.tk FROM tok t
                  WHERE NOT EXISTS (SELECT 1 FROM flag f
                    WHERE f.doc_id = t.doc_id AND f.pos <= t.i AND t.i < f.pos + 10))
         SELECT d.doc_id,
                CASE WHEN EXISTS (SELECT 1 FROM flag f WHERE f.doc_id = d.doc_id)
                     THEN coalesce((SELECT string_agg(k.tk, ' ' ORDER BY k.i)
                                    FROM kept k WHERE k.doc_id = d.doc_id), '')
                     ELSE d.text END AS text
         FROM documents d""",

    // paragraph dedup: paragraphs keyed by CONTENT here (the engine folds
    // them to xxhash64 — same grouping modulo a 64-bit collision);
    // whitespace-only paragraphs are never flagged. Mirrors the gate's
    // footer augmentation (see the queries entry for why).
    "q_dedup_paragraphs" ->
      """WITH aug AS (SELECT doc_id, text || chr(10) || 'subscribe to our newsletter' AS text
                      FROM documents),
         p AS (SELECT doc_id, i, w[i] AS para
                  FROM (SELECT doc_id, string_split(text, chr(10)) AS w FROM aug) t,
                       unnest(generate_series(1, len(w))) u(i)),
         r AS (SELECT doc_id, i AS pos,
                      row_number() OVER (PARTITION BY para ORDER BY doc_id, i) AS rn
               FROM p WHERE trim(para) <> '')
         SELECT doc_id, pos FROM r WHERE rn > 1""",

    // the removal pass: flagged paragraph indices deleted, remainder
    // rejoined on the delimiter in order (blank separators always survive)
    "q_dedup_par_strip" ->
      """WITH aug AS (SELECT doc_id, text || chr(10) || 'subscribe to our newsletter' AS text
                      FROM documents),
         p AS (SELECT doc_id, i, w[i] AS para
                  FROM (SELECT doc_id, string_split(text, chr(10)) AS w FROM aug) t,
                       unnest(generate_series(1, len(w))) u(i)),
         r AS (SELECT doc_id, i AS pos,
                      row_number() OVER (PARTITION BY para ORDER BY doc_id, i) AS rn
               FROM p WHERE trim(para) <> ''),
         flag AS (SELECT doc_id, pos FROM r WHERE rn > 1),
         kept AS (SELECT p.doc_id, p.i, p.para FROM p
                  WHERE NOT EXISTS (SELECT 1 FROM flag f
                    WHERE f.doc_id = p.doc_id AND f.pos = p.i)),
         agg AS (SELECT doc_id, string_agg(para, chr(10) ORDER BY i) AS txt
                 FROM kept GROUP BY doc_id)
         SELECT d.doc_id,
                CASE WHEN EXISTS (SELECT 1 FROM flag f WHERE f.doc_id = d.doc_id)
                     THEN coalesce((SELECT a.txt FROM agg a WHERE a.doc_id = d.doc_id), '')
                     ELSE d.text END AS text
         FROM aug d""",

    "q_dedup_jaccard" ->
      """WITH ws AS (
           SELECT doc_id AS id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS w
           FROM documents),
         idx AS (
           SELECT id, w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i FROM ws),
         toks AS (
           SELECT DISTINCT id,
             CASE WHEN len(w) >= 3 THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS tok
           FROM idx),
         counts AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
         kept AS (
           SELECT toks.* FROM toks
           JOIN (SELECT tok FROM toks GROUP BY tok HAVING count(*) <= 1000) f USING (tok)),
         inter AS (
           SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
           FROM kept a JOIN kept b ON a.tok = b.tok AND a.id < b.id
           GROUP BY 1, 2)
         SELECT a_id, b_id, round(n_common::DOUBLE / (ca.n + cb.n - n_common), 4) AS jaccard
         FROM inter
         JOIN counts ca ON ca.id = a_id
         JOIN counts cb ON cb.id = b_id
         WHERE n_common::DOUBLE / (ca.n + cb.n - n_common) >= 0.7""",

    // hash-min connected components ≡ min label reachable over symmetrized
    // pair edges, which a recursive CTE computes directly
    "q_dedup_groups" ->
      """WITH RECURSIVE ws AS (
           SELECT doc_id AS id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS w
           FROM documents),
         idx AS (
           SELECT id, w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i FROM ws),
         toks AS (
           SELECT DISTINCT id,
             CASE WHEN len(w) >= 3 THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS tok
           FROM idx),
         counts AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
         kept AS (
           SELECT toks.* FROM toks
           JOIN (SELECT tok FROM toks GROUP BY tok HAVING count(*) <= 1000) f USING (tok)),
         inter AS (
           SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
           FROM kept a JOIN kept b ON a.tok = b.tok AND a.id < b.id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN counts ca ON ca.id = a_id
           JOIN counts cb ON cb.id = b_id
           WHERE n_common::DOUBLE / (ca.n + cb.n - n_common) >= 0.7),
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION ALL SELECT b_id, a_id FROM pairs),
         reach(id, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, reach.r FROM reach, edges e WHERE e.src = reach.id)
         SELECT id, min(r) AS group_rep FROM reach GROUP BY id""",

    // end-to-end dedup_near keep-set: same pair + CC computation, keeping
    // only each group's representative (min reachable id = own id)
    // mirrors dedupNearIncremental: pairs over the full collection (the
    // restricted probe loses only corpus-corpus pairs, which the predicates
    // never consult); a batch doc (id%5=0) is dropped when it is the b-side
    // of any pair (earlier-batch or corpus partner) or the a-side of a
    // corpus pair
    "q_dedup_incremental" ->
      """WITH ws AS (
           SELECT doc_id AS id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS w
           FROM documents),
         idx AS (
           SELECT id, w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i FROM ws),
         toks AS (
           SELECT DISTINCT id,
             CASE WHEN len(w) >= 3 THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS tok
           FROM idx),
         counts AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
         kept AS (
           SELECT toks.* FROM toks
           JOIN (SELECT tok FROM toks GROUP BY tok HAVING count(*) <= 1000) f USING (tok)),
         inter AS (
           SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
           FROM kept a JOIN kept b ON a.tok = b.tok AND a.id < b.id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN counts ca ON ca.id = a_id
           JOIN counts cb ON cb.id = b_id
           WHERE n_common::DOUBLE / (ca.n + cb.n - n_common) >= 0.7)
         SELECT doc_id FROM documents
         WHERE doc_id % 5 = 0
           AND NOT EXISTS (SELECT 1 FROM pairs p
             WHERE p.b_id = doc_id
                OR (p.a_id = doc_id AND p.b_id % 5 <> 0))""",

    // identical by design: the indexed path must reproduce the text path
    "q_dedup_incr_indexed" ->
      """WITH ws AS (
           SELECT doc_id AS id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS w
           FROM documents),
         idx AS (
           SELECT id, w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i FROM ws),
         toks AS (
           SELECT DISTINCT id,
             CASE WHEN len(w) >= 3 THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS tok
           FROM idx),
         counts AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
         kept AS (
           SELECT toks.* FROM toks
           JOIN (SELECT tok FROM toks GROUP BY tok HAVING count(*) <= 1000) f USING (tok)),
         inter AS (
           SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
           FROM kept a JOIN kept b ON a.tok = b.tok AND a.id < b.id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN counts ca ON ca.id = a_id
           JOIN counts cb ON cb.id = b_id
           WHERE n_common::DOUBLE / (ca.n + cb.n - n_common) >= 0.7)
         SELECT doc_id FROM documents
         WHERE doc_id % 5 = 0
           AND NOT EXISTS (SELECT 1 FROM pairs p
             WHERE p.b_id = doc_id
                OR (p.a_id = doc_id AND p.b_id % 5 <> 0))""",

    // two-stage incremental semantics: stage 1 dedups delta1 (doc_id%5<>0)
    // within itself (pair a<b condemns b); stage 2 dedups delta2 against
    // stage 1's SURVIVORS (not the raw corpus — a doc that died in stage 1
    // condemns nobody) and within itself
    "q_stream_ingest_text" -> StreamIngestTextSql,

    // the DOCUMENT face must reproduce the text face's survivor sets
    // exactly: doc_text extraction is the identity over the rendered
    // rtf/docx deltas, so the SAME oracle applies verbatim
    "q_stream_ingest_doc" -> StreamIngestTextSql.replace("doc_id < 2000", "doc_id < 1000"),

        // closed-form keep-set: delta 1 (ids < 200) is 200 distinct pHash
    // groups (all kept, batch 0); delta 2 keeps only the novel groups
    // 240-249 — ids 250-289 are perturbed re-encodes of groups 0-39
    // already in the persisted index
    "q_stream_ingest_image" ->
      """SELECT doc_id AS media_id, 0::BIGINT AS batch FROM documents WHERE doc_id < 200
         UNION ALL
         SELECT doc_id AS media_id, 1::BIGINT AS batch FROM documents
         WHERE doc_id >= 240 AND doc_id < 250""",

    // video: delta 1 keeps all 100 distinct bases; delta 2 keeps only
    // the 10 novel videos (100-149 re-encode indexed bases 0-49 and drop
    // via the frame index; 300-309 are container twins of 200-209 and
    // drop within-batch to the smaller id)
    "q_stream_ingest_video" ->
      """SELECT doc_id AS media_id, 0::BIGINT AS batch FROM documents WHERE doc_id < 100
         UNION ALL
         SELECT doc_id AS media_id, 1::BIGINT AS batch FROM documents
         WHERE doc_id >= 200 AND doc_id < 210""",

    // same closed form: audio fingerprints key on id%250 and the >= 250
    // double-amplitude cross-container re-encodes collide exactly
    "q_stream_ingest_audio" ->
      """SELECT doc_id AS media_id, 0::BIGINT AS batch FROM documents WHERE doc_id < 200
         UNION ALL
         SELECT doc_id AS media_id, 1::BIGINT AS batch FROM documents
         WHERE doc_id >= 240 AND doc_id < 250""",

    // lossy face: same delta discipline; ids >= 250 are near-dup copies
    // of indexed bases and drop, 240..249 are new bases and survive
    "q_stream_ingest_audio_lossy" ->
      """SELECT doc_id AS media_id, 0::BIGINT AS batch FROM documents WHERE doc_id < 200
         UNION ALL
         SELECT doc_id AS media_id, 1::BIGINT AS batch FROM documents
         WHERE doc_id >= 240 AND doc_id < 250""",

    "q_dedup_near" ->
      """WITH RECURSIVE ws AS (
           SELECT doc_id AS id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS w
           FROM documents),
         idx AS (
           SELECT id, w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i FROM ws),
         toks AS (
           SELECT DISTINCT id,
             CASE WHEN len(w) >= 3 THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS tok
           FROM idx),
         counts AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
         kept AS (
           SELECT toks.* FROM toks
           JOIN (SELECT tok FROM toks GROUP BY tok HAVING count(*) <= 1000) f USING (tok)),
         inter AS (
           SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
           FROM kept a JOIN kept b ON a.tok = b.tok AND a.id < b.id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN counts ca ON ca.id = a_id
           JOIN counts cb ON cb.id = b_id
           WHERE n_common::DOUBLE / (ca.n + cb.n - n_common) >= 0.7),
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION ALL SELECT b_id, a_id FROM pairs),
         reach(id, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, reach.r FROM reach, edges e WHERE e.src = reach.id)
         SELECT id AS doc_id FROM reach GROUP BY id HAVING min(r) = id""",

    // threshold hex literals are Sampling.thresholdHex(rate):
    // 0.2 → 33333333, 0.5 → 80000000, 0.1 → 19999999
    "q_sample" ->
      "SELECT doc_id, text FROM documents WHERE substr(md5(text), 1, 8) < '33333333'",

    "q_sample_exact" ->
      """SELECT doc_id, source FROM documents
         ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT 120""",

    "q_domain_cap" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
           FROM documents) WHERE rn <= 10""",

    // mirrors rebalanceToMixture + thresholdHex exactly: counts over the
    // weighted strata, lambda = min(n/w), rate = lambda*w/n (same IEEE op
    // order), threshold = 'g' when floor(clamped rate * 2^32) overflows
    "q_rebalance" ->
      """WITH w(source, weight) AS (VALUES ('src0', 0.5::DOUBLE), ('src1', 0.3::DOUBLE), ('src2', 0.2::DOUBLE)),
           c AS (SELECT d.source, count(*)::DOUBLE AS n
                 FROM documents d JOIN w USING (source) GROUP BY d.source),
           l AS (SELECT min(n / weight) AS lambda FROM c JOIN w USING (source)),
           r AS (SELECT c.source,
                   (SELECT lambda FROM l) * w.weight / c.n AS rate
                 FROM c JOIN w USING (source)),
           t AS (SELECT source,
                   CASE WHEN floor(least(greatest(rate, 0), 1) * 4294967296) >= 4294967296
                        THEN 'g'
                        ELSE printf('%08x', floor(least(greatest(rate, 0), 1) * 4294967296)::BIGINT)
                   END AS thr
                 FROM r)
         SELECT d.doc_id, d.source
         FROM documents d JOIN t USING (source)
         WHERE substr(md5(d.text), 1, 8) < t.thr""",

    "q_sample_stratified" ->
      """WITH scores AS (
           SELECT doc_id, text,
             len(list_filter(string_split(lower(text), ' '), w -> w IN ('the','a','of','and','to','in','is','it'))) AS s_en,
             len(list_filter(string_split(lower(text), ' '), w -> w IN ('le','la','et','les','des','un','une','est'))) AS s_fr,
             len(list_filter(string_split(lower(text), ' '), w -> w IN ('el','de','y','los','las','un','una','es'))) AS s_es,
             len(list_filter(string_split(lower(text), ' '), w -> w IN ('der','die','das','und','ist','ein','eine','nicht'))) AS s_de,
             len(list_filter(string_split(lower(text), ' '), w -> w IN ('的','是','了','在','和','有','我','不'))) AS s_zh
           FROM documents),
         langs AS (
           SELECT doc_id, text, CASE
             WHEN s_en = greatest(s_en, s_fr, s_es, s_de, s_zh) AND s_en > 0 THEN 'en'
             WHEN s_fr = greatest(s_en, s_fr, s_es, s_de, s_zh) AND s_fr > 0 THEN 'fr'
             WHEN s_es = greatest(s_en, s_fr, s_es, s_de, s_zh) AND s_es > 0 THEN 'es'
             WHEN s_de = greatest(s_en, s_fr, s_es, s_de, s_zh) AND s_de > 0 THEN 'de'
             WHEN s_zh = greatest(s_en, s_fr, s_es, s_de, s_zh) AND s_zh > 0 THEN 'zh'
             ELSE 'und' END AS lang_pred
           FROM scores)
         SELECT doc_id, text, lang_pred FROM langs
         WHERE substr(md5(text), 1, 8) <
           CASE WHEN lang_pred = 'en' THEN '80000000' ELSE '19999999' END""",

    // cumulative tokens STRICTLY BEFORE the doc in (md5(id), id) order must
    // be under budget — one global window here; the Spark side reproduces
    // the same order via the bucketed two-phase prefix sum
    "q_token_budget" ->
      """WITH t AS (
           SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]'))::BIGINT AS n_tokens,
             md5(cast(doc_id AS VARCHAR)) AS h
           FROM documents),
         c AS (
           SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
           FROM t)
         SELECT doc_id, n_tokens FROM c WHERE before < 20000""",


    // the merge table below is the model TRAINED AT GATE SCALE (sf0.01,
    // tools/DumpBpe) embedded as literals — the DumpSimhash pattern; the
    // ENCODE itself is re-implemented independently as a recursive CTE
    // (one lowest-rank leftmost merge per recursion step)
    "q_bpe_count" ->
      """WITH RECURSIVE wf AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
           FROM documents),
         w2 AS (SELECT doc_id, word FROM wf WHERE word <> ''),
         enc(word, toks, done) AS (
           SELECT word, regexp_extract_all(word, '.'), false
           FROM (SELECT DISTINCT word FROM w2)
           UNION ALL
           SELECT word,
             CASE WHEN coalesce(list_min(pr), 999999) >= 999999 THEN toks
                  ELSE toks[1:pos-1] || [toks[pos] || toks[pos+1]] || toks[pos+2:] END,
             coalesce(list_min(pr), 999999) >= 999999
           FROM (
             SELECT word, toks, pr, list_position(pr, list_min(pr)) AS pos
             FROM (
               SELECT word, toks,
                 list_transform(generate_series(1, len(toks) - 1),
                   i -> coalesce(MAP(['e' || chr(31) || 'r', 'i' || chr(31) || 'n', 'o' || chr(31) || 'w', 'o' || chr(31) || 'r', 's' || chr(31) || 't', 'm' || chr(31) || 'er', 'a' || chr(31) || 't', 'l' || chr(31) || 'u', 'a' || chr(31) || 'r', 'p' || chr(31) || 'ar', 'j' || chr(31) || 'o', 'jo' || chr(31) || 'in', 'a' || chr(31) || 's', 'as' || chr(31) || 'h', 'h' || chr(31) || 'ash', 'r' || chr(31) || 'ow', 'at' || chr(31) || 'c', 'atc' || chr(31) || 'h', 'b' || chr(31) || 'atch', 'a' || chr(31) || 'n', 'c' || chr(31) || 'an', 's' || chr(31) || 'can', 'c' || chr(31) || 'o', 'c' || chr(31) || 'u', 'co' || chr(31) || 'lu', 'colu' || chr(31) || 'm', 'colum' || chr(31) || 'n', 'cu' || chr(31) || 'st', 'cust' || chr(31) || 'o', 'custo' || chr(31) || 'mer', 'f' || chr(31) || 'i', 'fi' || chr(31) || 'l', 'fil' || chr(31) || 't', 'filt' || chr(31) || 'er', 'a' || chr(31) || 'l', 'al' || chr(31) || 'l', 'm' || chr(31) || 'all', 's' || chr(31) || 'mall', 'g' || chr(31) || 'e', 'l' || chr(31) || 'ow', 'mer' || chr(31) || 'ge', 's' || chr(31) || 'low', 'c' || chr(31) || 't', 'ct' || chr(31) || 'or', 'd' || chr(31) || 'er', 'e' || chr(31) || 'ctor', 'or' || chr(31) || 'der', 'v' || chr(31) || 'ector', 'in' || chr(31) || 'e', 'l' || chr(31) || 'ine', 'a' || chr(31) || 'b', 'ab' || chr(31) || 'l', 'abl' || chr(31) || 'e', 'at' || chr(31) || 'a', 'd' || chr(31) || 'ata', 't' || chr(31) || 'able', 'u' || chr(31) || 'p', 'a' || chr(31) || 'g', 'ag' || chr(31) || 'g', 'a' || chr(31) || 'lu'], [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59])[toks[i] || chr(31) || toks[i + 1]][1], 999999)) AS pr
               FROM enc WHERE NOT done))),
         wtok AS (SELECT word, len(toks)::BIGINT AS n FROM enc WHERE done),
         dc AS (
           SELECT d.doc_id, coalesce(s.bpe_tokens, 0)::BIGINT AS bpe_tokens
           FROM documents d LEFT JOIN (
             SELECT doc_id, sum(n)::BIGINT AS bpe_tokens
             FROM w2 JOIN wtok USING (word) GROUP BY doc_id) s USING (doc_id))
         SELECT doc_id, bpe_tokens FROM dc""",

    "q_bpe_budget" ->
      """WITH RECURSIVE wf AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
           FROM documents),
         w2 AS (SELECT doc_id, word FROM wf WHERE word <> ''),
         enc(word, toks, done) AS (
           SELECT word, regexp_extract_all(word, '.'), false
           FROM (SELECT DISTINCT word FROM w2)
           UNION ALL
           SELECT word,
             CASE WHEN coalesce(list_min(pr), 999999) >= 999999 THEN toks
                  ELSE toks[1:pos-1] || [toks[pos] || toks[pos+1]] || toks[pos+2:] END,
             coalesce(list_min(pr), 999999) >= 999999
           FROM (
             SELECT word, toks, pr, list_position(pr, list_min(pr)) AS pos
             FROM (
               SELECT word, toks,
                 list_transform(generate_series(1, len(toks) - 1),
                   i -> coalesce(MAP(['e' || chr(31) || 'r', 'i' || chr(31) || 'n', 'o' || chr(31) || 'w', 'o' || chr(31) || 'r', 's' || chr(31) || 't', 'm' || chr(31) || 'er', 'a' || chr(31) || 't', 'l' || chr(31) || 'u', 'a' || chr(31) || 'r', 'p' || chr(31) || 'ar', 'j' || chr(31) || 'o', 'jo' || chr(31) || 'in', 'a' || chr(31) || 's', 'as' || chr(31) || 'h', 'h' || chr(31) || 'ash', 'r' || chr(31) || 'ow', 'at' || chr(31) || 'c', 'atc' || chr(31) || 'h', 'b' || chr(31) || 'atch', 'a' || chr(31) || 'n', 'c' || chr(31) || 'an', 's' || chr(31) || 'can', 'c' || chr(31) || 'o', 'c' || chr(31) || 'u', 'co' || chr(31) || 'lu', 'colu' || chr(31) || 'm', 'colum' || chr(31) || 'n', 'cu' || chr(31) || 'st', 'cust' || chr(31) || 'o', 'custo' || chr(31) || 'mer', 'f' || chr(31) || 'i', 'fi' || chr(31) || 'l', 'fil' || chr(31) || 't', 'filt' || chr(31) || 'er', 'a' || chr(31) || 'l', 'al' || chr(31) || 'l', 'm' || chr(31) || 'all', 's' || chr(31) || 'mall', 'g' || chr(31) || 'e', 'l' || chr(31) || 'ow', 'mer' || chr(31) || 'ge', 's' || chr(31) || 'low', 'c' || chr(31) || 't', 'ct' || chr(31) || 'or', 'd' || chr(31) || 'er', 'e' || chr(31) || 'ctor', 'or' || chr(31) || 'der', 'v' || chr(31) || 'ector', 'in' || chr(31) || 'e', 'l' || chr(31) || 'ine', 'a' || chr(31) || 'b', 'ab' || chr(31) || 'l', 'abl' || chr(31) || 'e', 'at' || chr(31) || 'a', 'd' || chr(31) || 'ata', 't' || chr(31) || 'able', 'u' || chr(31) || 'p', 'a' || chr(31) || 'g', 'ag' || chr(31) || 'g', 'a' || chr(31) || 'lu'], [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59])[toks[i] || chr(31) || toks[i + 1]][1], 999999)) AS pr
               FROM enc WHERE NOT done))),
         wtok AS (SELECT word, len(toks)::BIGINT AS n FROM enc WHERE done),
         dc AS (
           SELECT d.doc_id, coalesce(s.bpe_tokens, 0)::BIGINT AS bpe_tokens
           FROM documents d LEFT JOIN (
             SELECT doc_id, sum(n)::BIGINT AS bpe_tokens
             FROM w2 JOIN wtok USING (word) GROUP BY doc_id) s USING (doc_id)),
         c AS (
           SELECT doc_id, bpe_tokens,
             coalesce(sum(bpe_tokens) OVER (ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
           FROM dc)
         SELECT doc_id, bpe_tokens FROM c WHERE before < 10000""",

    // the FIXED 60-merge model file replayed as the same recursive CTE
    // (byte level == char level on this ASCII corpus) + the 15000-token
    // budget window — the q_bpe_budget shape against a frozen model
    "q_token_count_vocab" ->
      """WITH RECURSIVE wf AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
           FROM documents),
         w2 AS (SELECT doc_id, word FROM wf WHERE word <> ''),
         enc(word, toks, done) AS (
           SELECT word, regexp_extract_all(word, '.'), false
           FROM (SELECT DISTINCT word FROM w2)
           UNION ALL
           SELECT word,
             CASE WHEN coalesce(list_min(pr), 999999) >= 999999 THEN toks
                  ELSE toks[1:pos-1] || [toks[pos] || toks[pos+1]] || toks[pos+2:] END,
             coalesce(list_min(pr), 999999) >= 999999
           FROM (
             SELECT word, toks, pr, list_position(pr, list_min(pr)) AS pos
             FROM (
               SELECT word, toks,
                 list_transform(generate_series(1, len(toks) - 1),
                   i -> coalesce(MAP(['e' || chr(31) || 'r', 'i' || chr(31) || 'n', 'o' || chr(31) || 'w', 'o' || chr(31) || 'r', 's' || chr(31) || 't', 'm' || chr(31) || 'er', 'a' || chr(31) || 't', 'l' || chr(31) || 'u', 'a' || chr(31) || 'r', 'p' || chr(31) || 'ar', 'j' || chr(31) || 'o', 'jo' || chr(31) || 'in', 'a' || chr(31) || 's', 'as' || chr(31) || 'h', 'h' || chr(31) || 'ash', 'r' || chr(31) || 'ow', 'at' || chr(31) || 'c', 'atc' || chr(31) || 'h', 'b' || chr(31) || 'atch', 'a' || chr(31) || 'n', 'c' || chr(31) || 'an', 's' || chr(31) || 'can', 'c' || chr(31) || 'o', 'c' || chr(31) || 'u', 'co' || chr(31) || 'lu', 'colu' || chr(31) || 'm', 'colum' || chr(31) || 'n', 'cu' || chr(31) || 'st', 'cust' || chr(31) || 'o', 'custo' || chr(31) || 'mer', 'f' || chr(31) || 'i', 'fi' || chr(31) || 'l', 'fil' || chr(31) || 't', 'filt' || chr(31) || 'er', 'a' || chr(31) || 'l', 'al' || chr(31) || 'l', 'm' || chr(31) || 'all', 's' || chr(31) || 'mall', 'g' || chr(31) || 'e', 'l' || chr(31) || 'ow', 'mer' || chr(31) || 'ge', 's' || chr(31) || 'low', 'c' || chr(31) || 't', 'ct' || chr(31) || 'or', 'd' || chr(31) || 'er', 'e' || chr(31) || 'ctor', 'or' || chr(31) || 'der', 'v' || chr(31) || 'ector', 'in' || chr(31) || 'e', 'l' || chr(31) || 'ine', 'a' || chr(31) || 'b', 'ab' || chr(31) || 'l', 'abl' || chr(31) || 'e', 'at' || chr(31) || 'a', 'd' || chr(31) || 'ata', 't' || chr(31) || 'able', 'u' || chr(31) || 'p', 'a' || chr(31) || 'g', 'ag' || chr(31) || 'g', 'a' || chr(31) || 'lu'], [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59])[toks[i] || chr(31) || toks[i + 1]][1], 999999)) AS pr
               FROM enc WHERE NOT done))),
         wtok AS (SELECT word, len(toks)::BIGINT AS n FROM enc WHERE done),
         dc AS (
           SELECT d.doc_id, coalesce(s.bpe_tokens, 0)::BIGINT AS bpe_tokens
           FROM documents d LEFT JOIN (
             SELECT doc_id, sum(n)::BIGINT AS bpe_tokens
             FROM w2 JOIN wtok USING (word) GROUP BY doc_id) s USING (doc_id)),
         c AS (
           SELECT doc_id, bpe_tokens,
             coalesce(sum(bpe_tokens) OVER (ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
           FROM dc)
         SELECT doc_id, bpe_tokens FROM c WHERE before < 15000""",

    "q_url_normalize" ->
      """WITH u AS (
           SELECT doc_id,
             'HTTP://WWW.' || upper(source) || '.Example.COM:80/Docs/' ||
             cast(doc_id AS VARCHAR) || '/' ||
             (CASE WHEN doc_id % 3 = 0
               THEN '?utm_source=feed&page=' || cast(doc_id % 7 AS VARCHAR) || '&gclid=XYZ#sec'
               ELSE '' END) AS url
           FROM documents),
         s1 AS (SELECT doc_id, url, regexp_replace(trim(url), '#.*', '', 'g') AS x FROM u),
         s2 AS (SELECT doc_id, url, regexp_replace(x, '([?&])(utm_[A-Za-z]+|fbclid|gclid|msclkid)=[^&#]*', '\1', 'g') AS x FROM s1),
         s3 AS (SELECT doc_id, url, regexp_replace(regexp_replace(regexp_replace(x, '\?&+', '?', 'g'), '&&+', '&', 'g'), '[?&]+$', '', 'g') AS x FROM s2),
         s4 AS (SELECT doc_id, url, lower(regexp_extract(x, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) ||
                  regexp_replace(x, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS x FROM s3),
         s5 AS (SELECT doc_id, url, regexp_replace(regexp_replace(x,
                  '^(http://[^/:?#]+):80([/?#]|$)', '\1\2'),
                  '^(https://[^/:?#]+):443([/?#]|$)', '\1\2') AS x FROM s4)
         SELECT doc_id,
           regexp_replace(x, '/$', '') AS url_norm,
           regexp_replace(regexp_replace(regexp_replace(
             lower(regexp_extract(trim(url), '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
             '^[^@]*@', ''), ':[0-9]+$', ''), '^www\.', '') AS domain
         FROM s5""",

    "q_assign_split" ->
      """SELECT doc_id,
           CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 8) < '40000000' THEN 'test'
                WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 8) < 'c0000000' THEN 'train'
                ELSE 'val' END AS split
         FROM documents""",

    "q_trigram_rarity" ->
      """WITH docs AS (SELECT doc_id, lower(text) AS t FROM documents),
         tris AS (
           SELECT doc_id, substr(t, i, 3) AS tri
           FROM docs, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)),
         counts AS (SELECT tri, count(*)::BIGINT AS cnt FROM tris GROUP BY tri),
         vocab AS (SELECT tri, cnt FROM counts ORDER BY cnt DESC, tri LIMIT 4096),
         n AS (SELECT sum(cnt)::BIGINT AS total FROM vocab),
         rars AS (
           SELECT t.doc_id,
             least((1000 * (SELECT total FROM n)) // (coalesce(v.cnt, 0) + 1),
                   1000000000000) AS rar
           FROM tris t LEFT JOIN vocab v USING (tri)),
         scores AS (SELECT doc_id, sum(rar)::BIGINT AS rarity_sum,
                    count(*)::BIGINT AS n_trigrams FROM rars GROUP BY doc_id)
         SELECT d.doc_id,
           coalesce(s.rarity_sum, 0)::BIGINT AS rarity_sum,
           coalesce(s.n_trigrams, 0)::BIGINT AS n_trigrams,
           (CASE WHEN coalesce(s.n_trigrams, 0) = 0 THEN 0
                 ELSE s.rarity_sum // s.n_trigrams END)::BIGINT AS rarity
         FROM documents d LEFT JOIN scores s USING (doc_id)""",

    "q_domain_filter" ->
      """SELECT doc_id FROM documents
         WHERE lower(source) || '.example.com' NOT IN ('src0.example.com', 'src3.example.com')""",

    // same construction, DuckDB's nfc_normalize + the identical RE2 chain
    "q_text_normalize" ->
      """SELECT doc_id,
           trim(regexp_replace(regexp_replace(
             nfc_normalize(text || '  cafe' || chr(769) || ' ' ||
               cast(doc_id AS VARCHAR) || chr(9) || 'x' || chr(7) || '  end'),
             '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '', 'g'),
             '[ \t]+', ' ', 'g')) AS text
         FROM documents""",

    "q_sentence_split" ->
      """WITH built AS (
           SELECT doc_id,
             text || '. second part! third? trailing fragment' AS text
           FROM documents),
         arrs AS (
           SELECT doc_id,
             list_filter(list_transform(
               regexp_extract_all(text, '[^.!?]+[.!?]*'), s -> trim(s)),
               s -> len(s) > 0) AS sents
           FROM built)
         SELECT doc_id,
           (unnest(generate_series(1, len(sents))) - 1)::BIGINT AS sentence_id,
           unnest(sents) AS sentence
         FROM arrs""",

    "q_dedup_url" ->
      """WITH u AS (
           SELECT doc_id,
             'http://www.' || lower(source) || '.example.com/Docs/' ||
             cast(doc_id // 2 AS VARCHAR) AS url_norm
           FROM documents)
         SELECT url_norm, min(doc_id) AS doc_id, count(*)::BIGINT AS n_fetches
         FROM u GROUP BY 1""",

    "q_pack_contexts" ->
      """WITH t AS (
           SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]'))::BIGINT AS n_tokens,
             md5(cast(doc_id AS VARCHAR)) AS h
           FROM documents),
         c AS (
           SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
           FROM t)
         SELECT doc_id, n_tokens, (before // 4096)::BIGINT AS context_id FROM c""",

    "q_pack_by_lang" ->
      """WITH t AS (
           SELECT doc_id, lang,
             len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]'))::BIGINT AS n_tokens,
             md5(cast(doc_id AS VARCHAR)) AS h
           FROM documents),
         c AS (
           SELECT doc_id, lang, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
           FROM t)
         SELECT doc_id, lang, n_tokens, (before // 4096)::BIGINT AS context_id FROM c""",

    "q_pack_text" ->
      """WITH t AS (
           SELECT doc_id, text,
             len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]'))::BIGINT AS n_tokens,
             md5(cast(doc_id AS VARCHAR)) AS h
           FROM documents),
         c AS (
           SELECT doc_id, text, n_tokens, h,
             coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
           FROM t)
         SELECT (before // 4096)::BIGINT AS context_id,
           string_agg(text, ' ' ORDER BY h, doc_id) AS text,
           sum(n_tokens)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_docs
         FROM c GROUP BY 1""",

    "q_shuffle" ->
      """SELECT doc_id,
           row_number() OVER (ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) - 1 AS shuffle_pos
         FROM documents""",

    "q_dedup_embedding" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos_sim
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.42""",

    // SemDeDup: centroids = the 16 smallest-id vectors (iters=0 seed rule,
    // cell index = seed rank), assignment by dot/|centroid| (|v| factors
    // out of the argmax; ties to the smallest cell index), then the
    // upper-triangular rule — a row is dropped iff ANY smaller-id row of
    // the same cell exceeds the cosine threshold, survivor or not.
    "q_cluster_assign" ->
      """WITH cent AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
                  embedding::DOUBLE[] AS cvec,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cnorm
           FROM embeddings ORDER BY vec_id LIMIT 16),
         assign AS (
           SELECT e.vec_id, c.cidx,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec) / c.cnorm DESC,
                             c.cidx ASC) AS rn
           FROM embeddings e CROSS JOIN cent c)
         SELECT vec_id AS id, cidx::BIGINT AS cell FROM assign WHERE rn = 1""",

    "q_semantic_dedup" ->
      """WITH cent AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
                  embedding::DOUBLE[] AS cvec,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cnorm
           FROM embeddings ORDER BY vec_id LIMIT 16),
         assign AS (
           SELECT e.vec_id, c.cidx,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec) / c.cnorm DESC,
                             c.cidx ASC) AS rn
           FROM embeddings e CROSS JOIN cent c),
         cells AS (SELECT vec_id, cidx AS cell FROM assign WHERE rn = 1)
         SELECT e.vec_id AS id, x.cell
         FROM embeddings e JOIN cells x ON x.vec_id = e.vec_id
         WHERE NOT EXISTS (
           SELECT 1 FROM embeddings e2 JOIN cells x2 ON x2.vec_id = e2.vec_id
           WHERE x2.cell = x.cell AND e2.vec_id < e.vec_id
             AND list_cosine_similarity(e2.embedding::DOUBLE[], e.embedding::DOUBLE[]) > 0.42)""",

    "q_ann_topk" ->
      """SELECT e.vec_id AS id,
           round(list_cosine_similarity(e.embedding, q.embedding), 4) AS cos_sim
         FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         WHERE e.vec_id <> 0
         ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id ASC
         LIMIT 10""",

    // mirrors quantizedTopK exactly: per-vector int8 symmetric quantization
    // (integer-valued doubles — sums are exact, so the candidate set is
    // bit-reproducible), approx = ⟨qa,qb⟩·sa·sb, top-50 candidates, exact
    // float-cosine rerank to top-10
    "q_ann_quantized" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         qq AS (
           SELECT qe,
             list_max(list_transform(qe, x -> abs(x::DOUBLE))) / 127.0 AS qs,
             list_transform(qe, x ->
               round(x::DOUBLE / (list_max(list_transform(qe, y -> abs(y::DOUBLE))) / 127.0))) AS qv
           FROM q),
         c AS (
           SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS cs
           FROM embeddings WHERE vec_id <> 0),
         s AS (
           SELECT vec_id, embedding,
             list_dot_product(
               list_transform(embedding, x -> round(x::DOUBLE / cs)),
               (SELECT qv FROM qq)) * cs * (SELECT qs FROM qq) AS approx
           FROM c),
         cand AS (SELECT * FROM s ORDER BY approx DESC, vec_id ASC LIMIT 50)
         SELECT vec_id AS id,
           round(list_cosine_similarity(embedding, (SELECT qe FROM q)), 4) AS cos_sim
         FROM cand
         ORDER BY list_cosine_similarity(embedding, (SELECT qe FROM q)) DESC, vec_id ASC
         LIMIT 10""",

    // product quantization: normalize-quantize to the integer grid
    // (IEEE-exact: sqrt/divide/multiply are correctly rounded, validated
    // zero mismatches with 3.5e-05 worst rounding margin on this corpus),
    // integer L2 argmin encode per 8-dim subspace against the first-16
    // seed codebook, ADC via the query LUT, top-100 by (approx, id),
    // exact-cosine rerank to 10 — mirrors Pq.pqTopK(iters = 0) exactly
    "q_ann_pq" ->
      """WITH base AS (
           SELECT vec_id, embedding,
             list_transform(embedding, x -> round(x::DOUBLE /
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * 256)) AS qv
           FROM embeddings),
         q AS (SELECT qv AS query_qv, embedding AS query_emb FROM base WHERE vec_id = 0),
         seeds AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, qv AS cv
           FROM (SELECT vec_id, qv FROM base WHERE vec_id <> 0 ORDER BY vec_id LIMIT 16)),
         subs AS (SELECT unnest(range(0, 8)) AS s),
         enc AS (
           SELECT b.vec_id, subs.s, seeds.j,
             list_dot_product(b.qv[subs.s*8+1 : subs.s*8+8], b.qv[subs.s*8+1 : subs.s*8+8])
             - 2*list_dot_product(b.qv[subs.s*8+1 : subs.s*8+8], seeds.cv[subs.s*8+1 : subs.s*8+8])
             + list_dot_product(seeds.cv[subs.s*8+1 : subs.s*8+8], seeds.cv[subs.s*8+1 : subs.s*8+8]) AS dist
           FROM base b CROSS JOIN subs CROSS JOIN seeds WHERE b.vec_id <> 0),
         codes AS (
           SELECT vec_id, s, j FROM (
             SELECT vec_id, s, j,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY dist ASC, j ASC) AS rn
             FROM enc) WHERE rn = 1),
         lut AS (
           SELECT subs.s, seeds.j,
             list_dot_product((SELECT query_qv FROM q)[subs.s*8+1 : subs.s*8+8],
                              (SELECT query_qv FROM q)[subs.s*8+1 : subs.s*8+8])
             - 2*list_dot_product((SELECT query_qv FROM q)[subs.s*8+1 : subs.s*8+8],
                                  seeds.cv[subs.s*8+1 : subs.s*8+8])
             + list_dot_product(seeds.cv[subs.s*8+1 : subs.s*8+8],
                                seeds.cv[subs.s*8+1 : subs.s*8+8]) AS dist
           FROM subs CROSS JOIN seeds),
         adc AS (
           SELECT c.vec_id, sum(l.dist) AS approx
           FROM codes c JOIN lut l ON l.s = c.s AND l.j = c.j
           GROUP BY c.vec_id),
         cand AS (SELECT vec_id FROM adc ORDER BY approx ASC, vec_id ASC LIMIT 100)
         SELECT b.vec_id AS id,
           round(list_cosine_similarity(b.embedding, (SELECT query_emb FROM q)), 4) AS cos_sim
         FROM cand JOIN base b ON b.vec_id = cand.vec_id
         ORDER BY list_cosine_similarity(b.embedding, (SELECT query_emb FROM q)) DESC, b.vec_id ASC
         LIMIT 10""",

    // IVF coarse prune (the q_ann_ivf cent/probe/assign CTEs at nprobe=8)
    // feeding the PQ pipeline (the q_ann_pq CTEs) with seeds drawn from
    // the SURVIVOR set — mirrors Pq.ivfPqTopK(iters = 0) exactly
    "q_ann_ivfpq" ->
      """WITH cent AS (
           SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cnorm
           FROM embeddings WHERE vec_id <> 0 ORDER BY vec_id LIMIT 16),
         qrow AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         probe AS (
           SELECT cid FROM cent, qrow
           ORDER BY list_dot_product(qrow.embedding::DOUBLE[], cvec) / cnorm DESC, cid ASC
           LIMIT 8),
         assign AS (
           SELECT e.vec_id, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec) / c.cnorm DESC,
                             c.cid ASC) AS rn
           FROM embeddings e CROSS JOIN cent c WHERE e.vec_id <> 0),
         surv AS (
           SELECT e.vec_id, e.embedding
           FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id AND a.rn = 1
           WHERE a.cid IN (SELECT cid FROM probe)),
         base AS (
           SELECT vec_id, embedding,
             list_transform(embedding, x -> round(x::DOUBLE /
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * 256)) AS qv
           FROM surv),
         q AS (SELECT list_transform(embedding, x -> round(x::DOUBLE /
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * 256)) AS query_qv,
               embedding AS query_emb
               FROM embeddings WHERE vec_id = 0),
         seeds AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, qv AS cv
           FROM (SELECT vec_id, qv FROM base ORDER BY vec_id LIMIT 16)),
         subs AS (SELECT unnest(range(0, 8)) AS s),
         enc AS (
           SELECT b.vec_id, subs.s, seeds.j,
             list_dot_product(b.qv[subs.s*8+1 : subs.s*8+8], b.qv[subs.s*8+1 : subs.s*8+8])
             - 2*list_dot_product(b.qv[subs.s*8+1 : subs.s*8+8], seeds.cv[subs.s*8+1 : subs.s*8+8])
             + list_dot_product(seeds.cv[subs.s*8+1 : subs.s*8+8], seeds.cv[subs.s*8+1 : subs.s*8+8]) AS dist
           FROM base b CROSS JOIN subs CROSS JOIN seeds),
         codes AS (
           SELECT vec_id, s, j FROM (
             SELECT vec_id, s, j,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY dist ASC, j ASC) AS rn
             FROM enc) WHERE rn = 1),
         lut AS (
           SELECT subs.s, seeds.j,
             list_dot_product((SELECT query_qv FROM q)[subs.s*8+1 : subs.s*8+8],
                              (SELECT query_qv FROM q)[subs.s*8+1 : subs.s*8+8])
             - 2*list_dot_product((SELECT query_qv FROM q)[subs.s*8+1 : subs.s*8+8],
                                  seeds.cv[subs.s*8+1 : subs.s*8+8])
             + list_dot_product(seeds.cv[subs.s*8+1 : subs.s*8+8],
                                seeds.cv[subs.s*8+1 : subs.s*8+8]) AS dist
           FROM subs CROSS JOIN seeds),
         adc AS (
           SELECT c.vec_id, sum(l.dist) AS approx
           FROM codes c JOIN lut l ON l.s = c.s AND l.j = c.j
           GROUP BY c.vec_id),
         cand AS (SELECT vec_id FROM adc ORDER BY approx ASC, vec_id ASC LIMIT 100)
         SELECT b.vec_id AS id,
           round(list_cosine_similarity(b.embedding, (SELECT query_emb FROM q)), 4) AS cos_sim
         FROM cand JOIN base b ON b.vec_id = cand.vec_id
         ORDER BY list_cosine_similarity(b.embedding, (SELECT query_emb FROM q)) DESC, b.vec_id ASC
         LIMIT 10""",

    // The LSH bucket is fully deterministic: hyperplane components are the
    // sign of xxhash64(plane, dim), dumped once (tools/DumpPlanes) and
    // embedded as literal ±1 vectors, so DuckDB reproduces the exact bucket
    // filter + rerank of Similarity.lshTopK(numPlanes = 4).
    "q_ann_lsh" ->
      """WITH planes AS (
           SELECT * FROM (VALUES
             (0, [1,-1,-1,-1,-1,1,1,-1,1,1,-1,-1,1,-1,-1,1,1,1,1,1,-1,1,1,-1,1,-1,1,-1,1,-1,1,1,1,1,1,-1,-1,1,1,-1,-1,1,-1,-1,1,-1,1,-1,-1,-1,1,1,-1,-1,1,1,1,1,-1,1,1,-1,-1,-1]::DOUBLE[]),
             (1, [-1,1,-1,1,-1,-1,1,-1,-1,-1,1,1,-1,-1,1,-1,-1,1,1,1,-1,-1,-1,-1,1,-1,1,-1,-1,1,-1,-1,1,-1,-1,1,1,-1,-1,1,1,1,1,1,1,-1,-1,1,1,1,1,1,1,-1,1,1,1,1,1,-1,1,1,-1,-1]::DOUBLE[]),
             (2, [-1,1,1,-1,-1,1,1,1,-1,1,1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,1,-1,1,1,1,1,1,-1,1,1,1,-1,-1,-1,-1,1,1,-1,-1,1,-1,1,-1,-1,1,-1,-1,-1,1,1,1,-1,1,-1,-1,-1,-1,1,-1,1,1,-1,1]::DOUBLE[]),
             (3, [-1,1,-1,-1,-1,-1,1,-1,1,-1,1,-1,-1,1,1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,1,-1,1,-1,-1,1,1,-1,1,1,-1,-1,1,1,-1,-1,-1,-1,-1,1,-1,1,1,-1,-1,-1,1,1,1,-1,1,1,-1,-1,-1,-1,1,1,-1]::DOUBLE[])
           ) AS t(p, s)),
         buckets AS (
           SELECT e.vec_id,
                  sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.s) > 0
                           THEN (1::BIGINT << pl.p) ELSE 0 END) AS b
           FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id),
         qb AS (SELECT b FROM buckets WHERE vec_id = 0),
         q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id AS id,
                round(list_cosine_similarity(e.embedding, q.embedding), 4) AS cos_sim
         FROM embeddings e, q, qb, buckets be
         WHERE be.vec_id = e.vec_id AND e.vec_id <> 0 AND be.b = qb.b
         ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id ASC
         LIMIT 10""",

    // Multi-table LSH: same deterministic sign construction, but the matrix
    // comes from the splitmix64 planeSign (Similarity.planesSqlValues emits
    // the identical signs as literals — one source of truth, no dump step).
    // Candidates = bucket match in ANY table, then exact rerank.
    "q_ann_multitable" ->
      s"""WITH planes AS (
           SELECT * FROM (VALUES
             ${graft.functions.Similarity.planesSqlValues(numTables = 8, numPlanes = 8, dim = 64)}
           ) AS t(tbl, p, s)),
         buckets AS (
           SELECT e.vec_id, pl.tbl,
                  sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.s) > 0
                           THEN (1::BIGINT << pl.p) ELSE 0 END) AS b
           FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.tbl),
         qb AS (SELECT tbl, b FROM buckets WHERE vec_id = 0),
         cand AS (
           SELECT DISTINCT be.vec_id
           FROM buckets be JOIN qb ON be.tbl = qb.tbl AND be.b = qb.b
           WHERE be.vec_id <> 0),
         q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id AS id,
                round(list_cosine_similarity(e.embedding, q.embedding), 4) AS cos_sim
         FROM embeddings e JOIN cand c ON c.vec_id = e.vec_id, q
         ORDER BY round(list_cosine_similarity(e.embedding, q.embedding), 4) DESC, e.vec_id ASC
         LIMIT 10""",

    // IVF: centroids are the 16 smallest-id corpus vectors (iters=0 — the
    // deterministic seed rule), assignment ranks by dot/|centroid| in double
    // (|v| factors out of the argmax; Spark's kernel accumulates the same
    // way), probe = 4 nearest cells to the query, exact cosine rerank.
    "q_ann_ivf" ->
      """WITH cent AS (
           SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cnorm
           FROM embeddings WHERE vec_id <> 0 ORDER BY vec_id LIMIT 16),
         q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         probe AS (
           SELECT cid FROM cent, q
           ORDER BY list_dot_product(q.embedding::DOUBLE[], cvec) / cnorm DESC, cid ASC
           LIMIT 4),
         assign AS (
           SELECT e.vec_id, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec) / c.cnorm DESC,
                             c.cid ASC) AS rn
           FROM embeddings e CROSS JOIN cent c WHERE e.vec_id <> 0)
         SELECT e.vec_id AS id,
                round(list_cosine_similarity(e.embedding, q.embedding), 4) AS cos_sim
         FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id AND a.rn = 1, q
         WHERE a.cid IN (SELECT cid FROM probe)
         ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id ASC
         LIMIT 10""",

    // ANN join: same 8×8 sign matrix (planeSign is independent of the
    // consumer, so the literal block is shared with q_ann_multitable);
    // candidates = any shared (table, bucket) across the two id ranges,
    // exact cosine rerank, per-query top-3 by window rank
    "q_ann_join" ->
      s"""WITH planes AS (
           SELECT * FROM (VALUES
             ${graft.functions.Similarity.planesSqlValues(numTables = 8, numPlanes = 8, dim = 64)}
           ) AS t(tbl, p, s)),
         buckets AS (
           SELECT e.vec_id, pl.tbl,
                  sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.s) > 0
                           THEN (1::BIGINT << pl.p) ELSE 0 END) AS b
           FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.tbl),
         cand AS (
           SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
           FROM buckets q JOIN buckets c ON q.tbl = c.tbl AND q.b = c.b
           WHERE q.vec_id < 5 AND c.vec_id >= 5),
         scored AS (
           SELECT cand.q_id, cand.c_id,
                  round(list_cosine_similarity(qe.embedding, ce.embedding), 4) AS cos_sim
           FROM cand
           JOIN embeddings qe ON qe.vec_id = cand.q_id
           JOIN embeddings ce ON ce.vec_id = cand.c_id),
         ranked AS (
           SELECT q_id, c_id, cos_sim,
                  row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id ASC) AS rk
           FROM scored)
         SELECT q_id, c_id, cos_sim, rk FROM ranked WHERE rk <= 3""",

    "q_multimodal_features" ->
      "SELECT doc_id AS media_id, octet_length(text::BLOB)::BIGINT AS n_bytes FROM documents",

    "q_multimodal_dedup" ->
      "SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS dup_count FROM documents GROUP BY 1",

    // fixture images are closed-form in doc_id (tools/GenImages): format
    // rotates bmp/png/gif/jpeg, dims and EXIF orientation are id
    // arithmetic — the oracle never decodes a byte
    "q_image_meta" ->
      """SELECT doc_id AS media_id,
           CASE doc_id % 6 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
                           WHEN 2 THEN 'gif' WHEN 3 THEN 'jpeg'
                           WHEN 4 THEN 'tiff' ELSE 'webp' END AS image_format,
           (16 + (doc_id % 5) * 8)::INTEGER AS image_width,
           (12 + (doc_id % 3) * 8)::INTEGER AS image_height,
           (CASE WHEN doc_id % 6 = 3 THEN 1 + doc_id % 8 ELSE 0 END)::INTEGER AS image_orientation
         FROM documents""",

    // HEIF fixtures are closed-form in doc_id: codec alternates, dims
    // are id arithmetic — the oracle never touches a box
    "q_image_meta_avif" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'avif' ELSE 'heic' END AS image_format,
           (64 + (doc_id % 7) * 16)::INTEGER AS image_width,
           (48 + (doc_id % 5) * 16)::INTEGER AS image_height
         FROM documents""",

    // construction: ids i and i+250 carry the same base pattern (the copy
    // faintly perturbed, in a DIFFERENT container format), unrelated
    // patterns are ≥16 pHash bits apart — the expected grouping is pure id
    // arithmetic
    "q_image_phash_dedup" ->
      """SELECT doc_id AS media_id, doc_id % 250 AS keep_id,
           count(*) OVER (PARTITION BY doc_id % 250)::BIGINT AS n_group
         FROM documents WHERE doc_id < 500""",

    // every fax compression must reproduce the uncompressed plane exactly
    "q_image_ccitt" ->
      """SELECT doc_id AS media_id, true AS mh_exact, true AS g3_exact,
           true AS g4_exact
         FROM documents WHERE doc_id < 200""",

    // pinned pHashes of the six embedded libwebp VP8 stills (values fixed
    // by RFC 6386 exact-integer reconstruction; any decoder regression
    // flips them), plus the near-dup structure: quality twins close,
    // cross-pattern pairs far, one distinct hash per fixture across all
    // executors
    "q_image_vp8" ->
      """SELECT v.fixture_id, c.n_rows, 1::BIGINT AS n_hashes, v.phash,
           v.twin_dist, v.min_cross
         FROM (VALUES
            (0, 978614960240395263::BIGINT, 14::INTEGER, 34::INTEGER),
            (1, 871029880045372415::BIGINT, 14::INTEGER, 34::INTEGER),
            (2, 4267935616904387893::BIGINT, 0::INTEGER, 28::INTEGER),
            (3, 4267935616904387893::BIGINT, 0::INTEGER, 28::INTEGER),
            (4, -7049966899837156847::BIGINT, 22::INTEGER, 28::INTEGER),
            (5, -504973865726670767::BIGINT, 22::INTEGER, 28::INTEGER))
           v(fixture_id, phash, twin_dist, min_cross)
         JOIN (SELECT doc_id % 6 AS fixture_id, count(*)::BIGINT AS n_rows
               FROM documents WHERE doc_id < 300 GROUP BY 1) c
           USING (fixture_id)""",

    "q_audio_meta" ->
      """WITH p AS (
           SELECT doc_id, doc_id % 3 AS fmt,
             8000 + (doc_id % 4) * 4000 AS wav_rate,
             64 + (doc_id % 32) * 4 AS wav_n,
             16000 + (doc_id % 5) * 4000 AS flac_rate,
             10000 + doc_id * 7 AS flac_n,
             CASE (doc_id // 3) % 7 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                  WHEN 2 THEN 32000 WHEN 3 THEN 22050 WHEN 4 THEN 16000
                  WHEN 5 THEN 11025 ELSE 8000 END AS mp3_rate,
             -- LSF generations (rates below 32000) carry 576 samples/frame
             (4 + doc_id % 7) *
               (CASE WHEN (doc_id // 3) % 7 < 3 THEN 1152 ELSE 576 END) AS mp3_n
           FROM documents)
         SELECT doc_id AS media_id,
           CASE fmt WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' ELSE 'mp3' END AS audio_format,
           (CASE fmt WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 2 END)::INTEGER AS audio_channels,
           (CASE fmt WHEN 0 THEN wav_rate WHEN 1 THEN flac_rate ELSE mp3_rate END)::BIGINT
             AS audio_sample_rate,
           (CASE fmt WHEN 0 THEN 16 WHEN 1 THEN 16 ELSE 0 END)::INTEGER AS audio_bits,
           (CASE fmt WHEN 0 THEN wav_n WHEN 1 THEN flac_n ELSE mp3_n END)::BIGINT
             AS audio_n_samples,
           (CASE fmt WHEN 0 THEN wav_n * 1000 // wav_rate
                     WHEN 1 THEN flac_n * 1000 // flac_rate
                     ELSE mp3_n * 1000 // mp3_rate END)::BIGINT AS audio_duration_ms,
           CASE fmt WHEN 0 THEN 'pcm' WHEN 1 THEN 'flac' ELSE 'mp3' END
             AS audio_codec
         FROM p""",

    // container-held audio tracks: WebM (Matroska audio TrackEntry:
    // CodecID + SamplingFrequency/Channels + Segment Duration) for even
    // ids, MP4 (soun trak: stsd mp4a entry + mdhd duration) for odd —
    // all fields id-derived, n_samples 0 (no sample decode by design)
    // every transcoded payload is mono 16 kHz Vorbis with the sample
    // count preserved by the encoder's granule trim; proximity is
    // closed-form true
    "q_audio_transcode" ->
      """SELECT doc_id AS media_id, 'ogg' AS audio_format,
           1 AS audio_channels, 16000::BIGINT AS audio_sample_rate,
           2048::BIGINT AS audio_n_samples, 'vorbis' AS audio_codec,
           true AS fp_near
         FROM documents WHERE doc_id < 500""",

    // theora fixture fields are id arithmetic; duration =
    // frames*1000*frd/frn with frd=1 (integer division both sides)
    "q_video_meta_theora" ->
      """SELECT doc_id AS media_id, 'ogg' AS video_format,
           (160 + (doc_id % 9) * 16)::INTEGER AS video_width,
           (120 + (doc_id % 5) * 16)::INTEGER AS video_height,
           ((10 + doc_id % 40) * 1000) //
             (CASE doc_id % 3 WHEN 0 THEN 30 WHEN 1 THEN 25 ELSE 24 END)
             AS video_duration_ms,
           'theora' AS video_codec
         FROM documents""",

    // legacy fixture fields are id arithmetic; duration = n*1000/rate
    // (integer division both sides)
    "q_audio_meta_legacy" ->
      """WITH p AS (
           SELECT doc_id,
             doc_id % 5 AS arm,
             (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                   ELSE 22050 END)::BIGINT AS rate,
             (200 + (doc_id % 7) * 50)::BIGINT AS n
           FROM documents)
         SELECT doc_id AS media_id,
           CASE WHEN arm < 2 THEN 'aiff' ELSE 'au' END AS audio_format,
           1 AS audio_channels,
           rate AS audio_sample_rate,
           (CASE WHEN arm <= 2 THEN 16 ELSE 8 END) AS audio_bits,
           n AS audio_n_samples,
           (n * 1000) // rate AS audio_duration_ms,
           CASE arm WHEN 0 THEN 'pcm' WHEN 1 THEN 'sowt' WHEN 2 THEN 'pcm'
                    WHEN 3 THEN 'ulaw' ELSE 'alaw' END AS audio_codec
         FROM p""",

    "q_audio_meta_container" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'webm' ELSE 'mp4' END AS audio_format,
           (1 + (doc_id // 2) % 2)::INTEGER AS audio_channels,
           (CASE (doc_id // 4) % 3 WHEN 0 THEN 22050 WHEN 1 THEN 44100
                 ELSE 48000 END)::BIGINT AS audio_sample_rate,
           (CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 16 END)::INTEGER AS audio_bits,
           0::BIGINT AS audio_n_samples,
           (500 + (doc_id % 50) * 100)::BIGINT AS audio_duration_ms,
           CASE WHEN doc_id % 4 = 0 THEN 'A_OPUS'
                WHEN doc_id % 2 = 0 THEN 'A_VORBIS'
                ELSE 'mp4a' END AS audio_codec
         FROM documents WHERE doc_id < 400""",

    // stream-container audio: TS arms walk the real elementary stream
    // (frame counts -> exact n_samples/duration); Ogg arms read the
    // identification header + final granule (Opus granules are 48 kHz-
    // domain, so n_samples stays 0 and only the duration is exact)
    "q_audio_meta_stream" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 4 < 2 THEN 'mpegts' ELSE 'ogg' END AS audio_format,
           (CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 1 + (doc_id // 4) % 2 END)::INTEGER
             AS audio_channels,
           (CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                 WHEN 2 THEN (CASE (doc_id // 8) % 3 WHEN 0 THEN 22050
                              WHEN 1 THEN 44100 ELSE 48000 END)
                 ELSE 48000 END)::BIGINT AS audio_sample_rate,
           0::INTEGER AS audio_bits,
           (CASE doc_id % 4 WHEN 0 THEN (4 + doc_id % 6) * 1152
                 WHEN 1 THEN (4 + doc_id % 6) * 1024
                 WHEN 2 THEN (CASE (doc_id // 8) % 3 WHEN 0 THEN 22050
                              WHEN 1 THEN 44100 ELSE 48000 END) * (1 + doc_id % 5)
                 ELSE 0 END)::BIGINT AS audio_n_samples,
           (CASE doc_id % 4 WHEN 0 THEN (4 + doc_id % 6) * 1152 * 1000 // 44100
                 WHEN 1 THEN (4 + doc_id % 6) * 1024 * 1000 // 48000
                 ELSE (1 + doc_id % 5) * 1000 END)::BIGINT AS audio_duration_ms,
           CASE doc_id % 4 WHEN 0 THEN 'mp3' WHEN 1 THEN 'aac'
                WHEN 2 THEN 'vorbis' ELSE 'opus' END AS audio_codec
         FROM documents WHERE doc_id < 400""",

    // samples regenerated from the fixture formula; features recomputed
    // independently (window lag for the sign-change count)
    "q_audio_features" ->
      """WITH s AS (
           SELECT doc_id, i,
             ((i * 2654435761 + doc_id * 40503) % 65536) - 32768 AS v
           FROM documents,
             unnest(generate_series(0, 64 + (doc_id % 32) * 4 - 1)) AS u(i)),
         l AS (
           SELECT doc_id, i, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
           FROM s)
         SELECT doc_id AS media_id,
           count(*)::BIGINT AS audio_n_samples,
           sum(v * v)::BIGINT AS audio_sq_sum,
           sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) != (v < 0))
                    THEN 1 ELSE 0 END)::BIGINT AS audio_zero_crossings,
           max(abs(v))::BIGINT AS audio_peak
         FROM l GROUP BY doc_id""",

    "q_audio_fingerprint" ->
      """WITH s AS (
           SELECT doc_id, i,
             ((i * 2654435761 + doc_id * 40503) % 65536) - 32768 AS v,
             (i * 64) // (64 + (doc_id % 32) * 4) AS w
           FROM documents,
             unnest(generate_series(0, 64 + (doc_id % 32) * 4 - 1)) AS u(i)),
         e AS (SELECT doc_id, w, sum(v * v)::BIGINT AS e FROM s GROUP BY doc_id, w),
         d AS (SELECT doc_id, w, e,
                 lead(e) OVER (PARTITION BY doc_id ORDER BY w) AS ne FROM e)
         SELECT doc_id AS media_id,
           sum(CASE WHEN ne > e THEN (1::BIGINT << w) ELSE 0 END)::BIGINT AS audio_fp
         FROM d WHERE w < 63 GROUP BY doc_id""",

    "q_audio_dedup" ->
      """SELECT doc_id AS media_id, doc_id % 250 AS keep_id,
           count(*) OVER (PARTITION BY doc_id % 250)::BIGINT AS n_group
         FROM documents WHERE doc_id < 500""",

    // lossy tier: the same closed-form pairing — (i, i+250) group,
    // nothing else merges
    "q_audio_dedup_lossy" ->
      """SELECT doc_id AS media_id, doc_id % 250 AS keep_id,
           count(*) OVER (PARTITION BY doc_id % 250)::BIGINT AS n_group
         FROM documents WHERE doc_id < 500""",

    "q_image_thumbnail" ->
      """SELECT doc_id AS media_id, 'png' AS thumb_format,
           16 AS thumb_width, 12 AS thumb_height
         FROM documents""",

    "q_video_meta" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS video_format,
           (320 + (doc_id % 8) * 16)::INTEGER AS video_width,
           (240 + (doc_id % 5) * 16)::INTEGER AS video_height,
           (CASE WHEN doc_id % 2 = 0 THEN 1000 + (doc_id % 97) * 250
                 ELSE 40 * (25 + doc_id % 100) END)::BIGINT AS video_duration_ms,
           CASE doc_id % 4 WHEN 0 THEN 'avc1' WHEN 2 THEN 'jpeg'
                WHEN 1 THEN 'MJPG' ELSE 'XVID' END AS video_codec
         FROM documents""",

    // construction: even = decodable baseline-CAVLC (4 samples), odd =
    // the same bytes declaring High-profile CABAC (undecodable, 0 frames)
    "q_video_meta_avc" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'avc1/baseline-cavlc'
                ELSE 'avc1/high-cabac' END AS video_codec,
           (CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 0 END)::INTEGER AS n_frames
         FROM documents WHERE doc_id < 200""",

    // duration = (2 + id%5) frames x (3 + id%7) cs x 10 ms/cs
    "q_video_meta_gif" ->
      """SELECT doc_id AS media_id, 'gif' AS video_format,
           24::INTEGER AS video_width, 16::INTEGER AS video_height,
           ((2 + doc_id % 5) * (3 + doc_id % 7) * 10)::BIGINT AS video_duration_ms,
           'lzw' AS video_codec
         FROM documents WHERE doc_id < 300""",

    // construction: ids i and i+100 package the same frames (different
    // containers), unrelated ids' frames are far in pHash — groups of 2
    "q_video_dedup" ->
      """SELECT doc_id AS media_id, doc_id % 100 AS keep_id, 2::BIGINT AS n_group
         FROM documents WHERE doc_id < 200""",

    // APNG frames: 20 ids per vid at sf0.01, 4 frames each, every
    // snapshot byte-equal to the still encode and hash-stable across
    // executors — closed-form all-true
    "q_video_frames_apng" ->
      """WITH c AS (SELECT doc_id % 12 AS vid, count(*)::BIGINT AS n_rows
                    FROM documents WHERE doc_id < 240 GROUP BY 1)
         SELECT c.vid, k::INTEGER AS frame_index, c.n_rows,
           1::BIGINT AS n_hashes, true AS still_exact
         FROM c, unnest(generate_series(0, 3)) AS u(k)""",

    // GIF (even id) and APNG (odd id) of the same planes group pairwise
    "q_video_dedup_apng" ->
      """SELECT doc_id AS media_id, doc_id - doc_id % 2 AS keep_id,
           2::BIGINT AS n_group
         FROM documents WHERE doc_id < 120""",

    // every sampled frame must come back byte- and hash-identical to the
    // bare JPEG it was packaged from
    "q_video_frames" ->
      """SELECT doc_id AS media_id, k AS frame_index, true AS byte_exact,
           true AS phash_exact
         FROM documents, unnest(generate_series(0, 3)) AS u(k)
         WHERE doc_id < 200""",

    // pinned pHashes of the 16 embedded VP8 keyframes (bases 1..4 x
    // frames 0..3), produced by RFC 6386 exact-integer reconstruction —
    // a regression anywhere in the EBML/IVF walk or the VP8 decode flips
    // them; vid -> base is vid % 4 + 1 (container parity is invisible
    // here: WebM and IVF must yield the IDENTICAL snapshots)
    "q_video_frames_vp8" ->
      """WITH c AS (SELECT doc_id % 12 AS vid, count(*)::BIGINT AS n_rows
                    FROM documents WHERE doc_id < 240 GROUP BY 1),
            p AS (SELECT * FROM (VALUES
               (1, 0, -5911842460359768959), (1, 1, -4367245356331379901),
               (1, 2, 6075181718218525173), (1, 3, 2660261709906336489),
               (2, 0, -1541267189407364191), (2, 1, 7820846899676747729),
               (2, 2, 4315518646593552491), (2, 3, 3254997444723453163),
               (3, 0, -5391518307185448483), (3, 1, 716668274781294701),
               (3, 2, -2931598068071317081), (3, 3, -3408370078018625745),
               (4, 0, -424367030519774589), (4, 1, 109707021242833343),
               (4, 2, -696320392787150201), (4, 3, -1423025430127559325))
              t(base, fidx, phash))
         SELECT c.vid, p.fidx AS frame_index, c.n_rows,
           1::BIGINT AS n_hashes, p.phash::BIGINT AS phash
         FROM c JOIN p ON p.base = c.vid % 4 + 1""",

    // pinned pHashes of the 16 embedded native-encoded H.264 baseline
    // keyframes (bases 1..4 x frames 0..3): a regression anywhere in the
    // avcC/stsd walk, the CAVLC tables, intra prediction, dequant or the
    // deblocking filter flips them; vid -> base is vid % 4 + 1
    "q_video_frames_h264" ->
      """WITH c AS (SELECT doc_id % 12 AS vid, count(*)::BIGINT AS n_rows
                    FROM documents WHERE doc_id < 240 GROUP BY 1),
            p AS (SELECT * FROM (VALUES
               (1, 0, -5911842460359768959), (1, 1, -4367245356331379901),
               (1, 2, 6075181718218525173), (1, 3, 2628736512514743017),
               (2, 0, -1541267189407364191), (2, 1, 7820846899659986897),
               (2, 2, 4315518646593552491), (2, 3, 3254997444723453163),
               (3, 0, 3831853729669327327), (3, 1, 716668274781294701),
               (3, 2, -2931598068608179801), (3, 3, -3408370078018625745),
               (4, 0, -424367030519774589), (4, 1, 109707021242833343),
               (4, 2, -696320392787150201), (4, 3, -1423060614499648149))
              t(base, fidx, phash))
         SELECT c.vid, p.fidx AS frame_index, c.n_rows,
           1::BIGINT AS n_hashes, p.phash::BIGINT AS phash
         FROM c JOIN p ON p.base = c.vid % 4 + 1""",

    // fragmented-MP4 gate: the same pinned pHashes as the classic
    // containers (identical embedded streams), base = vid // 2 + 1;
    // even vids carry the 4 CAVLC frames, odd vids the 2 CABAC frames
    // (whose pHashes coincide with CAVLC frames 0..1 — same content)
    // Matroska gate: identical pinned pHashes (same embedded
    // streams as the MP4 containers), base = vid // 2 + 1
    // PTS span = (frames - 1) * 9000 ticks / 90 = (frames - 1) * 100 ms,
    // frames = 4 on the CAVLC arm (even vid) / 2 on the CABAC arm (odd)
    "q_video_meta_ts" ->
      """SELECT doc_id AS media_id, 'mpegts' AS video_format,
           48::INTEGER AS video_width, 48::INTEGER AS video_height,
           (CASE WHEN doc_id % 2 = 0 THEN 300 ELSE 100 END)::BIGINT
             AS video_duration_ms,
           'h264' AS video_codec
         FROM documents WHERE doc_id < 320""",

    // MPEG-TS gate: identical pinned pHashes (same embedded
    // streams as the other containers), base = vid // 2 + 1
    "q_video_frames_ts" ->
      """WITH c AS (SELECT doc_id % 8 AS vid, count(*)::BIGINT AS n_rows
                    FROM documents WHERE doc_id < 160 GROUP BY 1),
            p AS (SELECT * FROM (VALUES
               (1, 0, -5911842460359768959), (1, 1, -4367245356331379901),
               (1, 2, 6075181718218525173), (1, 3, 2628736512514743017),
               (2, 0, -1541267189407364191), (2, 1, 7820846899659986897),
               (2, 2, 4315518646593552491), (2, 3, 3254997444723453163),
               (3, 0, 3831853729669327327), (3, 1, 716668274781294701),
               (3, 2, -2931598068608179801), (3, 3, -3408370078018625745),
               (4, 0, -424367030519774589), (4, 1, 109707021242833343),
               (4, 2, -696320392787150201), (4, 3, -1423060614499648149))
              t(base, fidx, phash))
         SELECT c.vid, p.fidx AS frame_index, c.n_rows,
           1::BIGINT AS n_hashes, p.phash::BIGINT AS phash
         FROM c JOIN p ON p.base = c.vid // 2 + 1
         WHERE c.vid % 2 = 0 OR p.fidx < 2""",

    "q_video_frames_mkv_avc" ->
      """WITH c AS (SELECT doc_id % 8 AS vid, count(*)::BIGINT AS n_rows
                    FROM documents WHERE doc_id < 160 GROUP BY 1),
            p AS (SELECT * FROM (VALUES
               (1, 0, -5911842460359768959), (1, 1, -4367245356331379901),
               (1, 2, 6075181718218525173), (1, 3, 2628736512514743017),
               (2, 0, -1541267189407364191), (2, 1, 7820846899659986897),
               (2, 2, 4315518646593552491), (2, 3, 3254997444723453163),
               (3, 0, 3831853729669327327), (3, 1, 716668274781294701),
               (3, 2, -2931598068608179801), (3, 3, -3408370078018625745),
               (4, 0, -424367030519774589), (4, 1, 109707021242833343),
               (4, 2, -696320392787150201), (4, 3, -1423060614499648149))
              t(base, fidx, phash))
         SELECT c.vid, p.fidx AS frame_index, c.n_rows,
           1::BIGINT AS n_hashes, p.phash::BIGINT AS phash
         FROM c JOIN p ON p.base = c.vid // 2 + 1
         WHERE c.vid % 2 = 0 OR p.fidx < 2""",

    "q_video_frames_fmp4" ->
      """WITH c AS (SELECT doc_id % 8 AS vid, count(*)::BIGINT AS n_rows
                    FROM documents WHERE doc_id < 160 GROUP BY 1),
            p AS (SELECT * FROM (VALUES
               (1, 0, -5911842460359768959), (1, 1, -4367245356331379901),
               (1, 2, 6075181718218525173), (1, 3, 2628736512514743017),
               (2, 0, -1541267189407364191), (2, 1, 7820846899659986897),
               (2, 2, 4315518646593552491), (2, 3, 3254997444723453163),
               (3, 0, 3831853729669327327), (3, 1, 716668274781294701),
               (3, 2, -2931598068608179801), (3, 3, -3408370078018625745),
               (4, 0, -424367030519774589), (4, 1, 109707021242833343),
               (4, 2, -696320392787150201), (4, 3, -1423060614499648149))
              t(base, fidx, phash))
         SELECT c.vid, p.fidx AS frame_index, c.n_rows,
           1::BIGINT AS n_hashes, p.phash::BIGINT AS phash
         FROM c JOIN p ON p.base = c.vid // 2 + 1
         WHERE c.vid % 2 = 0 OR p.fidx < 2""",

    // pinned pHashes of the 8 embedded Main-profile CABAC keyframes
    // (bases 1..4 x frames 0..1): a regression anywhere in the CABAC
    // arithmetic engine, the context models, or the shared intra/
    // dequant/deblock stack flips them; vid -> base is vid % 4 + 1
    "q_video_frames_h264_cabac" ->
      """WITH c AS (SELECT doc_id % 8 AS vid, count(*)::BIGINT AS n_rows
                    FROM documents WHERE doc_id < 160 GROUP BY 1),
            p AS (SELECT * FROM (VALUES
               (1, 0, -5911842460359768959), (1, 1, -4367245356331379901),
               (2, 0, -1541267189407364191), (2, 1, 7820846899659986897),
               (3, 0, 3831853729669327327), (3, 1, 716668274781294701),
               (4, 0, -424367030519774589), (4, 1, 109707021242833343))
              t(base, fidx, phash))
         SELECT c.vid, p.fidx AS frame_index, c.n_rows,
           1::BIGINT AS n_hashes, p.phash::BIGINT AS phash
         FROM c JOIN p ON p.base = c.vid % 4 + 1""",

    "q_render_template" ->
      """SELECT n_nationkey, '{"name": "' || n_name || '", "region": ' || n_regionkey || '}' AS rendered FROM nation""",

    "q_pii_redact" ->
      """SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
             text || ' contact user' || doc_id || '@example.com ip 10.0.' || (doc_id % 256) || '.7 tel +155500' || doc_id || '9',
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+?\d[\d\-]{6,}\d', '<PHONE>', 'g') AS text
         FROM documents""",

    "q_rep_words" ->
      """WITH ws AS (
           SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), w -> len(w) > 0) AS w
           FROM documents),
         grams AS (
           SELECT doc_id, w[i] || ' ' || w[i+1] AS g
           FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
                 FROM ws WHERE len(w) >= 2)),
         gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
         top AS (SELECT doc_id, max(c * len(g)) AS rep_chars FROM gc GROUP BY 1),
         base AS (SELECT doc_id, len(array_to_string(w, ' ')) AS total_chars,
                  len(w) AS nw, len(list_distinct(w)) AS dw FROM ws)
         SELECT b.doc_id,
           round(1.0 - dw::DOUBLE / nw, 4) AS word_rep_ratio,
           round(rep_chars::DOUBLE / total_chars, 4) AS top_ngram_char_ratio
         FROM base b LEFT JOIN top t USING (doc_id)""",

    "q_rep_lines" ->
      """WITH docs2 AS (
           SELECT doc_id, text || chr(10) || substr(text, 1, (doc_id % 300 + 1)::INT)
             || chr(10) || 'shared footer line' AS t
           FROM documents),
         lines AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS ln FROM docs2),
         nl AS (SELECT doc_id, ln, len(ln) AS l, count(*) AS c FROM lines
                WHERE len(trim(ln)) > 0 GROUP BY 1, 2, 3),
         agg AS (SELECT doc_id, sum(c) AS n_lines, sum(c) - count(*) AS dups,
                 sum((c - 1) * l) AS dup_chars, sum(c * l) AS tot_chars FROM nl GROUP BY 1)
         SELECT doc_id, n_lines::BIGINT AS n_lines,
           round(dups::DOUBLE / n_lines, 4) AS dup_line_ratio,
           round(dup_chars::DOUBLE / tot_chars, 4) AS dup_line_char_ratio
         FROM agg""",

    "q_boilerplate" ->
      """WITH built AS (
           SELECT doc_id, text || chr(10) || 'subscribe to our newsletter' ||
             CASE WHEN doc_id % 3 <> 0 THEN chr(10) || 'copyright 2026 example corp' ELSE '' END ||
             chr(10) || 'sig ' || md5(text) AS t
           FROM documents),
         lines AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS ln,
                   unnest(generate_series(1, len(string_split(t, chr(10))))) AS pos FROM built),
         boiler AS (SELECT ln FROM (SELECT ln, count(DISTINCT doc_id) AS df FROM lines
                    WHERE len(trim(ln)) > 0 GROUP BY 1) WHERE df >= 100),
         kept AS (SELECT doc_id, pos, ln FROM lines WHERE ln NOT IN (SELECT ln FROM boiler)),
         agg AS (SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS t2 FROM kept GROUP BY 1)
         SELECT b.doc_id, coalesce(a.t2, '') AS text
         FROM built b LEFT JOIN agg a USING (doc_id)""",

    "q_chunk" ->
      """WITH ws AS (
           SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), w -> len(w) > 0) AS w
           FROM documents),
         starts AS (
           SELECT doc_id, w, unnest(generate_series(0, greatest(len(w) - 10, 1) - 1, 20)) AS s
           FROM ws)
         SELECT doc_id, (s / 20)::BIGINT AS chunk_id,
           array_to_string(w[s+1 : s+30], ' ') AS text,
           least(30, len(w) - s)::BIGINT AS n_words
         FROM starts""",

    "q_tfidf" ->
      """WITH tf AS (
           SELECT doc_id, t AS term, count(*) AS tf
           FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> len(w) > 0)) AS t FROM documents)
           GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n FROM documents),
         ranked AS (
           SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             round(tf.tf * ln(n.n::DOUBLE / dfreq.df), 4) AS score,
             row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rank
           FROM tf JOIN dfreq USING (term), n)
         SELECT doc_id, term, tf::BIGINT AS tf, df::BIGINT AS df, score, rank::BIGINT AS rank
         FROM ranked WHERE rank <= 5""",

    "q_top_ngrams" ->
      """WITH grams AS (
           SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
           FROM (SELECT w, unnest(generate_series(1, len(w) - 2)) AS i
                 FROM (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS w FROM documents)
                 WHERE len(w) >= 3))
         SELECT gram, count(*)::BIGINT AS n_occurrences FROM grams GROUP BY 1
         ORDER BY n_occurrences DESC, gram ASC LIMIT 20""",

    "q_decontaminate" ->
      """WITH bench AS (SELECT doc_id, text FROM documents WHERE substr(md5(text), 1, 8) < '33333333'),
         corpus AS (SELECT doc_id, text FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM bench)),
         cw AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS w FROM corpus),
         ct AS (SELECT DISTINCT doc_id,
                  CASE WHEN len(w) >= 5 THEN w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
                       ELSE array_to_string(w, ' ') END AS tok
                FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 4, 1))) AS i FROM cw)),
         bw AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS w FROM bench),
         bt AS (SELECT DISTINCT
                  CASE WHEN len(w) >= 5 THEN w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
                       ELSE array_to_string(w, ' ') END AS tok
                FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 4, 1))) AS i FROM bw))
         SELECT c.doc_id, count(*)::BIGINT AS n_overlap
         FROM ct c JOIN bt b USING (tok) GROUP BY 1""",

    // MinHash banding at these parameters (64 hashes / 16 bands, t≈0.7) has
    // recall 1.0 on this corpus and the exact-Jaccard verify step discards
    // every false candidate, so the result set IS the exact ≥0.7 pair set —
    // which DuckDB computes directly (signatures themselves stay
    // spec-checked: FNV/splitmix isn't expressible here). Unlike the
    // q_dedup_jaccard oracle there is no document-frequency cap: the
    // minhash path takes none.
    "q_dedup_minhash" ->
      """WITH ws AS (
           SELECT doc_id AS id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS w
           FROM documents),
         idx AS (
           SELECT id, w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i FROM ws),
         toks AS (
           SELECT DISTINCT id,
             CASE WHEN len(w) >= 3 THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS tok
           FROM idx),
         counts AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
         inter AS (
           SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
           FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
           GROUP BY 1, 2)
         SELECT a_id, b_id, round(n_common::DOUBLE / (ca.n + cb.n - n_common), 4) AS jaccard
         FROM inter
         JOIN counts ca ON ca.id = a_id
         JOIN counts cb ON cb.id = b_id
         WHERE n_common::DOUBLE / (ca.n + cb.n - n_common) >= 0.7""",

    // The per-document 64-bit SimHash signatures are deterministic
    // (FNV-1a + splitmix64 kernel) but not expressible in DuckDB, so they
    // are dumped once (tools/DumpSimhash, sf0.01) and embedded as literals
    // (SimhashSigs.values). The oracle then brute-forces hamming over ALL
    // pairs — a strictly STRONGER check than mirroring the 4×16 band join,
    // because the pigeonhole guarantee (≤3 differing bits ⇒ at least one of
    // four 16-bit chunks equal) means the banded result set must equal the
    // full hamming≤3 pair set; any band the engine dropped would show up
    // here as a missing row.
    "q_dedup_simhash" ->
      s"""WITH sigs(doc_id, sig) AS (VALUES ${SimhashSigs.values})
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.sig, b.sig)) <= 3""",

    // epoch_ms matches java.sql.Timestamp.getTime millisecond truncation
    "q_stream_sessions" ->
      """WITH flags AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS new_s
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         sess AS (
           SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
           FROM flags)
         SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS total_value
         FROM sess GROUP BY user_id, sid""",
  )
}

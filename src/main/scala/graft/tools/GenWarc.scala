// scratch fixture/gate-data generator for the WARC/WET source
package graft.tools

import java.nio.file.{Files, Paths}

/**
 * Writes WET-style WARC files per ISO 28500 (the publicly documented
 * Common Crawl layout): a `warcinfo` header record followed by one
 * `conversion` record per document, CRLF header blocks, Content-Length
 * payloads in bytes, and — when gzipped — ONE GZIP MEMBER PER RECORD,
 * exactly how Common Crawl writes `.wet.gz` (member-concatenated), which
 * exercises the reader's concatenated-stream decompression.
 */
object GenWarc {

  /** codec: "" (plain), "gzip" or "zstd" — one compressed member/frame per
    * record, the Common Crawl layout for `.gz` and `.zst` alike. */
  def writeCodec(path: String, docs: Seq[(String, String)], codec: String,
                 recordType: String = "conversion"): Unit = {
    def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
      val sb = new StringBuilder("WARC/1.0\r\n")
      (headers :+ ("Content-Length" -> payload.length.toString)).foreach {
        case (k, v) => sb.append(s"$k: $v\r\n")
      }
      sb.append("\r\n")
      sb.toString.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val info = record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2026-01-01T00:00:00Z"),
      "software: graft test writer\r\n".getBytes("UTF-8"))
    val recs = info +: docs.map { case (uri, text) =>
      val payload =
        if (recordType == "response") // the WARC http envelope shape
          ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + text).getBytes("UTF-8")
        else text.getBytes("UTF-8")
      record(Seq(
        "WARC-Type" -> recordType,
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> "2026-01-01T00:00:00Z"),
        payload)
    }
    val out = new java.io.ByteArrayOutputStream()
    codec match {
      case "" => recs.foreach(out.write)
      case "gzip" => recs.foreach { r => // one gzip member per record
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(r); g.finish(); g.close()
      }
      case "zstd" => recs.foreach { r => // one zstd frame per record
        val z = new com.github.luben.zstd.ZstdOutputStream(out)
        z.write(r); z.close()
      }
      case other => throw new IllegalArgumentException(s"codec $other")
    }
    Files.write(Paths.get(path), out.toByteArray)
  }

  def write(path: String, docs: Seq[(String, String)], gzip: Boolean,
            recordType: String = "conversion"): Unit =
    writeCodec(path, docs, if (gzip) "gzip" else "", recordType)
}

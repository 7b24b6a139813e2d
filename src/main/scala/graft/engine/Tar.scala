package graft.engine

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import scala.jdk.CollectionConverters._

/**
 * Streaming tar / zip archive member extraction — the WebDataset shard
 * shape (a multimodal training corpus shipped as `shard-0000.tar` files
 * whose members are `key.ext` payloads: `0001.jpg`, `0001.txt`,
 * `0001.json`, ...). Beyond-reference: the reference engine has no
 * archive sources; this tier exists because LAION-style image/text and
 * speech corpora are distributed exactly this way.
 *
 * Scale design: the SHARD is the unit of parallelism (the convention the
 * format exists for — shards are written ~1 GiB so a reader never needs
 * sub-file splits), so shards parse file-per-task via `binaryFilesSpread`
 * and members stream ONE AT A TIME off the open HDFS stream — peak
 * memory per task is one member (capped), never the archive. Nothing
 * here touches the driver.
 *
 * Tar parsing is from scratch against the POSIX.1-1988 ustar layout plus
 * the two extensions real shards carry: GNU `L` long-name records and
 * PAX `x`/`g` extended headers (`len key=value\n` records; `path` and
 * `size` overrides honored). Header checksums are verified — a desynced
 * or bit-flipped stream rejects diagnosably rather than yielding garbage
 * members. Member sizes parse as octal or GNU base-256 and are bounded
 * by `memberCap` BEFORE allocation.
 */
object Tar {

  /** One archive member: name as stored, payload bytes. */
  final case class Entry(name: String, bytes: Array[Byte])

  /** Hard per-member allocation bound (1 GiB): a crafted size field must
    * not reserve memory; real WebDataset members are ≤ a few MB. */
  val memberCap: Long = 1L << 30

  private val Block = 512

  // ---------------------------------------------------------------- tar

  /** Stream tar members off `in` (caller owns/closes via the iterator
    * being fully consumed or abandoned; we close on terminal states).
    * Directories, links and specials are skipped; PAX and GNU long-name
    * metadata records apply to the following member. */
  def tarEntries(in: InputStream): Iterator[Entry] = new Iterator[Entry] {
    private var nextEntry: Entry = null
    private var done = false
    private var pendingLongName: String = null
    private var pendingPax: Map[String, String] = Map.empty
    private var globalPax: Map[String, String] = Map.empty
    private var zeroBlocks = 0

    private def readBlock(buf: Array[Byte]): Boolean = {
      var got = 0
      while (got < Block) {
        val k = in.read(buf, got, Block - got)
        if (k < 0) {
          if (got == 0) return false
          throw new IllegalArgumentException(
            s"tar: truncated header block (got $got of $Block bytes)")
        }
        got += k
      }
      true
    }

    /** Octal (NUL/space-padded) or GNU base-256 numeric field. */
    private def numeric(buf: Array[Byte], off: Int, len: Int, what: String): Long = {
      if ((buf(off) & 0x80) != 0) {
        // base-256: big-endian two's complement with the top bit of the
        // first byte as the marker
        var v = (buf(off) & 0x3fL)
        var i = off + 1
        while (i < off + len) {
          if (v > (Long.MaxValue >> 8))
            throw new IllegalArgumentException(s"tar: $what field overflows")
          v = (v << 8) | (buf(i) & 0xffL); i += 1
        }
        v
      } else {
        var v = 0L
        var i = off
        var seen = false
        while (i < off + len) {
          val c = buf(i) & 0xff
          if (c >= '0' && c <= '7') {
            if (v > (Long.MaxValue >> 3))
              throw new IllegalArgumentException(s"tar: $what field overflows")
            v = (v << 3) | (c - '0'); seen = true
          } else if (c == 0 || c == ' ') { /* padding */ }
          else throw new IllegalArgumentException(
            s"tar: non-octal byte 0x${c.toHexString} in $what field")
          i += 1
        }
        if (!seen && (buf(off) & 0xff) != 0 && (buf(off) & 0xff) != ' ')
          throw new IllegalArgumentException(s"tar: empty $what field")
        v
      }
    }

    /** POSIX header checksum: unsigned byte sum with the chksum field
      * (148..155) counted as spaces. Some historic writers summed signed
      * bytes; accept either, reject everything else. */
    private def verifyChecksum(buf: Array[Byte]): Unit = {
      val stored = numeric(buf, 148, 8, "chksum")
      var unsigned = 0L; var signed = 0L
      var i = 0
      while (i < Block) {
        val b = if (i >= 148 && i < 156) ' '.toByte else buf(i)
        unsigned += (b & 0xff); signed += b
        i += 1
      }
      if (stored != unsigned && stored != signed)
        throw new IllegalArgumentException(
          s"tar: header checksum mismatch (stored $stored, computed $unsigned)")
    }

    private def cstr(buf: Array[Byte], off: Int, len: Int): String = {
      var end = off
      while (end < off + len && buf(end) != 0) end += 1
      new String(buf, off, end - off, UTF_8)
    }

    private def readPayload(size: Long, what: String): Array[Byte] = {
      if (size > memberCap)
        throw new IllegalArgumentException(
          s"tar: $what of $size bytes exceeds the ${memberCap} member cap")
      val out = new Array[Byte](size.toInt)
      var got = 0
      while (got < size) {
        val k = in.read(out, got, size.toInt - got)
        if (k < 0) throw new IllegalArgumentException(
          s"tar: truncated member payload (got $got of $size bytes)")
        got += k
      }
      val pad = ((Block - (size % Block)) % Block).toInt
      var skipped = 0L
      while (skipped < pad) {
        val k = in.skip(pad - skipped)
        if (k <= 0) {
          if (in.read() < 0) throw new IllegalArgumentException(
            "tar: truncated padding after member payload")
          skipped += 1
        } else skipped += k
      }
      out
    }

    /** `len key=value\n` records (PAX, IEEE 1003.1-2001). */
    private def parsePax(bytes: Array[Byte]): Map[String, String] = {
      val m = Map.newBuilder[String, String]
      var p = 0
      while (p < bytes.length) {
        var q = p
        while (q < bytes.length && bytes(q) != ' ') q += 1
        if (q >= bytes.length) throw new IllegalArgumentException(
          "tar: malformed pax record (no length delimiter)")
        val len = new String(bytes, p, q - p, ISO_8859_1).toInt
        if (len <= (q - p) + 1 || p + len > bytes.length || bytes(p + len - 1) != '\n')
          throw new IllegalArgumentException("tar: malformed pax record length")
        val kv = new String(bytes, q + 1, p + len - 1 - (q + 1), UTF_8)
        val eq = kv.indexOf('=')
        if (eq < 0) throw new IllegalArgumentException("tar: pax record without `=`")
        m += (kv.substring(0, eq) -> kv.substring(eq + 1))
        p += len
      }
      m.result()
    }

    private def advance(): Unit = {
      val buf = new Array[Byte](Block)
      while (nextEntry == null && !done) {
        if (!readBlock(buf)) {
          // EOF without the two-zero-block trailer: tolerated (many
          // writers truncate the trailer) as long as no member was cut
          done = true; in.close(); return
        }
        if (buf.forall(_ == 0)) {
          zeroBlocks += 1
          if (zeroBlocks >= 2) { done = true; in.close(); return }
        } else {
          zeroBlocks = 0
          verifyChecksum(buf)
          val typeflag = buf(156).toChar
          val size = numeric(buf, 124, 12, "size")
          typeflag match {
            case 'L' => // GNU long name: payload is the next member's name
              pendingLongName = new String(readPayload(size, "long-name record"), UTF_8)
                .takeWhile(_ != 0)
            case 'x' =>
              pendingPax = parsePax(readPayload(size, "pax header"))
            case 'g' =>
              globalPax = globalPax ++ parsePax(readPayload(size, "pax global header"))
            case '0' | '\u0000' | '7' => // regular file ('7' = contiguous, treated as regular)
              val pax = globalPax ++ pendingPax
              val name0 =
                if (pendingLongName != null) pendingLongName
                else {
                  val base = cstr(buf, 0, 100)
                  val prefix = cstr(buf, 345, 155)
                  if (prefix.nonEmpty) s"$prefix/$base" else base
                }
              val name = pax.getOrElse("path", name0)
              val realSize = pax.get("size").map(_.toLong).getOrElse(size)
              val bytes = readPayload(realSize, s"member `$name`")
              pendingLongName = null; pendingPax = Map.empty
              nextEntry = Entry(name, bytes)
            case _ => // dir / link / device / fifo: skip payload (if any)
              readPayload(size, "skipped member")
              pendingLongName = null; pendingPax = Map.empty
          }
        }
      }
    }

    override def hasNext: Boolean = {
      if (nextEntry == null && !done) advance()
      nextEntry != null
    }
    override def next(): Entry = {
      if (!hasNext) throw new NoSuchElementException("tar: exhausted")
      val e = nextEntry; nextEntry = null; e
    }
  }

  // ---------------------------------------------------------------- zip

  /** Stream zip members (directories skipped). `ZipInputStream` walks the
    * local-header stream, so this never needs the central directory and
    * works on an HDFS open stream like tar. */
  def zipEntries(in: InputStream): Iterator[Entry] = new Iterator[Entry] {
    private val zin = new java.util.zip.ZipInputStream(in)
    private var nextEntry: Entry = null
    private var done = false

    private def advance(): Unit = {
      while (nextEntry == null && !done) {
        val ze =
          try zin.getNextEntry
          catch { case e: java.util.zip.ZipException =>
            throw new IllegalArgumentException(s"zip: ${e.getMessage}") }
        if (ze == null) { done = true; zin.close() }
        else if (!ze.isDirectory) {
          if (ze.getSize > memberCap)
            throw new IllegalArgumentException(
              s"zip: member `${ze.getName}` of ${ze.getSize} bytes exceeds the $memberCap member cap")
          val out = new ByteArrayOutputStream(math.max(64, ze.getSize.toInt.max(0)))
          val buf = new Array[Byte](64 << 10)
          var k = zin.read(buf)
          while (k >= 0) {
            out.write(buf, 0, k)
            if (out.size() > memberCap)
              throw new IllegalArgumentException(
                s"zip: member `${ze.getName}` exceeds the $memberCap member cap")
            k = zin.read(buf)
          }
          nextEntry = Entry(ze.getName, out.toByteArray)
        }
      }
    }

    override def hasNext: Boolean = {
      if (nextEntry == null && !done) advance()
      nextEntry != null
    }
    override def next(): Entry = {
      if (!hasNext) throw new NoSuchElementException("zip: exhausted")
      val e = nextEntry; nextEntry = null; e
    }
  }

  /** WebDataset member-name split: the sample key is the basename up to
    * the FIRST dot, the extension is everything after it — so
    * `a/0001.seg.png` groups with `a/0001.txt` under key `a/0001` with
    * exts `seg.png` / `txt`. A dotless name keys as itself with ext "". */
  def splitKeyExt(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  // ------------------------------------------------------------- writer

  /** Streaming shard writer (plain ustar, checksummed, two-zero-block
    * trailer; names >100 chars emitted as GNU `L` records) — entries
    * stream straight to `out` one at a time, so a writer task's memory
    * is one member, never the shard. */
  final class TarOutput(out: OutputStream) {
    private def header(name: String, size: Long, typeflag: Char): Array[Byte] = {
      val h = new Array[Byte](Block)
      val nb = name.getBytes(UTF_8)
      System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
      def octal(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes(ISO_8859_1), 0, h, off, len - 1)
      }
      octal(420, 100, 8) // mode 0644
      octal(0, 108, 8); octal(0, 116, 8) // uid gid
      octal(size, 124, 12)
      octal(0, 136, 12) // mtime: fixed 0 for determinism
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = typeflag.toByte
      System.arraycopy("ustar ".getBytes(ISO_8859_1), 0, h, 257, 6)
      h(263) = '0'; h(264) = '0'
      var sum = 0L
      h.foreach(b => sum += (b & 0xff))
      val cs = java.lang.Long.toOctalString(sum)
      val padded = ("0" * (6 - cs.length)) + cs
      System.arraycopy(padded.getBytes(ISO_8859_1), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      h
    }
    private def pad(n: Long): Unit = {
      val p = ((Block - (n % Block)) % Block).toInt
      if (p > 0) out.write(new Array[Byte](p))
    }
    def add(name: String, bytes: Array[Byte]): Unit = {
      if (name.getBytes(UTF_8).length > 100) {
        val nb = name.getBytes(UTF_8)
        out.write(header("././@LongLink", nb.length.toLong, 'L'))
        out.write(nb); pad(nb.length.toLong)
      }
      out.write(header(name, bytes.length.toLong, '0'))
      out.write(bytes); pad(bytes.length.toLong)
    }
    def finish(): Unit = {
      out.write(new Array[Byte](2 * Block))
      out.close()
    }
  }

  /** One-shot tar (fixtures). */
  def write(out: OutputStream, entries: Seq[(String, Array[Byte])]): Unit = {
    val t = new TarOutput(out)
    entries.foreach { case (name, bytes) => t.add(name, bytes) }
    t.finish()
  }

  def writeFile(path: java.nio.file.Path, entries: Seq[(String, Array[Byte])],
                gzip: Boolean = false): Unit = {
    val fos = java.nio.file.Files.newOutputStream(path)
    val os: OutputStream = if (gzip) new java.util.zip.GZIPOutputStream(fos) else fos
    write(os, entries)
  }

  def writeZip(path: java.nio.file.Path, entries: Seq[(String, Array[Byte])]): Unit = {
    val z = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(path))
    entries.foreach { case (name, bytes) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(0L) // determinism
      z.putNextEntry(e); z.write(bytes); z.closeEntry()
    }
    z.close()
  }

  /** Distributed WebDataset shard SINK: one tar per partition, written by
    * the partition's own task straight to `dir/shard-<part>.tar[.gz]` —
    * members stream through [[TarOutput]] (task memory = one member), and
    * re-executed tasks overwrite their shard in place (idempotent). The
    * caller controls shard count/size by partitioning first (the ~1 GiB
    * WebDataset convention ⇒ `df.repartition(bytes/1GiB)`); co-locating a
    * sample's members in one shard = `repartition(n, col("key"))`.
    * Columns: `key`, `ext` (empty = no dot), binary `content`. */
  def writeShards(df: org.apache.spark.sql.DataFrame, dir: String,
                  gzip: Boolean = false, zstd: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.col
    require(!(gzip && zstd), "tar sink: pick one of gzip|zstd")
    val need = Seq("key", "ext", "content")
    val missing = need.filterNot(df.columns.contains)
    require(missing.isEmpty, s"tar sink: frame is missing columns [${missing.mkString(", ")}]")
    val sc = df.sparkSession.sparkContext
    val confSnapshot = sc.hadoopConfiguration.asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val bconf = sc.broadcast(confSnapshot)
    val suffix = if (gzip) ".tar.gz" else if (zstd) ".tar.zst" else ".tar"
    // Overwrite semantics: a re-run with FEWER partitions must not leave
    // stale shard-NNNNN files from a wider prior run behind — the tar
    // source reads every file in the directory, so leftovers silently
    // duplicate rows (same failure mode the Avro sink fixed in 8843c6b).
    locally {
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val fs = dirPath.getFileSystem(sc.hadoopConfiguration)
      if (fs.exists(dirPath)) fs.delete(dirPath, true)
      fs.mkdirs(dirPath)
    }
    df.select(col("key").cast("string"), col("ext").cast("string"), col("content"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val part = org.apache.spark.TaskContext.getPartitionId()
          val conf = new org.apache.hadoop.conf.Configuration(false)
          bconf.value.foreach { case (k, v) => conf.set(k, v) }
          val p = new org.apache.hadoop.fs.Path(f"$dir/shard-$part%05d$suffix")
          val fs = p.getFileSystem(conf)
          val raw: OutputStream = fs.create(p, true)
          val tar = new TarOutput(
            if (gzip) new java.util.zip.GZIPOutputStream(raw)
            else if (zstd) new com.github.luben.zstd.ZstdOutputStream(raw)
            else raw)
          it.foreach { r =>
            val key = r.getString(0)
            val ext = Option(r.getString(1)).getOrElse("")
            val name = if (ext.isEmpty) key else s"$key.$ext"
            val bytes = Option(r.get(2)).map(_.asInstanceOf[Array[Byte]])
              .getOrElse(Array.empty[Byte])
            tar.add(name, bytes)
          }
          tar.finish()
        }
      }
  }
}

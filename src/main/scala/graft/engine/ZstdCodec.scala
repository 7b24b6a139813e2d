package graft.engine

import java.io.{InputStream, OutputStream}
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream,
  CompressionOutputStream, Compressor, Decompressor}

/**
 * Hadoop compression codec for `.zst` files, backed by the zstd-jni
 * already on Spark's classpath (Spark ships it for shuffle / event-log
 * compression; Hadoop's own ZStandardCodec needs native libhadoop, which
 * many deployments — including this one — don't have). Registering the
 * codec in `io.compression.codecs` ([[Sources.ensureZstdCodec]]) makes
 * EVERY Spark text-based reader (csv / tsv / json / jsonl / text, and
 * therefore every graft source built on them) read `*.zst` transparently
 * — the compression crawl corpora actually ship in.
 *
 * Stream codec, NOT splittable — the same contract as gzip: one task per
 * file, so shard inputs for parallelism (the WARC/WET ~1 GiB-object
 * convention). The Compressor/Decompressor stubs exist only because
 * Hadoop's CodecPool insists on pooling them; the streams below wrap
 * zstd-jni directly and never touch them.
 */
final class ZstdCodec extends CompressionCodec {
  override def getDefaultExtension: String = ".zst"
  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdCodec.In(in)
  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)
  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstdCodec.Out(out)
  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)
  override def getCompressorType: Class[_ <: Compressor] = classOf[ZstdCodec.NoopCompressor]
  override def createCompressor(): Compressor = new ZstdCodec.NoopCompressor
  override def getDecompressorType: Class[_ <: Decompressor] = classOf[ZstdCodec.NoopDecompressor]
  override def createDecompressor(): Decompressor = new ZstdCodec.NoopDecompressor
}

object ZstdCodec {
  private final class In(raw: InputStream) extends CompressionInputStream(raw) {
    private var z = new com.github.luben.zstd.ZstdInputStream(raw)
    override def read(): Int = z.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int = z.read(b, off, len)
    override def resetState(): Unit = { z = new com.github.luben.zstd.ZstdInputStream(in) }
  }

  private final class Out(raw: OutputStream) extends CompressionOutputStream(raw) {
    private val z = new com.github.luben.zstd.ZstdOutputStream(raw)
    private var finished = false
    override def write(b: Int): Unit = z.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit = z.write(b, off, len)
    override def finish(): Unit = if (!finished) { finished = true; z.close() }
    override def resetState(): Unit = ()
    override def close(): Unit = { finish() }
  }

  /** Pool placeholders (never used for actual (de)compression). */
  final class NoopDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = false
    override def decompress(b: Array[Byte], off: Int, len: Int): Int =
      throw new UnsupportedOperationException("zstd decode rides the stream, not the pool")
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }

  final class NoopCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = ()
    override def finished(): Boolean = false
    override def compress(b: Array[Byte], off: Int, len: Int): Int =
      throw new UnsupportedOperationException("zstd encode rides the stream, not the pool")
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(conf: org.apache.hadoop.conf.Configuration): Unit = ()
  }

  /** Write `bytes` as one zstd frame (fixture/test face). */
  def compress(bytes: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(bytes)
}

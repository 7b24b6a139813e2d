// scratch fixture/gate-data generator for the feather (Arrow IPC) source
package graft.tools

/**
 * Writes Feather v2 files — which are exactly the Arrow IPC *file* format
 * (the layout `pd.read_feather`/`pd.to_feather` exchange) — through the
 * arrow-vector library that ships with Spark. Long + UTF-8 columns are
 * enough for the oracle round-trip queries; the SourcesSpec feather test
 * covers nulls and doubles separately.
 */
object GenArrow {
  sealed trait Col { def name: String }
  final case class LongCol(name: String, values: Seq[Long]) extends Col
  final case class StrCol(name: String, values: Seq[String]) extends Col

  def write(path: String, cols: Seq[Col], nrows: Int): Unit = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, VarCharVector, VectorSchemaRoot}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import scala.jdk.CollectionConverters._
    val alloc = new RootAllocator()
    val schema = new ASchema(cols.map {
      case c: LongCol =>
        new Field(c.name, FieldType.nullable(new ArrowType.Int(64, true)), null)
      case c: StrCol =>
        new Field(c.name, FieldType.nullable(ArrowType.Utf8.INSTANCE), null)
    }.asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    cols.foreach {
      case c: LongCol =>
        val v = root.getVector(c.name).asInstanceOf[BigIntVector]
        v.allocateNew(nrows)
        c.values.zipWithIndex.foreach { case (x, i) => v.setSafe(i, x) }
      case c: StrCol =>
        val v = root.getVector(c.name).asInstanceOf[VarCharVector]
        v.allocateNew(nrows)
        c.values.zipWithIndex.foreach { case (x, i) =>
          if (x == null) v.setNull(i) else v.setSafe(i, x.getBytes("UTF-8"))
        }
    }
    root.setRowCount(nrows)
    val chan = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(path),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    val w = new ArrowFileWriter(root, null, chan)
    try { w.start(); w.writeBatch(); w.end() }
    finally { w.close(); chan.close(); root.close(); alloc.close() }
  }
}

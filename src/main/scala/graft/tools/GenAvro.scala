// scratch fixture/gate-data generator for the Avro source
package graft.tools

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericData, GenericRecord}

/**
 * Writes Avro object container files through the canonical Apache Avro
 * Java library (the same one engine/Avro.scala reads with) — used by gate
 * query `q_source_avro` and the SourcesSpec round-trip. Columns: `long`,
 * `double` and nullable-`string` (union with null), deflate-compressed to
 * exercise the codec path.
 */
object GenAvro {

  sealed trait Col { def name: String }
  final case class LongCol(name: String, values: Seq[Long]) extends Col
  final case class DblCol(name: String, values: Seq[Double]) extends Col
  final case class StrCol(name: String, values: Seq[String]) extends Col // null ok

  def write(path: String, cols: Seq[Col], nrows: Int): Unit = {
    var b = SchemaBuilder.record("graft_row").fields()
    cols.foreach {
      case c: LongCol => b = b.requiredLong(c.name)
      case c: DblCol => b = b.requiredDouble(c.name)
      case c: StrCol => b = b.optionalString(c.name) // union ["null","string"]
    }
    val schema: Schema = b.endRecord()
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(schema, new java.io.File(path))
    try {
      (0 until nrows).foreach { r =>
        val rec = new GenericData.Record(schema)
        cols.foreach {
          case LongCol(n, vs) => rec.put(n, vs(r))
          case DblCol(n, vs) => rec.put(n, vs(r))
          case StrCol(n, vs) => rec.put(n, vs(r)) // null passes through
        }
        writer.append(rec)
      }
    } finally writer.close()
  }
}

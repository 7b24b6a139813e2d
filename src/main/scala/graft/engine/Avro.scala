package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

/**
 * Avro object-container-file source — a beyond-reference format (the
 * reference reads csv/excel/parquet/…, not avro), added because avro is a
 * staple interchange format in the data-lake pipelines this engine
 * targets. Parsing uses the canonical Apache Avro Java library already on
 * the Spark classpath (`org.apache.avro`) rather than a re-implementation,
 * so format conformance is the reference implementation's own.
 *
 * Values land in the engine's all-string model: null (union) fields → "",
 * Utf8/primitive scalars via toString (booleans "true"/"false"), bytes
 * decoded as UTF-8, and nested records/arrays/maps through Avro's own
 * JSON-style rendering. Driver-side parse like the other binary sources —
 * a single container file; rows are parallelized after. (At 100 TB, avro
 * is an ingest edge; the hot path is parquet/orc with pushdown.)
 */
object Avro {

  def read(spark: SparkSession, path: String): DataFrame = {
    val reader = new DataFileReader[GenericRecord](
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try {
      val fields = reader.getSchema.getFields
      val names = (0 until fields.size()).map(i => fields.get(i).name())
      val rows = scala.collection.mutable.ArrayBuffer[Row]()
      while (reader.hasNext) {
        val rec = reader.next()
        rows += Row((0 until fields.size()).map(i => render(rec.get(i))): _*)
      }
      val schema = StructType(names.map(n => StructField(n, StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq), schema)
    } finally reader.close()
  }

  private def render(v: Any): String = v match {
    case null => ""
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
      new String(a, "UTF-8")
    case other => other.toString // Utf8, numbers, booleans, nested → JSON-ish
  }
}

package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
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

  /** Read every `*.avro` part file under a directory (the sink's output
    * shape) as one frame; a plain file path reads as before. */
  def readAny(spark: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    if (!f.isDirectory) read(spark, path)
    else {
      val parts = Option(f.listFiles()).getOrElse(Array.empty)
        .filter(p => p.isFile && p.getName.endsWith(".avro")).sortBy(_.getName)
      require(parts.nonEmpty, s"avro: no .avro part files under $path")
      parts.map(p => read(spark, p.getPath)).reduce(_.unionAll(_))
    }
  }

  // ------------------------------------------------------------------ sink

  /** Avro names must match [A-Za-z_][A-Za-z0-9_]*; anything else maps to
    * `_` (a leading digit gains a `_` prefix) — documented lossy edge. */
  private def avroName(n: String): String = {
    val s = n.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
    if (s.isEmpty || s.head.isDigit) "_" + s else s
  }

  /** Distributed Avro object-container sink: each partition writes one
    * `part-NNNNN.avro` through the canonical Apache Avro `DataFileWriter`
    * (same library as the source — format conformance is the reference
    * implementation's own), so shards stream row-by-row with bounded
    * memory and file-level parallelism mirrors the tar sink. Partition 0
    * always writes (a header-only file keeps an empty frame readable).
    *
    * Column canonicalization (documented, lossy only at the edges):
    * timestamps → long epoch micros tagged `timestamp-micros`, dates →
    * int epoch days tagged `date`, decimals → string, complex types →
    * their JSON rendering; primitive long/int/double/float/boolean/
    * string/binary map 1:1, nullable fields as `["null", T]` unions. */
  def write(df: DataFrame, dir: String, compression: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.{col, to_json, unix_micros, datediff, lit, to_date}
    import org.apache.spark.sql.types._
    val canon = df.select(df.schema.fields.map { f =>
      val c = col("`" + f.name.replace("`", "``") + "`")
      (f.dataType match {
        case TimestampType | TimestampNTZType => unix_micros(c.cast("timestamp"))
        case DateType => datediff(c, to_date(lit("1970-01-01")))
        case _: DecimalType => c.cast("string")
        // Short/Byte must be widened: Avro union resolution only recognizes
        // java.lang.Integer for an "int" branch, so an uncast Short/Byte in
        // a ["null","int"] union throws "Unknown datum type" at write time.
        case ShortType | ByteType => c.cast("int")
        case LongType | IntegerType | DoubleType |
             FloatType | BooleanType | StringType | BinaryType => c
        case _: ArrayType | _: MapType | _: StructType => to_json(c)
        case _ => c.cast("string")
      }).as(f.name)
    }.toIndexedSeq: _*)
    val logical: Map[String, String] = df.schema.fields.collect {
      case f if f.dataType == TimestampType || f.dataType == TimestampNTZType =>
        f.name -> "timestamp-micros"
      case f if f.dataType == DateType => f.name -> "date"
    }.toMap
    def typ(f: StructField): String = {
      val base = f.dataType match {
        case LongType => "\"long\""
        case IntegerType | ShortType | ByteType => "\"int\""
        case DoubleType => "\"double\""
        case FloatType => "\"float\""
        case BooleanType => "\"boolean\""
        case BinaryType => "\"bytes\""
        case _ => "\"string\""
      }
      logical.get(f.name) match {
        case Some(lt) => s"""{"type":${base},"logicalType":"$lt"}"""
        case None => base
      }
    }
    val fieldsJson = canon.schema.fields.map { f =>
      if (f.nullable)
        s"""{"name":"${avroName(f.name)}","type":["null",${typ(f)}],"default":null}"""
      else s"""{"name":"${avroName(f.name)}","type":${typ(f)}}"""
    }.mkString(",")
    val schemaJson =
      s"""{"type":"record","name":"row","namespace":"graft","fields":[$fieldsJson]}"""
    new org.apache.avro.Schema.Parser().parse(schemaJson) // validate on the driver

    val sc = canon.sparkSession.sparkContext
    import scala.jdk.CollectionConverters._
    val confSnapshot = sc.hadoopConfiguration.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val bconf = sc.broadcast(confSnapshot)
    val codec = compression.map(_.toLowerCase)
    require(codec.forall(Set("deflate", "snappy", "zstandard", "zstd", "null").contains),
      s"avro sink: unsupported compression `${compression.get}` (deflate/snappy/zstandard)")
    val nFields = canon.schema.fields.length
    def writeOne(part: Int, it: Iterator[Row],
                 conf: org.apache.hadoop.conf.Configuration): Unit = {
      val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      val p = new org.apache.hadoop.fs.Path(f"$dir/part-$part%05d.avro")
      val out = p.getFileSystem(conf).create(p, true)
      val w = new DataFileWriter[org.apache.avro.generic.GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
      codec.foreach {
        case "deflate" => w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        case "snappy" => w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
        case "zstandard" | "zstd" =>
          w.setCodec(org.apache.avro.file.CodecFactory.zstandardCodec(3))
        case _ => ()
      }
      w.create(schema, out)
      it.foreach { row =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        var i = 0
        while (i < nFields) {
          val v = row.get(i) match {
            case null => null
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case x => x // Long/Int/Double/Float/Boolean/String pass through
          }
          rec.put(i, v)
          i += 1
        }
        w.append(rec)
      }
      w.close()
    }
    // overwrite semantics like the spark writers: clear the target first,
    // or a re-run with FEWER partitions leaves stale part files mixed into
    // the directory (a silent row-duplication bug on repeated runs)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dfs = dirPath.getFileSystem(sc.hadoopConfiguration)
    if (dfs.exists(dirPath)) dfs.delete(dirPath, true)
    val rdd = canon.rdd
    // an empty relation optimizes to a ZERO-partition RDD (no task would
    // ever run) — write the header-only part on the driver so the output
    // stays readable with its schema
    if (rdd.getNumPartitions == 0) writeOne(0, Iterator.empty, sc.hadoopConfiguration)
    else rdd.mapPartitionsWithIndex { (part, it) =>
      if (it.hasNext || part == 0) {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        bconf.value.foreach { case (k, v) => conf.set(k, v) }
        writeOne(part, it, conf)
      }
      Iterator.empty
    }.count() // one action drives the distributed write
    ()
  }
}

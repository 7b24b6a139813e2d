package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/**
 * Audio/video payload expressions — the WAV/MP4 face of the multimodal
 * tier ([[graft.functions.MediaKernels]]), fused into whole-stage codegen
 * like the image expressions: a 100 TB media metadata sweep is a single
 * narrow scan.
 */

/** struct(format, channels, sample_rate, bits, n_samples, duration_ms)
  * from RIFF/WAVE headers — no sample decode. */
case class AudioMeta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_meta requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("codec", StringType, nullable = true)))
  override def prettyName: String = "audio_meta"

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.MediaKernels.audioMetaRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaKernels.audioMetaRow($c);")

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

/** struct(n_samples, sq_sum, zero_crossings, peak) over decoded PCM16 —
  * NULL for undecodable payloads (nullable beyond the child, hand-rolled
  * codegen like PerceptualHash). */
case class AudioFeatures(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_features requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sq_sum", LongType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false),
    StructField("peak", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "audio_features"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else graft.functions.MediaKernels.audioFeaturesRow(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val r = ctx.freshName("af")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      InternalRow ${ev.value} = null;
      if (!${childGen.isNull}) {
        org.apache.spark.sql.catalyst.expressions.GenericInternalRow $r =
          graft.functions.MediaKernels.audioFeaturesRow(${childGen.value});
        if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r; }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): AudioFeatures =
    copy(child = newChild)
}

/** 63-bit energy-delta audio fingerprint (the audio dHash) — NULL for
  * undecodable or <64-sample payloads. */
case class AudioFingerprint(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_fingerprint requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_fingerprint"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = graft.functions.MediaKernels.audioFingerprint(v.asInstanceOf[Array[Byte]])
      if (r == null) null else r.longValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val r = ctx.freshName("afp")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${childGen.isNull}) {
        java.lang.Long $r =
          graft.functions.MediaKernels.audioFingerprint(${childGen.value});
        if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.longValue(); }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): AudioFingerprint =
    copy(child = newChild)
}

/** 60-bit LOSSY-TOLERANT spectral fingerprint (16 time segments x 4
  * Haar octave bands, sign-of-delta — the audio pHash): bit-identical
  * across lossless containers of the same recording, hamming-near
  * across its Ogg-Vorbis encode (native decode). NULL for undecodable
  * or <128-sample payloads. */
case class AudioFingerprintSpectral(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_fingerprint_spectral requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_fingerprint_spectral"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = graft.functions.MediaKernels.audioFingerprintSpectral(v.asInstanceOf[Array[Byte]])
      if (r == null) null else r.longValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val r = ctx.freshName("asfp")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${childGen.isNull}) {
        java.lang.Long $r =
          graft.functions.MediaKernels.audioFingerprintSpectral(${childGen.value});
        if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.longValue(); }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): AudioFingerprintSpectral =
    copy(child = newChild)
}

/** Transcode any decodable audio payload to mono Ogg-Vorbis at the
  * source rate (native encoder; multi-channel downmixes by average).
  * `transparent` selects the near-lossless two-pass grid; otherwise the
  * ~45 dB single-pass mode. NULL for undecodable payloads. */
case class AudioTranscodeVorbis(child: Expression, transparent: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_transcode_vorbis requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_transcode_vorbis"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else graft.functions.MediaKernels.audioTranscodeVorbis(
      v.asInstanceOf[Array[Byte]], transparent)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val r = ctx.freshName("atv")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      byte[] ${ev.value} = null;
      if (!${childGen.isNull}) {
        byte[] $r = graft.functions.MediaKernels.audioTranscodeVorbis(
          ${childGen.value}, $transparent);
        if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r; }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): AudioTranscodeVorbis =
    copy(child = newChild)
}

/** Grayscale PNG thumbnail at fixed target dimensions — NULL for
  * undecodable payloads. */
case class ImageThumbnail(child: Expression, w: Int, h: Int) extends UnaryExpression {
  require(w > 0 && h > 0, s"image_thumbnail: dims must be positive, got ${w}x$h")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_thumbnail requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "image_thumbnail"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else graft.functions.ImageKernels.thumbnail(v.asInstanceOf[Array[Byte]], w, h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val r = ctx.freshName("thumb")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      byte[] ${ev.value} = null;
      if (!${childGen.isNull}) {
        byte[] $r = graft.functions.ImageKernels.thumbnail(${childGen.value}, $w, $h);
        if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r; }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ImageThumbnail =
    copy(child = newChild)
}

/** struct(format, width, height, duration_ms, codec) from the container's
  * metadata tree (ISO BMFF mvhd/tkhd, AVI avih/strh, Matroska Info/Tracks,
  * IVF header, GIF/WebP animation walks) — metadata only, no frame decode.
  * `codec` is the raw container codec identifier (stsd fourcc, strh
  * handler, Matroska CodecID, IVF fourcc) so unsupported-codec videos
  * that yield zero frames are diagnosable in data. */
case class VideoMeta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"video_meta requires a binary argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("codec", StringType, nullable = true)))
  override def prettyName: String = "video_meta"

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.MediaKernels.videoMetaRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaKernels.videoMetaRow($c);")

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

/** array<binary> of up to `maxFrames` evenly-sampled JPEG frames from an
  * MJPEG AVI or a JPEG-sample MP4 — each element is a complete T.81 stream
  * the image tier (image_phash / image_dedup / thumbnails) consumes
  * directly, which is what gives video content signatures. Empty array
  * for non-video or hostile input (never throws). */
case class VideoFrames(child: Expression, maxFrames: Expression)
  extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = maxFrames
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"video_frames requires a binary argument, got ${child.dataType.catalogString}")
    else if (maxFrames.dataType != IntegerType || !maxFrames.foldable)
      TypeCheckResult.TypeCheckFailure("video_frames max must be an int literal")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "video_frames"

  override protected def nullSafeEval(input: Any, max: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.functions.MediaKernels.videoFrames(
        input.asInstanceOf[Array[Byte]], max.asInstanceOf[Int])
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, m) =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.MediaKernels.videoFrames($c, $m));""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VideoFrames =
    copy(child = newLeft, maxFrames = newRight)
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.SketchKernels

/**
 * Mergeable-sketch aggregates as native Catalyst `TypedImperativeAggregate`s
 * — the same execution shape as Spark's own approx_percentile: an opaque JVM
 * buffer per group, partial aggregation on the map side (each input
 * partition collapses to ONE sketch before the shuffle, so a billion-row
 * group ships a few KB), object-hash aggregation, and a serialized binary
 * form that IS the public artifact: write the eval() result to a parquet
 * column today, `*_merge` it with tomorrow's without touching either day's
 * raw rows.
 *
 * Three sketch families (kernels + error contracts in
 * [[graft.functions.SketchKernels]]):
 *   - hll_sketch / hll_merge / hll_estimate — distinct count, ±1.04/sqrt(2^p)
 *   - cms_sketch / cms_merge / cms_query   — frequency upper bound
 *   - qhist_sketch / qhist_merge / qhist_quantile — rank quantiles over
 *     non-negative integers, relative value error < 2^-sub_bits
 *
 * Determinism: merge order never changes results (HLL max / counter adds are
 * associative+commutative), and every estimate is integer arithmetic plus a
 * single final division — which is why the CORRECTNESS gates can reproduce
 * them exactly in DuckDB SQL (splitmix64 re-implemented over HUGEINT).
 *
 * Keys hash via splitmix64 of the 64-bit integer image, or
 * splitmix64(fnv1a64(utf8)) for strings. Null keys are skipped (SQL
 * count-distinct semantics). Malformed sketch BYTES in the merge/read path
 * throw diagnosably — a corrupt sketch column is pipeline corruption, not
 * untrusted crawl input (contrast the doc_text/image kernels, which face the
 * crawl and return null).
 */
object SketchSupport {
  /** Shared key-typing contract for hashing aggregates and cms_query. */
  def keyTypeOk(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType => true
    case _ => false
  }
  def hashKey(v: Any, dt: DataType): Long = dt match {
    case LongType => SketchKernels.hashLong(v.asInstanceOf[Long])
    case IntegerType => SketchKernels.hashLong(v.asInstanceOf[Int].toLong)
    case ShortType => SketchKernels.hashLong(v.asInstanceOf[Short].toLong)
    case ByteType => SketchKernels.hashLong(v.asInstanceOf[Byte].toLong)
    case StringType => SketchKernels.hashString(v.asInstanceOf[UTF8String])
    case other => throw new IllegalStateException(s"unhashable sketch key type $other")
  }
}

// ---------------------------------------------------------------- HyperLogLog

/** hll_sketch(key[, p=12]) -> binary sketch (2 + 2^p bytes). */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"hll_sketch: precision must be in [4,16], got $p")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (SketchSupport.keyTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch requires an integral or string key, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = SketchKernels.hllCreate(p)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) SketchKernels.hllUpdate(buffer, p, SketchSupport.hashKey(v, child.dataType))
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    SketchKernels.hllMerge(buffer, other); buffer
  }

  override def eval(buffer: Array[Byte]): Any = SketchKernels.hllSerialize(buffer, p)
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def withNewMutableAggBufferOffset(off: Int): HllSketchAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllSketchAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = c.head)
}

/** hll_merge(sketch) -> binary: register-wise max of serialized sketches. */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[(Int, Array[Byte])]] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_merge requires binary sketches, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // all-null group -> no sketch to emit
  override def prettyName: String = "hll_merge"

  override def createAggregationBuffer(): Option[(Int, Array[Byte])] = None

  private def absorb(buf: Option[(Int, Array[Byte])], bytes: Array[Byte]): Option[(Int, Array[Byte])] = {
    val (p, regs) = SketchKernels.hllDeserialize(bytes)
    buf match {
      case None => Some((p, regs))
      case Some((p0, acc)) =>
        require(p0 == p, s"hll_merge: mixed precisions in one group (p=$p0 vs p=$p)")
        SketchKernels.hllMerge(acc, regs); buf
    }
  }

  override def update(buffer: Option[(Int, Array[Byte])], input: InternalRow): Option[(Int, Array[Byte])] = {
    val v = child.eval(input)
    if (v == null) buffer else absorb(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Option[(Int, Array[Byte])], other: Option[(Int, Array[Byte])]): Option[(Int, Array[Byte])] =
    other match {
      case None => buffer
      case Some((p, regs)) => absorb(buffer, SketchKernels.hllSerialize(regs, p))
    }

  override def eval(buffer: Option[(Int, Array[Byte])]): Any =
    buffer.map { case (p, regs) => SketchKernels.hllSerialize(regs, p) }.orNull

  override def serialize(buffer: Option[(Int, Array[Byte])]): Array[Byte] =
    buffer.map { case (p, regs) => SketchKernels.hllSerialize(regs, p) }.getOrElse(Array.emptyByteArray)
  override def deserialize(storage: Array[Byte]): Option[(Int, Array[Byte])] =
    if (storage.isEmpty) None else Some(SketchKernels.hllDeserialize(storage))

  override def withNewMutableAggBufferOffset(off: Int): HllMergeAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllMergeAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = c.head)
}

/** hll_estimate(sketch) -> bigint distinct-count estimate.
  *
  * The three sketch READERS (hll_estimate / cms_query / qhist_quantile) are
  * CodegenFallback deliberately: they evaluate once per GROUP (or per probe
  * row), after aggregation has already collapsed the data — interpreted
  * dispatch there is noise, and it keeps the deserialize path in one piece
  * of audited Scala instead of generated Java. The per-ROW hot path (the
  * aggregates' update) is imperative JVM code either way, the same execution
  * shape as Spark's own approx_percentile. */
case class HllEstimate(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_estimate requires a binary sketch, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_estimate"

  override protected def nullSafeEval(input: Any): Any = {
    val (p, regs) = SketchKernels.hllDeserialize(input.asInstanceOf[Array[Byte]])
    SketchKernels.hllEstimate(regs, p)
  }
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

// ----------------------------------------------------------------- Count-Min

/** cms_sketch(key[, depth=4[, width=1024]]) -> binary sketch. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // validate shape eagerly (cmsCreate re-checks)
  SketchKernels.cmsCreate(depth, width)

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (SketchSupport.keyTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch requires an integral or string key, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = SketchKernels.cmsCreate(depth, width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      SketchKernels.cmsUpdate(buffer, depth, width, SketchSupport.hashKey(v, child.dataType), 1L)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    SketchKernels.cmsMerge(buffer, other); buffer
  }

  override def eval(buffer: Array[Long]): Any = SketchKernels.cmsSerialize(buffer, depth, width)
  override def serialize(buffer: Array[Long]): Array[Byte] = SketchKernels.cmsSerialize(buffer, depth, width)
  override def deserialize(storage: Array[Byte]): Array[Long] = SketchKernels.cmsDeserialize(storage)._3

  override def withNewMutableAggBufferOffset(off: Int): CmsSketchAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CmsSketchAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = c.head)
}

/** cms_merge(sketch) -> binary: counter-wise sum of serialized sketches. */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[(Int, Int, Array[Long])]] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_merge requires binary sketches, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_merge"

  override def createAggregationBuffer(): Option[(Int, Int, Array[Long])] = None

  private def absorb(buf: Option[(Int, Int, Array[Long])], bytes: Array[Byte]): Option[(Int, Int, Array[Long])] = {
    val (d, w, counters) = SketchKernels.cmsDeserialize(bytes)
    buf match {
      case None => Some((d, w, counters))
      case Some((d0, w0, acc)) =>
        require(d0 == d && w0 == w, s"cms_merge: mixed shapes in one group (${d0}x$w0 vs ${d}x$w)")
        SketchKernels.cmsMerge(acc, counters); buf
    }
  }

  override def update(buffer: Option[(Int, Int, Array[Long])], input: InternalRow): Option[(Int, Int, Array[Long])] = {
    val v = child.eval(input)
    if (v == null) buffer else absorb(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Option[(Int, Int, Array[Long])], other: Option[(Int, Int, Array[Long])]): Option[(Int, Int, Array[Long])] =
    other match {
      case None => buffer
      case Some((d, w, counters)) => absorb(buffer, SketchKernels.cmsSerialize(counters, d, w))
    }

  override def eval(buffer: Option[(Int, Int, Array[Long])]): Any =
    buffer.map { case (d, w, c) => SketchKernels.cmsSerialize(c, d, w) }.orNull

  override def serialize(buffer: Option[(Int, Int, Array[Long])]): Array[Byte] =
    buffer.map { case (d, w, c) => SketchKernels.cmsSerialize(c, d, w) }.getOrElse(Array.emptyByteArray)
  override def deserialize(storage: Array[Byte]): Option[(Int, Int, Array[Long])] =
    if (storage.isEmpty) None else Some(SketchKernels.cmsDeserialize(storage))

  override def withNewMutableAggBufferOffset(off: Int): CmsMergeAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CmsMergeAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = c.head)
}

/** cms_query(sketch, key) -> bigint upper-bound frequency estimate.
  * CodegenFallback — see the HllEstimate note. */
case class CmsQuery(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_query: first argument must be a binary sketch, got ${left.dataType.catalogString}")
    else if (!SketchSupport.keyTypeOk(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"cms_query: key must be integral or string, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_query"

  override protected def nullSafeEval(sketch: Any, key: Any): Any = {
    val (d, w, counters) = SketchKernels.cmsDeserialize(sketch.asInstanceOf[Array[Byte]])
    SketchKernels.cmsQuery(counters, d, w, SketchSupport.hashKey(key, right.dataType))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsQuery =
    copy(left = l, right = r)
}

/** cms_query against a BROADCAST sketch — the scan-side face. A wide sketch
  * (the heavy-hitter prune uses 2^20 buckets = 32 MB) embedded as a Literal
  * ships inside EVERY task binary (observed: a 96 MB task broadcast per
  * stage); holding a `Broadcast` handle instead ships bytes once per
  * executor and deserializes once per expression instance. Not
  * SQL-registrable (a broadcast is not literal-expressible) — the Column
  * face is `Sketches.heavyHitters`; the literal `cms_query` stays the
  * SQL-facing function for small sketches. */
case class CmsQueryBroadcast(child: Expression,
                             sketch: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  @transient private lazy val parsed = SketchKernels.cmsDeserialize(sketch.value)
  override def checkInputDataTypes(): TypeCheckResult =
    if (SketchSupport.keyTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_query: key must be integral or string, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_query_bc"
  override protected def nullSafeEval(key: Any): Any = {
    val (d, w, counters) = parsed
    SketchKernels.cmsQuery(counters, d, w, SketchSupport.hashKey(key, child.dataType))
  }
  override protected def withNewChildInternal(newChild: Expression): CmsQueryBroadcast =
    copy(child = newChild)
}

// --------------------------------------------------------------- Bloom

/** bloom_sketch(key[, log_bits=20[, k=5]]) -> binary membership filter. */
case class BloomSketchAgg(
    child: Expression,
    logBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  SketchKernels.bloomCreate(logBits) // eager shape validation
  require(k >= 1 && k <= 32, s"bloom_sketch: k must be in [1,32], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (SketchSupport.keyTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_sketch requires an integral or string key, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_sketch"

  override def createAggregationBuffer(): Array[Long] = SketchKernels.bloomCreate(logBits)
  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      SketchKernels.bloomUpdate(buffer, logBits, k, SketchSupport.hashKey(v, child.dataType))
    buffer
  }
  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    SketchKernels.bloomMerge(buffer, other); buffer
  }
  override def eval(buffer: Array[Long]): Any = SketchKernels.bloomSerialize(buffer, logBits, k)
  override def serialize(buffer: Array[Long]): Array[Byte] =
    SketchKernels.bloomSerialize(buffer, logBits, k)
  override def deserialize(storage: Array[Byte]): Array[Long] =
    SketchKernels.bloomDeserialize(storage)._3
  override def withNewMutableAggBufferOffset(off: Int): BloomSketchAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomSketchAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomSketchAgg =
    copy(child = c.head)
}

/** bloom_merge(sketch) -> binary: word-wise OR. */
case class BloomMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[(Int, Int, Array[Long])]] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_merge requires binary sketches, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_merge"

  override def createAggregationBuffer(): Option[(Int, Int, Array[Long])] = None
  private def absorb(buf: Option[(Int, Int, Array[Long])], bytes: Array[Byte]): Option[(Int, Int, Array[Long])] = {
    val (lb, k, words) = SketchKernels.bloomDeserialize(bytes)
    buf match {
      case None => Some((lb, k, words))
      case Some((lb0, k0, acc)) =>
        require(lb0 == lb && k0 == k,
          s"bloom_merge: mixed shapes in one group (2^$lb0/k=$k0 vs 2^$lb/k=$k)")
        SketchKernels.bloomMerge(acc, words); buf
    }
  }
  override def update(buffer: Option[(Int, Int, Array[Long])], input: InternalRow): Option[(Int, Int, Array[Long])] = {
    val v = child.eval(input)
    if (v == null) buffer else absorb(buffer, v.asInstanceOf[Array[Byte]])
  }
  override def merge(buffer: Option[(Int, Int, Array[Long])], other: Option[(Int, Int, Array[Long])]): Option[(Int, Int, Array[Long])] =
    other match {
      case None => buffer
      case Some((lb, k, words)) => absorb(buffer, SketchKernels.bloomSerialize(words, lb, k))
    }
  override def eval(buffer: Option[(Int, Int, Array[Long])]): Any =
    buffer.map { case (lb, k, w) => SketchKernels.bloomSerialize(w, lb, k) }.orNull
  override def serialize(buffer: Option[(Int, Int, Array[Long])]): Array[Byte] =
    buffer.map { case (lb, k, w) => SketchKernels.bloomSerialize(w, lb, k) }.getOrElse(Array.emptyByteArray)
  override def deserialize(storage: Array[Byte]): Option[(Int, Int, Array[Long])] =
    if (storage.isEmpty) None else Some(SketchKernels.bloomDeserialize(storage))
  override def withNewMutableAggBufferOffset(off: Int): BloomMergeAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomMergeAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomMergeAgg =
    copy(child = c.head)
}

/** bloom_contains(sketch, key) -> boolean (true may be a false positive at
  * the filter's design rate; false is certain). CodegenFallback — see the
  * HllEstimate note. */
case class BloomContains(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains: first argument must be a binary sketch, got ${left.dataType.catalogString}")
    else if (!SketchSupport.keyTypeOk(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains: key must be integral or string, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"
  override protected def nullSafeEval(sketch: Any, key: Any): Any = {
    val (lb, k, words) = SketchKernels.bloomDeserialize(sketch.asInstanceOf[Array[Byte]])
    SketchKernels.bloomContains(words, lb, k, SketchSupport.hashKey(key, right.dataType))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContains =
    copy(left = l, right = r)
}

/** bloom_contains against a BROADCAST filter — the scan-side face for wide
  * filters (a seen-list at log_bits=27 is 16 MB; a Literal would ride in
  * every task binary — the CmsQueryBroadcast lesson). Not SQL-registrable;
  * the Column face is `Sketches.bloomFilterRows`. */
case class BloomContainsBroadcast(child: Expression,
                                  sketch: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  @transient private lazy val parsed = SketchKernels.bloomDeserialize(sketch.value)
  override def checkInputDataTypes(): TypeCheckResult =
    if (SketchSupport.keyTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains: key must be integral or string, got ${child.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains_bc"
  override protected def nullSafeEval(key: Any): Any = {
    val (lb, k, words) = parsed
    SketchKernels.bloomContains(words, lb, k, SketchSupport.hashKey(key, child.dataType))
  }
  override protected def withNewChildInternal(newChild: Expression): BloomContainsBroadcast =
    copy(child = newChild)
}

// ----------------------------------------------------------- KMV (theta)

/** Mutable KMV buffer: capacity-k unsigned-sorted prefix. */
final class KmvBuffer(val k: Int) {
  val state = new Array[Long](k)
  var n: Int = 0
}

/** kmv_sketch(key[, k=256]) -> binary k-minimum-values sketch. */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2 && k <= 65535, s"kmv_sketch: k must be in [2,65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (SketchSupport.keyTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires an integral or string key, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)
  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null)
      buffer.n = SketchKernels.kmvInsert(buffer.state, buffer.n, k,
        SketchSupport.hashKey(v, child.dataType))
    buffer
  }
  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < other.n) {
      buffer.n = SketchKernels.kmvInsert(buffer.state, buffer.n, k, other.state(i))
      i += 1
    }
    buffer
  }
  override def eval(buffer: KmvBuffer): Any =
    SketchKernels.kmvSerialize(buffer.state, buffer.n, k)
  override def serialize(buffer: KmvBuffer): Array[Byte] =
    SketchKernels.kmvSerialize(buffer.state, buffer.n, k)
  override def deserialize(storage: Array[Byte]): KmvBuffer = {
    val (k2, n, state) = SketchKernels.kmvDeserialize(storage)
    val buf = new KmvBuffer(k2)
    System.arraycopy(state, 0, buf.state, 0, n)
    buf.n = n
    buf
  }
  override def withNewMutableAggBufferOffset(off: Int): KmvSketchAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvSketchAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = c.head)
}

/** kmv_merge(sketch) -> binary union sketch. */
case class KmvMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[KmvBuffer]] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_merge requires binary sketches, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_merge"

  override def createAggregationBuffer(): Option[KmvBuffer] = None
  private def absorb(buf: Option[KmvBuffer], bytes: Array[Byte]): Option[KmvBuffer] = {
    val (k, n, state) = SketchKernels.kmvDeserialize(bytes)
    buf match {
      case None =>
        val b = new KmvBuffer(k)
        System.arraycopy(state, 0, b.state, 0, n); b.n = n
        Some(b)
      case Some(b) =>
        require(b.k == k, s"kmv_merge: mixed k in one group (${b.k} vs $k)")
        var i = 0
        while (i < n) { b.n = SketchKernels.kmvInsert(b.state, b.n, b.k, state(i)); i += 1 }
        buf
    }
  }
  override def update(buffer: Option[KmvBuffer], input: InternalRow): Option[KmvBuffer] = {
    val v = child.eval(input)
    if (v == null) buffer else absorb(buffer, v.asInstanceOf[Array[Byte]])
  }
  override def merge(buffer: Option[KmvBuffer], other: Option[KmvBuffer]): Option[KmvBuffer] =
    other match {
      case None => buffer
      case Some(b) => absorb(buffer, SketchKernels.kmvSerialize(b.state, b.n, b.k))
    }
  override def eval(buffer: Option[KmvBuffer]): Any =
    buffer.map(b => SketchKernels.kmvSerialize(b.state, b.n, b.k)).orNull
  override def serialize(buffer: Option[KmvBuffer]): Array[Byte] =
    buffer.map(b => SketchKernels.kmvSerialize(b.state, b.n, b.k)).getOrElse(Array.emptyByteArray)
  override def deserialize(storage: Array[Byte]): Option[KmvBuffer] =
    if (storage.isEmpty) None else {
      val (k, n, state) = SketchKernels.kmvDeserialize(storage)
      val b = new KmvBuffer(k)
      System.arraycopy(state, 0, b.state, 0, n); b.n = n
      Some(b)
    }
  override def withNewMutableAggBufferOffset(off: Int): KmvMergeAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvMergeAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = c.head)
}

/** kmv_estimate(sketch) -> bigint distinct estimate (exact below k). */
case class KmvEstimate(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_estimate requires a binary sketch, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_estimate"
  override protected def nullSafeEval(input: Any): Any = {
    val (k, n, state) = SketchKernels.kmvDeserialize(input.asInstanceOf[Array[Byte]])
    SketchKernels.kmvEstimate(state, n, k)
  }
  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

/** kmv_intersect(a, b) -> bigint intersection-cardinality estimate. */
case class KmvIntersect(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_intersect requires two binary sketches, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (ka, na, sa) = SketchKernels.kmvDeserialize(a.asInstanceOf[Array[Byte]])
    val (kb, nb, sb) = SketchKernels.kmvDeserialize(b.asInstanceOf[Array[Byte]])
    require(ka == kb, s"kmv_intersect: mixed k ($ka vs $kb)")
    SketchKernels.kmvIntersect(sa, na, sb, nb, ka)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KmvIntersect =
    copy(left = l, right = r)
}

// ------------------------------------------------- log-histogram quantiles

/** qhist_sketch(value[, sub_bits=5]) -> binary log-scaled histogram over
  * non-negative integers. */
case class LogHistAgg(
    child: Expression,
    subBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  SketchKernels.logHistNumBuckets(subBits) // eager validation

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qhist_sketch requires an integral value (round/scale floats first), got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "qhist_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](SketchKernels.logHistNumBuckets(subBits))

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
        case b: java.lang.Byte => b.longValue()
      }
      SketchKernels.logHistUpdate(buffer, subBits, x)
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    SketchKernels.logHistMerge(buffer, other); buffer
  }

  override def eval(buffer: Array[Long]): Any = SketchKernels.logHistSerialize(buffer, subBits)
  override def serialize(buffer: Array[Long]): Array[Byte] = SketchKernels.logHistSerialize(buffer, subBits)
  override def deserialize(storage: Array[Byte]): Array[Long] = SketchKernels.logHistDeserialize(storage)._2

  override def withNewMutableAggBufferOffset(off: Int): LogHistAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): LogHistAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LogHistAgg =
    copy(child = c.head)
}

/** qhist_merge(sketch) -> binary: bucket-wise sum. */
case class LogHistMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[(Int, Array[Long])]] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qhist_merge requires binary sketches, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "qhist_merge"

  override def createAggregationBuffer(): Option[(Int, Array[Long])] = None

  private def absorb(buf: Option[(Int, Array[Long])], bytes: Array[Byte]): Option[(Int, Array[Long])] = {
    val (s, counts) = SketchKernels.logHistDeserialize(bytes)
    buf match {
      case None => Some((s, counts))
      case Some((s0, acc)) =>
        require(s0 == s, s"qhist_merge: mixed sub_bits in one group ($s0 vs $s)")
        SketchKernels.logHistMerge(acc, counts); buf
    }
  }

  override def update(buffer: Option[(Int, Array[Long])], input: InternalRow): Option[(Int, Array[Long])] = {
    val v = child.eval(input)
    if (v == null) buffer else absorb(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Option[(Int, Array[Long])], other: Option[(Int, Array[Long])]): Option[(Int, Array[Long])] =
    other match {
      case None => buffer
      case Some((s, counts)) => absorb(buffer, SketchKernels.logHistSerialize(counts, s))
    }

  override def eval(buffer: Option[(Int, Array[Long])]): Any =
    buffer.map { case (s, c) => SketchKernels.logHistSerialize(c, s) }.orNull

  override def serialize(buffer: Option[(Int, Array[Long])]): Array[Byte] =
    buffer.map { case (s, c) => SketchKernels.logHistSerialize(c, s) }.getOrElse(Array.emptyByteArray)
  override def deserialize(storage: Array[Byte]): Option[(Int, Array[Long])] =
    if (storage.isEmpty) None else Some(SketchKernels.logHistDeserialize(storage))

  override def withNewMutableAggBufferOffset(off: Int): LogHistMergeAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): LogHistMergeAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LogHistMergeAgg =
    copy(child = c.head)
}

/** qhist_quantile(sketch, q) -> bigint lower bound of the rank-q bucket;
  * null for an empty sketch. CodegenFallback — see the HllEstimate note. */
case class LogHistQuantile(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"qhist_quantile: first argument must be a binary sketch, got ${left.dataType.catalogString}")
    else if (right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"qhist_quantile: fraction must be a double, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "qhist_quantile"

  override protected def nullSafeEval(sketch: Any, q: Any): Any = {
    val (s, counts) = SketchKernels.logHistDeserialize(sketch.asInstanceOf[Array[Byte]])
    val r = SketchKernels.logHistQuantile(counts, s, q.asInstanceOf[Double])
    if (r < 0) null else r
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LogHistQuantile =
    copy(left = l, right = r)
}

// -------------------------------------------------- compression signal

/** compression_ratio(text) -> deflate(level 6) size as ppm of the UTF-8
  * byte length — the Gopher-family compressibility quality signal:
  * boilerplate/template/spam text compresses far below natural prose, and
  * random noise sits near (or above) 10^6. Null/empty -> 10^6 (incompres-
  * sible by convention). Deterministic for a given zlib build (the JVM
  * bundles its own), so results are stable across the cluster; there is
  * no DuckDB-side zlib, so the gate records the driver's rows-only check
  * (the sanctioned path for non-SQL-expressible kernels, like the
  * xxhash64-keyed queries). Not codegen'd: one Deflater per call is the
  * cost, not dispatch. */
case class CompressionRatio(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"compression_ratio requires a string, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "compression_ratio"
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) 1000000L
    else {
      val d = new java.util.zip.Deflater(6, /* nowrap = */ true)
      try {
        d.setInput(bytes); d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        total * 1000000L / bytes.length
      } finally d.end()
    }
  }
  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

// -------------------------------------------------------------- registry

object SketchFunctions {
  private def intLit(e: Expression, name: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name: $arg must be an integer literal, got $other")
  }

  /** Same (name, usage, builder) triple shape as GraftFunctions.all; the two
    * lists are concatenated there so register()/GraftExtensions cover both. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("hll_sketch",
      "_FUNC_(key[, p=12]) - mergeable HyperLogLog sketch (binary) over a group's keys",
      {
        case Seq(k) => HllSketchAgg(k, 12)
        case Seq(k, p) => HllSketchAgg(k, intLit(p, "hll_sketch", "p"))
        case other => throw new IllegalArgumentException(
          s"hll_sketch takes 1-2 arguments, got ${other.size}")
      }),
    ("hll_merge",
      "_FUNC_(sketch) - merge HyperLogLog sketches (register-wise max)",
      {
        case Seq(s) => HllMergeAgg(s)
        case other => throw new IllegalArgumentException(
          s"hll_merge takes 1 argument, got ${other.size}")
      }),
    ("hll_estimate",
      "_FUNC_(sketch) - distinct-count estimate from a HyperLogLog sketch",
      {
        case Seq(s) => HllEstimate(s)
        case other => throw new IllegalArgumentException(
          s"hll_estimate takes 1 argument, got ${other.size}")
      }),
    ("cms_sketch",
      "_FUNC_(key[, depth=4[, width=1024]]) - mergeable Count-Min sketch (binary)",
      {
        case Seq(k) => CmsSketchAgg(k, 4, 1024)
        case Seq(k, d) => CmsSketchAgg(k, intLit(d, "cms_sketch", "depth"), 1024)
        case Seq(k, d, w) => CmsSketchAgg(k, intLit(d, "cms_sketch", "depth"),
          intLit(w, "cms_sketch", "width"))
        case other => throw new IllegalArgumentException(
          s"cms_sketch takes 1-3 arguments, got ${other.size}")
      }),
    ("cms_merge",
      "_FUNC_(sketch) - merge Count-Min sketches (counter-wise sum)",
      {
        case Seq(s) => CmsMergeAgg(s)
        case other => throw new IllegalArgumentException(
          s"cms_merge takes 1 argument, got ${other.size}")
      }),
    ("cms_query",
      "_FUNC_(sketch, key) - frequency upper-bound estimate for one key",
      {
        case Seq(s, k) => CmsQuery(s, k)
        case other => throw new IllegalArgumentException(
          s"cms_query takes 2 arguments, got ${other.size}")
      }),
    ("qhist_sketch",
      "_FUNC_(value[, sub_bits=5]) - mergeable log-scaled quantile histogram (binary) over non-negative integers",
      {
        case Seq(v) => LogHistAgg(v, 5)
        case Seq(v, s) => LogHistAgg(v, intLit(s, "qhist_sketch", "sub_bits"))
        case other => throw new IllegalArgumentException(
          s"qhist_sketch takes 1-2 arguments, got ${other.size}")
      }),
    ("qhist_merge",
      "_FUNC_(sketch) - merge quantile histograms (bucket-wise sum)",
      {
        case Seq(s) => LogHistMergeAgg(s)
        case other => throw new IllegalArgumentException(
          s"qhist_merge takes 1 argument, got ${other.size}")
      }),
    ("qhist_quantile",
      "_FUNC_(sketch, q) - lower bound of the rank-q bucket (relative error < 2^-sub_bits)",
      {
        case Seq(s, q) => LogHistQuantile(s, q)
        case other => throw new IllegalArgumentException(
          s"qhist_quantile takes 2 arguments, got ${other.size}")
      }),
    ("bloom_sketch",
      "_FUNC_(key[, log_bits=20[, k=5]]) - mergeable Bloom membership filter (binary)",
      {
        case Seq(key) => BloomSketchAgg(key, 20, 5)
        case Seq(key, lb) => BloomSketchAgg(key, intLit(lb, "bloom_sketch", "log_bits"), 5)
        case Seq(key, lb, k) => BloomSketchAgg(key, intLit(lb, "bloom_sketch", "log_bits"),
          intLit(k, "bloom_sketch", "k"))
        case other => throw new IllegalArgumentException(
          s"bloom_sketch takes 1-3 arguments, got ${other.size}")
      }),
    ("bloom_merge",
      "_FUNC_(sketch) - merge Bloom filters (word-wise OR)",
      {
        case Seq(s) => BloomMergeAgg(s)
        case other => throw new IllegalArgumentException(
          s"bloom_merge takes 1 argument, got ${other.size}")
      }),
    ("bloom_contains",
      "_FUNC_(sketch, key) - membership probe (false is certain; true may be a false positive)",
      {
        case Seq(s, key) => BloomContains(s, key)
        case other => throw new IllegalArgumentException(
          s"bloom_contains takes 2 arguments, got ${other.size}")
      }),
    ("kmv_sketch",
      "_FUNC_(key[, k=256]) - mergeable k-minimum-values (theta) sketch (binary)",
      {
        case Seq(key) => KmvSketchAgg(key, 256)
        case Seq(key, k) => KmvSketchAgg(key, intLit(k, "kmv_sketch", "k"))
        case other => throw new IllegalArgumentException(
          s"kmv_sketch takes 1-2 arguments, got ${other.size}")
      }),
    ("kmv_merge",
      "_FUNC_(sketch) - union of KMV sketches (merge + keep the k smallest)",
      {
        case Seq(s) => KmvMergeAgg(s)
        case other => throw new IllegalArgumentException(
          s"kmv_merge takes 1 argument, got ${other.size}")
      }),
    ("kmv_estimate",
      "_FUNC_(sketch) - distinct-count estimate (exact below k)",
      {
        case Seq(s) => KmvEstimate(s)
        case other => throw new IllegalArgumentException(
          s"kmv_estimate takes 1 argument, got ${other.size}")
      }),
    ("kmv_intersect",
      "_FUNC_(a, b) - intersection-cardinality estimate of two same-k sketches",
      {
        case Seq(a, b) => KmvIntersect(a, b)
        case other => throw new IllegalArgumentException(
          s"kmv_intersect takes 2 arguments, got ${other.size}")
      }),
    ("compression_ratio",
      "_FUNC_(text) - deflate size as ppm of the raw UTF-8 length (compressibility quality signal)",
      {
        case Seq(t) => CompressionRatio(t)
        case other => throw new IllegalArgumentException(
          s"compression_ratio takes 1 argument, got ${other.size}")
      }))
}

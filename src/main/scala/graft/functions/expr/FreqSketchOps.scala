package graft.functions.expr

import org.apache.datasketches.frequencies.LongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Frequent-items ("heavy hitters") sketches (the Misra-Gries /
  * space-saving family as implemented by DataSketches LongsSketch) as
  * Catalyst aggregates — the FREQUENCY member of the mergeable-summaries
  * trio ([[KllSketchOps]] covers quantiles, Spark's native
  * hll_sketch_agg covers distinct counts; q50/q52/q53 gate all three).
  *
  * The guarantee is DETERMINISTIC, not probabilistic: for any item,
  * lowerBound <= trueCount <= upperBound always holds, with
  * upperBound - lowerBound <= ~3.5·n/maxMapSize — so a persisted
  * per-partition sketch table answers "top talkers over any day range,
  * with certified count brackets" by merging KB-sized sketches, no raw
  * rescan. At 100 TB the raw groupBy(user) for one ad-hoc range is a
  * full shuffle of the range; the rollup is O(days × KB).
  */
object FreqSketchOps {
  def fromBytes(b: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(b))
}

/** graft_freq_agg(x, maxMapSize) -> binary: frequency sketch of LONG
  * items. maxMapSize must be a power of two (library contract).
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 512,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] {

  override def prettyName: String = "graft_freq_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT input, got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongsSketch, other: LongsSketch): LongsSketch =
    buf.merge(other)

  override def eval(buf: LongsSketch): Any = buf.toByteArray
  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    FreqSketchOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** graft_freq_merge(sketch_blob, maxMapSize) -> binary: union of
  * persisted frequency sketches.
  */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int = 512,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] {

  override def prettyName: String = "graft_freq_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BINARY sketch input, got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(FreqSketchOps.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: LongsSketch, other: LongsSketch): LongsSketch =
    buf.merge(other)

  override def eval(buf: LongsSketch): Any = buf.toByteArray
  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    FreqSketchOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** graft_freq_bounds(sketch_blob, item) -> struct(estimate, lb, ub):
  * certified count bracket for one item (lb <= true <= ub always).
  */
case class FreqBounds(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "graft_freq_bounds"
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY, BIGINT), got (${l.simpleString(10)}, ${r.simpleString(10)})")
  }
  override def nullSafeEval(blob: Any, item: Any): Any = {
    val sk = FreqSketchOps.fromBytes(blob.asInstanceOf[Array[Byte]])
    val it = item.asInstanceOf[Long]
    InternalRow(sk.getEstimate(it), sk.getLowerBound(it), sk.getUpperBound(it))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** graft_freq_n(sketch_blob) -> long: exact stream length (tracked
  * exactly through merges — the rollup integrity check).
  */
case class FreqStreamLength(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_freq_n"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BINARY sketch input, got ${other.simpleString(10)}")
  }
  override def nullSafeEval(blob: Any): Any =
    FreqSketchOps.fromBytes(blob.asInstanceOf[Array[Byte]]).getStreamLength
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column-API entry points. */
object FreqFunctions {
  private def agg(e: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction): Column =
    ColumnBridge.column(e.toAggregateExpression())

  def freqAgg(x: Column, maxMapSize: Int = 512): Column =
    agg(FreqSketchAgg(ColumnBridge.expression(x), maxMapSize))

  def freqMerge(sketch: Column, maxMapSize: Int = 512): Column =
    agg(FreqMergeAgg(ColumnBridge.expression(sketch), maxMapSize))

  def freqBounds(sketch: Column, item: Column): Column =
    ColumnBridge.column(FreqBounds(
      ColumnBridge.expression(sketch), ColumnBridge.expression(item)))

  def freqN(sketch: Column): Column =
    ColumnBridge.column(FreqStreamLength(ColumnBridge.expression(sketch)))
}

package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable KLL quantile sketches (Karnin, Lang & Liberty, FOCS 2016)
  * as native Catalyst aggregates — the quantile member of the sketch
  * trio next to the HLL (distinct) and CMS (frequency) surfaces already
  * in [[graft.operators.Sketches]] / [[graft.streaming.CmsStream]].
  *
  * Spark ships DataSketches HLL aggregates (hll_sketch_agg) but no KLL,
  * so this is the engine's own [[TypedImperativeAggregate]] pair — the
  * same execution contract Spark's HllSketchAgg uses: the LIVE sketch
  * object rides the aggregation buffer between rows (update is
  * object-to-object, no per-row serialize), and serialization happens
  * only at partial-result shuffle boundaries. A Scala `Aggregator` with
  * a binary buffer would instead heapify/serialize per input row.
  *
  * [[KllBuildAgg]] builds a sketch from a double column;
  * [[KllMergeAgg]] unions already-serialized sketches (the read path
  * over a persisted per-partition sketch table — cost ∝ sketches, never
  * rows, same as hll_union_agg). Both emit the standard DataSketches
  * wire bytes, readable by any DataSketches binding.
  *
  * Note on determinism: KLL compaction draws a random offset, so sketch
  * BYTES differ run to run while rank error stays within the published
  * bound (~1.65% at k=200, 99% confidence). Oracle design follows the
  * HLL pattern: Verify exports the estimates once, and both engines
  * compute exact ranks of those exported values — the gate tolerates
  * the sketch error, the hash-compare never sees unstable bytes.
  */
case class KllBuildAgg(
    child: Expression,
    k: Int = KllBuildAgg.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_agg expects a double column, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllBuildAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllBuildAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllBuildAgg =
    copy(child = newChild)
}

/** Union of serialized KLL sketches — the merge half of the mergeable-
  * sketch contract (read path over a persisted sketch table). */
case class KllMergeAgg(
    child: Expression,
    k: Int = KllBuildAgg.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_union_agg expects serialized sketch bytes, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_union_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

object KllBuildAgg {
  /** DataSketches default: ~1.65% normalized rank error at 99%. */
  val DefaultK = 200

  /** Column DSL: build a KLL sketch over a double column. */
  def kllAgg(c: Column, k: Int = DefaultK): Column =
    Bridge.column(KllBuildAgg(Bridge.expression(c), k).toAggregateExpression())

  /** Column DSL: union serialized sketches. */
  def kllUnionAgg(c: Column, k: Int = DefaultK): Column =
    Bridge.column(KllMergeAgg(Bridge.expression(c), k).toAggregateExpression())

  /** Read-side quantile estimate from sketch bytes. A plain scalar UDF
    * is the honest choice here: it runs over SKETCH-TABLE rows (types ×
    * days, kilobytes each), never over event rows — the codegen'd hot
    * path is the aggregate above. */
  val kllQuantile: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((bytes: Array[Byte], q: Double) =>
      KllDoublesSketch.heapify(Memory.wrap(bytes)).getQuantile(q,
        org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE))
}

package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Mergeable Theta sketches (the Apache DataSketches KMV-style theta
  * family) as native Catalyst aggregates — the SET-OPERATION member of
  * the sketch surface next to HLL (distinct counts), KLL (quantiles) and
  * CMS (frequencies). HLL answers |A|; theta additionally answers
  * |A ∩ B|, |A ∪ B| and |A \ B| from the sketches alone — the
  * cross-segment overlap questions (shared audience, cross-source
  * near-identical content, eval-contamination mass) that otherwise need
  * a re-scan per pair.
  *
  * Same execution contract as [[KllBuildAgg]]: the live Union gadget
  * rides the aggregation buffer (update is object-to-object),
  * serialization only at partial-result boundaries, and the emitted
  * bytes are the standard DataSketches compact-ordered wire format any
  * binding reads.
  *
  * Determinism note (oracle design): below k retained entries a theta
  * sketch is in EXACT mode — the estimate equals the true distinct count
  * and is insertion-order-independent. Past k, the retained set depends
  * on purge history, so estimates are order-sensitive within the
  * published error. The export-gate oracle (the HLL/KLL pattern) never
  * hash-compares sketch bytes; SketchSpec pins exact-mode equality, the
  * sampling-mode error bound, the merge law and set-op correctness.
  */
case class ThetaBuildAgg(
    child: Expression,
    lgK: Int = ThetaBuildAgg.DefaultLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_theta_agg expects a long column, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaBuildAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaBuildAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaBuildAgg =
    copy(child = newChild)
}

/** Union of serialized theta sketches — the read path over a persisted
  * per-partition sketch table (cost ∝ sketches, never rows). */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = ThetaBuildAgg.DefaultLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_theta_union_agg expects serialized sketch bytes, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_union_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

object ThetaBuildAgg {
  /** lgK = 12 → 4096 nominal entries, RSE 1/√4096 ≈ 1.56% in sampling
    * mode; exact below 4096 retained. Matches the HLL surface's lgK. */
  val DefaultLgK = 12

  /** Column DSL: build a theta sketch over a long column. */
  def thetaAgg(c: Column, lgK: Int = DefaultLgK): Column =
    Bridge.column(ThetaBuildAgg(Bridge.expression(c), lgK).toAggregateExpression())

  /** Column DSL: union serialized theta sketches. */
  def thetaUnionAgg(c: Column, lgK: Int = DefaultLgK): Column =
    Bridge.column(ThetaUnionAgg(Bridge.expression(c), lgK).toAggregateExpression())

  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.sql.functions.udf

  private def wrap(b: Array[Byte]) = Sketches.wrapSketch(Memory.wrap(b))

  /** Read-side scalar ops: plain UDFs over SKETCH-TABLE rows (segment
    * pairs × kilobytes — the codegen'd hot path is the aggregate). */
  val thetaEstimate: UserDefinedFunction =
    udf((b: Array[Byte]) => wrap(b).getEstimate)

  val thetaIntersectEstimate: UserDefinedFunction = udf { (a: Array[Byte], b: Array[Byte]) =>
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.getEstimate
  }

  val thetaUnionEstimate: UserDefinedFunction = udf { (a: Array[Byte], b: Array[Byte]) =>
    val u = SetOperation.builder().buildUnion()
    u.union(wrap(a)); u.union(wrap(b))
    u.getResult.getEstimate
  }

  /** |A \ B| estimate. */
  val thetaDiffEstimate: UserDefinedFunction = udf { (a: Array[Byte], b: Array[Byte]) =>
    SetOperation.builder().buildANotB().aNotB(wrap(a), wrap(b)).getEstimate
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash bit-vote aggregation as a native Catalyst aggregate: input is
  * the per-token md5 hex string, the buffer is one int counter per
  * fingerprint bit, eval emits the sign bitstring.
  *
  * Replaces the explode(sequence(1, nBits)) → groupBy(doc_id, j) →
  * collect_list/array_sort assembly pipeline (r9 optimization round):
  * that shape materializes tokens × nBits rows (32 M at sf0.1, ∝ corpus
  * tokens × 64 at scale) through a hash aggregate keyed by (doc, bit),
  * then a second aggregate to reassemble the bits — pure §2.3
  * "aggregate before you shuffle" waste, since the whole per-token
  * contribution is derivable from the md5 string in-place. Here update
  * is an nBits-int loop per TOKEN row (64× fewer aggregate inputs), the
  * partial buffer is nBits ints per (doc, partition), and the merge is
  * element-wise addition — commutative/associative integer sums, so the
  * emitted bitstring is bit-identical to the exploded form (the DuckDB
  * oracles for dd_simhash/dd_simhash64 and both pair queries are
  * unchanged and stay green).
  *
  * `basis` picks the published bit rule:
  *  - [[SimhashAgg.HighBit32]] (32 bits): bit j votes +1 iff hex digit j
  *    of the md5 has its HIGH nibble bit set (digit ∈ 89abcdef) — the
  *    [[graft.operators.Dedup.simhash]] basis;
  *  - [[SimhashAgg.Nibble64]] (64 bits): bit j votes +1 iff bit (j mod 4)
  *    of nibble (j div 4) is set — the 64-bit production basis of
  *    [[graft.operators.Dedup.simhash64]].
  */
case class SimhashAgg(
    child: Expression,
    basis: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with UnaryLike[Expression] {

  private val nBits = basis // both bases use their bit count as the tag

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_simhash_agg expects an md5 hex string column, got ${child.dataType}")
    else if (basis != SimhashAgg.HighBit32 && basis != SimhashAgg.Nibble64)
      TypeCheckResult.TypeCheckFailure(s"unknown simhash basis $basis (32 or 64)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](nBits)

  @inline private def hexVal(c: Byte): Int =
    if (c >= '0' && c <= '9') c - '0' else c - 'a' + 10

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      // ASCII hex — getBytes is the raw utf8 buffer copy
      val h = v.asInstanceOf[UTF8String].getBytes
      if (basis == SimhashAgg.HighBit32) {
        var j = 0
        while (j < 32) {
          buffer(j) += (if (hexVal(h(j)) >= 8) 1 else -1)
          j += 1
        }
      } else {
        var j = 0
        while (j < 64) {
          buffer(j) += (if (((hexVal(h(j >> 2)) >> (j & 3)) & 1) == 1) 1 else -1)
          j += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < nBits) { buffer(j) += other(j); j += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    val out = new Array[Byte](nBits)
    var j = 0
    while (j < nBits) { out(j) = if (buffer(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(out)
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * nBits)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(nBits)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(n: Int): SimhashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SimhashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): SimhashAgg =
    copy(child = newChild)
}

object SimhashAgg {
  val HighBit32 = 32
  val Nibble64 = 64

  /** Column aggregate: sign bitstring of the per-bit ±1 votes over the
    * group's md5 hex strings. */
  def simhashBits(h: Column, basis: Int): Column =
    Bridge.column(SimhashAgg(Bridge.expression(h), basis).toAggregateExpression())
}

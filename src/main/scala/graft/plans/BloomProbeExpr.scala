package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst probe for a broadcast [[BloomFilter]] — the codegen
  * replacement for the `udf((k: Long) => bc.value.mightContain(k))`
  * pattern on the bloom-prefilter hot paths (q33's wedge prune,
  * JoinOpt's orders prune, Decontam's gram gate).
  *
  * Why not the UDF: a ScalaUDF probe boxes every input (Long → java.lang
  * .Long), pays a function dispatch per row, and re-resolves the
  * broadcast value through the UDF closure — measurable on streams that
  * exist only to be filtered (the q33 wedge stream is 41 M rows at sf0.1,
  * 4.1 B at 100×; the probe is the only work those rows see before the
  * prune). The expression keeps the broadcast handle (so the sketch still
  * ships via TorrentBroadcast once per executor, never in task binaries)
  * and `doGenCode` emits a direct primitive `mightContainLong` call with
  * the deserialized filter cached in a codegen member variable.
  *
  * Results are identical to the UDF by construction (same sketch, same
  * probe method); `prettyName` is caller-supplied so plan-audit markers
  * (GraphOpsSpec's `might_close` exchange assertion) keep matching.
  */
case class BloomProbeExpr(child: Expression, bloom: Broadcast[BloomFilter],
    probeName: String) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = probeName

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$probeName expects bigint or string input, got $t")
  }

  @transient private lazy val bf: BloomFilter = bloom.value

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => bf.mightContainLong(v.asInstanceOf[Long])
    // the sketch lib hashes a String's UTF-8 bytes (mightContainString =
    // mightContainBinary(utf8 bytes)), so probing UTF8String.getBytes is
    // bit-identical to the UDF's mightContainString on the JVM string
    case StringType => bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloom,
      classOf[Broadcast[_]].getName)
    val filterCls = classOf[BloomFilter].getName
    val filterVar = ctx.addMutableState(filterCls, "graftBloomFilter")
    val probe = child.dataType match {
      case LongType => (c: String) => s"$filterVar.mightContainLong($c)"
      case StringType => (c: String) => s"$filterVar.mightContainBinary($c.getBytes())"
      case t => throw new IllegalStateException(s"unsupported probe type $t")
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($filterVar == null) { $filterVar = ($filterCls) $bcRef.value(); }
         |${ev.value} = ${probe(c)};
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomProbeExpr {
  /** Column-API probe over a broadcast bloom filter. */
  def probe(bloom: Broadcast[BloomFilter], c: Column, name: String): Column =
    Bridge.column(BloomProbeExpr(Bridge.expression(c), bloom, name))
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass weighted-statistics typed Aggregator (SURVEY.md §7.3: the
  * custom `Aggregator[IN,BUF,OUT]` surface; §2.D calculus 1 in one pass).
  *
  * Computes weighted mean, population weighted std, min, max and range of
  * (value, weight) pairs in one partial+final aggregation — the merge is
  * associative/commutative, so Spark runs it map-side first like any
  * built-in. Registered for the Column API via `udaf(...)`; equivalent to
  * the five-expression form used in CompositionFeaturizer but as ONE
  * buffer, useful when many stats families would otherwise multiply the
  * aggregate count.
  */
object WeightedStats {

  final case class In(x: Double, w: Double)
  final case class Buf(wSum: Double, wxSum: Double, wx2Sum: Double, min: Double, max: Double)
  final case class Out(mean: Double, std: Double, min: Double, max: Double, range: Double)

  val aggregator: Aggregator[In, Buf, Out] = new Aggregator[In, Buf, Out] {
    def zero: Buf = Buf(0.0, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)

    def reduce(b: Buf, a: In): Buf = Buf(
      b.wSum + a.w, b.wxSum + a.w * a.x, b.wx2Sum + a.w * a.x * a.x,
      math.min(b.min, a.x), math.max(b.max, a.x))

    def merge(b1: Buf, b2: Buf): Buf = Buf(
      b1.wSum + b2.wSum, b1.wxSum + b2.wxSum, b1.wx2Sum + b2.wx2Sum,
      math.min(b1.min, b2.min), math.max(b1.max, b2.max))

    def finish(b: Buf): Out = {
      if (b.wSum <= 0) Out(Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
      else {
        val mean = b.wxSum / b.wSum
        val variance = math.max(0.0, b.wx2Sum / b.wSum - mean * mean)
        Out(mean, math.sqrt(variance), b.min, b.max, b.max - b.min)
      }
    }

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** Column form: weightedStats(x, w) → struct(mean,std,min,max,range).
    * (udaf() flattens the In case class to its two double fields.) */
  val weightedStats = udaf(aggregator)

  def apply(x: Column, w: Column): Column = weightedStats(x, w)
}

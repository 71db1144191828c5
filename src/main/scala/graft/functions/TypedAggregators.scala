package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY §2: custom
  * aggregation logic goes through Aggregators before any
  * TypedImperativeAggregate) — the pattern reference users would
  * extend for domain aggregates. Registered per-session via
  * `udaf(...)` at call sites. */
object TypedAggregators {

  /** Weighted mean: Σwx / Σw with null/zero-weight safety. The
    * buffer is a flat case class so Tungsten encodes it without
    * object overhead; merge is associative+commutative (partial
    * aggregation safe). */
  final case class WSum(wx: Double, w: Double)
  final class WeightedAvg extends Aggregator[(Double, Double), WSum, Double] {
    def zero: WSum = WSum(0.0, 0.0)
    def reduce(b: WSum, in: (Double, Double)): WSum =
      WSum(b.wx + in._1 * in._2, b.w + in._2)
    def merge(a: WSum, b: WSum): WSum = WSum(a.wx + b.wx, a.w + b.w)
    def finish(b: WSum): Double = if (b.w == 0.0) Double.NaN else b.wx / b.w
    def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}

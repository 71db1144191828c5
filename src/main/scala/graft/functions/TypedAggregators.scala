package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY §2: custom
  * aggregation logic goes through Aggregators before any
  * TypedImperativeAggregate) — the pattern reference users would
  * extend for domain aggregates. Registered per-session via
  * `udaf(...)` at call sites. */
object TypedAggregators {

  /** One (score, id) candidate; ordering = score desc, id asc —
    * identical to `row_number() OVER (ORDER BY score DESC, id)`. */
  final case class Neighbor(s: Double, id: Long)
  final case class TopKBuf(items: Seq[Neighbor])

  /** Bounded top-k of (score, id): the merge-able replacement for a
    * per-group `row_number` window whose partitions carry the full
    * corpus. Each map partition keeps ≤ k entries per group (partial
    * aggregation), the shuffle moves k-sized buffers instead of every
    * candidate row, and the final merge is O(k). Buffer kept sorted
    * (score desc, id asc); k is small (top-10-style), so the O(k)
    * insert beats heap bookkeeping. */
  final class TopK(k: Int)
      extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {
    // java.lang.Double.compare, not primitive >: NaN ranks greatest
    // and equal to itself, matching Spark's `orderBy(col.desc)`
    // (which puts NaN first) so the aggregator really is a drop-in
    // for the row_number window it replaces
    private def lt(a: Neighbor, b: Neighbor): Boolean = {
      val c = java.lang.Double.compare(a.s, b.s)
      c > 0 || (c == 0 && a.id < b.id)
    }
    def zero: TopKBuf = TopKBuf(Vector.empty)
    def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf = {
      val n = Neighbor(in._1, in._2)
      if (b.items.size >= k && !lt(n, b.items.last)) b
      else {
        val (before, after) = b.items.span(lt(_, n))
        TopKBuf(((before :+ n) ++ after).take(k))
      }
    }
    def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      val merged = (a.items ++ b.items).sortWith(lt)
      TopKBuf(merged.take(k))
    }
    def finish(b: TopKBuf): TopKBuf = b
    def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

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

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.4 A5 / §2.11 — user-defined aggregate (CQL `CREATE AGGREGATE …
  * SFUNC … FINALFUNC`, upstream `cql3/functions/UDAggregate.java` [U]) as a
  * typed Spark `Aggregator`, registered via `functions.udaf`.
  *
  * Quantity-weighted price sum-pair: the buffer keeps exact decimal sums
  * (micro-unit longs) so merge order (shuffle nondeterminism) cannot change
  * the result — the same reason the declared queries use decimal(38,6).
  * The final ratio is taken OUTSIDE the aggregate in double, matching the
  * oracle's `cast(sum AS double)/cast(sum AS double)`.
  */
case class WSums(var wx6: Long, var w6: Long) // micro-scaled exact sums

class WeightedSumAggregator extends Aggregator[(Double, Double), WSums, WSums] {
  private def micro(x: Double): Long =
    // decimal(38,6) HALF_UP on the shortest-decimal repr, NOT
    // math.round(x*1e6): binary floor+0.5 drifts on .xxxxx5 boundary
    // doubles and negative halves — the exact pitfall QuantizeInt8.rnd
    // documents, and the oracle casts to decimal(38,6)
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue.longValue
  def zero: WSums = WSums(0L, 0L)
  def reduce(b: WSums, a: (Double, Double)): WSums = {
    // price*qty in double first (IEEE, matches the SQL twin), then micro-fix
    b.wx6 += micro(a._1 * a._2); b.w6 += micro(a._2); b
  }
  def merge(b1: WSums, b2: WSums): WSums =
    WSums(b1.wx6 + b2.wx6, b1.w6 + b2.w6)
  def finish(r: WSums): WSums = r
  def bufferEncoder: Encoder[WSums] = Encoders.product[WSums]
  def outputEncoder: Encoder[WSums] = Encoders.product[WSums]
}

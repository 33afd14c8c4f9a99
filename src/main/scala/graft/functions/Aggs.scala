package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Welford/Chan moment state: mergeable across partitions. */
case class MomentState(n: Long, mean: Double, m2: Double)

/** Sample variance as a typed [[Aggregator]] — the template for custom
  * aggregates in this engine (SURVEY §2B note: user extensions ride
  * `udf()`/`Aggregator`). The state is associative-mergeable (Chan's
  * pairwise update of Welford moments), so Catalyst executes it exactly
  * like a built-in: map-side partial aggregation, one shuffle of
  * fixed-size states, final merge — never a per-group value list.
  * Numerically stable where the naive Σx²−(Σx)²/n cancels.
  */
object VarianceAgg extends Aggregator[Double, MomentState, Double] {
  override def zero: MomentState = MomentState(0L, 0.0, 0.0)

  override def reduce(s: MomentState, x: Double): MomentState = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    MomentState(n, mean, s.m2 + d * (x - mean))
  }

  override def merge(a: MomentState, b: MomentState): MomentState =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      MomentState(n, a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n.toDouble * b.n.toDouble / n)
    }

  override def finish(s: MomentState): Double =
    if (s.n > 1) s.m2 / (s.n - 1) else Double.NaN

  override def bufferEncoder: Encoder[MomentState] = Encoders.product[MomentState]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (SURVEY.md §2B E19): weighted mean via
  * `Aggregator[IN, BUF, OUT]`. Partial aggregation comes for free —
  * `reduce` runs map-side per partition, `merge` combines partials at
  * the exchange, exactly like a built-in DeclarativeAggregate.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** column form: weighted_mean(value, weight) */
  def column(value: Column, weight: Column): Column =
    udaf(WeightedMean).apply(value, weight)
}

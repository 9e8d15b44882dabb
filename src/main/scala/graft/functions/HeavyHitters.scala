package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch as a typed [[Aggregator]] — the
  * classic bounded-memory heavy-hitters algorithm (Misra & Gries '82;
  * merge rule per Agarwal et al., "Mergeable Summaries", PODS'12 —
  * public literature, PAPERS.md).
  *
  * State is a bounded map of at most `capacity` counters. Guarantees
  * (standard Misra-Gries bounds, preserved under the merge rule):
  *   - estimate(x) ≤ true(x)              (underestimates only)
  *   - true(x) − estimate(x) ≤ n/(capacity+1)
  *   - every x with true(x) > n/(capacity+1) IS in the sketch
  * so with capacity ≫ 1/θ the true heavy hitters above frequency θ·n
  * are always present. Mergeable: counter-wise sum, then prune back to
  * capacity by subtracting the (capacity+1)-th largest weight — which
  * is what lets Spark run it map-side partial + final, the same
  * two-phase shuffle profile as a built-in agg.
  *
  * Scale: the 100 TB answer to "top terms per group" when an exact
  * q75-style aggregation would shuffle the whole vocabulary — the
  * sketch shuffles `capacity` counters per partition instead.
  */
object HeavyHitters {

  final class MisraGries(val capacity: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Map[String, Long] = Map.empty

    /** prune to `capacity` counters: subtract the (capacity+1)-th
      * largest weight from the kept counters and drop the rest — the
      * Misra-Gries decrement step in batch form. Kept counters lose at
      * most `cut` each (stays an underestimate); dropped ones had
      * weight ≤ cut, absorbed by the error bound. Subtract-then-
      * filter(>0) drops every counter AT the cut, so the result does
      * not depend on which equal-weight counter the sort put at the
      * boundary.
      */
    private def prune(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= capacity) m
      else {
        val sorted = m.toSeq.sortBy { case (k, v) => (-v, k) }
        val cut = sorted(capacity)._2
        sorted.iterator.take(capacity)
          .map { case (k, v) => k -> (v - cut) }
          .filter(_._2 > 0)
          .toMap
      }

    override def reduce(b: Map[String, Long], a: String): Map[String, Long] = {
      // skip nulls like built-in aggregates do — a null map key would
      // crash the buffer encoder deep in serialization otherwise
      if (a == null) return b
      val m = b.updated(a, b.getOrElse(a, 0L) + 1L)
      if (m.size <= capacity) m
      else {
        // overflow in reduce is always exactly capacity+1 counters, so
        // the (capacity+1)-th largest IS the minimum — one O(capacity)
        // min scan instead of prune()'s full sort on every unseen item
        // of a high-cardinality stream
        val cut = m.valuesIterator.min
        m.iterator.map { case (k, v) => k -> (v - cut) }
          .filter(_._2 > 0).toMap
      }
    }

    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val m = mutable.Map.empty[String, Long] ++ x
      y.foreach { case (k, v) => m.update(k, m.getOrElse(k, 0L) + v) }
      prune(m.toMap)
    }

    /** deterministic output order: estimate desc, then item asc */
    override def finish(r: Map[String, Long]): Seq[(String, Long)] =
      r.toSeq.sortBy { case (k, v) => (-v, k) }

    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
  }

  /** column form, usable in agg(): heavy hitters of a string column */
  def column(c: Column, capacity: Int): Column =
    udaf(new MisraGries(capacity), Encoders.STRING).apply(c)
}

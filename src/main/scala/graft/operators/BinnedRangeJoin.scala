package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed interval join: point.ts ∈ [interval.lo, interval.hi]
  * (exact bounds live in the caller's residual predicate).
  *
  * Why: Spark plans a pure range predicate as a hash/SMJ join only when
  * an equi key exists, with the range as a residual FILTER — so one hot
  * equi key (or none) degenerates to huge per-key fan-out (or a
  * broadcast nested loop). Bucketing time into fixed bins adds a
  * synthetic equi column on BOTH sides: the point side lands in exactly
  * one bin, the interval side replicates into each bin it overlaps
  * (⌈len/bin⌉+1 rows, bounded when intervals are bounded), and the join
  * becomes a plain shuffled equi-join on (keys…, __bin) whose per-group
  * size is bounded by bin width — the standard range-join binning
  * technique in distributed SQL engines (see PAPERS.md).
  *
  * Correctness: each (point, interval) pair meets in at most ONE bin —
  * the point's — so no dedup pass is needed; the residual predicate
  * then enforces the exact bounds.
  *
  * Pick `binMicros` ≈ the typical interval length: smaller bins shrink
  * join groups but replicate intervals more; larger bins the reverse.
  */
object BinnedRangeJoin {

  private def checkInputs(a: DataFrame, b: DataFrame, binMicros: Long): Unit = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    require(!(a.columns ++ b.columns).exists(Set("__bin", "__lo_bin")),
      "__bin/__lo_bin are reserved by BinnedRangeJoin")
  }

  /** @param points     point side; its `pointTs` timestamp is binned
    * @param intervals  interval side; replicated across overlapped bins
    * @param equi       (pointCol, intervalCol) equi-key pairs (may be empty;
    *                   column names must be distinct across the two sides)
    * @param residual   the exact range predicate (e.g. ts2 > ts1 && ts2 <= hi)
    */
  def join(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, intervalLo: String, intervalHi: String,
      equi: Seq[(String, String)],
      binMicros: Long,
      residual: Column): DataFrame = {
    checkInputs(points, intervals, binMicros)
    val p = points.withColumn("__bin",
      expr(s"unix_micros($pointTs) div ${binMicros}L"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        expr(s"unix_micros($intervalLo) div ${binMicros}L"),
        expr(s"unix_micros($intervalHi) div ${binMicros}L"))))
    val cond = (equi.map { case (a, b) => p(a) === iv(b) } :+
      (p("__bin") === iv("__bin"))).reduce(_ && _)
    p.join(iv, cond)
      .drop("__bin")
      .where(residual)
  }

  /** Interval×interval OVERLAP join ([aLo,aHi] ∩ [bLo,bHi] ≠ ∅), same
    * binning idea with a different exactly-once rule: both sides
    * replicate into every bin they cover, and a pair is attributed to
    * the single shared bin holding the LATER of the two interval
    * starts — overlapping intervals always share that bin, so each
    * pair meets exactly once and no dedup pass is needed. The residual
    * closes the exact bounds (callers pick open/closed edges).
    */
  def joinIntervals(
      left: DataFrame, leftLo: String, leftHi: String,
      right: DataFrame, rightLo: String, rightHi: String,
      equi: Seq[(String, String)],
      binMicros: Long,
      residual: Column): DataFrame = {
    checkInputs(left, right, binMicros)
    // the lo-bin is precomputed PER SIDE (before the join), so the
    // attribution predicate only references side-qualified columns —
    // an unqualified expr() against the joined plan would be ambiguous
    // (or silently bind the wrong side) when lo/hi names collide
    // across the two inputs
    def binned(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__lo_bin", expr(s"unix_micros($lo) div ${binMicros}L"))
        .withColumn("__bin",
          explode(sequence(
            col("__lo_bin"),
            expr(s"unix_micros($hi) div ${binMicros}L"))))
    val l = binned(left, leftLo, leftHi)
    val r = binned(right, rightLo, rightHi)
    val attribution = l("__bin") === greatest(l("__lo_bin"), r("__lo_bin"))
    val cond = (equi.map { case (a, b) => l(a) === r(b) } :+
      (l("__bin") === r("__bin")) :+ attribution).reduce(_ && _)
    l.join(r, cond)
      .drop("__bin")
      .drop("__lo_bin")
      .where(residual)
  }
}

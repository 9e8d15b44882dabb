package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.GraftSqlBridge

import graft.plans.AsOfJoinPlan

/** The native-plan route to as-of join: same signature, same output
  * schema, and same semantics as [[AsOfJoin.asofJoin]] (left columns +
  * `asof_<payload>` columns; deterministic payload-max tie-break at
  * equal timestamps), but built as a first-class Catalyst operator —
  * [[graft.plans.AsOfJoinPlan]] planned by graft.plans.GraftStrategy
  * onto [[graft.plans.AsOfJoinExec]]'s streamed sorted-merge.
  *
  * Requires the session to carry `graft.functions.GraftExtensions`
  * (which injects the strategy); parity with the composed operator is
  * spec-enforced over randomized frames in NativeAsOfJoinSpec.
  *
  * One semantic divergence, intentional: a right row with a NULL
  * timestamp never matches here (SQL comparison semantics, = DuckDB
  * ASOF JOIN), while the composed union-window plan's carry-last treats
  * such a row as "before everything". On null-free time columns — every
  * registered query — the two are row-identical.
  */
object NativeAsOfJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val spark = left.sparkSession
    val rCols = (key +: rightTime +: rightPayload).distinct
    val rNarrow = right.select(rCols.map(col): _*)

    val lPlan = GraftSqlBridge.analyzed(left)
    val rPlan0 = GraftSqlBridge.analyzed(rNarrow)
    // re-alias the whole right side to FRESH exprIds with reserved
    // names: makes self-joins (left and right scanning the same source)
    // unambiguous without relying on analyzer dedup of a node type it
    // doesn't know, and keeps right columns from colliding with left's
    val rPlan = Project(
      rPlan0.output.map(a => Alias(a, s"_asof_r_${a.name}")()), rPlan0)

    def attr(plan: Seq[Attribute], name: String): Attribute =
      plan.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))

    val plan = AsOfJoinPlan(
      lPlan, rPlan,
      leftKeys = Seq(attr(lPlan.output, key)),
      rightKeys = Seq(attr(rPlan.output, s"_asof_r_$key")),
      leftTime = attr(lPlan.output, leftTime),
      rightTime = attr(rPlan.output, s"_asof_r_$rightTime"),
      forward = direction == "forward")

    val lCols: Seq[Column] = left.columns.toIndexedSeq.map(col)
    val pCols: Seq[Column] =
      rightPayload.map(c => col(s"_asof_r_$c").as(s"asof_$c"))
    GraftSqlBridge.ofRows(spark, plan).select(lCols ++ pCols: _*)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical as-of join — the whole-operator Catalyst surface of the
  * engine's as-of semantics (SURVEY §2B E5/E19).
  *
  * `graft.operators.AsOfJoin` expresses the operator by COMPOSING
  * built-ins (union + carry-last window). This node is the other
  * extension route the engine supports: a first-class logical operator
  * planned by [[GraftStrategy]] onto a dedicated physical
  * [[AsOfJoinExec]], registered through `SparkSessionExtensions
  * .injectPlannerStrategy` (graft.functions.GraftExtensions). Same
  * contract, one fewer sort: the union-window plan sorts the CONCATENATED
  * inputs (n_l + n_r rows) while the physical merge sorts each side
  * separately and streams them once.
  *
  * Semantics: for every left row, the single right row with the same
  * key and the latest rightTime <= leftTime (backward) or the earliest
  * rightTime >= leftTime (forward); no qualifying right row => null
  * right side (left-outer shape). NULL keys and NULL timestamps never
  * match (SQL comparison semantics, matching DuckDB's ASOF JOIN).
  * Ties on (key, rightTime) resolve to the row with the largest
  * orderable payload, matching `graft.operators.AsOfJoin`'s
  * deterministic tie-break.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    forward: Boolean) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    s"as-of join needs matching key lists, got ${leftKeys.size}/${rightKeys.size}")
  require(leftKeys.zip(rightKeys).forall { case (a, b) => a.dataType == b.dataType },
    "as-of join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types must match, got ${leftTime.dataType} vs ${rightTime.dataType}")

  // right side is outer: a left row with no qualifying right row keeps
  // nulls in every right column
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] onto [[AsOfJoinExec]] — the engine's
  * `SparkStrategy` extension point. Everything else falls through to
  * Spark's built-in strategies (`Nil`).
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd) :: Nil
    case _ => Nil
  }
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the engine needs: turning a custom
  * [[LogicalPlan]] (graft.plans.AsOfJoinPlan) into a DataFrame.
  * `Dataset.ofRows` is `private[sql]`, so this shim lives in a
  * subpackage of `org.apache.spark.sql` — the standard extension-library
  * idiom (same access route Spark's own connectors use). Nothing else
  * in the engine reaches into Spark internals this way; keep it that
  * small.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** the analyzed logical plan behind a DataFrame */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}

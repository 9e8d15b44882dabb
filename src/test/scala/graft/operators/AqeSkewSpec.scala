package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE runtime skew handling — the complement to SkewJoin's static
  * salting: with no query rewrite at all, adaptive execution detects
  * the oversized partition at runtime and splits it across tasks
  * (`skew=true` on the join node). The brief's scale rule is "salting
  * for skew, AQE for runtime re-plan" — this pins the latter half.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of left rows share one hot key; padding makes the hot
      // partition cross the byte threshold
      val left = spark.range(0, 60000)
        .select(
          when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat(lit("x" * 64), col("id")).as("payload"))
      val right = spark.range(0, 2000)
        .select(col("id").as("k"), lit("dim").as("tag"))
      val joined = left.join(right, "k")
      // materialize through THIS QueryExecution — count() would build
      // a separate plan and leave joined's adaptive plan unexecuted
      val n = joined.collect().length.toLong
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${finalPlan.take(1500)}")
      // correctness under the split: hot key 7 joins once per left row
      assert(n == left.join(right, Seq("k"), "inner").count())
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

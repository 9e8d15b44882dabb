package graft.tools

import org.apache.spark.sql.SparkSession

/** dev scratch (test scope): print executed plans for named queries — `sbt "Test/runMain graft.tools.PlanProbe <sfDir> <q...>"` */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (n <- args.drop(1)) {
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, d)
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(9000))
    }
    spark.stop()
  }
}
